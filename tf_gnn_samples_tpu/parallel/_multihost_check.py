"""Multi-process DP exactness worker (see multihost.run_multihost_check).

Runs under `python -m tf_gnn_samples_tpu.parallel._multihost_check` in N
cooperating processes: forms the distributed mesh over all processes'
virtual CPU devices, runs ONE data-parallel train step where each
process feeds only its local batches, and asserts the resulting
(replicated) parameters match a single-process computation of the
combined-batch update — the same bar as the in-process DP exactness test
(tests/test_runtime.py), now across a real process boundary.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=%d"
            % args.devices_per_process
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_gnn_samples_tpu.parallel import multihost
    from tf_gnn_samples_tpu.parallel.data_parallel import (
        stack_task_batches, unify_batch_windows,
    )
    from tf_gnn_samples_tpu.runtime.optimizers import clip_grads_per_tensor
    from tf_gnn_samples_tpu.tasks.base import DataFold

    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    total = jax.device_count()
    local = jax.local_device_count()
    assert local == args.devices_per_process, (local,
                                               args.devices_per_process)

    # Deterministic tiny fixture — identical on every process.
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo_root)
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=5
    )
    batches = list(task.make_minibatch_iterator(
        samples, DataFold.VALIDATION,
        model.params["max_nodes_in_batch"] // 4,
    ))
    per_dev = [batches[i % len(batches)] for i in range(total)]
    # Window tokens must unify GLOBALLY (every process computes the same
    # unified shapes from the same deterministic data):
    per_dev = unify_batch_windows(per_dev)
    mine = per_dev[args.process_id * local:(args.process_id + 1) * local]
    stacked_local = stack_task_batches(mine)

    mesh = multihost.make_hybrid_mesh(gp=1, axis_names=("dp", "gp"))
    # Pure-DP view of the hybrid mesh (gp axis of size 1):
    gbatch = multihost.global_dp_batch(stacked_local, mesh, "dp")
    step = multihost.make_multihost_dp_train_step(model, mesh, "dp")

    p0 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    o0 = model._optimizer.init(p0)
    new_params, _, metrics = step(p0, o0, jax.random.PRNGKey(0), gbatch)
    dist_params = jax.device_get(new_params)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))

    # Single-process reference on one local device:
    def combined_loss(params):
        tot = 0.0
        n_tot = 0.0
        for b in per_dev:
            li, _ = model._forward(params, model._device_batch(b), None)
            tot = tot + li * float(b.num_graphs)
            n_tot += float(b.num_graphs)
        return tot / n_tot

    p1 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    grads = jax.jit(jax.grad(combined_loss))(p1)
    grads = clip_grads_per_tensor(
        grads, model.params["clamp_gradient_norm"]
    )
    lr = model._effective_lr(sum(float(b.num_graphs) for b in per_dev))
    ref_params, _ = model._optimizer.update(
        grads, model._optimizer.init(p1), p1, lr
    )
    ref_params = jax.device_get(ref_params)

    diffs = [
        float(np.max(np.abs(np.asarray(a, np.float64)
                            - np.asarray(b, np.float64))))
        for a, b in zip(jax.tree_util.tree_leaves(dist_params),
                        jax.tree_util.tree_leaves(ref_params))
    ]
    max_diff = max(diffs)
    assert max_diff < 1e-4, "distributed DP diverged: max diff %g" % max_diff

    # Epoch level: the runtime's own DP epoch driver (num_model_replicas
    # spanning every process's devices, device-cached groups) must train
    # under multi-process SPMD — each process packs the same fold and
    # feeds only its slice of each replica group.
    model2, task2, samples2 = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=9
    )
    model2.params["num_model_replicas"] = total
    model2.params["max_nodes_in_batch"] = 40
    model2.params["cache_batches_on_device"] = True
    losses = []
    for _ in range(3):
        ep_loss, ep_metrics, n_graphs, *_ = model2._run_epoch(
            "mh", samples2, DataFold.TRAIN, quiet=True
        )
        losses.append(ep_loss)
        assert n_graphs == len(samples2)
    assert losses[-1] < losses[0], losses

    print("MULTIHOST_OK processes=%d devices=%d loss=%.6f max_param_diff=%g "
          "epoch_losses=%.5f->%.5f"
          % (args.num_processes, total, loss, max_diff, losses[0],
             losses[-1]), flush=True)


if __name__ == "__main__":
    main()
