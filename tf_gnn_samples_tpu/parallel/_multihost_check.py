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

    # Hybrid (dp, gp) mesh: gp=2 graph-parallel groups INSIDE each
    # process, dp axis spanning the processes — the configuration the
    # README's 2-host + graph-parallel launch actually runs. Both GP
    # strategies (all-gather and halo all_to_all) drive the task-generic
    # step with a cross-process dp psum; exactness is asserted against a
    # single-process computation of the combined weighted update on the
    # UNPARTITIONED batches.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tf_gnn_samples_tpu.ops.graph import bucket_size
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        partition_task_batch, partition_task_batch_halo,
    )

    if local % 2:
        # gp groups must sit inside one process; an odd local device
        # count cannot host a gp=2 group. (The driver may probe other
        # device counts — the canonical 2x4 run exercises the hybrid.)
        print("MULTIHOST_OK processes=%d devices=%d loss=%.6f "
              "max_param_diff=%g epoch_losses=%.5f->%.5f hybrid=skipped"
              % (args.num_processes, total, loss, max_diff, losses[0],
                 losses[-1]), flush=True)
        return

    gp = 2
    mesh_h = multihost.make_hybrid_mesh(gp=gp)
    dp = mesh_h.shape["dp"]
    dp_local = dp // args.num_processes
    model3, task3, samples3 = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=13
    )
    pool = list(task3.make_minibatch_iterator(
        samples3, DataFold.VALIDATION,
        model3.params["max_nodes_in_batch"] // 4,
    ))
    rows = unify_batch_windows(
        [pool[i % len(pool)] for i in range(dp)]
    )
    n_pads = {b.graph.n_pad for b in rows}
    assert len(n_pads) == 1, n_pads
    n_pad = rows[0].graph.n_pad
    e_pad_total = max(
        bucket_size(sum(e.senders.shape[0] for e in b.graph.edges),
                    min_size=64)
        for b in rows
    )

    def to_global(local_leaves_stacked, lead_spec, global_rows):
        def f(x):
            x = np.asarray(x)
            sharding = NamedSharding(
                mesh_h, P(lead_spec, *([None] * (x.ndim - 1)))
            )
            return jax.make_array_from_process_local_data(
                sharding, x, (global_rows,) + x.shape[1:]
            )

        return jax.tree_util.tree_map(f, local_leaves_stacked)

    mine_rows = rows[args.process_id * dp_local:
                     (args.process_id + 1) * dp_local]
    gbatch = to_global(stack_task_batches(mine_rows), "dp", dp)

    # Single-process reference: combined graph-weighted update over the
    # dp rows' UNPARTITIONED batches (shared by both strategies).
    n_per_row = [float(b.num_graphs) for b in rows]
    total_graphs_ref = sum(n_per_row)

    def hybrid_combined_loss(params):
        tot = 0.0
        for b, n_b in zip(rows, n_per_row):
            li, _ = model3._forward(params, model3._device_batch(b), None)
            tot = tot + li * n_b
        return tot / total_graphs_ref

    p_ref = jax.tree_util.tree_map(jnp.copy, model3.model_params_tree)
    grads_ref = jax.jit(jax.grad(hybrid_combined_loss))(p_ref)
    grads_ref = clip_grads_per_tensor(
        grads_ref, model3.params["clamp_gradient_norm"]
    )
    lr3 = model3._effective_lr(total_graphs_ref)
    ref_params_h, _ = model3._optimizer.update(
        grads_ref, model3._optimizer.init(p_ref), p_ref, lr3
    )
    ref_params_h = jax.device_get(ref_params_h)

    hybrid_diffs = {}
    for strategy in ("allgather", "halo"):
        if strategy == "halo":
            halo_pad = max(
                partition_task_batch_halo(b, gp, n_pad, e_pad_total)[3]
                for b in rows
            )
            shard_rows = [
                partition_task_batch_halo(
                    b, gp, n_pad, e_pad_total, halo_pad_target=halo_pad
                )[0]
                for b in mine_rows
            ]
        else:
            shard_rows = [
                partition_task_batch(b, gp, n_pad, e_pad_total)[0]
                for b in mine_rows
            ]
        # [dp_local rows of [gp, ...]] -> [dp_local * gp, ...] dp-major:
        local_stack = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *shard_rows,
        )
        gshard = to_global(local_stack, ("dp", "gp"), dp * gp)

        step_h = multihost.make_hybrid_gp_train_step(model3, mesh_h)
        p0h = jax.tree_util.tree_map(jnp.copy, model3.model_params_tree)
        o0h = model3._optimizer.init(p0h)
        new_h, _, met_h = step_h(p0h, o0h, jax.random.PRNGKey(0),
                                 gbatch, gshard)
        dist_h = jax.device_get(new_h)
        assert float(np.asarray(
            jax.device_get(met_h["total_graphs"])
        )) == total_graphs_ref
        diffs_h = [
            float(np.max(np.abs(np.asarray(a, np.float64)
                                - np.asarray(b, np.float64))))
            for a, b in zip(jax.tree_util.tree_leaves(dist_h),
                            jax.tree_util.tree_leaves(ref_params_h))
        ]
        hybrid_diffs[strategy] = max(diffs_h)
        assert hybrid_diffs[strategy] < 1e-4, (
            "hybrid (dp=%d, gp=%d) %s diverged: max diff %g"
            % (dp, gp, strategy, hybrid_diffs[strategy])
        )

    print("MULTIHOST_OK processes=%d devices=%d loss=%.6f max_param_diff=%g "
          "epoch_losses=%.5f->%.5f hybrid_gp=%d "
          "hybrid_allgather_diff=%g hybrid_halo_diff=%g"
          % (args.num_processes, total, loss, max_diff, losses[0],
             losses[-1], gp, hybrid_diffs["allgather"],
             hybrid_diffs["halo"]), flush=True)


if __name__ == "__main__":
    main()
