"""Multi-host (multi-process) distributed training checks.

These launch REAL cooperating processes over jax.distributed with
virtual CPU devices — the strongest multi-host validation available
without DCN-connected hardware."""

import pytest

from tf_gnn_samples_tpu.parallel.multihost import (
    make_hybrid_mesh,
    run_multihost_check,
)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    """2 processes x 4 virtual CPU devices: the distributed DP train step
    (each process feeding only its local batches) must reproduce the
    single-process combined-batch update; the same worker then drives the
    HYBRID (dp, gp) mesh — gp=2 graph-parallel groups inside each process,
    dp crossing the process boundary — through the task-generic GP step
    for BOTH strategies (all-gather and halo all_to_all), asserting
    exactness against the single-process combined weighted update on the
    unpartitioned batches."""
    line = run_multihost_check(num_processes=2, devices_per_process=4)
    assert "MULTIHOST_OK" in line
    assert "processes=2 devices=8" in line
    assert "hybrid_gp=2" in line
    import re

    for field in ("hybrid_allgather_diff", "hybrid_halo_diff"):
        m = re.search(field + r"=([0-9.e+-]+)", line)
        assert m, line
        assert float(m.group(1)) < 1e-4, line


def test_hybrid_mesh_orientation():
    """The (dp, gp) mesh must keep each gp group within one process so gp
    collectives ride ICI (single-process: within the local devices)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_hybrid_mesh(gp=2)
    assert mesh.axis_names == ("dp", "gp")
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)
    # gp groups are contiguous device pairs:
    for row in mesh.devices:
        assert row[1].id == row[0].id + 1

    with pytest.raises(ValueError):
        make_hybrid_mesh(gp=3)  # does not divide the local count


def test_hybrid_gp_step_matches_combined_update_single_process():
    """In-process hybrid (dp, gp) exactness on the virtual 8-device mesh:
    make_hybrid_gp_train_step with dp=4 rows x gp=2 graph-parallel groups
    must reproduce the single-device combined graph-weighted update on
    the unpartitioned batches (the 2-process variant of this check runs
    in the slow multihost test)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.ops.graph import bucket_size
    from tf_gnn_samples_tpu.parallel import multihost
    from tf_gnn_samples_tpu.parallel.data_parallel import (
        stack_task_batches, unify_batch_windows,
    )
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        partition_task_batch,
    )
    from tf_gnn_samples_tpu.runtime.optimizers import clip_grads_per_tensor
    from tf_gnn_samples_tpu.tasks.base import DataFold

    gp = 2
    mesh = multihost.make_hybrid_mesh(gp=gp)
    dp = mesh.shape["dp"]
    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=21
    )
    pool = list(task.make_minibatch_iterator(
        samples, DataFold.VALIDATION,
        model.params["max_nodes_in_batch"] // 4,
    ))

    # dp rows must share one padded shape to stack.
    def shape_key(b):
        import jax as _jax

        return tuple(
            getattr(x, "shape", None)
            for x in _jax.tree_util.tree_leaves(b)
        )

    pool = [b for b in pool if shape_key(b) == shape_key(pool[0])]
    rows = unify_batch_windows([pool[i % len(pool)] for i in range(dp)])
    n_pad = rows[0].graph.n_pad
    e_pad_total = max(
        bucket_size(sum(e.senders.shape[0] for e in b.graph.edges),
                    min_size=64)
        for b in rows
    )
    gbatch = stack_task_batches(rows)
    shard_rows = [partition_task_batch(b, gp, n_pad, e_pad_total)[0]
                  for b in rows]
    gshard = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=0),
        *shard_rows,
    )

    step = multihost.make_hybrid_gp_train_step(model, mesh)
    p0 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    o0 = model._optimizer.init(p0)
    new_p, _, met = step(p0, o0, jax.random.PRNGKey(0), gbatch, gshard)
    dist = jax.device_get(new_p)

    n_per = [float(b.num_graphs) for b in rows]
    total = sum(n_per)

    def combined_loss(params):
        tot = 0.0
        for b, n_b in zip(rows, n_per):
            li, _ = model._forward(params, model._device_batch(b), None)
            tot = tot + li * n_b
        return tot / total

    p1 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    grads = jax.jit(jax.grad(combined_loss))(p1)
    grads = clip_grads_per_tensor(grads, model.params["clamp_gradient_norm"])
    ref, _ = model._optimizer.update(
        grads, model._optimizer.init(p1), p1,
        model._effective_lr(total),
    )
    ref = jax.device_get(ref)
    diffs = [
        float(np.max(np.abs(np.asarray(a, np.float64)
                            - np.asarray(b, np.float64))))
        for a, b in zip(jax.tree_util.tree_leaves(dist),
                        jax.tree_util.tree_leaves(ref))
    ]
    assert max(diffs) < 1e-4, diffs
    assert float(np.asarray(jax.device_get(met["total_graphs"]))) == total
