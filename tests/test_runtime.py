"""Tests for the training runtime: optimizers (TF1 semantics), padding
invariance of task heads, checkpoint round-trip, and data-parallel
equivalence with single-device training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.runtime.optimizers import Optimizer, clip_grads_per_tensor
from tf_gnn_samples_tpu.tasks.base import DataFold


# ---------------------------------------------------------------------------
# Optimizers
# ---------------------------------------------------------------------------


def test_sgd_semantics():
    opt = Optimizer("sgd", {})
    params = {"w": jnp.array([1.0, 2.0])}
    grads = {"w": jnp.array([0.5, -1.0])}
    state = opt.init(params)
    new_params, _ = opt.update(grads, state, params, 0.1)
    np.testing.assert_allclose(new_params["w"], [0.95, 2.1], rtol=1e-6)


def test_adam_matches_tf_formula():
    opt = Optimizer("adam", {})
    rng = np.random.RandomState(0)
    w = rng.randn(5).astype(np.float32)
    params = {"w": jnp.array(w)}
    state = opt.init(params)
    m = np.zeros(5)
    v = np.zeros(5)
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    w_ref = w.astype(np.float64)
    for t in range(1, 4):
        g = rng.randn(5).astype(np.float32)
        params, state = opt.update({"w": jnp.array(g)}, state, params, lr)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        w_ref = w_ref - lr_t * m / (np.sqrt(v) + eps)
    np.testing.assert_allclose(params["w"], w_ref, rtol=1e-5)


def test_rmsprop_matches_tf_formula():
    decay, momentum, eps, lr = 0.9, 0.8, 1e-10, 0.01
    opt = Optimizer("rmsprop", {"decay": decay, "momentum": momentum})
    rng = np.random.RandomState(1)
    w = rng.randn(4).astype(np.float32)
    params = {"w": jnp.array(w)}
    state = opt.init(params)
    ms = np.zeros(4)
    mom = np.zeros(4)
    w_ref = w.astype(np.float64)
    for _ in range(3):
        g = rng.randn(4).astype(np.float32)
        params, state = opt.update({"w": jnp.array(g)}, state, params, lr)
        ms = decay * ms + (1 - decay) * g * g
        mom = momentum * mom + lr * g / np.sqrt(ms + eps)
        w_ref = w_ref - mom
    np.testing.assert_allclose(params["w"], w_ref, rtol=1e-5)


def test_clip_per_tensor():
    grads = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.3, 0.4])}
    clipped = clip_grads_per_tensor(grads, 1.0)
    # ||a|| = 5 > 1 -> scaled to unit norm; ||b|| = 0.5 <= 1 -> unchanged.
    np.testing.assert_allclose(clipped["a"], [0.6, 0.8], rtol=1e-5)
    np.testing.assert_allclose(clipped["b"], [0.3, 0.4], rtol=1e-6)


def test_unknown_optimizer_raises():
    with pytest.raises(Exception):
        Optimizer("adagrad", {})


# ---------------------------------------------------------------------------
# Tiny model/task harness (synthetic QM9-shaped data)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=3
    )
    return model, task, samples


def _get_batches(task, samples, max_nodes):
    return list(task.make_minibatch_iterator(samples, DataFold.VALIDATION, max_nodes))


def test_padding_invariance_of_forward(tiny):
    """The loss must not depend on the padded sizes."""
    model, task, samples = tiny
    batches_small = _get_batches(task, samples, 200)
    # Force different padding by a bigger budget covering the same single pack
    sizes = [(len(s.node_features), [a.shape[0] for a in s.adjacency_lists]) for s in samples]
    from tf_gnn_samples_tpu.tasks.base import compute_batch_spec

    assert len(batches_small) >= 1
    b = batches_small[0]
    # Re-pad the same batch to larger static sizes:
    from tf_gnn_samples_tpu.tasks.base import BatchSpec, graph_sample_to_padded

    spec_big = BatchSpec(
        n_pad=b.graph.n_pad + 128,
        e_pads=tuple(e.senders.shape[0] + 64 for e in b.graph.edges),
        g_pad=b.graph.g_pad + 16,
    )
    n = int(b.num_nodes)
    adj = []
    for e in b.graph.edges:
        msk = np.asarray(e.mask) > 0
        adj.append(np.stack(
            [np.asarray(e.senders)[msk], np.asarray(e.receivers)[msk]], axis=1
        ).astype(np.int32))
    graph_big = graph_sample_to_padded(
        np.asarray(b.graph.node_features)[:n],
        adj,
        np.asarray(b.graph.node_graph_ids)[:n],
        int(b.num_graphs),
        spec_big,
        typed_incoming_counts=np.asarray(b.graph.typed_incoming_counts)[:, :n],
    )
    aux_big = {
        "target_values": np.pad(
            np.asarray(b.aux["target_values"]),
            ((0, 0), (0, spec_big.g_pad - b.graph.g_pad)),
        )
    }
    from tf_gnn_samples_tpu.tasks.base import TaskBatch

    b_big = TaskBatch(graph=graph_big, aux=aux_big, num_graphs=b.num_graphs,
                      num_nodes=b.num_nodes, num_edges=b.num_edges)

    loss1, m1 = model._forward(model.model_params_tree, model._device_batch(b), None)
    loss2, m2 = model._forward(model.model_params_tree, model._device_batch(b_big), None)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1["abs_err_task0"]), float(m2["abs_err_task0"]), rtol=1e-4
    )


def test_train_step_decreases_loss(tiny):
    model, task, samples = tiny
    batches = _get_batches(task, samples, 200)
    step = model._make_train_step()
    # Copy before stepping: the jitted step donates its params/opt-state
    # arguments, and the module-scoped fixture model must stay usable.
    params = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    opt_state = jax.tree_util.tree_map(jnp.copy, model.opt_state)
    dev = model._device_batch(batches[0])
    losses = []
    for i in range(30):
        params, opt_state, metrics = step(params, opt_state, jax.random.PRNGKey(i), dev)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tiny, tmp_path):
    model, task, samples = tiny
    path = str(tmp_path / "ckpt.pickle")
    model.save_model(path)

    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    assert data["model_class"] == "RGCN"
    assert data["task_class"] == "QM9"
    assert data["task_metadata"]["num_edge_types"] == 4

    # Perturb, then restore: weights must return to saved values.
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, model.model_params_tree)
    model.model_params_tree = perturbed
    model.load_weights(data["weights"])
    batch = _get_batches(task, samples, 200)[0]
    loss_restored, _ = model._forward(
        model.model_params_tree, model._device_batch(batch), None
    )

    from tf_gnn_samples_tpu.utils.registry import restore as restore_model

    model2 = restore_model(path, str(tmp_path))
    loss2, _ = model2._forward(
        model2.model_params_tree, model2._device_batch(batch), None
    )
    np.testing.assert_allclose(float(loss_restored), float(loss2), rtol=1e-6)


def test_partial_restore_fresh_inits(tiny, capsys):
    from tf_gnn_samples_tpu.runtime.model import flatten_params, unflatten_like

    model, _, _ = tiny
    weights = flatten_params(model.model_params_tree)
    some_key = sorted(weights)[0]
    del weights[some_key]
    weights["bogus_extra"] = np.zeros(3)
    rebuilt = unflatten_like(model.model_params_tree, weights)
    out = capsys.readouterr().out
    assert "Freshly initializing" in out
    assert "not used by model" in out
    # Rebuilt tree has the same structure:
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(
        model.model_params_tree
    )


# ---------------------------------------------------------------------------
# Data parallelism
# ---------------------------------------------------------------------------


def test_dp_matches_single_device(tiny):
    """2-way DP on the virtual CPU mesh must match a single-device step on
    the equivalent combined batch (weighted-mean loss gradient)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from tf_gnn_samples_tpu.parallel import make_mesh, make_dp_train_step, stack_task_batches

    model, task, samples = tiny
    # A DP group must share one pytree shape; the runtime groups by
    # batch_shape_key, this test just asks for a single-bucket fold.
    task.params["batch_spec_buckets"] = 1
    try:
        batches = _get_batches(task, samples, 101)
    finally:
        del task.params["batch_spec_buckets"]
    assert len(batches) >= 2, "need at least two batches"
    b0, b1 = batches[0], batches[1]

    mesh = make_mesh(2)
    dp_step = make_dp_train_step(model, mesh)
    stacked = stack_task_batches([b0, b1])
    p0 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    o0 = model._optimizer.init(p0)
    dp_params, _, dp_metrics = dp_step(p0, o0, jax.random.PRNGKey(0), stacked)

    # Single-device reference: combined loss = weighted mean of batch losses.
    def combined_loss(params):
        l0, m0 = model._forward(params, model._device_batch(b0), None)
        l1, m1 = model._forward(params, model._device_batch(b1), None)
        n0 = float(b0.num_graphs)
        n1 = float(b1.num_graphs)
        return (l0 * n0 + l1 * n1) / (n0 + n1)

    from tf_gnn_samples_tpu.runtime.optimizers import clip_grads_per_tensor

    p1 = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    grads = jax.grad(combined_loss)(p1)
    grads = clip_grads_per_tensor(grads, model.params["clamp_gradient_norm"])
    ref_params, _ = model._optimizer.update(
        grads, model._optimizer.init(p1), p1, model.params["learning_rate"]
    )

    # RGCN@defaults has all dropout keep probs at 1.0, so the DP step is
    # deterministic and must match the single-device combined step exactly
    # (up to float reassociation in the psum).
    for ref_leaf, dp_leaf in zip(
        jax.tree_util.tree_leaves(ref_params),
        jax.tree_util.tree_leaves(dp_params),
    ):
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(ref_leaf), rtol=2e-4, atol=1e-6
        )


def test_dp_eval_metrics_sum(tiny):
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from tf_gnn_samples_tpu.parallel import make_mesh, stack_task_batches
    from tf_gnn_samples_tpu.parallel.data_parallel import make_dp_eval_step

    model, task, samples = tiny
    task.params["batch_spec_buckets"] = 1  # stacked pair: one shape
    try:
        batches = _get_batches(task, samples, 101)
    finally:
        del task.params["batch_spec_buckets"]
    b0, b1 = batches[0], batches[1]
    mesh = make_mesh(2)
    eval_step = make_dp_eval_step(model, mesh)
    metrics = eval_step(model.model_params_tree, stack_task_batches([b0, b1]))

    _, m0 = model._forward(model.model_params_tree, model._device_batch(b0), None)
    _, m1 = model._forward(model.model_params_tree, model._device_batch(b1), None)
    # Per-device metrics (leading axis P) preserve per-batch semantics:
    np.testing.assert_allclose(
        float(metrics["abs_err_task0"][0]), float(m0["abs_err_task0"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["abs_err_task0"][1]), float(m1["abs_err_task0"]), rtol=1e-5
    )


def test_dp_epoch_via_model(tiny):
    """num_model_replicas > 1 drives whole epochs through the dp mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=7
    )
    model.params["num_model_replicas"] = 4
    model.params["max_nodes_in_batch"] = 40  # force many small batches
    losses = []
    for _ in range(4):
        loss, metrics, n_graphs, *_ = model._run_epoch(
            "dp", samples, DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
        assert n_graphs == len(samples)
        # one metrics dict per REAL batch (padding replicas dropped):
        n_batches = len(list(task.make_minibatch_iterator(
            samples, DataFold.VALIDATION, 40
        )))
        assert len(metrics) == n_batches
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("model_name", [
    "GGNN", "RGCN", "RGAT", "RGIN", "GNN-Edge-MLP0", "GNN-Edge-MLP1",
    "RGDCN", "GNN-FiLM",
])
def test_all_model_families_train(model_name):
    """Every registered model family trains end-to-end (init, layer-kwargs
    plumbing, forward, backward, optimizer) and reduces its loss."""
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name=model_name, hidden=32, n_layers=2, seed=11
    )
    batches = _get_batches(task, samples, 200)
    step = model._make_train_step()
    params = jax.tree_util.tree_map(jnp.copy, model.model_params_tree)
    opt_state = jax.tree_util.tree_map(jnp.copy, model.opt_state)
    dev = model._device_batch(batches[0])
    losses = []
    for i in range(25):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.PRNGKey(i), dev
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], (model_name, losses[:3], losses[-3:])


def test_full_state_checkpoint_resume(tiny, tmp_path):
    """Resume continues optimization exactly: train 6 epochs straight vs
    3 epochs -> checkpoint -> resume 3 more; final params must match.
    Uses a small node budget so each epoch has MULTIPLE shuffled batches —
    this covers the global-numpy-RNG restore (epoch shuffles must replay
    identically after resume)."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.tasks.base import DataFold

    def make():
        m, t, s = ge._tiny_task_and_model("RGCN", hidden=16, n_layers=1, seed=13)
        m.params.update({"max_epochs": 6, "patience": 100,
                         "max_nodes_in_batch": 40})
        return m, t, s

    # Straight run:
    m1, t1, s1 = make()
    t1._loaded_data[DataFold.TRAIN] = s1
    t1._loaded_data[DataFold.VALIDATION] = s1[:4]
    m1.result_dir = str(tmp_path / "a"); import os; os.makedirs(m1.result_dir)
    m1.train(quiet=True)

    # Interrupted run:
    m2, t2, s2 = make()
    t2._loaded_data[DataFold.TRAIN] = s2
    t2._loaded_data[DataFold.VALIDATION] = s2[:4]
    m2.result_dir = str(tmp_path / "b"); os.makedirs(m2.result_dir)
    m2.params["max_epochs"] = 3
    m2.params["checkpoint_every_n_epochs"] = 3
    m2.train(quiet=True)
    ckpt = m2.training_state_file
    assert os.path.exists(ckpt)

    m3, t3, s3 = make()
    t3._loaded_data[DataFold.TRAIN] = s3
    t3._loaded_data[DataFold.VALIDATION] = s3[:4]
    m3.result_dir = str(tmp_path / "c"); os.makedirs(m3.result_dir)
    m3.train(quiet=True, resume_from=ckpt)

    for a, b in zip(jax.tree_util.tree_leaves(m1.model_params_tree),
                    jax.tree_util.tree_leaves(m3.model_params_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_scan_epochs_end_to_end_train(tmp_path):
    """scan_epochs=True through the full model.train loop: one-dispatch
    epochs over device-resident stacked batches must train, early-stop and
    checkpoint exactly like the streamed path."""
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=16, n_layers=1, seed=11
    )
    model.params.update({
        "cache_batches_on_device": True,
        "scan_epochs": True,
        "max_epochs": 3,
        "patience": 5,
        "max_nodes_in_batch": 120,  # force several batches per epoch
    })
    task._loaded_data = {DataFold.TRAIN: samples, DataFold.VALIDATION: samples}
    model.result_dir = str(tmp_path)
    model.train(quiet=True)
    log = open(model.log_file).read()
    assert log.count("== Epoch") == 3, log
    assert "Train: loss:" in log and "Valid: loss:" in log
    import os as os_mod

    assert os_mod.path.exists(model.best_model_file)
    # Loss decreased over the scanned epochs:
    import re as re_mod

    losses = [float(m) for m in re_mod.findall(r"Train: loss: ([0-9.]+)", log)]
    assert losses[-1] < losses[0], losses


def test_repack_cached_every_invalidates_cache(tmp_path):
    """repack_cached_every=K drops the device-resident TRAIN cache every K
    epochs so graphs are re-packed (the reference re-packs every epoch,
    ppi_task.py:204)."""
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=16, n_layers=1, seed=12
    )
    model.params.update({
        "cache_batches_on_device": True,
        "repack_cached_every": 2,
        "max_epochs": 5,
        "patience": 50,
        "max_nodes_in_batch": 120,
    })
    task._loaded_data = {DataFold.TRAIN: samples, DataFold.VALIDATION: samples}
    model.result_dir = str(tmp_path)

    packs = []
    orig = type(model)._run_epoch

    real_iter = task.make_minibatch_iterator

    def counting_iter(data, fold, max_nodes):
        if fold == DataFold.TRAIN:
            packs.append(1)
        return real_iter(data, fold, max_nodes)

    task.make_minibatch_iterator = counting_iter
    try:
        model.train(quiet=True)
    finally:
        task.make_minibatch_iterator = real_iter
    # epochs 1 (initial pack), 3, 5 re-pack under K=2:
    assert sum(packs) == 3, packs


def test_dp_epoch_composes_with_device_cache():
    """num_model_replicas > 1 + cache_batches_on_device: the stacked
    replica groups are built once, reused across epochs (no re-packing),
    training still converges, and repack_cached_every invalidates."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=13
    )
    model.params["num_model_replicas"] = 2
    model.params["max_nodes_in_batch"] = 40
    model.params["cache_batches_on_device"] = True

    calls = {"n": 0}
    orig_iter = task.make_minibatch_iterator

    def counting_iter(*a, **kw):
        calls["n"] += 1
        return orig_iter(*a, **kw)

    task.make_minibatch_iterator = counting_iter
    losses = []
    for _ in range(3):
        loss, metrics, n_graphs, *_ = model._run_epoch(
            "dp", samples, DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
        assert n_graphs == len(samples)
    assert calls["n"] == 1  # packed exactly once, then device-cached
    assert losses[-1] < losses[0], losses
    assert DataFold.TRAIN in model._dp_group_cache

    # repack_cached_every=2 drops the cache on the right cadence:
    model.params["repack_cached_every"] = 2
    model._run_epoch("dp", samples, DataFold.TRAIN, quiet=True)  # epoch 4
    n_after = calls["n"]
    model._run_epoch("dp", samples, DataFold.TRAIN, quiet=True)  # epoch 5
    assert calls["n"] == n_after + 1  # re-packed on the cadence boundary
    task.make_minibatch_iterator = orig_iter


def test_dp_epoch_scan_epochs_composes():
    """num_model_replicas > 1 + cache_batches_on_device + scan_epochs:
    after the build epoch, epochs run as ONE dispatch per shape group
    (lax.scan of the shard_map'd DP step) and training still converges."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import __graft_entry__ as ge

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=13
    )
    model.params["num_model_replicas"] = 2
    model.params["max_nodes_in_batch"] = 40
    model.params["cache_batches_on_device"] = True
    model.params["scan_epochs"] = True

    calls = {"n": 0}
    orig_iter = task.make_minibatch_iterator

    def counting_iter(*a, **kw):
        calls["n"] += 1
        return orig_iter(*a, **kw)

    task.make_minibatch_iterator = counting_iter
    losses = []
    for _ in range(4):
        loss, metrics, n_graphs, *_ = model._run_epoch(
            "dp-scan", samples, DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
        assert n_graphs == len(samples)
    assert calls["n"] == 1  # packed exactly once, then device-cached
    assert losses[-1] < losses[0], losses
    assert DataFold.TRAIN in model._dp_stacked_cache
    # The per-group device arrays were dropped after super-stacking:
    groups, _ = model._dp_group_cache[DataFold.TRAIN]
    assert all(g[0] is None for g in groups)
    # Metric list covers every real batch of the fold:
    assert sum(len(g[1]) for g in groups) == len(metrics)
    task.make_minibatch_iterator = orig_iter
