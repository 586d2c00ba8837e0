"""Graph-parallel (partitioned mega-graph) correctness tests on the
virtual multi-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tf_gnn_samples_tpu.nn.layers import rgcn_init, rgcn_apply
from tf_gnn_samples_tpu.ops.graph import pad_graph_batch
from tf_gnn_samples_tpu.parallel.data_parallel import make_mesh
from tf_gnn_samples_tpu.parallel.graph_parallel import (
    make_gp_train_step,
    partition_graph,
    gp_rgcn_layer,
)
from tf_gnn_samples_tpu.runtime.optimizers import Optimizer


def _random_typed_graph(n=96, L=3, seed=0):
    rng = np.random.RandomState(seed)
    adj = []
    for l in range(L):
        e = rng.randint(n, 3 * n)
        adj.append(rng.randint(0, n, size=(e, 2)).astype(np.int32))
    feats = rng.randn(n, 16).astype(np.float32)
    return feats, adj


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_rgcn_matches_single_device():
    """A partitioned RGCN layer must reproduce the single-device layer
    exactly (same graph, same weights)."""
    P_DEV = 4
    feats, adj = _random_typed_graph()
    n, d = feats.shape
    L = len(adj)

    key = jax.random.PRNGKey(0)
    params = rgcn_init(key, L, d)

    # Single-device reference over the padded GraphBatch:
    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    h0 = jnp.asarray(batch.node_features)
    ref = rgcn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), h0,
        activation_function="relu", aggregation_strategy="segment",
    )[:n]

    # Partitioned version — note the partitioner re-pads nodes per device,
    # so feed it the SAME padded feature table for bit-comparable input:
    shards, n_local, n_global = partition_graph(feats, adj, P_DEV)
    mesh = make_mesh(P_DEV, axis_name="gp")

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_rgcn_layer(
            params["W"], shard, shard.node_features @ jnp.eye(d),
            "gp", jax.nn.relu,
        )
        return out[None]

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P("gp"),), out_specs=P("gp"),
        check_vma=False,
    )
    out = jax.jit(sharded)(jax.tree_util.tree_map(jnp.asarray, shards))
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_train_step_decreases_loss():
    P_DEV = 4
    feats, adj = _random_typed_graph(n=120, seed=1)
    n, d = feats.shape
    L = len(adj)
    num_labels = 5
    rng = np.random.RandomState(0)

    shards, n_local, n_global = partition_graph(feats, adj, P_DEV)
    labels_full = (rng.rand(n_global, num_labels) < 0.3).astype(np.float32)
    labels = labels_full.reshape(P_DEV, n_local, num_labels)

    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = 32
    params = {
        "proj": jax.random.normal(k1, (d, hidden)) * 0.1,
        "layers": [
            {"W": rgcn_init(jax.random.fold_in(k2, i), L, hidden)["W"]}
            for i in range(2)
        ],
        "out": jax.random.normal(k3, (hidden, num_labels)) * 0.1,
    }
    opt = Optimizer("adam", {})
    opt_state = opt.init(params)
    mesh = make_mesh(P_DEV, axis_name="gp")
    step = make_gp_train_step("rgcn", 2, num_labels, opt, 1.0, mesh)

    dev_shards = jax.tree_util.tree_map(jnp.asarray, shards)
    losses = []
    p, o = params, opt_state
    for i in range(20):
        p, o, loss = step(p, o, dev_shards, jnp.asarray(labels), 0.01)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_halo_rgcn_matches_single_device():
    """The halo-exchange layer must also reproduce the single-device layer
    exactly — while exchanging only boundary rows."""
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        gp_halo_rgcn_layer,
        partition_graph_halo,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=3)
    n, d = feats.shape
    L = len(adj)
    params = rgcn_init(jax.random.PRNGKey(5), L, d)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    ref = rgcn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch),
        jnp.asarray(batch.node_features),
        activation_function="relu", aggregation_strategy="segment",
    )[:n]

    shards, n_local, n_global, halo_pad = partition_graph_halo(feats, adj, P_DEV)
    assert halo_pad < n_local * (P_DEV - 1) + n_local  # actually exchanged less than everything
    mesh = make_mesh(P_DEV, axis_name="gp")

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_halo_rgcn_layer(
            params["W"], shard, shard.node_features, "gp", jax.nn.relu
        )
        return out[None]

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P("gp"),), out_specs=P("gp"),
        check_vma=False,
    )
    out = jax.jit(sharded)(jax.tree_util.tree_map(jnp.asarray, shards))
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_halo_gradients_flow():
    """Gradients flow through the all_to_all (its transpose is the reverse
    exchange) back to the weights."""
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        gp_halo_rgcn_layer,
        partition_graph_halo,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=64, seed=4)
    n, d = feats.shape
    L = len(adj)
    params = rgcn_init(jax.random.PRNGKey(6), L, d)
    shards, n_local, n_global, halo_pad = partition_graph_halo(feats, adj, P_DEV)
    mesh = make_mesh(P_DEV, axis_name="gp")

    def loss_fn(W, stacked):
        def per_dev(W, shard):
            shard = jax.tree_util.tree_map(lambda x: x[0], shard)
            out = gp_halo_rgcn_layer(W, shard, shard.node_features, "gp",
                                     jax.nn.relu)
            local = jnp.sum(out**2 * shard.node_mask[:, None])
            return jax.lax.psum(local, "gp")

        sharded = shard_map(per_dev, mesh=mesh, in_specs=(P(), P("gp")),
                            out_specs=P(), check_vma=False)
        return sharded(W, stacked)

    dev_shards = jax.tree_util.tree_map(jnp.asarray, shards)
    g = jax.jit(jax.grad(loss_fn))(params["W"], dev_shards)
    assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# First-class runtime integration (GP_LAYERS zoo + task-generic steps)
# ---------------------------------------------------------------------------


def _layer_equivalence(layer_name, init_kwargs, apply_kwargs, seed=3):
    from tf_gnn_samples_tpu.nn.layers import LAYERS
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        GP_LAYERS, partition_graph,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=seed)
    n, d = feats.shape
    L = len(adj)
    init_fn, apply_fn = LAYERS[layer_name]
    params = init_fn(jax.random.PRNGKey(seed), L, d, **init_kwargs)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    h0 = jnp.asarray(batch.node_features)
    ref = apply_fn(
        params, jax.tree_util.tree_map(jnp.asarray, batch), h0,
        aggregation_strategy="segment", **apply_kwargs,
    )[:n]

    shards, n_local, n_global = partition_graph(feats, adj, P_DEV)
    mesh = make_mesh(P_DEV, axis_name="gp")
    gp_layer = GP_LAYERS[layer_name]

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_layer(params, shard, shard.node_features + 0.0, "gp",
                       **apply_kwargs)
        return out[None]

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P("gp"),), out_specs=P("gp"),
        check_vma=False,
    )
    out = jax.jit(sharded)(jax.tree_util.tree_map(jnp.asarray, shards))
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_ggnn_matches_single_device():
    _layer_equivalence("ggnn", {},
                       dict(gated_unit_type="gru",
                            activation_function="tanh"))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_rgat_matches_single_device():
    _layer_equivalence("rgat", dict(num_heads=4),
                       dict(num_heads=4, activation_function="tanh"))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_film_kw_matches_single_device():
    _layer_equivalence("gnn_film", {},
                       dict(activation_function="relu"))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("target_state", [False, True])
def test_gp_rgin_matches_single_device(target_state):
    _layer_equivalence(
        "rgin",
        dict(use_target_state_as_input=target_state,
             num_edge_MLP_hidden_layers=1),
        dict(activation_function="relu",
             use_target_state_as_input=target_state,
             num_edge_MLP_hidden_layers=1,
             typed_edge_scan="unroll"),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_rgin_no_mlp_matches_single_device():
    _layer_equivalence(
        "rgin",
        dict(num_edge_MLP_hidden_layers=None),
        dict(activation_function="relu",
             num_edge_MLP_hidden_layers=None,
             typed_edge_scan="unroll"),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("normalize", [False, True])
def test_gp_gnn_edge_mlp_matches_single_device(normalize):
    _layer_equivalence(
        "gnn_edge_mlp",
        dict(use_target_state_as_input=True, num_edge_hidden_layers=1),
        dict(activation_function="gelu",
             use_target_state_as_input=True, num_edge_hidden_layers=1,
             normalize_by_num_incoming=normalize,
             typed_edge_scan="unroll"),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("full_state,tie", [(False, False), (True, True),
                                            (False, True)])
def test_gp_rgdcn_matches_single_device(full_state, tie):
    _layer_equivalence(
        "rgdcn",
        dict(num_channels=4,
             use_full_state_for_channel_weights=full_state,
             tie_channel_weights=tie),
        dict(num_channels=4, activation_function="relu",
             use_full_state_for_channel_weights=full_state,
             tie_channel_weights=tie,
             typed_edge_scan="unroll"),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_film_halo_matches_single_device():
    from tf_gnn_samples_tpu.nn.layers import gnn_film_apply, gnn_film_init
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        gp_film_halo_layer, partition_graph_halo,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=5)
    n, d = feats.shape
    L = len(adj)
    params = gnn_film_init(jax.random.PRNGKey(5), L, d)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    ref = gnn_film_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch),
        jnp.asarray(batch.node_features),
        activation_function="relu", aggregation_strategy="segment",
    )[:n]

    shards, n_local, n_global, halo_pad = partition_graph_halo(
        feats, adj, P_DEV
    )
    mesh = make_mesh(P_DEV, axis_name="gp")

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_film_halo_layer(params, shard, shard.node_features + 0.0,
                                 "gp", activation_function="relu")
        return out[None]

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P("gp"),), out_specs=P("gp"),
        check_vma=False,
    )
    out = jax.jit(sharded)(jax.tree_util.tree_map(jnp.asarray, shards))
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
@pytest.mark.parametrize("model_name", ["RGCN", "GNN-FiLM", "GGNN", "RGAT",
                                        "RGIN", "GNN-Edge-MLP1", "RGDCN"])
def test_graph_parallel_model_train(model_name, tmp_path):
    """End-to-end: model.train with graph_parallel=2 runs the sharded
    propagation under the task-generic step and reduces the loss."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.tasks.base import DataFold

    model, task, samples = ge._tiny_task_and_model(
        model_name=model_name, hidden=16, n_layers=2, seed=21
    )
    model.params.update({
        "graph_parallel": 2,
        "max_epochs": 3,
        "patience": 10,
        "max_nodes_in_batch": 120,
    })
    task._loaded_data = {DataFold.TRAIN: samples,
                         DataFold.VALIDATION: samples}
    model.result_dir = str(tmp_path)
    model.train(quiet=True)
    log = open(model.log_file).read()
    import re as re_mod

    losses = [float(m) for m in re_mod.findall(r"Train: loss: ([0-9.]+)", log)]
    assert len(losses) == 3
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_graph_parallel_matches_single_device_step():
    """One GP train step must match the single-device step's loss/metrics
    on the same batch (same params, no dropout)."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.ops.graph import bucket_size
    from tf_gnn_samples_tpu.parallel.data_parallel import make_mesh
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        make_gp_task_steps, partition_task_batch,
    )
    from tf_gnn_samples_tpu.tasks.base import DataFold

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=16, n_layers=2, seed=22
    )
    batch = next(iter(task.make_minibatch_iterator(
        samples, DataFold.VALIDATION, 200)))
    dev_batch = model._device_batch(batch)
    _, ref_metrics = model._forward(model.model_params_tree, dev_batch, None)

    mesh = make_mesh(2, axis_name="gp")
    _, gp_eval = make_gp_task_steps(model, mesh)
    e_pad_total = bucket_size(
        sum(e.senders.shape[0] for e in batch.graph.edges), min_size=64
    )
    shards, _, _ = partition_task_batch(batch, 2, batch.graph.n_pad,
                                        e_pad_total)
    gp_metrics = gp_eval(model.model_params_tree, dev_batch, shards)
    np.testing.assert_allclose(float(gp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_gp_epoch_composes_with_device_cache():
    """graph_parallel > 1 + cache_batches_on_device: batches are packed
    and PARTITIONED once, then reused device-resident across epochs
    (host-side partitioning leaves the per-epoch critical path)."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.tasks.base import DataFold

    model, task, samples = ge._tiny_task_and_model(
        model_name="RGCN", hidden=32, n_layers=2, seed=7
    )
    model.params["graph_parallel"] = 2
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
            "gp", samples, DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
        assert n_graphs == len(samples)
    assert calls["n"] == 1  # packed + partitioned exactly once
    assert losses[-1] < losses[0], losses
    assert DataFold.TRAIN in model._gp_batch_cache

    # repack_cached_every invalidates on the cadence boundary:
    model.params["repack_cached_every"] = 2
    model._run_epoch("gp", samples, DataFold.TRAIN, quiet=True)  # epoch 4
    n_after = calls["n"]
    model._run_epoch("gp", samples, DataFold.TRAIN, quiet=True)  # epoch 5
    assert calls["n"] == n_after + 1
    task.make_minibatch_iterator = orig_iter


def _taint_from_all_gather(jaxpr, taint=None, collectives=("all_gather",)):
    """Walk a (possibly nested) jaxpr; return (tainted var ids, number of
    scatter/segment-sum eqns independent of the named collective(s), number
    dependent on them)."""
    taint = set() if taint is None else taint
    free_scatters = dep_scatters = 0
    for eqn in jaxpr.eqns:
        sub = None
        for v in ("jaxpr", "call_jaxpr"):
            if v in eqn.params:
                sub = eqn.params[v]
        if sub is not None:
            core = getattr(sub, "jaxpr", sub)
            # map taint through: invars of eqn -> invars of sub jaxpr
            inner_taint = {
                id(sv) for ov, sv in zip(eqn.invars, core.invars)
                if id(ov) in taint
            }
            t2, f2, d2 = _taint_from_all_gather(core, inner_taint,
                                                collectives)
            free_scatters += f2
            dep_scatters += d2
            # propagate sub outvars taint to eqn outvars
            for ov, sv in zip(eqn.outvars, core.outvars):
                if id(sv) in t2:
                    taint.add(id(ov))
            continue
        tainted_in = any(
            id(v) in taint for v in eqn.invars
            if not isinstance(v, jax.extend.core.Literal)
        )
        name = eqn.primitive.name
        if name in collectives:
            for v in eqn.outvars:
                taint.add(id(v))
            continue
        if "scatter" in name:
            if tainted_in:
                dep_scatters += 1
            else:
                free_scatters += 1
        if tainted_in:
            for v in eqn.outvars:
                taint.add(id(v))
    return taint, free_scatters, dep_scatters


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_overlap_split_matches_and_is_schedulable():
    """The source-ownership edge split must (a) reproduce the blocking
    all-gather layer exactly and (b) leave the LOCAL aggregation with no
    data dependency on the all_gather in the traced program — the
    structural property XLA's async collectives need to overlap the ICI
    exchange with local compute."""
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        gp_rgcn_layer_kw, partition_graph,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=9)
    n, d = feats.shape
    L = len(adj)
    params = rgcn_init(jax.random.PRNGKey(2), L, d)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    ref = rgcn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch),
        jnp.asarray(batch.node_features),
        activation_function="relu", aggregation_strategy="segment",
    )[:n]

    shards, n_local, n_global = partition_graph(feats, adj, P_DEV)
    assert shards.flat_local is not None
    mesh = make_mesh(P_DEV, axis_name="gp")

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_rgcn_layer_kw({"W": params["W"]}, shard,
                               shard.node_features + 0.0, "gp",
                               activation_function="relu")
        return out[None]

    sharded = shard_map(fwd, mesh=mesh, in_specs=(P("gp"),),
                        out_specs=P("gp"), check_vma=False)
    dev_shards = jax.tree_util.tree_map(jnp.asarray, shards)
    out = jax.jit(sharded)(dev_shards)
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)

    # Blocking variant (split stripped) must agree too:
    blocking = jax.tree_util.tree_map(jnp.asarray, shards)._replace(
        flat_local=None, flat_remote=None
    )
    out_b = jax.jit(sharded)(blocking)
    np.testing.assert_allclose(
        np.asarray(out_b.reshape(n_global, d)[:n]), np.asarray(ref),
        rtol=2e-4, atol=1e-5,
    )

    # Structural independence: at least one scatter/segment-sum runs with
    # NO data path from the all_gather (the local stream), and at least
    # one depends on it (the remote stream).
    jaxpr = jax.make_jaxpr(sharded)(dev_shards)
    _, free_scatters, dep_scatters = _taint_from_all_gather(jaxpr.jaxpr)
    assert free_scatters >= 1, "local aggregation depends on the collective"
    assert dep_scatters >= 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("layer_name,init_kwargs,apply_kwargs", [
    ("rgin", dict(num_edge_MLP_hidden_layers=1),
     dict(activation_function="relu", num_edge_MLP_hidden_layers=1)),
    ("gnn_edge_mlp", dict(use_target_state_as_input=True,
                          num_edge_hidden_layers=1),
     dict(activation_function="gelu", use_target_state_as_input=True,
          num_edge_hidden_layers=1)),
    ("rgdcn", dict(num_channels=4),
     dict(num_channels=4, activation_function="relu")),
    ("gnn_film", {}, dict(activation_function="relu")),
])
def test_gp_overlap_schedulable_all_families(layer_name, init_kwargs,
                                             apply_kwargs):
    """Every split-aware GP family must keep at least one aggregation
    with NO data path from the all_gather (the async-overlap property)."""
    from tf_gnn_samples_tpu.nn.layers import LAYERS
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        GP_LAYERS, partition_graph,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=11)
    n, d = feats.shape
    L = len(adj)
    init_fn, _ = LAYERS[layer_name]
    params = init_fn(jax.random.PRNGKey(11), L, d, **init_kwargs)
    shards, n_local, n_global = partition_graph(feats, adj, P_DEV)
    mesh = make_mesh(P_DEV, axis_name="gp")
    gp_layer = GP_LAYERS[layer_name]

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = gp_layer(params, shard, shard.node_features + 0.0, "gp",
                       **apply_kwargs)
        return out[None]

    sharded = shard_map(fwd, mesh=mesh, in_specs=(P("gp"),),
                        out_specs=P("gp"), check_vma=False)
    dev_shards = jax.tree_util.tree_map(jnp.asarray, shards)
    jaxpr = jax.make_jaxpr(sharded)(dev_shards)
    _, free_scatters, dep_scatters = _taint_from_all_gather(jaxpr.jaxpr)
    assert free_scatters >= 1, layer_name
    assert dep_scatters >= 1, layer_name


# ---------------------------------------------------------------------------
# Family-complete halo exchange (GP_HALO_LAYERS + graph_parallel_halo)
# ---------------------------------------------------------------------------

_HALO_FAMILY_CASES = [
    ("rgcn", {}, dict(activation_function="relu")),
    ("rgcn", {"use_both_source_and_target": True},
     dict(activation_function="relu", use_both_source_and_target=True)),
    ("ggnn", {}, dict(gated_unit_type="gru", activation_function="tanh")),
    ("rgat", dict(num_heads=4),
     dict(num_heads=4, activation_function="tanh")),
    ("gnn_film", {}, dict(activation_function="relu")),
    ("rgin", dict(use_target_state_as_input=True,
                  num_edge_MLP_hidden_layers=1),
     dict(activation_function="relu", use_target_state_as_input=True,
          num_edge_MLP_hidden_layers=1, typed_edge_scan="unroll")),
    ("rgin", dict(num_edge_MLP_hidden_layers=None),
     dict(activation_function="relu", num_edge_MLP_hidden_layers=None,
          typed_edge_scan="unroll")),
    ("gnn_edge_mlp", dict(use_target_state_as_input=True,
                          num_edge_hidden_layers=1),
     dict(activation_function="gelu", use_target_state_as_input=True,
          num_edge_hidden_layers=1, normalize_by_num_incoming=True,
          typed_edge_scan="unroll")),
    ("rgdcn", dict(num_channels=4),
     dict(num_channels=4, activation_function="relu",
          typed_edge_scan="unroll")),
]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("layer_name,init_kwargs,apply_kwargs",
                         _HALO_FAMILY_CASES)
def test_gp_halo_layer_matches_single_device(layer_name, init_kwargs,
                                             apply_kwargs, seed=7):
    """Every halo-exchange layer (GP_HALO_LAYERS) must reproduce the
    single-device layer on the same graph and weights."""
    from tf_gnn_samples_tpu.nn.layers import LAYERS
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        GP_HALO_LAYERS, partition_graph_halo,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=seed)
    n, d = feats.shape
    L = len(adj)
    init_fn, apply_fn = LAYERS[layer_name]
    params = init_fn(jax.random.PRNGKey(seed), L, d, **init_kwargs)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=128)
    ref = apply_fn(
        params, jax.tree_util.tree_map(jnp.asarray, batch),
        jnp.asarray(batch.node_features),
        aggregation_strategy="segment", **apply_kwargs,
    )[:n]

    shards, n_local, n_global, halo_pad = partition_graph_halo(
        feats, adj, P_DEV
    )
    # Per-pair boundary lists stay below the full node table (this dense
    # random graph makes nearly every node boundary, so the aggregate
    # saving here is vs the all-gather's L * N, not N):
    assert halo_pad < n_global
    mesh = make_mesh(P_DEV, axis_name="gp")
    halo_layer = GP_HALO_LAYERS[layer_name]

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = halo_layer(params, shard, shard.node_features + 0.0, "gp",
                         **apply_kwargs)
        return out[None]

    sharded = shard_map(
        fwd, mesh=mesh, in_specs=(P("gp"),), out_specs=P("gp"),
        check_vma=False,
    )
    out = jax.jit(sharded)(jax.tree_util.tree_map(jnp.asarray, shards))
    out = out.reshape(n_global, d)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gp_halo_overlap_split_is_schedulable():
    """The halo layers' LOCAL-source aggregation must have no data path
    from the all_to_all in the traced program (the structural property
    XLA's async collectives need to overlap the boundary exchange with
    local compute). Trace-level verification only — device-trace overlap
    needs real multi-chip hardware."""
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        GP_HALO_LAYERS, partition_graph_halo,
    )

    P_DEV = 4
    feats, adj = _random_typed_graph(n=96, seed=11)
    n, d = feats.shape
    L = len(adj)
    params = rgcn_init(jax.random.PRNGKey(3), L, d)
    shards, _, _, _ = partition_graph_halo(feats, adj, P_DEV)
    mesh = make_mesh(P_DEV, axis_name="gp")

    def fwd(shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        out = GP_HALO_LAYERS["rgcn"](params, shard,
                                     shard.node_features + 0.0, "gp",
                                     activation_function="relu")
        return out[None]

    sharded = shard_map(fwd, mesh=mesh, in_specs=(P("gp"),),
                        out_specs=P("gp"), check_vma=False)
    jaxpr = jax.make_jaxpr(sharded)(
        jax.tree_util.tree_map(jnp.asarray, shards)
    )
    _, free_scatters, dep_scatters = _taint_from_all_gather(
        jaxpr.jaxpr, collectives=("all_to_all",)
    )
    assert free_scatters >= 1, "local aggregation depends on the all_to_all"
    assert dep_scatters >= 1


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
@pytest.mark.parametrize("model_name", ["RGCN", "GNN-FiLM", "GGNN", "RGAT",
                                        "RGIN", "GNN-Edge-MLP1", "RGDCN"])
def test_graph_parallel_halo_model_train(model_name, tmp_path):
    """End-to-end: model.train with graph_parallel=2 AND
    graph_parallel_halo runs the halo task-generic step and reduces the
    loss — the param is first-class through _run_epoch_graph_parallel."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.tasks.base import DataFold

    model, task, samples = ge._tiny_task_and_model(
        model_name=model_name, hidden=16, n_layers=2, seed=23
    )
    model.params.update({
        "graph_parallel": 2,
        "graph_parallel_halo": True,
        "max_epochs": 5,
        "patience": 10,
        "max_nodes_in_batch": 120,
    })
    task._loaded_data = {DataFold.TRAIN: samples,
                         DataFold.VALIDATION: samples}
    model.result_dir = str(tmp_path)
    model.train(quiet=True)
    log = open(model.log_file).read()
    import re as re_mod

    losses = [float(m) for m in re_mod.findall(r"Train: loss: ([0-9.]+)", log)]
    assert len(losses) == 5
    assert min(losses[1:]) < losses[0], losses


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_graph_parallel_halo_matches_single_device_step():
    """One halo GP eval step must match the single-device step's loss on
    the same batch (same params, no dropout)."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.ops.graph import bucket_size
    from tf_gnn_samples_tpu.parallel.graph_parallel import (
        make_gp_task_steps, partition_task_batch_halo,
    )
    from tf_gnn_samples_tpu.tasks.base import DataFold

    model, task, samples = ge._tiny_task_and_model(
        model_name="GNN-FiLM", hidden=16, n_layers=2, seed=24
    )
    batch = next(iter(task.make_minibatch_iterator(
        samples, DataFold.VALIDATION, 200)))
    dev_batch = model._device_batch(batch)
    _, ref_metrics = model._forward(model.model_params_tree, dev_batch, None)

    mesh = make_mesh(2, axis_name="gp")
    _, gp_eval = make_gp_task_steps(model, mesh)
    e_pad_total = bucket_size(
        sum(e.senders.shape[0] for e in batch.graph.edges), min_size=64
    )
    shards, _, _, _ = partition_task_batch_halo(
        batch, 2, batch.graph.n_pad, e_pad_total
    )
    gp_metrics = gp_eval(model.model_params_tree, dev_batch,
                         jax.tree_util.tree_map(jnp.asarray, shards))
    np.testing.assert_allclose(float(gp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)
