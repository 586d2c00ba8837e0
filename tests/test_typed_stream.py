"""Typed-stream lax.scan path (ops/typed_stream.py): numerical parity with
the unrolled per-type path for RGIN / GNN-Edge-MLP / RGDCN (forward AND
gradients), plus compile-graph L-independence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_gnn_samples_tpu.nn import layers as L
from tf_gnn_samples_tpu.ops.typed_stream import stack_edges

from helpers import make_batch, random_typed_graph

RNG = np.random.default_rng(7)
DIM = 8


def _setup(num_edge_types=5, num_nodes=17, feat_dim=DIM):
    feats, adj = random_typed_graph(
        RNG, num_nodes=num_nodes, num_edge_types=num_edge_types,
        feat_dim=feat_dim,
    )
    return feats, make_batch(feats, adj)


def _loss_of(apply_fn, params, batch, h, **kw):
    def loss(p, x):
        out = apply_fn(p, batch, x, **kw)
        return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.5))

    return loss


def _assert_paths_match(apply_fn, params, batch, h, **kw):
    out_u = apply_fn(params, batch, h, typed_edge_scan="unroll", **kw)
    out_s = apply_fn(params, batch, h, typed_edge_scan="scan", **kw)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=2e-5, atol=2e-6
    )
    lu = _loss_of(apply_fn, params, batch, h, typed_edge_scan="unroll", **kw)
    ls = _loss_of(apply_fn, params, batch, h, typed_edge_scan="scan", **kw)
    gu = jax.grad(lu, argnums=(0, 1))(params, h)
    gs = jax.grad(ls, argnums=(0, 1))(params, h)
    flat_u, _ = jax.tree_util.tree_flatten(gu)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for a, b in zip(flat_u, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


def test_stack_edges_invariants():
    _, batch = _setup()
    te = stack_edges(batch)
    em = max(e.senders.shape[0] for e in batch.edges)
    assert te.senders.shape == (batch.num_edge_types, em)
    for row in range(batch.num_edge_types):
        rcv = np.asarray(te.receivers[row])
        assert (np.diff(rcv) >= 0).all()  # receivers stay sorted
        snd_sorted = np.asarray(te.senders_sorted[row])
        assert (np.diff(snd_sorted) >= 0).all()
        perm = np.sort(np.asarray(te.perm_by_sender[row]))
        np.testing.assert_array_equal(perm, np.arange(em))  # valid perm


@pytest.mark.parametrize("aggregation", ["sum", "mean", "max", "sqrt_n"])
def test_rgin_scan_matches_unroll(aggregation):
    feats, batch = _setup()
    params = L.rgin_init(jax.random.key(0), 5, DIM)
    _assert_paths_match(
        L.rgin_apply, params, batch, batch.node_features,
        message_aggregation_function=aggregation, num_timesteps=2,
    )


def test_rgin_scan_target_state_input():
    feats, batch = _setup()
    params = L.rgin_init(
        jax.random.key(1), 5, DIM, use_target_state_as_input=True,
        num_edge_MLP_hidden_layers=2,
    )
    _assert_paths_match(
        L.rgin_apply, params, batch, batch.node_features,
        use_target_state_as_input=True, num_edge_MLP_hidden_layers=2,
    )


@pytest.mark.parametrize("normalize", [False, True])
def test_edge_mlp_scan_matches_unroll(normalize):
    feats, batch = _setup()
    params = L.gnn_edge_mlp_init(jax.random.key(2), 5, DIM)
    _assert_paths_match(
        L.gnn_edge_mlp_apply, params, batch, batch.node_features,
        normalize_by_num_incoming=normalize, num_timesteps=2,
    )


@pytest.mark.parametrize("full_state,tie", [(False, False), (True, True)])
def test_rgdcn_scan_matches_unroll(full_state, tie):
    feats, batch = _setup()
    params = L.rgdcn_init(
        jax.random.key(3), 5, DIM, num_channels=2,
        use_full_state_for_channel_weights=full_state,
        tie_channel_weights=tie,
    )
    _assert_paths_match(
        L.rgdcn_apply, params, batch, batch.node_features,
        num_channels=2, use_full_state_for_channel_weights=full_state,
        tie_channel_weights=tie, num_timesteps=2,
    )


def test_auto_engages_on_many_types():
    from tf_gnn_samples_tpu.ops.typed_stream import scan_types_wanted

    _, few = _setup(num_edge_types=3)
    _, many = _setup(num_edge_types=9)
    assert not scan_types_wanted(few, "auto")
    assert scan_types_wanted(many, "auto")
    assert scan_types_wanted(few, "scan")
    assert not scan_types_wanted(many, "unroll")


def _jaxpr_eqns(apply_fn, init_fn, num_types, **kw):
    feats, adj = random_typed_graph(
        RNG, num_nodes=17, num_edge_types=num_types, feat_dim=DIM
    )
    batch = make_batch(feats, adj)
    params = init_fn(jax.random.key(4), num_types, DIM, **kw)

    def step(p, x):
        out = apply_fn(p, batch, x, typed_edge_scan="scan", **kw)
        return jnp.sum(out * out)

    grad_fn = jax.grad(step)
    jaxpr = jax.make_jaxpr(grad_fn)(params, batch.node_features)
    return sum(1 for _ in jaxpr.jaxpr.eqns)


@pytest.mark.parametrize(
    "apply_fn,init_fn,kw",
    [
        (L.rgin_apply, L.rgin_init, {}),
        (L.gnn_edge_mlp_apply, L.gnn_edge_mlp_init, {}),
        (L.rgdcn_apply, L.rgdcn_init, {"num_channels": 2}),
    ],
    ids=["rgin", "edge_mlp", "rgdcn"],
)
def test_compile_graph_size_independent_of_type_count(apply_fn, init_fn, kw):
    """The scanned grad jaxpr must not grow with the number of edge types
    (the body is traced once) — the unrolled path grows linearly."""
    small = _jaxpr_eqns(apply_fn, init_fn, 4, **kw)
    large = _jaxpr_eqns(apply_fn, init_fn, 24, **kw)
    # stack_edges contributes O(L) trivial pad/stack eqns; allow those but
    # nothing proportional to the per-type compute block.
    assert large - small <= 8 * (24 - 4), (small, large)
