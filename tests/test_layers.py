"""Per-layer numerical goldens vs an independent numpy edge-loop reference,
plus padding-invariance and permutation-equivariance property tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_gnn_samples_tpu.nn import layers as L

import reference_numpy as ref
from helpers import incoming_counts, make_batch, random_typed_graph

DIM = 8
HEADS = 2
RNG = np.random.default_rng(42)


def _setup(num_edge_types=3, num_nodes=13, feat_dim=DIM):
    feats, adj = random_typed_graph(
        RNG, num_nodes=num_nodes, num_edge_types=num_edge_types, feat_dim=feat_dim
    )
    counts = incoming_counts(adj, num_nodes)
    batch = make_batch(feats, adj)
    return feats, adj, counts, batch


def _real(x, n):
    return np.asarray(x)[:n]


def test_rgcn_matches_reference():
    feats, adj, counts, batch = _setup()
    params = L.rgcn_init(jax.random.key(0), 3, DIM)
    for aggregation in ["sum", "mean", "max", "sqrt_n"]:
        got = _real(
            L.rgcn_apply(
                params, batch, batch.node_features,
                message_aggregation_function=aggregation, num_timesteps=2,
            ),
            len(feats),
        )
        want = ref.rgcn(params, feats, adj, counts, aggregation=aggregation,
                        timesteps=2)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rgcn_concat_source_target():
    feats, adj, counts, batch = _setup()
    params = L.rgcn_init(jax.random.key(1), 3, DIM, use_both_source_and_target=True)
    got = _real(
        L.rgcn_apply(params, batch, batch.node_features,
                     use_both_source_and_target=True),
        len(feats),
    )
    want = ref.rgcn(params, feats, adj, counts, use_both=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ggnn_gru_matches_reference():
    feats, adj, counts, batch = _setup()
    params = L.ggnn_init(jax.random.key(2), 3, DIM)
    got = _real(
        L.ggnn_apply(params, batch, batch.node_features, num_timesteps=2),
        len(feats),
    )
    want = ref.ggnn_gru(params, feats, adj, timesteps=2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gnn_film_matches_reference():
    feats, adj, counts, batch = _setup()
    params = L.gnn_film_init(jax.random.key(3), 3, DIM)
    for normalize in [False, True]:
        got = _real(
            L.gnn_film_apply(params, batch, batch.node_features,
                             normalize_by_num_incoming=normalize),
            len(feats),
        )
        want = ref.gnn_film(params, feats, adj, counts, normalize=normalize)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rgat_matches_reference():
    feats, adj, counts, batch = _setup()
    params = L.rgat_init(jax.random.key(4), 3, DIM, num_heads=HEADS)
    got = _real(
        L.rgat_apply(params, batch, batch.node_features, num_heads=HEADS),
        len(feats),
    )
    want = ref.rgat(params, feats, adj, num_heads=HEADS)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rgin_matches_reference():
    feats, adj, counts, batch = _setup()
    for use_target, edge_hidden, aggr_hidden in [
        (False, 1, None),
        (True, 1, None),
        (False, 2, 1),
        (False, None, None),
    ]:
        params = L.rgin_init(
            jax.random.key(5), 3, DIM,
            use_target_state_as_input=use_target,
            num_edge_MLP_hidden_layers=edge_hidden,
            num_aggr_MLP_hidden_layers=aggr_hidden,
        )
        got = _real(
            L.rgin_apply(
                params, batch, batch.node_features,
                use_target_state_as_input=use_target,
                num_edge_MLP_hidden_layers=edge_hidden,
                num_aggr_MLP_hidden_layers=aggr_hidden,
            ),
            len(feats),
        )
        want = ref.rgin(params, feats, adj, use_target=use_target,
                        edge_hidden=edge_hidden, aggr_hidden=aggr_hidden)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gnn_edge_mlp_matches_reference():
    feats, adj, counts, batch = _setup()
    for n_hidden in [0, 1]:
        params = L.gnn_edge_mlp_init(
            jax.random.key(6), 3, DIM, num_edge_hidden_layers=n_hidden
        )
        got = _real(
            L.gnn_edge_mlp_apply(
                params, batch, batch.node_features,
                activation_function="gelu",
                num_edge_hidden_layers=n_hidden,
                normalize_by_num_incoming=True,
            ),
            len(feats),
        )
        want = ref.gnn_edge_mlp(params, feats, adj, counts, normalize=True)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rgdcn_matches_reference():
    feats, adj, counts, batch = _setup()
    C, K = 2, DIM // 2
    for full_state, tie in [(False, False), (True, True)]:
        params = L.rgdcn_init(
            jax.random.key(7), 3, DIM, num_channels=C, channel_dim=K,
            use_full_state_for_channel_weights=full_state,
            tie_channel_weights=tie,
        )
        got = _real(
            L.rgdcn_apply(
                params, batch, batch.node_features, num_channels=C, channel_dim=K,
                use_full_state_for_channel_weights=full_state,
                tie_channel_weights=tie,
            ),
            len(feats),
        )
        want = ref.rgdcn(params, feats, adj, counts, C, K,
                         use_full_state=full_state, tie_channels=tie)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name", list(L.LAYERS))
def test_padding_invariance(name):
    """Growing n_pad / e_pad / g_pad must not change real-node outputs."""
    feats, adj, counts, batch = _setup()
    init, apply = L.LAYERS[name]
    kwargs = {}
    if name == "rgat":
        kwargs = {"num_heads": HEADS}
    if name == "rgdcn":
        kwargs = {"num_channels": 2, "channel_dim": DIM // 2}
    params = init(jax.random.key(8), 3, DIM, **kwargs)
    out_small = _real(apply(params, batch, batch.node_features, **kwargs), len(feats))
    big = make_batch(feats, adj, n_pad=64, e_pad_extra=17, g_pad=32)
    out_big = _real(apply(params, big, big.node_features, **kwargs), len(feats))
    np.testing.assert_allclose(out_small, out_big, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", list(L.LAYERS))
def test_permutation_equivariance(name):
    """Relabeling nodes permutes outputs identically."""
    feats, adj, counts, batch = _setup()
    n = len(feats)
    init, apply = L.LAYERS[name]
    kwargs = {}
    if name == "rgat":
        kwargs = {"num_heads": HEADS}
    if name == "rgdcn":
        kwargs = {"num_channels": 2, "channel_dim": DIM // 2}
    params = init(jax.random.key(9), 3, DIM, **kwargs)
    out = _real(apply(params, batch, batch.node_features, **kwargs), n)

    perm = np.random.default_rng(3).permutation(n)
    adj_p = [perm[a] for a in adj]
    feats_p = np.zeros_like(feats)
    feats_p[perm] = feats
    batch_p = make_batch(feats_p, adj_p)
    out_p = _real(apply(params, batch_p, batch_p.node_features, **kwargs), n)
    np.testing.assert_allclose(out_p[perm], out, rtol=1e-4, atol=1e-5)
