"""Tests for the Pallas streaming segment-sum kernel (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.ops.graph import pad_graph_batch
from tf_gnn_samples_tpu.ops.pallas_segment import (
    BLOCK,
    CHUNK,
    aggregate_flat_sum_pallas,
    ranked_segment_sum,
)


def _ranks_from_receivers(rcv_sorted):
    is_new = np.empty(len(rcv_sorted), dtype=bool)
    is_new[0] = True
    is_new[1:] = rcv_sorted[1:] != rcv_sorted[:-1]
    return (np.cumsum(is_new) - 1).astype(np.int32)


@pytest.mark.parametrize("seed,density", [(0, 4), (1, 40), (2, 1)])
def test_ranked_segment_sum_matches_numpy(seed, density):
    rng = np.random.RandomState(seed)
    E, D = 2 * BLOCK, 64
    n_nodes = max(E // density, 2)
    rcv = np.sort(rng.randint(0, n_nodes, size=E)).astype(np.int32)
    ranks = _ranks_from_receivers(rcv)
    msgs = rng.randn(E, D).astype(np.float32)

    u_out = ((int(ranks.max()) + 2 * CHUNK + 1 + CHUNK) // CHUNK) * CHUNK
    out = ranked_segment_sum(
        jnp.asarray(msgs), jnp.asarray(ranks), u_out=u_out, interpret=True
    )
    expected = np.zeros((u_out, D), np.float32)
    np.add.at(expected, ranks, msgs)
    n_ranks = int(ranks.max()) + 1
    np.testing.assert_allclose(
        np.asarray(out[:n_ranks]), expected[:n_ranks], rtol=1e-4, atol=1e-4
    )


def test_ranked_segment_sum_wide_gaps():
    """Receivers with huge id gaps — rank compression must make the kernel
    exact regardless."""
    E, D = BLOCK, 8
    rcv = np.sort(np.arange(E) * 137).astype(np.int32)  # all distinct, gappy
    ranks = _ranks_from_receivers(rcv)
    msgs = np.ones((E, D), np.float32)
    u_out = ((int(ranks.max()) + 3 * CHUNK) // CHUNK) * CHUNK
    out = ranked_segment_sum(
        jnp.asarray(msgs), jnp.asarray(ranks), u_out=u_out, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out[:E]), msgs, rtol=1e-4)


def _random_batch(seed=0, n=200, L=3):
    rng = np.random.RandomState(seed)
    adj = [rng.randint(0, n, size=(rng.randint(n, 3 * n), 2)).astype(np.int32)
           for _ in range(L)]
    feats = rng.randn(n, 16).astype(np.float32)
    return pad_graph_batch(
        feats, adj, np.zeros(n, np.int32), 1,
        e_pads=[BLOCK] * L,
    )


def test_aggregate_flat_pallas_matches_xla():
    batch = _random_batch()
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = np.random.RandomState(1)
    E_tot = dev.flat.receivers.shape[0]
    msgs = jnp.asarray(rng.randn(E_tot, 32).astype(np.float32))

    from tf_gnn_samples_tpu.ops.edge_ops import aggregate_flat_sum

    ref = aggregate_flat_sum(msgs, dev.flat, dev.n_pad)
    out = aggregate_flat_sum_pallas(msgs, dev.flat, dev, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_aggregate_flat_pallas_gradient():
    batch = _random_batch(seed=2)
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    rng = np.random.RandomState(3)
    E_tot = dev.flat.receivers.shape[0]
    msgs = jnp.asarray(rng.randn(E_tot, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(dev.n_pad, 16).astype(np.float32))

    from tf_gnn_samples_tpu.ops.edge_ops import aggregate_flat_sum

    def loss_pallas(m):
        return jnp.sum(
            aggregate_flat_sum_pallas(m, dev.flat, dev, interpret=True) * w
        )

    def loss_xla(m):
        return jnp.sum(aggregate_flat_sum(m, dev.flat, dev.n_pad) * w)

    g1 = jax.grad(loss_pallas)(msgs)
    g2 = jax.grad(loss_xla)(msgs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
