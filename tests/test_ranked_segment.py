"""Rank-table streaming kernels (ops/ranked_segment.py) vs XLA oracles.

Runs the Pallas kernels in interpreter mode on CPU (the conftest forces
JAX_PLATFORMS=cpu), exercising the exact kernel logic that compiles on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.ops import ranked_segment as rs


def make_stream(rng, e_tot, n_real, n_pad, frac_pad=0.1):
    """Receiver-sorted edge stream with gap-free ranks and a padded tail."""
    n_edges = int(e_tot * (1 - frac_pad))
    rcv = np.sort(rng.randint(0, n_real, size=n_edges)).astype(np.int32)
    uniq, rank = np.unique(rcv, return_inverse=True)
    rank = rank.astype(np.int32)
    dump_rank = int(rank[-1]) + 1 if n_edges else 0
    full_rank = np.full(e_tot, dump_rank, dtype=np.int32)
    full_rank[:n_edges] = rank
    node_to_rank = np.zeros(n_pad, dtype=np.int32)
    node_to_rank[uniq] = np.arange(len(uniq))
    has_in = np.zeros(n_pad, dtype=np.float32)
    has_in[uniq] = 1.0
    return full_rank, node_to_rank, has_in, n_edges


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(rs, "_FORCE_INTERPRET", True)


@pytest.mark.parametrize("block_edges", [128, 256])
def test_segment_sum_matches_xla(block_edges):
    rng = np.random.RandomState(0)
    e_tot, n_real, n_pad, d = 4096, 300, 320, 64
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    rows = rs.rank_table_rows(n_pad, block_edges)
    out = rs.ranked_segment_sum_table(msgs, jnp.asarray(rank), rows,
                                      block_edges)
    ref = rs.xla_segment_sum_table(msgs, jnp.asarray(rank), rows,
                                   block_edges)
    # bf16 rounding of message values inside the kernel:
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-1)


def test_segment_sum_exact_on_bf16_inputs():
    rng = np.random.RandomState(1)
    e_tot, n_real, n_pad, d = 2048, 150, 256, 128
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    msgs = jnp.asarray(rng.randn(e_tot, d)).astype(jnp.bfloat16)
    rows = rs.rank_table_rows(n_pad, 256)
    out = rs.ranked_segment_sum_table(msgs, jnp.asarray(rank), rows, 256)
    ref = rs.xla_segment_sum_table(msgs.astype(jnp.float32),
                                   jnp.asarray(rank), rows, 256)
    # identical accumulation order per rank (stream order), f32 accumulate:
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_expand_matches_take():
    rng = np.random.RandomState(2)
    e_tot, n_real, n_pad, d = 4096, 200, 256, 96
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    rpad = rs.rank_table_rows(n_pad, 256)
    table = jnp.asarray(rng.randn(rpad, d).astype(np.float32))
    out = rs.ranked_expand_table(table, jnp.asarray(rank), rpad, 256)
    ref = rs.xla_expand_table(table, jnp.asarray(rank), rpad, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_segment_sum_vjp_is_expand():
    rng = np.random.RandomState(3)
    e_tot, n_real, n_pad, d = 2048, 100, 128, 32
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    rpad = rs.rank_table_rows(n_pad, 256)
    w = jnp.asarray(rng.randn(rpad, d).astype(np.float32))

    def loss_k(m):
        return jnp.sum(rs.ranked_segment_sum_table(m, jnp.asarray(rank),
                                                   rpad, 256) * w)

    def loss_x(m):
        return jnp.sum(rs.xla_segment_sum_table(m, jnp.asarray(rank),
                                                rpad, 256) * w)

    gk = jax.grad(loss_k)(msgs)
    gx = jax.grad(loss_x)(msgs)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("act", ["relu", "tanh", "linear", "gelu"])
def test_film_aggregate_forward(act):
    rng = np.random.RandomState(4)
    e_tot, n_real, n_pad, d = 4096, 250, 256, 64
    rank, node_to_rank, has_in, _ = make_stream(rng, e_tot, n_real, n_pad)
    rpad = rs.rank_table_rows(n_pad, 256)
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    gb = jnp.asarray(rng.randn(rpad, 2 * d).astype(np.float32))
    out = rs.film_ranked_aggregate(msgs, gb, jnp.asarray(rank), act, 256)
    ref = rs.xla_film_aggregate(msgs, gb, jnp.asarray(rank), act, 256)
    real = np.asarray(has_in, dtype=bool)
    got_nodes = np.asarray(out)[node_to_rank][real]
    ref_nodes = np.asarray(ref)[node_to_rank][real]
    np.testing.assert_allclose(got_nodes, ref_nodes, rtol=3e-2, atol=3e-1)


def test_film_aggregate_grads():
    rng = np.random.RandomState(5)
    e_tot, n_real, n_pad, d = 2048, 120, 128, 32
    rank, node_to_rank, has_in, _ = make_stream(rng, e_tot, n_real, n_pad)
    rpad = rs.rank_table_rows(n_pad, 256)
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    gb = jnp.asarray(rng.randn(rpad, 2 * d).astype(np.float32))
    # weight only REAL node rows so dump/slack rows don't contribute:
    sel = np.zeros(rpad, dtype=np.float32)
    sel[node_to_rank[np.asarray(has_in, dtype=bool)]] = 1.0
    w = jnp.asarray(rng.randn(rpad, d).astype(np.float32) * sel[:, None])

    def loss_k(m, t):
        return jnp.sum(
            rs.film_ranked_aggregate(m, t, jnp.asarray(rank),
                                     "tanh", 256) * w)

    def loss_x(m, t):
        return jnp.sum(
            rs.xla_film_aggregate(m, t, jnp.asarray(rank),
                                  "tanh", 256) * w)

    gk_m, gk_t = jax.grad(loss_k, argnums=(0, 1))(msgs, gb)
    gx_m, gx_t = jax.grad(loss_x, argnums=(0, 1))(msgs, gb)
    np.testing.assert_allclose(np.asarray(gk_m), np.asarray(gx_m),
                               rtol=5e-2, atol=3e-1)
    # d_gb rows for real ranks only (slack rows see no real edges):
    real_rows = sel > 0
    np.testing.assert_allclose(np.asarray(gk_t)[real_rows],
                               np.asarray(gx_t)[real_rows],
                               rtol=5e-2, atol=3e-1)


def test_supported_predicate():
    rows = rs.rank_table_rows(6144, 256)
    assert rs.ranked_supported(4096, 320, rows)
    assert not rs.ranked_supported(4095, 320, rows)      # not 2048-aligned
    assert not rs.ranked_supported(1024, 320, rows)      # under one step
    assert not rs.ranked_supported(8192, 320,
                                   rs.rank_table_rows(300000, 256))


def _random_graph_batch(rng, n=300, n_pad=512, L=2, e_per_type=1900):
    # Dense enough (~6 edges per (receiver, type)) that the measured rank
    # window is compressive (<= 64) and the ranked fast paths ENGAGE
    # (layers.compressive_window); sparse graphs would silently fall back
    # to the XLA paths and these tests would compare XLA against itself.
    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch
    adj = [
        np.stack([rng.randint(0, n, size=e_per_type),
                  rng.randint(0, n, size=e_per_type)], axis=1).astype(np.int32)
        for _ in range(L)
    ]
    feats = rng.randn(n, 64).astype(np.float32)
    gids = np.zeros(n, dtype=np.int32)
    batch = pad_graph_batch(feats, adj, gids, 1, n_pad=n_pad,
                            e_pads=[2048, 2048], g_pad=16)
    from tf_gnn_samples_tpu.ops.graph import token_window
    assert 0 < token_window(batch.flat.win_fine) <= 64
    return batch


def test_film_layer_fused_matches_segment_path():
    from tf_gnn_samples_tpu.nn.layers import gnn_film_apply, gnn_film_init

    rng = np.random.RandomState(7)
    graph = _random_graph_batch(rng)
    d = 64
    params = gnn_film_init(jax.random.PRNGKey(0), 2, d)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    out_seg = gnn_film_apply(params, graph, h, activation_function="relu",
                             aggregation_strategy="segment")
    out_fused = gnn_film_apply(params, graph, h, activation_function="relu",
                               aggregation_strategy="pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_fused)[real],
                               np.asarray(out_seg)[real],
                               rtol=5e-2, atol=5e-2)

    def loss(fn_strategy):
        def f(p, hh):
            out = gnn_film_apply(p, graph, hh, activation_function="relu",
                                 aggregation_strategy=fn_strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_seg = jax.grad(loss("segment"), argnums=(0, 1))(params, h)
    g_fus = jax.grad(loss("pallas"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_seg),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


def test_rgat_layer_streamed_matches_segment_path():
    """The 2-D bf16 streamed RGAT path (fine-rank expanded target logits,
    head-replicated attention lanes) must match the per-head segment path
    in outputs and gradients."""
    from tf_gnn_samples_tpu.nn.layers import rgat_apply, rgat_init

    rng = np.random.RandomState(12)
    graph = _random_graph_batch(rng)
    d = 64
    params = rgat_init(jax.random.PRNGKey(5), 2, d, num_heads=4)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    out_seg = rgat_apply(params, graph, h, num_heads=4,
                         aggregation_strategy="segment")
    out_str = rgat_apply(params, graph, h, num_heads=4,
                         aggregation_strategy="pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_str)[real],
                               np.asarray(out_seg)[real],
                               rtol=5e-2, atol=5e-2)

    def loss(strategy):
        def f(p, hh):
            out = rgat_apply(p, graph, hh, num_heads=4,
                             aggregation_strategy=strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_seg = jax.grad(loss("segment"), argnums=(0, 1))(params, h)
    g_str = jax.grad(loss("pallas"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_seg),
                    jax.tree_util.tree_leaves(g_str)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


def test_rgcn_layer_ranked_matches_segment_path():
    from tf_gnn_samples_tpu.nn.layers import rgcn_apply, rgcn_init

    rng = np.random.RandomState(8)
    graph = _random_graph_batch(rng)
    d = 64
    params = rgcn_init(jax.random.PRNGKey(1), 2, d)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    out_seg = rgcn_apply(params, graph, h, aggregation_strategy="segment")
    out_rank = rgcn_apply(params, graph, h, aggregation_strategy="pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_rank)[real],
                               np.asarray(out_seg)[real],
                               rtol=5e-2, atol=5e-2)


def test_film_layer_column_split_matches(monkeypatch):
    """When the gamma/beta tables exceed the VMEM budget, the fused path
    column-splits the elementwise-in-d modulation; results must match."""
    from tf_gnn_samples_tpu.nn.layers import gnn_film_apply, gnn_film_init

    rng = np.random.RandomState(9)
    graph = _random_graph_batch(rng)
    d = 256  # big enough that halving d actually halves the lane footprint
    params = gnn_film_init(jax.random.PRNGKey(3), 2, d)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    out_seg = gnn_film_apply(params, graph, h, activation_function="relu",
                             aggregation_strategy="segment")

    e_tot = graph.flat.tgt_rank.shape[0]
    rows = rs.fine_rank_table_rows(graph.n_pad, 2, e_tot, 256)
    # Small enough to force a split under the bf16 double-buffered stream
    # model (film_ranked_supported).
    monkeypatch.setattr(rs, "_VMEM_BUDGET", 4 * 1024 * 1024)
    assert rs.film_column_splits(e_tot, d, rows) in (2, 4)
    out_split = gnn_film_apply(params, graph, h, activation_function="relu",
                               aggregation_strategy="pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_split)[real],
                               np.asarray(out_seg)[real],
                               rtol=5e-2, atol=5e-2)


def test_ranked_gather_vjp_matches_legacy():
    """gather_flat_src/tgt with streaming ranked VJPs must produce the same
    gradients as the sorted-XLA-scatter path."""
    from tf_gnn_samples_tpu.ops import edge_ops as eo

    rng = np.random.RandomState(11)
    graph = _random_graph_batch(rng)
    L, n_pad, d = 2, graph.n_pad, 128
    table = jnp.asarray(rng.randn(L * n_pad, d).astype(np.float32))
    flat = graph.flat

    def loss_ranked(t):
        return jnp.sum(jnp.tanh(eo.gather_flat_src(t, flat))) + jnp.sum(
            jnp.tanh(eo.gather_flat_tgt(t, flat)))

    flat_legacy = flat._replace(src_sorted_rank=None, tgt_sorted_rank=None)

    def loss_legacy(t):
        return jnp.sum(jnp.tanh(eo.gather_flat_src(t, flat_legacy))) + jnp.sum(
            jnp.tanh(eo.gather_flat_tgt(t, flat_legacy)))

    out_r = loss_ranked(table)
    out_l = loss_legacy(table)
    np.testing.assert_allclose(float(out_r), float(out_l), rtol=1e-5)
    g_r = jax.grad(loss_ranked)(table)
    g_l = jax.grad(loss_legacy)(table)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_l),
                               rtol=3e-2, atol=3e-2)


def test_windowed_kernels_match_xla():
    """`win` (host-measured sub-block rank-window bound, ops/graph.py
    rank_window) shrinks the kernels' one-hot height; results must match
    the full-window kernels and the XLA oracle for any win >= the true
    span."""
    from tf_gnn_samples_tpu.ops.graph import rank_window

    rng = np.random.RandomState(21)
    e_tot, n_real, n_pad, d = 4096, 120, 128, 64
    # Dense stream: ~34 edges per receiver -> small per-sub-block spans.
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    win = rank_window(rank)
    assert win in (16, 32, 64, 128)
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    rows = rs.rank_table_rows(n_pad, 256)
    ranks_j = jnp.asarray(rank)
    ref = rs.xla_segment_sum_table(msgs, ranks_j, rows, 256)
    for w in {win, 128}:
        out = rs.ranked_segment_sum_table(msgs, ranks_j, rows, 256, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-1)
    # expand (and its role as the segsum VJP):
    table = jnp.asarray(rng.randn(rows, d).astype(np.float32))
    exp_ref = rs.xla_expand_table(table, ranks_j, rows, 256)
    exp_win = rs.ranked_expand_table(table, ranks_j, rows, 256, win)
    np.testing.assert_allclose(np.asarray(exp_win), np.asarray(exp_ref),
                               rtol=2e-2, atol=2e-1)
    # fused FiLM with window:
    gb = jnp.asarray(rng.randn(rows, 2 * d).astype(np.float32))
    film_ref = rs.xla_film_aggregate(
        msgs.astype(jnp.bfloat16), gb.astype(jnp.bfloat16), ranks_j, "relu")
    film_win = rs.film_ranked_aggregate(
        msgs.astype(jnp.bfloat16), gb, ranks_j, "relu", 256, win)
    np.testing.assert_allclose(np.asarray(film_win), np.asarray(film_ref),
                               rtol=5e-2, atol=5e-1)


def test_rank_window_measures_spans():
    from tf_gnn_samples_tpu.ops.graph import rank_window

    # One rank per edge (worst case): span == block -> no useful window.
    assert rank_window(np.arange(2048, dtype=np.int32)) == 0
    # Constant rank: minimal window.
    assert rank_window(np.zeros(2048, dtype=np.int32)) == 16
    # ~20 edges per rank: span ~13 + alignment -> 32 bucket.
    r = np.repeat(np.arange(128, dtype=np.int32), 20)[:2048]
    assert rank_window(r) in (16, 32)


def test_dilute_src_stream_invariants():
    """The diluted src stream (FlatEdges.sd_*) must (a) keep every real
    edge exactly once in order, (b) bound every 256-block's aligned rank
    span by the returned W, (c) keep ranks nondecreasing with fill slots
    keyed to the dump fine row."""
    from tf_gnn_samples_tpu.ops.graph import _dilute_src_stream

    from tf_gnn_samples_tpu.ops.graph import SD_FILL

    rng = np.random.RandomState(0)
    # Mixed degrees incl. a degree-1 region that breaks plain windows.
    degs = np.concatenate([
        rng.randint(8, 40, size=500), np.ones(600, np.int64)])
    ranks = np.repeat(np.arange(len(degs), dtype=np.int32), degs)
    fine = rng.randint(0, 999, size=len(ranks)).astype(np.int32)
    cap = -(-9 * len(ranks) // (8 * 2048)) * 2048
    out = _dilute_src_stream(ranks, [fine], cap)
    assert out is not None
    sd_rank, (sd_fine,), w = out
    assert sd_rank.shape == (cap,)
    real = sd_fine != SD_FILL
    np.testing.assert_array_equal(sd_rank[real], ranks)
    np.testing.assert_array_equal(sd_fine[real], fine)
    assert np.all(np.diff(sd_rank) >= 0)
    for s in range(0, cap, 256):
        blk = sd_rank[s:s + 256]
        assert int(blk[-1]) - (int(blk[0]) & ~7) + 1 <= w

    # Impossible cap -> None (callers fall back to the undiluted stream).
    assert _dilute_src_stream(ranks, [fine], 2048) is None


def test_graph_batch_sd_stream_fields():
    """build_graph_batch emits the diluted stream with a usable window on
    low-degree graphs where win_src collapses to 0."""
    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch, token_window

    rng = np.random.RandomState(1)
    n = 700
    # Degree-1 chain edges (span-killers) plus a denser type.
    adj0 = np.stack([np.arange(n - 1), np.arange(1, n)], 1).astype(np.int32)
    adj1 = rng.randint(0, n, size=(4000, 2)).astype(np.int32)
    g = pad_graph_batch(
        node_features=rng.randn(n, 8).astype(np.float32),
        adjacency_lists=[adj0, adj1],
        node_graph_ids=np.zeros(n, np.int32),
        num_graphs=1,
    )
    from tf_gnn_samples_tpu.ops.graph import SD_FILL

    fl = g.flat
    assert fl.sd_rank is not None and fl.sd_fine is not None
    w = token_window(fl.win_sd)
    assert w in (32, 64, 128)
    assert fl.sd_rank.shape[0] % 2048 == 0
    # Real slots reproduce the src-sorted real prefix exactly.
    real = np.asarray(fl.sd_fine) != SD_FILL
    e_real = int(np.asarray(fl.mask).sum())
    np.testing.assert_array_equal(
        np.asarray(fl.sd_rank)[real],
        np.asarray(fl.src_sorted_rank)[:e_real],
    )
    # sd_coarse mirrors the coarse receiver rank in src order.
    np.testing.assert_array_equal(
        np.asarray(fl.sd_coarse)[real],
        np.asarray(fl.rcv_rank)[np.asarray(fl.perm_by_src)][:e_real],
    )


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "tanh"])
def test_film_layer_fused_grads_other_acts(act, monkeypatch):
    """With the gather-fused src pass force-enabled, relu / leaky_relu
    ride it (affine-in-mask act') and tanh falls back to
    film_ranked_aggregate — all must match the segment path in outputs
    and gradients."""
    monkeypatch.setattr(rs, "ENABLE_FUSED_SRC_PASS", True)
    from tf_gnn_samples_tpu.nn.layers import gnn_film_apply, gnn_film_init

    rng = np.random.RandomState(13)
    graph = _random_graph_batch(rng)
    d = 64
    params = gnn_film_init(jax.random.PRNGKey(2), 2, d)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    def loss(strategy):
        def f(p, hh):
            out = gnn_film_apply(p, graph, hh, activation_function=act,
                                 aggregation_strategy=strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    out_seg = gnn_film_apply(params, graph, h, activation_function=act,
                             aggregation_strategy="segment")
    out_fus = gnn_film_apply(params, graph, h, activation_function=act,
                             aggregation_strategy="pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_fus)[real],
                               np.asarray(out_seg)[real],
                               rtol=5e-2, atol=5e-2)
    g_seg = jax.grad(loss("segment"), argnums=(0, 1))(params, h)
    g_fus = jax.grad(loss("pallas"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_seg),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


@pytest.mark.parametrize("family", ["rgin", "edge_mlp"])
def test_node_table_mlp_ranked_matches_unrolled(family):
    """The all-node-side MLP + flat ranked aggregation fast path (valid
    for use_target_state_as_input=False) must match the per-edge unrolled
    path in outputs and gradients."""
    from tf_gnn_samples_tpu.nn.layers import (
        gnn_edge_mlp_apply, gnn_edge_mlp_init, rgin_apply, rgin_init)

    rng = np.random.RandomState(17)
    graph = _random_graph_batch(rng)
    d = 64
    if family == "rgin":
        params = rgin_init(jax.random.PRNGKey(6), 2, d,
                           use_target_state_as_input=False)
        def run(p, hh, strategy):
            return rgin_apply(p, graph, hh,
                              use_target_state_as_input=False,
                              typed_edge_scan=strategy)
    else:
        params = gnn_edge_mlp_init(jax.random.PRNGKey(7), 2, d,
                                   use_target_state_as_input=False)
        def run(p, hh, strategy):
            return gnn_edge_mlp_apply(p, graph, hh,
                                      use_target_state_as_input=False,
                                      normalize_by_num_incoming=True,
                                      typed_edge_scan=strategy)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    out_ref_ = run(params, h, "unroll")
    out_rank = run(params, h, "auto")  # ranked fast path (interpret mode)
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_rank)[real],
                               np.asarray(out_ref_)[real],
                               rtol=5e-2, atol=5e-2)

    def loss(strategy):
        def f(p, hh):
            out = run(p, hh, strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss("unroll"), argnums=(0, 1))(params, h)
    g_rank = jax.grad(loss("auto"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_rank)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


@pytest.mark.parametrize("normalize", [False, True])
def test_edge_mlp0_target_fused_film_matches_unrolled(normalize):
    """GNN-Edge-MLP0 with target-state input rides the fused FiLM kernel
    (gamma = norm, beta = norm * tt): outputs and grads must match the
    unrolled per-edge path."""
    from tf_gnn_samples_tpu.nn.layers import (gnn_edge_mlp_apply,
                                              gnn_edge_mlp_init)

    rng = np.random.RandomState(19)
    graph = _random_graph_batch(rng)
    d = 64
    params = gnn_edge_mlp_init(jax.random.PRNGKey(8), 2, d,
                               use_target_state_as_input=True,
                               num_edge_hidden_layers=0)

    def run(p, hh, strategy):
        return gnn_edge_mlp_apply(p, graph, hh,
                                  use_target_state_as_input=True,
                                  num_edge_hidden_layers=0,
                                  normalize_by_num_incoming=normalize,
                                  typed_edge_scan=strategy)

    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    out_ref_ = run(params, h, "unroll")
    out_fus = run(params, h, "auto")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_fus)[real],
                               np.asarray(out_ref_)[real],
                               rtol=5e-2, atol=5e-2)

    def loss(strategy):
        def f(p, hh):
            out = run(p, hh, strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss("unroll"), argnums=(0, 1))(params, h)
    g_fus = jax.grad(loss("auto"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


def test_edge_mlp1_self_loop_type_node_side_matches_unrolled():
    """A pure self-loop edge type (PPI/QM9 add_self_loop_edges) is
    combined NODE-SIDE by the type-major GNN-Edge-MLP1 path (its tm_self
    token is shape-encoded by pad_graph_batch); outputs and grads must
    match the unrolled per-edge path, including self-edge multiplicity."""
    from tf_gnn_samples_tpu.nn.layers import (gnn_edge_mlp_apply,
                                              gnn_edge_mlp_init)
    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch, token_window
    from tf_gnn_samples_tpu.ops.edge_ops import tm_self_types

    rng = np.random.RandomState(7)
    n, n_pad, d = 300, 512, 64
    nodes = np.arange(n, dtype=np.int32)
    self_adj = np.stack([nodes, nodes], axis=1)
    # One node gets a DOUBLE self loop (multiplicity 2).
    self_adj = np.concatenate([self_adj, self_adj[:1]], axis=0)
    dense_adj = np.stack([rng.randint(0, n, size=1900),
                          rng.randint(0, n, size=1900)], axis=1
                         ).astype(np.int32)
    graph = pad_graph_batch(
        rng.randn(n, d).astype(np.float32), [dense_adj, self_adj],
        np.zeros(n, np.int32), 1, n_pad=n_pad, e_pads=[2048, 2048],
        g_pad=16,
    )
    assert tm_self_types(graph) == (False, True)
    assert 0 < token_window(graph.flat.win_tm) <= 64

    params = gnn_edge_mlp_init(jax.random.PRNGKey(3), 2, d,
                               use_target_state_as_input=True,
                               num_edge_hidden_layers=1)

    def run(p, hh, strategy):
        return gnn_edge_mlp_apply(p, graph, hh,
                                  activation_function="gelu",
                                  use_target_state_as_input=True,
                                  num_edge_hidden_layers=1,
                                  typed_edge_scan=strategy)

    h = jnp.asarray(rng.randn(n_pad, d).astype(np.float32))
    out_ref_ = run(params, h, "unroll")
    out_tm = run(params, h, "auto")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_tm)[real],
                               np.asarray(out_ref_)[real],
                               rtol=5e-2, atol=8e-2)

    def loss(strategy):
        def f(p, hh):
            out = run(p, hh, strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss("unroll"), argnums=(0, 1))(params, h)
    g_tm = jax.grad(loss("auto"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tm)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


@pytest.mark.parametrize("act", ["gelu", "relu"])
def test_edge_mlp1_typed_dense_fused_matches_unrolled(act):
    """GNN-Edge-MLP1 (target state + one hidden layer) rides the fused
    typed-dense aggregate kernel; outputs and grads must match the
    unrolled per-edge path."""
    from tf_gnn_samples_tpu.nn.layers import (gnn_edge_mlp_apply,
                                              gnn_edge_mlp_init)

    rng = np.random.RandomState(23)
    graph = _random_graph_batch(rng)
    d = 64
    params = gnn_edge_mlp_init(jax.random.PRNGKey(9), 2, d,
                               use_target_state_as_input=True,
                               num_edge_hidden_layers=1)

    def run(p, hh, strategy):
        return gnn_edge_mlp_apply(p, graph, hh,
                                  activation_function=act,
                                  use_target_state_as_input=True,
                                  num_edge_hidden_layers=1,
                                  typed_edge_scan=strategy)

    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    out_ref_ = run(params, h, "unroll")
    out_fus = run(params, h, "auto")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_fus)[real],
                               np.asarray(out_ref_)[real],
                               rtol=5e-2, atol=8e-2)

    def loss(strategy):
        def f(p, hh):
            out = run(p, hh, strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss("unroll"), argnums=(0, 1))(params, h)
    g_fus = jax.grad(loss("auto"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


def test_rgdcn_flat_ranked_neighbor_sums_match():
    """RGDCN's aggregate-first neighbor sums via the flat fine-rank
    kernel must match the per-type XLA path in outputs and grads."""
    from tf_gnn_samples_tpu.nn.layers import rgdcn_apply, rgdcn_init

    rng = np.random.RandomState(29)
    graph = _random_graph_batch(rng)
    d, C = 64, 4
    params = rgdcn_init(jax.random.PRNGKey(11), 2, d, num_channels=C)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    def run(p, hh, strategy, agg_strategy="auto"):
        return rgdcn_apply(p, graph, hh, num_channels=C,
                           typed_edge_scan=strategy,
                           aggregation_strategy=agg_strategy)

    out_ref_ = run(params, h, "unroll", "segment")
    # "pallas" declines the dense-adjacency path so the flat fine-rank
    # kernel branch is what actually runs here (interpret mode):
    out_rank = run(params, h, "auto", "pallas")
    real = np.asarray(graph.node_mask) > 0
    np.testing.assert_allclose(np.asarray(out_rank)[real],
                               np.asarray(out_ref_)[real],
                               rtol=5e-2, atol=5e-2)

    def loss(strategy, agg_strategy):
        def f(p, hh):
            out = run(p, hh, strategy, agg_strategy)
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss("unroll", "segment"), argnums=(0, 1))(params, h)
    g_rank = jax.grad(loss("auto", "pallas"), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_rank)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=8e-2, atol=8e-1)


def test_transposed_kernels_match_oracles():
    """Head-major segsum_t/expand_t and the transposed weighted segsum
    must match their row-major oracles (including VJPs)."""
    rng = np.random.RandomState(31)
    e_tot, n_real, n_pad, d, k = 4096, 250, 256, 64, 4
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    rows = rs.rank_table_rows(n_pad, 256)
    ranks_j = jnp.asarray(rank)

    m_t = jnp.asarray(rng.randn(k, e_tot).astype(np.float32))
    out_t = rs.ranked_segment_sum_table_t(m_t, ranks_j, rows, 256)
    ref = rs.xla_segment_sum_table(m_t.T, ranks_j, rows, 256)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref).T,
                               rtol=2e-2, atol=2e-1)

    table_t = jnp.asarray(rng.randn(k, rows).astype(np.float32))
    exp_t = rs.ranked_expand_table_t(table_t, ranks_j, rows, 256)
    exp_ref = rs.xla_expand_table(table_t.T, ranks_j, rows, 256)
    np.testing.assert_allclose(np.asarray(exp_t), np.asarray(exp_ref).T,
                               rtol=2e-2, atol=2e-2)

    # weighted segsum: w head-major [K, E] vs row-major oracle
    msgs = jnp.asarray(rng.randn(e_tot, d).astype(np.float32))
    w_t = jnp.asarray(rng.rand(k, e_tot).astype(np.float32))

    def loss_t(m, w):
        return jnp.sum(rs.ranked_weighted_segment_sum_t(
            m, w, ranks_j, rows, k, 256) ** 2)

    def loss_row(m, w):
        return jnp.sum(rs.ranked_weighted_segment_sum(
            m, w.T, ranks_j, rows, k, 256) ** 2)

    np.testing.assert_allclose(float(loss_t(msgs, w_t)),
                               float(loss_row(msgs, w_t)),
                               rtol=3e-2)
    gm_t, gw_t = jax.grad(loss_t, argnums=(0, 1))(msgs, w_t)
    gm_r, gw_r = jax.grad(loss_row, argnums=(0, 1))(msgs, w_t)
    np.testing.assert_allclose(np.asarray(gm_t), np.asarray(gm_r),
                               rtol=5e-2, atol=5e-1)
    # loss_row transposes INSIDE, so its grad w.r.t. w_t is already [K, E]
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r),
                               rtol=5e-2, atol=5e-1)


def test_typed_dense_aggregate_matches_oracle():
    """Fused typed-dense aggregate vs an explicit XLA formulation,
    forward and VJPs (dx and dW)."""
    rng = np.random.RandomState(37)
    e_tot, n_real, n_pad, dh, d, L = 2048, 120, 128, 32, 32, 3
    rank, _, _, _ = make_stream(rng, e_tot, n_real, n_pad)
    rows = rs.rank_table_rows(n_pad, 256)
    ranks_j = jnp.asarray(rank)
    types = jnp.asarray(rng.randint(0, L, size=e_tot), jnp.int32)
    x = jnp.asarray(rng.randn(e_tot, dh), jnp.bfloat16)
    w = jnp.asarray(rng.randn(L, dh, d).astype(np.float32))

    def oracle(xx, ww):
        # Quantize w like the kernel (bf16 operands, f32 accumulate) so
        # relu' boundary decisions agree between the two formulations.
        w16 = ww.astype(jnp.bfloat16).astype(jnp.float32)
        y = jnp.einsum("eh,lhd->eld", xx.astype(jnp.float32), w16)
        sel = jax.nn.one_hot(types, L, dtype=jnp.float32)
        z = jnp.einsum("eld,el->ed", y, sel)
        a = jnp.maximum(z, 0.0)
        return rs.xla_segment_sum_table(a, ranks_j, rows, 256)

    out = rs.typed_dense_aggregate(x, w, types, ranks_j, rows, "relu", 256)
    ref = oracle(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-1)

    wgt = jnp.asarray(rng.randn(rows, d).astype(np.float32))

    def loss_k(xx, ww):
        return jnp.sum(rs.typed_dense_aggregate(
            xx, ww, types, ranks_j, rows, "relu", 256) * wgt)

    def loss_o(xx, ww):
        return jnp.sum(oracle(xx, ww) * wgt)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    go = jax.grad(loss_o, argnums=(0, 1))(x, w)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, np.float32),
            rtol=8e-2, atol=8e-1)


@pytest.mark.parametrize("aggregation", ["sum", "mean"])
def test_gather_aggregate_src_matches_unfused(aggregation):
    """Fused gather+segment-sum (src-order backward, edge_ops
    _gather_segsum): outputs AND gradients must match the unfused
    gather_flat_src -> aggregate_flat_ranked pair."""
    from tf_gnn_samples_tpu.ops.edge_ops import (
        aggregate_flat_ranked,
        gather_aggregate_src,
        gather_aggregate_src_ok,
        gather_flat_src,
    )

    rng = np.random.RandomState(11)
    graph = _random_graph_batch(rng)
    L, n_pad, d = 2, graph.n_pad, 64
    assert gather_aggregate_src_ok(graph, aggregation, d)
    table = jnp.asarray(
        rng.randn(L * n_pad + 1, d).astype(np.float32)
    ).astype(jnp.bfloat16)

    def unfused(tbl):
        m = gather_flat_src(tbl, graph.flat)
        return aggregate_flat_ranked(m, graph, aggregation)

    def fused(tbl):
        return gather_aggregate_src(tbl, graph, aggregation)

    out_u = unfused(table)
    out_f = fused(table)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-2, atol=2e-2)

    cot = jnp.asarray(rng.randn(n_pad, d).astype(np.float32))

    def loss(fn, tbl):
        return jnp.sum(fn(tbl).astype(jnp.float32) * cot)

    g_u = jax.grad(lambda tbl: loss(unfused, tbl))(table)
    g_f = jax.grad(lambda tbl: loss(fused, tbl))(table)
    np.testing.assert_allclose(
        np.asarray(g_f, dtype=np.float32),
        np.asarray(g_u, dtype=np.float32), rtol=5e-2, atol=5e-2,
    )
    # The padded dump row must receive no gradient.
    assert float(jnp.abs(g_f[-1]).max()) == 0.0


@pytest.mark.parametrize("normalize", [False, True])
def test_gather_aggregate_fine_matches_unfused(normalize):
    """Fused gather + FINE-rank segment-sum (src-order backward,
    edge_ops._gather_segsum_fine): fine-table outputs AND gradients must
    match the unfused gather_flat_src -> ranked_segment_sum_table pair."""
    from tf_gnn_samples_tpu.ops.edge_ops import (
        gather_aggregate_fine,
        gather_aggregate_fine_ok,
        gather_flat_src,
    )
    from tf_gnn_samples_tpu.ops.graph import token_window

    rng = np.random.RandomState(23)
    graph = _random_graph_batch(rng)
    flat = graph.flat
    L, n_pad, d = graph.num_edge_types, graph.n_pad, 64
    assert gather_aggregate_fine_ok(graph, d)
    e_tot = flat.src_flat.shape[0]
    fine_rows = rs.fine_rank_table_rows(n_pad, L, e_tot, 256)
    table = jnp.asarray(
        rng.randn(L * n_pad + 1, d).astype(np.float32)
    ).astype(jnp.bfloat16)

    def unfused(tbl):
        m = gather_flat_src(tbl, flat)
        if normalize:
            m = m.astype(jnp.float32) * flat.norm_scale[:, None]
        return rs.ranked_segment_sum_table(
            m, flat.tgt_rank, fine_rows, 256, token_window(flat.win_fine)
        )

    def fused(tbl):
        return gather_aggregate_fine(tbl, graph, normalize)

    out_u = unfused(table)
    out_f = fused(table)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-2, atol=2e-2)

    cot = jnp.asarray(rng.randn(*out_u.shape).astype(np.float32))

    def loss(fn, tbl):
        return jnp.sum(fn(tbl).astype(jnp.float32) * cot)

    g_u = jax.grad(lambda tbl: loss(unfused, tbl))(table)
    g_f = jax.grad(lambda tbl: loss(fused, tbl))(table)
    np.testing.assert_allclose(
        np.asarray(g_f, dtype=np.float32),
        np.asarray(g_u, dtype=np.float32), rtol=5e-2, atol=5e-2,
    )
    # The padded dump row must receive no gradient.
    assert float(jnp.abs(g_f[-1]).max()) == 0.0


def test_rgat_fused_pass_matches_unfused_streamed(monkeypatch):
    """The src-order recompute backward (rgat_fused_pass) must match the
    unfused streamed path — which routes the message cotangent through the
    generic gather VJP — in forward EXACTLY (identical op pipeline) and in
    gradients to the bf16-side-table tolerance."""
    from tf_gnn_samples_tpu.nn.layers import rgat_apply, rgat_init

    rng = np.random.RandomState(21)
    graph = _random_graph_batch(rng)
    d = 64
    params = rgat_init(jax.random.PRNGKey(9), 2, d, num_heads=4)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    def run(p, hh):
        out = rgat_apply(p, graph, hh, num_heads=4,
                         aggregation_strategy="pallas")
        return out, jnp.sum((out * graph.node_mask[:, None]) ** 2)

    out_fused = run(params, h)[0]
    g_fused = jax.grad(lambda p, hh: run(p, hh)[1], argnums=(0, 1))(params, h)

    monkeypatch.setattr(rs, "rgat_fused_supported",
                        lambda *a, **k: False)
    out_unfused = run(params, h)[0]
    g_unfused = jax.grad(lambda p, hh: run(p, hh)[1], argnums=(0, 1))(
        params, h)

    # The fused forward rounds the per-rank source logit halves to bf16
    # (they ride the type-stacked table as extra lanes); outputs differ
    # from the per-edge f32-accumulated unfused path by that rounding.
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_unfused), rtol=2e-2, atol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(g_unfused),
                    jax.tree_util.tree_leaves(g_fused)):
        # atol covers bf16 side-table noise on near-zero entries (grad
        # magnitudes here are ~20; observed max abs deviation ~0.035).
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=1e-1)


def test_edge_mlp1_src_recompute_bwd_matches(monkeypatch):
    """The GNN-Edge-MLP1 src-order recompute backward (emlp1_tm_pass)
    must match the path that permutes the [E, D] cotangent through the
    generic type-major gather VJP — forward exactly (identical op
    pipeline), gradients to bf16 side-table tolerance."""
    from tf_gnn_samples_tpu.nn.layers import (gnn_edge_mlp_apply,
                                              gnn_edge_mlp_init)

    # The pass is OFF by default (measured slower than the permute on the
    # v5e bench shapes) — force it on to keep its numerics pinned.
    monkeypatch.setattr(rs, "ENABLE_EMLP1_SRC_PASS", True)
    rng = np.random.RandomState(31)
    graph = _random_graph_batch(rng)
    d = 64
    params = gnn_edge_mlp_init(jax.random.PRNGKey(13), 2, d,
                               use_target_state_as_input=True,
                               num_edge_hidden_layers=1)

    def run(p, hh):
        return gnn_edge_mlp_apply(p, graph, hh,
                                  activation_function="gelu",
                                  use_target_state_as_input=True,
                                  num_edge_hidden_layers=1,
                                  typed_edge_scan="auto")

    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))

    calls = {"n": 0}
    orig = rs.emlp1_tm_pass

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(rs, "emlp1_tm_pass", spy)
    out_fused = run(params, h)
    g_fused = jax.grad(
        lambda p, hh: jnp.sum((run(p, hh) * graph.node_mask[:, None]) ** 2),
        argnums=(0, 1),
    )(params, h)
    assert calls["n"] >= 1, "fused src path not taken"

    monkeypatch.setattr(rs, "emlp1_src_supported", lambda *a, **k: False)
    out_unfused = run(params, h)
    g_unfused = jax.grad(
        lambda p, hh: jnp.sum((run(p, hh) * graph.node_mask[:, None]) ** 2),
        argnums=(0, 1),
    )(params, h)

    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_unfused),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_unfused),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=1e-1)


def test_fused_pass_gates_engage_at_bench_shapes():
    """Eligibility-gate regression guard: the fused src-order passes must
    remain ELIGIBLE at the PPI bench shapes. A mis-counted VMEM term here
    silently falls back to the permute path and reads as a plausible
    (old) benchmark number — this failure mode cost two wrong
    measurements in round 4 (docs/PERFORMANCE.md round-4 caution)."""
    d = 320
    # GNN-FiLM tuned fold (6k-node batches): E_pad ~301k.
    e_film = 147 * rs.STEP
    n_film = 6400
    film_rows = rs.fine_rank_table_rows(n_film, 3, e_film, 256)
    film_src_rows = rs.src_rank_table_rows(3 * n_film, e_film, 256)
    assert rs.film_fused_src_supported("relu", e_film, d, film_rows,
                                       film_src_rows)
    # RGAT tuned fold: E_pad ~547k, the observed src-rank table height.
    e_rgat = 267 * rs.STEP
    n_rgat = 12800
    rgat_rows = rs.rank_table_rows(n_rgat, 256)
    assert rs.rgat_fused_supported(e_rgat, d, 4, rgat_rows, 27920)


def test_sd_stream_engages_at_ppi_statistics():
    """Dilution-engagement guard: at PPI-like degree structure (mean ~28
    per type, a low-degree tail) the fine window AND the diluted src
    window must both engage — a silent fallback to the 264-wide src
    one-hots reads as a plausible old benchmark number (same failure
    mode as the VMEM-gate guard above)."""
    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch, token_window

    rng = np.random.RandomState(7)
    n = 2400
    adj = []
    for _ in range(3):
        deg = np.maximum(rng.poisson(28, size=n), 0)
        deg[rng.choice(n, size=n // 50, replace=False)] = 1  # deg-1 tail
        src = np.repeat(np.arange(n), deg)
        dst = rng.randint(0, n, size=len(src))
        adj.append(np.stack([src, dst], 1).astype(np.int32))
    g = pad_graph_batch(
        node_features=rng.randn(n, 8).astype(np.float32),
        adjacency_lists=adj,
        node_graph_ids=np.zeros(n, np.int32),
        num_graphs=1,
    )
    assert token_window(g.flat.win_fine) > 0
    assert token_window(g.flat.win_sd) in (32, 64, 128)


def test_unify_flat_windows_keeps_dilution_across_lengths():
    """Fold-level guard for the bench regression where unify_flat_windows
    rebuilt EVERY batch as the undiluted fallback (win_sd -> 0) whenever
    a fold's buckets carried different sd cap lengths — silently pushing
    the src-order backwards onto 264-wide one-hots for the whole cached
    fold. When all batches are sd-engaged, unify must EXTEND the shorter
    diluted streams with inert fill slots and keep the window engaged,
    and a consumer's gradients must be unchanged by the extension."""
    from tf_gnn_samples_tpu.ops.graph import (SD_FILL, token_window,
                                              unify_flat_windows)
    from tf_gnn_samples_tpu.nn.layers import rgat_apply, rgat_init

    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch

    rng = np.random.RandomState(3)
    g_small = _random_graph_batch(rng, e_per_type=1900)
    adj = [
        np.stack([rng.randint(0, 500, size=3500),
                  rng.randint(0, 500, size=3500)], 1).astype(np.int32)
        for _ in range(2)
    ]
    g_big = pad_graph_batch(rng.randn(500, 64).astype(np.float32), adj,
                            np.zeros(500, np.int32), 1, n_pad=512,
                            e_pads=[4096, 4096], g_pad=16)
    f_s, f_b = g_small.flat, g_big.flat
    assert token_window(f_s.win_sd) and token_window(f_b.win_sd)
    assert f_s.sd_rank.shape[0] != f_b.sd_rank.shape[0]

    u_s, u_b = unify_flat_windows([f_s, f_b])
    cap = max(int(f_s.sd_rank.shape[0]), int(f_b.sd_rank.shape[0]))
    assert u_s.sd_rank.shape[0] == u_b.sd_rank.shape[0] == cap
    w_uni = token_window(u_s.win_sd)
    assert w_uni in (32, 64, 128)  # the regression forced 0 here
    assert w_uni >= max(token_window(f_s.win_sd), token_window(f_b.win_sd))

    # The extended stream is the original plus inert fill: real slots
    # unchanged, appended slots repeat the last rank and key SD_FILL.
    n_orig = int(f_s.sd_rank.shape[0])
    np.testing.assert_array_equal(np.asarray(u_s.sd_rank)[:n_orig],
                                  np.asarray(f_s.sd_rank))
    np.testing.assert_array_equal(np.asarray(u_s.sd_fine)[:n_orig],
                                  np.asarray(f_s.sd_fine))
    np.testing.assert_array_equal(np.asarray(u_s.sd_coarse)[:n_orig],
                                  np.asarray(f_s.sd_coarse))
    assert np.all(np.asarray(u_s.sd_fine)[n_orig:] == SD_FILL)
    assert np.all(np.asarray(u_s.sd_rank)[n_orig:]
                  == np.asarray(f_s.sd_rank)[-1])
    # Window invariant still holds on the extended stream.
    sd = np.asarray(u_s.sd_rank)
    for s in range(0, cap, 256):
        blk = sd[s:s + 256]
        assert int(blk[-1]) - (int(blk[0]) & ~7) + 1 <= w_uni

    # End-to-end: RGAT grads through the fused pass are unchanged by the
    # extension (fill slots key zero-cotangent slack rows).
    d = 64
    params = rgat_init(jax.random.PRNGKey(5), 2, d, num_heads=4)
    h = jnp.asarray(rng.randn(g_small.n_pad, d).astype(np.float32))
    g_uni = g_small._replace(flat=u_s)

    def loss(graph):
        def f(p, hh):
            out = rgat_apply(p, graph, hh, num_heads=4,
                             aggregation_strategy="pallas")
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_pre = jax.grad(loss(g_small), argnums=(0, 1))(params, h)
    g_post = jax.grad(loss(g_uni), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre),
                    jax.tree_util.tree_leaves(g_post)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_unify_extension_preserves_rgin_coarse_grads():
    """Companion to the unify-dilution guard for the sd_coarse consumer:
    the coarse gather+segsum fused backward (ops/edge_ops) must also be
    gradient-exact on a fill-extended diluted stream."""
    from tf_gnn_samples_tpu.ops.graph import token_window, unify_flat_windows
    from tf_gnn_samples_tpu.nn.layers import rgin_apply, rgin_init

    from tf_gnn_samples_tpu.ops.graph import pad_graph_batch

    rng = np.random.RandomState(11)
    g_a = _random_graph_batch(rng, e_per_type=1900)
    adj = [
        np.stack([rng.randint(0, 400, size=3200),
                  rng.randint(0, 400, size=3200)], 1).astype(np.int32)
        for _ in range(2)
    ]
    g_b = pad_graph_batch(rng.randn(400, 64).astype(np.float32), adj,
                          np.zeros(400, np.int32), 1, n_pad=512,
                          e_pads=[4096, 4096], g_pad=16)
    assert token_window(g_a.flat.win_sd) and token_window(g_b.flat.win_sd)
    u_a, u_b = unify_flat_windows([g_a.flat, g_b.flat])
    assert token_window(u_b.win_sd) in (32, 64, 128)
    grown = g_b if u_b.sd_rank.shape[0] > g_b.flat.sd_rank.shape[0] else g_a
    u_grown = u_b if grown is g_b else u_a
    assert u_grown.sd_rank.shape[0] > grown.flat.sd_rank.shape[0]
    g_uni = grown._replace(flat=u_grown)

    d = 64
    params = rgin_init(jax.random.PRNGKey(2), 2, d,
                       use_target_state_as_input=False)
    h = jnp.asarray(rng.randn(grown.n_pad, d).astype(np.float32))

    def loss(graph):
        def f(p, hh):
            out = rgin_apply(p, graph, hh,
                             use_target_state_as_input=False,
                             typed_edge_scan="auto")
            return jnp.sum((out * graph.node_mask[:, None]) ** 2)
        return f

    g_pre = jax.grad(loss(grown), argnums=(0, 1))(params, h)
    g_post = jax.grad(loss(g_uni), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre),
                    jax.tree_util.tree_leaves(g_post)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)
