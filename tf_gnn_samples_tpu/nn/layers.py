"""The seven relational message-passing layers, TPU-first.

Numerics contract: each `<name>_apply` reproduces the update equation of the
reference's `gnns/<name>.py` free function (equations documented at
ggnn.py:21-25, rgcn.py:26-31, rgat.py:23-33, rgin.py:24-38,
gnn_edge_mlp.py:24-29, gnn_film.py:22-29, rgdcn.py:27-56), over a padded
static-shape `GraphBatch` instead of dynamic per-type adjacency lists.

TPU-first design (deliberately NOT a translation):

* Per-edge-type Dense transforms are stacked into single [L, D_in, D_out]
  tensors and applied to *all nodes at once* with one einsum — one large
  MXU matmul instead of L small per-edge gathers+matmuls. This is
  numerically identical (modulo float reassociation) to the reference's
  L separate `tf.keras.layers.Dense` per-type transforms and follows the
  trick the reference itself notes for RGAT (gnns/rgat.py:88-91).
* Messages are materialized per type as gathers from the transformed node
  tensors, then scatter-aggregated via a single fused `segment_*` over the
  flat edge set, with padded edges routed to a dump row (see ops/graph.py).
* Weights are shared across `num_timesteps` repetitions, matching the
  reference (layers built once outside the timestep loop).

Each layer is a pair of pure functions:
    <name>_init(key, num_edge_types, state_dim, **cfg) -> params (pytree)
    <name>_apply(params, graph: GraphBatch, h: [N, D], **cfg) -> [N, D]
"""

from typing import List

import numpy as np

import jax
import jax.numpy as jnp


from ..ops.edge_ops import (
    aggregate_blocks,
    aggregate_flat,
    aggregate_sum_block,
    aggregate_flat_ranked,
    aggregate_flat_sum,
    dense_aggregate_linear,
    gather_aggregate_fine,
    gather_aggregate_fine_ok,
    gather_aggregate_src,
    gather_aggregate_src_ok,
    gather_flat_src,
    gather_flat_tgt,
    fine_rank_to_flat,
    fine_table_to_nodes,
    take_by_fine_rank,
    gather_src,
    gather_src_stacked,
    gather_tgt,
    gather_tgt_stacked,
    ranked_aggregation_ok,
    ranked_table_to_nodes,
    segment_softmax_flat,
    segment_softmax_flat_ranked_t,
    gather_tm_src,
    take_by_tm_rank,
    tm_available,
    tm_self_types,
    tm_table_to_nodes,
)
from ..ops.graph import GraphBatch, token_window
from ..ops.typed_stream import (
    scan_types_aggregate,
    scan_types_wanted,
    stack_edges,
)
from .activations import get_activation
from .cells import cell_apply, cell_init
from .initializers import stacked_glorot_uniform, truncated_normal
from .normalization import layer_norm, layer_norm_init


# --------------------------------------------------------------------------
# Shared helpers
# --------------------------------------------------------------------------

def typed_transform(h, W):
    """All-type node transform: [N, D_in] x [L, D_in, D_out] -> [L, N, D_out]."""
    return jnp.einsum("nd,lde->lne", h, W, preferred_element_type=jnp.float32)



def src_stream(flat):
    """(fine_rank_by_src, src_sorted_rank, win) for the src-order backward
    kernels: the DILUTED stream (ops/graph.py FlatEdges.sd_*) when its
    window engaged — low-degree regions otherwise zero win_src for the
    whole fold and force the kernels onto BE+8-wide one-hots — else the
    undiluted stream."""
    w = token_window(getattr(flat, "win_sd", None))
    if w and getattr(flat, "sd_rank", None) is not None:
        return flat.sd_fine, flat.sd_rank, w
    return (flat.fine_rank_by_src, flat.src_sorted_rank,
            token_window(flat.win_src))


def compressive_window(flat) -> bool:
    """Heuristic gate for the ranked fast paths: engage only when the
    host-measured rank window actually compresses the kernels' one-hot
    work (dense per-type degree; PPI measures 32). At win >= 128 —
    sparse-degree shapes like QM9 / VarMisuse — the scan/unroll XLA
    paths match or beat the ranked kernels (tools/typed_scale_prof.py:
    RGIN at L=22, deg 2/type: ranked 50 ms vs scan/unroll ~35 ms)."""
    w = token_window(flat.win_fine)
    return 0 < w <= 64

def use_dense_strategy(graph: GraphBatch, aggregation: str, strategy: str) -> bool:
    """Pick the aggregation execution strategy for LINEAR-message layers.

    "dense" routes sum-aggregation through per-type dense-adjacency matmuls
    on the MXU (ops/edge_ops.py:dense_aggregate_linear) — wins when the
    padded graph is small enough that O(N^2 D) matmul FLOPs are cheaper
    than O(E D) gather/scatter HBM traffic. "auto" applies an n_pad
    threshold measured on v5e. "segment" always uses sorted segment ops.
    """
    if aggregation not in ("sum", "unsorted_segment_sum"):
        return False
    if strategy == "dense":
        return True
    if strategy in ("segment", "pallas"):
        return False
    # auto: bound the total dense-adjacency footprint, not just n_pad —
    # the runtime materializes L matrices of n_pad^2 f32 (bf16 when cached),
    # so many edge types shrink the viable node budget proportionally.
    adj_bytes = graph.num_edge_types * graph.n_pad * graph.n_pad * 4
    return graph.n_pad <= 16384 and adj_bytes <= 3 * 16384 * 16384 * 4


def aggregate_flat_auto(messages, graph: GraphBatch, aggregation: str,
                        strategy: str):
    """Flat-stream aggregation with strategy dispatch: the streaming
    rank-table Pallas kernel (ops/ranked_segment.py) when the shape
    qualifies and the strategy allows it, else XLA sorted segment ops."""
    d = int(np.prod(messages.shape[1:]))
    if strategy in ("auto", "pallas") and ranked_aggregation_ok(
        graph, aggregation, messages.ndim - 1, d
    ):
        return aggregate_flat_ranked(messages, graph, aggregation)
    return aggregate_flat(messages, graph.flat, graph.n_pad, aggregation)


def aggregate(messages: List[jnp.ndarray], graph: GraphBatch, aggregation: str):
    """Scatter-aggregate per-type message lists into [n_pad, D] using only
    sorted segment ops over the canonical receiver-sorted edge layout
    (replaces tf.unsorted_segment_* over dynamic shapes,
    e.g. gnns/rgcn.py:108-112)."""
    return aggregate_blocks(messages, graph, aggregation)


def normalize_by_incoming(messages, edge_block):
    """1/c_{v,l} message scaling (reference: gnns/rgcn.py:100-104).
    The factor mask/(c + SMALL_NUMBER) is precomputed per edge on the host
    (EdgeBlock.norm_scale)."""
    return messages * edge_block.norm_scale[:, None]


def _typed_linear_messages(h, W, graph, concat_target=False):
    """Per-type linear messages gathered per edge.

    With concat_target, implements Dense(concat(h_src, h_tgt)) by splitting
    the [L, 2D, D_out] weight into source/target halves — linearity makes
    the split exact while keeping both matmuls node-sided on the MXU.
    Returns list of L arrays [E_l, D_out].
    """
    if concat_target:
        d = h.shape[-1]
        t_src = typed_transform(h, W[:, :d, :])
        t_tgt = typed_transform(h, W[:, d:, :])
        return [
            gather_src(t_src[l], e) + gather_tgt(t_tgt[l], e)
            for l, e in enumerate(graph.edges)
        ]
    t = typed_transform(h, W)
    return [gather_src(t[l], e) for l, e in enumerate(graph.edges)]


def _flat(t):
    """[L, N, ...] type-stacked node table -> [L*N, ...] flat table."""
    return t.reshape((t.shape[0] * t.shape[1],) + t.shape[2:])


# NOTE on lane alignment (round 3): hidden 320 = 2.5 tiles of 128 lanes.
# In ISOLATION, 128-aligned widths gather 2.3-4.4x faster (see
# tools/rowgather_prof.py), so a lane-padded pipeline (pad node tables to
# 384 before the per-edge gathers, slice after the node-level combine)
# was built and measured end to end — and came out net SLOWER in-program:
# XLA's in-context gathers already run at the same ~325M rows/s either
# way, the algebraic simplifier narrows padded gathers back to 320 and
# re-pads the [E, D] result (0.7 ms/layer of pure pad) unless
# optimization_barrier'd, and the [E, 3D] backward stream grows 20%.


def _flat_linear_messages(h, W, graph, concat_target=False):
    """Flat-stream variant of _typed_linear_messages: one gather over the
    whole edge stream instead of L per-type gathers — the compute graph no
    longer scales with the number of edge types."""
    if concat_target:
        d = h.shape[-1]
        t_src = _flat(typed_transform(h, W[:, :d, :]))
        t_tgt = _flat(typed_transform(h, W[:, d:, :]))
        return gather_flat_src(t_src, graph.flat) + gather_flat_tgt(
            t_tgt, graph.flat
        )
    return gather_flat_src(_flat(typed_transform(h, W)), graph.flat)


def _per_edge_dense(messages: List[jnp.ndarray], W):
    """Apply a stacked [L, D_in, D_out] weight per-edge (post-nonlinearity
    MLP layers, where the node-side trick no longer applies)."""
    return [
        jnp.dot(m, W[l], preferred_element_type=jnp.float32)
        for l, m in enumerate(messages)
    ]


# --------------------------------------------------------------------------
# GGNN (reference: gnns/ggnn.py)
# --------------------------------------------------------------------------

def ggnn_init(key, num_edge_types, state_dim, gated_unit_type="gru", **_):
    k1, k2 = jax.random.split(key)
    return {
        "W": stacked_glorot_uniform(k1, num_edge_types, (state_dim, state_dim)),
        "cell": cell_init(k2, gated_unit_type, state_dim),
    }


def ggnn_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    gated_unit_type="gru",
    activation_function="tanh",
    message_aggregation_function="sum",
    aggregation_strategy="auto",
    **_,
):
    """h' = Cell(input=aggregated_messages, state=h) — note the reference
    feeds messages as the RNN *input* and node state as the *hidden state*
    (gnns/ggnn.py:92)."""
    dense = use_dense_strategy(
        graph, message_aggregation_function, aggregation_strategy
    )
    c = None
    for _step in range(num_timesteps):
        if dense:
            t = typed_transform(h, params["W"])
            agg = dense_aggregate_linear(t, graph, normalize=False)
        else:
            msgs = _flat_linear_messages(h, params["W"], graph)
            agg = aggregate_flat_auto(
                msgs, graph, message_aggregation_function, aggregation_strategy
            )
        h, c = cell_apply(
            params["cell"], gated_unit_type, agg, h, activation_function, c
        )
    return h


# --------------------------------------------------------------------------
# RGCN (reference: gnns/rgcn.py)
# --------------------------------------------------------------------------

def rgcn_init(
    key, num_edge_types, state_dim, use_both_source_and_target=False, **_
):
    in_dim = 2 * state_dim if use_both_source_and_target else state_dim
    return {"W": stacked_glorot_uniform(key, num_edge_types, (in_dim, state_dim))}


def rgcn_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    activation_function="tanh",
    message_aggregation_function="sum",
    normalize_by_num_incoming=True,
    use_both_source_and_target=False,
    aggregation_strategy="auto",
    **_,
):
    act = get_activation(activation_function)
    # Dense MXU strategy requires source-only linear messages (the
    # normalization factor 1/c depends only on (receiver, type), so it
    # folds into the adjacency values).
    dense = not use_both_source_and_target and use_dense_strategy(
        graph, message_aggregation_function, aggregation_strategy
    )
    for _step in range(num_timesteps):
        if dense:
            t = typed_transform(h, params["W"])
            h = act(dense_aggregate_linear(t, graph, normalize_by_num_incoming))
            continue
        msgs = _flat_linear_messages(
            h, params["W"], graph, concat_target=use_both_source_and_target
        )
        if normalize_by_num_incoming:
            msgs = msgs * graph.flat.norm_scale[:, None]
        h = act(aggregate_flat_auto(
            msgs, graph, message_aggregation_function, aggregation_strategy
        ))
    return h


# --------------------------------------------------------------------------
# RGAT (reference: gnns/rgat.py)
# --------------------------------------------------------------------------

def rgat_init(key, num_edge_types, state_dim, num_heads=4, **_):
    k1, k2 = jax.random.split(key)
    # Reference declares attention params as a flat (2*D,) glorot-initialized
    # vector per type, later reshaped to [K, 2*D/K] (rgat.py:74-76, 110-111).
    limit = jnp.sqrt(6.0 / (2 * 2 * state_dim))
    att = jax.random.uniform(
        k2, (num_edge_types, 2 * state_dim), minval=-limit, maxval=limit
    )
    return {
        "W": stacked_glorot_uniform(k1, num_edge_types, (state_dim, state_dim)),
        "att": att,
    }


def rgat_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    num_heads=4,
    activation_function="tanh",
    aggregation_strategy="auto",
    **_,
):
    state_dim = h.shape[-1]
    head_dim = state_dim // num_heads
    L = graph.num_edge_types
    n_pad = graph.n_pad
    act = get_activation(activation_function)
    # att[l] flat (2D,) -> per-head source/target halves [L, K, Dh]:
    att = params["att"].reshape(L, num_heads, 2 * head_dim)
    att_src, att_tgt = att[..., :head_dim], att[..., head_dim:]

    from ..ops import ranked_segment as rs

    # Streamed layout (TPU shapes): the per-edge work runs on 2-D bf16
    # [E, D] streams instead of [E, K, Dh] f32 — the 3-D layout pads the
    # Dh lane dim and doubles the dominant gather traffic. XLA's [E, K]
    # gathers and segment max/sum lane-pad K to 128 (a 32x traffic
    # amplification at K=4), so every narrow per-edge quantity is built
    # without them: the source logit half rides the already-gathered
    # message stream through one [D, L*K] MXU matmul + a type one-hot
    # contraction; the target half is constant per (receiver, type) group
    # and expands from a FINE rank table; the softmax uses dense ranked
    # segment kernels with clamped exp; and the attention multiply fuses
    # into the aggregation kernel (per-head weights replicate in VMEM).
    streamed = (
        aggregation_strategy in ("auto", "pallas")
        and state_dim % num_heads == 0
        and ranked_aggregation_ok(graph, "sum", 1, state_dim)
    )

    for _step in range(num_timesteps):
        t = typed_transform(h, params["W"])  # [L, N, D]
        t_heads = t.reshape(L, n_pad, num_heads, head_dim)
        # Node-side halves of the attention logits (linearity of the dot
        # with concat(src, tgt) makes this exact):
        logit_tgt = jnp.einsum("lnkd,lkd->lnk", t_heads, att_tgt)

        if streamed:
            flat = graph.flat
            e_tot = flat.src_flat.shape[0]
            fused = (
                getattr(flat, "src_from_rank", None) is not None
                and getattr(flat, "fine_rank_by_src", None) is not None
                and getattr(flat, "fine_to_rcv", None) is not None
                and rs.rgat_fused_supported(
                    e_tot, state_dim, num_heads,
                    rs.rank_table_rows(n_pad, 256),
                    flat.src_from_rank.shape[0],
                )
            )
            if fused:
                # Fused custom-VJP pass: identical forward pipeline, but
                # the backward recomputes the message cotangent in source
                # order from small tables instead of permuting an [E, D]
                # stream (ops/ranked_segment.rgat_fused_pass).
                lt_ranked = take_by_fine_rank(_flat(logit_tgt), graph)
                sd_fine, sd_rank, win_src_eff = src_stream(flat)
                table = rs.rgat_fused_pass(
                    _flat(t), lt_ranked, att_src,
                    flat.src_flat, sd_fine,
                    sd_rank, flat.src_to_rank,
                    flat.src_from_rank, flat.rcv_rank, flat.tgt_rank,
                    flat.mask, flat.fine_to_rcv, graph.node_to_rank,
                    num_heads, n_pad, 256,
                    token_window(flat.win_fine),
                    win_src_eff,
                )
                h = act(ranked_table_to_nodes(table, graph))
                continue
            m2 = gather_flat_src(
                _flat(t).astype(jnp.bfloat16), graph.flat
            )  # [E_tot, D]
            # HEAD-MAJOR attention pipeline: every narrow per-edge array
            # lives as [K, E] (or [L*K, E]) — [E, K] f32 would tile to a
            # full (8, 128) tile per 8 rows, a 32x physical inflation at
            # K=4 that cost ~2.7 ms PER elementwise op at PPI scale.
            # a_all[k*Dh + d, l*K + q] = att_src[l, k, d] if k == q else 0:
            # the head-block-diagonal stack of every type's source
            # attention vector; contracting it with the message stream on
            # dim D yields all types' src logits transposed.
            a_all = jnp.einsum(
                "lkd,kq->kdlq", att_src,
                jnp.eye(num_heads, dtype=att_src.dtype),
            ).reshape(state_dim, L * num_heads)
            # Row-major MXU dot, then ONE transpose of the narrow result.
            # The optimization_barrier is load-bearing: without it XLA
            # canonicalizes dot+transpose into a lane-contracting
            # dot_general and fuses a full [E, D] relayout into the
            # message gather (~9 ms/layer measured).
            logits_all = jax.lax.optimization_barrier(jax.lax.dot(
                m2, a_all.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ))
            logits_all_t = logits_all.T  # [L*K, E_tot]
            type_oh_t = jax.nn.one_hot(
                graph.flat.edge_type, L, dtype=jnp.float32, axis=0
            )  # [L, E_tot]
            lsrc_t = jnp.einsum(
                "lke,le->ke",
                logits_all_t.reshape(L, num_heads, e_tot), type_oh_t,
            )

            lt_ranked_t = take_by_fine_rank(
                _flat(logit_tgt), graph
            ).T  # [K, RPAD] (tiny transpose)
            win = token_window(graph.flat.win_fine)
            ltgt_t = rs.ranked_expand_table_t(
                lt_ranked_t, graph.flat.tgt_rank, lt_ranked_t.shape[1],
                256, win
            )
            logits_t = jax.nn.leaky_relu(
                lsrc_t + ltgt_t,
                negative_slope=0.2,  # tf.nn.leaky_relu default (rgat.py:113)
            )  # [K, E_tot] f32
            attn_t = segment_softmax_flat_ranked_t(logits_t, graph)
            table = rs.ranked_weighted_segment_sum_t(
                m2, attn_t, graph.flat.rcv_rank,
                rs.rank_table_rows(n_pad, 256), num_heads, 256, win,
            )
            h = act(ranked_table_to_nodes(table, graph))
            continue

        logit_src = jnp.einsum("lnkd,lkd->lnk", t_heads, att_src)

        # Per-edge logits and messages over the flat stream (one gather
        # each, regardless of the number of edge types):
        logits = jax.nn.leaky_relu(
            gather_flat_src(_flat(logit_src), graph.flat)
            + gather_flat_tgt(_flat(logit_tgt), graph.flat),
            negative_slope=0.2,  # tf.nn.leaky_relu default (rgat.py:113)
        )  # [E_tot, K]
        msgs = gather_flat_src(_flat(t_heads), graph.flat)  # [E_tot, K, Dh]

        # Softmax per (target node, head) over all incoming edges of all
        # types (rgat.py:126-130):
        attn = segment_softmax_flat(logits, graph.flat, n_pad)
        agg = aggregate_flat_auto(
            (msgs * attn[..., None]).reshape(-1, state_dim), graph, "sum",
            aggregation_strategy,
        )
        h = act(agg.reshape(n_pad, state_dim))
    return h


def _film_aggregate_splits(m, gb_ranked, graph, act_name, win, splits):
    """Run the fused modulate-activate-aggregate kernel, column-splitting
    the elementwise-in-d modulation when the gamma/beta/grad tables would
    not fit VMEM whole (ops/ranked_segment.py film_column_splits)."""
    from ..ops import ranked_segment as rs

    d = m.shape[1]
    if splits == 1:
        return rs.film_ranked_aggregate(
            m, gb_ranked, graph.flat.tgt_rank, act_name, 256, win
        )
    w = d // splits
    parts = []
    for i in range(splits):
        cols = slice(i * w, (i + 1) * w)
        gb_i = jnp.concatenate(
            [gb_ranked[:, cols], gb_ranked[:, d + i * w:d + (i + 1) * w]],
            axis=1,
        )
        parts.append(rs.film_ranked_aggregate(
            m[:, cols], gb_i, graph.flat.tgt_rank, act_name, 256, win
        ))
    return jnp.concatenate(parts, axis=1)


# --------------------------------------------------------------------------
# GNN-FiLM (reference: gnns/gnn_film.py)
# --------------------------------------------------------------------------

def gnn_film_init(key, num_edge_types, state_dim, **_):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "W": stacked_glorot_uniform(k1, num_edge_types, (state_dim, state_dim)),
        "W_film": stacked_glorot_uniform(
            k2, num_edge_types, (state_dim, 2 * state_dim)
        ),
        "ln": layer_norm_init(state_dim),
    }


def gnn_film_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    activation_function="relu",
    message_aggregation_function="sum",
    normalize_by_num_incoming=False,
    aggregation_strategy="auto",
    **_,
):
    act = get_activation(activation_function)
    d = h.shape[-1]
    from ..ops import ranked_segment as rs

    # Fused streaming path: gamma/beta live in a FINE (receiver, type)
    # rank-indexed table (one [R]-row gather instead of a per-edge [E, 2D]
    # gather) and the modulate-activate-aggregate runs as one Pallas pass
    # with a custom streaming VJP (ops/ranked_segment.py
    # film_ranked_aggregate); the fine table is then combined per receiver
    # with a cheap R-row sorted segment-sum.
    fused = (
        aggregation_strategy in ("auto", "pallas")
        and message_aggregation_function in ("sum", "unsorted_segment_sum")
        and rs.film_act_supported(activation_function)
        and ranked_aggregation_ok(graph, "sum", 1, d, film=True)
    )
    for _step in range(num_timesteps):
        t = typed_transform(h, params["W"])  # [L, N, D]
        film = typed_transform(h, params["W_film"])  # [L, N, 2D]
        # bf16 message stream on the fused path: halves the gather and
        # kernel stream traffic; the kernel accumulates in f32 and its
        # VJP upcasts cotangents before the streaming segment-sum.
        t_flat = _flat(t).astype(jnp.bfloat16) if fused else _flat(t)
        if fused:
            flat_g = graph.flat
            e_tot = flat_g.src_flat.shape[0]
            act_name = activation_function.lower()
            win = token_window(flat_g.win_fine)
            gb_ranked = take_by_fine_rank(_flat(film), graph)
            splits = rs.film_column_splits(e_tot, d, gb_ranked.shape[0])
            gather_fusible = (
                splits == 1
                and not normalize_by_num_incoming
                and getattr(flat_g, "fine_rank_by_src", None) is not None
                and getattr(flat_g, "src_from_rank", None) is not None
                and rs.film_fused_src_supported(
                    act_name, e_tot, d, gb_ranked.shape[0],
                    flat_g.src_from_rank.shape[0],
                )
            )
            if gather_fusible:
                # Source-gather-fused pass: backward recomputes dt in
                # src-sorted order from small tables — no [E, D] permute.
                # NOTE: lane-padding this pipeline to 128-aligned widths
                # (D=320 -> 384) was built and measured SLOWER in-program
                # (round 3): XLA's in-context gathers run at the same
                # ~325M rows/s either way (alignment only matters for the
                # isolated op), the simplifier narrows padded gathers back
                # unless barriered, and the [E, 3D] stream grows 20%.
                sd_fine, sd_rank, win_src_eff = src_stream(flat_g)
                table = rs.film_fused_src_pass(
                    t_flat, gb_ranked, flat_g.src_flat,
                    sd_fine, sd_rank,
                    flat_g.src_to_rank, flat_g.src_from_rank,
                    flat_g.tgt_rank, act_name, 256,
                    win, win_src_eff,
                )
                agg = fine_table_to_nodes(table, graph)
                h = layer_norm(params["ln"], agg)
                continue
            m = gather_flat_src(t_flat, graph.flat)
            if normalize_by_num_incoming:
                m = m * graph.flat.norm_scale[:, None].astype(m.dtype)
            table = _film_aggregate_splits(
                m, gb_ranked, graph, act_name, win, splits
            )
            agg = fine_table_to_nodes(table, graph)
        else:
            m = gather_flat_src(t_flat, graph.flat)
            if normalize_by_num_incoming:
                m = m * graph.flat.norm_scale[:, None].astype(m.dtype)
            m = m.astype(jnp.float32)
            gb = gather_flat_tgt(_flat(film), graph.flat)  # FiLM from *target*
            gamma, beta = gb[:, :d], gb[:, d:]
            msgs = act(gamma * m + beta)  # activation on messages (film.py:112)
            agg = aggregate_flat(
                msgs, graph.flat, graph.n_pad, message_aggregation_function
            )
        h = layer_norm(params["ln"], agg)  # unconditional LN (film.py:120)
    return h


# --------------------------------------------------------------------------
# RGIN (reference: gnns/rgin.py)
# --------------------------------------------------------------------------

def rgin_init(
    key,
    num_edge_types,
    state_dim,
    use_target_state_as_input=False,
    num_edge_MLP_hidden_layers=1,
    num_aggr_MLP_hidden_layers=None,
    **_,
):
    keys = jax.random.split(key, 4)
    params = {"ln": layer_norm_init(state_dim)}
    if num_edge_MLP_hidden_layers is not None:
        in_dim = 2 * state_dim if use_target_state_as_input else state_dim
        sizes = [in_dim] + [state_dim] * (num_edge_MLP_hidden_layers + 1)
        wkeys = jax.random.split(keys[0], len(sizes) - 1)
        params["edge_mlp"] = [
            stacked_glorot_uniform(k, num_edge_types, (d_in, d_out))
            for k, d_in, d_out in zip(wkeys, sizes[:-1], sizes[1:])
        ]
    if num_aggr_MLP_hidden_layers is not None:
        from .mlp import mlp_init

        params["aggr_mlp"] = mlp_init(
            keys[1], state_dim, state_dim, num_aggr_MLP_hidden_layers
        )
    return params


def _node_table_mlp(h, weights, inner_act):
    """ALL-node-side stacked per-type MLP -> [L, N, D_out].

    Valid whenever the edge MLP's input is the source state alone
    (use_target_state_as_input=False): the per-edge message is then a
    pure function of (type, src), so every MLP layer — not just the
    first — can run on node tables (L x N x D einsums on the MXU) and
    the per-edge stage collapses to one gather + one flat ranked
    aggregation, exactly like the linear-message families. Replaces
    per-edge [E, D] x [D, D] message matmuls (E/N ~ 28x the FLOPs at
    PPI density) and XLA scatter-add aggregations (the measured
    hotspot of the RGIN/GNN-Edge-MLP steps)."""
    t = typed_transform(h, weights[0])
    for W in weights[1:]:
        t = jnp.einsum("lnd,lde->lne", inner_act(t), W)
    return t


def _typed_mlp_messages(h, weights, graph, concat_target, inner_act):
    """Stacked per-type MLP on edge inputs: first linear layer node-sided,
    later layers per-edge. `weights` = list of [L, D_in, D_out]."""
    msgs = _typed_linear_messages(h, weights[0], graph, concat_target=concat_target)
    for W in weights[1:]:
        msgs = [inner_act(m) for m in msgs]
        msgs = _per_edge_dense(msgs, W)
    return msgs


def _scanned_mlp_aggregate(
    h, weights, graph, concat_target, inner_act, msg_post, aggregation
):
    """Per-type edge-MLP stage + aggregation under ONE lax.scan over edge
    types (ops/typed_stream.py): the XLA graph holds a single copy of the
    gather/MLP/segment-sum block no matter how many edge types the task
    has — the compile-time fix for VarMisuse-scale type counts that the
    flat stream cannot provide for nonlinear per-edge stages.

    msg_post(m, te_l) applies the layer-specific message finalization
    (activation, 1/c normalization) per type slice.
    """
    te = stack_edges(graph)
    d0 = h.shape[-1]
    W0 = weights[0]
    rest = tuple(weights[1:])
    out_dim = (rest[-1] if rest else W0).shape[-1]
    if concat_target:
        xs = (typed_transform(h, W0[:, :d0, :]),
              typed_transform(h, W0[:, d0:, :])) + rest
    else:
        xs = (typed_transform(h, W0),) + rest

    def msgs_fn(xs_l, te_l):
        if concat_target:
            m = gather_src_stacked(xs_l[0], te_l) + gather_tgt_stacked(
                xs_l[1], te_l
            )
            ws = xs_l[2:]
        else:
            m = gather_src_stacked(xs_l[0], te_l)
            ws = xs_l[1:]
        for W in ws:
            m = jnp.dot(inner_act(m), W, preferred_element_type=jnp.float32)
        return msg_post(m, te_l)

    return scan_types_aggregate(graph, te, msgs_fn, xs, out_dim, aggregation)


def rgin_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    activation_function="relu",
    message_aggregation_function="sum",
    use_target_state_as_input=False,
    num_edge_MLP_hidden_layers=1,
    num_aggr_MLP_hidden_layers=None,
    typed_edge_scan="auto",
    **_,
):
    act = get_activation(activation_function)
    scanned = num_edge_MLP_hidden_layers is not None and scan_types_wanted(
        graph, typed_edge_scan
    )
    ranked = (
        num_edge_MLP_hidden_layers is not None
        and not use_target_state_as_input
        and typed_edge_scan == "auto"
        and compressive_window(graph.flat)
        and ranked_aggregation_ok(
            graph, message_aggregation_function, 1, h.shape[-1]
        )
    )
    for _step in range(num_timesteps):
        if ranked:
            t = act(_node_table_mlp(h, params["edge_mlp"], act))
            t16 = _flat(t).astype(jnp.bfloat16)
            if gather_aggregate_src_ok(
                    graph, message_aggregation_function, t16.shape[-1]):
                # Fused gather+segment-sum: backward re-gathers the SMALL
                # table cotangent in src order instead of permuting the
                # [E, D] per-edge cotangent (ops/edge_ops.py
                # _gather_segsum).
                agg = gather_aggregate_src(
                    t16, graph, message_aggregation_function
                )
            else:
                m = gather_flat_src(t16, graph.flat)
                agg = aggregate_flat_ranked(
                    m, graph, message_aggregation_function
                )
        elif scanned:
            agg = _scanned_mlp_aggregate(
                h, params["edge_mlp"], graph, use_target_state_as_input,
                act, lambda m, te_l: act(m), message_aggregation_function,
            )
        elif num_edge_MLP_hidden_layers is not None:
            msgs = _typed_mlp_messages(
                h, params["edge_mlp"], graph, use_target_state_as_input, act
            )
            msgs = [act(m) for m in msgs]  # act on MLP outputs (rgin.py:128-129)
            agg = aggregate(msgs, graph, message_aggregation_function)
        else:
            msgs = [gather_src(h, e) for e in graph.edges]
            agg = aggregate(msgs, graph, message_aggregation_function)
        if num_aggr_MLP_hidden_layers is not None:
            from .mlp import mlp_apply

            agg = mlp_apply(params["aggr_mlp"], agg, act)
        h = layer_norm(params["ln"], act(agg))  # act + unconditional LN
    return h


# --------------------------------------------------------------------------
# GNN-Edge-MLP (reference: gnns/gnn_edge_mlp.py)
# --------------------------------------------------------------------------

def gnn_edge_mlp_init(
    key,
    num_edge_types,
    state_dim,
    use_target_state_as_input=True,
    num_edge_hidden_layers=1,
    **_,
):
    in_dim = 2 * state_dim if use_target_state_as_input else state_dim
    sizes = [in_dim] + [state_dim] * (num_edge_hidden_layers + 1)
    wkeys = jax.random.split(key, len(sizes) - 1)
    return {
        "edge_mlp": [
            stacked_glorot_uniform(k, num_edge_types, (d_in, d_out))
            for k, d_in, d_out in zip(wkeys, sizes[:-1], sizes[1:])
        ],
        "ln": layer_norm_init(state_dim),
    }


def gnn_edge_mlp_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    activation_function="relu",
    message_aggregation_function="sum",
    normalize_by_num_incoming=False,
    use_target_state_as_input=True,
    num_edge_hidden_layers=1,
    typed_edge_scan="auto",
    **_,
):
    act = get_activation(activation_function)
    elu = get_activation("elu")  # MLP inner activation is fixed elu (·:73-77)

    def finalize(m, te_l):
        if normalize_by_num_incoming:
            m = m * te_l.norm_scale[:, None]
        return act(m)  # activation on messages (·:112)

    from ..ops import ranked_segment as rs

    d0 = h.shape[-1]
    ranked = (
        not use_target_state_as_input
        and typed_edge_scan == "auto"
        and compressive_window(graph.flat)
        and ranked_aggregation_ok(
            graph, message_aggregation_function, 1, d0
        )
    )
    # With target-state input and NO hidden layer (the tuned
    # GNN-Edge-MLP0), the message is act(norm * (ts[src] + tt[tgt])) —
    # exactly the fused FiLM kernel with gamma = norm (1/c or 1) constant
    # per (receiver, type) group and beta = norm * tt rows.
    fused0 = (
        use_target_state_as_input
        and num_edge_hidden_layers == 0
        and typed_edge_scan == "auto"
        and message_aggregation_function in ("sum", "unsorted_segment_sum")
        and compressive_window(graph.flat)
        and rs.film_act_supported(activation_function.lower())
        and ranked_aggregation_ok(graph, "sum", 1, d0, film=True)
    )
    # One hidden layer + target state (the tuned GNN-Edge-MLP1), over the
    # TYPE-MAJOR stream (ops/graph.py FlatEdges.tm_*): the pre-dense
    # hidden x = elu(ts[src] + tt[tgt]) assembles from node tables + a
    # rank expand; the type-dependent output dense W1 then runs as L
    # FULL-SIZE MXU matmuls on static per-type slices (types are
    # contiguous in this order) instead of L type-MASKED matmuls per
    # 256-edge block (the round-2 typed_dense_aggregate kernel — L-fold
    # matmul FLOPs, measured 8.4 ms/layer fwd+bwd at PPI L=3); the final
    # gelu + aggregation runs through the fused modulate-activate
    # streaming kernel with constant gamma=1/beta=0 (recompute-based VJP,
    # no [E, D] activation residuals).
    def _tm1_win():
        w = token_window(graph.flat.win_tm)
        return w if 0 < w <= 64 else 0

    e_tot0 = graph.flat.rcv_rank.shape[0]
    tm_fine_rows = rs.fine_rank_table_rows(
        graph.n_pad, graph.num_edge_types, e_tot0, 256
    )
    tm_src_rows = rs._ceil_mult(
        min(graph.num_edge_types * graph.n_pad + 1, e_tot0), 8
    ) + 256 + 8
    tmajor1 = (
        use_target_state_as_input
        and num_edge_hidden_layers == 1
        and not normalize_by_num_incoming
        and typed_edge_scan == "auto"
        and message_aggregation_function in ("sum", "unsorted_segment_sum")
        and tm_available(graph)
        and _tm1_win() > 0
        and rs.film_act_supported(activation_function.lower())
        and ranked_aggregation_ok(graph, "sum", 1, d0, film=True)
        and rs.ranked_supported(e_tot0, d0, tm_fine_rows)
        and rs.ranked_supported(e_tot0, d0, tm_src_rows)
    )
    # Receiver-major fallback with the blocked type-masked kernel
    # (ranked_segment.typed_dense_aggregate), for batches without the
    # type-major fields.
    fused1 = (
        not tmajor1
        and use_target_state_as_input
        and num_edge_hidden_layers == 1
        and not normalize_by_num_incoming
        and typed_edge_scan == "auto"
        and message_aggregation_function in ("sum", "unsorted_segment_sum")
        and compressive_window(graph.flat)
        and ranked_aggregation_ok(graph, "sum", 1, d0)
        and rs.typed_dense_agg_supported(
            graph.flat.rcv_rank.shape[0], d0, d0, graph.num_edge_types,
            activation_function.lower(),
        )
    )
    for _step in range(num_timesteps):
        if tmajor1:
            W0, W1 = params["edge_mlp"]
            ts = typed_transform(h, W0[:, :d0, :])
            tt = typed_transform(h, W0[:, d0:, :])
            flat_g = graph.flat
            win_tm = _tm1_win()
            self_types = tm_self_types(graph)
            beta = take_by_tm_rank(_flat(tt), graph)  # [RPAD, D]
            offs = np.cumsum(
                [0] + [e.senders.shape[0] for e in graph.edges]
            )
            # Per-type slices: the W1 dense runs as one FULL-SIZE matmul
            # per type, and (when the padded slice is STEP-aligned, as
            # batch-spec batches are) each type aggregates through its own
            # kernel call — type rank ranges are disjoint, so the tables

            # sum exactly and the [E, D] y concat (measured ~1.2 ms/layer
            # of pad/copy glue) never exists. Self-loop types contribute
            # node-side below.
            aligned = all(
                (offs[l + 1] - offs[l]) % rs.STEP == 0
                for l in range(graph.num_edge_types)
                if not self_types[l]
            )
            act_name1 = activation_function.lower()
            n_nonself = sum(1 for s in self_types if not s)
            fused_src1 = (
                aligned
                and getattr(flat_g, "tm_rank_by_src", None) is not None
                and getattr(flat_g, "src_from_rank", None) is not None
                and rs.emlp1_src_supported(
                    act_name1, flat_g.tm_rank.shape[0], d0, n_nonself,
                    tm_fine_rows, flat_g.src_from_rank.shape[0],
                )
            )
            if not fused_src1:
                m = gather_tm_src(
                    _flat(ts).astype(jnp.bfloat16), graph
                )  # [E, D] bf16, streaming-ranked VJP
                # One fused pass: x = elu(m + beta[rank]) with beta
                # expanded in-VMEM; the VJP recovers elu' from x itself
                # (no [E, D] beta stream or activation residuals in HBM).
                x = rs.expand_add_act(
                    m, beta, flat_g.tm_rank, "elu", 256, win_tm
                )
            table = jnp.zeros((tm_fine_rows, d0), jnp.float32)
            if fused_src1:
                # Fused custom-VJP pass: identical forward pipeline, but
                # the backward recomputes the message cotangent in source
                # order from small tables instead of permuting the [E, D]
                # stream (ops/ranked_segment.emlp1_tm_pass). Note the op
                # consumes ts (not the gathered m), so the expand_add_act
                # + matmuls + aggregation all live inside it.
                table = rs.emlp1_tm_pass(
                    _flat(ts), beta, W1, flat_g.tm_src_flat,
                    flat_g.tm_rank, flat_g.tm_rank_by_src,
                    flat_g.src_sorted_rank, flat_g.src_to_rank,
                    flat_g.src_from_rank, flat_g.mask,
                    tuple(int(o) for o in offs), tuple(self_types),
                    act_name1, graph.n_pad, tm_fine_rows, 256, win_tm,
                    token_window(flat_g.win_src),
                )
            elif aligned:
                for l in range(graph.num_edge_types):
                    if self_types[l]:
                        continue
                    y_l = jnp.dot(
                        x[offs[l]:offs[l + 1]],
                        W1[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    table = table + rs.act_ranked_aggregate(
                        y_l, flat_g.tm_rank[offs[l]:offs[l + 1]],
                        tm_fine_rows, act_name1, 256, win_tm,
                    )
            else:
                # Unaligned per-type pads: one global stream with zeroed
                # self slices (act(0) = 0 keeps straddling blocks exact).
                y = jnp.concatenate([
                    jnp.zeros((offs[l + 1] - offs[l], d0), jnp.bfloat16)
                    if self_types[l] else
                    jnp.dot(
                        x[offs[l]:offs[l + 1]],
                        W1[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    for l in range(graph.num_edge_types)
                ], axis=0)
                table = rs.act_ranked_aggregate(
                    y, flat_g.tm_rank, tm_fine_rows, act_name1, 256,
                    win_tm,
                )
            agg = tm_table_to_nodes(table, graph)
            # Node-side self-loop contribution: the message along a
            # self-loop is a pure node function act(W1 elu(ts_v + tt_v)),
            # summed once per incident self edge (typed_incoming_counts
            # carries the multiplicity; 0 for nodes without one).
            for l in range(graph.num_edge_types):
                if not self_types[l]:
                    continue
                y_self = jnp.dot(
                    elu(ts[l] + tt[l]), W1[l],
                    preferred_element_type=jnp.float32,
                )
                agg = agg + act(y_self) * (
                    graph.typed_incoming_counts[l][:, None]
                )
        elif fused1:
            W0, W1 = params["edge_mlp"]
            ts = typed_transform(h, W0[:, :d0, :])
            tt = typed_transform(h, W0[:, d0:, :])
            beta = take_by_fine_rank(_flat(tt), graph)
            win = token_window(graph.flat.win_fine)
            m = gather_flat_src(
                _flat(ts).astype(jnp.bfloat16), graph.flat
            )
            beta_e = rs.ranked_expand_table(
                beta, graph.flat.tgt_rank, beta.shape[0], 256, win
            )
            x = elu(m.astype(jnp.float32) + beta_e).astype(jnp.bfloat16)
            rows = rs.rank_table_rows(graph.n_pad, 256)
            table = rs.typed_dense_aggregate(
                x, W1, graph.flat.edge_type, graph.flat.rcv_rank, rows,
                activation_function.lower(), 256, win,
            )
            agg = ranked_table_to_nodes(table, graph)
        elif fused0:
            W0 = params["edge_mlp"][0]
            ts = typed_transform(h, W0[:, :d0, :])
            tt = typed_transform(h, W0[:, d0:, :])
            beta = take_by_fine_rank(_flat(tt), graph)
            if normalize_by_num_incoming:
                rank_nodes = fine_rank_to_flat(graph)
                small = 1e-7  # SMALL_NUMBER
                counts_flat = graph.typed_incoming_counts.reshape(-1)
                scale = 1.0 / (jnp.take(
                    counts_flat, rank_nodes, axis=0, mode="clip"
                ) + small)
                gamma = jnp.broadcast_to(scale[:, None], beta.shape)
                beta = beta * scale[:, None]
            else:
                gamma = jnp.ones_like(beta)
            gb_ranked = jnp.concatenate([gamma, beta], axis=1)
            flat_g = graph.flat
            win = token_window(flat_g.win_fine)
            e_tot = flat_g.src_flat.shape[0]
            act_name0 = activation_function.lower()
            splits = rs.film_column_splits(e_tot, d0, gb_ranked.shape[0])
            ts16 = _flat(ts).astype(jnp.bfloat16)
            # The 1/c normalization is folded into gamma/beta PER FINE
            # GROUP above, so (unlike GNN-FiLM's per-edge norm) the
            # source-gather-fused pass applies even when normalizing:
            # backward recomputes the src-order cotangent from small
            # tables instead of permuting the [E, D] stream.
            if (splits == 1
                    and getattr(flat_g, "fine_rank_by_src", None) is not None
                    and getattr(flat_g, "src_from_rank", None) is not None
                    and rs.film_fused_src_supported(
                        act_name0, e_tot, d0, gb_ranked.shape[0],
                        flat_g.src_from_rank.shape[0])):
                sd_fine, sd_rank, win_src_eff = src_stream(flat_g)
                table = rs.film_fused_src_pass(
                    ts16, gb_ranked, flat_g.src_flat,
                    sd_fine, sd_rank,
                    flat_g.src_to_rank, flat_g.src_from_rank,
                    flat_g.tgt_rank, act_name0, 256,
                    win, win_src_eff,
                )
            else:
                m = gather_flat_src(ts16, graph.flat)
                table = _film_aggregate_splits(
                    m, gb_ranked, graph, act_name0, win, splits
                )
            agg = fine_table_to_nodes(table, graph)
        elif ranked:
            t = _node_table_mlp(h, params["edge_mlp"], elu)
            if normalize_by_num_incoming:
                # 1/c is receiver-side, so it must scale the per-edge
                # stream BEFORE the activation (reference ·:105-112).
                m = gather_flat_src(
                    _flat(t).astype(jnp.bfloat16), graph.flat
                )
                m = act(
                    m.astype(jnp.float32)
                    * graph.flat.norm_scale[:, None]
                )
                agg = aggregate_flat_ranked(
                    m, graph, message_aggregation_function
                )
            else:
                t16 = _flat(act(t)).astype(jnp.bfloat16)
                if gather_aggregate_src_ok(
                        graph, message_aggregation_function,
                        t16.shape[-1]):
                    agg = gather_aggregate_src(
                        t16, graph, message_aggregation_function
                    )
                else:
                    m = gather_flat_src(t16, graph.flat)
                    agg = aggregate_flat_ranked(
                        m, graph, message_aggregation_function
                    )
        elif scan_types_wanted(graph, typed_edge_scan):
            agg = _scanned_mlp_aggregate(
                h, params["edge_mlp"], graph, use_target_state_as_input,
                elu, finalize, message_aggregation_function,
            )
        else:
            msgs = _typed_mlp_messages(
                h, params["edge_mlp"], graph, use_target_state_as_input, elu
            )
            if normalize_by_num_incoming:
                msgs = [
                    normalize_by_incoming(m, e)
                    for m, e in zip(msgs, graph.edges)
                ]
            msgs = [act(m) for m in msgs]  # activation on messages (·:112)
            agg = aggregate(msgs, graph, message_aggregation_function)
        h = layer_norm(params["ln"], agg)  # unconditional LN (·:119)
    return h


# --------------------------------------------------------------------------
# RGDCN (reference: gnns/rgdcn.py)
# --------------------------------------------------------------------------

def rgdcn_init(
    key,
    num_edge_types,
    state_dim,
    num_channels=8,
    channel_dim=None,
    use_full_state_for_channel_weights=False,
    tie_channel_weights=False,
    **_,
):
    if channel_dim is None:
        channel_dim = state_dim // num_channels
    c_eff = 1 if tie_channel_weights else num_channels
    in_dim = state_dim if use_full_state_for_channel_weights else channel_dim
    keys = jax.random.split(key, (num_edge_types, c_eff))
    # Truncated-normal stddev 1/K^2 kernels computing K x K dynamic
    # convolutions from the target node state (rgdcn.py:99-104).
    W = jnp.stack(
        [
            jnp.stack(
                [
                    truncated_normal(
                        keys[l, c],
                        (in_dim, channel_dim * channel_dim),
                        stddev=1.0 / (channel_dim**2),
                    )
                    for c in range(c_eff)
                ]
            )
            for l in range(num_edge_types)
        ]
    )  # [L, C_eff, in_dim, K*K]
    return {"W_wc": W}


def _typed_neighbor_sums(h, graph: GraphBatch, normalize: bool,
                         aggregation_strategy: str, typed_edge_scan):
    """Per-type neighbor sums S[l, v] = sum_{u -(l)-> v} h[u], optionally
    1/c_{v,l}-normalized, returned [L, n_pad, D].

    The primitive behind the aggregate-first RGDCN restructure: messages
    that are LINEAR in the source state commute with sum-aggregation, so
    the per-edge work collapses to this single RGCN-shaped aggregation.
    Dense-MXU A_l @ h when the padded graph qualifies, else sorted
    segment-sums (under lax.scan over types at VarMisuse type counts)."""
    n_pad = graph.n_pad
    small = 1e-7  # SMALL_NUMBER
    # An explicit scan request wins over the dense path: the caller is
    # optimizing compile time at high type counts, and the dense loop is
    # unrolled over L.
    force_scan = typed_edge_scan in ("scan", "always")
    if not force_scan and use_dense_strategy(graph, "sum",
                                             aggregation_strategy):
        from ..ops.edge_ops import dense_adjacency

        mats = graph.dense_adj
        if mats is None:
            mats = dense_adjacency(graph)
        parts = []
        for l, A in enumerate(mats):
            s = jnp.dot(A, h.astype(A.dtype),
                        preferred_element_type=jnp.float32)
            if normalize:
                c = graph.typed_incoming_counts[l]
                s = s * (1.0 / (c + small))[:, None]
            parts.append(s)
        return jnp.stack(parts)
    from ..ops import ranked_segment as rs

    flat_g = graph.flat
    L = graph.num_edge_types
    d = h.shape[-1]
    e_tot = flat_g.src_flat.shape[0] if flat_g is not None else 0
    fine_rows = rs.fine_rank_table_rows(n_pad, L, e_tot, 256)
    if (not force_scan
            and getattr(flat_g, "fine_from_flat", None) is not None
            and typed_edge_scan == "auto"
            and compressive_window(flat_g)
            and ranked_aggregation_ok(graph, "sum", 1, d)
            and rs.ranked_supported(e_tot, d, fine_rows)):
        # ONE flat gather + ONE fine (receiver, type) ranked segment-sum
        # replaces L gather/XLA-scatter pairs: S[l, v] is exactly the
        # fine rank table row of group (v, l), read back with a dense
        # row take via the host-precomputed inverse map.
        table16 = jnp.broadcast_to(
            h.astype(jnp.bfloat16)[None], (L,) + h.shape
        ).reshape(L * n_pad, d)
        if gather_aggregate_fine_ok(graph, d):
            # Fused gather + fine segment-sum: the backward re-gathers the
            # SMALL fine-table cotangent in src order instead of permuting
            # the [E, D] per-edge cotangent (RGDCN's step was 47% such
            # permutes, 8 x 14.9 ms at 1.4M edges; ops/edge_ops.py
            # _gather_segsum_fine).
            table = gather_aggregate_fine(table16, graph, normalize)
        else:
            m = gather_flat_src(table16, flat_g)
            if normalize:
                m = m.astype(jnp.float32) * flat_g.norm_scale[:, None]
            win = token_window(flat_g.win_fine)
            table = rs.ranked_segment_sum_table(
                m, flat_g.tgt_rank, fine_rows, 256, win
            )
        valid = flat_g.fine_from_flat >= 0
        s_flat = jnp.take(
            table, jnp.maximum(flat_g.fine_from_flat, 0), axis=0
        )
        s_flat = jnp.where(valid[:, None], s_flat, 0.0)
        return s_flat.reshape(L, n_pad, d)
    if scan_types_wanted(graph, typed_edge_scan):
        te = stack_edges(graph)

        def body(_, te_l):
            src = gather_src_stacked(h, te_l)
            if normalize:
                src = src * te_l.norm_scale[:, None]
            return None, aggregate_sum_block(src, te_l, n_pad)

        _, s = jax.lax.scan(body, None, te)
        return s
    parts = []
    for e in graph.edges:
        src = gather_src(h, e)
        if normalize:
            src = normalize_by_incoming(src, e)
        parts.append(aggregate_sum_block(src, e, n_pad))
    return jnp.stack(parts)


def _rgdcn_type_contraction(h, h_chunked, S_l, W_l, act, channel_dim,
                            use_full_state, tie_weights):
    """One edge type's contribution in the aggregate-first formulation:
    out[v, c, j] = sum_i S_l[v, c, i] * K_l[c, v, i, j] with the dynamic
    kernels K computed from the target state (reference rgdcn.py:95-143,
    all four weight-sharing variants)."""
    n, c, k = S_l.shape
    if use_full_state:
        # Kernels from the FULL target state (rgdcn.py:134-136).
        kern = act(jnp.einsum("nd,cdq->cnq", h, W_l,
                              preferred_element_type=jnp.float32))
        if tie_weights:
            # One kernel per node shared by every channel.
            k3 = kern[0].reshape(n, channel_dim, channel_dim)
            return jnp.einsum("nci,nij->ncj", S_l, k3,
                              preferred_element_type=jnp.float32)
    elif tie_weights:
        # Tied weights, per-channel input state (rgdcn.py:43-49).
        kern = act(jnp.einsum("nck,kq->cnq", h_chunked, W_l[0],
                              preferred_element_type=jnp.float32))
    else:
        kern = act(jnp.einsum("nck,ckq->cnq", h_chunked, W_l,
                              preferred_element_type=jnp.float32))
    k4 = kern.reshape(kern.shape[0], n, channel_dim, channel_dim)
    return jnp.einsum("nci,cnij->ncj", S_l, k4,
                      preferred_element_type=jnp.float32)


def rgdcn_apply(
    params,
    graph: GraphBatch,
    h,
    *,
    num_timesteps=1,
    num_channels=8,
    channel_dim=None,
    use_full_state_for_channel_weights=False,
    tie_channel_weights=False,
    activation_function="relu",
    message_aggregation_function="sum",
    normalize_by_num_incoming=True,
    typed_edge_scan="auto",
    aggregation_strategy="auto",
    **_,
):
    n_pad = graph.n_pad
    if channel_dim is None:
        channel_dim = h.shape[-1] // num_channels
    act = get_activation(activation_function)
    W_wc = params["W_wc"]

    if message_aggregation_function in ("sum", "unsorted_segment_sum"):
        # Aggregate-first fast path. RGDCN messages are LINEAR in the
        # source state (the per-edge kernel depends only on (target, type),
        # rgdcn.py:143-146) and the reference applies the activation AFTER
        # aggregation (rgdcn.py:156-160), so for sum aggregation
        #   agg[t] = sum_l (sum_{s in N_l(t)} n_lt h_s) @ K_{l,t}
        # — one RGCN-shaped per-type neighbor sum (dense-MXU eligible)
        # plus node-level batched kernel matmuls. No [E, K, K] per-edge
        # kernel gather, no per-edge einsum: the edge-stream traffic drops
        # from O(E K^2) to O(E D) and the rest rides the MXU.
        for _step in range(num_timesteps):
            h_chunked = h.reshape(n_pad, num_channels, channel_dim)
            S = _typed_neighbor_sums(
                h, graph, normalize_by_num_incoming,
                aggregation_strategy, typed_edge_scan,
            )  # [L, n_pad, D]
            S_chunk = S.reshape(-1, n_pad, num_channels, channel_dim)
            if scan_types_wanted(graph, typed_edge_scan):
                def body(acc, wl_sl):
                    W_l, S_l = wl_sl
                    return acc + _rgdcn_type_contraction(
                        h, h_chunked, S_l, W_l, act, channel_dim,
                        use_full_state_for_channel_weights,
                        tie_channel_weights,
                    ), None

                out, _ = jax.lax.scan(
                    body,
                    jnp.zeros((n_pad, num_channels, channel_dim),
                              jnp.float32),
                    (W_wc, S_chunk),
                )
            else:
                out = None
                for l in range(S_chunk.shape[0]):
                    part = _rgdcn_type_contraction(
                        h, h_chunked, S_chunk[l], W_wc[l], act, channel_dim,
                        use_full_state_for_channel_weights,
                        tie_channel_weights,
                    )
                    out = part if out is None else out + part
            h = act(out).reshape(n_pad, num_channels * channel_dim)
        return h

    if scan_types_wanted(graph, typed_edge_scan):
        # lax.scan over edge types: the unrolled path repeats the
        # kernel/gather/einsum block L x C times (reference pattern,
        # rgdcn.py:80-113) — at VarMisuse scale (22 types x 8 channels)
        # that dominates compile time. Here the graph holds C copies.
        te = stack_edges(graph)
        for _step in range(num_timesteps):
            h_chunked = h.reshape(n_pad, num_channels, channel_dim)

            def msgs_fn(W_l, te_l):
                parts = []
                for c in range(num_channels):
                    c_eff = 0 if tie_channel_weights else c
                    wc_in = (h if use_full_state_for_channel_weights
                             else h_chunked[:, c])
                    kernels = act(
                        jnp.dot(wc_in, W_l[c_eff],
                                preferred_element_type=jnp.float32)
                    ).reshape(n_pad, channel_dim, channel_dim)
                    kern_e = gather_tgt_stacked(kernels, te_l)
                    src = gather_src_stacked(h_chunked[:, c], te_l)
                    m = jnp.einsum(
                        "ek,ekj->ej", src, kern_e,
                        preferred_element_type=jnp.float32,
                    )
                    if normalize_by_num_incoming:
                        m = m * te_l.norm_scale[:, None]
                    parts.append(m)
                return jnp.concatenate(parts, axis=1)

            agg = scan_types_aggregate(
                graph, te, msgs_fn, W_wc, num_channels * channel_dim,
                message_aggregation_function,
            )
            # act per aggregated channel == act on the channel concat
            # (elementwise), matching the unrolled path below.
            h = act(agg)
        return h

    for _step in range(num_timesteps):
        h_chunked = h.reshape(n_pad, num_channels, channel_dim)
        new_channels = []
        for c in range(num_channels):
            c_eff = 0 if tie_channel_weights else c
            ch_state = h_chunked[:, c, :]  # [N, K]
            wc_in = h if use_full_state_for_channel_weights else ch_state
            msgs = []
            for l, e in enumerate(graph.edges):
                # Dynamic K x K kernel at each node; note the reference
                # applies the activation *to the kernel entries* via the
                # Dense layer's activation arg (rgdcn.py:99-104).
                kernels = act(
                    jnp.dot(
                        wc_in, W_wc[l, c_eff], preferred_element_type=jnp.float32
                    )
                ).reshape(n_pad, channel_dim, channel_dim)
                kern_e = gather_tgt(kernels, e)  # kernel at *target*
                src = gather_src(ch_state, e)
                m = jnp.einsum(
                    "ek,ekj->ej", src, kern_e, preferred_element_type=jnp.float32
                )
                if normalize_by_num_incoming:
                    m = normalize_by_incoming(m, e)
                msgs.append(m)
            agg = aggregate(msgs, graph, message_aggregation_function)
            new_channels.append(act(agg))
        h = jnp.concatenate(new_channels, axis=1)
    return h


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

LAYERS = {
    "ggnn": (ggnn_init, ggnn_apply),
    "rgcn": (rgcn_init, rgcn_apply),
    "rgat": (rgat_init, rgat_apply),
    "rgin": (rgin_init, rgin_apply),
    "gnn_edge_mlp": (gnn_edge_mlp_init, gnn_edge_mlp_apply),
    "gnn_film": (gnn_film_init, gnn_film_apply),
    "rgdcn": (rgdcn_init, rgdcn_apply),
}
