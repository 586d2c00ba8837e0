"""Edge-level gather/aggregate primitives with sorted-scatter backwards.

TPU motivation (measured on v5e): XLA's unsorted scatter-add over ~1M edge
rows runs at ~100 GB/s effective, the sorted variant at ~160 GB/s, and
gathers at ~300 GB/s. Every op here is arranged so that BOTH the forward
and the backward pass only ever execute
  (a) gathers, and
  (b) segment-sums over SORTED indices.

This relies on the canonical `EdgeBlock` layout (ops/graph.py): edges sorted
by receiver, plus `perm_by_sender`, the permutation that sorts the block by
sender. The VJP of a source-side gather is a scatter-add over senders —
re-expressed through the permutation it becomes a sorted segment-sum:

    d/dT [ T[snd_e] ]  =  scatter_add(G, snd)          (unsorted, slow)
                       =  segment_sum(G[perm], snd[perm], sorted)  (fast)

These replace the reference's tf.gather / tf.unsorted_segment_* hot pair
(e.g. gnns/rgcn.py:92-112) — same math, TPU-shaped execution.
"""



import functools

import numpy as np

import jax
import jax.numpy as jnp

from .graph import EdgeBlock


def _sorted_segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=True
    )


# ---------------------------------------------------------------------------
# Gathers with sorted-scatter VJPs
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_permuted(table, idx, perm, idx_sorted):
    """table[idx] whose VJP scatters via the sorted order: idx[perm] must
    equal idx_sorted (ascending)."""
    return jnp.take(table, idx, axis=0, mode="clip")


def _gather_permuted_fwd(table, idx, perm, idx_sorted):
    out = jnp.take(table, idx, axis=0, mode="clip")
    return out, (perm, idx_sorted, table.shape[0])


def _gather_permuted_bwd(res, g):
    perm, idx_sorted, num_rows = res
    d_table = _sorted_segment_sum(
        jnp.take(g, perm, axis=0), idx_sorted, num_rows + 1
    )[:num_rows]
    return (d_table, None, None, None)


_gather_permuted.defvjp(_gather_permuted_fwd, _gather_permuted_bwd)


@jax.custom_vjp
def _gather_sorted(table, idx_sorted):
    """table[idx] for ALREADY-SORTED idx; VJP is a sorted segment-sum."""
    return jnp.take(table, idx_sorted, axis=0, mode="clip")


def _gather_sorted_fwd(table, idx_sorted):
    out = jnp.take(table, idx_sorted, axis=0, mode="clip")
    return out, (idx_sorted, table.shape[0])


def _gather_sorted_bwd(res, g):
    idx_sorted, num_rows = res
    d_table = _sorted_segment_sum(g, idx_sorted, num_rows + 1)[:num_rows]
    return (d_table, None)


_gather_sorted.defvjp(_gather_sorted_fwd, _gather_sorted_bwd)


def gather_src(table, block: EdgeBlock):
    """table[senders] — bwd is a sorted segment-sum via perm_by_sender.

    Padded senders point at n_pad and are clipped (their contribution is
    killed by mask/scale downstream)."""
    snd_sorted = jnp.take(block.senders, block.perm_by_sender)
    return _gather_permuted(table, block.senders, block.perm_by_sender, snd_sorted)


def gather_tgt(table, block: EdgeBlock):
    """table[receivers] — receivers are already sorted, so the bwd
    segment-sum is sorted with no permutation."""
    return _gather_sorted(table, block.receivers)


def gather_src_stacked(table, te_l):
    """table[senders] for one TypedEdges slice (ops/typed_stream.py) —
    same sorted-scatter VJP as gather_src, usable inside lax.scan."""
    return _gather_permuted(
        table, te_l.senders, te_l.perm_by_sender, te_l.senders_sorted
    )


def gather_tgt_stacked(table, te_l):
    """table[receivers] for one TypedEdges slice; receivers sorted."""
    return _gather_sorted(table, te_l.receivers)


# ---------------------------------------------------------------------------
# Aggregation over the canonical (receiver-sorted) order
# ---------------------------------------------------------------------------


def aggregate_sum_block(messages, block: EdgeBlock, n_pad: int):
    """Sum per-edge messages into receiver rows. [E, ...] -> [n_pad, ...].

    Sorted forward; the VJP of segment_sum is a gather (already fast)."""
    return _sorted_segment_sum(messages, block.receivers, n_pad + 1)[:n_pad]


def aggregate_blocks(per_type_messages, graph, aggregation: str):
    """Aggregate per-type message lists into [n_pad, D] under the named
    aggregation (reference: utils/utils.py:23-33). Sum-family aggregations
    decompose per type (sum of per-type sorted segment-sums); max takes a
    per-type sorted segment-max then an elementwise max across types."""
    # Padded edges always carry receiver == n_pad, landing in the dump row
    # that is sliced off — no per-edge masking needed in the hot path.
    n_pad = graph.n_pad
    if aggregation in ("sum", "unsorted_segment_sum"):
        out = None
        for m, e in zip(per_type_messages, graph.edges):
            part = aggregate_sum_block(m, e, n_pad)
            out = part if out is None else out + part
        return out
    if aggregation in ("mean", "unsorted_segment_mean",
                       "sqrt_n", "unsorted_segment_sqrt_n"):
        total = None
        count = None
        for m, e in zip(per_type_messages, graph.edges):
            part = aggregate_sum_block(m, e, n_pad)
            cnt = _sorted_segment_sum(e.mask, e.receivers, n_pad + 1)[:n_pad]
            total = part if total is None else total + part
            count = cnt if count is None else count + cnt
        count = jnp.maximum(count, 1.0)
        if aggregation.endswith("sqrt_n"):
            count = jnp.sqrt(count)
        return total / count[:, None]
    if aggregation in ("max", "unsorted_segment_max"):
        out = None
        neg = jnp.finfo(per_type_messages[0].dtype).min
        for m, e in zip(per_type_messages, graph.edges):
            part = jax.ops.segment_max(
                m, e.receivers, n_pad + 1, indices_are_sorted=True
            )[:n_pad]
            out = part if out is None else jnp.maximum(out, part)
        return jnp.maximum(out, neg)  # empty segments -> dtype min (TF parity)
    raise ValueError("Unknown aggregation function '%s'!" % aggregation)


# ---------------------------------------------------------------------------
# Flat-stream variants (type-count-independent compute graphs)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gather_ranked(table, idx, perm, sorted_rank, to_rank, block_edges,
                   win=0):
    """table[idx] whose VJP runs the scatter THROUGH the streaming
    rank-table kernel: segment-sum the permuted cotangent by the
    host-precomputed gap-free ranks of the sorted index stream, then map
    rank rows back to table rows with one cheap [rows]-gather
    (ops/ranked_segment.py)."""
    return jnp.take(table, idx, axis=0, mode="clip")


def _gather_ranked_fwd(table, idx, perm, sorted_rank, to_rank, block_edges,
                       win):
    out = jnp.take(table, idx, axis=0, mode="clip")
    # Zero-width proto carries the primal table's row count and dtype so
    # the backward can pad its cotangent to exactly the primal's shape
    # (to_rank covers only the first L*n_pad rows; tables may carry an
    # extra clip/dump row).
    res = (perm, sorted_rank, to_rank, table.shape[0],
           jnp.zeros((table.shape[0], 0), table.dtype))
    return out, res


def _gather_ranked_bwd(block_edges, win, res, g):
    from .ranked_segment import _ceil_mult, ranked_segment_sum_table

    perm, sorted_rank, to_rank, num_rows, proto = res
    e_tot = perm.shape[0]
    rows = _ceil_mult(min(num_rows + 1, e_tot), 8) + block_edges + 8
    # Permute the cotangent in bf16: the ranked segment-sum kernel casts
    # its stream to bf16 for the MXU one-hot dot regardless, so this is
    # the same quantization with half the [E, D] permute traffic. perm is
    # a permutation (always in bounds) — mode="clip" avoids XLA's fill
    # lowering, which materializes an extra [E, D] select. (An int32
    # lane-pair bitcast to shrink the gather's tile span was measured
    # SLOWER: the [E, D] -> [E, D/2, 2] reshape is a physical relayout
    # costing more than the tile-amplification it saves.)
    g_perm = jnp.take(g.astype(jnp.bfloat16), perm, axis=0, mode="clip")
    rank_table = ranked_segment_sum_table(g_perm, sorted_rank, rows,
                                          block_edges, win)
    valid = to_rank >= 0
    d_table = jnp.take(rank_table, jnp.maximum(to_rank, 0), axis=0)
    d_table = jnp.where(valid[:, None], d_table, 0.0).astype(proto.dtype)
    pad = proto.shape[0] - d_table.shape[0]
    if pad:
        d_table = jnp.pad(d_table, ((0, pad), (0, 0)))
    return (d_table, None, None, None, None)


_gather_ranked.defvjp(_gather_ranked_fwd, _gather_ranked_bwd)


def _ranked_gather_ok(table, flat, rank_field) -> bool:
    from . import ranked_segment as rs

    if getattr(flat, rank_field, None) is None:
        return False
    if not (rs.on_tpu() or rs._FORCE_INTERPRET):
        return False
    e_tot = flat.src_flat.shape[0]
    d = int(np.prod(table.shape[1:]))
    if d < 64:  # narrow streams: XLA's segment-sum is cheap enough
        return False
    rows = rs._ceil_mult(min(table.shape[0] + 1, e_tot), 8) + 256 + 8
    return rs.ranked_supported(e_tot, d, rows)


def gather_flat_src(table_flat, flat):
    """table_flat[[L*N, ...]][src_flat] — per-edge source-side value from a
    type-stacked node table; bwd is a streaming ranked segment-sum when
    the shape qualifies, else a sorted XLA segment-sum via perm_by_src."""
    if _ranked_gather_ok(table_flat, flat, "src_sorted_rank"):
        from .graph import token_window
        tail = table_flat.shape[1:]
        out = _gather_ranked(
            table_flat.reshape(table_flat.shape[0], -1), flat.src_flat,
            flat.perm_by_src, flat.src_sorted_rank, flat.src_to_rank, 256,
            token_window(flat.win_src),
        )
        return out.reshape((flat.src_flat.shape[0],) + tail)
    idx_sorted = jnp.take(flat.src_flat, flat.perm_by_src)
    return _gather_permuted(table_flat, flat.src_flat, flat.perm_by_src, idx_sorted)


def gather_flat_tgt(table_flat, flat):
    """table_flat[[L*N, ...]][tgt_flat]; bwd streaming-ranked when the
    shape qualifies, else sorted via perm_by_tgt."""
    if _ranked_gather_ok(table_flat, flat, "tgt_sorted_rank"):
        from .graph import token_window
        tail = table_flat.shape[1:]
        out = _gather_ranked(
            table_flat.reshape(table_flat.shape[0], -1), flat.tgt_flat,
            flat.perm_by_tgt, flat.tgt_sorted_rank, flat.tgt_to_rank, 256,
            token_window(flat.win_tgt),
        )
        return out.reshape((flat.tgt_flat.shape[0],) + tail)
    idx_sorted = jnp.take(flat.tgt_flat, flat.perm_by_tgt)
    return _gather_permuted(table_flat, flat.tgt_flat, flat.perm_by_tgt, idx_sorted)


def gather_node_tgt(table, flat):
    """table[[N, ...]][receivers] — type-independent target-side gather;
    receivers are globally sorted so the bwd needs no permutation."""
    return _gather_sorted(table, flat.receivers)


def aggregate_flat_sum(messages, flat, n_pad: int):
    """Sum per-edge messages into receiver rows over the WHOLE edge stream
    — one sorted segment-sum for all edge types."""
    return _sorted_segment_sum(messages, flat.receivers, n_pad + 1)[:n_pad]


def aggregate_flat(messages, flat, n_pad: int, aggregation: str):
    """Named aggregation (utils/utils.py:23-33) over the flat edge stream."""
    if aggregation in ("sum", "unsorted_segment_sum"):
        return aggregate_flat_sum(messages, flat, n_pad)
    if aggregation in ("mean", "unsorted_segment_mean",
                       "sqrt_n", "unsorted_segment_sqrt_n"):
        total = aggregate_flat_sum(messages, flat, n_pad)
        count = _sorted_segment_sum(flat.mask, flat.receivers, n_pad + 1)[:n_pad]
        count = jnp.maximum(count, 1.0)
        if aggregation.endswith("sqrt_n"):
            count = jnp.sqrt(count)
        return total / count.reshape(count.shape + (1,) * (total.ndim - 1))
    if aggregation in ("max", "unsorted_segment_max"):
        out = jax.ops.segment_max(
            messages, flat.receivers, n_pad + 1, indices_are_sorted=True
        )[:n_pad]
        return jnp.maximum(out, jnp.finfo(messages.dtype).min)
    raise ValueError("Unknown aggregation function '%s'!" % aggregation)


def fine_rank_to_flat(graph):
    """Fine-rank-indexed type-stacked node index: rank_nodes[r] = tgt_flat
    of the edges in (receiver, type) group r. Host-precomputed on padded
    batches (ops/graph.py FlatEdges.fine_to_flat); the in-jit fallback is
    an [E]-sized scatter. Slack rows read row 0 downstream (harmless:
    their table rows are never combined into real nodes)."""
    from .ranked_segment import fine_rank_table_rows

    flat = graph.flat
    if getattr(flat, "fine_to_flat", None) is not None:
        return flat.fine_to_flat
    n_pad, L = graph.n_pad, graph.num_edge_types
    rpad = fine_rank_table_rows(n_pad, L, flat.tgt_rank.shape[0], 256)
    return jnp.zeros((rpad,), jnp.int32).at[flat.tgt_rank].set(
        jnp.minimum(flat.tgt_flat, L * n_pad - 1), mode="drop"
    )


@jax.custom_vjp
def _injective_take(table, fwd_idx, inv_idx):
    return jnp.take(table, fwd_idx, axis=0, mode="clip")


def _injective_take_fwd(table, fwd_idx, inv_idx):
    out = _injective_take(table, fwd_idx, inv_idx)
    return out, (inv_idx, jnp.zeros((0,), table.dtype))


def _injective_take_bwd(res, g):
    inv_idx, proto = res
    d = jnp.take(g, jnp.maximum(inv_idx, 0), axis=0)
    d = jnp.where((inv_idx >= 0)[:, None], d, 0.0).astype(proto.dtype)
    return (d, None, None)


_injective_take.defvjp(_injective_take_fwd, _injective_take_bwd)


def take_by_fine_rank(table_flat, graph):
    """table_flat rows at each FINE (receiver, type) rank.

    fine_to_flat hits every real flat slot at most once (distinct fine
    groups occupy distinct (type, receiver) slots), and the ranks it
    maps non-injectively — slack rows (-> row 0) and the padded-edge dump
    group (-> the last row) — carry exactly-zero cotangents (their table
    rows reduce to the sliced-off dump node or to nothing). So the VJP is
    the INVERSE take through fine_from_flat instead of XLA's scatter-add
    (measured 0.57 ms per [18k, 640] scatter at PPI scale vs ~0.1 ms for
    a take)."""
    flat = graph.flat
    if (getattr(flat, "fine_from_flat", None) is not None
            and getattr(flat, "fine_to_flat", None) is not None):
        return _injective_take(table_flat, flat.fine_to_flat,
                               flat.fine_from_flat)
    return jnp.take(table_flat, fine_rank_to_flat(graph), axis=0,
                    mode="clip")


def fine_rank_to_receiver(graph):
    """Receiver node id per fine rank (nondecreasing; slack rows -> dump
    row n_pad so sorted segment ops stay valid). Host-precomputed when
    available (FlatEdges.fine_to_rcv)."""
    from .ranked_segment import fine_rank_table_rows

    flat = graph.flat
    if getattr(flat, "fine_to_rcv", None) is not None:
        return flat.fine_to_rcv
    rpad = fine_rank_table_rows(
        graph.n_pad, graph.num_edge_types, flat.tgt_rank.shape[0], 256
    )
    return jnp.full((rpad,), graph.n_pad, jnp.int32).at[flat.tgt_rank].set(
        flat.receivers, mode="drop"
    )


@jax.custom_vjp
def _fine_combine(table, from_flat_2d, to_rcv, n_pad):
    rows = jnp.take(table, jnp.maximum(from_flat_2d, 0), axis=0,
                    mode="clip")
    return jnp.sum(
        jnp.where((from_flat_2d >= 0)[..., None], rows, 0.0), axis=0
    )


def _fine_combine_fwd(table, from_flat_2d, to_rcv, n_pad):
    out = _fine_combine(table, from_flat_2d, to_rcv, n_pad)
    return out, (to_rcv, n_pad)


def _fine_combine_bwd(res, g):
    to_rcv, n_pad = res
    # Each real fine rank belongs to exactly one receiver, so the combine's
    # transpose is a plain row take by fine_to_rcv (slack/dump rows point
    # at n_pad and get zero).
    d = jnp.take(g, jnp.minimum(to_rcv, n_pad - 1), axis=0, mode="clip")
    d = jnp.where((to_rcv < n_pad)[:, None], d, 0.0)
    return (d.astype(g.dtype), None, None, None)


_fine_combine.defvjp(_fine_combine_fwd, _fine_combine_bwd)


def fine_table_to_nodes(table, graph):
    """Combine a FINE (receiver, type) rank table into node rows: sum the
    <= L rows of each receiver.

    Take-based on both sides when the host-precomputed maps exist:
    fine_from_flat reshaped to [L, n_pad] gives each (type, node) slot's
    fine rank (-1 = none), so the combine is L node-table row takes + a
    masked sum, and its transpose is one take by fine_to_rcv — XLA's
    scatter lowering of the equivalent sorted segment-sum measured ~0.22 ms
    per [18.7k, 320] call at PPI scale vs ~0.03 ms for the takes."""
    flat = graph.flat
    n_pad, L = graph.n_pad, graph.num_edge_types
    if (getattr(flat, "fine_from_flat", None) is not None
            and getattr(flat, "fine_to_rcv", None) is not None):
        ffl = flat.fine_from_flat.reshape(L, n_pad)
        return _fine_combine(table, ffl, flat.fine_to_rcv, n_pad)
    rank_rcv = fine_rank_to_receiver(graph)
    return jax.ops.segment_sum(
        table, rank_rcv, graph.n_pad + 1, indices_are_sorted=True
    )[: graph.n_pad]


def ranked_table_to_nodes(table, graph):
    """Map a COARSE rank table [RPAD, D] back to node rows [n_pad, D]."""
    out = jnp.take(table, graph.node_to_rank, axis=0, mode="clip")
    return out * graph.node_has_incoming[:, None]


def aggregate_flat_ranked(messages, graph, aggregation: str,
                          block_edges: int = 256):
    """Named aggregation via the streaming rank-table kernel
    (ops/ranked_segment.py) — sum-family only; caller must have checked
    ranked_supported."""
    from .ranked_segment import rank_table_rows, ranked_segment_sum_table

    from .graph import token_window

    n_pad = graph.n_pad
    msgs2d = messages.reshape(messages.shape[0], -1)
    table = ranked_segment_sum_table(
        msgs2d, graph.flat.rcv_rank, rank_table_rows(n_pad, block_edges),
        block_edges, token_window(graph.flat.win_fine),
    )
    out = ranked_table_to_nodes(table, graph).reshape(
        (n_pad,) + messages.shape[1:]
    )
    if aggregation in ("sum", "unsorted_segment_sum"):
        return out
    count = jnp.maximum(graph.typed_incoming_counts.sum(axis=0), 1.0)
    if aggregation.endswith("sqrt_n"):
        count = jnp.sqrt(count)
    return out / count.reshape((n_pad,) + (1,) * (messages.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _gather_segsum(table_flat, src_flat, rcv_rank, coarse_by_src,
                   src_stream_rank, src_to_rank, win_fine_tok, win_src_tok,
                   rows, src_rows, block_edges):
    """take(table_flat)[src] -> streaming coarse-rank segment-sum, with a
    SOURCE-ORDER backward: because the forward aggregation is a plain
    segment-sum by receiver, the per-edge cotangent is exactly the
    receiver's table-cotangent row — so instead of permuting the [E, D]
    upstream cotangent into source order (the measured per-edge reorder
    wall: ~80-100M rows/s from a large [E, D] source), the backward
    re-gathers it per edge from the SMALL [rows, D] table cotangent
    (~325M rows/s) and runs the windowed src-rank segment-sum directly.
    Dump-rank rows of the table cotangent are zero (ranked_table_to_nodes
    only takes real ranks), so padded edges (and any diluted-stream fill
    slots, whose SD_FILL coarse keys clamp to the slack last row)
    contribute nothing. `coarse_by_src` / `src_stream_rank` are the
    src-order backward stream — the DILUTED sd_coarse / sd_rank when the
    fold's window engaged, else the undiluted equivalents (see
    _src_bwd_stream)."""
    from .graph import token_window
    from .ranked_segment import ranked_segment_sum_table

    m = jnp.take(table_flat, src_flat, axis=0, mode="clip")
    return ranked_segment_sum_table(
        m, rcv_rank, rows, block_edges, token_window(win_fine_tok)
    )


def _src_bwd_stream(flat):
    """(coarse_by_src, stream_rank, win_tok) for src-order backward
    segment-sums: the diluted stream when its window engaged (see
    ops/graph.py FlatEdges.sd_*), else the undiluted stream with the
    coarse rank recovered via an in-jit take."""
    from .graph import token_window

    if (token_window(getattr(flat, "win_sd", None))
            and getattr(flat, "sd_coarse", None) is not None):
        return flat.sd_coarse, flat.sd_rank, flat.win_sd
    return (jnp.take(flat.rcv_rank, flat.perm_by_src),
            flat.src_sorted_rank, flat.win_src)


def _gather_segsum_fwd(table_flat, src_flat, rcv_rank, coarse_by_src,
                       src_stream_rank, src_to_rank, win_fine_tok,
                       win_src_tok, rows, src_rows, block_edges):
    out = _gather_segsum(
        table_flat, src_flat, rcv_rank, coarse_by_src, src_stream_rank,
        src_to_rank, win_fine_tok, win_src_tok, rows, src_rows, block_edges
    )
    # Zero-width proto carries the primal table's ROW COUNT and dtype so
    # the backward can emit a cotangent of exactly the primal's shape
    # (src_to_rank covers only the L*n_pad real rows; callers may pass a
    # table with an extra clip/dump row).
    res = (coarse_by_src, src_stream_rank, src_to_rank,
           win_src_tok, jnp.zeros((table_flat.shape[0], 0),
                                  table_flat.dtype))
    return out, res


def _gather_segsum_bwd(rows, src_rows, block_edges, res, g):
    from .graph import token_window
    from .ranked_segment import ranked_segment_sum_table

    (coarse_by_src, src_stream_rank, src_to_rank, win_src_tok,
     proto) = res
    # Appended zero row: diluted fill slots (SD_FILL keys) clamp onto it
    # and stay inert for ARBITRARY cotangents (not just the model's
    # zero-slack-row usage).
    gz = jnp.concatenate(
        [g.astype(jnp.bfloat16),
         jnp.zeros((8, g.shape[1]), jnp.bfloat16)], axis=0)
    g_edge = jnp.take(
        gz, jnp.minimum(coarse_by_src, rows), axis=0, mode="clip",
    )
    dt_table = ranked_segment_sum_table(
        g_edge, src_stream_rank, src_rows, block_edges,
        token_window(win_src_tok),
    )
    valid = src_to_rank >= 0
    d_flat = jnp.take(dt_table, jnp.maximum(src_to_rank, 0), axis=0)
    d_flat = jnp.where(valid[:, None], d_flat, 0.0).astype(proto.dtype)
    pad = proto.shape[0] - d_flat.shape[0]
    if pad:
        d_flat = jnp.pad(d_flat, ((0, pad), (0, 0)))
    return (d_flat, None, None, None, None, None, None, None)


_gather_segsum.defvjp(_gather_segsum_fwd, _gather_segsum_bwd)


def gather_aggregate_src_ok(graph, aggregation: str, d: int) -> bool:
    """Eligibility of the fused gather+segment-sum (src-order backward):
    sum-family aggregation, src-sorted rank machinery present, and both
    the coarse receiver table and the src-rank table within the streaming
    kernel's VMEM model."""
    from . import ranked_segment as rs

    flat = graph.flat
    if (getattr(flat, "src_sorted_rank", None) is None
            or getattr(flat, "src_to_rank", None) is None
            or getattr(flat, "win_src", None) is None):
        return False
    if not ranked_aggregation_ok(graph, aggregation, 1, d):
        return False
    e_tot = flat.src_flat.shape[0]
    src_rows = _gather_src_rows(graph)
    return rs.ranked_supported(e_tot, d, src_rows)


def _gather_src_rows(graph, block_edges: int = 256) -> int:
    from .ranked_segment import _ceil_mult

    flat = graph.flat
    e_tot = flat.src_flat.shape[0]
    num_rows = graph.num_edge_types * graph.n_pad + 1
    return _ceil_mult(min(num_rows + 1, e_tot), 8) + block_edges + 8


def gather_aggregate_src(table_flat, graph, aggregation: str,
                         block_edges: int = 256):
    """aggregate_flat_ranked(gather_flat_src(table_flat)) as ONE custom-VJP
    op whose backward never materializes an [E, D] reorder (see
    _gather_segsum). table_flat: type-stacked node table [L*N(+1), D];
    caller must have checked gather_aggregate_src_ok."""
    from .ranked_segment import rank_table_rows

    flat = graph.flat
    n_pad = graph.n_pad
    coarse_by_src, stream_rank, win_tok = _src_bwd_stream(flat)
    table = _gather_segsum(
        table_flat, flat.src_flat, flat.rcv_rank, coarse_by_src,
        stream_rank, flat.src_to_rank, flat.win_fine,
        win_tok, rank_table_rows(n_pad, block_edges),
        _gather_src_rows(graph), block_edges,
    )
    out = ranked_table_to_nodes(table, graph)
    if aggregation in ("sum", "unsorted_segment_sum"):
        return out
    count = jnp.maximum(graph.typed_incoming_counts.sum(axis=0), 1.0)
    if aggregation.endswith("sqrt_n"):
        count = jnp.sqrt(count)
    return out / count[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _gather_segsum_fine(table_flat, src_flat, tgt_rank, fine_rank_by_src,
                        perm_by_src, src_sorted_rank, src_to_rank,
                        norm_scale, win_fine_tok, win_src_tok,
                        fine_rows, src_rows, block_edges, normalize):
    """take(table_flat)[src] (optionally 1/c-normalized) -> streaming FINE
    (receiver, type) rank segment-sum, with a SOURCE-ORDER backward: the
    per-edge cotangent is the fine table-cotangent row of the edge's
    (receiver, type) group (times its norm scale), so the backward
    re-gathers it from the [fine_rows, D] table (small-table row rate)
    and runs the windowed src-rank segment-sum — never materializing the
    [E, D] cotangent permute (the per-edge reorder wall; see
    _gather_segsum, the coarse-table sibling). `fine_rank_by_src` is the
    host-precomputed tgt_rank[perm_by_src] (ops/graph.py), so the backward
    pays no [E] re-gather."""
    from .graph import token_window
    from .ranked_segment import ranked_segment_sum_table

    m = jnp.take(table_flat, src_flat, axis=0, mode="clip")
    if normalize:
        m = m.astype(jnp.float32) * norm_scale[:, None]
    return ranked_segment_sum_table(
        m, tgt_rank, fine_rows, block_edges, token_window(win_fine_tok)
    )


def _gather_segsum_fine_fwd(table_flat, src_flat, tgt_rank, fine_rank_by_src,
                            perm_by_src, src_sorted_rank, src_to_rank,
                            norm_scale, win_fine_tok, win_src_tok,
                            fine_rows, src_rows, block_edges, normalize):
    out = _gather_segsum_fine(
        table_flat, src_flat, tgt_rank, fine_rank_by_src, perm_by_src,
        src_sorted_rank, src_to_rank, norm_scale, win_fine_tok, win_src_tok,
        fine_rows, src_rows, block_edges, normalize,
    )
    # norm_scale is a nondiff static per batch: keep it out of the
    # forward-to-backward residual set when normalize is off. The
    # zero-width proto carries the primal table's row count and dtype so
    # the backward can pad its cotangent to exactly the primal's shape.
    ns_res = norm_scale if normalize else jnp.zeros((0,), norm_scale.dtype)
    perm_res = perm_by_src if normalize else jnp.zeros((0,), jnp.int32)
    res = (fine_rank_by_src, perm_res, src_sorted_rank, src_to_rank, ns_res,
           win_src_tok, jnp.zeros((table_flat.shape[0], 0),
                                  table_flat.dtype))
    return out, res


def _gather_segsum_fine_bwd(fine_rows, src_rows, block_edges, normalize,
                            res, g):
    from .graph import token_window
    from .ranked_segment import ranked_segment_sum_table

    (fine_rank_by_src, perm_by_src, src_sorted_rank, src_to_rank,
     norm_scale, win_src_tok, proto) = res
    # Appended zero row: diluted fill slots (SD_FILL keys) clamp onto it
    # and stay inert for ARBITRARY cotangents.
    gz = jnp.concatenate(
        [g.astype(jnp.bfloat16),
         jnp.zeros((8, g.shape[1]), jnp.bfloat16)], axis=0)
    g_edge = jnp.take(
        gz, jnp.minimum(fine_rank_by_src, fine_rows), axis=0, mode="clip",
    )
    if normalize:
        ns = jnp.take(norm_scale, perm_by_src)
        g_edge = (g_edge.astype(jnp.float32) * ns[:, None]).astype(
            jnp.bfloat16)
    dt_table = ranked_segment_sum_table(
        g_edge, src_sorted_rank, src_rows, block_edges,
        token_window(win_src_tok),
    )
    valid = src_to_rank >= 0
    d_flat = jnp.take(dt_table, jnp.maximum(src_to_rank, 0), axis=0)
    d_flat = jnp.where(valid[:, None], d_flat, 0.0).astype(proto.dtype)
    pad = proto.shape[0] - d_flat.shape[0]
    if pad:
        d_flat = jnp.pad(d_flat, ((0, pad), (0, 0)))
    return (d_flat, None, None, None, None, None, None, None, None, None)


_gather_segsum_fine.defvjp(_gather_segsum_fine_fwd, _gather_segsum_fine_bwd)


def gather_aggregate_fine_ok(graph, d: int, block_edges: int = 256) -> bool:
    """Eligibility of the fused gather + FINE-rank segment-sum: src-sorted
    rank machinery present and both the fine receiver table and the
    src-rank table within the streaming kernel's VMEM model. `block_edges`
    must match the value the op will be called with (it sizes both rank
    tables)."""
    from . import ranked_segment as rs

    flat = graph.flat
    if (getattr(flat, "src_sorted_rank", None) is None
            or getattr(flat, "src_to_rank", None) is None
            or getattr(flat, "fine_rank_by_src", None) is None
            or getattr(flat, "win_src", None) is None):
        return False
    if not (rs.on_tpu() or rs._FORCE_INTERPRET):
        return False
    e_tot = flat.src_flat.shape[0]
    fine_rows = rs.fine_rank_table_rows(
        graph.n_pad, graph.num_edge_types, e_tot, block_edges
    )
    return (rs.ranked_supported(e_tot, d, fine_rows, block_edges)
            and rs.ranked_supported(e_tot, d,
                                    _gather_src_rows(graph, block_edges),
                                    block_edges))


def gather_aggregate_fine(table_flat, graph, normalize: bool,
                          block_edges: int = 256):
    """ranked_segment_sum_table(gather_flat_src(table_flat) * norm) over
    FINE (receiver, type) ranks as ONE custom-VJP op whose backward never
    materializes an [E, D] reorder (see _gather_segsum_fine). table_flat:
    type-stacked node table [L*N(+1), D]; caller must have checked
    gather_aggregate_fine_ok. Returns the fine rank table [fine_rows, D]."""
    from . import ranked_segment as rs

    flat = graph.flat
    e_tot = flat.src_flat.shape[0]
    fine_rows = rs.fine_rank_table_rows(
        graph.n_pad, graph.num_edge_types, e_tot, block_edges
    )
    from .graph import token_window

    # Diluted backward stream (fine-rank keyed; SD_FILL slots clamp to
    # the fine table's zero-cotangent slack row). The NORMALIZE branch
    # needs per-edge norm scales in src order (norm_scale[perm]), which
    # the diluted stream does not carry — it keeps the undiluted path.
    if (not normalize
            and token_window(getattr(flat, "win_sd", None))
            and getattr(flat, "sd_fine", None) is not None):
        fine_by_src, stream_rank, win_tok = (
            flat.sd_fine, flat.sd_rank, flat.win_sd)
    else:
        fine_by_src, stream_rank, win_tok = (
            flat.fine_rank_by_src, flat.src_sorted_rank, flat.win_src)
    return _gather_segsum_fine(
        table_flat, flat.src_flat, flat.tgt_rank, fine_by_src,
        flat.perm_by_src, stream_rank, flat.src_to_rank,
        flat.norm_scale, flat.win_fine, win_tok,
        fine_rows, _gather_src_rows(graph, block_edges), block_edges,
        normalize,
    )


# ---------------------------------------------------------------------------
# Type-major stream ops (FlatEdges.tm_*): per-type contiguous segments
# ---------------------------------------------------------------------------


def tm_available(graph) -> bool:
    flat = graph.flat
    return all(
        getattr(flat, f, None) is not None
        for f in ("tm_src_flat", "tm_rank", "tm_perm_by_src", "tm_to_flat",
                  "tm_from_flat", "tm_to_rcv", "win_tm", "tm_self",
                  "src_sorted_rank", "src_to_rank", "win_src")
    )


def tm_self_types(graph):
    """Static per-type self-loop flags of the type-major view (decoded
    from the shape-encoded FlatEdges.tm_self tokens)."""
    return tuple(
        int(tok.shape[0]) == 2 for tok in graph.flat.tm_self
    )


def gather_tm_src(table_flat, graph):
    """table_flat[tm_src_flat] over the TYPE-MAJOR stream; bwd is the
    streaming ranked segment-sum via the SHARED src-sorted ranks (the
    src-sorted values of both stream orders are identical — only the
    permutation differs, FlatEdges.tm_perm_by_src)."""
    from .graph import token_window

    flat = graph.flat
    return _gather_ranked(
        table_flat, flat.tm_src_flat, flat.tm_perm_by_src,
        flat.src_sorted_rank, flat.src_to_rank, 256,
        token_window(flat.win_src),
    )


def take_by_tm_rank(table_flat, graph):
    """table_flat rows at each TYPE-MAJOR (type, receiver) group rank,
    with the inverse-take VJP (see take_by_fine_rank)."""
    flat = graph.flat
    return _injective_take(table_flat, flat.tm_to_flat, flat.tm_from_flat)


def tm_table_to_nodes(table, graph):
    """Combine a type-major rank table into node rows (take-based on both
    sides, see fine_table_to_nodes)."""
    flat = graph.flat
    ffl = flat.tm_from_flat.reshape(graph.num_edge_types, graph.n_pad)
    return _fine_combine(table, ffl, flat.tm_to_rcv, graph.n_pad)


def ranked_aggregation_ok(graph, aggregation: str, ndim_extra: int,
                          d: int, film: bool = False) -> bool:
    """Trace-time eligibility of the ranked kernel path."""
    from . import ranked_segment as rs

    if aggregation in ("max", "unsorted_segment_max"):
        return False
    # On CPU only when tests force interpreter mode (kernels are TPU code):
    if not (rs.on_tpu() or rs._FORCE_INTERPRET):
        return False
    e_tot = graph.flat.rcv_rank.shape[0]
    if film:
        rows = rs.fine_rank_table_rows(
            graph.n_pad, graph.num_edge_types, e_tot, 256
        )
        return rs.film_column_splits(e_tot, d, rows) > 0
    return rs.ranked_supported(e_tot, d, rs.rank_table_rows(graph.n_pad, 256))


def segment_softmax_flat(logits, flat, n_pad: int):
    """Softmax per receiver over all incoming edges of all types
    (reference RGAT semantics, gnns/rgat.py:126-130) on the flat stream:
    one sorted segment-max + one sorted segment-sum."""
    neg = jnp.finfo(logits.dtype).min
    mask = flat.mask.reshape(flat.mask.shape + (1,) * (logits.ndim - 1))
    masked = jnp.where(mask > 0, logits, neg)
    gmax = jax.ops.segment_max(
        masked, flat.receivers, n_pad + 1, indices_are_sorted=True
    )[:n_pad]
    gmax = jnp.maximum(gmax, neg)
    # exp over the MASKED logits: a padded edge sees masked == neg and a
    # clipped shift that may also be neg; neg - neg == 0 -> exp 1 -> * mask 0.
    # Using the raw logits here would overflow exp to inf on padded edges
    # whose clipped shift row is a padding node (inf * 0 == NaN).
    ex = jnp.exp(masked - gather_node_tgt(gmax, flat)) * mask
    denom = aggregate_flat_sum(ex, flat, n_pad)
    small = 1e-7  # SMALL_NUMBER
    return ex / (gather_node_tgt(denom, flat) + small)


def segment_softmax_flat_ranked(logits, graph, clamp: float = 50.0,
                                block_edges: int = 256):
    """Receiver-segment softmax over the flat stream via the streaming
    rank-table kernels, replacing XLA's lane-padded [E, K] segment max/sum
    scatters with dense [E, K] passes.

    Uses clamped exp instead of a max shift: softmax is shift-invariant,
    and clamping |logit| at 50 only distorts segments whose logit SPREAD
    exceeds 50 (attention weights < e^-50 are zero either way). When every
    logit of a segment clamps low, the weights still normalize to the
    uniform distribution. Padded edges get weight 0 via the stream mask."""
    from .graph import token_window
    from .ranked_segment import (ranked_expand_table,
                                 ranked_segment_sum_table, rank_table_rows)

    flat = graph.flat
    win = token_window(flat.win_fine)
    mask = flat.mask.reshape(flat.mask.shape + (1,) * (logits.ndim - 1))
    ex = jnp.exp(jnp.clip(logits, -clamp, clamp)) * mask
    rows = rank_table_rows(graph.n_pad, block_edges)
    den = ranked_segment_sum_table(ex, flat.rcv_rank, rows, block_edges, win)
    small = 1e-7  # SMALL_NUMBER
    return ex / (ranked_expand_table(den, flat.rcv_rank, rows, block_edges,
                                     win)
                 + small)


def segment_softmax_flat_ranked_t(logits_t, graph, clamp: float = 50.0,
                                  block_edges: int = 256):
    """Head-major variant of segment_softmax_flat_ranked: logits and the
    returned attention weights are [K, E]. Narrow [E, K] arrays tile to a
    full (8, 128) f32 tile per 8 rows (32x physical inflation at K=4);
    the [K, E] layout is compact, and the ranked segment kernels run in
    their transposed forms (ops/ranked_segment.py *_t)."""
    from .graph import token_window
    from .ranked_segment import (ranked_expand_table_t,
                                 ranked_segment_sum_table_t,
                                 rank_table_rows)

    flat = graph.flat
    win = token_window(flat.win_fine)
    ex = jnp.exp(jnp.clip(logits_t, -clamp, clamp)) * flat.mask[None, :]
    rows = rank_table_rows(graph.n_pad, block_edges)
    den = ranked_segment_sum_table_t(ex, flat.rcv_rank, rows, block_edges,
                                     win)
    small = 1e-7  # SMALL_NUMBER
    return ex / (ranked_expand_table_t(den, flat.rcv_rank, rows,
                                       block_edges, win)
                 + small)


def dense_adjacency(graph, dtype=jnp.float32):
    """Materialize per-type dense adjacency matrices A_l [n_pad, n_pad] with
    A_l[v, u] = (number of type-l edges u->v). Built on device by a scalar
    scatter-add; padded edges (receiver == n_pad) are dropped by
    out-of-bounds scatter semantics.

    This turns sum-aggregation of LINEAR messages into an MXU matmul:
        aggregate_l(W_l h) == A_l @ (h @ W_l)
    — the TPU-native strategy for small-to-medium padded graphs where
    O(N^2 D) matmul beats O(E D) gather/scatter memory traffic. Entries are
    small integer edge multiplicities, exactly representable even in
    bfloat16 — which halves the storage/read traffic when these matrices
    are cached per device-resident batch (runtime/model.py). The 1/c
    normalization is applied per receiver row AFTER the matmul
    (diag(1/c_l) (A_l @ t_l) == aggregate of per-edge-normalized messages).
    """
    mats = []
    for e in graph.edges:
        A = jnp.zeros((graph.n_pad, graph.n_pad), dtype=dtype)
        A = A.at[e.receivers, e.senders].add(e.mask.astype(dtype), mode="drop")
        mats.append(A)
    return mats


def dense_aggregate_linear(transformed, graph, normalize: bool):
    """Sum-aggregate per-type LINEAR messages via dense adjacency matmuls.

    transformed: [L, N, D] per-type transformed node states (so that the
    message along a type-l edge u->v is transformed[l, u]).
    Returns [N, D], numerically the sum-aggregation of gathered messages
    (modulo float reassociation in the matmul reduction; with cached
    bfloat16 adjacencies the matmul runs at the TPU MXU's native bf16
    input precision, which is also what XLA's default f32 matmul uses).

    Uses graph.dense_adj when the runtime pre-built it (hoisted out of the
    layer loop or cached per batch, runtime/model.py); otherwise builds
    per call.
    """
    mats = graph.dense_adj
    if mats is None:
        mats = dense_adjacency(graph)
    small = 1e-7  # SMALL_NUMBER
    out = None
    for l, A in enumerate(mats):
        t = transformed[l].astype(A.dtype)
        part = jnp.dot(A, t, preferred_element_type=jnp.float32)
        if normalize:
            c = graph.typed_incoming_counts[l]
            part = part * (1.0 / (c + small))[:, None]
        out = part if out is None else out + part
    return out


def segment_softmax_blocks(per_type_logits, graph):
    """Softmax over all incoming edges of a node across edge types
    (reference RGAT semantics, gnns/rgat.py:126-130), computed with only
    sorted segment ops and dense [N]-sized combines.

    per_type_logits: list of [E_l, ...] logit arrays (trailing dims = heads).
    Returns a matching list of attention weights; padded edges get 0.
    """
    n_pad = graph.n_pad
    neg = jnp.finfo(per_type_logits[0].dtype).min

    # 1) global per-receiver max across types:
    maxes = []
    for lg, e in zip(per_type_logits, graph.edges):
        masked = jnp.where(e.mask.reshape(e.mask.shape + (1,) * (lg.ndim - 1)) > 0,
                           lg, neg)
        m = jax.ops.segment_max(
            masked, e.receivers, n_pad + 1, indices_are_sorted=True
        )[:n_pad]
        maxes.append(m)
    gmax = maxes[0]
    for m in maxes[1:]:
        gmax = jnp.maximum(gmax, m)
    gmax = jnp.maximum(gmax, neg)  # kill -inf on isolated nodes

    # 2) per-type exp(logit - gmax) and the global denominator:
    exps, denom = [], None
    for lg, e in zip(per_type_logits, graph.edges):
        shift = gather_tgt(gmax, e)
        mask = e.mask.reshape(e.mask.shape + (1,) * (lg.ndim - 1))
        ex = jnp.exp(lg - shift) * mask
        exps.append(ex)
        d = aggregate_sum_block(ex, e, n_pad)
        denom = d if denom is None else denom + d

    # 3) normalize per edge:
    small = 1e-7  # SMALL_NUMBER
    out = []
    for ex, e in zip(exps, graph.edges):
        out.append(ex / (gather_tgt(denom, e) + small))
    return out
