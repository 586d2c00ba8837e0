"""Rank-table Pallas kernels: streaming segmented aggregation on TPU.

The flat edge stream (ops/graph.py FlatEdges) is receiver-sorted with
gap-free receiver ranks (`rcv_rank`). That order makes every segmented
operation *local*: a chunk of `BE` consecutive edges touches at most `BE`
consecutive ranks. These kernels exploit that to replace XLA's
scatter-based segment ops (measured ~54 GB/s sorted / ~100 GB/s unsorted
on v5e) with streaming passes:

* the edge stream (`[E, D]` messages) is block-DMA'd through VMEM at HBM
  stream bandwidth;
* per chunk, a small local one-hot matrix `P[r, e] = (rank[e] == start + r)`
  turns the segmented reduction into ONE MXU matmul `P @ msgs_chunk`
  accumulated into a VMEM-resident rank table `[RPAD, D]` (v5e has 128 MB
  of VMEM; the default 16 MB scoped limit is raised via CompilerParams);
* the transposed product `P^T @ table_slab` is the matching streaming
  *expand* (gather-by-rank), which is exactly the VJP of the segment-sum —
  so backward passes are streaming too, with no scatter anywhere.

On top of the two primitives, `film_ranked_aggregate` fuses the GNN-FiLM
per-edge modulation (reference gnns/gnn_film.py:94-116: messages
`act(gamma_tgt * m_src + beta_tgt)` summed per target) into the same
streaming pass: gamma/beta live in a rank-indexed table expanded on the
fly by `P^T`, eliminating the per-edge `[E, 2D]` feature gather entirely.
The custom VJP recomputes the modulation in a mirrored backward kernel
(rematerialization: cheaper than storing per-edge activations).

Padding contract (no masks needed in-kernel): padded edges carry the dump
rank (== the rank of the `n_pad` dump receiver), so their (clip-gathered,
garbage but finite) messages accumulate into rank-table rows that are
never mapped back to real nodes.

Static-shape contract: the flat stream length is a multiple of 2048
(tasks/base.py compute_batch_spec pads per-type edge blocks to 2048-edge
buckets), which is one grid step here. All kernel shape parameters derive
from (E, D, n_pad) alone, so batches sharing a BatchSpec share one
compilation.

Window compression (`win`): gap-free nondecreasing ranks guarantee every
`BE`-edge sub-block touches at most BE+8 aligned table rows, but on
dense graphs the TRUE span is far smaller (PPI: ~28 edges per (receiver,
type) group -> a 256-edge sub-block spans ~14 ranks). The host measures
the max span per fold at padding time (ops/graph.py rank_window) and the
kernels take it as the static one-hot height `win`, shrinking the
dominant [win, BE] MXU one-hots (and the RMW'd table slabs) by up to
~8x. win=0 falls back to the data-independent bound BE+8.
"""

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEP = 2048  # edges per grid step; divides every bucketed flat stream

# Dot-block group caps (see _dot_group): A/B-measured on v5e at PPI bench
# shapes (tools/film_fwd_ab.py, round 5) — the fwd/mask kernels win ~10%
# at group 4; the dgb kernel's larger slabs gain less and regress past 2.
# SINGLE-dot kernels (plain segsum / expand / act-agg / expand-add-act)
# are a measured DEAD END: grouping them is steady-state NEUTRAL-to-WORSE
# (segsum 3.26 -> 3.53 ms at group 4, expand 4.44 -> 4.60) and the
# group-4 accumulate-only lowering took 245 s of Mosaic compile — their
# per-sub critical path is already minimal, so there is no issue latency
# to amortize. Only the multi-dot FiLM-family kernels group.
FWD_DOT_GROUP_CAP = 4
DGB_DOT_GROUP_CAP = 2
SINGLE_DOT_GROUP_CAP = 1

_VMEM_BUDGET = 96 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024

# Interpret-mode escape hatch so the kernel logic is testable on CPU.
_FORCE_INTERPRET = False


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _ceil_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def rank_table_rows(n_pad: int, block_edges: int) -> int:
    """Static COARSE rank-table height: receiver ranks are gap-free over
    distinct receivers (<= n_pad real + 1 dump), plus RL slack for the
    aligned local windows."""
    return _ceil_mult(n_pad + 1, 8) + block_edges + 8


def fine_rank_table_rows(n_pad: int, num_edge_types: int, num_edges: int,
                         block_edges: int) -> int:
    """Static FINE rank-table height: (receiver, type) group ranks are
    gap-free over distinct groups (<= min(L * (n_pad + 1), E))."""
    groups = min(num_edge_types * (n_pad + 1), num_edges)
    return _ceil_mult(groups, 8) + block_edges + 8


def src_rank_table_rows(t_rows: int, num_edges: int,
                        block_edges: int = 256) -> int:
    """Static SRC rank-table height for the source-sorted stream: (type,
    sender) group ranks are gap-free over distinct groups (<= min(t_rows
    + 1 dump, E)), plus aligned-window slack. `t_rows` is the type-stacked
    node-table height L * n_pad."""
    return _ceil_mult(min(t_rows + 1, num_edges), 8) + block_edges + 8


def ranked_supported(num_edges: int, dim: int, table_rows: int,
                     block_edges: int = 256, extra_table_cols: int = 0) -> bool:
    """Whether the streaming kernels apply to this (E, D, table) shape."""
    if num_edges % STEP != 0 or num_edges < STEP:
        return False
    rpad = table_rows
    lane_d = _ceil_mult(dim, 128)
    lane_x = _ceil_mult(max(extra_table_cols, 1), 128)
    vmem = rpad * lane_d * 4 + rpad * lane_x * 4 + 4 * STEP * lane_d * 4
    return vmem <= _VMEM_BUDGET


def film_column_splits(num_edges: int, dim: int, table_rows: int) -> int:
    """Smallest column-split count in {1, 2, 4} whose per-split tables fit
    VMEM (the FiLM modulation is elementwise in d, so the fused kernels
    decompose perfectly over column slices). 0 = not supported."""
    for halves in (1, 2, 4):
        if dim % halves == 0 and film_ranked_supported(
            num_edges, dim // halves, table_rows
        ):
            return halves
    return 0


def film_ranked_supported(num_edges: int, dim: int, table_rows: int) -> bool:
    """Eligibility of the fused FiLM kernels: models the larger of the
    forward pass (bf16 gamma|beta table + f32 out table) and the backward
    pass (bf16 gamma|beta|g table + f32 d_gamma|d_beta table) VMEM peaks.
    Streams are bf16 [STEP, D] blocks double-buffered by the Pallas
    pipeline (2 buffers each way)."""
    if num_edges % STEP != 0 or num_edges < STEP:
        return False
    lane_d = _ceil_mult(dim, 128)
    lane_2d = _ceil_mult(2 * dim, 128)
    lane_3d = _ceil_mult(3 * dim, 128)
    stream = 2 * STEP * lane_d * 2  # one bf16 stream, double-buffered
    fwd = table_rows * (lane_2d * 2 + lane_d * 4) + stream
    bwd = table_rows * (lane_3d * 2 + lane_2d * 4) + 2 * stream
    return max(fwd, bwd) <= _VMEM_BUDGET


def _chunk_inputs(rcv_rank: jnp.ndarray, block_edges: int):
    """Per-chunk rank blocks and aligned window starts, derived in-jit.

    rank_blocks: [E / BE, BE] int32; starts: [E / BE] int32 (multiple of 8).
    All ranks in chunk c lie in [starts[c], starts[c] + BE + 8) because
    ranks are nondecreasing and gap-free.
    """
    e = rcv_rank.shape[0]
    blocks = rcv_rank.reshape(e // block_edges, block_edges)
    starts = blocks[:, 0] & ~7
    return blocks, starts


def _local_onehot(ranks_row, start, rl: int, be: int):
    """P[r, e] = 1 if ranks_row[e] == start + r, as bf16 for the MXU."""
    lr = ranks_row - start  # [BE]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rl, be), 0)
    return (lr[None, :] == iota_r).astype(jnp.bfloat16)


def _local_onehot_t(ranks_row, start, rl: int, be: int):
    """Transposed orientation P_t[e, r], built directly (a dot with P_t is
    cheaper than dot_general over P's dim 0, which relayouts the one-hot)."""
    lr = ranks_row - start  # [BE]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (be, rl), 1)
    return (lr[:, None] == iota_r).astype(jnp.bfloat16)


def _dot_group(win: int, be: int, cap: int) -> int:
    """Dot-block group size: merge `group` consecutive BE-edge rank rows
    into ONE expand dot + ONE accumulate dot + ONE table RMW over the
    union window group*win (a static bound: consecutive aligned starts
    advance by < win). Fewer, larger MXU ops amortize the per-dot issue
    latency the round-4 roofline measured as the fwd/dgb kernels' ~2x
    overhead; the table slack (be + 8 rows, rank_table_rows) bounds the
    legal union window. Bit-exact vs group=1: each output row still
    accumulates its edges in stream order."""
    if not win:
        return 1
    g = 1
    while g < cap and 2 * g * win <= be + 8:
        g *= 2
    return g


def _grouped_onehot_t(rank_ref, row0: int, group: int, start, rl: int,
                      be: int):
    """[group*BE, group*rl] edge-major one-hot over a dot-block: built via
    a 3-D compare whose leading-dims reshape is layout-free (lanes stay
    the window dim)."""
    if group == 1:
        return _local_onehot_t(rank_ref[row0, :], start, rl, be)
    lr = rank_ref[row0:row0 + group, :] - start  # [group, BE]
    iota_t = jax.lax.broadcasted_iota(
        jnp.int32, (group, be, group * rl), 2)
    return (lr[:, :, None] == iota_t).reshape(
        group * be, group * rl).astype(jnp.bfloat16)


def _grouped_onehot(rank_ref, row0: int, group: int, start, rl: int,
                    be: int):
    """[group*rl, group*BE] window-major one-hot: ranks land on the LANE
    axis via a row concat (cheap int32 lane copies), then one 2-D
    compare."""
    if group == 1:
        return _local_onehot(rank_ref[row0, :], start, rl, be)
    lr_row = jnp.concatenate(
        [rank_ref[row0 + r:row0 + r + 1, :] for r in range(group)],
        axis=1,
    ) - start  # [1, group*BE]
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (group * rl, group * be), 0)
    return (lr_row == iota_r).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _segsum_kernel(start_ref, rank_ref, msg_ref, out_ref, *, be, rl, sub,
                   group=1):
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        contrib = jnp.dot(
            oh, msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        cur = out_ref[pl.ds(start, rlg), :]
        out_ref[pl.ds(start, rlg), :] = cur + contrib


def _expand_kernel(start_ref, rank_ref, table_ref, out_ref, *, be, rl, sub,
                   group=1):
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl
    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        slab = table_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        out_ref[pl.ds(row0 * be, bd), :] = jnp.dot(
            oh_t, slab, preferred_element_type=jnp.float32,
        )


def _head_replicate_matrix(k: int, d: int):
    """R[q, j] = 1 iff lane j belongs to head q (head-major D layout):
    w_rep = w @ R replicates per-head scalars over their d/k lanes, and
    x @ R.T sums lanes per head — both tiny MXU ops, avoiding unaligned
    lane slices (d/k is rarely a multiple of 128)."""
    dh = d // k
    head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (k, d), 1) // dh
    head_q = jax.lax.broadcasted_iota(jnp.int32, (k, d), 0)
    return (head_of_lane == head_q).astype(jnp.float32)


def _wseg_kernel(start_ref, rank_ref, msg_ref, w_ref, out_ref,
                 *, be, rl, sub, d, k):
    """Weighted segment-sum: out[r] += sum_e w_rep[e] * msgs[e] where the
    per-head weights w [BE, K] broadcast over each head's d/K lanes. The
    head replicate happens in VMEM ([BE, K] @ [K, D] on the MXU), so the
    weighted [E, D] stream is never materialized in HBM."""
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        w_rep = jnp.dot(w_ref[pl.ds(s * be, be), :], rep,
                        preferred_element_type=jnp.float32)
        wm = (m * w_rep).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, wm, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rl), :]
        out_ref[pl.ds(start, rl), :] = cur + contrib


def _wseg_bwd_kernel(start_ref, rank_ref, msg_ref, w_ref, g_ref,
                     dmsg_ref, dw_ref, *, be, rl, sub, d, k):
    """Streaming VJP of the weighted segment-sum: per-edge cotangents are
    expanded from the (bf16) gradient table; no RMW accumulation — both
    outputs are edge streams, so sub-blocks are independent."""
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        g_e = jnp.dot(
            oh_t, g_ref[pl.ds(start, rl), :],
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        w_rep = jnp.dot(w_ref[pl.ds(s * be, be), :], rep,
                        preferred_element_type=jnp.float32)
        dmsg_ref[pl.ds(s * be, be), :] = (g_e * w_rep).astype(dmsg_ref.dtype)
        dw_ref[pl.ds(s * be, be), :] = jax.lax.dot_general(
            m * g_e, rep, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _film_fwd_kernel(start_ref, rank_ref, msg_ref, gb_ref, out_ref,
                     *, be, rl, sub, d, act, group=1):
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        gb_slab = gb_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        gb_e = jnp.dot(
            oh_t, gb_slab, preferred_element_type=jnp.float32,
        )  # [BD, 2D]
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        z = gb_e[:, :d] * m + gb_e[:, d:]
        a = act(z).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rlg), :]
        out_ref[pl.ds(start, rlg), :] = cur + contrib


_MASK_GROUP = 16  # mask bits packed per f32/int32 lane (exact in f32)


def _mask_lanes(d: int) -> int:
    """Packed-mask lane count: ceil(d/16) rounded up to 32 lanes. Very
    narrow arrays tempt XLA into a transposed {0,1} layout for the
    [E, lanes] gather plus layout-conversion copies on the Pallas
    boundary (measured ~3 ms/layer of pure copies at PPI scale at 20
    lanes), while a full 128-lane dim grows the gather source past XLA's
    VMEM-staging budget (measured 1.6x fewer rows/s)."""
    return _ceil_mult(-(-d // _MASK_GROUP), 32)


def _mask_pack_matrix(d: int):
    """PCK[j, g] = 2^(j % 16) if j // 16 == g else 0: dot(mask01, PCK)
    packs 16 mask bits per lane as exact small-integer f32 values."""
    lanes = _mask_lanes(d)
    j = jax.lax.broadcasted_iota(jnp.int32, (d, lanes), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (d, lanes), 1)
    return jnp.where(j // _MASK_GROUP == g,
                     jnp.exp2((j % _MASK_GROUP).astype(jnp.float32)), 0.0)


def _mask_unpack(packed_f, d: int):
    """Inverse of the pack: [BE, ceil(d/16)] exact-int f32 -> [BE, d] 0/1
    f32 via replicate + float bit extraction (floor arithmetic only — no
    integer lane ops, which keeps the Mosaic lowering simple)."""
    lanes = packed_f.shape[1]
    g = jax.lax.broadcasted_iota(jnp.int32, (lanes, d), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (lanes, d), 1)
    rep = jnp.where(j // _MASK_GROUP == g, 1.0, 0.0)
    v = jnp.dot(packed_f, rep, preferred_element_type=jnp.float32)
    shift = jnp.exp2(-(jax.lax.broadcasted_iota(
        jnp.int32, (packed_f.shape[0], d), 1) % _MASK_GROUP).astype(
            jnp.float32))
    t = jnp.floor(v * shift)
    return t - 2.0 * jnp.floor(t * 0.5)


def _film_fwd_mask_kernel(start_ref, rank_ref, msg_ref, gb_ref, out_ref,
                          mask_ref, *, be, rl, sub, d, act, group=1):
    """Forward FiLM kernel that additionally emits the packed activation
    mask (z > 0) per edge — the backward dt path reconstructs act'(z)
    from it in SOURCE-sorted order without permuting any [E, D] stream
    (relu / leaky_relu: act' is a function of the mask alone)."""
    c = pl.program_id(0)
    pck = _mask_pack_matrix(d)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        gb_slab = gb_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        gb_e = jnp.dot(
            oh_t, gb_slab, preferred_element_type=jnp.float32,
        )  # [BD, 2D]
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        z = gb_e[:, :d] * m + gb_e[:, d:]
        mask01 = (z > 0).astype(jnp.float32)
        mask_ref[pl.ds(row0 * be, bd), :] = jnp.dot(
            mask01, pck, preferred_element_type=jnp.float32,
        )
        a = act(z).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rlg), :]
        out_ref[pl.ds(start, rlg), :] = cur + contrib


def _film_bwd_dgb_kernel(start_ref, rank_ref, msg_ref, gbg_ref,
                         dgb_ref, *, be, rl, sub, d, dact, group=1):
    """d_gamma|d_beta half of the FiLM backward (no d_msgs stream — the
    masked src-order path computes dt without it)."""
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        dgb_ref[:] = jnp.zeros_like(dgb_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        slab = gbg_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        e_vals = jnp.dot(
            oh_t, slab, preferred_element_type=jnp.float32,
        )  # [BD, 3D] = gamma | beta | g
        gamma, beta, g = e_vals[:, :d], e_vals[:, d:2 * d], e_vals[:, 2 * d:]
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        z = gamma * m + beta
        dz = dact(z) * g
        # Two accumulate dots instead of concat + one: the [BD, 2D] bf16
        # concat is a pure VMEM copy (A/B-measured ~5% of the kernel).
        cg = jnp.dot(oh, (m * dz).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        cb = jnp.dot(oh, dz.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        cur = dgb_ref[pl.ds(start, rlg), :]
        dgb_ref[pl.ds(start, rlg), :d] = cur[:, :d] + cg
        dgb_ref[pl.ds(start, rlg), d:] = cur[:, d:] + cb


def _masked_segsum_kernel(start_ref, rank_ref, mask_ref, c_ref, out_ref,
                          *, be, rl, sub, d, leak):
    """dt_table[r] = sum_{e: rank(e)==r} factor(mask_e) * C_e over a
    SOURCE-sorted stream, where factor = mask (relu) or leak + (1-leak) *
    mask (leaky_relu) and C_e = (gamma * g)[fine_rank(e)] was gathered by
    XLA from a small rank table (write-bound — no tile-amplified [E, D]
    permute anywhere on this path)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        mask = _mask_unpack(mask_ref[pl.ds(s * be, be), :], d)
        factor = mask if leak == 0.0 else leak + (1.0 - leak) * mask
        dmsg = (c_ref[pl.ds(s * be, be), :].astype(jnp.float32)
                * factor).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, dmsg, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rl), :]
        out_ref[pl.ds(start, rl), :] = cur + contrib


def _film_src_bwd_kernel(start_ref, rank_ref, gcb_ref, t_ref, dt_ref,
                         *, be, rl, sub, d, dact, group=1):
    """dt half of the FiLM backward over the SOURCE-sorted stream.

    Recomputes z = gamma * m + beta in source order — m expanded in-VMEM
    from the src-rank message table (windowed one-hot MXU expand, exactly
    the bf16 rows the forward gathered, so z is bitwise the forward's) —
    and accumulates dact(z) * C into the src rank table, which IS dt in
    rank space. The gcb stream carries gamma | beta | C (= gamma * g)
    gathered by XLA from a small fine-rank table; nothing [E, D]-shaped is
    ever permuted or transported between edge orders."""
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        t_slab = t_ref[pl.ds(start, rlg), :]  # bf16 [RLG, D]
        m = jnp.dot(oh_t, t_slab, preferred_element_type=jnp.float32)
        gcb = gcb_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        z = gcb[:, :d] * m + gcb[:, d:2 * d]
        dmsg = (dact(z) * gcb[:, 2 * d:]).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, dmsg, preferred_element_type=jnp.float32)
        cur = dt_ref[pl.ds(start, rlg), :]
        dt_ref[pl.ds(start, rlg), :] = cur + contrib


def _film_bwd_kernel(start_ref, rank_ref, msg_ref, gbg_ref,
                     dmsg_ref, dgb_ref, *, be, rl, sub, d, dact):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dgb_ref[:] = jnp.zeros_like(dgb_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        slab = gbg_ref[pl.ds(start, rl), :].astype(jnp.bfloat16)
        e_vals = jnp.dot(
            oh_t, slab, preferred_element_type=jnp.float32,
        )  # [BE, 3D] = gamma | beta | g
        gamma, beta, g = e_vals[:, :d], e_vals[:, d:2 * d], e_vals[:, 2 * d:]
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        z = gamma * m + beta
        dz = dact(z) * g  # dL/dz per edge
        # bf16 cotangent stream: the consumers (permute-gather + ranked
        # segment-sum) cast to bf16 for the MXU anyway, so emitting bf16
        # here halves the dominant [E, D] backward HBM traffic at zero
        # additional quantization.
        dmsg_ref[pl.ds(s * be, be), :] = (gamma * dz).astype(
            dmsg_ref.dtype
        )
        dgamma_e = (m * dz).astype(jnp.bfloat16)
        dbeta_e = dz.astype(jnp.bfloat16)
        contrib = jnp.dot(
            oh, jnp.concatenate([dgamma_e, dbeta_e], axis=1),
            preferred_element_type=jnp.float32,
        )
        cur = dgb_ref[pl.ds(start, rl), :]
        dgb_ref[pl.ds(start, rl), :] = cur + contrib


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _common_specs(num_chunks_per_step: int, be: int):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
        pl.BlockSpec((num_chunks_per_step, be), lambda c: (c, 0),
                     memory_space=pltpu.VMEM),  # rank blocks
    ]


def _params(table_bytes: int = None):
    """Compiler params with a vmem_limit sized to the kernel's RESIDENT
    tables (+16 MB stream/one-hot headroom) instead of a blanket maximum:
    over-reserving VMEM here starves XLA's memory-space assignment, which
    otherwise pins the small gather source tables of the surrounding ops
    into VMEM (S(1)) — measured 4.5x on the [E, D] message gathers."""
    if table_bytes is None:
        limit = _VMEM_LIMIT
    else:
        limit = min(_VMEM_LIMIT, int(table_bytes) + (16 << 20))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


@functools.partial(jax.jit,
                   static_argnames=("table_rows", "block_edges", "win"))
def _segsum_table_impl(msgs, rcv_rank, *, table_rows, block_edges, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rpad = table_rows
    blocks, starts = _chunk_inputs(rcv_rank, be)
    kern = functools.partial(_segsum_kernel, be=be, rl=rl, sub=sub,
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, dim), jnp.float32),
        compiler_params=_params(rpad * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, msgs)


@functools.partial(jax.jit, static_argnames=("block_edges", "win"))
def _expand_impl(table, rcv_rank, *, block_edges, win=0):
    e = rcv_rank.shape[0]
    dim = table.shape[1]
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(rcv_rank, be)
    kern = functools.partial(_expand_kernel, be=be, rl=rl, sub=sub,
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
        ],
        out_specs=pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, dim), jnp.float32),
        compiler_params=_params(
            table.shape[0] * _ceil_mult(dim, 128) * table.dtype.itemsize),
        interpret=_interpret(),
    )(starts, blocks, table)


# ---- public segment-sum / expand with streaming VJPs ----------------------


def ranked_segment_sum_table(msgs, ranks, table_rows: int,
                             block_edges: int = 256, win: int = 0):
    """Sum messages per rank: [E, D] -> [table_rows, D] (f32).

    `ranks` must be nondecreasing gap-free group ids over the stream
    (coarse receiver ranks or fine (receiver, type) ranks). Rank r of the
    table holds the sum over edges with rank == r. VJP: d_msgs[e] =
    d_table[rank[e]] — the streaming expand kernel. `win` is the static
    per-sub-block rank-window bound (host-measured; 0 = BE+8)."""
    return _segsum_table_impl(msgs, ranks, table_rows=table_rows,
                              block_edges=block_edges, win=win)


def _segsum_fwd(msgs, ranks, table_rows, block_edges, win):
    out = _segsum_table_impl(msgs, ranks, table_rows=table_rows,
                             block_edges=block_edges, win=win)
    return out, (ranks, jnp.zeros((0,), msgs.dtype))


def _segsum_bwd(table_rows, block_edges, win, res, g):
    ranks, proto = res
    d_msgs = _expand_impl(g, ranks, block_edges=block_edges, win=win)
    return (d_msgs.astype(proto.dtype), None)


ranked_segment_sum_table = jax.custom_vjp(
    ranked_segment_sum_table, nondiff_argnums=(2, 3, 4)
)
ranked_segment_sum_table.defvjp(_segsum_fwd, _segsum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ranked_expand_table(table, ranks, table_rows: int,
                        block_edges: int = 256, win: int = 0):
    """Per-edge value of a rank-indexed table: out[e] = table[rank[e]].

    The streaming inverse of ranked_segment_sum_table (and its VJP)."""
    return _expand_impl(table, ranks, block_edges=block_edges, win=win)


def _expand_fwd(table, ranks, table_rows, block_edges, win):
    out = _expand_impl(table, ranks, block_edges=block_edges, win=win)
    return out, (ranks, jnp.zeros((0,), table.dtype))


def _expand_bwd(table_rows, block_edges, win, res, g):
    ranks, proto = res
    d_table = _segsum_table_impl(g, ranks, table_rows=table_rows,
                                 block_edges=block_edges, win=win)
    return (d_table.astype(proto.dtype), None)


ranked_expand_table.defvjp(_expand_fwd, _expand_bwd)


# ---- fused expand-add-activate (GNN-Edge-MLP hidden assembly) --------------


def _expand_add_act_kernel(start_ref, rank_ref, m_ref, beta_ref, x_ref,
                           *, be, rl, sub, act, group=1):
    """x = act(m + beta[rank]) in one streaming pass: the rank-indexed
    beta table is expanded in-VMEM by the windowed one-hot, so neither
    the expanded [E, D] beta stream nor an activation residual ever
    exists in HBM (the VJP recovers act' from x itself)."""
    bd, rlg = group * be, group * rl
    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[pl.program_id(0) * sub + row0], 8)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        slab = beta_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        beta_e = jnp.dot(oh_t, slab, preferred_element_type=jnp.float32)
        m = m_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        x_ref[pl.ds(row0 * be, bd), :] = act(m + beta_e).astype(x_ref.dtype)


def _expand_add_act_bwd_kernel(start_ref, rank_ref, x_ref, dx_ref,
                               dm_ref, dbeta_ref, *, be, rl, sub, dact_out,
                               group=1):
    """VJP of expand-add-act for activations whose derivative is a
    function of the OUTPUT (dact_out(x)): dm = dact_out(x) * dx per edge,
    dbeta = its windowed rank segment-sum."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    bd, rlg = group * be, group * rl
    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        x = x_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        dx = dx_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        dz = (dact_out(x) * dx).astype(jnp.bfloat16)
        dm_ref[pl.ds(row0 * be, bd), :] = dz
        contrib = jnp.dot(oh, dz, preferred_element_type=jnp.float32)
        cur = dbeta_ref[pl.ds(start, rlg), :]
        dbeta_ref[pl.ds(start, rlg), :] = cur + contrib


# Activations invertible enough that act'(z) is a function of act(z):
# elu: act' = 1 (x > 0) else x + 1;  relu: x > 0;  leaky is NOT (x<0 maps
# two z values per x... it is: z = x/0.2, act' = 0.2) — include it.
_ACTS_FROM_OUT = {
    "elu": lambda x: jnp.where(x > 0, 1.0, x + 1.0),
    "relu": lambda x: (x > 0).astype(jnp.float32),
    "leaky_relu": lambda x: jnp.where(x > 0, 1.0, 0.2),
    "linear": lambda x: jnp.ones_like(x),
}


def expand_add_act_supported(act: str) -> bool:
    return act.lower() in _ACTS_FROM_OUT and act.lower() in _ACTS


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _expand_add_act_impl(m, beta_table, ranks, *, block_edges, act, win=0):
    e, dim = m.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_expand_add_act_kernel, be=be, rl=rl, sub=sub,
                             act=_ACTS[act][0],
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta table resident
        ],
        out_specs=pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
        compiler_params=_params(
            beta_table.shape[0] * _ceil_mult(dim, 128)
            * beta_table.dtype.itemsize),
        interpret=_interpret(),
    )(starts, blocks, m, beta_table)


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "act", "win"))
def _expand_add_act_bwd_impl(x, dx, ranks, *, table_rows, block_edges, act,
                             win=0):
    e, dim = x.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_expand_add_act_bwd_kernel, be=be, rl=rl,
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP),
                             sub=sub, dact_out=_ACTS_FROM_OUT[act])
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        ),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, x, dx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def expand_add_act(m, beta_table, ranks, act: str, block_edges: int = 256,
                   win: int = 0):
    """x[e] = act(m[e] + beta_table[rank[e]]) with a fused streaming VJP:
    forward expands beta in-VMEM; backward recovers act' from x (the
    saved OUTPUT — no activation residuals), emitting dm (bf16) and the
    windowed dbeta rank table. `act` must be in _ACTS_FROM_OUT."""
    return _expand_add_act_impl(m, beta_table, ranks,
                                block_edges=block_edges, act=act, win=win)


def _eaa_fwd(m, beta_table, ranks, act, block_edges, win):
    x = _expand_add_act_impl(m, beta_table, ranks, block_edges=block_edges,
                             act=act, win=win)
    res = (x, ranks, beta_table.shape[0],
           jnp.zeros((0,), m.dtype), jnp.zeros((0,), beta_table.dtype))
    return x, res


def _eaa_bwd(act, block_edges, win, res, g):
    x, ranks, rpad, m_proto, b_proto = res
    dm, dbeta = _expand_add_act_bwd_impl(
        x, g.astype(jnp.bfloat16), ranks, table_rows=rpad,
        block_edges=block_edges, act=act, win=win,
    )
    return (dm.astype(m_proto.dtype), dbeta.astype(b_proto.dtype), None)


expand_add_act.defvjp(_eaa_fwd, _eaa_bwd)


# ---- fused activate-aggregate (act on messages + ranked segment-sum) -------


def _act_agg_kernel(start_ref, rank_ref, msg_ref, out_ref, *, be, rl, sub,
                    act, group=1):
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        a = act(m).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rlg), :]
        out_ref[pl.ds(start, rlg), :] = cur + contrib


def _act_agg_bwd_kernel(start_ref, rank_ref, msg_ref, g_ref, dmsg_ref,
                        *, be, rl, sub, dact, group=1):
    """dmsg-only backward: recomputes act'(msgs) and expands the table
    cotangent in-VMEM — no d_gamma/d_beta side products (compare
    _film_bwd_kernel, which pays two extra one-hot matmuls for them)."""
    c = pl.program_id(0)
    bd, rlg = group * be, group * rl
    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        g_e = jnp.dot(
            oh_t, g_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        dmsg_ref[pl.ds(row0 * be, bd), :] = (dact(m) * g_e).astype(
            dmsg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "act", "win"))
def _act_agg_impl(msgs, ranks, *, table_rows, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_act_agg_kernel, be=be, rl=rl, sub=sub,
                             act=_ACTS[act][0],
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, msgs)


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _act_agg_bwd_impl(msgs, g16, ranks, *, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_act_agg_bwd_kernel, be=be, rl=rl, sub=sub,
                             dact=_ACTS[act][1],
                             group=_dot_group(win, be, SINGLE_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf16 g table resident
        ],
        out_specs=pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
        compiler_params=_params(
            g16.shape[0] * _ceil_mult(dim, 128) * 2),
        interpret=_interpret(),
    )(starts, blocks, msgs, g16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def act_ranked_aggregate(msgs, ranks, table_rows: int, act: str = "relu",
                         block_edges: int = 256, win: int = 0):
    """table[r] = sum_{e: rank(e)==r} act(msgs[e]): the fused FiLM
    aggregate without the modulation tables (GNN-Edge-MLP's outer
    activation on messages). Backward is a single dmsg-only streaming
    kernel (recompute act', expand the table cotangent in-VMEM)."""
    return _act_agg_impl(msgs, ranks, table_rows=table_rows,
                         block_edges=block_edges, act=act, win=win)


def _aagg_fwd(msgs, ranks, table_rows, act, block_edges, win):
    out = _act_agg_impl(msgs, ranks, table_rows=table_rows,
                        block_edges=block_edges, act=act, win=win)
    return out, (msgs, ranks)


def _aagg_bwd(table_rows, act, block_edges, win, res, g):
    msgs, ranks = res
    dmsg = _act_agg_bwd_impl(msgs, g.astype(jnp.bfloat16), ranks,
                             block_edges=block_edges, act=act, win=win)
    return (dmsg.astype(msgs.dtype), None)


act_ranked_aggregate.defvjp(_aagg_fwd, _aagg_bwd)


# ---- fused per-head weighted segment-sum (RGAT aggregation) ---------------


@functools.partial(jax.jit, static_argnames=("table_rows", "num_heads",
                                             "block_edges", "win"))
def _wseg_impl(msgs, w, ranks, *, table_rows, num_heads, block_edges, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_wseg_kernel, be=be, rl=rl, sub=sub, d=dim,
                             k=num_heads)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, num_heads), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, msgs, w)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_edges", "win"))
def _wseg_bwd_impl(msgs, w, g16, ranks, *, num_heads, block_edges, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_wseg_bwd_kernel, be=be, rl=rl, sub=sub, d=dim,
                             k=num_heads)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, num_heads), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf16 g table resident
        ],
        out_specs=(
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, num_heads), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((e, num_heads), jnp.float32),
        ),
        compiler_params=_params(
            g16.shape[0] * _ceil_mult(dim, 128) * 2),
        interpret=_interpret(),
    )(starts, blocks, msgs, w, g16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ranked_weighted_segment_sum(msgs, w, ranks, table_rows: int,
                                num_heads: int, block_edges: int = 256,
                                win: int = 0):
    """Per-head weighted segment-sum: table[r] = sum_{e: rank(e)==r}
    rep(w[e]) * msgs[e], with w [E, K] replicated over each head's D/K
    lanes (head-major D layout, matching t.reshape(..., K, D/K)).

    Fuses RGAT's attention-weight multiply into the aggregation so the
    weighted [E, D] stream never round-trips HBM. VJP is a mirrored
    streaming kernel: d_msgs[e] = rep(w[e]) * g[rank_e] (bf16) and
    d_w[e, k] = sum_d msgs[e, kd] * g[rank_e, kd]."""
    return _wseg_impl(msgs, w, ranks, table_rows=table_rows,
                      num_heads=num_heads, block_edges=block_edges, win=win)


def _wseg_vjp_fwd(msgs, w, ranks, table_rows, num_heads, block_edges, win):
    out = _wseg_impl(msgs, w, ranks, table_rows=table_rows,
                     num_heads=num_heads, block_edges=block_edges, win=win)
    return out, (msgs, w, ranks)


def _wseg_vjp_bwd(table_rows, num_heads, block_edges, win, res, g):
    msgs, w, ranks = res
    d_msgs, d_w = _wseg_bwd_impl(msgs, w, g.astype(jnp.bfloat16), ranks,
                                 num_heads=num_heads, block_edges=block_edges,
                                 win=win)
    return (d_msgs.astype(msgs.dtype), d_w.astype(w.dtype), None)


ranked_weighted_segment_sum.defvjp(_wseg_vjp_fwd, _wseg_vjp_bwd)


# ---- typed-dense activate-aggregate (GNN-Edge-MLP hidden layers) -----------
#
# Per-edge TYPE-DEPENDENT dense stages (m_e = act(x_e @ W_{type_e}))
# cannot ride the node-table trick (x_e mixes src and tgt state through a
# nonlinearity). Materializing the one-hot form x @ [W_0|...|W_L] in HBM
# costs E x L*D traffic; these kernels instead compute the L type-masked
# matmuls per 256-edge sub-block in VMEM (weights resident — L*D*D bf16),
# activate, and aggregate into the coarse receiver rank table in one
# streaming pass. Backward mirrors it, accumulating dW [L, Dh, D] in a
# VMEM scratch output and emitting the dx stream.


def _typed_dense_agg_kernel(start_ref, rank_ref, type_ref, x_ref, w_ref,
                            out_ref, *, be, rl, sub, n_types, act):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        x = x_ref[pl.ds(s * be, be), :].astype(jnp.bfloat16)  # [BE, Dh]
        et = type_ref[s, :]  # [BE]
        y = None
        for l in range(n_types):
            mask_l = (et == l).astype(jnp.float32)[:, None]
            y_l = jnp.dot(x, w_ref[l], preferred_element_type=jnp.float32)
            y = y_l * mask_l if y is None else y + y_l * mask_l
        a = act(y).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rl), :]
        out_ref[pl.ds(start, rl), :] = cur + contrib


def _typed_dense_agg_bwd_kernel(start_ref, rank_ref, type_ref, x_ref,
                                w_ref, g_ref, dx_ref, dw_ref,
                                *, be, rl, sub, n_types, act, dact):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        g_e = jnp.dot(
            oh_t, g_ref[pl.ds(start, rl), :],
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        x = x_ref[pl.ds(s * be, be), :].astype(jnp.bfloat16)
        et = type_ref[s, :]
        dx = None
        for l in range(n_types):
            mask_l = (et == l).astype(jnp.float32)[:, None]
            y_l = jnp.dot(x, w_ref[l], preferred_element_type=jnp.float32)
            dz_l = (dact(y_l) * g_e * mask_l).astype(jnp.bfloat16)
            dx_l = jax.lax.dot_general(
                dz_l, w_ref[l], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BE, Dh]
            dx = dx_l if dx is None else dx + dx_l
            xm = (x.astype(jnp.float32) * mask_l).astype(jnp.bfloat16)
            dw_l = jax.lax.dot_general(
                xm, dz_l, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Dh, D]
            dw_ref[l] = dw_ref[l] + dw_l
        dx_ref[pl.ds(s * be, be), :] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "act", "win"))
def _typed_dense_agg_impl(x, w, types, ranks, *, table_rows, block_edges,
                          act, win=0):
    e, dh = x.shape
    n_types, _, dim = w.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    tblocks = types.reshape(e // be, be)
    kern = functools.partial(_typed_dense_agg_kernel, be=be, rl=rl, sub=sub,
                             n_types=n_types, act=_ACTS[act][0])
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((sub, be), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),  # type blocks
            pl.BlockSpec((STEP, dh), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4
                                + n_types * dh * dim * 2),
        interpret=_interpret(),
    )(starts, blocks, tblocks, x, w)


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _typed_dense_agg_bwd_impl(x, w, g16, types, ranks, *, block_edges,
                              act, win=0):
    e, dh = x.shape
    n_types, _, dim = w.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    tblocks = types.reshape(e // be, be)
    kern = functools.partial(_typed_dense_agg_bwd_kernel, be=be, rl=rl,
                             sub=sub, n_types=n_types, act=_ACTS[act][0],
                             dact=_ACTS[act][1])
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((sub, be), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, dh), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf16 g table resident
        ],
        out_specs=(
            pl.BlockSpec((STEP, dh), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dW accumulator
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, dh), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_types, dh, dim), jnp.float32),
        ),
        compiler_params=_params(
            g16.shape[0] * _ceil_mult(dim, 128) * 2
            + n_types * dh * dim * 6),
        interpret=_interpret(),
    )(starts, blocks, tblocks, x, w, g16)


def typed_dense_agg_supported(num_edges: int, d_hidden: int, dim: int,
                              n_types: int, act: str) -> bool:
    """Eligibility of the fused typed-dense aggregate: per-sub-block L
    masked matmuls are unrolled in-kernel, so keep L small (the scan path
    serves VarMisuse-scale type counts)."""
    return (act in _ACTS and n_types <= 8
            and num_edges % STEP == 0 and num_edges >= STEP
            and d_hidden % 8 == 0 and dim % 8 == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def typed_dense_aggregate(x, w, types, ranks, table_rows: int,
                          act: str = "relu", block_edges: int = 256,
                          win: int = 0):
    """Fused per-edge typed dense + activation + ranked aggregation:

        table[r] = sum_{e: rank(e)==r} act(x_e @ w[type_e])

    for a receiver-sorted stream with gap-free coarse ranks. The [E, D]
    post-dense stream never exists in HBM; backward recomputes it and
    accumulates dW in VMEM."""
    return _typed_dense_agg_impl(x, w.astype(jnp.bfloat16), types, ranks,
                                 table_rows=table_rows,
                                 block_edges=block_edges, act=act, win=win)


def _tda_fwd(x, w, types, ranks, table_rows, act, block_edges, win):
    w16 = w.astype(jnp.bfloat16)
    out = _typed_dense_agg_impl(x, w16, types, ranks,
                                table_rows=table_rows,
                                block_edges=block_edges, act=act, win=win)
    return out, (x, w16, types, ranks, jnp.zeros((0,), w.dtype))


def _tda_bwd(table_rows, act, block_edges, win, res, g):
    x, w16, types, ranks, w_proto = res
    dx, dw = _typed_dense_agg_bwd_impl(
        x, w16, g.astype(jnp.bfloat16), types, ranks,
        block_edges=block_edges, act=act, win=win,
    )
    return (dx.astype(x.dtype), dw.astype(w_proto.dtype), None, None)


typed_dense_aggregate.defvjp(_tda_fwd, _tda_bwd)


# ---- head-major (transposed) narrow-lane kernels ---------------------------
#
# Attention-style per-edge quantities are NARROW ([E, K], K ~ 4 heads).
# XLA tiles 2-D f32 as (8, 128): a [E, 4] array occupies a full 128-lane
# tile per 8 rows — a 32x physical inflation that turns every softmax
# elementwise op into hundreds of MB of traffic (measured ~2.7 ms per op
# at PPI scale). Head-major [K, E] arrays tile compactly (K sublanes x E
# lanes), so the whole attention pipeline runs transposed; these kernel
# variants consume/produce [K, E] streams and [K, RPAD] rank tables.


def _lane_window(rl: int) -> int:
    """Table-window size for LANE-dim (transposed) slabs: dynamic lane
    slices must be 128-aligned on TPU, so starts round DOWN to 128 and
    the window grows to cover the residual offset."""
    return _ceil_mult(rl + 128, 128)


def _segsum_t_kernel(start_ref, rank_ref, msg_ref, out_ref, *, be, rl, sub):
    c = pl.program_id(0)
    rlt = _lane_window(rl)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(sub):
        start = pl.multiple_of(
            (start_ref[c * sub + s] // 128) * 128, 128
        )
        oh_t = _local_onehot_t(rank_ref[s, :], start, rlt, be)
        m_t = msg_ref[:, pl.ds(s * be, be)].astype(jnp.bfloat16)  # [K, BE]
        contrib = jnp.dot(m_t, oh_t, preferred_element_type=jnp.float32)
        cur = out_ref[:, pl.ds(start, rlt)]
        out_ref[:, pl.ds(start, rlt)] = cur + contrib


def _expand_t_kernel(start_ref, rank_ref, table_ref, out_ref,
                     *, be, rl, sub):
    c = pl.program_id(0)
    rlt = _lane_window(rl)
    for s in range(sub):
        start = pl.multiple_of(
            (start_ref[c * sub + s] // 128) * 128, 128
        )
        oh = _local_onehot(rank_ref[s, :], start, rlt, be)
        slab = table_ref[:, pl.ds(start, rlt)].astype(jnp.bfloat16)
        out_ref[:, pl.ds(s * be, be)] = jnp.dot(
            slab, oh, preferred_element_type=jnp.float32,
        )


def _wseg_t_kernel(start_ref, rank_ref, msg_ref, wt_ref, out_ref,
                   *, be, rl, sub, d, k):
    """Weighted segment-sum with HEAD-MAJOR weights w_t [K, E]; the
    replicate to D lanes happens in VMEM via one thin-K MXU contraction
    per sub-block."""
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)  # [K, D]

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        m = msg_ref[pl.ds(s * be, be), :d].astype(jnp.float32)
        w_slab = wt_ref[:, pl.ds(s * be, be)]  # [K, BE]
        w_rep = jax.lax.dot_general(
            w_slab, rep, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        wm = (m * w_rep).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, wm, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rl), :]
        out_ref[pl.ds(start, rl), :] = cur + contrib


def _wseg_t_bwd_kernel(start_ref, rank_ref, msg_ref, wt_ref, g_ref,
                       dmsg_ref, dwt_ref, *, be, rl, sub, d, k):
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        g_e = jnp.dot(
            oh_t, g_ref[pl.ds(start, rl), :],
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        w_slab = wt_ref[:, pl.ds(s * be, be)]  # [K, BE]
        w_rep = jax.lax.dot_general(
            w_slab, rep, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        dmsg_ref[pl.ds(s * be, be), :] = (g_e * w_rep).astype(dmsg_ref.dtype)
        # f32 contraction, matching the row-major kernel's dw precision
        # (attention-vector gradients are small reductions — keep exact).
        dwt_ref[:, pl.ds(s * be, be)] = jax.lax.dot_general(
            rep, m * g_e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, BE]


@functools.partial(jax.jit,
                   static_argnames=("table_rows", "block_edges", "win"))
def _segsum_t_impl(msgs_t, ranks, *, table_rows, block_edges, win=0):
    k, e = msgs_t.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    # Lane-dim windows are 128-aligned (see _lane_window): pad the table
    # so the widest aligned window stays in bounds, slice after.
    rows_t = _ceil_mult(table_rows, 128) + _lane_window(rl)
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_segsum_t_kernel, be=be, rl=rl, sub=sub)
    out = pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((k, STEP), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, rows_t), jnp.float32),
        compiler_params=_params(k * rows_t * 4),
        interpret=_interpret(),
    )(starts, blocks, msgs_t)
    return out[:, :table_rows]


@functools.partial(jax.jit, static_argnames=("block_edges", "win"))
def _expand_t_impl(table_t, ranks, *, block_edges, win=0):
    e = ranks.shape[0]
    k = table_t.shape[0]
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rows_t = _ceil_mult(table_t.shape[1], 128) + _lane_window(rl)
    table_t = jnp.pad(table_t, ((0, 0), (0, rows_t - table_t.shape[1])))
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_expand_t_kernel, be=be, rl=rl, sub=sub)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
        ],
        out_specs=pl.BlockSpec((k, STEP), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, e), jnp.float32),
        compiler_params=_params(k * rows_t * 4),
        interpret=_interpret(),
    )(starts, blocks, table_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ranked_segment_sum_table_t(msgs_t, ranks, table_rows: int,
                               block_edges: int = 256, win: int = 0):
    """Head-major ranked segment-sum: [K, E] -> [K, table_rows] (f32)."""
    return _segsum_t_impl(msgs_t, ranks, table_rows=table_rows,
                          block_edges=block_edges, win=win)


def _segsum_t_fwd(msgs_t, ranks, table_rows, block_edges, win):
    out = _segsum_t_impl(msgs_t, ranks, table_rows=table_rows,
                         block_edges=block_edges, win=win)
    return out, (ranks, jnp.zeros((0,), msgs_t.dtype))


def _segsum_t_bwd(table_rows, block_edges, win, res, g):
    ranks, proto = res
    d_msgs = _expand_t_impl(g, ranks, block_edges=block_edges, win=win)
    return (d_msgs.astype(proto.dtype), None)


ranked_segment_sum_table_t.defvjp(_segsum_t_fwd, _segsum_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def ranked_expand_table_t(table_t, ranks, table_rows: int,
                          block_edges: int = 256, win: int = 0):
    """Head-major ranked expand: out[:, e] = table_t[:, rank[e]]."""
    return _expand_t_impl(table_t, ranks, block_edges=block_edges, win=win)


def _expand_t_fwd(table_t, ranks, table_rows, block_edges, win):
    out = _expand_t_impl(table_t, ranks, block_edges=block_edges, win=win)
    return out, (ranks, jnp.zeros((0,), table_t.dtype))


def _expand_t_bwd(table_rows, block_edges, win, res, g):
    ranks, proto = res
    d_table = _segsum_t_impl(g, ranks, table_rows=table_rows,
                             block_edges=block_edges, win=win)
    return (d_table.astype(proto.dtype), None)


ranked_expand_table_t.defvjp(_expand_t_fwd, _expand_t_bwd)


@functools.partial(jax.jit, static_argnames=("table_rows", "num_heads",
                                             "block_edges", "win",
                                             "d_used"))
def _wseg_t_impl(msgs, w_t, ranks, *, table_rows, num_heads, block_edges,
                 win=0, d_used=None):
    """`msgs` may carry EXTRA trailing lanes (e.g. the RGAT [E, D+K]
    gather with its logit lanes): pass d_used to aggregate only the first
    d lanes — cheaper than slicing the stream outside (an [E, D] relayout
    copy, ~0.38 ms/layer at RGAT bench shapes)."""
    e, dim_in = msgs.shape
    dim = d_used or dim_in
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_wseg_t_kernel, be=be, rl=rl, sub=sub, d=dim,
                             k=num_heads)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim_in), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, STEP), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, msgs, w_t)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_edges", "win"))
def _wseg_t_bwd_impl(msgs, w_t, g16, ranks, *, num_heads, block_edges,
                     win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_wseg_t_bwd_kernel, be=be, rl=rl, sub=sub,
                             d=dim, k=num_heads)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, STEP), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf16 g table resident
        ],
        out_specs=(
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, STEP), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((num_heads, e), jnp.float32),
        ),
        compiler_params=_params(
            g16.shape[0] * _ceil_mult(dim, 128) * 2),
        interpret=_interpret(),
    )(starts, blocks, msgs, w_t, g16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ranked_weighted_segment_sum_t(msgs, w_t, ranks, table_rows: int,
                                  num_heads: int, block_edges: int = 256,
                                  win: int = 0):
    """Per-head weighted segment-sum with HEAD-MAJOR weights [K, E] (see
    ranked_weighted_segment_sum; this variant keeps the narrow attention
    arrays in their compact transposed layout end to end)."""
    return _wseg_t_impl(msgs, w_t, ranks, table_rows=table_rows,
                        num_heads=num_heads, block_edges=block_edges,
                        win=win)


def _wseg_t_vjp_fwd(msgs, w_t, ranks, table_rows, num_heads, block_edges,
                    win):
    out = _wseg_t_impl(msgs, w_t, ranks, table_rows=table_rows,
                       num_heads=num_heads, block_edges=block_edges, win=win)
    return out, (msgs, w_t, ranks)


def _wseg_t_vjp_bwd(table_rows, num_heads, block_edges, win, res, g):
    msgs, w_t, ranks = res
    d_msgs, d_wt = _wseg_t_bwd_impl(msgs, w_t, g.astype(jnp.bfloat16),
                                    ranks, num_heads=num_heads,
                                    block_edges=block_edges, win=win)
    return (d_msgs.astype(msgs.dtype), d_wt.astype(w_t.dtype), None)


ranked_weighted_segment_sum_t.defvjp(_wseg_t_vjp_fwd, _wseg_t_vjp_bwd)


# ---- fused FiLM modulate-activate-aggregate --------------------------------

_ACTS = {
    "linear": (lambda z: z, lambda z: jnp.ones_like(z)),
    "relu": (lambda z: jnp.maximum(z, 0.0),
             lambda z: (z > 0).astype(jnp.float32)),
    # alpha=0.2: the tf.nn.leaky_relu default the reference relies on
    # (utils/utils.py:46-47), NOT jax's 0.01 (see nn/activations.py).
    "leaky_relu": (lambda z: jnp.where(z > 0, z, 0.2 * z),
                   lambda z: jnp.where(z > 0, 1.0, 0.2)),
    "elu": (lambda z: jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0),
            lambda z: jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))),
    "tanh": (jnp.tanh, lambda z: 1.0 - jnp.tanh(z) ** 2),
    # erf formulation, matching nn/activations.py _gelu_erf (the
    # reference's utils.py:52-56), NOT the tanh approximation. Mosaic has
    # no erf lowering, so _erf_approx below (Abramowitz-Stegun 7.1.26,
    # max abs err 1.5e-7 — far below the kernels' bf16 stream rounding).
    "gelu": (
        lambda z: 0.5 * z * (1.0 + _erf_approx(z * (2.0 ** -0.5))),
        lambda z: (0.5 * (1.0 + _erf_approx(z * (2.0 ** -0.5)))
                   + z * jnp.exp(-0.5 * z * z)
                   * (1.0 / np.sqrt(2.0 * np.pi))),
    ),
}


def _erf_approx(x):
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def film_act_supported(name: str) -> bool:
    return name.lower() in _ACTS


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _film_fwd_impl(msgs, gb_table, ranks, *, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rpad = gb_table.shape[0]
    assert gb_table.shape == (rpad, 2 * dim), (gb_table.shape, rpad, dim)
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_film_fwd_kernel, be=be, rl=rl, sub=sub, d=dim,
                             act=_ACTS[act][0],
                             group=_dot_group(win, be, FWD_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gb table resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, dim), jnp.float32),
        compiler_params=_params(
            rpad * (_ceil_mult(2 * dim, 128) * 2 + _ceil_mult(dim, 128) * 4)),
        interpret=_interpret(),
    )(starts, blocks, msgs, gb_table)


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _film_bwd_impl(msgs, gbg_table, ranks, *, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rpad = gbg_table.shape[0]
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_film_bwd_kernel, be=be, rl=rl, sub=sub, d=dim,
                             dact=_ACTS[act][1])
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma|beta|g table
        ],
        out_specs=(
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((e, dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((rpad, 2 * dim), jnp.float32),
        ),
        compiler_params=_params(
            rpad * (_ceil_mult(3 * dim, 128) * 2 + _ceil_mult(2 * dim, 128) * 4)),
        interpret=_interpret(),
    )(starts, blocks, msgs, gbg_table)


# Activations whose derivative is a function of the sign mask alone:
# act'(z) = leak + (1 - leak) * (z > 0).
MASKABLE_ACTS = {"relu": 0.0, "leaky_relu": 0.2}


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _film_fwd_mask_impl(msgs, gb_table, ranks, *, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rpad = gb_table.shape[0]
    mlanes = _mask_lanes(dim)
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_film_fwd_mask_kernel, be=be, rl=rl, sub=sub,
                             d=dim, act=_ACTS[act][0],
                             group=_dot_group(win, be, FWD_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gb table resident
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, mlanes), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rpad, dim), jnp.float32),
            jax.ShapeDtypeStruct((e, mlanes), jnp.float32),
        ),
        compiler_params=_params(
            rpad * (_ceil_mult(2 * dim, 128) * 2 + _ceil_mult(dim, 128) * 4)),
        interpret=_interpret(),
    )(starts, blocks, msgs, gb_table)


@functools.partial(jax.jit, static_argnames=("block_edges", "act", "win"))
def _film_bwd_dgb_impl(msgs, gbg_table, ranks, *, block_edges, act, win=0):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    rpad = gbg_table.shape[0]
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_film_bwd_dgb_kernel, be=be, rl=rl, sub=sub,
                             d=dim, dact=_ACTS[act][1],
                             group=_dot_group(win, be, DGB_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma|beta|g table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, 2 * dim), jnp.float32),
        compiler_params=_params(
            rpad * (_ceil_mult(3 * dim, 128) * 2 + _ceil_mult(2 * dim, 128) * 4)),
        interpret=_interpret(),
    )(starts, blocks, msgs, gbg_table)


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "leak", "win"))
def _masked_segsum_impl(mask_packed, c_e, ranks, *, table_rows, block_edges,
                        leak, win=0):
    e, dim = c_e.shape
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    mlanes = mask_packed.shape[1]
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_masked_segsum_kernel, be=be, rl=rl, sub=sub,
                             d=dim, leak=leak)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, mlanes), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(table_rows * _ceil_mult(dim, 128) * 4),
        interpret=_interpret(),
    )(starts, blocks, mask_packed, c_e)


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "act", "win"))
def _film_src_bwd_impl(gcb_src, t_ranked, ranks, *, table_rows, block_edges,
                       act, win=0):
    e = ranks.shape[0]
    dim = t_ranked.shape[1]
    assert gcb_src.shape == (e, 3 * dim), (gcb_src.shape, e, dim)
    assert t_ranked.shape[0] == table_rows, (t_ranked.shape, table_rows)
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_film_src_bwd_kernel, be=be, rl=rl, sub=sub,
                             d=dim, dact=_ACTS[act][1],
                             group=_dot_group(win, be, DGB_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, 3 * dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t rank table resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(
            table_rows * _ceil_mult(dim, 128) * (2 + 4)),
        interpret=_interpret(),
    )(starts, blocks, gcb_src, t_ranked)


# The src-recompute pass replaces the step's single hottest op — the
# tile-amplified [E, D] cotangent permute of the generic gather VJP (a
# random row gather reads 3 full (16, 128) tiles per 320-lane row; XLA
# row gathers are row-rate limited at ~100M rows/s from large sources) —
# with ONE small-table row gather (~325M rows/s from a VMEM-staged
# source) plus a streaming kernel. Escape hatch for debugging only.
ENABLE_FUSED_SRC_PASS = True


def film_fused_src_supported(act: str, num_edges: int, dim: int,
                             table_rows: int, src_rows: int) -> bool:
    """Eligibility of the gather-fused FiLM pass: known activation and the
    unsplit receiver-side kernels plus the src-side recompute kernel
    (resident bf16 t table + f32 dt table + double-buffered [STEP, 3D]
    bf16 stream) fit VMEM."""
    if not (ENABLE_FUSED_SRC_PASS and act in _ACTS):
        return False
    lane_d = _ceil_mult(dim, 128)
    lane_3d = _ceil_mult(3 * dim, 128)
    src_vmem = src_rows * lane_d * (2 + 4) + 2 * STEP * lane_3d * 2
    return (src_vmem <= _VMEM_BUDGET
            and film_ranked_supported(num_edges, dim, table_rows))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def film_fused_src_pass(t_flat, gb_table, src_idx, fine_rank_by_src,
                        src_sorted_rank, src_to_rank, src_from_rank,
                        ranks, act: str, block_edges: int,
                        win_fine: int, win_src: int):
    """FiLM message pass with the source-side gather fused into the VJP.

    Forward: gather m = t_flat[src_idx] (XLA take from the small type-
    stacked table — write-bound) and run the fused modulate-activate-
    aggregate kernel.

    Backward avoids the tile-amplified [E, D] cotangent permute of the
    generic gather VJP (the measured hot op of the FiLM step) by
    RECOMPUTING dmsg in SOURCE-sorted order:
        dmsg_e = act'(z_e) * gamma_e * g_e = act'(z_e) * C[fine_e]
    where z is rebuilt inside the src-side kernel — m expanded in-VMEM
    from the src-rank message table t_flat[src_from_rank] (bitwise the
    forward's bf16 rows), gamma | beta | C (= gamma * g) arriving as ONE
    XLA row gather from a small [RPAD, 3D] bf16 fine-rank table — and the
    windowed streaming segment-sum by source rank yields dt directly.
    Works for every supported activation (act'(z) is available, not just
    a sign mask).
    """
    gb16 = gb_table.astype(jnp.bfloat16)
    m = jnp.take(t_flat.astype(jnp.bfloat16), src_idx, axis=0, mode="clip")
    return _film_fwd_impl(m, gb16, ranks, block_edges=block_edges,
                          act=act, win=win_fine)


def _ffsp_fwd(t_flat, gb_table, src_idx, fine_rank_by_src,
              src_sorted_rank, src_to_rank, src_from_rank, ranks, act,
              block_edges, win_fine, win_src):
    gb16 = gb_table.astype(jnp.bfloat16)
    t16 = t_flat.astype(jnp.bfloat16)
    m = jnp.take(t16, src_idx, axis=0, mode="clip")
    table = _film_fwd_impl(m, gb16, ranks, block_edges=block_edges,
                           act=act, win=win_fine)
    res = (m, gb16, t16, fine_rank_by_src, src_sorted_rank, src_to_rank,
           src_from_rank, ranks, jnp.zeros((0,), t_flat.dtype),
           jnp.zeros((0,), gb_table.dtype))
    return table, res


def _ffsp_bwd(act, block_edges, win_fine, win_src, res, g):
    (m, gb16, t16, fine_rank_by_src, src_sorted_rank, src_to_rank,
     src_from_rank, ranks, t_proto, gb_proto) = res
    d = m.shape[1]
    g16 = g.astype(jnp.bfloat16)
    gbg = jnp.concatenate([gb16, g16], axis=1)
    dgb = _film_bwd_dgb_impl(m, gbg, ranks, block_edges=block_edges,
                             act=act, win=win_fine)
    # dt via src-order recompute (see film_fused_src_pass): one [E, 3D]
    # row gather from the small fine table, then one streaming kernel.
    gcb_table = jnp.concatenate([gb16, gb16[:, :d] * g16], axis=1)
    # Appended zero row: diluted fill slots (SD_FILL fine keys) clamp
    # onto it, so their recomputed dmsg is zero for ARBITRARY upstream
    # cotangents (real/pad edges land below it unchanged).
    gcb_ext = jnp.concatenate(
        [gcb_table, jnp.zeros((8, gcb_table.shape[1]), gcb_table.dtype)],
        axis=0)
    gcb_src = jnp.take(
        gcb_ext, jnp.minimum(fine_rank_by_src, gcb_table.shape[0]),
        axis=0, mode="clip")
    t_ranked = jnp.take(t16, src_from_rank, axis=0, mode="clip")
    dt_table = _film_src_bwd_impl(
        gcb_src, t_ranked, src_sorted_rank,
        table_rows=src_from_rank.shape[0], block_edges=block_edges,
        act=act, win=win_src,
    )
    valid = src_to_rank >= 0
    d_t = jnp.take(dt_table, jnp.maximum(src_to_rank, 0), axis=0)
    d_t = jnp.where(valid[:, None], d_t, 0.0).astype(t_proto.dtype)
    return (d_t, dgb.astype(gb_proto.dtype), None, None, None, None, None,
            None)


film_fused_src_pass.defvjp(_ffsp_fwd, _ffsp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def film_ranked_aggregate(msgs, gb_table, ranks, act: str = "relu",
                          block_edges: int = 256, win: int = 0):
    """Fused GNN-FiLM message pass: table[r] = sum_{e: rank(e)==r}
    act(gamma[r] * msgs[e] + beta[r]) with gb_table = [gamma | beta]
    rank-indexed [RPAD, 2D]. `ranks` must be FINE (receiver, type) group
    ranks — gamma/beta are constant within a group. Returns the f32 rank
    table [RPAD, D]; combine per receiver afterwards (cheap R-row op).

    Backward recomputes the modulation in a mirrored streaming kernel and
    returns (d_msgs [E, D], d_gb_table [RPAD, 2D]) — no per-edge gathers.
    """
    return _film_fwd_impl(msgs, gb_table.astype(jnp.bfloat16), ranks,
                          block_edges=block_edges, act=act, win=win)


def _film_vjp_fwd(msgs, gb_table, ranks, act, block_edges, win):
    gb16 = gb_table.astype(jnp.bfloat16)
    out = _film_fwd_impl(msgs, gb16, ranks,
                         block_edges=block_edges, act=act, win=win)
    return out, (msgs, gb16, jnp.zeros((0,), gb_table.dtype), ranks)


def _film_vjp_bwd(act, block_edges, win, res, g):
    msgs, gb16, gb_proto, ranks = res
    # bf16 gamma|beta|g table: the kernel consumes bf16 slabs either way,
    # and halving the resident table doubles the shapes that fit VMEM.
    gbg = jnp.concatenate([gb16, g.astype(jnp.bfloat16)], axis=1)
    d_msgs, d_gb = _film_bwd_impl(msgs, gbg, ranks,
                                  block_edges=block_edges, act=act, win=win)
    return (d_msgs.astype(msgs.dtype), d_gb.astype(gb_proto.dtype), None)


film_ranked_aggregate.defvjp(_film_vjp_fwd, _film_vjp_bwd)


# ---- fused RGAT attention pass (src-order recompute backward) --------------


def _wseg_t_dw_kernel(start_ref, rank_ref, msg_ref, g_ref, dwt_ref,
                      *, be, rl, sub, d, k):
    """dw-only half of the weighted-segment-sum backward: per-head dots of
    the edge messages with the expanded gradient table. Emitting ONLY the
    narrow [K, E] output spares the [E, D] dmsg stream write for callers
    that reconstruct dmsg in source order (rgat_fused_pass)."""
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        g_e = jnp.dot(
            oh_t, g_ref[pl.ds(start, rl), :],
            preferred_element_type=jnp.float32,
        )  # [BE, D]
        m = msg_ref[pl.ds(s * be, be), :d].astype(jnp.float32)
        dwt_ref[:, pl.ds(s * be, be)] = jax.lax.dot_general(
            rep, m * g_e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, BE]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_edges", "win",
                                    "d_used"))
def _wseg_t_dw_impl(msgs, g16, ranks, *, num_heads, block_edges, win=0,
                    d_used=None):
    e, dim_in = msgs.shape
    dim = d_used or dim_in
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_wseg_t_dw_kernel, be=be, rl=rl, sub=sub,
                             d=dim, k=num_heads)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim_in), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf16 g table resident
        ],
        out_specs=pl.BlockSpec((num_heads, STEP), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_heads, e), jnp.float32),
        compiler_params=_params(
            g16.shape[0] * _ceil_mult(dim, 128) * 2),
        interpret=_interpret(),
    )(starts, blocks, msgs, g16)


def _rgat_src_bwd_kernel(start_ref, rank_ref, gcb_ref, t_ref,
                         dt_ref, *, be, rl, sub, d, k, clamp, group=1):
    """dt + per-src-rank dpre-sum halves of the RGAT backward over the
    SOURCE-sorted edge stream.

    Recomputes the attention weight and the pre-activation logit cotangent
    per edge FROM SMALL TABLES — the t_ref slab carries the src-rank
    message rows WITH their per-rank bf16 source logit halves (the SAME
    K extra lanes the forward gathers, so the recomputed attention is
    bit-consistent with it); everything receiver-keyed (the aggregation
    cotangent, target logit halves, softmax denominator, correction term)
    arrives as ONE XLA row gather from a [RPAD, D+3K] bf16 fine-rank side
    table. Only the attn-weighted half of the message cotangent
    accumulates here (dmsg_e = attn_e * dagg_rcv(e)); the
    att_src-weighted half AND d_att_src both factor through the per-rank
    dpre sums (m and att_src[type] are constant within a src rank), which
    the kernel emits as a thin [R, K] f32 table for the caller's
    node-side completion:

        sum_{e: rank r} dpre_rep(e) * attv_r = attv_r * (dpre_sum_r @ rep)
        d_att[l] = sum_{r: type(r)=l} m_r * (dpre_sum_r @ rep)

    (exact reassociations; f32 per-rank sums). Nothing [E, D]-shaped is
    permuted between edge orders (the measured hot op this replaces: a
    7.8 ms/layer cotangent permute at PPI scale)."""
    c = pl.program_id(0)
    rep = _head_replicate_matrix(k, d)  # [K, D]

    @pl.when(c == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    bd, rlg = group * be, group * rl
    for gi in range(sub // group):
        row0 = gi * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh = _grouped_onehot(rank_ref, row0, group, start, rl, be)
        oh_t = _grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        mt = jnp.dot(oh_t, t_ref[pl.ds(start, rlg), :],
                     preferred_element_type=jnp.float32)  # [BD, D+K]
        m = mt[:, :d]
        lsrc = mt[:, d:]
        gcb = gcb_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        dagg = gcb[:, :d]
        lt = gcb[:, d:d + k]
        den = gcb[:, d + k:d + 2 * k]
        s_cor = gcb[:, d + 2 * k:d + 3 * k]
        pre = lsrc + lt
        logit = jnp.where(pre > 0, pre, 0.2 * pre)  # leaky_relu, tf default
        ex = jnp.exp(jnp.clip(logit, -clamp, clamp))
        attn = ex / (den + 1e-7)
        draw = jax.lax.dot_general(
            m * dagg, rep, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BE, K] = <m_e head k, dagg_rcv head k>
        dlog = attn * (draw - s_cor)
        # The forward clamps logits to [-clamp, clamp] before exp; autodiff
        # through jnp.clip zeroes the cotangent at clamped logits, so the
        # recompute must apply the same indicator to stay VJP-exact.
        dlog = dlog * (jnp.abs(logit) < clamp).astype(jnp.float32)
        dpre = jnp.where(pre > 0, dlog, 0.2 * dlog)
        # Padded edges and dilution fill slots need no positional mask:
        # their fine rank keys a zero side row (dagg = den = s_cor = 0),
        # so dmsg and dpre are exactly zero (see _rgat_vjp_bwd cof).
        attn_rep = jnp.dot(attn, rep, preferred_element_type=jnp.float32)
        dmsg = attn_rep * dagg
        # ONE accumulation dot and ONE RMW per sub-block: the thin dpre
        # columns ride the dt table as K extra lanes (a second windowed
        # RMW table measured +2.5 ms/layer of serialization).
        both = jnp.concatenate(
            [dmsg.astype(jnp.bfloat16), dpre.astype(jnp.bfloat16)], axis=1
        )  # [BD, D+K]
        contrib = jnp.dot(oh, both, preferred_element_type=jnp.float32)
        cur = dt_ref[pl.ds(start, rlg), :]
        dt_ref[pl.ds(start, rlg), :] = cur + contrib


@functools.partial(jax.jit, static_argnames=("table_rows", "num_heads",
                                             "block_edges", "clamp", "win"))
def _rgat_src_bwd_impl(gcb_src, t_ext,
                       ranks, *, table_rows, num_heads, block_edges,
                       clamp, win=0):
    """t_ext: [R_src, D + K] bf16 — src-rank message rows with their
    per-rank source logit halves appended (the forward's own lanes)."""
    e = ranks.shape[0]
    k = num_heads
    dim = t_ext.shape[1] - k
    assert gcb_src.shape == (e, dim + 3 * k), (gcb_src.shape, e, dim, k)
    assert t_ext.shape[0] == table_rows, (t_ext.shape, table_rows)
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_rgat_src_bwd_kernel, be=be, rl=rl, sub=sub,
                             d=dim, k=k, clamp=clamp,
                             group=_dot_group(win, be, DGB_DOT_GROUP_CAP))
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim + 3 * k), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t|lsrc table resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim + k), jnp.float32),
        compiler_params=_params(
            table_rows * _ceil_mult(dim + k, 128) * (2 + 4)),
        interpret=_interpret(),
    )(starts, blocks, gcb_src, t_ext)


def rgat_fused_supported(num_edges: int, dim: int, num_heads: int,
                         table_rows: int, src_rows: int) -> bool:
    """Eligibility of the fused RGAT pass: the receiver-side kernels
    (wseg fwd/dw) plus the src-side recompute kernel (resident bf16 t
    table + f32 dt table + type one-hot + double-buffered [STEP, D+3K]
    bf16 stream) fit VMEM."""
    if not ENABLE_FUSED_SRC_PASS or dim % num_heads:
        return False
    lane_dk = _ceil_mult(dim + num_heads, 128)
    lane_g = _ceil_mult(dim + 3 * num_heads, 128)
    src_vmem = (src_rows * lane_dk * (2 + 4)
                + 2 * STEP * lane_g * 2)
    return (src_vmem <= _VMEM_BUDGET
            and ranked_supported(num_edges, dim, table_rows))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def rgat_fused_pass(t_flat, lt_table, att_src, src_idx, fine_rank_by_src,
                    src_sorted_rank, src_to_rank, src_from_rank,
                    rcv_rank, tgt_rank, edge_mask, fine_to_rcv,
                    node_to_rank,
                    num_heads: int, n_pad: int, block_edges: int,
                    win_fine: int, win_src: int):
    """RGAT attention pass (reference gnns/rgat.py:95-138) with the
    source-side gather fused into the VJP.

    Forward ≡ the head-major streamed pipeline (nn/layers.py rgat_apply):
    messages gathered once from the type-stacked transform table, source
    logit halves via one [E, L*K] MXU dot + type one-hot contraction,
    target halves expanded from the fine-rank `lt_table` [RPAD, K],
    clamped-exp receiver softmax, fused weighted aggregation into the
    coarse rank table (returned pre-activation/pre-combine).

    Backward REPLACES the [E, D] cotangent permute of the generic gather
    VJP (measured 7.8 ms/layer at PPI scale — the step's hottest op) with
    a source-order recompute: a dw-only receiver kernel produces the raw
    per-edge attention cotangents, narrow [K, E] XLA math + two ranked
    segment-sums produce the softmax correction table and d(lt_table), and
    one src-order kernel recomputes attention + logit cotangents from a
    single [E, D+3K] bf16 row gather (aggregation cotangent | target
    logits | softmax denominator | correction term, keyed by the fine rank
    of each src-sorted edge) and streams dmsg directly into the src rank
    table. Receiver-keyed values ride bf16 through the side table; the
    resulting ~1e-3-relative gradient noise is far below SGD batch noise
    (tests: rtol 8e-2 vs the segment path, same as the other fused VJPs).
    """
    table, _ = _rgat_fwd_compute(
        t_flat, lt_table, att_src, src_idx, rcv_rank, tgt_rank, edge_mask,
        num_heads, n_pad, block_edges, win_fine,
    )
    return table


def _rgat_fwd_compute(t_flat, lt_table, att_src, src_idx, rcv_rank,
                      tgt_rank, edge_mask, num_heads,
                      n_pad, block_edges, win_fine, clamp: float = 50.0):
    L, k, dh = att_src.shape
    d = t_flat.shape[1]
    t16 = t_flat.astype(jnp.bfloat16)
    # Per-(type, node) source logit halves, computed NODE-side and rounded
    # to bf16 ONCE: lsrc = <t[l, v], att_src[l]> per head depends only on
    # the (type, node) slot, so it rides the type-stacked table as K extra
    # lanes — ONE widened gather replaces the per-edge [E, L*K] logits
    # matmul + type-select, and the src-order backward reads the SAME
    # bf16 values back (bit-consistent recomputed attention).
    lsrc_node = jnp.einsum(
        "lnkh,lkh->lnk",
        t16.astype(jnp.float32).reshape(L, n_pad, k, dh),
        att_src.astype(jnp.bfloat16).astype(jnp.float32),
    ).reshape(L * n_pad, k)
    t_ext = jnp.concatenate(
        [t16, lsrc_node.astype(jnp.bfloat16)], axis=1
    )  # [L*N, D+K]
    m2e = jnp.take(t_ext, src_idx, axis=0, mode="clip")  # [E, D+K]
    lsrc_t = m2e[:, d:].astype(jnp.float32).T  # [K, E]
    ltgt_t = _expand_t_impl(lt_table.T, tgt_rank,
                            block_edges=block_edges, win=win_fine)
    pre_t = lsrc_t + ltgt_t
    logits_t = jnp.where(pre_t > 0, pre_t, 0.2 * pre_t)
    ex_t = jnp.exp(jnp.clip(logits_t, -clamp, clamp)) * edge_mask[None, :]
    rows = rank_table_rows(n_pad, block_edges)
    den = _segsum_t_impl(ex_t, rcv_rank, table_rows=rows,
                         block_edges=block_edges, win=win_fine)
    attn_t = ex_t / (_expand_t_impl(den, rcv_rank, block_edges=block_edges,
                                    win=win_fine)
                     + 1e-7)
    # The [E, D+K] gather feeds the kernel UNSLICED (d_used): slicing
    # m2 = m2e[:, :d] outside forces an [E, D] relayout copy
    # (~0.38 ms/layer at bench shapes).
    table = _wseg_t_impl(m2e, attn_t, rcv_rank, table_rows=rows,
                         num_heads=num_heads, block_edges=block_edges,
                         win=win_fine, d_used=d)
    # 3-state leaky/clamp code for the backward: 0 = clamped (zero
    # gradient, matching autodiff through jnp.clip), 1 = positive branch,
    # 2 = negative (0.2×) branch.
    unclamped = jnp.abs(logits_t) < clamp
    sign = jnp.where(unclamped, jnp.where(pre_t > 0, 1, 2), 0).astype(jnp.int8)
    return table, (m2e, attn_t, den, sign, t_ext)


def _rgat_vjp_fwd(t_flat, lt_table, att_src, src_idx, fine_rank_by_src,
                  src_sorted_rank, src_to_rank, src_from_rank,
                  rcv_rank, tgt_rank, edge_mask, fine_to_rcv,
                  node_to_rank,
                  num_heads, n_pad, block_edges, win_fine, win_src):
    table, (m2e, attn_t, den, sign, t_ext) = _rgat_fwd_compute(
        t_flat, lt_table, att_src, src_idx, rcv_rank, tgt_rank, edge_mask,
        num_heads, n_pad, block_edges, win_fine,
    )
    res = (m2e, attn_t, den, sign, t_ext, lt_table, att_src,
           fine_rank_by_src, src_sorted_rank, src_to_rank, src_from_rank,
           rcv_rank, tgt_rank, edge_mask, fine_to_rcv, node_to_rank,
           jnp.zeros((0,), t_flat.dtype))
    return table, res


def _rgat_vjp_bwd(num_heads, n_pad, block_edges, win_fine, win_src,
                  res, g):
    (m2e, attn_t, den, sign, t_ext, lt_table, att_src,
     fine_rank_by_src, src_sorted_rank, src_to_rank, src_from_rank,
     rcv_rank, tgt_rank, edge_mask, fine_to_rcv, node_to_rank,
     t_proto) = res
    k = num_heads
    L, _, dh = att_src.shape
    d = m2e.shape[1] - k
    clamp = 50.0
    rows = rank_table_rows(n_pad, block_edges)
    rpad = lt_table.shape[0]
    g16 = g.astype(jnp.bfloat16)

    # Receiver-order half: raw attention cotangents, softmax correction
    # table, and the fine-rank d(lt_table) — all narrow [K, E] math.
    draw_t = _wseg_t_dw_impl(m2e, g16, rcv_rank, num_heads=k,
                             block_edges=block_edges, win=win_fine,
                             d_used=d)
    s_tab = _segsum_t_impl(attn_t * draw_t, rcv_rank, table_rows=rows,
                           block_edges=block_edges, win=win_fine)
    s_exp = _expand_t_impl(s_tab, rcv_rank, block_edges=block_edges,
                           win=win_fine)
    lrfac = jnp.where(sign == 1, 1.0, jnp.where(sign == 2, 0.2, 0.0))
    dpre_t = attn_t * (draw_t - s_exp) * lrfac
    d_lt = _segsum_t_impl(dpre_t, tgt_rank, table_rows=rpad,
                          block_edges=block_edges, win=win_fine).T

    # Source-order half: one [RPAD, D+3K] bf16 side table holding every
    # receiver-keyed value an edge needs, gathered per src-sorted edge.
    # Dump fine ranks (fine_to_rcv == n_pad: padded edges AND the diluted
    # stream's fill slots) read the coarse table's LAST slack row — whose
    # cotangent/denominator/correction are structurally zero — so their
    # dmsg and dpre vanish without any positional masking (the kernel
    # needs no e_real tail bound, which the diluted stream's interleaved
    # fill slots would break anyway).
    cof = jnp.where(
        fine_to_rcv >= n_pad, rows - 1,
        jnp.take(node_to_rank, jnp.minimum(fine_to_rcv, n_pad - 1)),
    )
    side = jnp.concatenate([
        jnp.take(g16, cof, axis=0),
        lt_table.astype(jnp.bfloat16),
        jnp.take(den.T.astype(jnp.bfloat16), cof, axis=0),
        jnp.take(s_tab.T.astype(jnp.bfloat16), cof, axis=0),
    ], axis=1)  # [RPAD, D+3K]
    # Appended zero row: diluted fill slots (SD_FILL fine keys) clamp
    # onto it — dagg/den/s_cor are zero for ARBITRARY cotangents.
    side_ext = jnp.concatenate(
        [side, jnp.zeros((8, side.shape[1]), side.dtype)], axis=0)
    gcb_src = jnp.take(
        side_ext, jnp.minimum(fine_rank_by_src, side.shape[0]),
        axis=0, mode="clip")
    t_rank_ext = jnp.take(t_ext, src_from_rank, axis=0, mode="clip")
    dtp = _rgat_src_bwd_impl(
        gcb_src, t_rank_ext,
        src_sorted_rank, table_rows=src_from_rank.shape[0],
        num_heads=k, block_edges=block_edges, clamp=clamp, win=win_src,
    )
    dt_table, dp_table = dtp[:, :d], dtp[:, d:]
    # Node-side completion from the per-rank dpre sums (m and the type's
    # attention vector are constant within a src rank — exact
    # reassociation): the att_src-weighted dmsg half and d_att_src.
    type_oh_rank = jax.nn.one_hot(src_from_rank // n_pad, L,
                                  dtype=jnp.float32)  # [R, L]
    att_block = att_src.reshape(L, d).astype(jnp.bfloat16).astype(
        jnp.float32)  # match the forward's bf16-rounded vectors
    attv_rank = jnp.dot(type_oh_rank, att_block,
                        preferred_element_type=jnp.float32)  # [R, D]
    rep = _head_replicate_matrix(k, d)
    dpre_rep_rank = jnp.dot(dp_table, rep,
                            preferred_element_type=jnp.float32)  # [R, D]
    dt_full = dt_table + attv_rank * dpre_rep_rank
    t_rank_f32 = t_rank_ext[:, :d].astype(jnp.float32)
    d_att_block = jax.lax.dot_general(
        type_oh_rank, t_rank_f32 * dpre_rep_rank, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [L, D]
    valid = src_to_rank >= 0
    d_t = jnp.take(dt_full, jnp.maximum(src_to_rank, 0), axis=0)
    d_t = jnp.where(valid[:, None], d_t, 0.0).astype(t_proto.dtype)
    d_att_src = d_att_block.reshape(L, k, dh).astype(att_src.dtype)
    return (d_t, d_lt.astype(lt_table.dtype), d_att_src,
            None, None, None, None, None, None, None, None, None, None)


rgat_fused_pass.defvjp(_rgat_vjp_fwd, _rgat_vjp_bwd)


# ---- fused GNN-Edge-MLP1 type-major pass (src-order recompute bwd) ---------


def _emlp1_src_bwd_kernel(start_ref, rank_ref, ereal_ref, gcb_ref, t_ref,
                          toh_ref, w_ref, wt_ref, dt_ref,
                          *, be, rl, sub, d, l_eff, dact):
    """dts half of the GNN-Edge-MLP1 backward over the SOURCE-sorted
    stream: recomputes the per-edge chain
        x = elu(m + beta),  y = x @ W1[type],
        dm = elu'(x) * ((act'(y) * g) @ W1[type]^T)
    from small tables — m expands in-VMEM from the src-rank table, beta|g
    arrive as ONE [E, 2D] bf16 row gather keyed by the (receiver, type)
    rank of each src-sorted edge — and streams dm into the src rank
    table. Replaces the [E, D] cotangent permute of the type-major
    gather's generic VJP. The W1 matmuls run per NON-SELF type with the
    type one-hot masking the per-row results (L_eff-fold matmul FLOPs in
    VMEM — cheap at the small type counts that take this path; the
    eligibility gate caps L_eff)."""
    c = pl.program_id(0)
    e_real = ereal_ref[0]
    elu = _ACTS["elu"][0]
    delu_out = _ACTS_FROM_OUT["elu"]

    @pl.when(c == 0)
    def _():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh = _local_onehot(rank_ref[s, :], start, rl, be)
        oh_t = _local_onehot_t(rank_ref[s, :], start, rl, be)
        m = jnp.dot(oh_t, t_ref[pl.ds(start, rl), :],
                    preferred_element_type=jnp.float32)  # [BE, D]
        toh = jnp.dot(oh_t, toh_ref[pl.ds(start, rl), :],
                      preferred_element_type=jnp.float32)  # [BE, L_eff]
        gcb = gcb_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        beta, g = gcb[:, :d], gcb[:, d:]
        x = elu(m + beta)
        x16 = x.astype(jnp.bfloat16)
        dx = jnp.zeros((be, d), jnp.float32)
        for l in range(l_eff):
            y_l = jnp.dot(x16, w_ref[l],
                          preferred_element_type=jnp.float32)
            dagg_l = (dact(y_l) * g).astype(jnp.bfloat16)
            dx_l = jnp.dot(dagg_l, wt_ref[l],
                           preferred_element_type=jnp.float32)
            dx = dx + toh[:, l:l + 1] * dx_l
        dm = delu_out(x) * dx
        # Padded edges form the contiguous tail of the src-sorted stream;
        # their type decode is garbage (slack src ranks), so mask them.
        eidx = c * STEP + s * be + jax.lax.broadcasted_iota(
            jnp.int32, (be, 1), 0
        )
        dm = dm * (eidx < e_real).astype(jnp.float32)
        contrib = jnp.dot(oh, dm.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        cur = dt_ref[pl.ds(start, rl), :]
        dt_ref[pl.ds(start, rl), :] = cur + contrib


@functools.partial(jax.jit, static_argnames=("table_rows", "block_edges",
                                             "act", "win"))
def _emlp1_src_bwd_impl(gcb_src, t_ranked, type_oh_rank, w_stack, wt_stack,
                        e_real, ranks, *, table_rows, block_edges, act,
                        win=0):
    e = ranks.shape[0]
    dim = t_ranked.shape[1]
    l_eff = w_stack.shape[0]
    assert gcb_src.shape == (e, 2 * dim), (gcb_src.shape, e, dim)
    assert t_ranked.shape[0] == table_rows, (t_ranked.shape, table_rows)
    be = block_edges
    sub = STEP // be
    rl = win if win else be + 8
    blocks, starts = _chunk_inputs(ranks, be)
    kern = functools.partial(_emlp1_src_bwd_kernel, be=be, rl=rl, sub=sub,
                             d=dim, l_eff=l_eff, dact=_ACTS[act][1])
    lane_d = _ceil_mult(dim, 128)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=_common_specs(sub, be) + [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # e_real scalar
            pl.BlockSpec((STEP, 2 * dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t rank table resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # type one-hot resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W1 stack resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W1^T stack resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, dim), jnp.float32),
        compiler_params=_params(
            table_rows * lane_d * (2 + 4) + table_rows * 128 * 2
            + 2 * l_eff * dim * lane_d * 2),
        interpret=_interpret(),
    )(starts, blocks, e_real, gcb_src, t_ranked, type_oh_rank, w_stack,
      wt_stack)


# MEASURED DEAD END — kept for the record, OFF by default: at the PPI
# bench shapes the src-order recompute (re-running the W1 matmuls twice,
# type-masked, inside the kernel) costs MORE than the [E, D] cotangent
# permute it replaces (A/B on one v5e: 4.73M vs 5.12M e/s epoch rate).
# Unlike FiLM/RGAT, the W1 dense sits BETWEEN the activation and the
# transport, so the recompute cannot avoid per-edge matmul re-runs.
# See docs/PERFORMANCE.md "GNN-Edge-MLP1 wall".
ENABLE_EMLP1_SRC_PASS = False


def emlp1_src_supported(act: str, num_edges: int, dim: int, l_eff: int,
                        table_rows: int, src_rows: int) -> bool:
    """Eligibility of the GNN-Edge-MLP1 src-recompute backward: known
    activation, small non-self type count (the in-kernel masked matmuls
    cost L_eff-fold FLOPs), and the resident tables fit VMEM."""
    if not (ENABLE_EMLP1_SRC_PASS and ENABLE_FUSED_SRC_PASS
            and act in _ACTS and 0 < l_eff <= 4):
        return False
    lane_d = _ceil_mult(dim, 128)
    src_vmem = (src_rows * lane_d * (2 + 4) + src_rows * 128 * 2
                + 2 * l_eff * dim * lane_d * 2
                + 2 * STEP * 2 * lane_d * 2)
    return (src_vmem <= _VMEM_BUDGET
            and ranked_supported(num_edges, dim, table_rows))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14,
                                                    15, 16, 17))
def emlp1_tm_pass(ts_flat, beta_table, W1, src_idx, tm_rank, tm_rank_by_src,
                  src_sorted_rank, src_to_rank, src_from_rank, edge_mask,
                  offs: tuple, self_flags: tuple, act: str, n_pad: int,
                  table_rows: int, block_edges: int, win_tm: int,
                  win_src: int):
    """GNN-Edge-MLP1 streamed message pass over the TYPE-MAJOR stream
    (reference gnns/gnn_edge_mlp.py:73-119) with the source-side gather
    fused into the VJP.

    Forward ≡ the aligned tmajor1 pipeline (nn/layers.py
    gnn_edge_mlp_apply): m = ts[src], x = elu(m + beta[rank]) via the
    fused expand kernel, per-NON-SELF-type full-size W1 matmuls on static
    slices, fused activate-aggregate into the (receiver, type) rank
    table. Self-loop types contribute node-side outside this op.

    Backward keeps the receiver-order half (act' cotangents, dW1, dbeta)
    on the existing streaming impls, and replaces the [E, D] cotangent
    permute of the type-major gather VJP (measured 3.9 ms/layer at PPI
    scale) with a source-order recompute from small tables
    (_emlp1_src_bwd_kernel)."""
    table, _ = _emlp1_fwd_compute(
        ts_flat, beta_table, W1, src_idx, tm_rank, offs, self_flags, act,
        table_rows, block_edges, win_tm,
    )
    return table


def _emlp1_fwd_compute(ts_flat, beta_table, W1, src_idx, tm_rank, offs,
                       self_flags, act, table_rows, block_edges, win_tm):
    d = ts_flat.shape[1]
    ts16 = ts_flat.astype(jnp.bfloat16)
    m = jnp.take(ts16, src_idx, axis=0, mode="clip")
    x = _expand_add_act_impl(m, beta_table, tm_rank,
                             block_edges=block_edges, act="elu", win=win_tm)
    table = jnp.zeros((table_rows, d), jnp.float32)
    ys = []
    for l in range(len(self_flags)):
        if self_flags[l]:
            ys.append(None)
            continue
        y_l = jnp.dot(
            x[offs[l]:offs[l + 1]], W1[l].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        ys.append(y_l)
        table = table + _act_agg_impl(
            y_l, tm_rank[offs[l]:offs[l + 1]], table_rows=table_rows,
            block_edges=block_edges, act=act, win=win_tm,
        )
    return table, (ts16, x, ys)


def _emlp1_vjp_fwd(ts_flat, beta_table, W1, src_idx, tm_rank,
                   tm_rank_by_src, src_sorted_rank, src_to_rank,
                   src_from_rank, edge_mask, offs, self_flags, act, n_pad,
                   table_rows, block_edges, win_tm, win_src):
    table, (ts16, x, ys) = _emlp1_fwd_compute(
        ts_flat, beta_table, W1, src_idx, tm_rank, offs, self_flags, act,
        table_rows, block_edges, win_tm,
    )
    res = (ts16, x, ys, beta_table, W1, tm_rank, tm_rank_by_src,
           src_sorted_rank, src_to_rank, src_from_rank, edge_mask,
           jnp.zeros((0,), ts_flat.dtype), jnp.zeros((0,), beta_table.dtype))
    return table, res


def _emlp1_vjp_bwd(offs, self_flags, act, n_pad, table_rows, block_edges,
                   win_tm, win_src, res, g):
    (ts16, x, ys, beta_table, W1, tm_rank, tm_rank_by_src,
     src_sorted_rank, src_to_rank, src_from_rank, edge_mask,
     ts_proto, b_proto) = res
    d = x.shape[1]
    e = x.shape[0]
    L = len(self_flags)
    g16 = g.astype(jnp.bfloat16)

    # Receiver-order half: per-type act' cotangents -> dW1 and (via the
    # expand-add-act backward) dbeta. dx only exists per non-self slice.
    dx = jnp.zeros((e, d), jnp.bfloat16)
    dW1 = []
    for l in range(L):
        if self_flags[l]:
            dW1.append(jnp.zeros((d, d), W1.dtype))
            continue
        sl = slice(offs[l], offs[l + 1])
        dy_l = _act_agg_bwd_impl(
            ys[l], g16, tm_rank[sl], block_edges=block_edges, act=act,
            win=win_tm,
        )  # [e_l, D] bf16
        dW1.append(jax.lax.dot_general(
            x[sl], dy_l, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(W1.dtype))
        dx = dx.at[sl].set(jnp.dot(
            dy_l, W1[l].astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16))
    _, dbeta = _expand_add_act_bwd_impl(
        x, dx, tm_rank, table_rows=table_rows, block_edges=block_edges,
        act="elu", win=win_tm,
    )

    # Source-order half: one [RPAD, 2D] bf16 side table (beta | g) keyed
    # by the (receiver, type) rank of each src-sorted edge.
    side = jnp.concatenate(
        [beta_table.astype(jnp.bfloat16), g16], axis=1
    )
    gcb_src = jnp.take(side, tm_rank_by_src, axis=0, mode="clip")
    t_ranked = jnp.take(ts16, src_from_rank, axis=0, mode="clip")
    # Compact column per NON-SELF type; self types (and slack rows') rows
    # are all-zero so their recomputed dm vanishes.
    col_of_type = np.full((L + 1,), -1, np.int32)
    nonself = [l for l in range(L) if not self_flags[l]]
    for ci, l in enumerate(nonself):
        col_of_type[l] = ci
    type_of_rank = jnp.minimum(src_from_rank // n_pad, L)
    cols = jnp.take(jnp.asarray(col_of_type), type_of_rank)
    type_oh_rank = (
        cols[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, len(nonself)), 1)
    ).astype(jnp.bfloat16)
    w_stack = W1[jnp.asarray(nonself)].astype(jnp.bfloat16)
    wt_stack = jnp.swapaxes(w_stack, 1, 2)
    e_real = jnp.sum(edge_mask).astype(jnp.int32).reshape(1)
    dt_table = _emlp1_src_bwd_impl(
        gcb_src, t_ranked, type_oh_rank, w_stack, wt_stack, e_real,
        src_sorted_rank, table_rows=src_from_rank.shape[0],
        block_edges=block_edges, act=act, win=win_src,
    )
    valid = src_to_rank >= 0
    d_ts = jnp.take(dt_table, jnp.maximum(src_to_rank, 0), axis=0)
    d_ts = jnp.where(valid[:, None], d_ts, 0.0).astype(ts_proto.dtype)
    return (d_ts, dbeta.astype(b_proto.dtype), jnp.stack(dW1),
            None, None, None, None, None, None, None)


emlp1_tm_pass.defvjp(_emlp1_vjp_fwd, _emlp1_vjp_bwd)


# ---------------------------------------------------------------------------
# XLA reference implementations (used by tests and as numerical oracles)
# ---------------------------------------------------------------------------


def xla_segment_sum_table(msgs, ranks, table_rows: int,
                          block_edges: int = 256):
    return jax.ops.segment_sum(msgs.astype(jnp.float32), ranks, table_rows,
                               indices_are_sorted=True)


def xla_expand_table(table, ranks, table_rows: int, block_edges: int = 256):
    return jnp.take(table, ranks, axis=0, mode="clip").astype(jnp.float32)


def xla_film_aggregate(msgs, gb_table, ranks, act: str = "relu",
                       block_edges: int = 256):
    d = msgs.shape[1]
    gb_e = jnp.take(gb_table, ranks, axis=0, mode="clip").astype(jnp.float32)
    z = gb_e[:, :d] * msgs.astype(jnp.float32) + gb_e[:, d:]
    a = _ACTS[act][0](z)
    return xla_segment_sum_table(a, ranks, gb_table.shape[0], block_edges)
