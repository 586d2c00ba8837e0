"""Static-shape batched graph representation.

The reference feeds fully-dynamic shapes per batch through TF1 placeholders
(tasks/sparse_graph_task.py:139-149: `initial_node_features [V, D]`,
L x `adjacency_lists [E, 2]`, `type_to_num_incoming_edges [L, V]`).
That is hostile to XLA/TPU, which traces and compiles per shape.

TPU-first design decisions:

* Nodes are padded to `n_pad` and edges of each type to a per-type
  `e_pad[l]` drawn from a small set of bucket sizes, so recompilation
  happens per *bucket*, not per batch.
* Padded edges point their receiver at a dedicated dump row `n_pad`;
  aggregations run with `num_segments = n_pad + 1` and the dump row is
  sliced off. This makes sum/max/mean/sqrt_n and segment-softmax all
  padding-safe with zero masking logic in the hot path.
* Padded edges point their sender at row 0 (any valid row) so gathers
  stay in-bounds; their values are rendered irrelevant by the dump row.
* Padded nodes belong to dump graph `g_pad` for per-graph pooling.

Shape legend: N = n_pad (padded node count), E_l = padded edge count of
type l, L = number of edge types, G = g_pad (padded graph count).
"""

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


class EdgeBlock(NamedTuple):
    """All edges of one edge type, padded to a static size and CANONICALIZED:
    edges are sorted by receiver (padding, with receiver == n_pad, sorts to
    the end). `perm_by_sender` is the permutation that re-orders the block by
    sender — it makes the *backward* scatter of a source-side gather a sorted
    segment-sum (see ops/edge_ops.py).

    Equivalent information to one reference `adjacency_lists[l]` [E, 2]
    int32 tensor (senders in column 0, receivers in column 1; see
    tasks/sparse_graph_task.py:123-127).
    """

    senders: jnp.ndarray  # [E_l] int32; padding -> n_pad (safe via clip/scale 0)
    receivers: jnp.ndarray  # [E_l] int32 SORTED ascending; padding -> n_pad
    mask: jnp.ndarray  # [E_l] float32; 1.0 = real edge
    perm_by_sender: jnp.ndarray  # [E_l] int32; senders[perm] is sorted
    norm_scale: jnp.ndarray  # [E_l] f32; mask / (c_{rcv, l} + SMALL_NUMBER)


class FlatEdges(NamedTuple):
    """ALL edges of the batch as one flat stream, globally sorted by
    receiver. Type information is carried as offsets into type-stacked node
    tables: a [L, N, D] per-type transform reshaped to [L*N, D] is indexed
    by `src_flat = type * n_pad + sender` (and `tgt_flat` analogously).

    This removes every per-edge-type Python loop from the compute graph of
    layers whose per-edge math is type-independent given type-indexed node
    tables (GGNN, RGCN, RGAT, GNN-FiLM): one gather + one sorted
    segment-sum regardless of L. XLA graph size — and compile time — stops
    scaling with the number of edge types (22+ for VarMisuse).

    perm_by_src / perm_by_tgt sort the stream by src_flat / tgt_flat; they
    make the backward scatters of the corresponding gathers sorted
    segment-sums (see ops/edge_ops.py).
    """

    src_flat: jnp.ndarray  # [E_tot] int32; padding -> L * n_pad (clip)
    tgt_flat: jnp.ndarray  # [E_tot] int32
    receivers: jnp.ndarray  # [E_tot] int32 SORTED; padding -> n_pad
    edge_type: jnp.ndarray  # [E_tot] int32
    mask: jnp.ndarray  # [E_tot] float32
    norm_scale: jnp.ndarray  # [E_tot] float32
    perm_by_src: jnp.ndarray  # [E_tot] int32
    perm_by_tgt: jnp.ndarray  # [E_tot] int32
    # Rank compression for the streaming rank-table kernels
    # (ops/ranked_segment.py): rcv_rank[e] = rank of receivers[e] among the
    # distinct receivers of the stream (gap-free, nondecreasing; padded
    # edges share the final dump rank). node_to_rank / node_has_incoming
    # live on GraphBatch. tgt_rank is the FINE variant: rank among distinct
    # (receiver, type) stream groups — gap-free and nondecreasing because
    # the stable receiver sort keeps equal (receiver, type) pairs adjacent.
    # Used where per-edge constants depend on (target, type), e.g. the
    # fused GNN-FiLM gamma/beta tables.
    rcv_rank: jnp.ndarray  # [E_tot] int32
    tgt_rank: jnp.ndarray  # [E_tot] int32
    # Ranks of the PERMUTED streams, for streaming gather VJPs: the
    # backward of a src/tgt-side gather is a segment-sum over the sorted
    # permutation of the cotangent; these gap-free group ranks (plus the
    # node-table -> rank maps below, -1 = no edges) let that scatter run
    # through the rank-table kernel instead of XLA's scatter lowering.
    src_sorted_rank: jnp.ndarray = None  # [E_tot] int32 (by perm_by_src)
    src_to_rank: jnp.ndarray = None  # [L * n_pad] int32
    tgt_sorted_rank: jnp.ndarray = None  # [E_tot] int32 (by perm_by_tgt)
    tgt_to_rank: jnp.ndarray = None  # [L * n_pad] int32
    # Shape-encoded static rank-window bounds for the streaming kernels
    # (ops/ranked_segment.py `win`): tiny zero arrays whose LENGTH is the
    # host-measured max aligned rank span of any 256-edge sub-block,
    # bucketed to powers of two (shape-stable across batches of a fold).
    # Length 1 = no useful window (kernels fall back to BE + 8). Encoding
    # the bound in a shape keeps it jit-static while riding the pytree.
    # win_fine covers tgt_rank AND rcv_rank (coarse spans are <= fine);
    # win_src / win_tgt cover the permuted-stream ranks (gather VJPs).
    win_fine: jnp.ndarray = None  # [W] uint8 zeros
    win_src: jnp.ndarray = None  # [W] uint8 zeros
    win_tgt: jnp.ndarray = None  # [W] uint8 zeros
    # Host-precomputed fine-rank maps (edge_ops.fine_rank_to_flat /
    # fine_rank_to_receiver): computing them in-jit is an [E]-sized
    # scatter per use (~2 ms at PPI scale) for values that are static per
    # batch. Slack rows: fine_to_flat -> 0-safe clip, fine_to_rcv -> dump
    # row n_pad.
    fine_to_flat: jnp.ndarray = None  # [RPAD] int32
    fine_to_rcv: jnp.ndarray = None  # [RPAD] int32
    # Fine (receiver, type) rank of each edge of the SOURCE-sorted stream
    # (= tgt_rank[perm_by_src]); lets backward passes gather per-edge
    # receiver-side rank-table rows while iterating in source order
    # (ranked_segment.film_fused_src_pass).
    fine_rank_by_src: jnp.ndarray = None  # [E_tot] int32
    # Inverse of fine_to_flat: fine rank of each (type, receiver) slot of
    # a type-stacked node table (-1 = the slot receives no edges). Lets
    # aggregate-first layers read per-(type, node) sums out of one fine
    # rank table with a dense row take (no scatter).
    fine_from_flat: jnp.ndarray = None  # [L * n_pad] int32
    # Inverse of src_to_rank, sized to the static SRC rank-table height
    # (ranked_segment.src_rank_table_rows): flat node-table row of each
    # (type, sender) src rank, 0 for slack rows. Lets src-order backward
    # kernels build a VMEM-resident rank-ordered message table with one
    # small row take (ranked_segment.film_fused_src_pass).
    src_from_rank: jnp.ndarray = None  # [R_src] int32
    # DILUTED src-sorted stream (round 5): the REAL edges of the src
    # stream re-blocked with inert fill slots so that EVERY 256-edge
    # sub-block's aligned rank span fits a small window — low-degree
    # regions (deg-1 sources span ~256 ranks per block) otherwise zero
    # the whole stream's win_src and force the src-order backward kernels
    # onto the 8x-wider BE+8 one-hots. Fill slots repeat the previous
    # rank (keeps ranks nondecreasing + gap-free, contributes +0 to the
    # rank table) and point their fine rank at a SLACK fine row whose
    # cotangent is structurally zero, so kernels need no positional
    # masking. Slot budget: ceil(9/8 * E_tot) rounded to the kernel STEP
    # (measured dilution cost ~1.05-1.11x at PPI shapes); win_sd length-1
    # means dilution did not fit and consumers fall back to the
    # undiluted stream.
    sd_rank: jnp.ndarray = None  # [E_sd] int32
    sd_fine: jnp.ndarray = None  # [E_sd] int32 (fill -> SD_FILL)
    sd_coarse: jnp.ndarray = None  # [E_sd] int32 (fill -> SD_FILL)
    win_sd: jnp.ndarray = None  # [W] uint8 zeros
    # TYPE-MAJOR stream view: the same edges in per-type-block order (the
    # pre-receiver-sort concatenation of the canonical EdgeBlocks). Within
    # this order the per-type segments are CONTIGUOUS with static offsets
    # (the padded e_pads), so per-edge TYPE-DEPENDENT dense stages run as
    # L full-size MXU matmuls on static slices instead of L type-masked
    # matmuls per block (L-fold FLOPs) — the GNN-Edge-MLP1 hot path.
    # tm_rank are the gap-free nondecreasing (type, receiver) group ranks
    # of this order (each type's padded edges form their own dump group);
    # tm_to_flat / tm_from_flat / tm_to_rcv mirror the fine-rank maps.
    # The src-SORTED stream of this view has the same ascending values as
    # the receiver-major view's, so src_sorted_rank / src_to_rank /
    # win_src above are shared; only the permutation differs.
    # SELF-LOOP types (every real edge has sender == receiver, e.g. the
    # PPI/QM9/citation self-loop edge type) are excluded from this view's
    # windows and node combine: their per-(receiver, type) groups have
    # degree ~1, which makes rank windows as wide as the edge block (the
    # streaming kernels' one-hots would grow 8x), while their messages
    # are pure NODE functions computable as dense [N, D] math with a
    # per-node multiplicity factor (typed_incoming_counts). tm_self[l]
    # is a shape-encoded static flag (length 2 = self-loop type, 1 =
    # streamed); self types' tm_from_flat slots are -1 and their rank
    # rows map to the dump receiver, so stream-side garbage on their
    # rows can never reach real nodes.
    tm_src_flat: jnp.ndarray = None  # [E_tot] int32
    tm_rank: jnp.ndarray = None  # [E_tot] int32
    tm_perm_by_src: jnp.ndarray = None  # [E_tot] int32
    # tm_rank of each SRC-SORTED edge (= tm_rank[tm_perm_by_src]): lets
    # src-order backward passes gather per-edge (receiver, type)-keyed
    # rows while streaming in source order (ranked_segment.emlp1_tm_pass).
    tm_rank_by_src: jnp.ndarray = None  # [E_tot] int32
    tm_to_flat: jnp.ndarray = None  # [RPAD] int32
    tm_from_flat: jnp.ndarray = None  # [L * n_pad] int32
    tm_to_rcv: jnp.ndarray = None  # [RPAD] int32
    win_tm: jnp.ndarray = None  # [W] uint8 zeros (shape-encoded window)
    tm_self: Tuple = None  # L x [1 or 2] uint8 zeros (shape-encoded flag)


class GraphBatch(NamedTuple):
    """A batch of disconnected graphs packed into one padded mega-graph.

    Carries the same information as the reference's batch contract
    (tasks/sparse_graph_task.py:120-131 plus the per-task
    `graph_nodes_list`), in static shapes.
    """

    node_features: jnp.ndarray  # [N, F] float32; padding rows -> 0
    node_mask: jnp.ndarray  # [N] float32; 1.0 = real node
    node_graph_ids: jnp.ndarray  # [N] int32 in [0, G]; padding -> G (dump)
    edges: Tuple[EdgeBlock, ...]  # L static-length tuple
    flat: FlatEdges  # all edges, globally receiver-sorted
    node_to_rank: jnp.ndarray  # [N] int32: rank of node in flat stream
    node_has_incoming: jnp.ndarray  # [N] float32: 1.0 if any real in-edge
    typed_incoming_counts: jnp.ndarray  # [L, N] float32 (c_{v,l})
    graph_mask: jnp.ndarray  # [G] float32; 1.0 = real graph
    num_graphs: jnp.ndarray  # [] int32, real graph count
    num_nodes: jnp.ndarray  # [] int32, real node count
    # Optional per-type dense adjacency matrices [L x [N, N]], populated
    # (on device, inside jit) once per forward pass by the model runtime
    # when the dense-MXU aggregation strategy applies — hoists the
    # scatter-build out of the per-layer loop. None on host-built batches.
    dense_adj: Any = None

    @property
    def n_pad(self) -> int:
        return self.node_features.shape[0]

    @property
    def g_pad(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_edge_types(self) -> int:
        return len(self.edges)


def rank_window(ranks: np.ndarray, block: int = 256) -> int:
    """Max aligned rank span of any `block`-edge sub-block, bucketed.

    The streaming kernels (ops/ranked_segment.py) process the stream in
    `block`-edge sub-blocks and build one-hot matrices of height `win`
    against the window [first_rank & ~7, first_rank & ~7 + win). This
    measures the smallest safe `win` for gap-free nondecreasing `ranks`
    and rounds it to a power of two in [16, 128] so batches of a fold
    share compiled shapes; spans beyond 128 return 0 (no useful window —
    kernels use the data-independent bound block + 8)."""
    e = int(ranks.shape[0])
    if e == 0:
        return 16
    span = 0
    for s in range(0, e, block):
        blk = ranks[s:s + block]
        span = max(span, int(blk[-1]) - (int(blk[0]) & ~7) + 1)
    for cand in (16, 32, 64, 128):
        if span <= cand:
            return cand
    return 0


def _rank_window_masked(ranks: np.ndarray, relevant: np.ndarray,
                        block: int = 256) -> int:
    """rank_window over only the blocks containing any `relevant` edge
    (see FlatEdges.tm_self: pure self-loop blocks are exempt from the
    window bound because their rows never reach real nodes)."""
    e = int(ranks.shape[0])
    if e == 0:
        return 16
    span = 0
    for s in range(0, e, block):
        if not relevant[s:s + block].any():
            continue
        blk = ranks[s:s + block]
        span = max(span, int(blk[-1]) - (int(blk[0]) & ~7) + 1)
    for cand in (16, 32, 64, 128):
        if span <= cand:
            return cand
    return 0


def _win_token(win: int) -> np.ndarray:
    return np.zeros((win if win else 1,), dtype=np.uint8)


# Fill-slot sentinel for diluted companion arrays: consumers clamp
# indices with jnp.minimum(idx, rows - 1) or mode="clip", landing fill
# slots on the LAST row of whatever table they key — a slack row whose
# cotangent is structurally zero for every consumer table.
SD_FILL = np.int32(2**31 - 1)


def _dilute_src_stream(ranks_real: np.ndarray, companions, cap: int,
                       block: int = 256):
    """Re-block a sorted gap-free rank stream with inert fill slots so
    every `block`-edge sub-block's aligned span fits the smallest
    W in {32, 64, 128} within the `cap` slot budget (see
    FlatEdges.sd_rank). Returns (sd_rank, [sd_companions], W) of length
    exactly `cap`, or None if no W fits. Fill slots repeat the previous
    rank and carry SD_FILL in every companion array (per-edge values
    gathered alongside the stream — fine/coarse ranks etc.)."""
    e = int(ranks_real.shape[0])
    if e == 0 or cap < block:
        return None
    for W in (32, 64, 128):
        # One vectorized searchsorted: limit[i] = first index whose rank
        # falls outside the aligned window starting at ranks[i] (a
        # per-block scalar call here measured 170 us each — numpy casts
        # the whole array per mixed-dtype call — ~1 s/batch of pure
        # packing overhead at VarMisuse scale).
        limit = np.searchsorted(
            ranks_real, (ranks_real & ~np.int32(7)) + np.int32(W),
            side="left",
        )
        pieces = []
        i = 0
        n_blocks = 0
        ok = True
        while i < e:
            take = min(block, int(limit[i]) - i)
            assert take >= 1
            pieces.append((i, take))
            i += take
            n_blocks += 1
            if n_blocks * block > cap:
                ok = False
                break
        if not ok:
            continue
        sd_rank = np.empty((cap,), np.int32)
        sd_comp = [np.full((cap,), SD_FILL, np.int32) for _ in companions]
        pos = 0
        for i0, take in pieces:
            sd_rank[pos:pos + take] = ranks_real[i0:i0 + take]
            for arr, comp in zip(sd_comp, companions):
                arr[pos:pos + take] = comp[i0:i0 + take]
            sd_rank[pos + take:pos + block] = ranks_real[i0 + take - 1]
            pos += block
        sd_rank[pos:] = ranks_real[e - 1]
        return sd_rank, sd_comp, W
    return None


def _merge_windows(a: int, b: int) -> int:
    """Combine two window bounds: 0 (no window) dominates."""
    return max(a, b) if (a and b) else 0


def unify_flat_windows(flats: Sequence["FlatEdges"]):
    """Common win_* tokens for a set of FlatEdges that must share one
    pytree shape (stacked epochs / data-parallel groups). Enlarging a
    window is always safe for the streaming kernels; if any stream has no
    useful window (length-1 token), all fall back together. Returns the
    input list when tokens are absent or already uniform."""
    if not flats or getattr(flats[0], "win_fine", None) is None:
        return list(flats)

    def merged(field) -> np.ndarray:
        toks = [getattr(f, field) for f in flats]
        if any(t is None or int(t.shape[0]) < 16 for t in toks):
            return _win_token(0)
        return _win_token(max(int(t.shape[0]) for t in toks))

    fields = ["win_fine", "win_src", "win_tgt"]
    if getattr(flats[0], "win_tm", None) is not None:
        fields.append("win_tm")
    # win_sd: enlarging is safe (every diluted block's span fits its own
    # measured W <= the max); any fallback batch (length-1 token) pulls
    # the whole set back to the undiluted path.
    if getattr(flats[0], "win_sd", None) is not None:
        fields.append("win_sd")
    new = {f: merged(f) for f in fields}

    # sd ARRAY lengths must also agree to stack: the per-batch cap is
    # 1.03x that batch's edge total, so a fold's buckets carry different
    # sd lengths (and the fine-window gate can zero some out entirely).
    # When EVERY batch has an engaged diluted stream, extend the shorter
    # ones to the common cap with inert fill slots — appended slots
    # repeat the last rank (block span 1 <= any W) and key slack rows
    # via SD_FILL, so the merged win_sd stays engaged for the group.
    # Only when some batch has no sd window (fine-window gate, or no W
    # fit its cap) does the group rebuild as the UNDILUTED fallback
    # (win_sd token 0 — consumers ignore the arrays).
    sd_fix = {}
    if getattr(flats[0], "sd_rank", None) is not None:
        lens = {int(f.sd_rank.shape[0]) for f in flats}
        if len(lens) > 1:
            cap = max(lens)
            all_diluted = all(
                f.win_sd is not None and int(f.win_sd.shape[0]) >= 16
                for f in flats
            )
            for i, f in enumerate(flats):
                cur = int(f.sd_rank.shape[0])
                if cur == cap:
                    continue
                sd_rank = np.zeros((cap,), np.int32)
                sd_fine = np.full((cap,), SD_FILL, np.int32)
                sd_coarse = np.full((cap,), SD_FILL, np.int32)
                if all_diluted:
                    # cur >= 1 block here: an engaged window implies
                    # dilution succeeded, which requires cap_sd > 0.
                    sd_rank[:cur] = np.asarray(f.sd_rank)
                    sd_rank[cur:] = sd_rank[cur - 1]
                    sd_fine[:cur] = np.asarray(f.sd_fine)
                    sd_coarse[:cur] = np.asarray(f.sd_coarse)
                else:
                    e_tot = int(f.src_sorted_rank.shape[0])
                    if e_tot:
                        sd_rank[:e_tot] = np.asarray(f.src_sorted_rank)
                        sd_rank[e_tot:] = sd_rank[e_tot - 1]
                        sd_fine[:e_tot] = np.asarray(f.fine_rank_by_src)
                        sd_coarse[:e_tot] = np.asarray(f.rcv_rank)[
                            np.asarray(f.perm_by_src)]
                sd_fix[i] = {"sd_rank": sd_rank, "sd_fine": sd_fine,
                             "sd_coarse": sd_coarse}
            if not all_diluted:
                new["win_sd"] = _win_token(0)

    if not sd_fix and all(
        getattr(f, k) is not None and getattr(f, k).shape == v.shape
        for f in flats for k, v in new.items()
    ):
        return list(flats)
    return [f._replace(**new, **sd_fix.get(i, {}))
            for i, f in enumerate(flats)]


def token_window(token) -> int:
    """Decode a shape-encoded window token (None / length-1 => 0)."""
    if token is None:
        return 0
    w = int(token.shape[0])
    return w if w >= 16 else 0


def bucket_size(n: int, min_size: int = 128, buckets_per_octave: int = 4) -> int:
    """Round `n` up to a bucket boundary.

    Buckets are `buckets_per_octave` geometrically-ish spaced sizes per
    power of two, so padding waste is bounded (<= 1/buckets_per_octave)
    while the number of distinct compiled shapes stays small.
    """
    if n <= min_size:
        return min_size
    po2 = 1 << (int(n - 1).bit_length() - 1)  # largest power of two <= n-1... base
    step = max(min_size, po2 // buckets_per_octave)
    return -(-n // step) * step


def pad_graph_batch(
    node_features: np.ndarray,
    adjacency_lists: Sequence[np.ndarray],
    node_graph_ids: np.ndarray,
    num_graphs: int,
    *,
    n_pad: Optional[int] = None,
    e_pads: Optional[Sequence[int]] = None,
    g_pad: Optional[int] = None,
    typed_incoming_counts: Optional[np.ndarray] = None,
) -> GraphBatch:
    """Build a padded GraphBatch from host-side numpy arrays.

    Args:
        node_features: [n, F] real node features.
        adjacency_lists: L arrays of shape [e_l, 2] int (sender, receiver),
            exactly the reference's adjacency contract.
        node_graph_ids: [n] int graph index per node (reference:
            `graph_nodes_list`, e.g. tasks/ppi_task.py:224-226).
        num_graphs: real number of graphs in the batch.
        n_pad / e_pads / g_pad: static target sizes; default = bucketed.
        typed_incoming_counts: optional precomputed [L, n] counts; computed
            from the adjacency lists when absent (reference computes these
            during data loading, e.g. tasks/qm9_task.py:117-127).
    """
    n = int(node_features.shape[0])
    L = len(adjacency_lists)
    if n_pad is None:
        n_pad = bucket_size(n)
    assert n_pad >= n, (n_pad, n)
    if e_pads is None:
        e_pads = [bucket_size(int(a.shape[0])) for a in adjacency_lists]
    if g_pad is None:
        g_pad = bucket_size(max(int(num_graphs), 1), min_size=16)

    feats = np.zeros((n_pad, node_features.shape[1]), dtype=np.float32)
    feats[:n] = node_features
    node_mask = np.zeros((n_pad,), dtype=np.float32)
    node_mask[:n] = 1.0
    gids = np.full((n_pad,), g_pad, dtype=np.int32)
    gids[:n] = node_graph_ids

    if typed_incoming_counts is None:
        typed_incoming_counts = np.zeros((L, n), dtype=np.float32)
        for l, adj in enumerate(adjacency_lists):
            if adj.shape[0]:
                np.add.at(typed_incoming_counts[l], adj[:, 1].astype(np.int64), 1.0)
    counts = np.zeros((L, n_pad), dtype=np.float32)
    counts[:, :n] = typed_incoming_counts

    small = 1e-7  # SMALL_NUMBER (avoid circular import)
    edges = []
    for l, adj in enumerate(adjacency_lists):
        e = int(adj.shape[0])
        e_pad = int(e_pads[l])
        assert e_pad >= e, (l, e_pad, e)
        snd = np.full((e_pad,), n_pad, dtype=np.int32)
        rcv = np.full((e_pad,), n_pad, dtype=np.int32)
        msk = np.zeros((e_pad,), dtype=np.float32)
        if e:
            # Canonical order: sorted by receiver (stable), padding last.
            order = np.argsort(adj[:, 1], kind="stable")
            snd[:e] = adj[order, 0]
            rcv[:e] = adj[order, 1]
            msk[:e] = 1.0
        perm = np.argsort(snd, kind="stable").astype(np.int32)
        c = counts[l][np.minimum(rcv, n_pad - 1)] if n_pad > 0 else np.zeros(e_pad)
        norm = (msk / (c + small)).astype(np.float32)
        edges.append(EdgeBlock(senders=snd, receivers=rcv, mask=msk,
                               perm_by_sender=perm, norm_scale=norm))

    graph_mask = np.zeros((g_pad,), dtype=np.float32)
    graph_mask[:num_graphs] = 1.0

    # Flat global edge stream (see FlatEdges):
    all_snd = np.concatenate([e.senders for e in edges])
    all_rcv = np.concatenate([e.receivers for e in edges])
    all_msk = np.concatenate([e.mask for e in edges])
    all_norm = np.concatenate([e.norm_scale for e in edges])
    all_type = np.concatenate([
        np.full(e.senders.shape[0], l, dtype=np.int32)
        for l, e in enumerate(edges)
    ])
    order = np.argsort(all_rcv, kind="stable")
    src_flat = (all_type * np.int32(n_pad) + np.minimum(all_snd, n_pad - 1))
    # Padded edges must stay clippable/droppable in [0, L*n_pad]:
    src_flat = np.where(all_msk > 0, src_flat, L * n_pad).astype(np.int32)
    tgt_flat = (all_type * np.int32(n_pad) + np.minimum(all_rcv, n_pad - 1))
    tgt_flat = np.where(all_msk > 0, tgt_flat, L * n_pad).astype(np.int32)
    # Rank compression (gap-free receiver ids for the Pallas kernel):
    rcv_sorted = all_rcv[order]
    is_new = np.empty(rcv_sorted.shape[0], dtype=bool)
    if rcv_sorted.shape[0]:
        is_new[0] = True
        is_new[1:] = rcv_sorted[1:] != rcv_sorted[:-1]
    rcv_rank = np.cumsum(is_new, dtype=np.int32) - 1
    # Fine (receiver, type) group ranks: the stable sort keeps equal
    # tgt_flat values contiguous, so group boundaries are value changes.
    tgt_sorted = tgt_flat[order]
    is_new_f = np.empty(tgt_sorted.shape[0], dtype=bool)
    if tgt_sorted.shape[0]:
        is_new_f[0] = True
        is_new_f[1:] = tgt_sorted[1:] != tgt_sorted[:-1]
    tgt_rank = np.cumsum(is_new_f, dtype=np.int32) - 1
    node_to_rank = np.zeros((n_pad,), dtype=np.int32)
    node_has_incoming = np.zeros((n_pad,), dtype=np.float32)
    real = (rcv_sorted < n_pad) & is_new
    node_to_rank[rcv_sorted[real]] = rcv_rank[real]
    real_any = rcv_sorted < n_pad
    node_has_incoming[np.unique(rcv_sorted[real_any])] = 1.0

    src_in_stream = src_flat[order]
    tgt_in_stream = tgt_flat[order]
    perm_by_src = np.argsort(src_in_stream, kind="stable").astype(np.int32)
    perm_by_tgt = np.argsort(tgt_in_stream, kind="stable").astype(np.int32)

    def _sorted_ranks(sorted_vals, table_rows):
        e_tot = sorted_vals.shape[0]
        new = np.empty(e_tot, dtype=bool)
        if e_tot:
            new[0] = True
            new[1:] = sorted_vals[1:] != sorted_vals[:-1]
        ranks = np.cumsum(new, dtype=np.int32) - 1
        to_rank = np.full((table_rows,), -1, dtype=np.int32)
        firsts = sorted_vals[new]
        keep = firsts < table_rows
        to_rank[firsts[keep]] = ranks[new][keep]
        return ranks, to_rank

    src_sorted_rank, src_to_rank = _sorted_ranks(
        src_in_stream[perm_by_src], L * n_pad
    )
    tgt_sorted_rank, tgt_to_rank = _sorted_ranks(
        tgt_in_stream[perm_by_tgt], L * n_pad
    )

    # Fine-rank maps, precomputed so the jit path never scatters them
    # (mirrors edge_ops.fine_rank_to_flat / fine_rank_to_receiver):
    from .ranked_segment import fine_rank_table_rows, src_rank_table_rows

    e_tot = int(src_sorted_rank.shape[0])
    src_from_rank = np.zeros(
        (src_rank_table_rows(L * n_pad, e_tot, 256),), dtype=np.int32
    )
    if e_tot:
        svals = src_in_stream[perm_by_src]
        snew = np.empty(e_tot, dtype=bool)
        snew[0] = True
        snew[1:] = svals[1:] != svals[:-1]
        src_from_rank[src_sorted_rank[snew]] = np.minimum(
            svals[snew], L * n_pad - 1
        )

    rpad = fine_rank_table_rows(n_pad, L, int(tgt_rank.shape[0]), 256)
    fine_to_flat = np.zeros((rpad,), dtype=np.int32)
    fine_to_rcv = np.full((rpad,), n_pad, dtype=np.int32)
    fine_from_flat = np.full((L * n_pad,), -1, dtype=np.int32)
    if tgt_rank.shape[0]:
        fine_to_flat[tgt_rank[is_new_f]] = np.minimum(
            tgt_sorted[is_new_f], L * n_pad - 1
        )
        fine_to_rcv[tgt_rank[is_new_f]] = rcv_sorted[is_new_f]
        real_f = is_new_f & (tgt_sorted < L * n_pad)
        fine_from_flat[tgt_sorted[real_f]] = tgt_rank[real_f]

    # Diluted src stream (FlatEdges.sd_*): real edges are the src-sorted
    # prefix (padded edges carry the L*n_pad sentinel and sort last).
    # Shapes are uniform at the cap so batches of a fold share one pytree
    # shape whether or not dilution succeeded; win_sd length 1 marks
    # fallback.
    fine_by_src_full = (tgt_rank[perm_by_src] if e_tot
                        else np.zeros((0,), np.int32))
    coarse_by_src_full = (rcv_rank[perm_by_src] if e_tot
                          else np.zeros((0,), np.int32))
    n_real_src = int((all_msk > 0).sum())
    # Cap at 1.03x the flat stream: the sd-stream gather is ROW-rate
    # bound, so every fill row costs like a real one — measured dilution
    # needs ~1.05-1.11x the REAL edges, which the flat stream's own
    # padding slack usually absorbs; tight folds degrade to a wider W or
    # the undiluted fallback instead of paying 12% extra rows.
    # Gate on the FINE window: every sd consumer (the fused src-order
    # backwards) requires the fine/coarse ranked paths, which disengage
    # without a fine window (compressive_window) — a fold like VarMisuse
    # (deg ~2/type) would otherwise upload ~8 B/edge of dead sd weight
    # per streaming batch.
    fine_win_val = _merge_windows(rank_window(tgt_rank),
                                  rank_window(rcv_rank))
    cap_sd = (-(-103 * e_tot // (100 * 2048)) * 2048
              if (e_tot and fine_win_val) else 0)
    dil = _dilute_src_stream(
        src_sorted_rank[:n_real_src],
        [fine_by_src_full[:n_real_src], coarse_by_src_full[:n_real_src]],
        cap_sd,
    ) if e_tot else None
    if dil is not None:
        sd_rank, (sd_fine, sd_coarse), w_sd = dil
        win_sd = _win_token(w_sd)
    else:
        sd_rank = np.zeros((cap_sd,), np.int32)
        sd_fine = np.full((cap_sd,), SD_FILL, np.int32)
        sd_coarse = np.full((cap_sd,), SD_FILL, np.int32)
        if e_tot and cap_sd:
            sd_rank[:e_tot] = src_sorted_rank
            sd_rank[e_tot:] = src_sorted_rank[-1]
            sd_fine[:e_tot] = fine_by_src_full
            sd_coarse[:e_tot] = coarse_by_src_full
        win_sd = _win_token(0)

    # TYPE-MAJOR stream view (see FlatEdges.tm_*): the pre-sort
    # concatenation order. Group ranks over tgt_flat are gap-free and
    # nondecreasing because each type block is receiver-sorted with its
    # padded (dump) edges last; each type's dump edges form their own
    # group, whose rank rows map to the dump receiver n_pad and are never
    # combined into real nodes.
    e_tot_tm = int(tgt_flat.shape[0])
    tm_new = np.empty(e_tot_tm, dtype=bool)
    if e_tot_tm:
        tm_new[0] = True
        tm_new[1:] = tgt_flat[1:] != tgt_flat[:-1]
    tm_rank = np.cumsum(tm_new, dtype=np.int32) - 1
    # Static self-loop flags per type (see FlatEdges.tm_self).
    type_is_self = []
    for l, adj in enumerate(adjacency_lists):
        e = int(adj.shape[0])
        type_is_self.append(
            e > 0 and bool(np.all(adj[:, 0] == adj[:, 1]))
        )
    edge_is_self = np.concatenate([
        np.full(e.senders.shape[0], type_is_self[l], dtype=bool)
        for l, e in enumerate(edges)
    ]) if edges else np.zeros((0,), bool)
    tm_to_flat = np.zeros((rpad,), dtype=np.int32)
    tm_to_rcv = np.full((rpad,), n_pad, dtype=np.int32)
    tm_from_flat = np.full((L * n_pad,), -1, dtype=np.int32)
    if e_tot_tm:
        tm_to_flat[tm_rank[tm_new]] = np.minimum(
            tgt_flat[tm_new], L * n_pad - 1
        )
        # Self-loop types are combined node-side: their rank rows point at
        # the dump receiver and their node slots stay -1, so stream-side
        # contributions on their rows never reach real nodes.
        tm_to_rcv[tm_rank[tm_new]] = np.where(
            edge_is_self[tm_new], n_pad, all_rcv[tm_new]
        )
        real_tm = tm_new & (tgt_flat < L * n_pad) & ~edge_is_self
        tm_from_flat[tgt_flat[real_tm]] = tm_rank[real_tm]
    tm_perm_by_src = np.argsort(src_flat, kind="stable").astype(np.int32)
    # Window measured over blocks that contain any NON-self edge (pure
    # self-loop blocks never contribute real rows; mixed blocks keep the
    # honest full span so real rows stay inside the kernels' one-hots).
    tm_win = _rank_window_masked(tm_rank, ~edge_is_self)

    flat = FlatEdges(
        src_flat=src_in_stream,
        tgt_flat=tgt_in_stream,
        receivers=rcv_sorted,
        edge_type=all_type[order],
        mask=all_msk[order],
        norm_scale=all_norm[order],
        perm_by_src=perm_by_src,
        perm_by_tgt=perm_by_tgt,
        rcv_rank=rcv_rank,
        tgt_rank=tgt_rank,
        src_sorted_rank=src_sorted_rank,
        src_to_rank=src_to_rank,
        tgt_sorted_rank=tgt_sorted_rank,
        tgt_to_rank=tgt_to_rank,
        win_fine=_win_token(fine_win_val),
        win_src=_win_token(rank_window(src_sorted_rank)),
        win_tgt=_win_token(rank_window(tgt_sorted_rank)),
        sd_rank=sd_rank,
        sd_fine=sd_fine,
        sd_coarse=sd_coarse,
        win_sd=win_sd,
        fine_to_flat=fine_to_flat,
        fine_to_rcv=fine_to_rcv,
        fine_rank_by_src=tgt_rank[perm_by_src],
        fine_from_flat=fine_from_flat,
        src_from_rank=src_from_rank,
        tm_src_flat=src_flat,
        tm_rank=tm_rank,
        tm_perm_by_src=tm_perm_by_src,
        tm_rank_by_src=tm_rank[tm_perm_by_src] if e_tot_tm else tm_rank,
        tm_to_flat=tm_to_flat,
        tm_from_flat=tm_from_flat,
        tm_to_rcv=tm_to_rcv,
        win_tm=_win_token(tm_win),
        tm_self=tuple(
            np.zeros((2 if s else 1,), dtype=np.uint8)
            for s in type_is_self
        ),
    )

    return GraphBatch(
        node_features=feats,
        node_mask=node_mask,
        node_graph_ids=gids,
        edges=tuple(edges),
        flat=flat,
        node_to_rank=node_to_rank,
        node_has_incoming=node_has_incoming,
        typed_incoming_counts=counts,
        graph_mask=graph_mask,
        num_graphs=np.int32(num_graphs),
        num_nodes=np.int32(n),
    )


def batch_static_shape(batch: GraphBatch) -> Tuple:
    """Hashable static-shape signature (used to count/bucket recompiles)."""
    return (
        batch.node_features.shape,
        tuple(e.senders.shape[0] for e in batch.edges),
        batch.graph_mask.shape[0],
    )
