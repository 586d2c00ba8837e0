"""Graph parallelism: one graph batch partitioned ACROSS devices.

NEW capability (the reference is strictly single-device; a graph larger
than `max_nodes_in_batch` is simply unhandled there — SURVEY.md §5
"long-context analogue"). This module shards the mega-graph itself:

* Nodes are partitioned contiguously across the mesh axis: device p owns
  global nodes [p*Nl, (p+1)*Nl) and their states h_local [Nl, D].
* Edges live on their RECEIVER's device, so aggregation is purely local.
* Each message-passing layer all-gathers the (transform-relevant) node
  states over ICI — the graph-world analogue of ring-attention's feature
  exchange — then gathers sources from the full table and scatter-sums
  into local receivers. Communication per layer = N x D per device pair
  via one `all_gather` collective; XLA lowers it onto ICI links.
* Gradients flow through the collective (all_gather's transpose is
  reduce-scatter, inserted automatically), and optimizer updates run on
  replicated parameters after a `psum`.

Supported layer families (GP_LAYERS): ALL SEVEN — RGCN, GGNN, GNN-FiLM,
RGAT, RGIN, GNN-Edge-MLP, RGDCN (matching the reference's full surface,
gnns/__init__.py:1-7). Per-type weights stay replicated; per-edge work
scales 1/P; node-state memory scales 1/P, which is what lets a graph too
big for one chip's HBM train at all. `make_gp_task_steps` + `partition_task_batch` integrate this
with the model runtime: set model param `graph_parallel: P` (the task's
input/output models run replicated on the padded batch; only the
propagation is sharded). The halo-exchange variant (GP_HALO_LAYERS —
boundary features only, one all_to_all per layer, communication
independent of the number of edge types) covers the SAME seven families
and is selected with model param `graph_parallel_halo: true`. Both
variants carry the source-ownership edge split so local-source
aggregation has no data path from the collective (jaxpr-taint-asserted;
actual on-device overlap of the async collective with compute is
trace-unverified until real multi-chip hardware is available).
"""

from typing import Any, List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.graph import bucket_size
from ..ops.edge_ops import (
    aggregate_flat,
    gather_flat_src,
    gather_flat_tgt,
)
from ..runtime.optimizers import clip_grads_per_tensor


class GPFlatEdges(NamedTuple):
    """Per-device flat edge stream: receivers LOCAL [0, Nl], senders GLOBAL
    type-offset indices into the all-gathered [L*N, D] table. Receiver-
    sorted with a by-src permutation, as in ops.graph.FlatEdges."""

    src_flat: jnp.ndarray  # [E_dev] int32: type * N_global + global_sender
    receivers: jnp.ndarray  # [E_dev] int32 LOCAL, sorted; padding -> Nl
    tgt_flat: jnp.ndarray  # [E_dev] int32: type * N_global + global_receiver
    mask: jnp.ndarray  # [E_dev] float32
    norm_scale: jnp.ndarray  # [E_dev] float32
    perm_by_src: jnp.ndarray  # [E_dev] int32
    perm_by_tgt: jnp.ndarray  # [E_dev] int32


class GPShard(NamedTuple):
    """One device's piece of the partitioned graph (leading axis = device
    when stacked for shard_map).

    flat_local / flat_remote split the SAME edges by source ownership:
    flat_local's senders are LOCAL row indices into the device's own
    typed table (type * n_local + local_sender), so its messages and
    aggregation are structurally INDEPENDENT of the all_gather — XLA's
    async collectives (all-gather-start/done) can overlap the exchange
    with the local aggregation (SURVEY.md §5 "overlapping communication
    with local SpMM"). flat_remote carries only remote-source edges in
    the global type-offset index space."""

    node_features: jnp.ndarray  # [Nl, F]
    node_mask: jnp.ndarray  # [Nl]
    flat: GPFlatEdges
    flat_local: GPFlatEdges = None
    flat_remote: GPFlatEdges = None


def _partition_prologue(node_features, adjacency_lists, num_devices,
                        typed_incoming_counts):
    """Shared host-side prologue of both partitioners: contiguous node
    ranges, incoming-count computation, receiver-device edge assignment,
    and per-device feature/mask slices."""
    n = node_features.shape[0]
    L = len(adjacency_lists)
    n_local = bucket_size(-(-n // num_devices), min_size=8)
    n_global = n_local * num_devices

    if typed_incoming_counts is None:
        typed_incoming_counts = np.zeros((L, n), dtype=np.float32)
        for l, adj in enumerate(adjacency_lists):
            if adj.shape[0]:
                np.add.at(typed_incoming_counts[l], adj[:, 1], 1.0)

    per_dev_edges = [[] for _ in range(num_devices)]
    for l, adj in enumerate(adjacency_lists):
        if adj.shape[0] == 0:
            continue
        dev = adj[:, 1] // n_local
        for p in range(num_devices):
            sel = adj[dev == p]
            if sel.shape[0]:
                per_dev_edges[p].append((l, sel))

    feats, masks = [], []
    for p in range(num_devices):
        lo = p * n_local
        f = np.zeros((n_local, node_features.shape[1]), np.float32)
        m = np.zeros((n_local,), np.float32)
        hi = min(lo + n_local, n)
        if hi > lo:
            f[: hi - lo] = node_features[lo:hi]
            m[: hi - lo] = 1.0
        feats.append(f)
        masks.append(m)
    return (n_local, n_global, typed_incoming_counts, per_dev_edges,
            feats, masks)


def partition_graph(
    node_features: np.ndarray,
    adjacency_lists: List[np.ndarray],
    num_devices: int,
    typed_incoming_counts: np.ndarray = None,
) -> Tuple[Any, int, int]:
    """Host-side partitioner: contiguous node ranges, receiver-owned edges.

    Returns (stacked GPShard pytree with leading device axis, n_local,
    n_global). Per-device edge counts are padded to a common static size.
    """
    L = len(adjacency_lists)
    small = 1e-7
    (n_local, n_global, typed_incoming_counts, per_dev_edges,
     feats, masks) = _partition_prologue(
        node_features, adjacency_lists, num_devices, typed_incoming_counts
    )
    e_pad = bucket_size(
        max(max((sum(a.shape[0] for _, a in d) for d in per_dev_edges), default=1), 1),
        min_size=64,
    )

    def build_flat(edge_tuples, lo, src_offset, table_rows, e_pad_f):
        """Receiver-sorted GPFlatEdges from (type, adj) tuples; senders
        and targets are indexed as type * table_rows + (node - src_offset)
        (src_offset = lo for device-local table space, 0 for global)."""
        src = np.full((e_pad_f,), L * table_rows, np.int32)
        tgt = np.full((e_pad_f,), L * table_rows, np.int32)
        rcv = np.full((e_pad_f,), n_local, np.int32)
        msk = np.zeros((e_pad_f,), np.float32)
        nrm = np.zeros((e_pad_f,), np.float32)
        off = 0
        for l, adj in edge_tuples:
            k = adj.shape[0]
            if not k:
                continue
            src[off : off + k] = l * table_rows + (adj[:, 0] - src_offset)
            tgt[off : off + k] = l * table_rows + (adj[:, 1] - src_offset)
            rcv[off : off + k] = adj[:, 1] - lo
            msk[off : off + k] = 1.0
            nrm[off : off + k] = 1.0 / (
                typed_incoming_counts[l][adj[:, 1]] + small
            )
            off += k
        order = np.argsort(rcv, kind="stable")
        src, tgt, rcv, msk, nrm = (
            src[order], tgt[order], rcv[order], msk[order], nrm[order]
        )
        return GPFlatEdges(
            src_flat=src,
            receivers=rcv,
            tgt_flat=tgt,
            mask=msk,
            norm_scale=nrm,
            perm_by_src=np.argsort(src, kind="stable").astype(np.int32),
            perm_by_tgt=np.argsort(tgt, kind="stable").astype(np.int32),
        )

    shards = []
    for p in range(num_devices):
        lo = p * n_local
        flat = build_flat(per_dev_edges[p], lo, 0, n_global, e_pad)
        # Source-ownership split for communication/compute overlap: the
        # local stream indexes the device's OWN typed table.
        loc_tuples, rem_tuples = [], []
        for l, adj in per_dev_edges[p]:
            is_local = (adj[:, 0] >= lo) & (adj[:, 0] < lo + n_local)
            if is_local.any():
                loc_tuples.append((l, adj[is_local]))
            if (~is_local).any():
                rem_tuples.append((l, adj[~is_local]))
        flat_local = build_flat(loc_tuples, lo, lo, n_local, e_pad)
        flat_remote = build_flat(rem_tuples, lo, 0, n_global, e_pad)
        shards.append(GPShard(
            node_features=feats[p], node_mask=masks[p], flat=flat,
            flat_local=flat_local, flat_remote=flat_remote,
        ))
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *shards)
    return stacked, n_local, n_global


def gp_rgcn_layer(
    W, shard: GPShard, h_local, axis_name: str,
    activation_fn, normalize: bool = True,
):
    """One RGCN layer over the partition: transform locally, all-gather the
    typed transforms over ICI, gather + sorted-scatter locally.

    h_local: [Nl, D]. W: [L, D, D]. Returns [Nl, D].
    """
    n_local = h_local.shape[0]
    # Local typed transform [L, Nl, D] -> all-gather -> [L, N, D]:
    t_local = jnp.einsum("nd,lde->lne", h_local, W,
                         preferred_element_type=jnp.float32)
    t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
    L, n_global, D = t_full.shape
    table = t_full.reshape(L * n_global, D)

    flat = shard.flat
    msgs = gather_flat_src(table, flat)
    if normalize:
        msgs = msgs * shard.flat.norm_scale[:, None]
    agg = aggregate_flat(msgs, flat, n_local, "sum")
    return activation_fn(agg)


def gp_film_layer(W, W_film, ln_params, shard: GPShard, h_local,
                  axis_name: str, activation_fn):
    """One GNN-FiLM layer over the partition (flagship model family)."""
    from ..nn.normalization import layer_norm
    from ..ops.edge_ops import gather_flat_tgt

    n_local = h_local.shape[0]
    d = h_local.shape[-1]
    t_local = jnp.einsum("nd,lde->lne", h_local, W,
                         preferred_element_type=jnp.float32)
    film_local = jnp.einsum("nd,lde->lne", h_local, W_film,
                            preferred_element_type=jnp.float32)
    t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
    film_full = jax.lax.all_gather(film_local, axis_name, axis=1, tiled=True)
    L, n_global, D = t_full.shape

    flat = shard.flat
    m = gather_flat_src(t_full.reshape(L * n_global, D), flat)
    gb = gather_flat_tgt(film_full.reshape(L * n_global, 2 * d), flat)
    gamma, beta = gb[:, :d], gb[:, d:]
    msgs = activation_fn(gamma * m + beta)
    agg = aggregate_flat(msgs, flat, n_local, "sum")
    return layer_norm(ln_params, agg)


def make_gp_forward(layer_name: str, num_layers: int, axis_name: str = "gp",
                    residual_every: int = 10000, inter_layer_norm: bool = False):
    """Build a sharded multi-layer propagation fn(params, shard, feats) ->
    final local node representations, for use inside shard_map.

    Mirrors the single-device propagation stack's residual-averaging and
    inter-layer LayerNorm (models/sparse_graph_model.py:180-193) — both are
    per-node elementwise, so they apply to the local shard unchanged.
    """
    import jax.nn as jnn

    from ..nn.normalization import layer_norm

    def forward(layer_params_list, shard, h_local):
        last_residual = jnp.zeros_like(h_local)
        for i, lp in enumerate(layer_params_list):
            if i % residual_every == 0:
                t = h_local
                if i > 0:
                    h_local = (h_local + last_residual) / 2.0
                last_residual = t
            if layer_name == "rgcn":
                h_local = gp_rgcn_layer(
                    lp["W"], shard, h_local, axis_name, jnn.relu
                )
            elif layer_name == "gnn_film":
                h_local = gp_film_layer(
                    lp["W"], lp["W_film"], lp["ln"], shard, h_local,
                    axis_name, jnn.relu,
                )
            else:
                raise ValueError(
                    "graph parallelism supports rgcn/gnn_film, got %s"
                    % layer_name
                )
            if inter_layer_norm and "inter_ln" in lp:
                h_local = layer_norm(lp["inter_ln"], h_local)
        return h_local

    return forward


def make_gp_train_step(
    layer_name: str,
    num_layers: int,
    num_labels: int,
    optimizer,
    clip_norm: float,
    mesh: Mesh,
    axis_name: str = "gp",
    residual_every: int = 10000,
    inter_layer_norm: bool = False,
):
    """Jitted graph-parallel train step for a node-level sigmoid-CE head
    (PPI-style): node states and edges sharded over `axis_name`, params
    replicated, gradient psum.

    step(params, opt_state, stacked_shard, labels_sharded, lr) ->
    (params, opt_state, loss)
    """
    forward = make_gp_forward(layer_name, num_layers, axis_name,
                              residual_every=residual_every,
                              inter_layer_norm=inter_layer_norm)

    def per_device(params, opt_state, shard: GPShard, labels, lr):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        labels = labels[0]

        def loss_fn(p):
            h = jnp.dot(shard.node_features, p["proj"],
                        preferred_element_type=jnp.float32)
            h = forward(p["layers"], shard, h)
            logits = jnp.dot(h, p["out"], preferred_element_type=jnp.float32)
            per_elem = (jnp.maximum(logits, 0) - logits * labels
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            local = jnp.sum(per_elem * shard.node_mask[:, None])
            total = jax.lax.psum(local, axis_name)
            n = jax.lax.psum(jnp.sum(shard.node_mask), axis_name)
            return total / jnp.maximum(n, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # loss_fn already psums -> grads are replicated-consistent; still
        # pmean to wash out float non-determinism across devices:
        grads = jax.lax.pmean(grads, axis_name)
        grads = clip_grads_per_tensor(grads, clip_norm)
        new_params, new_opt_state = optimizer.update(
            grads, opt_state, params, lr
        )
        return new_params, new_opt_state, loss

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Halo-exchange variant: communicate only boundary node features
# ---------------------------------------------------------------------------


class GPHaloShard(NamedTuple):
    """Per-device piece for the halo-exchange strategy. Edge senders index
    an EXTENDED local table [n_local + P * halo_pad] = own rows followed by
    the all_to_all receive buffer (grouped by source device); the exchange
    moves only boundary features — P * halo_pad * D per layer instead of
    the all-gather's L * N * D.

    flat_local / flat_remote split the same edges by source ownership (the
    GPShard overlap structure): flat_local's senders index the device's
    OWN table (type * n_local + local_sender) and its targets the local
    table — no data path from the all_to_all, so XLA overlaps the boundary
    exchange with the local-source message work. flat_remote's senders
    index the HALO receive buffer (type * (P * halo_pad) + halo_slot); its
    targets are still in LOCAL table space (receivers always local)."""

    node_features: jnp.ndarray  # [Nl, F]
    node_mask: jnp.ndarray  # [Nl]
    send_idx: jnp.ndarray  # [P, halo_pad] int32 local rows to send to each dst
    src_ext: jnp.ndarray  # [E_dev] int32: type * n_ext + extended-sender-index
    receivers: jnp.ndarray  # [E_dev] int32 LOCAL, sorted; padding -> Nl
    mask: jnp.ndarray  # [E_dev]
    norm_scale: jnp.ndarray  # [E_dev]
    perm_by_src: jnp.ndarray  # [E_dev]
    perm_by_tgt: jnp.ndarray  # [E_dev] (receivers are sorted; identity ok)
    tgt_flat: jnp.ndarray  # [E_dev] int32: type * n_ext + local receiver
    flat_local: GPFlatEdges = None  # senders AND targets in local space
    flat_remote: GPFlatEdges = None  # senders in halo space, targets local


def partition_graph_halo(node_features, adjacency_lists, num_devices,
                         typed_incoming_counts=None, e_pad=None,
                         halo_pad=None):
    """Partition with per-pair halo lists (static halo_pad = max boundary
    set over device pairs, bucketed; both pads overridable for fold-static
    shapes, see partition_task_batch_halo)."""
    L = len(adjacency_lists)
    small = 1e-7
    (n_local, n_global, typed_incoming_counts, per_dev_edges,
     feats, masks) = _partition_prologue(
        node_features, adjacency_lists, num_devices, typed_incoming_counts
    )

    # Boundary (remote-sender) sets per (receiving q, owning p) pair:
    need = [[np.zeros(0, np.int64) for _ in range(num_devices)]
            for _ in range(num_devices)]
    for q in range(num_devices):
        snds = np.concatenate(
            [a[:, 0] for _, a in per_dev_edges[q]]
        ) if per_dev_edges[q] else np.zeros(0, np.int64)
        src_dev = snds // n_local
        for p in range(num_devices):
            if p == q:
                continue
            need[q][p] = np.unique(snds[src_dev == p])

    if halo_pad is None:
        halo_pad = bucket_size(
            max(max((len(need[q][p]) for q in range(num_devices)
                     for p in range(num_devices)), default=1), 1),
            min_size=8,
        )
    if e_pad is None:
        e_pad = bucket_size(
            max(max((sum(a.shape[0] for _, a in d) for d in per_dev_edges),
                    default=1), 1),
            min_size=64,
        )
    n_ext = n_local + num_devices * halo_pad
    n_halo = num_devices * halo_pad

    shards = []
    for q in range(num_devices):
        lo = q * n_local
        # What THIS device sends to each destination d = need[d][q]:
        send_idx = np.zeros((num_devices, halo_pad), np.int32)
        for d in range(num_devices):
            if d == q:
                continue
            lst = need[d][q] - lo
            send_idx[d, : len(lst)] = lst

        src = np.full((e_pad,), L * n_ext, np.int32)
        tgt = np.full((e_pad,), L * n_ext, np.int32)
        rcv = np.full((e_pad,), n_local, np.int32)
        msk = np.zeros((e_pad,), np.float32)
        nrm = np.zeros((e_pad,), np.float32)
        off = 0
        loc_tuples, rem_tuples = [], []
        for l, adj in per_dev_edges[q]:
            k = adj.shape[0]
            loc = adj[:, 0] - lo
            src_dev = adj[:, 0] // n_local
            is_local = src_dev == q
            # Vectorized extended-index mapping: need[q][p] is sorted, so a
            # remote sender's halo slot is its searchsorted position.
            ext = loc.astype(np.int64).copy()
            for pdev in range(num_devices):
                if pdev == q or len(need[q][pdev]) == 0:
                    continue
                sel = src_dev == pdev
                if not sel.any():
                    continue
                pos = np.searchsorted(need[q][pdev], adj[sel, 0])
                ext[sel] = n_local + pdev * halo_pad + pos
            src[off:off + k] = l * n_ext + ext
            tgt[off:off + k] = l * n_ext + (adj[:, 1] - lo)
            rcv[off:off + k] = adj[:, 1] - lo
            msk[off:off + k] = 1.0
            nrm[off:off + k] = 1.0 / (typed_incoming_counts[l][adj[:, 1]] + small)
            off += k
            # Source-ownership split (overlap structure): local senders in
            # LOCAL table space, remote senders in HALO-buffer space.
            if is_local.any():
                loc_tuples.append((
                    l, loc[is_local], adj[is_local, 1] - lo,
                    1.0 / (typed_incoming_counts[l][adj[is_local, 1]] + small),
                ))
            if (~is_local).any():
                rem_tuples.append((
                    l, ext[~is_local] - n_local, adj[~is_local, 1] - lo,
                    1.0 / (typed_incoming_counts[l][adj[~is_local, 1]] + small),
                ))
        order = np.argsort(rcv, kind="stable")
        src, tgt, rcv, msk, nrm = (
            src[order], tgt[order], rcv[order], msk[order], nrm[order]
        )

        def build_split(tuples, src_rows):
            s = np.full((e_pad,), L * src_rows, np.int32)
            t = np.full((e_pad,), L * n_local, np.int32)
            r = np.full((e_pad,), n_local, np.int32)
            m = np.zeros((e_pad,), np.float32)
            nr = np.zeros((e_pad,), np.float32)
            o = 0
            for l, senders, receivers, norms in tuples:
                k2 = len(senders)
                s[o:o + k2] = l * src_rows + senders
                t[o:o + k2] = l * n_local + receivers
                r[o:o + k2] = receivers
                m[o:o + k2] = 1.0
                nr[o:o + k2] = norms
                o += k2
            ordr = np.argsort(r, kind="stable")
            s, t, r, m, nr = s[ordr], t[ordr], r[ordr], m[ordr], nr[ordr]
            return GPFlatEdges(
                src_flat=s, receivers=r, tgt_flat=t, mask=m, norm_scale=nr,
                perm_by_src=np.argsort(s, kind="stable").astype(np.int32),
                perm_by_tgt=np.argsort(t, kind="stable").astype(np.int32),
            )

        shards.append(GPHaloShard(
            node_features=feats[q], node_mask=masks[q], send_idx=send_idx,
            src_ext=src, receivers=rcv, mask=msk, norm_scale=nrm,
            perm_by_src=np.argsort(src, kind="stable").astype(np.int32),
            perm_by_tgt=np.argsort(tgt, kind="stable").astype(np.int32),
            tgt_flat=tgt,
            flat_local=build_split(loc_tuples, n_local),
            flat_remote=build_split(rem_tuples, n_halo),
        ))
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *shards)
    return stacked, n_local, n_global, halo_pad


class _HaloFlat(NamedTuple):
    """FlatEdges-shaped view of a GPHaloShard's edge stream (src indices in
    extended-table space)."""

    src_flat: Any
    tgt_flat: Any
    receivers: Any
    edge_type: Any
    mask: Any
    norm_scale: Any
    perm_by_src: Any
    perm_by_tgt: Any


def _halo_exchange(shard: GPHaloShard, h_local, axis_name: str):
    """Extended node table: own rows + boundary rows from every peer,
    moved with ONE all_to_all of [P, halo_pad, D] over ICI."""
    send = jnp.take(h_local, shard.send_idx, axis=0)  # [P, halo_pad, D]
    halo = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=False
    )  # [P, halo_pad, D] grouped by source device
    return jnp.concatenate(
        [h_local, halo.reshape(-1, h_local.shape[-1])], axis=0
    )  # [n_ext, D]


def gp_halo_rgcn_layer(W, shard: GPHaloShard, h_local, axis_name: str,
                       activation_fn, normalize: bool = True):
    """RGCN layer over the halo partition: exchange boundary features
    (P * halo_pad * D), transform the extended table locally, gather +
    sorted-scatter into local receivers. Communication is independent of
    the number of edge types, unlike the all-gather variant."""
    n_local = h_local.shape[0]
    ext = _halo_exchange(shard, h_local, axis_name)
    t = jnp.einsum("nd,lde->lne", ext, W, preferred_element_type=jnp.float32)
    L, n_ext, D = t.shape
    flat = _HaloFlat(
        src_flat=shard.src_ext, tgt_flat=shard.tgt_flat,
        receivers=shard.receivers, edge_type=None, mask=shard.mask,
        norm_scale=shard.norm_scale, perm_by_src=shard.perm_by_src,
        perm_by_tgt=shard.perm_by_tgt,
    )
    msgs = gather_flat_src(t.reshape(L * n_ext, D), flat)
    if normalize:
        msgs = msgs * shard.norm_scale[:, None]
    agg = aggregate_flat(msgs, flat, n_local, "sum")
    return activation_fn(agg)


# ---------------------------------------------------------------------------
# First-class runtime integration: the full layer zoo over GP shards, a
# propagation mirror, and task-generic train/eval steps driven by the
# model's own parameter tree (so checkpoints / restore / the CLI work
# unchanged with `graph_parallel: P`).
# ---------------------------------------------------------------------------


def gp_ggnn_layer(gnn_params, shard: GPShard, h_local, axis_name: str,
                  *, num_timesteps=1, gated_unit_type="gru",
                  activation_function="tanh",
                  message_aggregation_function="sum", **_):
    """GGNN over the partition: messages from the all-gathered typed
    transform table; the RNN cell update is per-node and purely local
    (reference semantics: gnns/ggnn.py:92 — messages as cell INPUT)."""
    from ..nn.cells import cell_apply

    n_local = h_local.shape[0]
    c = None
    for _ in range(num_timesteps):
        t_local = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                             preferred_element_type=jnp.float32)
        t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
        L, n_global, D = t_full.shape
        if _overlap_split_ok(shard):
            fl, fr = shard.flat_local, shard.flat_remote
            msgs_loc = gather_flat_src(t_local.reshape(L * n_local, D), fl)
            msgs_rem = gather_flat_src(t_full.reshape(L * n_global, D), fr)
            agg = _aggregate_split(msgs_loc, fl, msgs_rem, fr, n_local,
                                   message_aggregation_function)
        else:
            msgs = gather_flat_src(t_full.reshape(L * n_global, D),
                                   shard.flat)
            agg = aggregate_flat(msgs, shard.flat, n_local,
                                 message_aggregation_function)
        h_local, c = cell_apply(gnn_params["cell"], gated_unit_type, agg,
                                h_local, activation_function, c)
    return h_local


def _overlap_split_ok(shard: GPShard) -> bool:
    return (getattr(shard, "flat_local", None) is not None
            and getattr(shard, "flat_remote", None) is not None)


def _aggregate_split(msgs_loc, flat_loc, msgs_rem, flat_rem, n_local,
                     aggregation: str):
    """Combine aggregations over the local-source and remote-source edge
    streams into one per-receiver result (each stream holds a disjoint
    subset of the device's incoming edges)."""
    if aggregation in ("sum", "unsorted_segment_sum"):
        return (aggregate_flat(msgs_loc, flat_loc, n_local, "sum")
                + aggregate_flat(msgs_rem, flat_rem, n_local, "sum"))
    if aggregation in ("mean", "unsorted_segment_mean",
                       "sqrt_n", "unsorted_segment_sqrt_n"):
        total = (aggregate_flat(msgs_loc, flat_loc, n_local, "sum")
                 + aggregate_flat(msgs_rem, flat_rem, n_local, "sum"))
        count = (
            jax.ops.segment_sum(flat_loc.mask, flat_loc.receivers,
                                n_local + 1, indices_are_sorted=True)
            + jax.ops.segment_sum(flat_rem.mask, flat_rem.receivers,
                                  n_local + 1, indices_are_sorted=True)
        )[:n_local]
        count = jnp.maximum(count, 1.0)
        if aggregation.endswith("sqrt_n"):
            count = jnp.sqrt(count)
        return total / count[:, None]
    # max: empty partial segments land at dtype min on both sides.
    return jnp.maximum(
        aggregate_flat(msgs_loc, flat_loc, n_local, aggregation),
        aggregate_flat(msgs_rem, flat_rem, n_local, aggregation),
    )


def gp_rgcn_layer_kw(gnn_params, shard: GPShard, h_local, axis_name: str,
                     *, num_timesteps=1, activation_function="tanh",
                     message_aggregation_function="sum",
                     normalize_by_num_incoming=True,
                     use_both_source_and_target=False, **_):
    """RGCN over the partition with the full layer-kwarg surface
    (reference: gnns/rgcn.py:8-115).

    When the shard carries the source-ownership edge split, messages from
    LOCALLY-owned senders are gathered from the device's own typed table
    and aggregated with no data dependency on the all_gather — XLA's
    async collective (all-gather-start/done) overlaps the ICI exchange
    with the local aggregation; only the remote-source edges wait."""
    from ..nn.activations import get_activation
    from ..ops.edge_ops import gather_flat_tgt

    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    d = h_local.shape[-1]
    W = gnn_params["W"]
    for _ in range(num_timesteps):
        if use_both_source_and_target:
            t_src = jnp.einsum("nd,lde->lne", h_local, W[:, :d, :],
                               preferred_element_type=jnp.float32)
            t_tgt = jnp.einsum("nd,lde->lne", h_local, W[:, d:, :],
                               preferred_element_type=jnp.float32)
            src_full = jax.lax.all_gather(t_src, axis_name, axis=1, tiled=True)
            tgt_full = jax.lax.all_gather(t_tgt, axis_name, axis=1, tiled=True)
            L, n_global, D = src_full.shape
            msgs = (
                gather_flat_src(src_full.reshape(L * n_global, D), shard.flat)
                + gather_flat_tgt(tgt_full.reshape(L * n_global, D), shard.flat)
            )
            if normalize_by_num_incoming:
                msgs = msgs * shard.flat.norm_scale[:, None]
            h_local = act(aggregate_flat(msgs, shard.flat, n_local,
                                         message_aggregation_function))
            continue
        t_local = jnp.einsum("nd,lde->lne", h_local, W,
                             preferred_element_type=jnp.float32)
        t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
        L, n_global, D = t_full.shape
        if _overlap_split_ok(shard):
            fl, fr = shard.flat_local, shard.flat_remote
            msgs_loc = gather_flat_src(
                t_local.reshape(L * n_local, D), fl
            )
            msgs_rem = gather_flat_src(
                t_full.reshape(L * n_global, D), fr
            )
            if normalize_by_num_incoming:
                msgs_loc = msgs_loc * fl.norm_scale[:, None]
                msgs_rem = msgs_rem * fr.norm_scale[:, None]
            h_local = act(_aggregate_split(
                msgs_loc, fl, msgs_rem, fr, n_local,
                message_aggregation_function,
            ))
            continue
        msgs = gather_flat_src(t_full.reshape(L * n_global, D), shard.flat)
        if normalize_by_num_incoming:
            msgs = msgs * shard.flat.norm_scale[:, None]
        h_local = act(aggregate_flat(msgs, shard.flat, n_local,
                                     message_aggregation_function))
    return h_local


def gp_rgat_layer(gnn_params, shard: GPShard, h_local, axis_name: str,
                  *, num_timesteps=1, num_heads=4,
                  activation_function="tanh", **_):
    """RGAT over the partition: attention logits from node-sided halves of
    the all-gathered tables; the per-(receiver, head) segment softmax is
    local because edges live on their receiver's device (reference
    semantics: gnns/rgat.py:95-138)."""
    from ..nn.activations import get_activation
    from ..ops.edge_ops import aggregate_flat_sum, segment_softmax_flat

    act = get_activation(activation_function)
    n_local, state_dim = h_local.shape
    head_dim = state_dim // num_heads
    att = gnn_params["att"].reshape(-1, num_heads, 2 * head_dim)
    att_src, att_tgt = att[..., :head_dim], att[..., head_dim:]

    for _ in range(num_timesteps):
        t_local = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                             preferred_element_type=jnp.float32)
        t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
        L, n_global, D = t_full.shape
        t_heads = t_full.reshape(L, n_global, num_heads, head_dim)
        logit_src = jnp.einsum("lnkd,lkd->lnk", t_heads, att_src)
        logit_tgt = jnp.einsum("lnkd,lkd->lnk", t_heads, att_tgt)
        flat = shard.flat
        logits = jax.nn.leaky_relu(
            jnp.take(logit_src.reshape(L * n_global, num_heads),
                     flat.src_flat, axis=0, mode="clip")
            + jnp.take(logit_tgt.reshape(L * n_global, num_heads),
                       flat.tgt_flat, axis=0, mode="clip"),
            negative_slope=0.2,
        )
        msgs = gather_flat_src(
            t_heads.reshape(L * n_global, num_heads * head_dim), flat
        ).reshape(-1, num_heads, head_dim)
        attn = segment_softmax_flat(logits, flat, n_local)
        agg = aggregate_flat_sum(msgs * attn[..., None], flat, n_local)
        h_local = act(agg.reshape(n_local, state_dim))
    return h_local


def gp_film_layer_kw(gnn_params, shard: GPShard, h_local, axis_name: str,
                     *, num_timesteps=1, activation_function="relu",
                     message_aggregation_function="sum",
                     normalize_by_num_incoming=False, **_):
    """GNN-FiLM over the partition with the full kwarg surface.

    With the source-ownership split, the local-source half of the layer
    (messages, gamma/beta modulation — the TARGET is always local — and
    aggregation) has no data dependency on the all_gather, so XLA
    overlaps the ICI exchange with it. Only the FiLM table of the
    TRANSFORM needs gathering for remote edges; gamma/beta always come
    from the local film table."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm
    from ..ops.edge_ops import gather_flat_tgt

    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    d = h_local.shape[-1]
    sum_agg = message_aggregation_function in ("sum", "unsorted_segment_sum")
    for _ in range(num_timesteps):
        t_local = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                             preferred_element_type=jnp.float32)
        f_local = jnp.einsum("nd,lde->lne", h_local, gnn_params["W_film"],
                             preferred_element_type=jnp.float32)
        t_full = jax.lax.all_gather(t_local, axis_name, axis=1, tiled=True)
        L, n_global, D = t_full.shape
        if _overlap_split_ok(shard):
            fl, fr = shard.flat_local, shard.flat_remote
            f_loc_table = f_local.reshape(L * n_local, 2 * d)
            # The remote stream's tgt indices are in GLOBAL table space,
            # but its TARGETS are local rows; re-express them in the local
            # film table's space (_local_tgt_view).
            fr_local_tgt = _local_tgt_view(fr, n_local, n_global, L)
            msgs_loc = gather_flat_src(t_local.reshape(L * n_local, D), fl)
            msgs_rem = gather_flat_src(t_full.reshape(L * n_global, D), fr)
            if normalize_by_num_incoming:
                msgs_loc = msgs_loc * fl.norm_scale[:, None]
                msgs_rem = msgs_rem * fr.norm_scale[:, None]
            gb_loc = gather_flat_tgt(f_loc_table, fl)
            gb_rem = gather_flat_tgt(f_loc_table, fr_local_tgt)
            msgs_loc = act(gb_loc[:, :d] * msgs_loc + gb_loc[:, d:])
            msgs_rem = act(gb_rem[:, :d] * msgs_rem + gb_rem[:, d:])
            agg = _aggregate_split(msgs_loc, fl, msgs_rem, fr, n_local,
                                   message_aggregation_function)
            h_local = layer_norm(gnn_params["ln"], agg)
            continue
        f_full = jax.lax.all_gather(f_local, axis_name, axis=1, tiled=True)
        m = gather_flat_src(t_full.reshape(L * n_global, D), shard.flat)
        if normalize_by_num_incoming:
            m = m * shard.flat.norm_scale[:, None]
        gb = gather_flat_tgt(f_full.reshape(L * n_global, 2 * d), shard.flat)
        msgs = act(gb[:, :d] * m + gb[:, d:])
        agg = aggregate_flat(msgs, shard.flat, n_local,
                             message_aggregation_function)
        h_local = layer_norm(gnn_params["ln"], agg)
    return h_local


def gp_film_halo_layer(gnn_params, shard: GPHaloShard, h_local,
                       axis_name: str, *, num_timesteps=1,
                       activation_function="relu",
                       message_aggregation_function="sum",
                       normalize_by_num_incoming=False, **_):
    """GNN-FiLM over the halo partition: exchange only boundary features
    (one all_to_all of [P, halo_pad, D] per timestep), then transform and
    modulate on the extended local table."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm
    from ..ops.edge_ops import _gather_permuted

    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    d = h_local.shape[-1]
    for _ in range(num_timesteps):
        ext = _halo_exchange(shard, h_local, axis_name)
        t = jnp.einsum("nd,lde->lne", ext, gnn_params["W"],
                       preferred_element_type=jnp.float32)
        f = jnp.einsum("nd,lde->lne", ext, gnn_params["W_film"],
                       preferred_element_type=jnp.float32)
        L, n_ext, D = t.shape
        flat = _HaloFlat(
            src_flat=shard.src_ext, tgt_flat=shard.tgt_flat,
            receivers=shard.receivers, edge_type=None, mask=shard.mask,
            norm_scale=shard.norm_scale, perm_by_src=shard.perm_by_src,
            perm_by_tgt=shard.perm_by_tgt,
        )
        m = gather_flat_src(t.reshape(L * n_ext, D), flat)
        if normalize_by_num_incoming:
            m = m * shard.norm_scale[:, None]
        idx_sorted = jnp.take(flat.tgt_flat, flat.perm_by_tgt)
        gb = _gather_permuted(f.reshape(L * n_ext, 2 * d), flat.tgt_flat,
                              flat.perm_by_tgt, idx_sorted)
        msgs = act(gb[:, :d] * m + gb[:, d:])
        agg = aggregate_flat(msgs, flat, n_local,
                             message_aggregation_function)
        h_local = layer_norm(gnn_params["ln"], agg)
    return h_local


# ---------------------------------------------------------------------------
# Family-complete halo-exchange layers (boundary features only, one
# all_to_all per timestep — the BASELINE north-star pattern: "exchanging
# boundary node features all-to-all over ICI overlapped with local
# aggregation"). Every layer consumes the GPHaloShard's source-ownership
# split: the local-source stream reads tables derived from h_local only
# (no data path from the all_to_all, asserted by the jaxpr taint test), so
# XLA's async collectives overlap the boundary exchange with it.
# ---------------------------------------------------------------------------


def _halo_rows(shard: GPHaloShard, h_local, axis_name: str):
    """Boundary rows from every peer: ONE all_to_all of [P, halo_pad, D]
    over ICI. Returns the halo receive buffer [P * halo_pad, D] grouped by
    source device (the space flat_remote's senders index)."""
    send = jnp.take(h_local, shard.send_idx, axis=0)  # [P, halo_pad, D]
    halo = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    return halo.reshape(-1, h_local.shape[-1])


def _take_rcv(table, flat_s):
    """Per-edge row of a receiver-indexed [n_local (+1), D] table; padded
    edges (receiver == n_local) read the appended zero/neg row."""
    return jnp.take(table, jnp.minimum(flat_s.receivers, table.shape[0] - 1),
                    axis=0)


def _segment_softmax_split(logits_loc, fl, logits_rem, fr, n_local: int):
    """Receiver-segment softmax jointly over BOTH edge streams (attention
    normalizes over ALL incoming edges of a receiver regardless of which
    stream carries them). Mirrors edge_ops.segment_softmax_flat."""
    neg = jnp.finfo(logits_loc.dtype).min
    masked_loc = jnp.where(fl.mask[:, None] > 0, logits_loc, neg)
    masked_rem = jnp.where(fr.mask[:, None] > 0, logits_rem, neg)
    gmax = jnp.maximum(
        jax.ops.segment_max(masked_loc, fl.receivers, n_local + 1,
                            indices_are_sorted=True),
        jax.ops.segment_max(masked_rem, fr.receivers, n_local + 1,
                            indices_are_sorted=True),
    )
    gmax = jnp.maximum(gmax, neg)
    ex_loc = jnp.exp(masked_loc - _take_rcv(gmax, fl)) * fl.mask[:, None]
    ex_rem = jnp.exp(masked_rem - _take_rcv(gmax, fr)) * fr.mask[:, None]
    denom = (
        jax.ops.segment_sum(ex_loc, fl.receivers, n_local + 1,
                            indices_are_sorted=True)
        + jax.ops.segment_sum(ex_rem, fr.receivers, n_local + 1,
                              indices_are_sorted=True)
    )
    small = 1e-7  # SMALL_NUMBER
    return (ex_loc / (_take_rcv(denom, fl) + small),
            ex_rem / (_take_rcv(denom, fr) + small))


def gp_halo_rgcn_layer_kw(gnn_params, shard: GPHaloShard, h_local,
                          axis_name: str, *, num_timesteps=1,
                          activation_function="tanh",
                          message_aggregation_function="sum",
                          normalize_by_num_incoming=True,
                          use_both_source_and_target=False, **_):
    """RGCN over the halo partition (reference: gnns/rgcn.py:8-115):
    boundary exchange -> typed transform of own + halo rows -> split
    gather/aggregate. Communication is independent of the number of edge
    types (P * halo_pad * D per timestep)."""
    from ..nn.activations import get_activation

    act = get_activation(activation_function)
    n_local, d = h_local.shape
    W = gnn_params["W"]
    fl, fr = shard.flat_local, shard.flat_remote
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        W_src = W[:, :d, :] if use_both_source_and_target else W
        t_loc = jnp.einsum("nd,lde->lne", h_local, W_src,
                           preferred_element_type=jnp.float32)
        t_halo = jnp.einsum("nd,lde->lne", halo, W_src,
                            preferred_element_type=jnp.float32)
        L, _, D = t_loc.shape
        msgs_loc = gather_flat_src(t_loc.reshape(L * n_local, D), fl)
        msgs_rem = gather_flat_src(t_halo.reshape(-1, D), fr)
        if use_both_source_and_target:
            t_tgt = jnp.einsum("nd,lde->lne", h_local, W[:, d:, :],
                               preferred_element_type=jnp.float32)
            tgt_table = t_tgt.reshape(L * n_local, D)
            msgs_loc = msgs_loc + gather_flat_tgt(tgt_table, fl)
            msgs_rem = msgs_rem + gather_flat_tgt(tgt_table, fr)
        if normalize_by_num_incoming:
            msgs_loc = msgs_loc * fl.norm_scale[:, None]
            msgs_rem = msgs_rem * fr.norm_scale[:, None]
        h_local = act(_aggregate_split(msgs_loc, fl, msgs_rem, fr, n_local,
                                       message_aggregation_function))
    return h_local


def gp_halo_ggnn_layer(gnn_params, shard: GPHaloShard, h_local,
                       axis_name: str, *, num_timesteps=1,
                       gated_unit_type="gru", activation_function="tanh",
                       message_aggregation_function="sum", **_):
    """GGNN over the halo partition (gnns/ggnn.py:92 — messages as cell
    INPUT; the RNN update is per-node local)."""
    from ..nn.cells import cell_apply

    n_local = h_local.shape[0]
    fl, fr = shard.flat_local, shard.flat_remote
    c = None
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        t_loc = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                           preferred_element_type=jnp.float32)
        t_halo = jnp.einsum("nd,lde->lne", halo, gnn_params["W"],
                            preferred_element_type=jnp.float32)
        L, _, D = t_loc.shape
        msgs_loc = gather_flat_src(t_loc.reshape(L * n_local, D), fl)
        msgs_rem = gather_flat_src(t_halo.reshape(-1, D), fr)
        agg = _aggregate_split(msgs_loc, fl, msgs_rem, fr, n_local,
                               message_aggregation_function)
        h_local, c = cell_apply(gnn_params["cell"], gated_unit_type, agg,
                                h_local, activation_function, c)
    return h_local


def gp_halo_rgat_layer(gnn_params, shard: GPHaloShard, h_local,
                       axis_name: str, *, num_timesteps=1, num_heads=4,
                       activation_function="tanh", **_):
    """RGAT over the halo partition (gnns/rgat.py:95-138): attention logit
    halves node-sided on the own/halo typed tables (the target half is
    always local); the per-(receiver, head) softmax normalizes jointly
    over both streams."""
    from ..nn.activations import get_activation

    act = get_activation(activation_function)
    n_local, state_dim = h_local.shape
    head_dim = state_dim // num_heads
    att = gnn_params["att"].reshape(-1, num_heads, 2 * head_dim)
    att_src, att_tgt = att[..., :head_dim], att[..., head_dim:]
    fl, fr = shard.flat_local, shard.flat_remote

    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        t_loc = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                           preferred_element_type=jnp.float32)
        t_halo = jnp.einsum("nd,lde->lne", halo, gnn_params["W"],
                            preferred_element_type=jnp.float32)
        L = t_loc.shape[0]
        th_loc = t_loc.reshape(L, n_local, num_heads, head_dim)
        th_halo = t_halo.reshape(L, -1, num_heads, head_dim)
        ls_loc = jnp.einsum("lnkd,lkd->lnk", th_loc, att_src)
        ls_halo = jnp.einsum("lnkd,lkd->lnk", th_halo, att_src)
        lt_loc = jnp.einsum("lnkd,lkd->lnk", th_loc, att_tgt)

        def edge_logits(flat_s, ls_table):
            return jax.nn.leaky_relu(
                jnp.take(ls_table, flat_s.src_flat, axis=0, mode="clip")
                + jnp.take(lt_loc.reshape(L * n_local, num_heads),
                           flat_s.tgt_flat, axis=0, mode="clip"),
                negative_slope=0.2,
            )

        logits_loc = edge_logits(fl, ls_loc.reshape(L * n_local, num_heads))
        logits_rem = edge_logits(fr, ls_halo.reshape(-1, num_heads))
        attn_loc, attn_rem = _segment_softmax_split(
            logits_loc, fl, logits_rem, fr, n_local
        )
        m_loc = gather_flat_src(t_loc.reshape(L * n_local, state_dim), fl)
        m_rem = gather_flat_src(t_halo.reshape(-1, state_dim), fr)
        w_loc = (m_loc.reshape(-1, num_heads, head_dim)
                 * attn_loc[..., None]).reshape(-1, state_dim)
        w_rem = (m_rem.reshape(-1, num_heads, head_dim)
                 * attn_rem[..., None]).reshape(-1, state_dim)
        agg = _aggregate_split(w_loc, fl, w_rem, fr, n_local, "sum")
        h_local = act(agg)
    return h_local


def gp_halo_film_layer_kw(gnn_params, shard: GPHaloShard, h_local,
                          axis_name: str, *, num_timesteps=1,
                          activation_function="relu",
                          message_aggregation_function="sum",
                          normalize_by_num_incoming=False, **_):
    """GNN-FiLM over the halo partition (gnns/gnn_film.py:94-120):
    gamma/beta come from the LOCAL film table (targets are always local),
    so only the message transform touches halo rows."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    act = get_activation(activation_function)
    n_local, d = h_local.shape
    fl, fr = shard.flat_local, shard.flat_remote
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        t_loc = jnp.einsum("nd,lde->lne", h_local, gnn_params["W"],
                           preferred_element_type=jnp.float32)
        t_halo = jnp.einsum("nd,lde->lne", halo, gnn_params["W"],
                            preferred_element_type=jnp.float32)
        f_loc = jnp.einsum("nd,lde->lne", h_local, gnn_params["W_film"],
                           preferred_element_type=jnp.float32)
        L = t_loc.shape[0]
        f_table = f_loc.reshape(L * n_local, 2 * d)
        msgs_loc = gather_flat_src(t_loc.reshape(L * n_local, d), fl)
        msgs_rem = gather_flat_src(t_halo.reshape(-1, d), fr)
        if normalize_by_num_incoming:
            msgs_loc = msgs_loc * fl.norm_scale[:, None]
            msgs_rem = msgs_rem * fr.norm_scale[:, None]
        gb_loc = gather_flat_tgt(f_table, fl)
        gb_rem = gather_flat_tgt(f_table, fr)
        msgs_loc = act(gb_loc[:, :d] * msgs_loc + gb_loc[:, d:])
        msgs_rem = act(gb_rem[:, :d] * msgs_rem + gb_rem[:, d:])
        agg = _aggregate_split(msgs_loc, fl, msgs_rem, fr, n_local,
                               message_aggregation_function)
        h_local = layer_norm(gnn_params["ln"], agg)
    return h_local


def _halo_typed_mlp_messages(weights, shard: GPHaloShard, h_local, halo,
                             concat_target: bool, inner_act):
    """Per-edge typed-MLP messages over the halo partition (the halo twin
    of _gp_typed_mlp_messages): the first (linear) MLP layer is node-sided
    on the own/halo tables (target halves always local); later layers run
    per-edge as type-masked matmuls per stream."""
    W0 = weights[0]
    d = h_local.shape[-1]
    n_local = h_local.shape[0]
    n_halo = halo.shape[0]
    fl, fr = shard.flat_local, shard.flat_remote
    L = W0.shape[0]

    if concat_target:
        ts_l = jnp.einsum("nd,lde->lne", h_local, W0[:, :d, :],
                          preferred_element_type=jnp.float32)
        ts_h = jnp.einsum("nd,lde->lne", halo, W0[:, :d, :],
                          preferred_element_type=jnp.float32)
        tt_l = jnp.einsum("nd,lde->lne", h_local, W0[:, d:, :],
                          preferred_element_type=jnp.float32)
        D = ts_l.shape[-1]
        tt_table = tt_l.reshape(L * n_local, D)
        m_loc = (gather_flat_src(ts_l.reshape(L * n_local, D), fl)
                 + gather_flat_tgt(tt_table, fl))
        m_rem = (gather_flat_src(ts_h.reshape(L * n_halo, D), fr)
                 + gather_flat_tgt(tt_table, fr))
    else:
        t_l = jnp.einsum("nd,lde->lne", h_local, W0,
                         preferred_element_type=jnp.float32)
        t_h = jnp.einsum("nd,lde->lne", halo, W0,
                         preferred_element_type=jnp.float32)
        D = t_l.shape[-1]
        m_loc = gather_flat_src(t_l.reshape(L * n_local, D), fl)
        m_rem = gather_flat_src(t_h.reshape(L * n_halo, D), fr)

    et_loc = jnp.minimum(fl.src_flat // n_local, L)
    et_rem = jnp.minimum(fr.src_flat // n_halo, L)
    m_loc = _typed_mlp_tail(m_loc, et_loc, weights, inner_act, L)
    m_rem = _typed_mlp_tail(m_rem, et_rem, weights, inner_act, L)
    return (m_loc, fl), (m_rem, fr)


def gp_halo_rgin_layer(gnn_params, shard: GPHaloShard, h_local,
                       axis_name: str, *, num_timesteps=1,
                       activation_function="relu",
                       message_aggregation_function="sum",
                       use_target_state_as_input=False,
                       num_edge_MLP_hidden_layers=1,
                       num_aggr_MLP_hidden_layers=None, **_):
    """RGIN over the halo partition (gnns/rgin.py:77-139)."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    fl, fr = shard.flat_local, shard.flat_remote
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        if num_edge_MLP_hidden_layers is not None:
            loc, rem = _halo_typed_mlp_messages(
                gnn_params["edge_mlp"], shard, h_local, halo,
                use_target_state_as_input, act,
            )
            agg = _aggregate_split(
                act(loc[0]), loc[1], act(rem[0]), rem[1], n_local,
                message_aggregation_function,
            )
        else:
            # Raw source states as messages (rgin.py:121-124).
            n_halo = halo.shape[0]
            m_loc = jnp.take(h_local, fl.src_flat % n_local, axis=0,
                             mode="clip") * fl.mask[:, None]
            m_rem = jnp.take(halo, fr.src_flat % n_halo, axis=0,
                             mode="clip") * fr.mask[:, None]
            agg = _aggregate_split(m_loc, fl, m_rem, fr, n_local,
                                   message_aggregation_function)
        if num_aggr_MLP_hidden_layers is not None:
            from ..nn.mlp import mlp_apply

            agg = mlp_apply(gnn_params["aggr_mlp"], agg, act)
        h_local = layer_norm(gnn_params["ln"], act(agg))
    return h_local


def gp_halo_gnn_edge_mlp_layer(gnn_params, shard: GPHaloShard, h_local,
                               axis_name: str, *, num_timesteps=1,
                               activation_function="relu",
                               message_aggregation_function="sum",
                               normalize_by_num_incoming=False,
                               use_target_state_as_input=True,
                               num_edge_hidden_layers=1, **_):
    """GNN-Edge-MLP over the halo partition (gnns/gnn_edge_mlp.py:73-119)."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    act = get_activation(activation_function)
    elu = get_activation("elu")
    n_local = h_local.shape[0]
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)
        loc, rem = _halo_typed_mlp_messages(
            gnn_params["edge_mlp"], shard, h_local, halo,
            use_target_state_as_input, elu,
        )

        def finalize(m, flat_s):
            if normalize_by_num_incoming:
                m = m * flat_s.norm_scale[:, None]
            return act(m)  # activation on messages (gnn_edge_mlp.py:112)

        agg = _aggregate_split(
            finalize(*loc), loc[1], finalize(*rem), rem[1], n_local,
            message_aggregation_function,
        )
        h_local = layer_norm(gnn_params["ln"], agg)
    return h_local


def gp_halo_rgdcn_layer(gnn_params, shard: GPHaloShard, h_local,
                        axis_name: str, *, num_timesteps=1, num_channels=8,
                        channel_dim=None,
                        use_full_state_for_channel_weights=False,
                        tie_channel_weights=False,
                        activation_function="relu",
                        message_aggregation_function="sum",
                        normalize_by_num_incoming=True, **_):
    """RGDCN over the halo partition, aggregate-first (see gp_rgdcn_layer):
    per-(type, local receiver) neighbor sums of raw own/halo states, then
    node-LOCAL dynamic-kernel contractions."""
    from ..nn.activations import get_activation
    from ..nn.layers import _rgdcn_type_contraction

    if message_aggregation_function not in ("sum", "unsorted_segment_sum"):
        raise ValueError(
            "graph-parallel RGDCN supports sum aggregation, got %r"
            % message_aggregation_function
        )
    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    W_wc = gnn_params["W_wc"]
    L = W_wc.shape[0]
    if channel_dim is None:
        channel_dim = h_local.shape[-1] // num_channels
    fl, fr = shard.flat_local, shard.flat_remote
    for _ in range(num_timesteps):
        halo = _halo_rows(shard, h_local, axis_name)

        def typed_sums(h_table, flat_s, table_rows):
            m = jnp.take(h_table, flat_s.src_flat % table_rows, axis=0,
                         mode="clip")
            if normalize_by_num_incoming:
                m = m * flat_s.norm_scale[:, None]
            else:
                m = m * flat_s.mask[:, None]
            et = jnp.minimum(flat_s.src_flat // table_rows, L)
            seg = (et * (n_local + 1)
                   + jnp.minimum(flat_s.receivers, n_local))
            S = jax.ops.segment_sum(m, seg, (L + 1) * (n_local + 1))
            return S.reshape(L + 1, n_local + 1, -1)[:L, :n_local]

        S = (typed_sums(h_local, fl, n_local)
             + typed_sums(halo, fr, halo.shape[0]))
        h_chunked = h_local.reshape(n_local, num_channels, channel_dim)
        S_chunk = S.reshape(L, n_local, num_channels, channel_dim)
        out = None
        for l in range(L):
            part = _rgdcn_type_contraction(
                h_local, h_chunked, S_chunk[l], W_wc[l], act, channel_dim,
                use_full_state_for_channel_weights, tie_channel_weights,
            )
            out = part if out is None else out + part
        h_local = act(out).reshape(n_local, num_channels * channel_dim)
    return h_local


GP_HALO_LAYERS = {
    "rgcn": gp_halo_rgcn_layer_kw,
    "gnn_film": gp_halo_film_layer_kw,
    "ggnn": gp_halo_ggnn_layer,
    "rgat": gp_halo_rgat_layer,
    "rgin": gp_halo_rgin_layer,
    "gnn_edge_mlp": gp_halo_gnn_edge_mlp_layer,
    "rgdcn": gp_halo_rgdcn_layer,
}


def _local_tgt_view(flat_s: GPFlatEdges, n_local: int, table_rows: int,
                    L: int) -> GPFlatEdges:
    """Re-express a stream's tgt indices in the LOCAL table space
    (targets are always local rows; only the index space is global). The
    by-tgt sort order is preserved — (type, receiver) ordering is
    identical in both spaces."""
    et = jnp.minimum(flat_s.src_flat // table_rows, L)
    return flat_s._replace(
        tgt_flat=et * n_local + jnp.minimum(flat_s.receivers, n_local)
    )


def _typed_mlp_tail(m, et, weights, inner_act, L):
    """Post-first-layer per-edge typed MLP stages as type-masked matmuls
    (padded edges decode to type L -> every mask false -> zero message;
    harmless: their receiver is the sliced-off dump row)."""
    for W in weights[1:]:
        z = inner_act(m)
        out = None
        for l in range(L):
            part = jnp.dot(z, W[l], preferred_element_type=jnp.float32)
            part = part * (et == l).astype(part.dtype)[:, None]
            out = part if out is None else out + part
        m = out
    return m


def _gp_typed_mlp_messages(weights, shard: GPShard, h_local, axis_name,
                           concat_target: bool, inner_act):
    """Per-edge typed-MLP messages over the partition: the FIRST (linear)
    MLP layer is node-sided on the all-gathered typed tables (with the
    concat(source, target) input split into source/target halves, exactly
    as the single-device path); later layers run per-edge as type-masked
    matmuls — correctness-first (L-fold matmul FLOPs; the type counts that
    use GP are small).

    With the source-ownership split, returns messages per STREAM as
    ((msgs_local, flat_local), (msgs_remote, flat_remote), n_global) —
    the local stream (own typed tables, target tables are always local)
    has no data path from the all_gather, so XLA overlaps the exchange
    with its per-edge work. Without the split, returns
    ((msgs, flat), None, n_global)."""
    W0 = weights[0]
    d = h_local.shape[-1]
    n_local = h_local.shape[0]
    split = _overlap_split_ok(shard)

    if concat_target:
        ts_l = jnp.einsum("nd,lde->lne", h_local, W0[:, :d, :],
                          preferred_element_type=jnp.float32)
        tt_l = jnp.einsum("nd,lde->lne", h_local, W0[:, d:, :],
                          preferred_element_type=jnp.float32)
        ts = jax.lax.all_gather(ts_l, axis_name, axis=1, tiled=True)
        L, n_global, D = ts.shape
        tt_table = tt_l.reshape(L * n_local, D)
        if split:
            fl, fr = shard.flat_local, shard.flat_remote
            m_loc = (gather_flat_src(ts_l.reshape(L * n_local, D), fl)
                     + gather_flat_tgt(tt_table, fl))
            m_rem = (gather_flat_src(ts.reshape(L * n_global, D), fr)
                     + gather_flat_tgt(
                         tt_table, _local_tgt_view(fr, n_local, n_global, L)
                     ))
        else:
            tt = jax.lax.all_gather(tt_l, axis_name, axis=1, tiled=True)
            m = (gather_flat_src(ts.reshape(L * n_global, D), shard.flat)
                 + gather_flat_tgt(tt.reshape(L * n_global, D), shard.flat))
    else:
        t_l = jnp.einsum("nd,lde->lne", h_local, W0,
                         preferred_element_type=jnp.float32)
        t = jax.lax.all_gather(t_l, axis_name, axis=1, tiled=True)
        L, n_global, D = t.shape
        if split:
            fl, fr = shard.flat_local, shard.flat_remote
            m_loc = gather_flat_src(t_l.reshape(L * n_local, D), fl)
            m_rem = gather_flat_src(t.reshape(L * n_global, D), fr)
        else:
            m = gather_flat_src(t.reshape(L * n_global, D), shard.flat)

    if split:
        et_loc = jnp.minimum(fl.src_flat // n_local, L)
        et_rem = jnp.minimum(fr.src_flat // n_global, L)
        m_loc = _typed_mlp_tail(m_loc, et_loc, weights, inner_act, L)
        m_rem = _typed_mlp_tail(m_rem, et_rem, weights, inner_act, L)
        return (m_loc, fl), (m_rem, fr), n_global
    et = jnp.minimum(shard.flat.src_flat // n_global, L)
    m = _typed_mlp_tail(m, et, weights, inner_act, L)
    return (m, shard.flat), None, n_global


def gp_rgin_layer(gnn_params, shard: GPShard, h_local, axis_name: str,
                  *, num_timesteps=1, activation_function="relu",
                  message_aggregation_function="sum",
                  use_target_state_as_input=False,
                  num_edge_MLP_hidden_layers=1,
                  num_aggr_MLP_hidden_layers=None, **_):
    """RGIN over the partition (reference semantics: gnns/rgin.py:77-139 —
    per-type edge MLPs, activation on messages, optional aggregation MLP,
    activation + unconditional LayerNorm)."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    for _ in range(num_timesteps):
        if num_edge_MLP_hidden_layers is not None:
            loc, rem, _ = _gp_typed_mlp_messages(
                gnn_params["edge_mlp"], shard, h_local, axis_name,
                use_target_state_as_input, act,
            )
            if rem is not None:
                # act on MLP outputs (rgin.py:128-129), per stream:
                agg = _aggregate_split(
                    act(loc[0]), loc[1], act(rem[0]), rem[1], n_local,
                    message_aggregation_function,
                )
            else:
                agg = aggregate_flat(act(loc[0]), loc[1], n_local,
                                     message_aggregation_function)
        else:
            # Raw source states as messages (rgin.py:121-124): one
            # all_gather of h; the message is type-independent, so the
            # type-offset index reduces modulo n_global.
            h_full = jax.lax.all_gather(h_local, axis_name, axis=0,
                                        tiled=True)
            n_global = h_full.shape[0]
            if _overlap_split_ok(shard):
                fl, fr = shard.flat_local, shard.flat_remote
                m_loc = jnp.take(
                    h_local, fl.src_flat % n_local, axis=0, mode="clip"
                ) * fl.mask[:, None]
                m_rem = jnp.take(
                    h_full, fr.src_flat % n_global, axis=0, mode="clip"
                ) * fr.mask[:, None]
                agg = _aggregate_split(m_loc, fl, m_rem, fr, n_local,
                                       message_aggregation_function)
            else:
                msgs = jnp.take(
                    h_full, shard.flat.src_flat % n_global, axis=0,
                    mode="clip",
                ) * shard.flat.mask[:, None]
                agg = aggregate_flat(msgs, shard.flat, n_local,
                                     message_aggregation_function)
        if num_aggr_MLP_hidden_layers is not None:
            from ..nn.mlp import mlp_apply

            agg = mlp_apply(gnn_params["aggr_mlp"], agg, act)
        h_local = layer_norm(gnn_params["ln"], act(agg))
    return h_local


def gp_gnn_edge_mlp_layer(gnn_params, shard: GPShard, h_local,
                          axis_name: str, *, num_timesteps=1,
                          activation_function="relu",
                          message_aggregation_function="sum",
                          normalize_by_num_incoming=False,
                          use_target_state_as_input=True,
                          num_edge_hidden_layers=1, **_):
    """GNN-Edge-MLP over the partition (reference semantics:
    gnns/gnn_edge_mlp.py:73-119 — fixed elu inner activation, optional
    1/c normalization of the MLP output, activation on messages,
    unconditional LayerNorm after aggregation)."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    act = get_activation(activation_function)
    elu = get_activation("elu")
    n_local = h_local.shape[0]
    for _ in range(num_timesteps):
        loc, rem, _ = _gp_typed_mlp_messages(
            gnn_params["edge_mlp"], shard, h_local, axis_name,
            use_target_state_as_input, elu,
        )

        def finalize(m, flat_s):
            if normalize_by_num_incoming:
                m = m * flat_s.norm_scale[:, None]
            return act(m)  # activation on messages (gnn_edge_mlp.py:112)

        if rem is not None:
            agg = _aggregate_split(
                finalize(*loc), loc[1], finalize(*rem), rem[1], n_local,
                message_aggregation_function,
            )
        else:
            agg = aggregate_flat(finalize(*loc), loc[1], n_local,
                                 message_aggregation_function)
        h_local = layer_norm(gnn_params["ln"], agg)
    return h_local


def gp_rgdcn_layer(gnn_params, shard: GPShard, h_local, axis_name: str,
                   *, num_timesteps=1, num_channels=8, channel_dim=None,
                   use_full_state_for_channel_weights=False,
                   tie_channel_weights=False, activation_function="relu",
                   message_aggregation_function="sum",
                   normalize_by_num_incoming=True, **_):
    """RGDCN over the partition, in the aggregate-first form (see
    nn/layers.py rgdcn_apply): messages are LINEAR in the source state
    and the activation applies after aggregation, so each timestep is
    ONE all_gather of the raw states (the cheapest GP collective of any
    family), per-(type, local receiver) neighbor sums, and node-LOCAL
    dynamic-kernel contractions (the kernels depend on the TARGET state,
    which each device owns)."""
    from ..nn.activations import get_activation
    from ..nn.layers import _rgdcn_type_contraction

    if message_aggregation_function not in ("sum", "unsorted_segment_sum"):
        raise ValueError(
            "graph-parallel RGDCN supports sum aggregation, got %r"
            % message_aggregation_function
        )
    act = get_activation(activation_function)
    n_local = h_local.shape[0]
    W_wc = gnn_params["W_wc"]
    L = W_wc.shape[0]
    if channel_dim is None:
        channel_dim = h_local.shape[-1] // num_channels
    for _ in range(num_timesteps):
        h_full = jax.lax.all_gather(h_local, axis_name, axis=0, tiled=True)
        n_global = h_full.shape[0]

        def typed_sums(h_table, flat_s, table_rows):
            m = jnp.take(h_table, flat_s.src_flat % table_rows, axis=0,
                         mode="clip")
            if normalize_by_num_incoming:
                m = m * flat_s.norm_scale[:, None]
            else:
                m = m * flat_s.mask[:, None]
            et = jnp.minimum(flat_s.src_flat // table_rows, L)
            seg = (et * (n_local + 1)
                   + jnp.minimum(flat_s.receivers, n_local))
            S = jax.ops.segment_sum(m, seg, (L + 1) * (n_local + 1))
            return S.reshape(L + 1, n_local + 1, -1)[:L, :n_local]

        if _overlap_split_ok(shard):
            # Local-source sums have no data path from the all_gather.
            S = (typed_sums(h_local, shard.flat_local, n_local)
                 + typed_sums(h_full, shard.flat_remote, n_global))
        else:
            S = typed_sums(h_full, shard.flat, n_global)
        h_chunked = h_local.reshape(n_local, num_channels, channel_dim)
        S_chunk = S.reshape(L, n_local, num_channels, channel_dim)
        out = None
        for l in range(L):
            part = _rgdcn_type_contraction(
                h_local, h_chunked, S_chunk[l], W_wc[l], act, channel_dim,
                use_full_state_for_channel_weights, tie_channel_weights,
            )
            out = part if out is None else out + part
        h_local = act(out).reshape(n_local, num_channels * channel_dim)
    return h_local


GP_LAYERS = {
    "rgcn": gp_rgcn_layer_kw,
    "gnn_film": gp_film_layer_kw,
    "ggnn": gp_ggnn_layer,
    "rgat": gp_rgat_layer,
    "rgin": gp_rgin_layer,
    "gnn_edge_mlp": gp_gnn_edge_mlp_layer,
    "rgdcn": gp_rgdcn_layer,
}


def gp_propagation_apply(prop_params, model_params, shard: GPShard, h_local,
                         axis_name: str, layer_name: str, layer_kwargs,
                         rng=None):
    """Sharded mirror of nn.propagation.propagation_apply over a GPShard:
    identical per-node schedule (projection, input dropout, averaging
    residuals, inter-layer LayerNorm/Dense — all local), with the GNN layer
    drawn from GP_LAYERS. Consumes the SAME parameter tree as the
    single-device stack."""
    from ..nn.activations import get_activation
    from ..nn.normalization import layer_norm

    registry = (GP_HALO_LAYERS if isinstance(shard, GPHaloShard)
                else GP_LAYERS)
    if layer_name not in registry:
        raise ValueError(
            "graph_parallel supports %s; got %r"
            % (sorted(registry), layer_name)
        )
    gp_layer = registry[layer_name]
    act = get_activation(model_params["graph_model_activation_function"])
    keep_prob = model_params["graph_layer_input_dropout_keep_prob"]
    residual_every = model_params["graph_residual_connection_every_num_layers"]
    dense_every = model_params["graph_dense_between_every_num_gnn_layers"]
    timesteps = model_params["graph_num_timesteps_per_layer"]

    h = h_local
    if "proj" in prop_params:
        h = act(jnp.dot(h, prop_params["proj"],
                        preferred_element_type=jnp.float32))
    last_residual = jnp.zeros_like(h)
    for i, layer_params in enumerate(prop_params["layers"]):
        if rng is not None and keep_prob < 1.0:
            rng, sub = jax.random.split(rng)
            mask = jax.random.bernoulli(sub, keep_prob, h.shape)
            h = jnp.where(mask, h / keep_prob, 0.0)
        if i % residual_every == 0:
            t = h
            if i > 0:
                h = (h + last_residual) / 2.0
            last_residual = t
        h = gp_layer(layer_params["gnn"], shard, h, axis_name,
                     num_timesteps=timesteps, **layer_kwargs)
        if "ln" in layer_params:
            h = layer_norm(layer_params["ln"], h)
        if i % dense_every == 0:
            h = act(jnp.dot(h, layer_params["dense"],
                            preferred_element_type=jnp.float32))
    return h


def partition_task_batch(batch, num_partitions: int, n_pad_target: int,
                         e_pad_total: int):
    """Partition one padded TaskBatch's mega-graph into GP shards with
    FOLD-STATIC shapes: n_local derives from the fold's n_pad, and every
    device's edge buffer is the fold's total edge budget (worst case: all
    receivers on one device), so every batch of a fold compiles once."""
    g = batch.graph
    n = int(batch.num_nodes)
    feats = np.asarray(g.node_features)[:n]
    adj = []
    for e in g.edges:
        sel = np.asarray(e.mask) > 0
        adj.append(np.stack(
            [np.asarray(e.senders)[sel], np.asarray(e.receivers)[sel]],
            axis=1,
        ).astype(np.int64))
    n_local = bucket_size(-(-n_pad_target // num_partitions), min_size=8)
    # partition_graph buckets its own n_local identically when given a
    # feature array padded to n_pad_target rows:
    feats_padded = np.zeros((n_pad_target, feats.shape[1]), np.float32)
    feats_padded[:n] = feats
    counts = np.asarray(g.typed_incoming_counts)[:, :n_pad_target]
    stacked, nl, n_global = partition_graph(
        feats_padded, adj, num_partitions, typed_incoming_counts=counts
    )
    assert nl == n_local, (nl, n_local)
    # Enforce the fold-static edge pad (re-pad each device's streams —
    # the merged one and the local/remote overlap split):
    cur_epad = stacked.flat.src_flat.shape[1]
    if cur_epad < e_pad_total:
        pad = e_pad_total - cur_epad
        L = len(adj)

        def pad_edges(x, fill):
            return np.concatenate(
                [x, np.full((num_partitions, pad), fill, x.dtype)], axis=1
            )

        def repad_flat(flat: GPFlatEdges, table_rows: int) -> GPFlatEdges:
            src = pad_edges(flat.src_flat, L * table_rows)
            tgt = pad_edges(flat.tgt_flat, L * table_rows)
            rcv = pad_edges(flat.receivers, nl)
            msk = pad_edges(flat.mask, 0.0)
            nrm = pad_edges(flat.norm_scale, 0.0)
            perm_src = np.stack(
                [np.argsort(src[p], kind="stable")
                 for p in range(num_partitions)]
            ).astype(np.int32)
            perm_tgt = np.stack(
                [np.argsort(tgt[p], kind="stable")
                 for p in range(num_partitions)]
            ).astype(np.int32)
            return GPFlatEdges(
                src_flat=src, tgt_flat=tgt, receivers=rcv, mask=msk,
                norm_scale=nrm, perm_by_src=perm_src, perm_by_tgt=perm_tgt,
            )

        stacked = stacked._replace(
            flat=repad_flat(stacked.flat, n_global),
            flat_local=repad_flat(stacked.flat_local, nl),
            flat_remote=repad_flat(stacked.flat_remote, n_global),
        )
    return stacked, n_local, n_global


def partition_task_batch_halo(batch, num_partitions: int, n_pad_target: int,
                              e_pad_total: int, halo_pad_target: int = None):
    """Halo-exchange twin of partition_task_batch: partitions one padded
    TaskBatch's mega-graph into GPHaloShards. e_pad is fold-bucketed by the
    caller; halo_pad is measured per batch and bucketed (shape-stable
    across batches of similar boundary size) unless pinned by the caller."""
    g = batch.graph
    n = int(batch.num_nodes)
    feats = np.asarray(g.node_features)[:n]
    adj = []
    for e in g.edges:
        sel = np.asarray(e.mask) > 0
        adj.append(np.stack(
            [np.asarray(e.senders)[sel], np.asarray(e.receivers)[sel]],
            axis=1,
        ).astype(np.int64))
    feats_padded = np.zeros((n_pad_target, feats.shape[1]), np.float32)
    feats_padded[:n] = feats
    counts = np.asarray(g.typed_incoming_counts)[:, :n_pad_target]
    stacked, n_local, n_global, halo_pad = partition_graph_halo(
        feats_padded, adj, num_partitions, typed_incoming_counts=counts,
        e_pad=e_pad_total, halo_pad=halo_pad_target,
    )
    return stacked, n_local, n_global, halo_pad


def make_gp_task_steps(model, mesh: Mesh, axis_name: str = "gp"):
    """Task-generic graph-parallel train/eval steps for a SparseGraphModel.

    The propagation runs sharded (node states 1/P per device); the task's
    input and output models run REPLICATED on the padded batch — the final
    local states are all-gathered once per step, so any task head works
    unchanged (vs. the reference's single-device-everything). Gradients of
    the sharded part flow through the collectives; a pmean washes float
    divergence before the replicated optimizer update."""
    clip_norm = model.params["clamp_gradient_norm"]
    layer_name = model.layer_name
    layer_kwargs = model.layer_kwargs()

    def forward(params, batch, shard, h0_full, rng, n_pad):
        idx = jax.lax.axis_index(axis_name)
        n_local = shard.node_features.shape[0]
        n_global = n_local * mesh.shape[axis_name]
        h0 = jnp.pad(h0_full, ((0, n_global - h0_full.shape[0]), (0, 0)))
        h_local = jax.lax.dynamic_slice_in_dim(h0, idx * n_local, n_local)
        h_local = gp_propagation_apply(
            params["prop"], model.params, shard, h_local, axis_name,
            layer_name, layer_kwargs, rng=rng,
        )
        h_full = jax.lax.all_gather(h_local, axis_name, axis=0, tiled=True)
        return h_full[:n_pad]

    def train_device(params, opt_state, rng, batch, shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng_in, rng_prop, rng_out = jax.random.split(rng, 3)
        _, _, dev_rng_prop = jax.random.split(dev_rng, 3)

        def loss_fn(p):
            feats = model.task.input_apply(p["input"], batch, rng_in)
            h_full = forward(p, batch, shard, feats, dev_rng_prop,
                             batch.graph.n_pad)
            loss, metrics = model.task.output_apply(
                p["output"], batch, h_full, feats, rng_out
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis_name)
        grads = clip_grads_per_tensor(grads, clip_norm)
        lr = model._effective_lr(batch.graph.num_graphs)
        new_params, new_opt_state = model._optimizer.update(
            grads, opt_state, params, lr
        )
        return new_params, new_opt_state, metrics

    def eval_device(params, batch, shard):
        shard = jax.tree_util.tree_map(lambda x: x[0], shard)
        feats = model.task.input_apply(params["input"], batch, None)
        h_full = forward(params, batch, shard, feats, None,
                         batch.graph.n_pad)
        _, metrics = model.task.output_apply(
            params["output"], batch, h_full, feats, None
        )
        return metrics

    train_sharded = shard_map(
        train_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    eval_sharded = shard_map(
        eval_device, mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return (jax.jit(train_sharded, donate_argnums=(0, 1)),
            jax.jit(eval_sharded))
