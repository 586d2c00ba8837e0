"""Typed-stacked edge stream: equal-padded per-type blocks + lax.scan.

RGIN, GNN-Edge-MLP and RGDCN apply genuinely per-type NONLINEAR per-edge
stages (post-activation MLP layers, dynamic per-target kernels), so the
node-side linear trick and the flat type-offset stream (ops/graph.py
FlatEdges) cannot absorb the edge-type dimension for them. On the
per-type list layout the reference's pattern (e.g. rgin.py:108-129,
rgdcn.py:80-113) becomes an UNROLLED Python loop over edge types — the
XLA graph then holds L (x C channels for RGDCN) copies of the
gather/matmul/scatter block per layer, which blows up compile time at
VarMisuse scale (22 edge types).

TPU-first fix: stack the per-type `EdgeBlock`s into one [L, Em] array
set (equal-padded to the largest per-type bucket, IN-JIT — a handful of
pad+stack ops traced once, no new host-side batch fields or transfers)
and run the per-type stage under `lax.scan`. The body is traced ONCE:
compile time stops scaling with the number of edge types, while every
per-step op keeps the sorted-gather/sorted-segment-sum layout of
ops/edge_ops.py (receivers sorted within each block; sender permutation
extended over the equal padding).

Trade-off: compute per step is Em = max_l e_pad_l, so heavily skewed
type-size distributions pay extra padded work; `scan_types_wanted`
weighs that against the unrolled path's compile cost.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .graph import GraphBatch


class TypedEdges(NamedTuple):
    """All edge blocks equal-padded to Em and stacked on a leading type
    axis; each row keeps the canonical EdgeBlock invariants (receivers
    sorted ascending with padding -> n_pad last; `senders[perm]` sorted)."""

    senders: jnp.ndarray  # [L, Em] int32; padding -> n_pad
    receivers: jnp.ndarray  # [L, Em] int32 sorted; padding -> n_pad
    mask: jnp.ndarray  # [L, Em] float32
    perm_by_sender: jnp.ndarray  # [L, Em] int32
    senders_sorted: jnp.ndarray  # [L, Em] int32 (== senders[perm])
    norm_scale: jnp.ndarray  # [L, Em] float32


def stack_edges(graph: GraphBatch) -> TypedEdges:
    """Equal-pad the per-type EdgeBlocks to Em = max_l e_pad_l and stack.

    Padding rows extend each block's existing canonical padding (sender
    and receiver -> n_pad, mask/scale 0); the sender permutation is
    extended with the identity over the new tail, which preserves
    sortedness because padded senders (== n_pad) already sort last.
    """
    n_pad = graph.n_pad
    em = max(e.senders.shape[0] for e in graph.edges)

    def pad_to(x, fill):
        pad = em - x.shape[0]
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, dtype=x.dtype)]
        )

    snd, rcv, msk, perm, snd_sorted, norm = [], [], [], [], [], []
    for e in graph.edges:
        e_pad = e.senders.shape[0]
        snd.append(pad_to(e.senders, n_pad))
        rcv.append(pad_to(e.receivers, n_pad))
        msk.append(pad_to(e.mask, 0.0))
        if em == e_pad:
            p = e.perm_by_sender
        else:
            p = jnp.concatenate(
                [e.perm_by_sender,
                 jnp.arange(e_pad, em, dtype=e.perm_by_sender.dtype)]
            )
        perm.append(p)
        snd_sorted.append(jnp.take(snd[-1], p))
        norm.append(pad_to(e.norm_scale, 0.0))
    return TypedEdges(
        senders=jnp.stack(snd),
        receivers=jnp.stack(rcv),
        mask=jnp.stack(msk),
        perm_by_sender=jnp.stack(perm),
        senders_sorted=jnp.stack(snd_sorted),
        norm_scale=jnp.stack(norm),
    )


def scan_types_wanted(graph: GraphBatch, strategy: str,
                      min_types: int = 8) -> bool:
    """Decide whether the per-type stage should run under lax.scan.

    "auto" engages the scan once the unrolled graph would hold many
    per-type blocks (L >= min_types, e.g. VarMisuse's 22) — below that,
    unrolling compiles fast anyway and avoids equal-padding waste.
    """
    if strategy in ("scan", "always"):
        return True
    if strategy in ("unroll", "never"):
        return False
    return graph.num_edge_types >= min_types


def scan_types_aggregate(
    graph: GraphBatch,
    te: TypedEdges,
    msgs_fn: Callable,
    xs,
    out_dim: int,
    aggregation: str,
    dtype=jnp.float32,
):
    """lax.scan over edge types with fused per-type aggregation.

    msgs_fn(xs_l, te_l) -> [Em, out_dim] per-edge messages for one type
    (te_l is a TypedEdges slice without the leading axis). The carry
    accumulates the named aggregation (reference semantics:
    utils/utils.py:23-33) into [n_pad(+dump), out_dim]; padded edges land
    in the dump row via receiver == n_pad.
    """
    n_pad = graph.n_pad
    is_max = aggregation in ("max", "unsorted_segment_max")
    if is_max:
        init = jnp.full((n_pad + 1, out_dim), jnp.finfo(dtype).min, dtype)
    else:
        init = jnp.zeros((n_pad + 1, out_dim), dtype)

    def body(carry, inp):
        xs_l, te_l = inp
        m = msgs_fn(xs_l, te_l)
        if is_max:
            part = jax.ops.segment_max(
                m, te_l.receivers, n_pad + 1, indices_are_sorted=True
            )
            carry = jnp.maximum(carry, part)
        else:
            carry = carry + jax.ops.segment_sum(
                m, te_l.receivers, n_pad + 1, indices_are_sorted=True
            )
        return carry, None

    agg = jax.lax.scan(body, init, (xs, te))[0][:n_pad]
    if aggregation in ("sum", "unsorted_segment_sum"):
        return agg
    if is_max:
        return jnp.maximum(agg, jnp.finfo(dtype).min)
    if aggregation in ("mean", "unsorted_segment_mean",
                       "sqrt_n", "unsorted_segment_sqrt_n"):
        count = jnp.maximum(graph.typed_incoming_counts.sum(axis=0), 1.0)
        if aggregation.endswith("sqrt_n"):
            count = jnp.sqrt(count)
        return agg / count[:, None]
    raise ValueError("Unknown aggregation function '%s'!" % aggregation)
