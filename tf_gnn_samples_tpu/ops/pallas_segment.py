"""Pallas TPU kernel: streaming segmented sum over a sorted edge stream.

The hot aggregation op — the reference's `tf.unsorted_segment_sum` over
per-edge messages (utils/utils.py:23-33, gnns/rgcn.py:108-112) — is a
scatter-add, which XLA lowers conservatively on TPU (~100-160 GB/s
effective of 819 GB/s HBM peak measured on v5e). This kernel exploits the
canonical receiver-sorted layout (ops/graph.py) to turn the scatter into a
*stream*:

* Receiver ids are RANK-COMPRESSED on the host (gap-free, nondecreasing:
  `FlatEdges.rcv_rank`), so any window of C consecutive edges spans at
  most C distinct output rows.
* The kernel walks the edge stream in chunks of C rows (perfect
  sequential DMA of the [C, D] message block), computes the chunk's
  per-rank partial sums as ONE [C, C] x [C, D] one-hot matmul on the MXU,
  and accumulates into a sliding [2C, D] VMEM window.
* When the stream's rank base advances past the window's first half, that
  half is flushed to HBM with a WRITE-ONLY DMA (each rank's edges are
  contiguous, so a flushed row can never receive further contributions).

Total HBM traffic = one sequential read of the messages + one write of
the output — the memory-bound optimum in principle. MEASURED on v5e
(1M x 256 f32): this v1 kernel does NOT yet beat XLA's sorted
segment-sum (~86ms vs ~13ms) — the one-hot matmuls at exact precision and
the synchronous flush DMAs dominate — so it is NOT wired into the default
layer path. It is kept as a correctness-tested foundation; the known
remaining optimizations are a VPU compare-select accumulation replacing
the one-hot matmul, deferred (overlapped) flush waits, and double-buffered
manual streaming of the message blocks.

The public wrapper `aggregate_flat_sum_pallas` is a drop-in for
`ops.edge_ops.aggregate_flat_sum` with a custom VJP (the backward of a
segment-sum is a gather over the sorted receivers — already fast).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Chunk size C: the one-hot matmuls are 2 x [C, C] x [C, D]; their FLOPs
# scale linearly in C (E * 2C * D * 2 total), so keep C modest while
# keeping the DMA stream efficient. Edge pads are multiples of 512
# (tasks.base spec), which is a multiple of every CHUNK choice here.
CHUNK = 256
# Chunks processed per grid step (unrolled in the kernel body) — amortizes
# the per-grid-step overhead that dominated the single-chunk variant.
CHUNKS_PER_STEP = 8
BLOCK = CHUNK * CHUNKS_PER_STEP


def _segsum_kernel(ranks_ref, msgs_ref, out_ref, acc, state, sem):
    """Grid: (num_chunks,). Blocks: ranks [C, 1] int32, msgs [C, D] f32.
    out_ref: full [U_out/C, C, D] in HBM (ANY), written one [C, D] page at
    a time. acc: [2, C, D] VMEM sliding window (two halves). state: SMEM
    [1] int32 = index of the window's first page (= base rank / C).
    Sequential grid guarantees flush ordering. All DMA endpoints are
    full-extent subarrays (Mosaic cannot slice a lane-misaligned D)."""
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    C = CHUNK

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        state[0] = 0

    k_ids = jax.lax.broadcasted_iota(jnp.int32, (C, C), dimension=0)
    for b in range(CHUNKS_PER_STEP):  # unrolled: static sub-chunk offsets
        ranks = ranks_ref[b * C : (b + 1) * C, 0]  # [C]
        base = ranks[0]

        # Slide the window if this sub-chunk's base has moved past the
        # first half. Rank bases advance by at most C per chunk (a chunk
        # of C sorted, gap-free ranks spans <= C-1), so one slide always
        # suffices.
        @pl.when(base - state[0] * C >= C)
        def _slide():
            flush = pltpu.make_async_copy(
                acc.at[0], out_ref.at[state[0]], sem
            )
            flush.start()
            flush.wait()
            acc[0] = acc[1]
            acc[1] = jnp.zeros_like(acc[1])
            state[0] = state[0] + 1

        # Sub-chunk ranks relative to the window base lie in [0, 2C).
        # One-hot selection against each STATIC window half (Mosaic cannot
        # vector-load at a dynamic sublane offset), partials as two MXU
        # matmuls. HIGHEST precision: the MXU's default single-pass bf16
        # would round the messages (the one-hot selection must be exact).
        rel = ranks[None, :] - state[0] * C  # [1, C] in [0, 2C)
        msgs = msgs_ref[b * C : (b + 1) * C, :]
        s_lo = (rel == k_ids).astype(msgs.dtype)
        s_hi = (rel == k_ids + C).astype(msgs.dtype)
        # HIGHEST precision: the MXU's default single-pass bf16 would
        # round the messages (the one-hot selection must stay exact).
        acc[0] = acc[0] + jnp.dot(
            s_lo, msgs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc[1] = acc[1] + jnp.dot(
            s_hi, msgs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(i == n_chunks - 1)
    def _final_flush():
        f1 = pltpu.make_async_copy(acc.at[0], out_ref.at[state[0]], sem)
        f1.start()
        f1.wait()
        f2 = pltpu.make_async_copy(acc.at[1], out_ref.at[state[0] + 1], sem)
        f2.start()
        f2.wait()


@functools.partial(jax.jit, static_argnames=("u_out", "interpret"))
def ranked_segment_sum(msgs, ranks, *, u_out: int, interpret: bool = False):
    """Sum rows of `msgs` [E, D] by gap-free sorted `ranks` [E] into
    [u_out, D]. E must be a multiple of CHUNK; u_out must be a multiple of
    CHUNK with >= max(rank) + C + 1 headroom (rows past the final flush
    are unwritten)."""
    E, D = msgs.shape
    assert E % BLOCK == 0, (E, BLOCK)
    assert u_out % CHUNK == 0, u_out
    n_steps = E // BLOCK
    out = pl.pallas_call(
        _segsum_kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((u_out // CHUNK, CHUNK, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, D), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ranks.reshape(E, 1), msgs)
    return out.reshape(u_out, D)


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _aggregate_pallas(messages, flat_receivers, flat_rank, node_to_rank,
                      node_has_incoming, interpret):
    n_pad = node_to_rank.shape[0]
    u_out = _round_up(n_pad + 2 * CHUNK + 1, CHUNK)
    compact = ranked_segment_sum(
        messages, flat_rank, u_out=u_out, interpret=interpret
    )
    gathered = jnp.take(compact, node_to_rank, axis=0, mode="clip")
    return jnp.where(node_has_incoming[:, None] > 0, gathered, 0.0)


def _aggregate_pallas_fwd(messages, flat_receivers, flat_rank, node_to_rank,
                          node_has_incoming, interpret):
    out = _aggregate_pallas(messages, flat_receivers, flat_rank,
                            node_to_rank, node_has_incoming, interpret)
    return out, (flat_receivers,)


def _aggregate_pallas_bwd(interpret, res, g):
    (receivers,) = res
    # d messages[e] = g[receivers[e]]: a gather over SORTED indices.
    g_pad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0)
    d_msgs = jnp.take(g_pad, receivers, axis=0, mode="clip")
    return (d_msgs, None, None, None, None)


_aggregate_pallas.defvjp(_aggregate_pallas_fwd, _aggregate_pallas_bwd)


def aggregate_flat_sum_pallas(messages, flat, graph, interpret: bool = None):
    """Drop-in for ops.edge_ops.aggregate_flat_sum using the streaming
    Pallas kernel. messages: [E_tot, D] receiver-sorted per-edge values.
    Returns [n_pad, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if messages.ndim != 2 or messages.shape[0] % BLOCK != 0 or (
        not interpret and messages.shape[1] % 128 != 0
    ):
        # Static fallback for shapes the kernel does not cover. The lane
        # (feature) dim must be a multiple of 128 on real TPUs: Mosaic
        # cannot DMA lane-misaligned pages (hidden sizes 128/256/384/...
        # qualify; e.g. the PPI-tuned 320 falls back — that scale is
        # served by the dense-MXU strategy anyway).
        from .edge_ops import aggregate_flat_sum

        return aggregate_flat_sum(messages, flat, graph.n_pad)
    return _aggregate_pallas(
        messages, flat.receivers, flat.rcv_rank, graph.node_to_rank,
        graph.node_has_incoming, bool(interpret),
    )
