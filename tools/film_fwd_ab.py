"""A/B harness for FiLM streaming-kernel variants on real TPU.

The round-4 roofline (docs/PERFORMANCE.md "GNN-FiLM ceiling") puts the
shipping fwd kernel at 2.0x and the dgb kernel at 2.1x of their byte
floors, naming sub-block RMW serialization and one-hot latency as the
slack. This tool measures variants that attack exactly that:

* v2a "scratch": per-sub-block accumulate dots land in a [sub*win, D]
  VMEM scratch; ONE read-modify-write of the output table per grid step
  (vs 8 chained RMWs of overlapping slabs).
* v2b "stepdot": per-sub-block expand + modulate into a [STEP, D] bf16
  buffer (no cross-sub dependency), then ONE [sub*win, STEP] x [STEP, D]
  accumulate dot + ONE RMW per grid step.

Timing: K in-jit repetitions per measurement (the relay adds ~2 ms per
host dispatch, which drowns sub-ms kernel deltas; chaining the reps
through a scalar perturbation of the small table forces re-execution
without adding stream-sized work).

Usage: PYTHONPATH=/root/.axon_site:. python tools/film_fwd_ab.py [E] [D]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_gnn_samples_tpu.ops import ranked_segment as rs

STEP = rs.STEP


# ---------------------------------------------------------------------------
# Variant kernels
# ---------------------------------------------------------------------------


def _fwd_kernel_v2a(start_ref, rank_ref, msg_ref, gb_ref, out_ref, acc_ref,
                    *, be, rl, sub, d, act, rls):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = pl.multiple_of(start_ref[c * sub], 8)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        off = pl.multiple_of(start - base, 8)
        oh = rs._local_onehot(rank_ref[s, :], start, rl, be)
        oh_t = rs._local_onehot_t(rank_ref[s, :], start, rl, be)
        gb_slab = gb_ref[pl.ds(start, rl), :].astype(jnp.bfloat16)
        gb_e = jnp.dot(oh_t, gb_slab, preferred_element_type=jnp.float32)
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        z = gb_e[:, :d] * m + gb_e[:, d:]
        a = act(z).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = acc_ref[pl.ds(off, rl), :]
        acc_ref[pl.ds(off, rl), :] = cur + contrib
    cur = out_ref[pl.ds(base, rls), :]
    out_ref[pl.ds(base, rls), :] = cur + acc_ref[:]


def _fwd_kernel_v2b(start_ref, rank_ref, msg_ref, gb_ref, out_ref, a_ref,
                    *, be, rl, sub, d, act, rls):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = pl.multiple_of(start_ref[c * sub], 8)
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        oh_t = rs._local_onehot_t(rank_ref[s, :], start, rl, be)
        gb_slab = gb_ref[pl.ds(start, rl), :].astype(jnp.bfloat16)
        gb_e = jnp.dot(oh_t, gb_slab, preferred_element_type=jnp.float32)
        m = msg_ref[pl.ds(s * be, be), :].astype(jnp.float32)
        z = gb_e[:, :d] * m + gb_e[:, d:]
        a_ref[pl.ds(s * be, be), :] = act(z).astype(jnp.bfloat16)
    lr = rank_ref[:].reshape(1, sub * be) - base
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rls, sub * be), 0)
    oh_step = (lr == iota_r).astype(jnp.bfloat16)
    contrib = jnp.dot(oh_step, a_ref[:], preferred_element_type=jnp.float32)
    cur = out_ref[pl.ds(base, rls), :]
    out_ref[pl.ds(base, rls), :] = cur + contrib


def _fwd_kernel_v3(start_ref, rank_ref, msg_ref, gb_ref, out_ref,
                   *, be, rl, sub, d, act, group):
    """Grouped dot-blocks: `group` 256-edge rows per dot (bd = group * be
    edges), window rlg = group * win (static union bound of the per-row
    windows). One expand dot, one accumulate dot, one RMW per dot-block —
    (sub / group) x fewer, larger MXU ops per grid step."""
    c = pl.program_id(0)
    bd = group * be
    rlg = group * rl

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for gidx in range(sub // group):
        row0 = gidx * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        lr = rank_ref[row0:row0 + group, :] - start  # [group, be]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (group, be, rlg), 2)
        oh_t = (lr[:, :, None] == iota_t).reshape(bd, rlg).astype(
            jnp.bfloat16)
        gb_slab = gb_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        gb_e = jnp.dot(oh_t, gb_slab, preferred_element_type=jnp.float32)
        m = msg_ref[pl.ds(gidx * bd, bd), :].astype(jnp.float32)
        z = gb_e[:, :d] * m + gb_e[:, d:]
        a = act(z).astype(jnp.bfloat16)
        # oh in [rlg, bd] layout: ranks along lanes via row concat.
        lr_row = jnp.concatenate(
            [rank_ref[row0 + r:row0 + r + 1, :] for r in range(group)],
            axis=1,
        ) - start  # [1, bd]
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (rlg, bd), 0)
        oh = (lr_row == iota_r).astype(jnp.bfloat16)
        contrib = jnp.dot(oh, a, preferred_element_type=jnp.float32)
        cur = out_ref[pl.ds(start, rlg), :]
        out_ref[pl.ds(start, rlg), :] = cur + contrib


def _impl_v3(msgs, gb_table, ranks, *, block_edges, act, win, group):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rpad = gb_table.shape[0]
    assert group * win <= be + 8
    blocks, starts = rs._chunk_inputs(ranks, be)
    kern = functools.partial(_fwd_kernel_v3, be=be, rl=win, sub=sub, d=dim,
                             act=rs._ACTS[act][0], group=group)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=rs._common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, dim), jnp.float32),
        compiler_params=rs._params(
            rpad * (rs._ceil_mult(2 * dim, 128) * 2
                    + rs._ceil_mult(dim, 128) * 4)),
        interpret=rs._interpret(),
    )(starts, blocks, msgs, gb_table)


def _dgb_kernel_v3(start_ref, rank_ref, msg_ref, gbg_ref, dgb_ref,
                   *, be, rl, sub, d, dact, group):
    c = pl.program_id(0)
    bd = group * be
    rlg = group * rl

    @pl.when(c == 0)
    def _():
        dgb_ref[:] = jnp.zeros_like(dgb_ref)

    for gidx in range(sub // group):
        row0 = gidx * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        lr = rank_ref[row0:row0 + group, :] - start
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (group, be, rlg), 2)
        oh_t = (lr[:, :, None] == iota_t).reshape(bd, rlg).astype(
            jnp.bfloat16)
        slab = gbg_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        e_vals = jnp.dot(oh_t, slab, preferred_element_type=jnp.float32)
        gamma, beta, g = (e_vals[:, :d], e_vals[:, d:2 * d],
                          e_vals[:, 2 * d:])
        m = msg_ref[pl.ds(gidx * bd, bd), :].astype(jnp.float32)
        z = gamma * m + beta
        dz = dact(z) * g
        dgamma_e = (m * dz).astype(jnp.bfloat16)
        dbeta_e = dz.astype(jnp.bfloat16)
        lr_row = jnp.concatenate(
            [rank_ref[row0 + r:row0 + r + 1, :] for r in range(group)],
            axis=1,
        ) - start
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (rlg, bd), 0)
        oh = (lr_row == iota_r).astype(jnp.bfloat16)
        contrib = jnp.dot(
            oh, jnp.concatenate([dgamma_e, dbeta_e], axis=1),
            preferred_element_type=jnp.float32,
        )
        cur = dgb_ref[pl.ds(start, rlg), :]
        dgb_ref[pl.ds(start, rlg), :] = cur + contrib


def _dgb_kernel_v4(start_ref, rank_ref, msg_ref, gbg_ref, dgb_ref,
                   *, be, rl, sub, d, dact, group):
    """Like v3 but TWO accumulate dots (dgamma, dbeta) instead of one
    concat + dot — the [bd, 2D] concat copies 2 x [bd, D] bf16 in VMEM."""
    c = pl.program_id(0)
    bd = group * be
    rlg = group * rl

    @pl.when(c == 0)
    def _():
        dgb_ref[:] = jnp.zeros_like(dgb_ref)

    for gidx in range(sub // group):
        row0 = gidx * group
        start = pl.multiple_of(start_ref[c * sub + row0], 8)
        oh_t = rs._grouped_onehot_t(rank_ref, row0, group, start, rl, be)
        slab = gbg_ref[pl.ds(start, rlg), :].astype(jnp.bfloat16)
        e_vals = jnp.dot(oh_t, slab, preferred_element_type=jnp.float32)
        gamma, beta, g = (e_vals[:, :d], e_vals[:, d:2 * d],
                          e_vals[:, 2 * d:])
        m = msg_ref[pl.ds(row0 * be, bd), :].astype(jnp.float32)
        z = gamma * m + beta
        dz = dact(z) * g
        oh = rs._grouped_onehot(rank_ref, row0, group, start, rl, be)
        cg = jnp.dot(oh, (m * dz).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        cb = jnp.dot(oh, dz.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        cur = dgb_ref[pl.ds(start, rlg), :]
        dgb_ref[pl.ds(start, rlg), :d] = cur[:, :d] + cg
        dgb_ref[pl.ds(start, rlg), d:] = cur[:, d:] + cb


def _impl_dgb_v4(msgs, gbg_table, ranks, *, block_edges, act, win, group):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rpad = gbg_table.shape[0]
    assert group * win <= be + 8
    blocks, starts = rs._chunk_inputs(ranks, be)
    kern = functools.partial(_dgb_kernel_v4, be=be, rl=win, sub=sub, d=dim,
                             dact=rs._ACTS[act][1], group=group)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=rs._common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, 2 * dim), jnp.float32),
        compiler_params=rs._params(
            rpad * (rs._ceil_mult(3 * dim, 128) * 2
                    + rs._ceil_mult(2 * dim, 128) * 4)),
        interpret=rs._interpret(),
    )(starts, blocks, msgs, gbg_table)


def _impl_dgb_v3(msgs, gbg_table, ranks, *, block_edges, act, win, group):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rpad = gbg_table.shape[0]
    assert group * win <= be + 8
    blocks, starts = rs._chunk_inputs(ranks, be)
    kern = functools.partial(_dgb_kernel_v3, be=be, rl=win, sub=sub, d=dim,
                             dact=rs._ACTS[act][1], group=group)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=rs._common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, 2 * dim), jnp.float32),
        compiler_params=rs._params(
            rpad * (rs._ceil_mult(3 * dim, 128) * 2
                    + rs._ceil_mult(2 * dim, 128) * 4)),
        interpret=rs._interpret(),
    )(starts, blocks, msgs, gbg_table)


def _impl(kern_body, variant, msgs, gb_table, ranks, *, block_edges, act,
          win):
    e, dim = msgs.shape
    be = block_edges
    sub = STEP // be
    rl = win
    rls = sub * win
    assert rls <= be + 8, (rls, be)
    rpad = gb_table.shape[0]
    blocks, starts = rs._chunk_inputs(ranks, be)
    kern = functools.partial(kern_body, be=be, rl=rl, sub=sub, d=dim,
                             act=rs._ACTS[act][0], rls=rls)
    scratch_dtype = jnp.float32 if variant == "a" else jnp.bfloat16
    scratch_shape = (rls, dim) if variant == "a" else (STEP, dim)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=rs._common_specs(sub, be) + [
            pl.BlockSpec((STEP, dim), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rpad, dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM(scratch_shape, scratch_dtype)],
        compiler_params=rs._params(
            rpad * (rs._ceil_mult(2 * dim, 128) * 2
                    + rs._ceil_mult(dim, 128) * 4)),
        interpret=rs._interpret(),
    )(starts, blocks, msgs, gb_table)


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------


def make_stream(e, n_groups, seed=0):
    rng = np.random.RandomState(seed)
    sizes = rng.multinomial(e - n_groups, np.ones(n_groups) / n_groups) + 1
    ranks = np.repeat(np.arange(n_groups, dtype=np.int32), sizes)
    return jnp.asarray(ranks)


def bench(name, fn, msgs, gb, ranks, reps=30):
    """K in-jit executions chained through a table perturbation."""

    @jax.jit
    def run(msgs, gb, ranks):
        def body(i, carry):
            acc, gbi = carry
            out = fn(msgs, gbi, ranks)
            eps = out[0, 0] * 1e-30
            return acc + out[0, 0], gbi + eps.astype(gbi.dtype)

        acc, _ = jax.lax.fori_loop(0, reps, body, (0.0, gb))
        return acc

    out = run(msgs, gb, ranks)
    np.asarray(jax.device_get(out))
    t0 = time.time()
    out = run(msgs, gb, ranks)
    np.asarray(jax.device_get(out))
    dt = (time.time() - t0) / reps * 1e3
    print("%-24s %7.3f ms" % (name, dt), flush=True)
    return dt


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    n_groups = e // 16
    win = 32

    ranks = make_stream(e, n_groups)
    rpad = rs.rank_table_rows(n_groups + 1, 256)
    key = jax.random.PRNGKey(0)
    msgs = jax.random.normal(key, (e, d), jnp.bfloat16)
    gb = jax.random.normal(key, (rpad, 2 * d), jnp.bfloat16)

    base = lambda m, g, r: rs._film_fwd_impl(
        m, g, r, block_edges=256, act="relu", win=win)
    v2a = lambda m, g, r: _impl(_fwd_kernel_v2a, "a", m, g, r,
                                block_edges=256, act="relu", win=win)
    v2b = lambda m, g, r: _impl(_fwd_kernel_v2b, "b", m, g, r,
                                block_edges=256, act="relu", win=win)

    variants = [("v2a", v2a), ("v2b", v2b)]
    for group in (2, 4, 8):
        variants.append((
            "v3 g=%d" % group,
            functools.partial(_impl_v3, block_edges=256, act="relu",
                              win=win, group=group),
        ))

    # correctness first
    ref = np.asarray(base(msgs, gb, ranks))
    for name, fn in variants:
        got = np.asarray(fn(msgs, gb, ranks))
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print("%s max rel err vs base: %.2e" % (name, err))

    bench("fwd base", base, msgs, gb, ranks)
    for name, fn in variants:
        bench("fwd " + name, fn, msgs, gb, ranks)

    # dgb backward kernel
    gbg = jax.random.normal(key, (rpad, 3 * d), jnp.bfloat16)
    dgb_base = lambda m, g, r: rs._film_bwd_dgb_impl(
        m, g, r, block_edges=256, act="relu", win=win)
    ref = np.asarray(dgb_base(msgs, gbg, ranks))
    dgb_vars = [
        ("g=%d" % grp,
         functools.partial(_impl_dgb_v3, block_edges=256, act="relu",
                           win=win, group=grp))
        for grp in (2, 4, 8)
    ] + [
        ("v4 g=%d" % grp,
         functools.partial(_impl_dgb_v4, block_edges=256, act="relu",
                           win=win, group=grp))
        for grp in (2, 4)
    ]
    for name, fn in dgb_vars:
        got = np.asarray(fn(msgs, gbg, ranks))
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print("dgb %s max rel err vs base: %.2e" % (name, err))
    bench("dgb base", dgb_base, msgs, gbg, ranks)
    for name, fn in dgb_vars:
        bench("dgb v3 " + name, fn, msgs, gbg, ranks)


if __name__ == "__main__":
    main()
