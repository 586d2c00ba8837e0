"""Microbenchmark: per-edge random row gather strategies on TPU.

The FiLM/EMLP streaming layers pay one XLA row gather per [E, D] per-edge
stream (measured ~325M rows/s from a VMEM-stageable source — the "reorder
wall", docs/PERFORMANCE.md). This tool measures whether a Pallas kernel
can beat that by gathering rows from a VMEM-RESIDENT table while
streaming, so the [E, D] stream never exists in HBM:

  xla_take        jnp.take(table, idx) baseline (writes [E, D] to HBM)
  kernel_loop     fori_loop of per-row dynamic reads from a resident table
  kernel_loop8    same, 8 rows per iteration (ILP)
  kernel_take     jnp.take on the loaded table value (Mosaic gather lowering)
  kernel_onehot   windowed one-hot MXU expand (the existing rank-table trick,
                  requires locality — measured here with window=32 as the
                  upper bound reference)

Run: python tools/rowgather_prof.py [E] [D] [ROWS]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEP = 2048


def _fetch(out):
    # On this relay platform block_until_ready does not synchronize; a
    # host fetch of one element does (see tools/kernel_prof.py).
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def _timed(fn, *args, iters=30):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


# --- XLA baseline -----------------------------------------------------------


@jax.jit
def xla_take(table, idx):
    return jnp.take(table, idx, axis=0, mode="clip")


# --- kernel: fori_loop row reads -------------------------------------------


def _loop_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=())
def kernel_loop(table, idx):
    e = idx.shape[0]
    d = table.shape[1]
    return pl.pallas_call(
        _loop_kernel,
        grid=(e // STEP,),
        in_specs=[
            pl.BlockSpec((STEP,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STEP, d), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, table)


# --- kernel: unrolled 8-wide loop -------------------------------------------


def _loop8_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        base = i * 8
        for k in range(8):
            out_ref[base + k, :] = table_ref[idx_ref[base + k], :]
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0] // 8, body, 0)


@jax.jit
def kernel_loop8(table, idx):
    e = idx.shape[0]
    d = table.shape[1]
    return pl.pallas_call(
        _loop8_kernel,
        grid=(e // STEP,),
        in_specs=[
            pl.BlockSpec((STEP,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STEP, d), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, table)


# --- kernel: jnp.take on loaded value (Mosaic gather lowering, if any) ------


def _take_kernel(idx_ref, table_ref, out_ref):
    tbl = table_ref[:]
    idx = idx_ref[:]
    out_ref[:] = jnp.take(tbl, idx, axis=0, mode="clip")


@jax.jit
def kernel_take(table, idx):
    e = idx.shape[0]
    d = table.shape[1]
    return pl.pallas_call(
        _take_kernel,
        grid=(e // STEP,),
        in_specs=[
            pl.BlockSpec((STEP,), lambda c: (c,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STEP, d), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, table)


# --- kernel: windowed one-hot (locality reference) ---------------------------


def _onehot_kernel(start_ref, idx_ref, table_ref, out_ref, *, be, win):
    c = pl.program_id(0)
    sub = STEP // be
    for s in range(sub):
        start = pl.multiple_of(start_ref[c * sub + s], 8)
        lr = idx_ref[s, :] - start
        iota = jax.lax.broadcasted_iota(jnp.int32, (be, win), 1)
        oh = (lr[:, None] == iota).astype(jnp.bfloat16)
        slab = table_ref[pl.ds(start, win), :].astype(jnp.bfloat16)
        out_ref[pl.ds(s * be, be), :] = jnp.dot(
            oh, slab, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("win",))
def kernel_onehot(table, idx_sorted, starts, win=32):
    e = idx_sorted.shape[0]
    d = table.shape[1]
    be = 256
    blocks = idx_sorted.reshape(e // be, be)
    kern = functools.partial(_onehot_kernel, be=be, win=win)
    return pl.pallas_call(
        kern,
        grid=(e // STEP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STEP // be, be), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STEP, d), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(starts, blocks, table)


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * STEP
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        name = np.dtype(dtype).name if dtype != jnp.bfloat16 else "bf16"
        table = jnp.asarray(rng.standard_normal((rows, d)), dtype=dtype)
        idx = jnp.asarray(rng.integers(0, rows, size=e), dtype=jnp.int32)
        # sorted windowed index stream for the one-hot reference:
        idx_s = np.sort(rng.integers(0, rows, size=e)).astype(np.int32)
        # remap to be gap-free-ish so 256-edge blocks span <= 24 values:
        span = np.repeat(np.arange(e // 256) * 12, 256)
        idx_w = (span + rng.integers(0, 12, size=e)).astype(np.int32)
        starts = jnp.asarray((idx_w.reshape(-1, 256)[:, 0] & ~7),
                             dtype=jnp.int32)
        idx_w = jnp.asarray(idx_w)

        print(f"--- dtype={name} E={e} D={d} rows={rows} ---")
        for label, fn, args in (
            ("xla_take", xla_take, (table, idx)),
            ("kernel_loop", kernel_loop, (table, idx)),
            ("kernel_loop8", kernel_loop8, (table, idx)),
            ("kernel_take", kernel_take, (table, idx)),
            ("kernel_onehot(win=32)", kernel_onehot, (table, idx_w, starts)),
        ):
            try:
                t = _timed(fn, *args)
                print(f"{label:24s} {t*1e3:8.3f} ms  "
                      f"{e/t/1e6:8.1f} M rows/s")
            except Exception as ex:  # noqa: BLE001 — report and continue
                msg = str(ex).splitlines()[0][:100]
                print(f"{label:24s} FAILED: {msg}")


if __name__ == "__main__":
    main()
