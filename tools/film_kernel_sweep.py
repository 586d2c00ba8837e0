"""Sweep the FiLM streaming kernels' block parameters on real TPU.

Times _film_fwd_impl / _film_bwd_dgb_impl / _film_src_bwd_impl on a
synthetic receiver-sorted rank stream with PPI-bench statistics
(E ~ 300k, D = 320, fine window ~ 32) across (STEP, block_edges)
combinations, to pick the per-grid-step work size. STEP is monkeypatched
(module constant); block_edges is a call argument.

Usage: python tools/film_kernel_sweep.py [E] [D]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.ops import ranked_segment as rs


def make_stream(e, n_groups, seed=0):
    """Gap-free nondecreasing ranks over e edges and n_groups groups."""
    rng = np.random.RandomState(seed)
    sizes = rng.multinomial(e - n_groups, np.ones(n_groups) / n_groups) + 1
    ranks = np.repeat(np.arange(n_groups, dtype=np.int32), sizes)
    return jnp.asarray(ranks)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x[:1, :1]) if hasattr(x, "shape") else x, out
    )
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x[:1, :1]) if hasattr(x, "shape") else x, out
    )
    return (time.time() - t0) / reps * 1e3


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    n_groups = e // 16  # PPI-ish: ~16 edges per (receiver, type) group
    win = 32

    ranks = make_stream(e, n_groups)
    rpad = rs.rank_table_rows(n_groups + 1, 256)
    key = jax.random.PRNGKey(0)
    msgs = jax.random.normal(key, (e, d), jnp.bfloat16)
    gb = jax.random.normal(key, (rpad, 2 * d), jnp.bfloat16)
    gbg = jax.random.normal(key, (rpad, 3 * d), jnp.bfloat16)

    base_step = rs.STEP
    for step in (2048, 4096, 8192):
        for be in (256, 512):
            if be > step:
                continue
            rs.STEP = step
            # new jit caches per (static) args; block_edges is static.
            try:
                t_fwd = timeit(
                    lambda m, g, r: rs._film_fwd_impl(
                        m, g, r, block_edges=be, act="relu", win=win),
                    msgs, gb, ranks)
                t_dgb = timeit(
                    lambda m, g, r: rs._film_bwd_dgb_impl(
                        m, g, r, block_edges=be, act="relu", win=win),
                    msgs, gbg, ranks)
                print("STEP=%5d be=%3d  fwd %.3f ms  dgb %.3f ms"
                      % (step, be, t_fwd, t_dgb), flush=True)
            except Exception as ex:  # noqa: BLE001 - report and continue
                print("STEP=%5d be=%3d  FAILED: %s"
                      % (step, be, str(ex)[:120]), flush=True)
    rs.STEP = base_step


if __name__ == "__main__":
    main()
