"""Does index locality change the XLA row-gather rate? (round-5 probe)

The round-4 roofline queued a 'locality/degree-sorted edge layout' as the
only idea that could move the per-edge-take ceiling (fewer/cheaper random
row accesses per edge). This measures the premise directly: one
[N, D] bf16 table gathered with E indices that are (a) random,
(b) globally sorted, (c) sorted within 2048-edge blocks, and
(d) repeated-run (each index repeated ~mean-degree times consecutively —
the best case any degree-sorted layout could manufacture).

Measured on v5e (docs/PERFORMANCE.md "edge-layout" section): all four
run at the same rate (repeated runs slightly SLOWER) — the gather's
per-row cost is index-pattern independent, so no edge reordering can
beat the row-rate floor. The src-stream DILUTION (ops/graph.py sd_*)
is the layout change that did land: it buys back the kernel window, not
the gather rate.

Usage: PYTHONPATH=/root/.axon_site:. python tools/gather_locality_prof.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    e, d, n = 301056, 320, 38400  # FiLM bench shapes; table ~ L * n_pad
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.randn(n, d), jnp.bfloat16)

    idx_rand = rng.randint(0, n, size=e).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    idx_blk = idx_rand.copy()
    for s in range(0, e, 2048):
        idx_blk[s:s + 2048] = np.sort(idx_blk[s:s + 2048])
    reps = np.maximum(rng.poisson(14, size=e // 14 + 100), 1)
    vals = rng.randint(0, n, size=len(reps)).astype(np.int32)
    idx_rep = np.repeat(vals, reps)[:e].astype(np.int32)

    @jax.jit
    def run(idx, t):
        def body(i, carry):
            acc, tt = carry
            out = jnp.take(tt, idx, axis=0)
            return (acc + out[0, 0].astype(jnp.float32),
                    tt + (out[0, 0] * 1e-30).astype(tt.dtype))

        acc, _ = jax.lax.fori_loop(0, 30, body, (jnp.float32(0), t))
        return acc

    for name, idx in (("random", idx_rand), ("sorted", idx_sort),
                      ("block-sorted", idx_blk), ("repeated-runs", idx_rep)):
        ix = jnp.asarray(idx)
        np.asarray(run(ix, tbl))
        t0 = time.time()
        np.asarray(run(ix, tbl))
        dt = (time.time() - t0) / 30
        print("%-14s %7.3f ms  %6.1fM rows/s"
              % (name, dt * 1e3, e / dt / 1e6))


if __name__ == "__main__":
    main()
