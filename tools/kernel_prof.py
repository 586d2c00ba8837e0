"""Microbenchmark: component timing for the FiLM fused path at PPI bench shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.ops import ranked_segment as rs

E = 266240  # 130 * 2048
D = 320
NPAD = 6144
L = 3
RPAD = rs.fine_rank_table_rows(NPAD, L, E, 256)
print("RPAD:", RPAD, "splits:", rs.film_column_splits(E, D, RPAD))

rng = np.random.RandomState(0)
# gap-free nondecreasing fine ranks
ngroups = min(L * (NPAD + 1), E)
ranks = np.sort(rng.randint(0, ngroups, size=E)).astype(np.int32)
# make gap-free
uniq, inv = np.unique(ranks, return_inverse=True)
ranks = inv.astype(np.int32)
msgs = jnp.asarray(rng.randn(E, D), jnp.bfloat16)
gb = jnp.asarray(rng.randn(RPAD, 2 * D), jnp.float32)
g_tab = jnp.asarray(rng.randn(RPAD, D), jnp.float32)
ranks_j = jnp.asarray(ranks)


def _fetch(out):
    # On this relay platform block_until_ready does not synchronize; a
    # host fetch of one element does.
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / reps * 1e3
    print("%-28s %8.2f ms" % (name, dt))
    return dt


fwd = jax.jit(lambda m, t, r: rs.film_ranked_aggregate(m, t, r, "relu"))
timeit("film fwd kernel", fwd, msgs, gb, ranks_j)

xla_fwd = jax.jit(lambda m, t, r: rs.xla_film_aggregate(m, t, r, "relu"))
timeit("film fwd XLA oracle", xla_fwd, msgs, gb, ranks_j)


def fwd_bwd(m, t, r):
    def loss(m, t):
        return rs.film_ranked_aggregate(m, t, r, "relu").sum()
    return jax.grad(loss, argnums=(0, 1))(m, t)


timeit("film fwd+bwd kernel", jax.jit(fwd_bwd), msgs, gb, ranks_j)


def xla_fwd_bwd(m, t, r):
    def loss(m, t):
        return rs.xla_film_aggregate(m, t, r, "relu").sum()
    return jax.grad(loss, argnums=(0, 1))(m, t)


timeit("film fwd+bwd XLA", jax.jit(xla_fwd_bwd), msgs, gb, ranks_j)

# plain ranked segsum for scale
timeit("segsum kernel", jax.jit(
    lambda m, r: rs.ranked_segment_sum_table(m, r, RPAD)), msgs, ranks_j)
timeit("segsum XLA sorted", jax.jit(
    lambda m, r: rs.xla_segment_sum_table(m, r, RPAD)), msgs, ranks_j)
timeit("expand kernel", jax.jit(
    lambda t, r: rs.ranked_expand_table(t, r, RPAD)), g_tab, ranks_j)

# typed transform cost
h = jnp.asarray(rng.randn(NPAD, D), jnp.float32)
W = jnp.asarray(rng.randn(L, D, D), jnp.float32)
W2 = jnp.asarray(rng.randn(L, D, 2 * D), jnp.float32)
tt = jax.jit(lambda h, W, W2: (jnp.einsum("nd,lde->lne", h, W),
                               jnp.einsum("nd,lde->lne", h, W2)))
timeit("typed transforms (f32)", tt, h, W, W2)

# gather [E,D] from [L*NPAD, D]
tbl = jnp.asarray(rng.randn(L * NPAD, D), jnp.bfloat16)
idx = jnp.asarray(rng.randint(0, L * NPAD, size=E), jnp.int32)
timeit("gather E x D bf16", jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx)
