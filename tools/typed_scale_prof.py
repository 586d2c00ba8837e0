"""Compile-time + step-time at VarMisuse-scale edge-type counts (L=22).

The reference unrolls per-type compute L (x channels) times; SURVEY/VERDICT
ask for evidence that compile time here stays flat in L (lax.scan typed
streams / flat-stream kernels) while throughput holds. Times jit TRACE+
COMPILE (first call) and steady step for each family under
typed_edge_scan in {"auto", "scan", "unroll"}.

Usage: python tools/typed_scale_prof.py [RGIN|GNN-Edge-MLP|RGDCN|...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def make_batch(rng, L=22, n=18000, n_pad=None, deg_per_type=2, d_feat=128):
    from tf_gnn_samples_tpu.ops.graph import bucket_size, pad_graph_batch

    adj = []
    for _l in range(L - 1):
        e = n * deg_per_type
        adj.append(np.stack([rng.randint(0, n, size=e),
                             rng.randint(0, n, size=e)], axis=1
                            ).astype(np.int32))
    # self-loop type (VarMisuse has NextToken/self-style types):
    sl = np.arange(n, dtype=np.int32)
    adj.append(np.stack([sl, sl], axis=1))
    feats = rng.randn(n, d_feat).astype(np.float32)
    gids = np.zeros(n, dtype=np.int32)
    n_pad = n_pad or bucket_size(n)
    e_pads = [bucket_size(a.shape[0], min_size=2048) for a in adj]
    return pad_graph_batch(feats, adj, gids, 1, n_pad=n_pad, e_pads=e_pads,
                           g_pad=16)


def main():
    import jax
    import jax.numpy as jnp
    from tf_gnn_samples_tpu.nn.layers import LAYERS

    family = sys.argv[1] if len(sys.argv) > 1 else "RGIN"
    name_map = {"RGIN": "rgin", "GNN-Edge-MLP": "gnn_edge_mlp",
                "RGDCN": "rgdcn", "GNN-FiLM": "gnn_film", "RGCN": "rgcn",
                "GGNN": "ggnn", "RGAT": "rgat"}
    layer_name = name_map[family]
    init_fn, apply_fn = LAYERS[layer_name]

    rng = np.random.RandomState(0)
    graph = make_batch(rng)
    L, d = graph.num_edge_types, 128
    params = init_fn(jax.random.PRNGKey(0), L, d)
    h = jnp.asarray(rng.randn(graph.n_pad, d).astype(np.float32))
    edges = sum(int(e.mask.sum()) for e in graph.edges)
    print("L=%d n_pad=%d real_edges=%d" % (L, graph.n_pad, edges))

    for strategy in ("auto", "scan", "unroll"):
        def loss(p, hh):
            out = apply_fn(p, graph, hh, typed_edge_scan=strategy)
            return jnp.sum(out * out)

        step = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t0 = time.time()
        try:
            g = step(params, h)
            fetch(g)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print("%-8s FAILED: %s" % (strategy, str(exc)[:120]))
            continue
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            g = step(params, h)
        fetch(g)
        dt = (time.time() - t0) / reps
        print("%-8s compile %6.1f s   fwd+bwd step %7.2f ms   %6.2fM edges/s"
              % (strategy, compile_s, dt * 1e3, edges / dt / 1e6))


if __name__ == "__main__":
    main()
