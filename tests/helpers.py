"""Shared test utilities: random typed graphs + padded batches."""

import numpy as np

from tf_gnn_samples_tpu.ops.graph import pad_graph_batch


def random_typed_graph(rng, num_nodes=13, num_edge_types=3, avg_degree=4, feat_dim=8):
    """Random graph in the reference's adjacency-list format."""
    adj_lists = []
    for _ in range(num_edge_types):
        e = max(1, int(rng.poisson(avg_degree * num_nodes / num_edge_types)))
        src = rng.integers(0, num_nodes, size=e)
        tgt = rng.integers(0, num_nodes, size=e)
        adj_lists.append(np.stack([src, tgt], axis=1).astype(np.int32))
    feats = rng.standard_normal((num_nodes, feat_dim)).astype(np.float32)
    return feats, adj_lists


def incoming_counts(adj_lists, num_nodes):
    counts = np.zeros((len(adj_lists), num_nodes), dtype=np.float32)
    for l, adj in enumerate(adj_lists):
        for _, tgt in adj:
            counts[l, tgt] += 1.0
    return counts


def make_batch(feats, adj_lists, n_pad=None, e_pad_extra=0, g_pad=None):
    n = feats.shape[0]
    return pad_graph_batch(
        feats,
        adj_lists,
        node_graph_ids=np.zeros(n, dtype=np.int32),
        num_graphs=1,
        n_pad=n_pad,
        e_pads=[a.shape[0] + e_pad_extra for a in adj_lists] if e_pad_extra else None,
        g_pad=g_pad,
    )
