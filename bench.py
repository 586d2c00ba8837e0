#!/usr/bin/env python
"""Headline benchmark: RGCN training throughput (edges/sec) at PPI scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's example RGCN train epoch on PPI processes
1,952,084 edges/sec on a V100 (reference README.md:34). The real PPI
dataset needs a download (zero egress here), so the bench generates
synthetic graphs with PPI's published size statistics (24 graphs,
~2372 nodes/graph, ~28 fwd edges/node, 50 features, 121 labels) and runs
the REAL PPI pipeline end-to-end (packing, padding, jitted train step)
with the tuned PPI_RGCN hyperparameters (hidden 320, 4 layers, batch
budget 12500 nodes). Throughput is measured over steady-state epochs
(first epoch excluded: XLA compile).
"""

import json
import os
import sys
import tempfile

import numpy as np


def make_synthetic_ppi(data_dir: str, seed: int = 0):
    rng = np.random.RandomState(seed)
    folds = {"train": 20, "valid": 2, "test": 2}
    for fold, num_graphs in folds.items():
        feats, labels, gids, links = [], [], [], []
        offset = 0
        for g in range(num_graphs):
            n = int(rng.randint(1700, 3100))
            e = int(n * 28)
            s = rng.randint(0, n, size=e) + offset
            t = rng.randint(0, n, size=e) + offset
            links.extend({"source": int(a), "target": int(b)} for a, b in zip(s, t))
            feats.append(rng.randn(n, 50).astype(np.float32))
            labels.append((rng.rand(n, 121) < 0.4).astype(np.float32))
            gids.append(np.full(n, g, dtype=np.int64))
            offset += n
        np.save(os.path.join(data_dir, "%s_feats.npy" % fold), np.concatenate(feats))
        np.save(os.path.join(data_dir, "%s_labels.npy" % fold), np.concatenate(labels))
        np.save(os.path.join(data_dir, "%s_graph_id.npy" % fold), np.concatenate(gids))
        with open(os.path.join(data_dir, "%s_graph.json" % fold), "w") as f:
            json.dump({"links": links}, f)


def main():
    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.tasks.ppi import PPI_Task
    from tf_gnn_samples_tpu.runtime.model import RGCN_Model

    data_dir = tempfile.mkdtemp(prefix="ppi_bench_")
    make_synthetic_ppi(data_dir)

    task = PPI_Task(PPI_Task.default_params())
    task.load_data(data_dir)

    params = RGCN_Model.default_params()
    # Tuned PPI_RGCN hypers (default_hypers/PPI_RGCN.json).
    params.update({
        "graph_layer_input_dropout_keep_prob": 0.9,
        "graph_num_layers": 4,
        "hidden_size": 320,
        "max_nodes_in_batch": 12500,
        "random_seed": 0,
        # Device-resident dataset: upload each padded batch once; epochs
        # then run free of host->device transfers (critical when the chip
        # sits behind a slow relay link, and the TPU-native choice for
        # datasets this small anyway).
        "cache_batches_on_device": True,
    })
    model = RGCN_Model(params, task, "bench", tempfile.mkdtemp(prefix="ppi_bench_run_"))

    # Warm-up: epoch 1 streams + caches on device (includes XLA compile);
    # then timed steady-state epochs over device-resident batches.
    model._run_epoch("bench warmup", task._loaded_data[DataFold.TRAIN],
                     DataFold.TRAIN, quiet=True)
    edges = 0.0
    n_epochs = 4
    for _ in range(n_epochs):
        _, _, _, _, _, eps = model._run_epoch(
            "bench", task._loaded_data[DataFold.TRAIN], DataFold.TRAIN, quiet=True
        )
        edges += eps
    edges_per_sec = edges / n_epochs

    baseline = 1952084.0  # reference RGCN train epoch edges/sec on V100 (README.md:34)
    print(json.dumps({
        "metric": "ppi_rgcn_train_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(edges_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
