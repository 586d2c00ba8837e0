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

if os.environ.get("TFGNN_FORCE_PLATFORM"):
    # This environment's TPU plugin overrides JAX_PLATFORMS; pin the
    # backend explicitly before any JAX initialization (same hook as
    # train.py) so CPU smoke runs of the bench are possible.
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["TFGNN_FORCE_PLATFORM"])


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


V100_EDGES_PER_SEC = 1952084.0  # reference RGCN train epoch (README.md:34)


def make_synthetic_varmisuse(data_dir: str, seed: int = 0,
                             n_train: int = 150, n_valid: int = 20):
    """Synthetic VarMisuse-shaped dataset in the RAW on-disk format
    (ICLR'18 program graphs): ~2k-node graphs, the 11 named edge types at
    realistic densities (forward/backward doubling, subtoken vocabulary
    nodes and self-loops are added by the real parser), camelCase
    identifier labels for the char CNN, slot + candidate structure.
    Written as chunked .jsonl.gz shards so the STREAMING loader path is
    exercised end to end."""
    import gzip

    rng = np.random.RandomState(seed)
    words = ["foo", "bar", "count", "index", "value", "item", "node",
             "temp", "result", "buffer", "state", "data", "ptr", "size"]

    def make_sample():
        n = int(rng.randint(1600, 2600))
        labels = {}
        for i in range(n):
            r = rng.rand()
            if r < 0.45:  # identifier: 2-part camelCase
                a, b = rng.choice(words, 2)
                labels[str(i)] = a + b.capitalize() + str(rng.randint(10))
            elif r < 0.7:
                labels[str(i)] = rng.choice(words)
            else:  # syntax token
                labels[str(i)] = rng.choice(["(", ")", "{", "}", "=", ";"])
        edges = {}
        densities = {
            "Child": 1.0, "NextToken": 0.6, "LastUse": 0.25,
            "LastWrite": 0.2, "LastLexicalUse": 0.15, "ComputedFrom": 0.1,
            "GuardedByNegation": 0.05, "GuardedBy": 0.05,
            "FormalArgName": 0.05, "ReturnsTo": 0.03,
        }
        for name, dens in densities.items():
            e = max(int(n * dens), 1)
            if name == "Child":  # tree-ish
                dst = np.arange(1, n)
                src = (rng.rand(n - 1) * np.arange(1, n)).astype(np.int64)
                pairs = np.stack([src, dst], axis=1)
            else:
                pairs = rng.randint(0, n, size=(e, 2))
            edges[name] = [[int(a), int(b)] for a, b in pairs]
        slot = int(rng.randint(0, n))
        cand_ids = rng.choice(n, size=5, replace=False)
        cands = [{"SymbolDummyNode": int(c), "IsCorrect": i == 0}
                 for i, c in enumerate(cand_ids)]
        return {
            "ContextGraph": {"NodeLabels": labels, "Edges": edges},
            "SlotDummyNode": slot,
            "SymbolCandidates": cands,
        }

    for fold, count in (("train", n_train), ("valid", n_valid),
                        ("test", n_valid)):
        fold_dir = os.path.join(data_dir, "graphs-%s" % fold)
        os.makedirs(fold_dir, exist_ok=True)
        per_chunk = 50
        for c in range(0, count, per_chunk):
            path = os.path.join(fold_dir, "chunk_%04d.jsonl.gz" % c)
            with gzip.open(path, "wt", encoding="utf-8") as f:
                for _ in range(min(per_chunk, count - c)):
                    f.write(json.dumps(make_sample()) + "\n")


def bench_varmisuse_family(model_name: str, data_dir: str):
    """VarMisuse-at-scale measurements for one family under its tuned
    VarMisuse hypers (22-23 edge types, ~60k-node batches, char-CNN
    input, STREAMING loader). Returns a dict with:

    * step_eps: real edges/sec of the jitted train step on a
      device-resident batch (the chip's compute capability at VarMisuse
      shape — catches 22-type compile/throughput regressions);
    * epoch_eps: one full streaming-loader epoch end to end (parse +
      pack + pad + per-batch upload + steps). NOTE: on this harness the
      TPU sits behind a network relay that uploads at ~12 MB/s, so
      per-batch upload (~80 MB) dominates this number; on
      direct-attached hardware (PCIe) the upload is ~1000x faster.
    * compile_s: first-step compile wall time (the 22-type XLA graph).
    """
    import time

    import jax

    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.tasks.varmisuse import VarMisuse_Task
    from tf_gnn_samples_tpu.utils.registry import name_to_model_class

    hypers_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tf_gnn_samples_tpu", "default_hypers",
        "VarMisuse_%s.json" % ("GNN-Edge-MLP%s" % model_name[-1]
                               if model_name.startswith("GNN-Edge-MLP")
                               else model_name),
    )
    tuned = {}
    if os.path.exists(hypers_path):
        with open(hypers_path) as f:
            tuned = json.load(f)

    task_params = VarMisuse_Task.default_params()
    task_params.update(tuned.get("task_params", {}))
    task_params["streaming_train_data"] = True
    task = VarMisuse_Task(task_params)
    task.load_data(data_dir)

    model_cls, extra = name_to_model_class(model_name)
    params = model_cls.default_params()
    params.update(tuned.get("model_params", {}))
    params.update(extra)
    # remat_layers: at VarMisuse scale (up to 100k-node batches, 22-23
    # types, 6-10 layers) the un-rematerialized backward's per-edge
    # activation residuals exceed the 16 GB chip; layer recompute is the
    # intended configuration (numerics identical).
    params.update({"random_seed": 0, "remat_layers": True})
    model = model_cls(params, task, "vm_bench",
                      tempfile.mkdtemp(prefix="vm_bench_run_"))

    data = task._loaded_data[DataFold.TRAIN]
    batches = list(task.make_minibatch_iterator(
        data, DataFold.TRAIN, model.params["max_nodes_in_batch"]
    ))
    if model._jitted_train_step is None:
        model._jitted_train_step = model._make_train_step()
        model._jitted_eval_step = model._make_eval_step()
    b0 = model._device_batch(batches[0])
    rng = jax.random.PRNGKey(0)
    p, o = model.model_params_tree, model.opt_state
    t0 = time.time()
    p, o, m = model._jitted_train_step(p, o, rng, b0)
    float(np.asarray(m["loss"]))
    compile_s = time.time() - t0

    reps = 6
    t0 = time.time()
    for _ in range(reps):
        p, o, m = model._jitted_train_step(p, o, rng, b0)
    float(np.asarray(m["loss"]))
    step_s = (time.time() - t0) / reps
    step_eps = int(batches[0].num_edges) / step_s

    # The jitted step donates params/opt state — hand the latest buffers
    # back to the model before the epoch driver uses them.
    model.model_params_tree, model.opt_state = p, o
    # Folds can pack into MULTIPLE static shapes (batch-spec levels pair
    # with per-batch unique-label pads), and each extra shape costs a
    # ~50-80 s XLA compile the FIRST time it is seen. A warm-up epoch
    # pays those, so the measured epoch is the steady-state pipeline
    # (parse + pack + upload + step) — this asymmetry is what made the
    # round-3 table's single-shape families (EMLP1) read ~7x faster than
    # the rest at the streaming-epoch level.
    model._run_epoch("vm warm", data, DataFold.TRAIN, quiet=True)
    _, _, _, _, _, epoch_eps = model._run_epoch(
        "vm bench", data, DataFold.TRAIN, quiet=True
    )
    return {"step_eps": step_eps, "epoch_eps": epoch_eps,
            "compile_s": compile_s, "step_ms": step_s * 1e3}


def run_varmisuse_host(n_train: int = 400):
    """Host-side VarMisuse pipeline bench (no device): parse samples/s of
    the streaming loader vs `streaming_parse_workers`, and parse+pack
    samples/s through the real minibatch iterator. This is the number
    that bounds at-scale training on direct-attached hardware (the
    device step is faster than the host parse there); run it with
    JAX_PLATFORMS=cpu — nothing touches an accelerator."""
    import time

    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.tasks.varmisuse import VarMisuse_Task

    data_dir = tempfile.mkdtemp(prefix="vm_host_")
    make_synthetic_varmisuse(data_dir, n_train=n_train)
    n_cpu = os.cpu_count() or 1
    workers = sorted({1, 4, n_cpu})
    print("cpus=%d, %d train samples in %d shards"
          % (n_cpu, n_train, -(-n_train // 50)), flush=True)
    for w in workers:
        task_params = VarMisuse_Task.default_params()
        task_params.update({
            "streaming_train_data": True,
            "streaming_parse_workers": w,
        })
        task = VarMisuse_Task(task_params)
        task.load_data(data_dir)
        data = task._loaded_data[DataFold.TRAIN]

        # Parse-only: drain the sample stream (includes subtoken graph
        # augmentation, char encoding, dedup — the per-sample ~30 ms).
        t0 = time.time()
        n = sum(1 for _ in data.iter_samples(shuffle=False))
        parse_s = time.time() - t0
        # Parse + pack: the full host path the epoch driver consumes.
        t0 = time.time()
        nb = 0
        for b in task.make_minibatch_iterator(data, DataFold.TRAIN, 60000):
            nb += 1
        pack_s = time.time() - t0
        print("workers=%-2d  parse %6.1f samples/s (%.1f s)  |  "
              "parse+pack %6.1f samples/s (%d batches)"
              % (w, n / parse_s, parse_s, n / pack_s, nb), flush=True)


def run_varmisuse_families(names):
    data_dir = tempfile.mkdtemp(prefix="vm_bench_")
    make_synthetic_varmisuse(data_dir)
    results = {}
    for name in names:
        r = bench_varmisuse_family(name, data_dir)
        results[name] = r
        print("%-14s step %7.0f ms -> %9.0f edges/s | streaming epoch "
              "%9.0f edges/s | compile %5.1f s"
              % (name, r["step_ms"], r["step_eps"], r["epoch_eps"],
                 r["compile_s"]), flush=True)
    return results

# Families for --families mode, with the tuned-hypers file each one trains
# under (the reference's own benchmark protocol, run_ppi_benchs.py).
# RGDCN has no tuned PPI hypers upstream; RGCN's budget is reused.
FAMILY_HYPERS = {
    "GGNN": "PPI_GGNN.json",
    "RGCN": "PPI_RGCN.json",
    "RGAT": "PPI_RGAT.json",
    "RGIN": "PPI_RGIN.json",
    # The reference benches BOTH Edge-MLP variants (README.md:147-148);
    # the registry name pins num_edge_hidden_layers to match each one's
    # tuned hypers file.
    "GNN-Edge-MLP0": "PPI_GNN-Edge-MLP0.json",
    "GNN-Edge-MLP1": "PPI_GNN-Edge-MLP1.json",
    "GNN-FiLM": "PPI_GNN-FiLM.json",
    # The reference ships no tuned PPI hypers for RGDCN (it is absent from
    # run_ppi_benchs.py); its own defaults (hidden 128, 8 channels, 25k-node
    # batches) are the honest configuration to measure.
    "RGDCN": None,
}


def _load_ppi_task(data_dir, extra_task_params=None):
    from tf_gnn_samples_tpu.tasks.ppi import PPI_Task

    params = PPI_Task.default_params()
    params.update(extra_task_params or {})
    task = PPI_Task(params)
    task.load_data(data_dir)
    return task


def bench_family(model_name: str, data_dir: str, n_epochs: int = 4):
    """Steady-state train-epoch edges/sec for one model family under its
    tuned PPI hypers with device-resident batches."""
    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.utils.registry import name_to_model_class

    hypers_file = FAMILY_HYPERS[model_name]
    if hypers_file is None:
        tuned = {}
    else:
        hypers_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tf_gnn_samples_tpu", "default_hypers", hypers_file,
        )
        with open(hypers_path) as f:
            tuned = json.load(f)
    task = _load_ppi_task(data_dir, tuned.get("task_params"))

    model_cls, extra = name_to_model_class(model_name)
    params = model_cls.default_params()
    params.update(tuned.get("model_params", {}))
    params.update(extra)
    params.update({"random_seed": 0, "cache_batches_on_device": True})
    model = model_cls(params, task, "bench",
                      tempfile.mkdtemp(prefix="ppi_bench_run_"))

    model._run_epoch("bench warmup", task._loaded_data[DataFold.TRAIN],
                     DataFold.TRAIN, quiet=True)
    model._run_epoch("bench warm2", task._loaded_data[DataFold.TRAIN],
                     DataFold.TRAIN, quiet=True)
    rates = []
    for _ in range(n_epochs):
        _, _, _, _, _, eps = model._run_epoch(
            "bench", task._loaded_data[DataFold.TRAIN], DataFold.TRAIN,
            quiet=True)
        rates.append(eps)
    # Median: epoch wall time through the network relay jitters by tens
    # of ms (one host fetch per epoch), which at ~100 ms epochs swings a
    # mean by +-15%.
    return float(np.median(rates))


def run_families(names):
    data_dir = tempfile.mkdtemp(prefix="ppi_bench_")
    make_synthetic_ppi(data_dir)
    results = {}
    for name in names:
        eps = bench_family(name, data_dir)
        results[name] = eps
        print("%-14s %12.0f edges/s  (%.2fx V100 RGCN epoch)"
              % (name, eps, eps / V100_EDGES_PER_SEC), flush=True)
    return results


def main():
    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.runtime.model import RGCN_Model

    if len(sys.argv) > 1 and sys.argv[1] == "--families":
        which = (sys.argv[2].split(",") if len(sys.argv) > 2
                 else list(FAMILY_HYPERS))
        run_families(which)
        return 0

    if len(sys.argv) > 1 and sys.argv[1] == "--varmisuse-host":
        run_varmisuse_host()
        return 0

    if len(sys.argv) > 1 and sys.argv[1] == "--varmisuse":
        which = (sys.argv[2].split(",") if len(sys.argv) > 2
                 else list(FAMILY_HYPERS))
        run_varmisuse_families(which)
        return 0

    data_dir = tempfile.mkdtemp(prefix="ppi_bench_")
    make_synthetic_ppi(data_dir)

    task = _load_ppi_task(data_dir)

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

    # Warm-up: epoch 1 streams + caches on device (includes XLA compile),
    # epoch 2 settles the cached path; then timed steady-state epochs over
    # device-resident batches. Median over epochs: the relay link adds
    # tens of ms of jitter to the one host fetch each epoch makes.
    for warm in ("bench warmup", "bench warm2"):
        model._run_epoch(warm, task._loaded_data[DataFold.TRAIN],
                         DataFold.TRAIN, quiet=True)
    rates = []
    n_epochs = 10
    for _ in range(n_epochs):
        _, _, _, _, _, eps = model._run_epoch(
            "bench", task._loaded_data[DataFold.TRAIN], DataFold.TRAIN, quiet=True
        )
        rates.append(eps)
    edges_per_sec = float(np.median(rates))

    baseline = V100_EDGES_PER_SEC
    print(json.dumps({
        "metric": "ppi_rgcn_train_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(edges_per_sec / baseline, 3),
        # Honest-comparison caveat (also in the module docstring): real
        # PPI needs a download this environment cannot do, so the bench
        # matches the reference's architecture, tuned hyperparameters and
        # dataset SIZE STATISTICS on synthetic graphs — "at matched
        # MicroF1" is demonstrated on real data only for QM9
        # (docs/PARITY.md).
        "note": "synthetic PPI-statistics data (zero-egress env); "
                "tuned PPI_RGCN hypers; accuracy parity on real data: "
                "QM9, docs/PARITY.md",
    }))


if __name__ == "__main__":
    sys.exit(main())
