"""Capture a jax.profiler device trace of N cached train steps
for one family and print the top device ops by total duration.

Usage: python scratch_trace_prof.py [MODEL] [--scan]
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # repo-root bench harness


def top_ops_from_trace(trace_dir, top=30):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find TPU device-op track PIDs (process names containing "TPU" and not
    # host threads).
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    totals = {}
    counts = {}
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)  # us
        totals[name] = totals.get(name, 0) + dur
        counts[name] = counts.get(name, 0) + 1
    total_all = sum(totals.values())
    print("device pids:", {p: pid_names[p] for p in dev_pids})
    print("total device op time: %.2f ms" % (total_all / 1e3))
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print("%9.2f ms %5dx  %s" % (dur / 1e3, counts[name], name[:110]))


def main():
    import jax
    from tf_gnn_samples_tpu.tasks.base import DataFold
    from tf_gnn_samples_tpu.utils.registry import name_to_model_class

    model_name = sys.argv[1] if len(sys.argv) > 1 else "GNN-FiLM"
    data_dir = tempfile.mkdtemp(prefix="ppi_prof_")
    B.make_synthetic_ppi(data_dir)

    hypers_file = B.FAMILY_HYPERS[model_name]
    tuned = {}
    if hypers_file:
        with open(os.path.join("tf_gnn_samples_tpu", "default_hypers",
                               hypers_file)) as f:
            tuned = json.load(f)
    task = B._load_ppi_task(data_dir, tuned.get("task_params"))

    model_cls, extra = name_to_model_class(model_name)
    params = model_cls.default_params()
    params.update(tuned.get("model_params", {}))
    params.update(extra)
    params.update({"random_seed": 0, "cache_batches_on_device": True})
    model = model_cls(params, task, "prof", tempfile.mkdtemp(prefix="prof_"))

    data = task._loaded_data[DataFold.TRAIN]
    model._run_epoch("w1", data, DataFold.TRAIN, quiet=True)
    model._run_epoch("w2", data, DataFold.TRAIN, quiet=True)

    cached = model._batch_cache[DataFold.TRAIN]
    b = cached[0]
    rng = jax.random.PRNGKey(0)
    p, o = model.model_params_tree, model.opt_state
    p, o, m = model._jitted_train_step(p, o, rng, b)
    float(m["loss"])

    trace_dir = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            p, o, m = model._jitted_train_step(p, o, rng, b)
        float(m["loss"])
    print("trace dir:", trace_dir)
    # per-step wall
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        p, o, m = model._jitted_train_step(p, o, rng, b)
    float(m["loss"])
    dt = (time.time() - t0) / reps
    print("step: %.2f ms on %d edges -> %.2fM edges/s"
          % (dt * 1e3, b.num_edges, b.num_edges / dt / 1e6))
    top = int(os.environ.get("TRACE_TOP", "30"))
    top_ops_from_trace(trace_dir, top=top)


if __name__ == "__main__":
    main()
