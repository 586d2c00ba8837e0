"""End-to-end CLI smoke tests (subprocess, CPU): train.py -> checkpoint ->
test.py across tasks, exercising the full user surface."""

import json
import os
import subprocess
import sys

import pytest

from fixtures import make_ppi_dir, make_varmisuse_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The env var alone is overridden by the axon plugin; force via a
    # sitecustomize-style preamble:
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv = %r; runpy.run_path(%r, run_name='__main__')"
        % (args, os.path.join(REPO, args[0]))
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_and_test_cli_qm9(tmp_path):
    result_dir = str(tmp_path / "runs")
    r = _run([
        "train.py", "RGCN", "QM9", "--quiet", "--result-dir", result_dir,
        "--model-param-overrides",
        '{"max_epochs": 1, "graph_num_layers": 2, "max_nodes_in_batch": 4000, "hidden_size": 32}',
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert " Train: loss:" in r.stdout
    ckpts = [f for f in os.listdir(result_dir) if f.endswith("_best_model.pickle")]
    assert len(ckpts) == 1

    r2 = _run([
        "test.py", os.path.join(result_dir, ckpts[0]), "--quiet",
        "--result-dir", result_dir,
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Metrics: MAEs:" in r2.stdout


@pytest.mark.slow
def test_train_cli_ppi_with_replicas(tmp_path):
    data_dir = make_ppi_dir(str(tmp_path / "ppi"),
                            graphs_per_fold={"train": 4, "valid": 2, "test": 2},
                            nodes_per_graph=120, fwd_edges_per_node=4)
    result_dir = str(tmp_path / "runs")
    r = _run([
        "train.py", "GNN-FiLM", "PPI", "--quiet",
        "--data-path", data_dir, "--result-dir", result_dir,
        "--model-param-overrides",
        '{"max_epochs": 2, "graph_num_layers": 2, "max_nodes_in_batch": 150, '
        '"hidden_size": 32, "num_model_replicas": 4}',
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Avg MicroF1" in r.stdout


@pytest.mark.slow
def test_train_cli_varmisuse(tmp_path):
    data_dir = make_varmisuse_dir(str(tmp_path / "vm"), num_shards=2,
                                  samples_per_shard=4)
    result_dir = str(tmp_path / "runs")
    r = _run([
        "train.py", "GGNN", "VarMisuse", "--quiet",
        "--data-path", data_dir, "--result-dir", result_dir,
        "--model-param-overrides",
        '{"max_epochs": 1, "graph_num_layers": 1, "max_nodes_in_batch": 300, "hidden_size": 64}',
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Accuracy:" in r.stdout


@pytest.mark.slow
def test_varmisuse_data_splitter_cli(tmp_path):
    """The splitter CLI re-shards raw .json.gz files into chunk_*.jsonl.gz
    with all samples preserved (utils/varmisuse_data_splitter.py)."""
    import gzip
    import json as json_mod

    raw = tmp_path / "raw"
    raw.mkdir()
    total = 0
    for shard in range(3):
        samples = [{"id": shard * 100 + i} for i in range(7)]
        total += len(samples)
        with gzip.open(raw / ("f%d.json.gz" % shard), "wt") as f:
            json_mod.dump(samples, f)
    out = tmp_path / "out"

    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m",
         "tf_gnn_samples_tpu.utils.varmisuse_data_splitter",
         str(raw), str(out), "--chunk-size", "4", "--window-size", "10",
         "--num-workers", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    chunks = sorted(out.glob("chunk_*.jsonl.gz"))
    assert chunks
    seen = []
    for c in chunks:
        with gzip.open(c, "rt") as f:
            seen.extend(json_mod.loads(line)["id"] for line in f)
    assert sorted(seen) == sorted(s * 100 + i for s in range(3) for i in range(7))


@pytest.mark.slow
def test_run_ppi_benchs_harness(tmp_path):
    """The PPI bench harness end-to-end: forks train.py, scrapes the log
    format, prints the mean +/- std table (validates the regex-log
    contract the reference relies on, run_ppi_benchs.py:21-22)."""
    data_dir = make_ppi_dir(str(tmp_path / "ppi"),
                            graphs_per_fold={"train": 3, "valid": 2, "test": 2},
                            nodes_per_graph=80, fwd_edges_per_node=3)
    env = dict(os.environ)
    env["TFGNN_FORCE_PLATFORM"] = "cpu"  # reaches the forked train.py too
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % ([
            "run_ppi_benchs.py", str(tmp_path / "logs"),
            "--num-runs", "1", "--models", "GGNN",
            "--data-path", data_dir,
            "--extra-model-overrides",
            '{"max_epochs": 3, "patience": 1, "graph_num_layers": 1, '
            '"hidden_size": 16, "max_nodes_in_batch": 300, '
            '"learning_rate": 0.0}',
        ], os.path.join(REPO, "run_ppi_benchs.py"))
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    # Table row with a scraped MicroF1 and a time:
    import re as re_mod

    row = [l for l in r.stdout.splitlines() if l.startswith("| GGNN")]
    assert row, r.stdout[-1500:]
    assert re_mod.search(r"\| GGNN\s+\| 0\.\d+ \(\+/- 0\.\d+\) \|\s+\d+", row[0]), row[0]


def test_qm9_harness_property_subset():
    """--properties filter of the QM9 table harness (round-5 extension):
    names map to task ids in CHEMICAL_ACC order; default = all 13."""
    import importlib

    mod = importlib.import_module("run_qm9_benchs")
    assert mod.property_subset(None) == list(range(13))
    assert mod.property_subset("mu,HOMO,U0,Cv") == [0, 2, 7, 11]
    try:
        mod.property_subset("nope")
    except ValueError:
        pass
    else:
        raise AssertionError("unknown property must raise")
