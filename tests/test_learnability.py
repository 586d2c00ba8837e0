"""End-to-end LEARNABILITY (memorization) checks for the task heads the
offline QM9 parity runs cannot cover: PPI, VarMisuse, and citation.

The reference's de-facto correctness test is "reproduce the published
table" (SURVEY.md §4); with the real datasets undownloadable offline, the
closest equivalent is train-to-memorization on a tiny PLANTED-SIGNAL
fixture — each label is a deterministic function the model can represent,
so a correctly wired head/loss/metric pipeline reaches ~perfect train-fold
accuracy, while a silent wiring bug (mask leak, metric miscount, label
misalignment, candidate reorder bug) cannot. Layer-level goldens
(test_tf_parity.py) see none of these failure modes.

Reference heads: ppi_task.py:176-194, varmisuse_task.py:389-448,
citation_network_task.py:112-148.
"""

import numpy as np
import pytest

from fixtures import (
    make_planted_planetoid_dir,
    make_planted_ppi_dir,
    make_planted_varmisuse_dir,
)
from tf_gnn_samples_tpu.tasks.base import DataFold
from tf_gnn_samples_tpu.utils.registry import (
    name_to_model_class,
    name_to_task_class,
)


def _train_model(task_name, data_root, tmp_path, *, lr, max_epochs,
                 max_nodes_in_batch, hidden=64, run_id="learn"):
    task_cls, textra = name_to_task_class(task_name)
    task = task_cls({**task_cls.default_params(), **textra})
    task.load_data(data_root)
    model_cls, mextra = name_to_model_class("RGCN")
    p = model_cls.default_params()
    p.update(mextra)
    p.update({
        "hidden_size": hidden,
        "graph_num_layers": 2,
        "optimizer": "Adam",
        "learning_rate": lr,
        "max_epochs": max_epochs,
        "patience": 10000,  # memorization: never early-stop
        "graph_layer_input_dropout_keep_prob": 1.0,
        "max_nodes_in_batch": max_nodes_in_batch,
        "random_seed": 0,
    })
    model = model_cls(p, task, run_id, str(tmp_path))
    model.train(quiet=True)
    # Final TRAIN-fold metrics in EVAL mode (no dropout, no updates):
    loss, metrics, num_graphs, *_ = model._run_epoch(
        "final", task._loaded_data[DataFold.TRAIN], DataFold.VALIDATION,
        quiet=True,
    )
    return metrics, num_graphs


@pytest.mark.slow
def test_ppi_head_memorizes_planted_signal(tmp_path):
    """PPI head/loss/micro-F1 wiring: train-fold micro-F1 >= 0.99 on a
    100-node planted fixture (label j = sign of feature j % 50)."""
    root = make_planted_ppi_dir(str(tmp_path / "ppi"))
    metrics, _ = _train_model(
        "ppi", root, tmp_path, lr=0.005, max_epochs=150,
        max_nodes_in_batch=200, hidden=128,
    )
    f1 = float(np.average([m["f1_score"] for m in metrics]))
    assert f1 >= 0.99, f1


@pytest.mark.slow
def test_varmisuse_head_memorizes_planted_signal(tmp_path):
    """VarMisuse char-CNN + candidate head: train-fold accuracy >= 0.98
    on 50 synthetic samples whose correct candidate carries a marker
    identifier."""
    root = make_planted_varmisuse_dir(str(tmp_path / "vm"))
    metrics, num_graphs = _train_model(
        "varmisuse", root, tmp_path, lr=0.002, max_epochs=80,
        max_nodes_in_batch=2000,
    )
    acc = sum(
        float(m["num_correct_predictions"]) for m in metrics
    ) / num_graphs
    assert acc >= 0.98, acc


@pytest.mark.slow
def test_citation_head_memorizes_planted_signal(tmp_path):
    """Citation masked-CE head: train-mask accuracy >= 0.95 on a planted
    Planetoid fixture (class = argmax of the first feature columns)."""
    root = make_planted_planetoid_dir(str(tmp_path / "cit"))
    metrics, _ = _train_model(
        "cora", root, tmp_path, lr=0.01, max_epochs=200,
        max_nodes_in_batch=1000,
    )
    acc = float(metrics[0]["accuracy"])
    assert acc >= 0.95, acc
