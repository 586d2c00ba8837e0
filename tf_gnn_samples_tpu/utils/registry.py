"""Name -> class registries and checkpoint restore.

Capability-parity with the reference's utils/model_utils.py:
`name_to_task_class` (·:12-29), `name_to_model_class` with aliases and
parameter-pinning extras (·:32-55), and `restore` (·:58-77), which
re-instantiates the task from pickled params+metadata and the model from
pickled params, then loads weights (tolerating partial matches).
"""

import pickle
from typing import Any, Dict, Tuple, Type


def name_to_task_class(name: str) -> Tuple[Type, Dict[str, Any]]:
    """Task name -> (class, additional params). Aliases for the three
    citation datasets pin `data_kind` (reference model_utils.py:16-21)."""
    name = name.lower()
    if name == "qm9":
        from ..tasks.qm9 import QM9_Task

        return QM9_Task, {}
    if name == "ppi":
        from ..tasks.ppi import PPI_Task

        return PPI_Task, {}
    if name == "varmisuse":
        from ..tasks.varmisuse import VarMisuse_Task

        return VarMisuse_Task, {}
    if name in ("citationnetwork", "citation_network", "cora", "citeseer", "pubmed"):
        from ..tasks.citation import Citation_Network_Task

        if name in ("cora", "citeseer", "pubmed"):
            return Citation_Network_Task, {"data_kind": name}
        return Citation_Network_Task, {}
    raise ValueError("Unknown task type '%s'" % name)


def name_to_model_class(name: str) -> Tuple[Type, Dict[str, Any]]:
    """Model name -> (class, additional params). `gnn_edge_mlp0` pins
    `num_edge_hidden_layers: 0` (reference model_utils.py:38-41)."""
    from ..runtime.model import (
        GGNN_Model,
        GNN_Edge_MLP_Model,
        GNN_FiLM_Model,
        RGAT_Model,
        RGCN_Model,
        RGDCN_Model,
        RGIN_Model,
    )

    name = name.lower()
    if name in ("ggnn", "ggnn_model"):
        return GGNN_Model, {}
    if name in ("gnn_edge_mlp", "gnn-edge-mlp", "gnn_edge_mlp_model"):
        return GNN_Edge_MLP_Model, {}
    if name in ("gnn_edge_mlp0", "gnn-edge-mlp0"):
        return GNN_Edge_MLP_Model, {"num_edge_hidden_layers": 0}
    if name in ("gnn_edge_mlp1", "gnn-edge-mlp1"):
        return GNN_Edge_MLP_Model, {"num_edge_hidden_layers": 1}
    if name in ("gnn_film", "gnn-film", "gnn_film_model"):
        return GNN_FiLM_Model, {}
    if name in ("rgat", "rgat_model"):
        return RGAT_Model, {}
    if name in ("rgcn", "rgcn_model"):
        return RGCN_Model, {}
    if name in ("rgdcn", "rgdcn_model"):
        return RGDCN_Model, {}
    if name in ("rgin", "rgin_model"):
        return RGIN_Model, {}
    raise ValueError("Unknown model type '%s'" % name)


def restore(saved_model_path: str, result_dir: str, run_id: str = None):
    """Rebuild task+model from a best-model pickle and load weights
    (reference model_utils.py:58-77)."""
    print("Loading model from file %s." % saved_model_path)
    with open(saved_model_path, "rb") as f:
        data_to_load = pickle.load(f)

    task_cls, _ = name_to_task_class(data_to_load["task_class"])
    task = task_cls(data_to_load["task_params"])
    task.restore_from_metadata(data_to_load["task_metadata"])

    model_cls, _ = name_to_model_class(data_to_load["model_class"])
    if run_id is None:
        run_id = "_".join([task_cls.name(), model_cls.name(data_to_load["model_params"]), "Restored"])
    model = model_cls(data_to_load["model_params"], task, run_id, result_dir)
    model.load_weights(data_to_load["weights"])
    return model
