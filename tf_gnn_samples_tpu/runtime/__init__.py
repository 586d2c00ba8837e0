from .model import (  # noqa: F401
    GGNN_Model,
    GNN_Edge_MLP_Model,
    GNN_FiLM_Model,
    RGAT_Model,
    RGCN_Model,
    RGDCN_Model,
    RGIN_Model,
    SparseGraphModel,
)
from .optimizers import Optimizer, clip_grads_per_tensor, make_optimizer  # noqa: F401
