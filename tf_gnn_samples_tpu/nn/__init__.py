from .activations import get_activation  # noqa: F401
from .mlp import mlp_apply, mlp_init  # noqa: F401
from .cells import cell_apply, cell_init  # noqa: F401
from .normalization import layer_norm, layer_norm_init  # noqa: F401
