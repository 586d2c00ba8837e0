from .base import (  # noqa: F401
    BatchSpec,
    DataFold,
    SparseGraphTask,
    TaskBatch,
    compute_batch_spec,
    compute_batch_specs,
    select_spec,
    pack_greedy,
)
