from .data_parallel import (  # noqa: F401
    make_mesh,
    make_dp_train_step,
    shard_batches,
    stack_task_batches,
)
