from .data_parallel import (  # noqa: F401
    make_mesh,
    make_dp_train_step,
    stack_task_batches,
)
