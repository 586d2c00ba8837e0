from .graph import EdgeBlock, GraphBatch, pad_graph_batch  # noqa: F401
from .segment import (  # noqa: F401
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sqrt_n,
    segment_sum,
    get_aggregation_function,
)
