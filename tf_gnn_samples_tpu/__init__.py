"""tf_gnn_samples_tpu: a TPU-native relational message-passing GNN framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
microsoft/tf-gnn-samples (GNN-FiLM, Brockschmidt 2019):

* 7 typed-edge GNN layer families: GGNN, RGCN, RGAT, RGIN, GNN-Edge-MLP,
  RGDCN, GNN-FiLM  (reference: gnns/*.py)
* 4 task families: PPI, QM9, CitationNetwork{Cora,Citeseer,Pubmed}, VarMisuse
  (reference: tasks/*.py)
* Shared propagation stack, training runtime, checkpointing, CLI, and
  hyperparameter bank (reference: models/sparse_graph_model.py, train.py)

TPU-first architecture (not a port):
* static-shape padded `GraphBatch` pytrees instead of dynamic feed-dicts
* per-edge-type weights stacked into single [L, D, D] tensors -> one MXU
  einsum instead of L small matmuls
* `jax.ops.segment_*` / Pallas kernels for scatter-aggregation
* `jax.sharding.Mesh` + `shard_map` data / graph parallelism (new capability;
  the reference is single-device only)
"""

__version__ = "0.1.0"

SMALL_NUMBER = 1e-7
BIG_NUMBER = 1e7
