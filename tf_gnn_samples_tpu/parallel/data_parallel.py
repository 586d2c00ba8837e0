"""Data-parallel training over a TPU mesh.

NEW capability relative to the reference, which is strictly single-device
(one tf.Session, models/sparse_graph_model.py:68-74; no tf.distribute /
NCCL / MPI anywhere — see SURVEY.md §2.3). Design follows the standard
JAX recipe: a named `Mesh`, `shard_map` over the batch axis, gradient
reduction via `psum` collectives that XLA lowers onto ICI.

Semantics: each device holds one padded `TaskBatch` (same static shape —
the fold-constant BatchSpec makes this free); the global loss is the
graph-count-weighted mean of per-device losses, so gradients and metrics
are EXACTLY what a single device would compute on the concatenated batch
(for sum-style aggregation; summation order differs in float as usual).
Parameters and optimizer state are replicated; updates are computed
identically on every device after the psum (no divergence).
"""


from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..runtime.optimizers import clip_grads_per_tensor
from ..tasks.base import TaskBatch


def make_mesh(n_devices: int = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def unify_batch_windows(batches: Sequence[TaskBatch]) -> List[TaskBatch]:
    """Give TaskBatches identical rank-window tokens (ops/graph.py
    FlatEdges win_*) so they share one pytree shape for stacking."""
    from ..ops.graph import unify_flat_windows

    flats = unify_flat_windows([b.graph.flat for b in batches])
    return [
        b._replace(graph=b.graph._replace(flat=f))
        for b, f in zip(batches, flats)
    ]


def stack_task_batches(batches: Sequence[TaskBatch]) -> TaskBatch:
    """Stack per-device TaskBatches along a new leading axis. All batches
    must share one static shape (guaranteed by the fold's BatchSpec, with
    rank-window tokens unified here)."""
    batches = unify_batch_windows(batches)
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)


def make_dp_train_step(model, mesh: Mesh, axis_name: str = "dp"):
    """Build a jitted data-parallel train step for a SparseGraphModel.

    Returns step(params, opt_state, rng, stacked_batch) -> (params,
    opt_state, metrics) where stacked_batch leaves have a leading device
    axis of size mesh.size. Metrics come back PER DEVICE (leading axis P)
    so the host can keep the reference's exact per-minibatch metric-list
    semantics (e.g. PPI's per-batch micro-F1 average, ppi_task.py:263);
    gradients are the graph-count-weighted psum, i.e. exactly the gradient
    of the concatenated batch.
    """
    return jax.jit(make_dp_train_fn(model, mesh, axis_name),
                   donate_argnums=(0, 1))


def make_dp_train_fn(model, mesh: Mesh, axis_name: str = "dp"):
    """UNJITTED shard_map'd data-parallel train step (see
    make_dp_train_step) — composable inside lax.scan for one-dispatch
    scanned epochs (runtime/model.py _run_epoch_dp_scanned)."""
    clip_norm = model.params["clamp_gradient_norm"]

    def per_device(params, opt_state, rng, batch: TaskBatch):
        # Leading device axis of size 1 inside shard_map -> squeeze.
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: model._forward(p, batch, rng), has_aux=True
        )(params)

        num_graphs = batch.graph.num_graphs.astype(jnp.float32)
        total_graphs = jax.lax.psum(num_graphs, axis_name)
        # Global loss = graph-weighted mean -> grad = psum(w_i * grad_i).
        weight = num_graphs / total_graphs
        grads = jax.lax.psum(
            jax.tree_util.tree_map(lambda g: g * weight, grads), axis_name
        )
        grads = clip_grads_per_tensor(grads, clip_norm)

        lr = model._effective_lr(total_graphs)
        new_params, new_opt_state = model._optimizer.update(
            grads, opt_state, params, lr
        )
        # Per-device metrics, restacked on the device axis:
        metrics = {k: v[None] for k, v in metrics.items()}
        return new_params, new_opt_state, metrics

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P(axis_name)),
        check_vma=False,
    )
    return sharded


def make_dp_eval_step(model, mesh: Mesh, axis_name: str = "dp",
                      reduce_metrics: bool = False):
    """Jitted eval step over stacked batches (see make_dp_eval_fn)."""
    return jax.jit(make_dp_eval_fn(model, mesh, axis_name, reduce_metrics))


def make_dp_eval_fn(model, mesh: Mesh, axis_name: str = "dp",
                    reduce_metrics: bool = False):
    """UNJITTED eval step over stacked batches. With reduce_metrics the
    metric sums are psum'd to one dict; default returns per-device metrics
    (leading axis P) to preserve per-minibatch metric semantics."""

    def per_device(params, batch: TaskBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        _, metrics = model._forward(params, batch, None)
        if reduce_metrics:
            metrics = {k: jax.lax.psum(v, axis_name) for k, v in metrics.items()}
            total_graphs = jax.lax.psum(
                batch.graph.num_graphs.astype(jnp.float32), axis_name
            )
            metrics["loss"] = metrics["total_loss"] / total_graphs
            return metrics
        return {k: v[None] for k, v in metrics.items()}

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P() if reduce_metrics else P(axis_name),
        check_vma=False,
    )
    return sharded
