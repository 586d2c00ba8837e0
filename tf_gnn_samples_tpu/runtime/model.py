"""Training runtime: the model layer of the framework.

Capability-parity with the reference's abstract `Sparse_Graph_Model`
(models/sparse_graph_model.py:16-384) and its 7 concrete subclasses
(models/*.py): default hyperparameters, model assembly (task input model ->
shared propagation stack -> task output model), optimizer construction with
per-tensor gradient clipping and optional per-batch LR normalization,
epoch driver with throughput telemetry, patience-based early stopping with
best-checkpoint pickling, weight save/load with fresh-init of unmatched
entries, and the exact log-line format the reference bench scripts regex
(run_ppi_benchs.py:21-22).

TPU-first re-design (NOT a port):

* No tf.Graph/Session. The whole forward+backward+update is ONE jitted
  function over a static-shape `TaskBatch` pytree, with donated params and
  optimizer state (zero-copy update on device).
* Dropout via explicit jax PRNG threading; a train step consumes one fold
  of a counter-based key so runs are reproducible per seed.
* Host-side batch packing overlaps device compute via ThreadedIterator;
  metric scalars stay on device until epoch end (async dispatch).
"""

import os
import pickle
import random
import time
from abc import ABC
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.layers import LAYERS
from ..nn.propagation import propagation_apply, propagation_init
from ..tasks.base import DataFold, SparseGraphTask, TaskBatch
from ..utils.iterators import ThreadedIterator
from .optimizers import clip_grads_per_tensor, make_optimizer

# Consecutive flagged validation epochs before the degenerate-basin
# warning fires (healthy runs pass through the basin's loss band only
# briefly during the first few epochs).
COLLAPSE_WARN_EPOCHS = 5


def unify_win_tokens(batches: List[TaskBatch]) -> List[TaskBatch]:
    """Give a set of batches identical rank-window tokens so they share
    one pytree shape — required wherever batches are stacked (lax.scan
    epochs, data-parallel groups) and avoids per-bucket recompiles on
    cached folds (see ops/graph.py unify_flat_windows)."""
    from ..parallel.data_parallel import unify_batch_windows

    if not batches:
        return batches
    return unify_batch_windows(batches)


def batch_shape_key(batch: TaskBatch):
    """Hashable pytree-shape signature of a batch: leaf array shapes and
    dtypes (host ints hash by position only — they stack regardless of
    value). Batches share a key iff they can be jnp.stack'ed / scanned
    together; multi-bucket folds (tasks/base.py compute_batch_specs) carry
    a handful of distinct keys."""
    return tuple(
        (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else type(x)
        for x in jax.tree_util.tree_leaves(batch)
    )


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    """Pytree -> {path: ndarray}, the checkpoint weight format (analogous to
    the reference's variable-name keyed dict, sparse_graph_model.py:91-107)."""
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_like(template, weights: Dict[str, np.ndarray]):
    """Rebuild a pytree shaped like `template` from {path: ndarray}; entries
    missing from `weights` keep the template's (freshly-initialized) value,
    matching the reference's partial-restore behavior
    (sparse_graph_model.py:109-126)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    used = set()
    for path, leaf in paths_and_leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in weights:
            saved = np.asarray(weights[key])
            assert saved.shape == leaf.shape, (key, saved.shape, leaf.shape)
            new_leaves.append(jnp.asarray(saved, dtype=leaf.dtype))
            used.add(key)
        else:
            print("Freshly initializing %s since no saved value was found." % key)
            new_leaves.append(leaf)
    for key in weights:
        if key not in used:
            print("Saved weights for %s not used by model." % key)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class SparseGraphModel(ABC):
    """Abstract model: training loop + propagation stack around task heads."""

    layer_name: str = ""  # key into nn.layers.LAYERS

    @classmethod
    def default_params(cls):
        # Reference defaults: models/sparse_graph_model.py:22-45.
        return {
            "max_nodes_in_batch": 50000,
            "graph_num_layers": 8,
            "graph_num_timesteps_per_layer": 1,
            "graph_layer_input_dropout_keep_prob": 0.8,
            "graph_dense_between_every_num_gnn_layers": 1,
            "graph_model_activation_function": "tanh",
            "graph_residual_connection_every_num_layers": 2,
            "graph_inter_layer_norm": False,
            "max_epochs": 10000,
            "patience": 25,
            "optimizer": "Adam",
            "learning_rate": 0.001,
            "learning_rate_decay": 0.98,
            "lr_for_num_graphs_per_batch": None,
            "momentum": 0.85,
            "clamp_gradient_norm": 1.0,
            "random_seed": 0,
            # TPU-native extension (not in the reference): keep each fold's
            # padded batches resident on device across epochs. Eliminates
            # per-epoch host->device uploads (the dominant cost when the
            # accelerator sits behind a slow link). For TRAIN the batch
            # *order* is reshuffled per epoch but graph-to-batch packing is
            # frozen after the first epoch (the reference re-packs after a
            # full data shuffle each epoch, ppi_task.py:204).
            "cache_batches_on_device": False,
            # TPU-native extension: data-parallel training over the first
            # `num_model_replicas` devices of this process (reference is
            # single-device, SURVEY.md §2.3). Each replica consumes one
            # packed mega-graph per step; gradients are graph-count-
            # weighted psums, exactly the single-device gradient of the
            # concatenated batch.
            "num_model_replicas": 1,
            # TPU-native extension: graph parallelism — each batch's packed
            # mega-graph is node-partitioned across `graph_parallel`
            # devices (node-state memory scales 1/P; per-layer feature
            # exchange over ICI). The task's input/output models run
            # replicated on the padded batch, so every task works
            # unchanged. See parallel/graph_parallel.py.
            "graph_parallel": 1,
            # With graph_parallel > 1: exchange only BOUNDARY node features
            # per layer (one all_to_all of [P, halo_pad, D] over ICI,
            # overlapped with local-source aggregation) instead of
            # all-gathering the full typed tables. Communication becomes
            # independent of the number of edge types and proportional to
            # the partition cut. All 7 layer families supported
            # (parallel/graph_parallel.py GP_HALO_LAYERS).
            "graph_parallel_halo": False,
            # TPU-native extension: jax.checkpoint each GNN layer so the
            # backward pass recomputes per-edge activations instead of
            # holding them — trades one extra forward for O(layers * E * D)
            # of HBM. Numerically identical; enables deep many-edge-type
            # configs (VarMisuse-scale) that otherwise exceed chip memory.
            "remat_layers": False,
        }

    @staticmethod
    def name(params: Dict[str, Any]) -> str:
        raise NotImplementedError()

    def layer_kwargs(self) -> Dict[str, Any]:
        """Static per-layer config drawn from params (the reference's
        _apply_gnn_layer argument plumbing, e.g. models/rgcn_model.py:31-44)."""
        return {}

    def __init__(
        self,
        params: Dict[str, Any],
        task: SparseGraphTask,
        run_id: str,
        result_dir: str,
    ) -> None:
        self.params = params
        self.task = task
        self.run_id = run_id
        self.result_dir = result_dir

        seed = params["random_seed"]
        random.seed(seed)
        np.random.seed(seed)
        self._root_key = jax.random.PRNGKey(seed)
        self._optimizer = make_optimizer(params)
        self._step_rng = np.random.RandomState(seed)

        self.model_params_tree = self._init_params()
        self.opt_state = self._optimizer.init(self.model_params_tree)
        self._jitted_train_step = None
        self._jitted_eval_step = None
        self._jitted_epoch_fns = None
        self._dp_steps = None
        self._dp_mesh = None
        self._gp_steps = None
        self._batch_cache: Dict[Any, List[TaskBatch]] = {}
        self._stacked_cache: Dict[Any, TaskBatch] = {}
        # Data-parallel device cache: fold -> (stacked replica groups,
        # fold totals); see _run_epoch_dp.
        self._dp_group_cache: Dict[Any, Any] = {}
        # Graph-parallel device cache: fold -> (list of (dev_batch,
        # shards, num_graphs), fold totals); see _run_epoch_graph_parallel.
        self._gp_batch_cache: Dict[Any, Any] = {}
        # Scanned data-parallel epochs: fold -> super-stacked groups, plus
        # the jitted scan-of-shard_map epoch fns (see _run_epoch_dp_scanned).
        self._dp_stacked_cache: Dict[Any, Any] = {}
        self._dp_epoch_fns = None
        self._jitted_adj_build = None
        self._dense_adj_cached_gb = 0.0
        self._fold_adj_gb: Dict[Any, float] = {}
        self._train_epochs_seen = 0

    # -------------------- files --------------------

    @property
    def log_file(self):
        return os.path.join(self.result_dir, "%s.log" % self.run_id)

    @property
    def best_model_file(self):
        return os.path.join(self.result_dir, "%s_best_model.pickle" % self.run_id)

    # -------------------- parameter init --------------------

    def _init_params(self):
        key = self._root_key
        k_in, k_prop, k_out = jax.random.split(key, 3)
        layer_init, _ = LAYERS[self.layer_name]
        prop = propagation_init(
            k_prop,
            self.params,
            self.task.num_edge_types,
            self.task.initial_node_feature_size,
            self.layer_name,
            self.layer_kwargs(),
        )
        return {
            "input": self.task.input_init(k_in),
            "prop": prop,
            "output": self.task.output_init(k_out, self.params["hidden_size"]),
        }

    def initialize_model(self) -> None:
        """Kept for API parity (reference initialize_model,
        sparse_graph_model.py:85-89); params are initialized in __init__."""

    # -------------------- forward --------------------

    def _forward(self, params, batch: TaskBatch, rng):
        """Task input model -> propagation stack -> task output model
        (the reference's __make_model sandwich, sparse_graph_model.py:129-160).
        rng=None means eval (no dropout)."""
        if rng is not None:
            rng_in, rng_prop, rng_out = jax.random.split(rng, 3)
        else:
            rng_in = rng_prop = rng_out = None

        # Hoist the dense-adjacency build out of the layer loop: built once
        # per step, shared by every layer (and reused by the backward pass).
        # Skipped when the batch already carries cached adjacencies.
        if batch.graph.dense_adj is None and self._wants_dense_adj(batch.graph):
            from ..ops.edge_ops import dense_adjacency

            batch = batch._replace(graph=batch.graph._replace(
                dense_adj=tuple(dense_adjacency(batch.graph))
            ))

        feats = self.task.input_apply(params["input"], batch, rng_in)
        final_h = propagation_apply(
            params["prop"],
            self.params,
            batch.graph,
            feats,
            self.layer_name,
            self.layer_kwargs(),
            rng=rng_prop,
        )
        loss, metrics = self.task.output_apply(
            params["output"], batch, final_h, feats, rng_out
        )
        return loss, metrics

    # -------------------- jitted steps --------------------

    def _effective_lr(self, num_graphs):
        lr = self.params["learning_rate"]
        per_batch = self.params.get("lr_for_num_graphs_per_batch")
        if per_batch is not None:
            # LR-per-graph normalization (sparse_graph_model.py:232-239).
            lr = lr * num_graphs.astype(jnp.float32) / float(per_batch)
        return lr

    def _make_train_step(self):
        def step(params, opt_state, rng, batch: TaskBatch):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: self._forward(p, batch, rng), has_aux=True
            )(params)
            grads = clip_grads_per_tensor(grads, self.params["clamp_gradient_norm"])
            lr = self._effective_lr(batch.graph.num_graphs)
            new_params, new_opt_state = self._optimizer.update(
                grads, opt_state, params, lr
            )
            return new_params, new_opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _make_eval_step(self):
        def step(params, batch: TaskBatch):
            _, metrics = self._forward(params, batch, None)
            return metrics

        return jax.jit(step)

    # -------------------- whole-epoch scan (device-resident data) ----------

    def _make_epoch_fns(self):
        """One-dispatch epochs: lax.scan the train/eval step over the fold's
        stacked device-resident batches. Removes per-step host dispatch
        latency entirely and lets XLA software-pipeline steps — the natural
        endpoint of the static-shape batch design (requires
        cache_batches_on_device; all batches of a fold share one shape)."""

        def train_epoch(params, opt_state, rng, stacked: TaskBatch):
            def body(carry, batch):
                params, opt_state, rng = carry
                rng, sub = jax.random.split(rng)
                (loss, metrics), grads = jax.value_and_grad(
                    lambda p: self._forward(p, batch, sub), has_aux=True
                )(params)
                grads = clip_grads_per_tensor(
                    grads, self.params["clamp_gradient_norm"]
                )
                lr = self._effective_lr(batch.graph.num_graphs)
                params, opt_state = self._optimizer.update(
                    grads, opt_state, params, lr
                )
                return (params, opt_state, rng), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                body, (params, opt_state, rng), stacked
            )
            return params, opt_state, metrics

        def eval_epoch(params, stacked: TaskBatch):
            def body(carry, batch):
                _, metrics = self._forward(params, batch, None)
                return carry, metrics

            _, metrics = jax.lax.scan(body, (), stacked)
            return metrics

        return (
            jax.jit(train_epoch, donate_argnums=(0, 1)),
            jax.jit(eval_epoch),
        )

    # -------------------- save / load --------------------

    def save_model(self, path: str) -> None:
        data_to_save = {
            "model_class": self.name(self.params),
            "task_class": self.task.name(),
            "model_params": self.params,
            "task_params": self.task.params,
            "task_metadata": self.task.get_metadata(),
            "weights": flatten_params(self.model_params_tree),
        }
        with open(path, "wb") as f:
            pickle.dump(data_to_save, f, pickle.HIGHEST_PROTOCOL)

    def load_weights(self, weights: Dict[str, np.ndarray]) -> None:
        self.model_params_tree = unflatten_like(self.model_params_tree, weights)
        self.opt_state = self._optimizer.init(self.model_params_tree)

    # -------------------- full training-state checkpoint ----------------
    # NEW capability: the reference's best-model pickle carries weights
    # only, so "resume" restarts optimization from scratch with the best
    # weights (SURVEY.md §5: no optimizer-state or epoch persistence).
    # These checkpoints additionally carry optimizer slots, the epoch
    # counter, the early-stopping state and the host RNG, so training can
    # continue exactly where it stopped.

    def save_training_state(self, path: str, epoch: int,
                            early_stop_state: Dict[str, Any]) -> None:
        state = {
            "model_class": self.name(self.params),
            "task_class": self.task.name(),
            "model_params": self.params,
            "task_params": self.task.params,
            "task_metadata": self.task.get_metadata(),
            "weights": flatten_params(self.model_params_tree),
            "opt_slots": flatten_params(self.opt_state.slots),
            "opt_step": int(self.opt_state.step),
            "epoch": epoch,
            "early_stop_state": early_stop_state,
            "step_rng_state": self._step_rng.get_state(),
            # The global numpy RNG drives per-epoch TRAIN shuffles in the
            # tasks (e.g. qm9.py make_minibatch_iterator) — it must travel
            # with the checkpoint for resume to replay the same batching.
            "np_random_state": np.random.get_state(),
        }
        with open(path, "wb") as f:
            pickle.dump(state, f, pickle.HIGHEST_PROTOCOL)

    def restore_training_state(self, path: str) -> Dict[str, Any]:
        """Load a full-state checkpoint; returns {'epoch', 'early_stop_state'}
        for the train loop to continue from."""
        from .optimizers import OptimizerState

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.model_params_tree = unflatten_like(
            self.model_params_tree, state["weights"]
        )
        self.opt_state = OptimizerState(
            step=jnp.asarray(state["opt_step"], jnp.int32),
            slots=unflatten_like(
                self._optimizer.init(self.model_params_tree).slots,
                state["opt_slots"],
            ),
        )
        self._step_rng.set_state(state["step_rng_state"])
        np.random.set_state(state["np_random_state"])
        return {"epoch": state["epoch"],
                "early_stop_state": state["early_stop_state"]}

    # -------------------- epoch driver --------------------

    def log_line(self, msg: str) -> None:
        os.makedirs(self.result_dir, exist_ok=True)
        with open(self.log_file, "a") as f:
            f.write(msg + "\n")
        print(msg)

    def _wants_dense_adj(self, graph) -> bool:
        # rgdcn qualifies through the aggregate-first restructure: its
        # per-type neighbor sums ride the same A_l matmuls (nn/layers.py
        # _typed_neighbor_sums).
        if self.layer_name not in ("rgcn", "ggnn", "rgdcn"):
            return False
        from ..nn.layers import use_dense_strategy

        kw = self.layer_kwargs()
        return use_dense_strategy(
            graph,
            kw.get("message_aggregation_function", "sum"),
            self.params.get("aggregation_strategy", "auto"),
        )

    def _attach_cached_dense_adj_fold(self, batches: List[TaskBatch],
                                      data_fold=None):
        """When a fold's batches are device-resident across epochs, also
        cache their dense adjacency matrices (built once per RUN instead
        of once per step — the build is the single most expensive op of a
        dense-strategy step). Stored in bfloat16: multiplicity entries are
        small integers (exact), and the MXU matmul consumes bf16 inputs
        anyway. All-or-nothing per fold, gated by a memory budget shared
        across folds."""
        wants = [self._wants_dense_adj(b.graph) for b in batches]
        if not batches or not any(wants):
            return batches
        budget = float(self.params.get("dense_adj_cache_budget_gb", 9.0))
        # Per-batch sizes: multi-bucket folds (tasks/base.py
        # compute_batch_specs) mix n_pad levels within one fold.
        fold_gb = sum(
            len(b.graph.edges) * b.graph.n_pad * b.graph.n_pad * 2 / 1e9
            for b, w in zip(batches, wants) if w
        )
        if self._dense_adj_cached_gb + fold_gb > budget:
            return batches
        self._dense_adj_cached_gb += fold_gb
        if data_fold is not None:
            self._fold_adj_gb[data_fold] = fold_gb
        if self._jitted_adj_build is None:
            from ..ops.edge_ops import dense_adjacency

            self._jitted_adj_build = jax.jit(
                lambda g: tuple(dense_adjacency(g, dtype=jnp.bfloat16))
            )
        return [
            b._replace(graph=b.graph._replace(
                dense_adj=self._jitted_adj_build(b.graph)
            )) if w else b
            for b, w in zip(batches, wants)
        ]

    def _device_batch(self, batch: TaskBatch) -> TaskBatch:
        # Keep the host-side stat ints out of the transfer (fetching them
        # back per batch would force a device sync each step).
        return TaskBatch(
            graph=jax.tree_util.tree_map(jnp.asarray, batch.graph),
            aux=jax.tree_util.tree_map(jnp.asarray, batch.aux),
            num_graphs=int(batch.num_graphs),
            num_nodes=int(batch.num_nodes),
            num_edges=int(batch.num_edges),
        )

    def _run_epoch(
        self,
        epoch_name: str,
        data: Iterable[Any],
        data_fold: DataFold,
        quiet: bool = False,
    ) -> Tuple[float, List[Dict[str, Any]], int, float, float, float]:
        gp = int(self.params.get("graph_parallel", 1) or 1)
        replicas = int(self.params.get("num_model_replicas", 1) or 1)
        if gp > 1:
            if replicas > 1:
                raise ValueError(
                    "graph_parallel and num_model_replicas are mutually "
                    "exclusive (got %d and %d)" % (gp, replicas)
                )
            if len(jax.devices()) < gp:
                raise ValueError(
                    "graph_parallel=%d but only %d devices visible"
                    % (gp, len(jax.devices()))
                )
            if data_fold == DataFold.TRAIN:
                # Same repack-cadence bookkeeping as the single-device
                # cache path below (reference re-packs per epoch).
                self._train_epochs_seen += 1
                repack_every = int(
                    self.params.get("repack_cached_every") or 0
                )
                if (self.params.get("cache_batches_on_device")
                        and repack_every > 0
                        and self._train_epochs_seen > 1
                        and (self._train_epochs_seen - 1) % repack_every
                        == 0):
                    self._invalidate_fold_cache(data_fold)
            return self._run_epoch_graph_parallel(
                epoch_name, data, data_fold, gp, quiet
            )
        if replicas > 1:
            if len(jax.devices()) < replicas:
                raise ValueError(
                    "num_model_replicas=%d but only %d devices visible"
                    % (replicas, len(jax.devices()))
                )
            if data_fold == DataFold.TRAIN:
                # Same repack-cadence bookkeeping as the single-device
                # cache path below (reference re-packs per epoch).
                self._train_epochs_seen += 1
                repack_every = int(
                    self.params.get("repack_cached_every") or 0
                )
                if (self.params.get("cache_batches_on_device")
                        and repack_every > 0
                        and self._train_epochs_seen > 1
                        and (self._train_epochs_seen - 1) % repack_every
                        == 0):
                    self._invalidate_fold_cache(data_fold)
            return self._run_epoch_dp(epoch_name, data, data_fold, replicas)

        cache_on_device = self.params.get("cache_batches_on_device", False)
        if cache_on_device and getattr(data, "is_streaming", False):
            # A disk-resident streamed fold (tasks/varmisuse.py
            # ShardedSampleStream) exists precisely because the data does
            # not fit in one memory — never pin it to HBM.
            if not getattr(self, "_warned_stream_cache", False):
                self._warned_stream_cache = True
                self.log_line(
                    "WARNING: cache_batches_on_device is ignored for a "
                    "streamed data fold (streaming_train_data)."
                )
            cache_on_device = False
        if data_fold == DataFold.TRAIN:
            # Periodic re-packing of the device-resident TRAIN cache: the
            # reference re-shuffles graphs into fresh packs every epoch
            # (ppi_task.py:204); frozen packs only reshuffle batch order.
            # repack_cached_every=K re-packs (and re-uploads) every K
            # epochs as a middle ground; 0/None keeps packs frozen.
            self._train_epochs_seen += 1
            repack_every = int(self.params.get("repack_cached_every") or 0)
            if (cache_on_device and repack_every > 0
                    and self._train_epochs_seen > 1
                    and (self._train_epochs_seen - 1) % repack_every == 0):
                self._invalidate_fold_cache(data_fold)
        cached = self._batch_cache.get(data_fold) if cache_on_device else None
        if cached is not None:
            if self.params.get("scan_epochs", False):
                # One-dispatch epochs; pays a large one-time scan compile,
                # worthwhile on direct-attached chips with many epochs.
                return self._run_epoch_scanned(cached, data_fold)
            order = np.arange(len(cached))
            if data_fold == DataFold.TRAIN:
                np.random.shuffle(order)
            batch_iterator = (cached[i] for i in order)
            already_on_device = True
        else:
            batch_iterator = self.task.make_minibatch_iterator(
                data, data_fold, self.params["max_nodes_in_batch"]
            )
            batch_iterator = ThreadedIterator(batch_iterator, max_queue_size=5)
            already_on_device = False

        if self._jitted_train_step is None:
            self._jitted_train_step = self._make_train_step()
            self._jitted_eval_step = self._make_eval_step()

        task_metric_results = []
        start_time = time.time()
        processed_graphs = processed_nodes = processed_edges = 0
        device_metrics: List[Dict[str, Any]] = []
        batch_graph_counts: List[int] = []

        to_cache: List[TaskBatch] = []
        for step_i, batch in enumerate(batch_iterator):
            processed_graphs += int(batch.num_graphs)
            processed_nodes += int(batch.num_nodes)
            processed_edges += int(batch.num_edges)
            if already_on_device:
                dev_batch = batch
            else:
                dev_batch = self._device_batch(batch)
                if cache_on_device:
                    to_cache.append(dev_batch)
            if data_fold == DataFold.TRAIN:
                rng = jax.random.PRNGKey(self._step_rng.randint(0, 2**31 - 1))
                self.model_params_tree, self.opt_state, metrics = (
                    self._jitted_train_step(
                        self.model_params_tree, self.opt_state, rng, dev_batch
                    )
                )
            else:
                metrics = self._jitted_eval_step(self.model_params_tree, dev_batch)
            device_metrics.append(metrics)
            batch_graph_counts.append(batch.num_graphs)
            if not quiet and step_i % 16 == 0:
                print(
                    "Running %s, batch %i (has %i graphs)."
                    % (epoch_name, step_i, batch.num_graphs),
                    end="\r",
                )

        assert processed_graphs > 0, "Can't run epoch over empty dataset."
        if cache_on_device and not already_on_device:
            # All-or-nothing per fold: attaching adjacencies to only SOME
            # batches would split the cached batches into two pytree
            # structures and force an extra jit compilation.
            self._batch_cache[data_fold] = self._attach_cached_dense_adj_fold(
                unify_win_tokens(to_cache), data_fold
            )
        # Single host sync at epoch end: fetch all metric scalars at once.
        host_metrics = jax.device_get(device_metrics)
        task_metric_results = [
            {k: np.asarray(v) for k, v in m.items()} for m in host_metrics
        ]
        epoch_loss = float(
            sum(
                float(m["loss"]) * n
                for m, n in zip(task_metric_results, batch_graph_counts)
            )
        )

        epoch_time = time.time() - start_time
        per_graph_loss = epoch_loss / processed_graphs
        graphs_per_sec = processed_graphs / epoch_time
        nodes_per_sec = processed_nodes / epoch_time
        edges_per_sec = processed_edges / epoch_time
        return (
            per_graph_loss,
            task_metric_results,
            processed_graphs,
            graphs_per_sec,
            nodes_per_sec,
            edges_per_sec,
        )

    def _invalidate_fold_cache(self, data_fold) -> None:
        """Drop a fold's device-resident batches (and their cached dense
        adjacencies) so the next epoch re-packs from host data."""
        self._batch_cache.pop(data_fold, None)
        self._stacked_cache.pop(data_fold, None)
        self._dp_group_cache.pop(data_fold, None)
        self._gp_batch_cache.pop(data_fold, None)
        self._dp_stacked_cache.pop(data_fold, None)
        self._dense_adj_cached_gb -= self._fold_adj_gb.pop(data_fold, 0.0)

    def _empty_like_batch(self, batch: TaskBatch) -> TaskBatch:
        """A zero-weight clone used to pad the last data-parallel group:
        num_graphs 0 and all masks zeroed, so it contributes nothing to
        gradients (weight 0 in the psum); its metrics are dropped on host."""
        g = batch.graph
        zero_graph = g._replace(
            node_mask=jnp.zeros_like(g.node_mask),
            graph_mask=jnp.zeros_like(g.graph_mask),
            num_graphs=jnp.zeros_like(jnp.asarray(g.num_graphs)),
            num_nodes=jnp.zeros_like(jnp.asarray(g.num_nodes)),
        )
        return TaskBatch(graph=zero_graph, aux=batch.aux,
                         num_graphs=0, num_nodes=0, num_edges=0)

    def _run_epoch_dp(
        self, epoch_name: str, data, data_fold: DataFold, replicas: int
    ) -> Tuple[float, List[Dict[str, Any]], int, float, float, float]:
        """Data-parallel epoch: groups of `replicas` same-shape batches run
        as one shard_map step over the 'dp' mesh; a short final group is
        padded with zero-weight batches.

        Composes with cache_batches_on_device: the STACKED replica groups
        are kept device-resident across epochs (group membership frozen
        like the single-device cache — repack_cached_every re-packs;
        training reshuffles the group order each epoch)."""
        from ..parallel.data_parallel import (
            make_dp_eval_step,
            make_dp_train_step,
            make_mesh,
        )

        if self._dp_steps is None:
            mesh = make_mesh(replicas)
            self._dp_mesh = mesh
            self._dp_steps = (
                make_dp_train_step(self, mesh),
                make_dp_eval_step(self, mesh),
            )
        dp_train, dp_eval = self._dp_steps

        # Multi-host: replicas span every process's devices. Each process
        # runs this SAME loop on the SAME (deterministically packed) fold
        # and feeds only its slice of each replica group
        # (parallel/multihost.py); per-batch metrics come back via one
        # process_allgather per group.
        nproc = jax.process_count()
        proc_id = jax.process_index()
        if nproc > 1 and replicas % nproc != 0:
            raise ValueError(
                "num_model_replicas=%d must be a multiple of the process "
                "count %d" % (replicas, nproc)
            )
        local_rep = replicas // max(nproc, 1)

        start_time = time.time()
        processed_graphs = processed_nodes = processed_edges = 0
        device_metric_groups: List[Tuple[Dict[str, Any], List[int]]] = []

        cache_on = bool(self.params.get("cache_batches_on_device")) and (
            not getattr(data, "is_streaming", False)
        )

        def run_group_stacked(stacked, counts: List[int]):
            if data_fold == DataFold.TRAIN:
                rng = jax.random.PRNGKey(self._step_rng.randint(0, 2**31 - 1))
                self.model_params_tree, self.opt_state, metrics = dp_train(
                    self.model_params_tree, self.opt_state, rng, stacked
                )
            else:
                metrics = dp_eval(self.model_params_tree, stacked)
            device_metric_groups.append((metrics, counts))

        cached = self._dp_group_cache.get(data_fold) if cache_on else None
        if (cached is not None and nproc == 1
                and self.params.get("scan_epochs", False)):
            # One-dispatch epochs over the cached replica groups:
            # lax.scan of the shard_map'd DP step per shape group.
            return self._run_epoch_dp_scanned(data_fold, cached, replicas,
                                              start_time)
        if cached is not None:
            groups, (processed_graphs, processed_nodes, processed_edges) = \
                cached
            order = np.arange(len(groups))
            if data_fold == DataFold.TRAIN:
                np.random.shuffle(order)
            for i in order:
                run_group_stacked(*groups[i])
        else:
            built: List[Tuple[Any, List[int]]] = []
            batch_iterator = ThreadedIterator(
                self.task.make_minibatch_iterator(
                    data, data_fold, self.params["max_nodes_in_batch"]
                ),
                max_queue_size=5,
            )

            def run_group(group: List[TaskBatch]):
                counts = [int(b.num_graphs) for b in group]
                while len(group) < replicas:
                    group.append(self._empty_like_batch(group[-1]))
                group = unify_win_tokens(group)
                if nproc > 1:
                    from ..parallel.multihost import global_dp_batch

                    mine = group[proc_id * local_rep:
                                 (proc_id + 1) * local_rep]
                    stacked_local = jax.tree_util.tree_map(
                        lambda *xs: np.stack(
                            [np.asarray(x) for x in xs], axis=0
                        ),
                        *mine,
                    )
                    stacked = global_dp_batch(stacked_local, self._dp_mesh)
                else:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(
                            [jnp.asarray(x) for x in xs], axis=0
                        ),
                        *group,
                    )
                if cache_on:
                    built.append((stacked, counts))
                run_group_stacked(stacked, counts)

            # Same-shape replica groups: multi-bucket folds (tasks/base.py
            # compute_batch_specs) interleave spec shapes, and a stacked
            # group must share one pytree shape.
            pending: Dict[Any, List[TaskBatch]] = {}
            for batch in batch_iterator:
                processed_graphs += int(batch.num_graphs)
                processed_nodes += int(batch.num_nodes)
                processed_edges += int(batch.num_edges)
                key = batch_shape_key(batch)
                group = pending.setdefault(key, [])
                # Multi-host: keep batches host-side; only this process's
                # slice of each group reaches its devices.
                group.append(batch if nproc > 1 else
                             self._device_batch(batch))
                if len(group) == replicas:
                    run_group(group)
                    pending[key] = []
            for group in pending.values():
                if group:
                    run_group(group)
            if cache_on:
                self._dp_group_cache[data_fold] = (
                    built,
                    (processed_graphs, processed_nodes, processed_edges),
                )

        assert processed_graphs > 0, "Can't run epoch over empty dataset."
        task_metric_results: List[Dict[str, Any]] = []
        batch_graph_counts: List[int] = []
        if nproc > 1:
            # Metrics are sharded over the dp axis: gather every process's
            # addressable rows so ALL hosts aggregate/log the full fold's
            # per-batch metric list identically.
            from jax.experimental import multihost_utils

            host_groups = []
            for metrics, _counts in device_metric_groups:
                host_m = {}
                for k, v in metrics.items():
                    shards = sorted(
                        v.addressable_shards,
                        key=lambda s: s.index[0].start or 0,
                    )
                    local = np.concatenate(
                        [np.asarray(s.data) for s in shards], axis=0
                    )
                    full = multihost_utils.process_allgather(local)
                    host_m[k] = full.reshape((-1,) + full.shape[2:])
                host_groups.append(host_m)
        else:
            host_groups = jax.device_get([m for m, _ in device_metric_groups])
        for (metrics, counts), host_m in zip(device_metric_groups, host_groups):
            for i in range(len(counts)):  # drop zero-weight padding replicas
                task_metric_results.append(
                    {k: np.asarray(v[i]) for k, v in host_m.items()}
                )
                batch_graph_counts.append(counts[i])
        # Same weighting as the single-device epoch driver (and the
        # reference, sparse_graph_model.py:294): sum(loss_b * num_graphs_b).
        epoch_loss = float(sum(
            float(m["loss"]) * c
            for m, c in zip(task_metric_results, batch_graph_counts)
        ))

        epoch_time = time.time() - start_time
        return (
            epoch_loss / processed_graphs,
            task_metric_results,
            processed_graphs,
            processed_graphs / epoch_time,
            processed_nodes / epoch_time,
            processed_edges / epoch_time,
        )

    def _run_epoch_dp_scanned(
        self, data_fold: DataFold, cached, replicas: int, start_time: float
    ) -> Tuple[float, List[Dict[str, Any]], int, float, float, float]:
        """Scanned data-parallel epochs: lax.scan of the shard_map'd DP
        step over super-stacked [G, P, ...] replica groups — ONE device
        dispatch per shape group per epoch, composing scan_epochs with
        num_model_replicas (group membership frozen like the single-device
        scan cache; TRAIN reshuffles group and within-group order)."""
        from ..parallel.data_parallel import (
            make_dp_eval_fn,
            make_dp_train_fn,
            make_mesh,
        )

        if self._dp_epoch_fns is None:
            mesh = make_mesh(replicas)
            dp_train_fn = make_dp_train_fn(self, mesh)
            dp_eval_fn = make_dp_eval_fn(self, mesh)

            def train_epoch(params, opt_state, rng, gstacked):
                def body(carry, batch_p):
                    params, opt_state, rng = carry
                    rng, sub = jax.random.split(rng)
                    params, opt_state, metrics = dp_train_fn(
                        params, opt_state, sub, batch_p
                    )
                    return (params, opt_state, rng), metrics

                (params, opt_state, _), metrics = jax.lax.scan(
                    body, (params, opt_state, rng), gstacked
                )
                return params, opt_state, metrics

            def eval_epoch(params, gstacked):
                def body(carry, batch_p):
                    return carry, dp_eval_fn(params, batch_p)

                _, metrics = jax.lax.scan(body, (), gstacked)
                return metrics

            self._dp_epoch_fns = (
                jax.jit(train_epoch, donate_argnums=(0, 1)),
                jax.jit(eval_epoch),
            )
        train_epoch_fn, eval_epoch_fn = self._dp_epoch_fns

        groups, (processed_graphs, processed_nodes, processed_edges) = cached
        sup = self._dp_stacked_cache.get(data_fold)
        if sup is None:
            by_key: Dict[Any, List[int]] = {}
            for i, (stacked, _counts) in enumerate(groups):
                key = tuple(
                    (leaf.shape, str(leaf.dtype))
                    for leaf in jax.tree_util.tree_leaves(stacked)
                )
                by_key.setdefault(key, []).append(i)
            sup = []
            for idxs in by_key.values():
                gstacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs, axis=0),
                    *[groups[i][0] for i in idxs],
                )
                sup.append((gstacked, idxs))
            self._dp_stacked_cache[data_fold] = sup
            # Keep only the host-side counts; drop the per-group device
            # arrays so one device-resident copy of the fold stays alive.
            self._dp_group_cache[data_fold] = (
                [(None, counts) for _, counts in groups],
                (processed_graphs, processed_nodes, processed_edges),
            )

        group_metrics = []  # (device metrics [G, P, ...], group idx list)
        if data_fold == DataFold.TRAIN:
            order = np.random.permutation(len(sup))
            for gi in order:
                gstacked, idxs = sup[gi]
                within = np.random.permutation(len(idxs))
                perm = jnp.asarray(within)
                xs = jax.tree_util.tree_map(
                    lambda x: jnp.take(x, perm, axis=0), gstacked
                )
                rng = jax.random.PRNGKey(
                    self._step_rng.randint(0, 2**31 - 1)
                )
                (self.model_params_tree, self.opt_state,
                 metrics) = train_epoch_fn(
                    self.model_params_tree, self.opt_state, rng, xs
                )
                group_metrics.append(
                    (metrics, [idxs[i] for i in within])
                )
        else:
            for gstacked, idxs in sup:
                metrics = eval_epoch_fn(self.model_params_tree, gstacked)
                group_metrics.append((metrics, idxs))

        task_metric_results: List[Dict[str, Any]] = []
        batch_graph_counts: List[int] = []
        host_groups = jax.device_get([m for m, _ in group_metrics])
        for (_, idxs), host_m in zip(group_metrics, host_groups):
            for gi_in_scan, fold_group_i in enumerate(idxs):
                counts = groups[fold_group_i][1]
                for r in range(len(counts)):  # drop zero-weight padding
                    task_metric_results.append({
                        k: np.asarray(v[gi_in_scan][r])
                        for k, v in host_m.items()
                    })
                    batch_graph_counts.append(counts[r])
        epoch_loss = float(sum(
            float(m["loss"]) * c
            for m, c in zip(task_metric_results, batch_graph_counts)
        ))
        epoch_time = time.time() - start_time
        return (
            epoch_loss / processed_graphs,
            task_metric_results,
            processed_graphs,
            processed_graphs / epoch_time,
            processed_nodes / epoch_time,
            processed_edges / epoch_time,
        )

    def _run_epoch_graph_parallel(
        self, epoch_name: str, data, data_fold: DataFold, num_partitions: int,
        quiet: bool = False,
    ) -> Tuple[float, List[Dict[str, Any]], int, float, float, float]:
        """Graph-parallel epoch: every batch's mega-graph is node-partitioned
        across `num_partitions` devices (parallel/graph_parallel.py). The
        padded TaskBatch itself is replicated for the task's input/output
        models; only the propagation is sharded."""
        from ..ops.graph import bucket_size
        from ..parallel.data_parallel import make_mesh
        from ..parallel.graph_parallel import (
            make_gp_task_steps,
            partition_task_batch,
            partition_task_batch_halo,
        )

        if self._gp_steps is None:
            mesh = make_mesh(num_partitions, axis_name="gp")
            self._gp_steps = make_gp_task_steps(self, mesh)
        gp_train, gp_eval = self._gp_steps
        use_halo = bool(self.params.get("graph_parallel_halo"))

        start_time = time.time()
        processed_graphs = processed_nodes = processed_edges = 0
        device_metrics: List[Dict[str, Any]] = []
        batch_graph_counts: List[int] = []

        def run_entry(step_i, dev_batch, shards, num_graphs):
            if data_fold == DataFold.TRAIN:
                rng = jax.random.PRNGKey(
                    self._step_rng.randint(0, 2**31 - 1)
                )
                self.model_params_tree, self.opt_state, metrics = gp_train(
                    self.model_params_tree, self.opt_state, rng,
                    dev_batch, shards,
                )
            else:
                metrics = gp_eval(self.model_params_tree, dev_batch, shards)
            device_metrics.append(metrics)
            batch_graph_counts.append(num_graphs)
            if not quiet and step_i % 16 == 0:
                print("Running %s, batch %i (has %i graphs)."
                      % (epoch_name, step_i, num_graphs), end="\r")

        # Device-resident cache of (batch, shards): host-side partitioning
        # is NOT on the per-epoch critical path once a fold is cached
        # (packing and partitioning both happen once per fold, like the
        # single-device cache path).
        cache_on = bool(self.params.get("cache_batches_on_device")) and (
            not getattr(data, "is_streaming", False)
        )
        cached = self._gp_batch_cache.get(data_fold) if cache_on else None
        if cached is not None:
            entries, (processed_graphs, processed_nodes,
                      processed_edges) = cached
            order = np.arange(len(entries))
            if data_fold == DataFold.TRAIN:
                np.random.shuffle(order)
            for step_i, i in enumerate(order):
                run_entry(step_i, *entries[i])
        else:
            built: List[Tuple[Any, Any, int]] = []
            batch_iterator = ThreadedIterator(
                self.task.make_minibatch_iterator(
                    data, data_fold, self.params["max_nodes_in_batch"]
                ),
                max_queue_size=5,
            )
            for step_i, batch in enumerate(batch_iterator):
                processed_graphs += int(batch.num_graphs)
                processed_nodes += int(batch.num_nodes)
                processed_edges += int(batch.num_edges)
                e_pad_total = bucket_size(
                    sum(e.senders.shape[0] for e in batch.graph.edges),
                    min_size=64,
                )
                if use_halo:
                    shards, _, _, _ = partition_task_batch_halo(
                        batch, num_partitions, batch.graph.n_pad,
                        e_pad_total,
                    )
                else:
                    shards, _, _ = partition_task_batch(
                        batch, num_partitions, batch.graph.n_pad,
                        e_pad_total,
                    )
                shards = jax.tree_util.tree_map(jnp.asarray, shards)
                dev_batch = self._device_batch(batch)
                if cache_on:
                    built.append((dev_batch, shards, int(batch.num_graphs)))
                run_entry(step_i, dev_batch, shards, int(batch.num_graphs))
            if cache_on:
                self._gp_batch_cache[data_fold] = (
                    built,
                    (processed_graphs, processed_nodes, processed_edges),
                )

        assert processed_graphs > 0, "Can't run epoch over empty dataset."
        host_metrics = jax.device_get(device_metrics)
        task_metric_results = [
            {k: np.asarray(v) for k, v in m.items()} for m in host_metrics
        ]
        epoch_loss = float(sum(
            float(m["loss"]) * n
            for m, n in zip(task_metric_results, batch_graph_counts)
        ))
        epoch_time = time.time() - start_time
        return (
            epoch_loss / processed_graphs,
            task_metric_results,
            processed_graphs,
            processed_graphs / epoch_time,
            processed_nodes / epoch_time,
            processed_edges / epoch_time,
        )

    def _run_epoch_scanned(
        self, cached: List[TaskBatch], data_fold: DataFold
    ) -> Tuple[float, List[Dict[str, Any]], int, float, float, float]:
        """Epoch over device-resident batches in ONE device dispatch per
        shape group via lax.scan (see _make_epoch_fns). Multi-bucket folds
        (tasks/base.py compute_batch_specs) scan each spec shape as its
        own group — group order and within-group order reshuffle per TRAIN
        epoch (graph-to-batch packing is frozen once cached)."""
        start_time = time.time()
        if self._jitted_epoch_fns is None:
            self._jitted_epoch_fns = self._make_epoch_fns()
        train_epoch_fn, eval_epoch_fn = self._jitted_epoch_fns

        groups = self._stacked_cache.get(data_fold)
        if groups is None:
            # Cached dense adjacencies are NOT stacked: a [B, L, N, N]
            # stack (plus the per-epoch shuffled copy below) would blow
            # the dense_adj_cache_budget several times over; the scan body
            # rebuilds the adjacency per step instead.
            cached_nodense = [
                b._replace(graph=b.graph._replace(dense_adj=None))
                for b in cached
            ]
            by_key: Dict[Any, List[int]] = {}
            for i, b in enumerate(cached_nodense):
                by_key.setdefault(batch_shape_key(b), []).append(i)
            groups = []
            for idxs in by_key.values():
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(
                        [jnp.asarray(x) for x in xs], axis=0
                    ),
                    *[cached_nodense[i] for i in idxs],
                )
                groups.append((stacked, idxs))
            self._stacked_cache[data_fold] = groups
            # Keep only host-side stats; drop the per-batch device arrays
            # (otherwise two full device-resident copies of the fold stay
            # alive for the rest of training).
            cached = [
                TaskBatch(graph=None, aux=None, num_graphs=int(b.num_graphs),
                          num_nodes=int(b.num_nodes), num_edges=int(b.num_edges))
                for b in cached
            ]
            self._batch_cache[data_fold] = cached

        group_metrics = []  # per group: (device metrics dict, fold idxs)
        if data_fold == DataFold.TRAIN:
            group_order = np.random.permutation(len(groups))
            for gi in group_order:
                stacked, idxs = groups[gi]
                within = np.random.permutation(len(idxs))
                perm = jnp.asarray(within)
                xs = jax.tree_util.tree_map(
                    lambda x: jnp.take(x, perm, axis=0), stacked
                )
                rng = jax.random.PRNGKey(
                    self._step_rng.randint(0, 2**31 - 1)
                )
                (self.model_params_tree, self.opt_state,
                 metrics) = train_epoch_fn(
                    self.model_params_tree, self.opt_state, rng, xs
                )
                group_metrics.append(
                    (metrics, [idxs[i] for i in within])
                )
        else:
            for stacked, idxs in groups:
                metrics = eval_epoch_fn(self.model_params_tree, stacked)
                group_metrics.append((metrics, idxs))

        host_groups = jax.device_get([m for m, _ in group_metrics])
        task_metric_results = []
        batch_graph_counts = []
        for (_, idxs), host_m in zip(group_metrics, host_groups):
            for i, fold_i in enumerate(idxs):
                task_metric_results.append(
                    {k: np.asarray(v[i]) for k, v in host_m.items()}
                )
                batch_graph_counts.append(int(cached[fold_i].num_graphs))
        processed_graphs = sum(int(b.num_graphs) for b in cached)
        processed_nodes = sum(int(b.num_nodes) for b in cached)
        processed_edges = sum(int(b.num_edges) for b in cached)
        epoch_loss = float(sum(
            float(m["loss"]) * n
            for m, n in zip(task_metric_results, batch_graph_counts)
        ))
        epoch_time = time.time() - start_time
        return (
            epoch_loss / processed_graphs,
            task_metric_results,
            processed_graphs,
            processed_graphs / epoch_time,
            processed_nodes / epoch_time,
            processed_edges / epoch_time,
        )

    # -------------------- train / test --------------------

    @property
    def training_state_file(self):
        return os.path.join(
            self.result_dir, "%s_training_state.pickle" % self.run_id
        )

    def train(self, quiet: bool = False, tf_summary_path: Optional[str] = None,
              resume_from: Optional[str] = None):
        """Patience-based early-stopped training; log format kept verbatim
        (the bench scripts regex these lines, run_ppi_benchs.py:21-22,49-56).

        resume_from: optional full-state checkpoint (save_training_state);
        continues from the saved epoch with optimizer slots and
        early-stopping state intact. `checkpoint_every_n_epochs` (model
        param, default off) writes such checkpoints periodically."""
        total_time_start = time.time()
        metrics_writer = None
        if tf_summary_path is not None:
            from ..utils.metrics_writer import MetricsWriter
            from ..utils.tb_writer import FoldedTensorBoardWriter

            class _Fanout:
                """JSONL stream plus TensorBoard event files, fed the same
                (fold, step, scalars) records (the reference's --tensorboard
                writes event files; the JSONL stream is this framework's
                always-readable extra)."""

                def __init__(self, sinks):
                    self._sinks = sinks

                def write(self, fold, step, scalars):
                    for sink in self._sinks:
                        sink.write(fold, step, scalars)

            metrics_writer = _Fanout([
                MetricsWriter(tf_summary_path),
                FoldedTensorBoardWriter(tf_summary_path, self.run_id),
            ])

        best_valid_metric, best_val_metric_epoch, best_val_metric_descr = (
            float("+inf"), 0, "",
        )
        collapse_streak, collapse_warned = 0, False
        total_num_graphs = 0  # metrics x-axis (reference sparse_graph_model.py:143-151)
        start_epoch = 1
        if resume_from is not None:
            resumed = self.restore_training_state(resume_from)
            start_epoch = resumed["epoch"] + 1
            es = resumed["early_stop_state"]
            best_valid_metric = es["best_valid_metric"]
            best_val_metric_epoch = es["best_val_metric_epoch"]
            best_val_metric_descr = es["best_val_metric_descr"]
            self.log_line("Resuming from %s at epoch %i."
                          % (resume_from, start_epoch))
        ckpt_every = self.params.get("checkpoint_every_n_epochs") or 0
        for epoch in range(start_epoch, self.params["max_epochs"] + 1):
            self.log_line("== Epoch %i" % epoch)
            (train_loss, train_task_metrics, train_num_graphs,
             train_graphs_p_s, train_nodes_p_s, train_edges_p_s) = self._run_epoch(
                "epoch %i (training)" % epoch,
                self.task._loaded_data[DataFold.TRAIN],
                DataFold.TRAIN,
                quiet=quiet,
            )
            if not quiet:
                print("\r\x1b[K", end="")
            self.log_line(
                " Train: loss: %.5f || %s || graphs/sec: %.2f | nodes/sec: %.0f | edges/sec: %.0f"
                % (
                    train_loss,
                    self.task.pretty_print_epoch_task_metrics(
                        train_task_metrics, train_num_graphs
                    ),
                    train_graphs_p_s, train_nodes_p_s, train_edges_p_s,
                )
            )
            total_num_graphs += train_num_graphs
            if metrics_writer is not None:
                metrics_writer.write(
                    "train", total_num_graphs,
                    {"loss": train_loss, "epoch": epoch,
                     "graphs_per_sec": train_graphs_p_s},
                )

            (valid_loss, valid_task_metrics, valid_num_graphs,
             valid_graphs_p_s, valid_nodes_p_s, valid_edges_p_s) = self._run_epoch(
                "epoch %i (validation)" % epoch,
                self.task._loaded_data[DataFold.VALIDATION],
                DataFold.VALIDATION,
                quiet=quiet,
            )
            if not quiet:
                print("\r\x1b[K", end="")
            early_stopping_metric = self.task.early_stopping_metric(
                valid_task_metrics, valid_num_graphs
            )
            valid_metric_descr = self.task.pretty_print_epoch_task_metrics(
                valid_task_metrics, valid_num_graphs
            )
            self.log_line(
                " Valid: loss: %.5f || %s || graphs/sec: %.2f | nodes/sec: %.0f | edges/sec: %.0f"
                % (valid_loss, valid_metric_descr,
                   valid_graphs_p_s, valid_nodes_p_s, valid_edges_p_s)
            )
            if metrics_writer is not None:
                metrics_writer.write(
                    "valid", total_num_graphs,
                    {"loss": valid_loss, "epoch": epoch,
                     "early_stopping_metric": early_stopping_metric},
                )

            # Degenerate-basin guard (docs/PARITY.md): warn loudly when the
            # task reports the validation fold stuck in a known collapsed
            # basin for several consecutive epochs.
            collapse_msg = self.task.collapse_diagnostic(
                valid_loss, valid_task_metrics, valid_num_graphs
            )
            if collapse_msg is None:
                collapse_streak = 0
            else:
                collapse_streak += 1
                if collapse_streak == COLLAPSE_WARN_EPOCHS and not collapse_warned:
                    collapse_warned = True
                    self.log_line(
                        "WARNING: collapsed-optimization basin suspected — %s "
                        "for %i consecutive epochs. The model is likely stuck "
                        "predicting a constant. If training on a small fold with "
                        "hypers tuned for a larger one, reduce the step size "
                        "(small-fold recipe: Adam, learning_rate 1e-4, "
                        "max_nodes_in_batch 10000 — see docs/PARITY.md)."
                        % (collapse_msg, COLLAPSE_WARN_EPOCHS)
                    )

            if early_stopping_metric < best_valid_metric:
                self.save_model(self.best_model_file)
                self.log_line(
                    "  (Best epoch so far, target metric decreased to %.5f from %.5f. Saving to '%s')"
                    % (early_stopping_metric, best_valid_metric, self.best_model_file)
                )
                best_valid_metric = early_stopping_metric
                best_val_metric_epoch = epoch
                best_val_metric_descr = valid_metric_descr
            elif epoch - best_val_metric_epoch >= self.params["patience"]:
                total_time = time.time() - total_time_start
                self.log_line(
                    "Stopping training after %i epochs without improvement on validation loss."
                    % self.params["patience"]
                )
                self.log_line(
                    "Training took %is. Best validation results: %s"
                    % (total_time, best_val_metric_descr)
                )
                break

            if ckpt_every and epoch % ckpt_every == 0:
                self.save_training_state(
                    self.training_state_file, epoch,
                    {"best_valid_metric": best_valid_metric,
                     "best_val_metric_epoch": best_val_metric_epoch,
                     "best_val_metric_descr": best_val_metric_descr},
                )

    def test(self, path: Optional[str], quiet: bool = False):
        self.log_line("== Running Test on %s ==" % (path,))
        data = self.task._loaded_data.get(DataFold.TEST)
        if data is None:
            data = self.task.load_eval_data_from_path(path)
        test_loss, test_task_metrics, test_num_graphs, _, _, _ = self._run_epoch(
            "Test", data, DataFold.TEST, quiet=quiet
        )
        if not quiet:
            print("\r\x1b[K", end="")
        self.log_line("Loss %.5f on %i graphs" % (test_loss, test_num_graphs))
        self.log_line(
            "Metrics: %s"
            % self.task.pretty_print_epoch_task_metrics(
                test_task_metrics, test_num_graphs
            )
        )


# ---------------------------------------------------------------------------
# The seven concrete models (reference: models/*_model.py)
# ---------------------------------------------------------------------------


class GGNN_Model(SparseGraphModel):
    layer_name = "ggnn"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "hidden_size": 128,
            "graph_rnn_cell": "GRU",
            "graph_activation_function": "tanh",
            "message_aggregation_function": "sum",
            "graph_layer_input_dropout_keep_prob": 1.0,
            "graph_dense_between_every_num_gnn_layers": 10000,
            "graph_residual_connection_every_num_layers": 10000,
        })
        return params

    @staticmethod
    def name(params):
        return "GGNN"

    def layer_kwargs(self):
        return {
            "gated_unit_type": self.params["graph_rnn_cell"].lower(),
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
            "aggregation_strategy": self.params.get("aggregation_strategy", "auto"),
        }


class RGCN_Model(SparseGraphModel):
    layer_name = "rgcn"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "hidden_size": 128,
            "graph_activation_function": "ReLU",
            "message_aggregation_function": "sum",
            "graph_layer_input_dropout_keep_prob": 1.0,
            "graph_dense_between_every_num_gnn_layers": 10000,
            "graph_residual_connection_every_num_layers": 10000,
        })
        return params

    @staticmethod
    def name(params):
        return "RGCN"

    def layer_kwargs(self):
        return {
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
            "aggregation_strategy": self.params.get("aggregation_strategy", "auto"),
        }


class RGAT_Model(SparseGraphModel):
    layer_name = "rgat"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "hidden_size": 128,
            "num_heads": 4,
            "graph_activation_function": "tanh",
            "graph_layer_input_dropout_keep_prob": 1.0,
            "graph_dense_between_every_num_gnn_layers": 10000,
            "graph_residual_connection_every_num_layers": 10000,
        })
        return params

    @staticmethod
    def name(params):
        return "RGAT"

    def layer_kwargs(self):
        return {
            "num_heads": self.params["num_heads"],
            "activation_function": self.params["graph_activation_function"],
            "aggregation_strategy": self.params.get("aggregation_strategy", "auto"),
        }


class RGIN_Model(SparseGraphModel):
    layer_name = "rgin"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "hidden_size": 128,
            "graph_activation_function": "ReLU",
            "message_aggregation_function": "sum",
            "graph_dense_between_every_num_gnn_layers": 10000,
            "graph_inter_layer_norm": True,
            "use_target_state_as_input": False,
            "graph_num_edge_MLP_hidden_layers": 1,
            "graph_num_aggr_MLP_hidden_layers": None,
        })
        return params

    @staticmethod
    def name(params):
        return "RGIN"

    def layer_kwargs(self):
        return {
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
            "use_target_state_as_input": self.params["use_target_state_as_input"],
            "num_edge_MLP_hidden_layers": self.params["graph_num_edge_MLP_hidden_layers"],
            "typed_edge_scan": self.params.get("typed_edge_scan", "auto"),
            "num_aggr_MLP_hidden_layers": self.params["graph_num_aggr_MLP_hidden_layers"],
        }


class GNN_Edge_MLP_Model(SparseGraphModel):
    layer_name = "gnn_edge_mlp"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "max_nodes_in_batch": 25000,
            "hidden_size": 128,
            "graph_activation_function": "gelu",
            "message_aggregation_function": "sum",
            "graph_inter_layer_norm": True,
            "use_target_state_as_input": True,
            "num_edge_hidden_layers": 1,
        })
        return params

    @staticmethod
    def name(params):
        # Parameterized name (models/gnn_edge_mlp_model.py:26-27).
        return "GNN-Edge-MLP%i" % (params["num_edge_hidden_layers"])

    def layer_kwargs(self):
        return {
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
            "use_target_state_as_input": self.params["use_target_state_as_input"],
            "num_edge_hidden_layers": self.params["num_edge_hidden_layers"],
            "typed_edge_scan": self.params.get("typed_edge_scan", "auto"),
        }


class RGDCN_Model(SparseGraphModel):
    layer_name = "rgdcn"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "max_nodes_in_batch": 25000,
            "hidden_size": 128,
            "num_channels": 8,
            "use_full_state_for_channel_weights": False,
            "tie_channel_weights": False,
            "graph_activation_function": "ReLU",
            "message_aggregation_function": "sum",
            "graph_inter_layer_norm": True,
        })
        return params

    @staticmethod
    def name(params):
        return "RGDCN"

    def __init__(self, params, task, run_id, result_dir):
        params["channel_dim"] = params["hidden_size"] // params["num_channels"]
        super().__init__(params, task, run_id, result_dir)

    def layer_kwargs(self):
        return {
            "num_channels": self.params["num_channels"],
            "channel_dim": self.params["channel_dim"],
            "use_full_state_for_channel_weights": self.params[
                "use_full_state_for_channel_weights"
            ],
            "tie_channel_weights": self.params["tie_channel_weights"],
            "typed_edge_scan": self.params.get("typed_edge_scan", "auto"),
            "aggregation_strategy": self.params.get(
                "aggregation_strategy", "auto"
            ),
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
        }


class GNN_FiLM_Model(SparseGraphModel):
    layer_name = "gnn_film"

    @classmethod
    def default_params(cls):
        params = super().default_params()
        params.update({
            "hidden_size": 128,
            "graph_activation_function": "ReLU",
            "message_aggregation_function": "sum",
            "normalize_messages_by_num_incoming": False,
        })
        return params

    @staticmethod
    def name(params):
        return "GNN-FiLM"

    def layer_kwargs(self):
        return {
            "aggregation_strategy": self.params.get("aggregation_strategy", "auto"),
            "activation_function": self.params["graph_activation_function"],
            "message_aggregation_function": self.params["message_aggregation_function"],
            "normalize_by_num_incoming": self.params[
                "normalize_messages_by_num_incoming"
            ],
        }
