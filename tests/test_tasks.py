"""Task-level tests: loaders, heads, batching and short end-to-end training
for PPI, Citation, and VarMisuse over synthetic fixtures."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.tasks.base import DataFold

from fixtures import make_planetoid_dir, make_ppi_dir, make_varmisuse_dir


def _short_train(model, task, epochs=2):
    from tf_gnn_samples_tpu.tasks.base import DataFold

    losses = []
    for _ in range(epochs):
        loss, metrics, n, *_ = model._run_epoch(
            "t", task._loaded_data[DataFold.TRAIN], DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
    return losses


# ---------------------------------------------------------------------------
# PPI
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ppi_task(tmp_path_factory):
    from tf_gnn_samples_tpu.tasks.ppi import PPI_Task

    root = make_ppi_dir(str(tmp_path_factory.mktemp("ppi")))
    task = PPI_Task(PPI_Task.default_params())
    task.load_data(root)
    return task


def test_ppi_load_shapes(ppi_task):
    data = ppi_task._loaded_data[DataFold.TRAIN]
    assert len(data) == 4
    assert ppi_task.num_edge_types == 3  # fwd, self-loop, bkwd
    g = data[0]
    assert g.node_features.shape == (300, 50)
    assert g.node_labels.shape == (300, 121)
    # self-loops:
    np.testing.assert_array_equal(
        g.adjacency_lists[1][:, 0], g.adjacency_lists[1][:, 1]
    )
    # bkwd edges are reversed fwd edges:
    np.testing.assert_array_equal(
        g.adjacency_lists[2], g.adjacency_lists[0][:, ::-1]
    )


def test_ppi_incoming_counts_match(ppi_task):
    g = ppi_task._loaded_data[DataFold.TRAIN][0]
    for l in range(3):
        counts = np.zeros(300)
        np.add.at(counts, g.adjacency_lists[l][:, 1], 1.0)
        np.testing.assert_array_equal(g.type_to_node_to_num_incoming_edges[l], counts)


def test_ppi_micro_f1_matches_sklearn_style(ppi_task):
    """Masked counts on a padded batch match a dense numpy micro-F1."""
    batch = next(
        ppi_task.make_minibatch_iterator(
            ppi_task._loaded_data[DataFold.TRAIN], DataFold.VALIDATION, 650
        )
    )
    rng = np.random.RandomState(0)
    logits = rng.randn(batch.graph.n_pad, 121).astype(np.float32)
    from tf_gnn_samples_tpu.tasks.ppi import micro_f1_counts

    tp, fp, fn = micro_f1_counts(
        jnp.asarray(logits), jnp.asarray(batch.aux["target_labels"]),
        jnp.asarray(batch.graph.node_mask),
    )
    n = int(batch.num_nodes)
    preds = (1 / (1 + np.exp(-logits[:n])) >= 0.5).astype(np.int64)
    labels = batch.aux["target_labels"][:n].astype(np.int64)
    assert int(tp) == int(np.sum(preds * labels))
    assert int(fp) == int(np.sum(preds * (1 - labels)))
    assert int(fn) == int(np.sum((1 - preds) * labels))


def test_ppi_end_to_end_loss_decreases(ppi_task):
    from tf_gnn_samples_tpu.runtime.model import GNN_FiLM_Model

    params = GNN_FiLM_Model.default_params()
    params.update({"graph_num_layers": 2, "hidden_size": 32, "max_epochs": 2,
                   "max_nodes_in_batch": 650})
    model = GNN_FiLM_Model(params, ppi_task, "t", "/tmp/ppi_test_run")
    losses = _short_train(model, ppi_task, epochs=3)
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Citation
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def citation_task(tmp_path_factory):
    from tf_gnn_samples_tpu.tasks.citation import Citation_Network_Task

    root = make_planetoid_dir(str(tmp_path_factory.mktemp("cit")))
    params = Citation_Network_Task.default_params()
    params["data_kind"] = "cora"
    task = Citation_Network_Task(params)
    task.load_data(root)
    return task


def test_citation_single_batch(citation_task):
    batches = list(
        citation_task.make_minibatch_iterator(
            citation_task._loaded_data[DataFold.TRAIN], DataFold.TRAIN, 100000
        )
    )
    assert len(batches) == 1
    b = batches[0]
    assert b.num_graphs == 1
    # Mask counts = number of training nodes (40 in the fixture):
    assert int(b.aux["mask"].sum()) == 40
    # Edge type 0 = self loops:
    e0 = b.graph.edges[0]
    real = np.asarray(e0.mask) > 0
    np.testing.assert_array_equal(
        np.asarray(e0.senders)[real], np.asarray(e0.receivers)[real]
    )


def test_citation_masked_accuracy_range(citation_task):
    from tf_gnn_samples_tpu.runtime.model import RGCN_Model

    params = RGCN_Model.default_params()
    params.update({"graph_num_layers": 2, "hidden_size": 16})
    model = RGCN_Model(params, citation_task, "t", "/tmp/cit_test_run")
    b = next(iter(citation_task.make_minibatch_iterator(
        citation_task._loaded_data[DataFold.VALIDATION], DataFold.VALIDATION, 1 << 20
    )))
    loss, metrics = model._forward(
        model.model_params_tree, model._device_batch(b), None
    )
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    assert float(loss) > 0


# ---------------------------------------------------------------------------
# VarMisuse
# ---------------------------------------------------------------------------


def test_split_identifier_into_parts():
    from tf_gnn_samples_tpu.tasks.varmisuse import split_identifier_into_parts

    assert split_identifier_into_parts("fooBar") == ["foo", "bar"]
    assert split_identifier_into_parts("baz_qux") == ["baz", "qux"]
    assert split_identifier_into_parts("HTTPResponse2") == ["http", "response2"]
    assert split_identifier_into_parts("x") == ["x"]


@pytest.fixture(scope="module")
def vm_task(tmp_path_factory):
    from tf_gnn_samples_tpu.tasks.varmisuse import VarMisuse_Task

    root = make_varmisuse_dir(str(tmp_path_factory.mktemp("vm")))
    task = VarMisuse_Task(VarMisuse_Task.default_params())
    task.load_data(root)
    return task


def test_varmisuse_load(vm_task):
    data = vm_task._loaded_data[DataFold.TRAIN]
    assert len(data) == 12  # 2 shards x 6 samples
    assert vm_task.num_edge_types == 22
    s = data[0]
    # Correct candidate reordered to index 0 and mask padded to 5:
    assert s.variable_candidate_nodes.shape == (5,)
    assert s.variable_candidate_nodes_mask[0] == 1.0
    # Subtoken nodes were added beyond the base nodes:
    assert s.type_to_node_to_num_incoming_edges.shape[0] == 22
    # UsesSubtoken edges exist (identifiers are in the fixture):
    from tf_gnn_samples_tpu.tasks.varmisuse import (
        PROGRAM_GRAPH_EDGES_TYPES_VOCAB,
        USES_SUBTOKEN_EDGE_NAME,
    )

    st = PROGRAM_GRAPH_EDGES_TYPES_VOCAB[USES_SUBTOKEN_EDGE_NAME]
    assert s.adjacency_lists[st].shape[0] > 0


def test_varmisuse_char_encoding(vm_task):
    from tf_gnn_samples_tpu.tasks.varmisuse import ALPHABET_DICT

    s = vm_task._loaded_data[DataFold.TRAIN][0]
    uniq = s.unique_labels_as_characters
    # All char codes are within PAD/UNK + alphabet:
    assert uniq.min() >= 0
    assert uniq.max() <= max(ALPHABET_DICT.values())
    # node -> unique map round-trips:
    assert s.node_labels_to_unique_labels.max() < uniq.shape[0]


def test_varmisuse_end_to_end(vm_task):
    from tf_gnn_samples_tpu.runtime.model import GGNN_Model

    params = GGNN_Model.default_params()
    params.update({"graph_num_layers": 2, "hidden_size": 64,
                   "max_nodes_in_batch": 400})
    model = GGNN_Model(params, vm_task, "t", "/tmp/vm_test_run")
    losses = _short_train(model, vm_task, epochs=3)
    assert losses[-1] < losses[0], losses


def test_varmisuse_accuracy_masked_correctly(vm_task):
    """Padded graphs must not contribute to num_correct."""
    from tf_gnn_samples_tpu.runtime.model import GGNN_Model

    params = GGNN_Model.default_params()
    params.update({"graph_num_layers": 1, "hidden_size": 64,
                   "max_nodes_in_batch": 400})
    model = GGNN_Model(params, vm_task, "t", "/tmp/vm_test_run2")
    b = next(iter(vm_task.make_minibatch_iterator(
        vm_task._loaded_data[DataFold.VALIDATION], DataFold.VALIDATION, 400
    )))
    _, metrics = model._forward(model.model_params_tree, model._device_batch(b), None)
    assert float(metrics["num_correct_predictions"]) <= float(b.num_graphs)


def test_varmisuse_checkpoint_roundtrip(vm_task, tmp_path):
    from tf_gnn_samples_tpu.runtime.model import GGNN_Model
    from tf_gnn_samples_tpu.utils.registry import restore

    params = GGNN_Model.default_params()
    params.update({"graph_num_layers": 1, "hidden_size": 64,
                   "max_nodes_in_batch": 400})
    model = GGNN_Model(params, vm_task, "t", str(tmp_path))
    path = str(tmp_path / "vm.pickle")
    model.save_model(path)
    model2 = restore(path, str(tmp_path))
    b = next(iter(vm_task.make_minibatch_iterator(
        vm_task._loaded_data[DataFold.VALIDATION], DataFold.VALIDATION, 400
    )))
    l1, _ = model._forward(model.model_params_tree, model._device_batch(b), None)
    l2, _ = model2._forward(model2.model_params_tree, model2._device_batch(b), None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_varmisuse_self_loops_with_parallel_loader(tmp_path):
    """Regression: add_self_loop_edges=True must survive the spawn-pool
    loader (workers re-import the module; no global vocab mutation)."""
    from tf_gnn_samples_tpu.tasks.varmisuse import VarMisuse_Task

    root = make_varmisuse_dir(str(tmp_path / "vm_sl"), num_shards=2,
                              samples_per_shard=3)
    params = VarMisuse_Task.default_params()
    params["add_self_loop_edges"] = True
    task = VarMisuse_Task(params)
    assert task.num_edge_types == 23
    task.load_data(str(tmp_path / "vm_sl"))
    s = task._loaded_data[DataFold.TRAIN][0]
    assert len(s.adjacency_lists) == 23
    sl = s.adjacency_lists[22]
    np.testing.assert_array_equal(sl[:, 0], sl[:, 1])  # self loops
    # A plain instance constructed afterwards is unaffected:
    task2 = VarMisuse_Task(VarMisuse_Task.default_params())
    assert task2.num_edge_types == 22


def test_qm9_multi_property_training(tmp_path):
    """QM9 trains multiple properties in one run (task_ids list), with one
    gated head and one MAE metric per property (qm9_task.py:163-196)."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.tasks.qm9 import QM9_Task, GraphSample

    model, task, samples = ge._tiny_task_and_model("RGCN", hidden=16, n_layers=1)
    params = QM9_Task.default_params()
    params["task_ids"] = [0, 5]
    multi = QM9_Task(params)
    multi.restore_from_metadata(
        {"params": params, "num_edge_types": 4, "annotation_size": 15}
    )
    rng = np.random.RandomState(0)
    samples2 = [
        GraphSample(
            adjacency_lists=s.adjacency_lists,
            type_to_node_to_num_incoming_edges=s.type_to_node_to_num_incoming_edges,
            node_features=s.node_features,
            target_values=rng.randn(2).astype(np.float32),
        )
        for s in samples
    ]
    from tf_gnn_samples_tpu.runtime.model import RGCN_Model

    p = RGCN_Model.default_params()
    p.update({"graph_num_layers": 1, "hidden_size": 16, "max_nodes_in_batch": 200})
    m = RGCN_Model(p, multi, "t", str(tmp_path))
    b = next(iter(multi.make_minibatch_iterator(samples2, DataFold.VALIDATION, 200)))
    loss, metrics = m._forward(m.model_params_tree, m._device_batch(b), None)
    assert "abs_err_task0" in metrics and "abs_err_task5" in metrics
    assert np.isfinite(float(loss))
    out = multi.pretty_print_epoch_task_metrics(
        [{k: np.asarray(v) for k, v in metrics.items()}], int(b.num_graphs)
    )
    assert "0:" in out and "5:" in out


def test_varmisuse_streaming_epoch_memory_bounded(tmp_path):
    """streaming_train_data: full coverage per epoch, bounded sample
    buffer, disk-cached stats pass, batches equivalent to in-memory."""
    import os
    from tf_gnn_samples_tpu.tasks import varmisuse as vm

    root = make_varmisuse_dir(str(tmp_path / "vm"), num_shards=5,
                              samples_per_shard=8)
    params = vm.VarMisuse_Task.default_params()
    params.update({"streaming_train_data": True,
                   "streaming_window_graphs": 6})
    task = vm.VarMisuse_Task(params)
    task.load_data(root)
    stream = task._loaded_data[DataFold.TRAIN]
    assert getattr(stream, "is_streaming", False)
    assert len(stream) == 40

    np.random.seed(0)
    batches1 = list(task.make_minibatch_iterator(stream, DataFold.TRAIN, 400))
    total1 = sum(b.num_graphs for b in batches1)
    assert total1 == 40  # every sample seen exactly once
    # Bounded buffering: the windowed shuffle never holds more than the
    # configured window of parsed samples.
    assert stream.max_buffered <= 6

    batches2 = list(task.make_minibatch_iterator(stream, DataFold.TRAIN, 400))
    assert sum(b.num_graphs for b in batches2) == 40

    # Stats pass is disk-cached: a fresh stream must not re-scan.
    cache = os.path.join(root, "graphs-train", ".tpu_stream_stats.json")
    assert os.path.exists(cache)
    orig_scan = vm._scan_shard
    vm._scan_shard = lambda args: (_ for _ in ()).throw(
        AssertionError("stats cache not used"))
    try:
        stream2 = vm.ShardedSampleStream(
            stream.paths, params["graph_node_label_max_num_chars"],
            params["max_variable_candidates"],
            params["add_self_loop_edges"], window_graphs=6,
        )
    finally:
        vm._scan_shard = orig_scan
    assert len(stream2) == 40

    # Same MAXIMAL spec level as the in-memory loader (stats parity;
    # per-batch levels may differ because pack composition differs):
    params_mem = vm.VarMisuse_Task.default_params()
    task_mem = vm.VarMisuse_Task(params_mem)
    task_mem.load_data(root)
    mem_batches = list(task_mem.make_minibatch_iterator(
        task_mem._loaded_data[DataFold.TRAIN], DataFold.TRAIN, 400))
    specs_stream, _ = task.cached_spec(stream, 400, lambda: (_ for _ in ()).throw(
        AssertionError("stream spec should be memoized")))
    specs_mem, _ = task_mem.cached_spec(
        task_mem._loaded_data[DataFold.TRAIN], 400,
        lambda: (_ for _ in ()).throw(
            AssertionError("mem spec should be memoized")))
    assert specs_stream[-1] == specs_mem[-1]
    assert max(b.graph.n_pad for b in batches1) <= specs_stream[-1].n_pad
    assert max(b.graph.n_pad for b in mem_batches) <= specs_mem[-1].n_pad


def test_varmisuse_streaming_trains_end_to_end(tmp_path):
    from tf_gnn_samples_tpu.tasks.varmisuse import VarMisuse_Task
    from tf_gnn_samples_tpu.runtime.model import GGNN_Model

    root = make_varmisuse_dir(str(tmp_path / "vm2"), num_shards=3,
                              samples_per_shard=4)
    tparams = VarMisuse_Task.default_params()
    tparams.update({"streaming_train_data": True,
                    "streaming_window_graphs": 5})
    task = VarMisuse_Task(tparams)
    task.load_data(root)
    params = GGNN_Model.default_params()
    params.update({"graph_num_layers": 1, "hidden_size": 32,
                   "max_nodes_in_batch": 400,
                   # exercised together: the runtime must refuse to pin a
                   # streamed fold to device memory (and still train).
                   "cache_batches_on_device": True})
    model = GGNN_Model(params, task, "t", str(tmp_path / "run"))
    losses = _short_train(model, task, epochs=2)
    assert np.isfinite(losses).all()
    assert model._batch_cache.get(DataFold.TRAIN) is None


# ---------------------------------------------------------------------------
# Multi-bucket batch specs
# ---------------------------------------------------------------------------


def test_compute_batch_specs_levels_and_selection():
    from tf_gnn_samples_tpu.tasks.base import (
        compute_batch_spec, compute_batch_specs, select_spec,
    )

    rng = np.random.RandomState(7)
    sizes = [
        (int(rng.randint(800, 2500)),
         [int(rng.randint(5000, 60000)) for _ in range(3)])
        for _ in range(40)
    ]
    specs = compute_batch_specs(sizes, 6000, 3, num_buckets=3)
    # The last spec is the packing spec (== the single-shape variant).
    assert specs[-1] == compute_batch_spec(sizes, 6000, 3)
    # Ascending node levels, each strictly below the max level.
    n_pads = [s.n_pad for s in specs]
    assert n_pads == sorted(n_pads)
    assert all(s.n_pad < specs[-1].n_pad for s in specs[:-1])
    # Every spec's edge pads stay multiples of the Pallas grid block.
    for s in specs:
        assert all(e % 2048 == 0 for e in s.e_pads)
    # Selection: something below the smallest level picks it; an
    # impossible requirement falls back to the max spec.
    small = specs[0]
    assert select_spec(specs, small.n_pad - 1,
                       [e - 1 for e in small.e_pads], 1) == small
    assert select_spec(specs, specs[-1].n_pad,
                       list(specs[-1].e_pads), 1) == specs[-1]
    # A dense small pack (few nodes, too many edges for its node level)
    # falls through past that level (to a covering level or, when nothing
    # covers, the packing spec — real packs always fit it by construction).
    dense = select_spec(specs, small.n_pad - 1,
                        [small.e_pads[0] + 1] + [1, 1], 1)
    assert dense.e_pads[0] > small.e_pads[0] or dense == specs[-1]


def test_ppi_fold_uses_multiple_specs_and_reduces_padding(ppi_task):
    """With batch_spec_buckets > 1 the PPI fold mixes batch shapes and
    the total padded-edge overhead drops vs the single-shape spec."""
    data = ppi_task._loaded_data[DataFold.TRAIN]
    budget = 700

    def fold_stats(buckets):
        ppi_task.params["batch_spec_buckets"] = buckets
        ppi_task._spec_cache.clear()
        try:
            batches = list(ppi_task.make_minibatch_iterator(
                data, DataFold.VALIDATION, budget
            ))
        finally:
            del ppi_task.params["batch_spec_buckets"]
            ppi_task._spec_cache.clear()
        pad_e = sum(b.graph.flat.src_flat.shape[0] for b in batches)
        real_e = sum(b.num_edges for b in batches)
        shapes = {
            (b.graph.n_pad, tuple(e.senders.shape[0] for e in b.graph.edges))
            for b in batches
        }
        return batches, pad_e, real_e, shapes

    b1, pad1, real1, shapes1 = fold_stats(1)
    b3, pad3, real3, shapes3 = fold_stats(3)
    assert real1 == real3
    assert len(shapes1) == 1
    assert pad3 <= pad1
    # Same graphs end up in the same packs either way (packing uses the
    # maximal spec in both cases).
    assert [b.num_nodes for b in b1] == [b.num_nodes for b in b3]


def test_scanned_epoch_with_multi_spec_fold(tmp_path):
    """scan_epochs groups a multi-shape cached fold by shape and still
    trains: loss decreases and all batches are visited each epoch."""
    from tf_gnn_samples_tpu.tasks.ppi import PPI_Task
    from tf_gnn_samples_tpu.utils.registry import name_to_model_class

    root = make_ppi_dir(str(tmp_path / "ppi"))
    task = PPI_Task(PPI_Task.default_params())
    task.load_data(root)
    model_cls, extra = name_to_model_class("RGCN")
    params = model_cls.default_params()
    params.update(extra)
    params.update({
        "hidden_size": 32, "graph_num_layers": 2, "random_seed": 0,
        "max_nodes_in_batch": 700,
        "cache_batches_on_device": True,
        "scan_epochs": True,
    })
    model = model_cls(params, task, "scan_ms", str(tmp_path / "run"))
    data = task._loaded_data[DataFold.TRAIN]
    losses = []
    n_batches = None
    for _ in range(4):
        loss, metrics, n, *_ = model._run_epoch(
            "e", data, DataFold.TRAIN, quiet=True
        )
        losses.append(loss)
        if n_batches is None:
            n_batches = len(metrics)
        assert len(metrics) == n_batches
    groups = model._stacked_cache[DataFold.TRAIN]
    assert sum(len(idxs) for _, idxs in groups) == n_batches
    assert losses[-1] < losses[0]


def test_varmisuse_streaming_parallel_parse_matches_serial(tmp_path):
    """streaming_parse_workers > 1: the bounded-lookahead spawn pool must
    yield the SAME sample sequence as the serial path (resume checkpoints
    capture the host RNG, so the stream order is part of the contract)."""
    from tf_gnn_samples_tpu.tasks import varmisuse as vm

    root = make_varmisuse_dir(str(tmp_path / "vmp"), num_shards=4,
                              samples_per_shard=6)
    params = vm.VarMisuse_Task.default_params()

    def stream_ids(workers):
        s = vm.ShardedSampleStream(
            sorted_shards(root),
            params["graph_node_label_max_num_chars"],
            params["max_variable_candidates"],
            params["add_self_loop_edges"], window_graphs=5,
            parse_workers=workers,
        )
        np.random.seed(7)
        out = [int(x.slot_node_id) for x in s.iter_samples(shuffle=True)]
        s.close()
        return out

    def sorted_shards(r):
        import os
        d = os.path.join(r, "graphs-train")
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(".gz"))

    serial = stream_ids(0)
    parallel = stream_ids(2)
    assert len(serial) == 24
    assert serial == parallel


def test_qm9_collapse_diagnostic():
    """The degenerate-basin guard flags validation losses pinned at the
    constant-prediction floor (or a saturated gate), and stays silent on
    healthy losses (docs/PARITY.md small-fold pathology)."""
    from tf_gnn_samples_tpu.tasks.qm9 import QM9_Task, GraphSample

    params = QM9_Task.default_params()
    task = QM9_Task(params)
    rng = np.random.RandomState(0)
    targets = rng.randn(64).astype(np.float32) * 0.9 + 0.2
    task._loaded_data[DataFold.VALIDATION] = [
        GraphSample(
            adjacency_lists=[np.zeros((0, 2), np.int32)],
            type_to_node_to_num_incoming_edges=np.zeros((1, 1), np.float32),
            node_features=np.zeros((1, 15), np.float32),
            target_values=np.array([t], np.float32),
        )
        for t in targets
    ]
    floor = 0.5 * float(np.mean((targets - targets.mean()) ** 2))
    healthy_metrics = [{"gate_sum": 50.0, "gate_nodes": 100.0}]

    # Pinned at the floor -> flagged.
    assert task.collapse_diagnostic(floor, healthy_metrics, 64) is not None
    # Zero-prediction basin (slightly above the mean floor) -> flagged.
    zero_floor = 0.5 * float(np.mean(targets ** 2))
    assert task.collapse_diagnostic(zero_floor, healthy_metrics, 64) is not None
    # Healthy converged loss well below the band -> silent.
    assert task.collapse_diagnostic(0.4 * floor, healthy_metrics, 64) is None
    # A saturated gate with the loss already BELOW the basin stays silent
    # (models can train through a low-gate phase — observed on EMLP1).
    saturated = [{"gate_sum": 1.0, "gate_nodes": 100.0}]
    assert task.collapse_diagnostic(0.4 * floor, saturated, 64) is None
    # In-band, the message carries the gate telemetry.
    msg = task.collapse_diagnostic(floor, saturated, 64)
    assert msg is not None and "gate activation 0.010" in msg


def test_train_loop_collapse_warning(tmp_path, monkeypatch):
    """The trainer logs the collapse warning after COLLAPSE_WARN_EPOCHS
    consecutive flagged validation epochs, and never for healthy runs."""
    import __graft_entry__ as ge
    from tf_gnn_samples_tpu.runtime import model as model_mod

    model, task, samples = ge._tiny_task_and_model("RGCN", hidden=16, n_layers=1)
    task._loaded_data[DataFold.TRAIN] = samples
    task._loaded_data[DataFold.VALIDATION] = samples[:4]
    model.result_dir = str(tmp_path)

    calls = {"n": 0}

    def always_collapsed(valid_loss, metrics, num_graphs):
        calls["n"] += 1
        return "validation loss pinned (test stub)"

    monkeypatch.setattr(type(task), "collapse_diagnostic",
                        staticmethod(lambda *a, **k: always_collapsed(*a[-3:])),
                        raising=False)
    monkeypatch.setitem(model.params, "max_epochs",
                        model_mod.COLLAPSE_WARN_EPOCHS + 1)
    monkeypatch.setitem(model.params, "patience", 100)
    model.train(quiet=True)
    log = open(model.log_file).read()
    assert "collapsed-optimization basin suspected" in log
    assert log.count("collapsed-optimization basin suspected") == 1
