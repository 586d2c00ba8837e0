"""Golden tests for the shared propagation stack and the QM9 output head
against independent numpy implementations of the reference semantics
(models/sparse_graph_model.py:162-202, tasks/qm9_task.py:163-196)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_gnn_samples_tpu.nn.propagation import propagation_apply, propagation_init
from tf_gnn_samples_tpu.ops.graph import pad_graph_batch

from helpers import random_typed_graph  # noqa: F401 (import check)
import reference_numpy as refnp


def _np_layer_norm(x, gamma, beta, eps=1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return gamma * (x - mu) / np.sqrt(var + eps) + beta


def _np_propagation(params, model_params, h, adj_lists, counts):
    """Reference stack semantics in numpy: [proj ->] per layer:
    averaging residual every R, RGCN layer, [LN], Dense every D
    (sparse_graph_model.py:162-202). Dropout off (eval)."""
    act = refnp._act(model_params["graph_model_activation_function"])
    if "proj" in params:
        h = act(h @ np.asarray(params["proj"]))
    residual_every = model_params["graph_residual_connection_every_num_layers"]
    dense_every = model_params["graph_dense_between_every_num_gnn_layers"]
    last_residual = np.zeros_like(h)
    for i, lp in enumerate(params["layers"]):
        if i % residual_every == 0:
            t = h.copy()
            if i > 0:
                h = (h + last_residual) / 2.0
            last_residual = t
        h = refnp.rgcn(
            {"W": np.asarray(lp["gnn"]["W"])}, h, adj_lists, counts,
            activation=model_params["graph_activation_function"],
            aggregation="sum", normalize=True,
            timesteps=model_params["graph_num_timesteps_per_layer"],
        )
        if "ln" in lp:
            h = _np_layer_norm(
                h, np.asarray(lp["ln"]["scale"]), np.asarray(lp["ln"]["bias"])
            )
        if i % dense_every == 0:
            h = act(h @ np.asarray(lp["dense"]))
    return h


@pytest.mark.parametrize("inter_ln,res_every,dense_every", [
    (False, 2, 1), (True, 2, 32), (False, 10000, 10000),
])
def test_propagation_stack_matches_numpy(inter_ln, res_every, dense_every):
    rng = np.random.RandomState(0)
    n, L, feat, hidden = 40, 3, 12, 16
    adj = [rng.randint(0, n, size=(rng.randint(10, 40), 2)).astype(np.int32)
           for _ in range(L)]
    feats = rng.randn(n, feat).astype(np.float32)
    model_params = {
        "hidden_size": hidden,
        "graph_num_layers": 4,
        "graph_num_timesteps_per_layer": 1,
        "graph_layer_input_dropout_keep_prob": 1.0,
        "graph_dense_between_every_num_gnn_layers": dense_every,
        "graph_model_activation_function": "tanh",
        "graph_residual_connection_every_num_layers": res_every,
        "graph_inter_layer_norm": inter_ln,
        "graph_activation_function": "ReLU",
    }
    layer_kwargs = {"activation_function": "ReLU",
                    "message_aggregation_function": "sum"}
    key = jax.random.PRNGKey(1)
    params = propagation_init(key, model_params, L, feat, "rgcn", layer_kwargs)

    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1)
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    out = propagation_apply(
        params, model_params, dev, dev.node_features, "rgcn", layer_kwargs,
        rng=None,
    )[:n]

    counts = np.zeros((L, n))
    for l, a in enumerate(adj):
        np.add.at(counts[l], a[:, 1], 1.0)
    expected = _np_propagation(
        params, model_params, feats.astype(np.float64), adj, counts
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_qm9_head_matches_numpy():
    """Gated regression head (qm9_task.py:163-188): per-node
    sigmoid(gate(concat(h, x))) * transform(h), summed per graph; loss =
    0.5 * mean squared error; abs-err sums."""
    from tf_gnn_samples_tpu.tasks.qm9 import QM9_Task
    from tf_gnn_samples_tpu.tasks.base import TaskBatch

    rng = np.random.RandomState(2)
    n, feat, hidden = 30, 15, 24
    n_graphs = 3
    gids = np.sort(rng.randint(0, n_graphs, size=n)).astype(np.int32)
    adj = [np.stack([np.arange(n), np.arange(n)], axis=1).astype(np.int32)]

    task = QM9_Task(QM9_Task.default_params())
    task.restore_from_metadata(
        {"params": task.params, "num_edge_types": 1, "annotation_size": feat}
    )
    key = jax.random.PRNGKey(3)
    head = task.output_init(key, hidden)

    feats = rng.randn(n, feat).astype(np.float32)
    final_h = rng.randn(n, hidden).astype(np.float32)
    targets = rng.randn(1, 16).astype(np.float32)
    targets[:, n_graphs:] = 0.0

    batch = pad_graph_batch(feats, adj, gids, n_graphs, n_pad=64, g_pad=16)
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    final_h_pad = np.zeros((64, hidden), np.float32)
    final_h_pad[:n] = final_h
    feats_pad = np.asarray(batch.node_features)

    tb = TaskBatch(graph=dev, aux={"target_values": jnp.asarray(targets)},
                   num_graphs=n_graphs, num_nodes=n, num_edges=n)
    loss, metrics = task.output_apply(
        head, tb, jnp.asarray(final_h_pad), jnp.asarray(feats_pad), None
    )

    # numpy reference:
    gate_w = np.asarray(head["task0"]["gate"]["layers"][0]["kernel"])
    gate_b = np.asarray(head["task0"]["gate"]["layers"][0]["bias"])
    tr_w = np.asarray(head["task0"]["transform"]["layers"][0]["kernel"])
    tr_b = np.asarray(head["task0"]["transform"]["layers"][0]["bias"])
    per_node = (final_h @ tr_w + tr_b)[:, 0]
    gate_in = np.concatenate([final_h, feats], axis=1)
    gated = refnp._sigmoid((gate_in @ gate_w + gate_b)[:, 0]) * per_node
    per_graph = np.zeros(n_graphs)
    for v in range(n):
        per_graph[gids[v]] += gated[v]
    err = per_graph - targets[0, :n_graphs]
    exp_loss = np.sum(0.5 * err**2) / n_graphs
    exp_abs = np.sum(np.abs(err))
    np.testing.assert_allclose(float(loss), exp_loss, rtol=1e-4)
    np.testing.assert_allclose(float(metrics["abs_err_task0"]), exp_abs, rtol=1e-4)


def test_remat_layers_matches_unrematerialized():
    """remat_layers=True (jax.checkpoint per GNN layer) must be a pure
    memory/compute trade: identical outputs AND gradients."""
    import numpy as np
    from tf_gnn_samples_tpu.nn.propagation import (propagation_apply,
                                                   propagation_init)

    rng = np.random.RandomState(3)
    n = 40
    adj = [rng.randint(0, n, size=(120, 2)).astype(np.int32)
           for _ in range(2)]
    feats = rng.randn(n, 12).astype(np.float32)
    batch = pad_graph_batch(feats, adj, np.zeros(n, np.int32), 1, n_pad=64)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    mp = {
        "hidden_size": 16, "graph_num_layers": 3,
        "graph_num_timesteps_per_layer": 1,
        "graph_layer_input_dropout_keep_prob": 1.0,
        "graph_dense_between_every_num_gnn_layers": 1,
        "graph_model_activation_function": "relu",
        "graph_residual_connection_every_num_layers": 2,
        "graph_inter_layer_norm": True,
    }
    params = propagation_init(jax.random.PRNGKey(0), mp, 2, 12,
                              "gnn_film", {})

    def loss(p, remat):
        mpx = dict(mp, remat_layers=remat)
        out = propagation_apply(p, mpx, batch,
                                jnp.asarray(batch.node_features), "gnn_film",
                                {})
        return jnp.sum(out * batch.node_mask[:, None]) ** 2 / 100.0

    o0 = loss(params, False)
    o1 = loss(params, True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-6, atol=1e-6)
    g0 = jax.grad(loss)(params, False)
    g1 = jax.grad(loss)(params, True)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
