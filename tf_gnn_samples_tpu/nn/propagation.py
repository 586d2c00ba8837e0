"""Shared graph propagation stack.

Reproduces `Sparse_Graph_Model.__build_graph_propagation_model`
(reference: models/sparse_graph_model.py:162-202):

  input projection to hidden_size (if feature size differs)
  then per layer:
    input dropout (keep prob `graph_layer_input_dropout_keep_prob`)
    averaging residual (cur + last)/2 every `graph_residual_connection_every_num_layers`
    the GNN layer itself (num_timesteps weight-tied repetitions)
    optional inter-layer LayerNorm (`graph_inter_layer_norm`)
    Dense(hidden, activation) every `graph_dense_between_every_num_gnn_layers`

Pure-functional: params pytree + apply(params, graph, feats, rng, train).
"""

import jax
import jax.numpy as jnp

from ..ops.graph import GraphBatch
from .activations import get_activation
from .initializers import glorot_uniform
from .layers import LAYERS
from .normalization import layer_norm, layer_norm_init


def propagation_init(key, model_params, num_edge_types, initial_feature_size, layer_name, layer_kwargs):
    h_dim = model_params["hidden_size"]
    num_layers = model_params["graph_num_layers"]
    layer_init, _ = LAYERS[layer_name]
    keys = jax.random.split(key, num_layers + 1)

    params = {"layers": []}
    if initial_feature_size != h_dim:
        params["proj"] = glorot_uniform(keys[0], (initial_feature_size, h_dim))
    dense_every = model_params["graph_dense_between_every_num_gnn_layers"]
    for i in range(num_layers):
        lk1, lk2 = jax.random.split(keys[i + 1])
        layer_params = {"gnn": layer_init(lk1, num_edge_types, h_dim, **layer_kwargs)}
        if i % dense_every == 0:
            layer_params["dense"] = glorot_uniform(lk2, (h_dim, h_dim))
        if model_params["graph_inter_layer_norm"]:
            layer_params["ln"] = layer_norm_init(h_dim)
        params["layers"].append(layer_params)
    return params


def _dropout(x, keep_prob, rng):
    if rng is None or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def propagation_apply(
    params,
    model_params,
    graph: GraphBatch,
    feats,
    layer_name,
    layer_kwargs,
    rng=None,
):
    """rng=None means eval mode (no dropout), matching the reference's
    placeholder_with_default(1.0) keep prob (sparse_graph_model.py:135-136)."""
    _, layer_apply = LAYERS[layer_name]
    act = get_activation(model_params["graph_model_activation_function"])
    keep_prob = model_params["graph_layer_input_dropout_keep_prob"]
    residual_every = model_params["graph_residual_connection_every_num_layers"]
    dense_every = model_params["graph_dense_between_every_num_gnn_layers"]
    timesteps = model_params["graph_num_timesteps_per_layer"]

    h = feats
    if "proj" in params:
        h = act(jnp.dot(h, params["proj"], preferred_element_type=jnp.float32))

    def gnn_layer(gnn_params, g, hh):
        return layer_apply(
            gnn_params, g, hh, num_timesteps=timesteps, **layer_kwargs
        )

    if model_params.get("remat_layers"):
        # Rematerialize each GNN layer on the backward pass instead of
        # keeping its activations: memory per layer drops from O(E * D)
        # residual streams to the layer boundary [N, D] states, at the
        # cost of recomputing the forward once. What makes deep many-type
        # configs (VarMisuse: 6-10 layers, 22 types, 100k-node batches)
        # fit HBM. Numerics are identical (same math, recomputed).
        gnn_layer = jax.checkpoint(gnn_layer)

    last_residual = jnp.zeros_like(h)
    for i, layer_params in enumerate(params["layers"]):
        if rng is not None:
            rng, sub = jax.random.split(rng)
            h = _dropout(h, keep_prob, sub)
        if i % residual_every == 0:
            t = h
            if i > 0:
                h = (h + last_residual) / 2.0
            last_residual = t
        h = gnn_layer(layer_params["gnn"], graph, h)
        if "ln" in layer_params:
            h = layer_norm(layer_params["ln"], h)
        if i % dense_every == 0:
            h = act(
                jnp.dot(h, layer_params["dense"], preferred_element_type=jnp.float32)
            )
    return h
