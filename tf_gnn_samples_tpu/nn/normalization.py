"""Layer normalization (reference uses tf.contrib.layers.layer_norm with
learnable scale+shift, e.g. gnns/gnn_film.py:120, models/sparse_graph_model.py:193)."""

import jax.numpy as jnp


def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params, x, eps=1e-12):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return normed * params["scale"] + params["bias"]
