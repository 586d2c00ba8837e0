"""MLP matching the reference's utils.MLP semantics (utils/utils.py:77-126):

* `hidden_layers` is an int (that many hidden layers of `out_size` units)
  or a list of sizes,
* no biases by default,
* activation between layers, the final layer is always linear,
* dropout is applied to the input of each layer except the output layer.
"""

from typing import List, Union

import jax
import jax.numpy as jnp

from .initializers import glorot_uniform, zeros


def mlp_init(
    key,
    in_size: int,
    out_size: int,
    hidden_layers: Union[List[int], int] = 1,
    use_biases: bool = False,
):
    if isinstance(hidden_layers, int):
        hidden_sizes = [out_size] * hidden_layers
    else:
        hidden_sizes = list(hidden_layers)
    sizes = [in_size] + hidden_sizes + [out_size]
    keys = jax.random.split(key, len(sizes) - 1)
    layers = []
    for k, d_in, d_out in zip(keys, sizes[:-1], sizes[1:]):
        layer = {"kernel": glorot_uniform(k, (d_in, d_out))}
        if use_biases:
            layer["bias"] = zeros((d_out,))
        layers.append(layer)
    return {"layers": layers}


def _dense(layer, x):
    y = jnp.dot(x, layer["kernel"], preferred_element_type=jnp.float32)
    if "bias" in layer:
        y = y + layer["bias"]
    return y


def mlp_apply(params, x, activation_fn=jax.nn.relu, dropout_rate=0.0, rng=None):
    """Apply the MLP. Dropout is active iff dropout_rate > 0 and rng given."""
    layers = params["layers"]
    h = x
    for layer in layers[:-1]:
        if dropout_rate > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(sub, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        h = activation_fn(_dense(layer, h))
    return _dense(layers[-1], h)
