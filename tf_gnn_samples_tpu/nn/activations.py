"""Activation registry (reference: utils/utils.py:36-58).

Notes on parity with the reference's TF1 semantics:
* 'leaky_relu' uses alpha=0.2 (tf.nn.leaky_relu default), NOT jax's 0.01.
* 'gelu' is the exact erf formulation (utils/utils.py:52-56), not tanh-approx.
* 'linear' / None is identity.
"""

import jax
import jax.numpy as jnp


def _gelu_erf(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _leaky_relu_02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


_ACTIVATIONS = {
    "linear": lambda x: x,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": _leaky_relu_02,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": _gelu_erf,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name):
    if name is None:
        return lambda x: x
    key = name.lower()
    try:
        return _ACTIVATIONS[key]
    except KeyError:
        raise ValueError("Unknown activation function '%s'!" % name) from None
