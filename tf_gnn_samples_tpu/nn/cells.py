"""Recurrent cells for GGNN state updates, written as fused elementwise
epilogues around two MXU matmuls.

The reference uses tf.keras.layers.{SimpleRNN,GRU,LSTM}Cell
(utils/utils.py:10-20) called with the *aggregated messages as the cell
input* and the *previous node state as the hidden state*
(gnns/ggnn.py:92) — that argument order is preserved here.

Gate maths follow keras conventions: GRU gate order (z, r, h), LSTM gate
order (i, f, c, o) with unit_forget_bias, recurrent activation sigmoid.
"""

import jax
import jax.numpy as jnp

from .activations import get_activation
from .initializers import glorot_uniform, orthogonal, zeros


def cell_init(key, cell_type: str, dim: int):
    cell_type = cell_type.lower()
    k1, k2 = jax.random.split(key)
    if cell_type == "rnn":
        n_gates = 1
    elif cell_type == "gru":
        n_gates = 3
    elif cell_type == "lstm":
        n_gates = 4
    else:
        raise ValueError("Unknown RNN cell type '%s'." % cell_type)
    params = {
        "kernel": glorot_uniform(k1, (dim, n_gates * dim)),
        "recurrent_kernel": orthogonal(k2, (dim, n_gates * dim)),
        "bias": zeros((n_gates * dim,)),
    }
    if cell_type == "lstm":
        # keras unit_forget_bias: forget-gate bias starts at 1.
        bias = params["bias"]
        params["bias"] = bias.at[dim : 2 * dim].set(1.0)
    return params


def cell_apply(params, cell_type: str, x, h, activation: str = "tanh", c=None):
    """One cell step. Returns (new_h, new_c) — new_c is None except for LSTM.

    Args:
        x: [N, D] cell input (aggregated messages in GGNN).
        h: [N, D] hidden state (previous node states in GGNN).
        c: [N, D] LSTM cell state; zeros when None.
    """
    cell_type = cell_type.lower()
    act = get_activation(activation)
    dim = h.shape[-1]
    xw = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32)
    if cell_type == "rnn":
        out = act(xw + jnp.dot(h, params["recurrent_kernel"]) + params["bias"])
        return out, None
    if cell_type == "gru":
        hw = jnp.dot(h, params["recurrent_kernel"], preferred_element_type=jnp.float32)
        xz, xr, xh = jnp.split(xw + params["bias"], 3, axis=-1)
        hz, hr, hh = jnp.split(hw, 3, axis=-1)
        z = jax.nn.sigmoid(xz + hz)
        r = jax.nn.sigmoid(xr + hr)
        hh_tilde = act(xh + r * hh)
        return z * h + (1.0 - z) * hh_tilde, None
    if cell_type == "lstm":
        if c is None:
            c = jnp.zeros_like(h)
        hw = jnp.dot(h, params["recurrent_kernel"], preferred_element_type=jnp.float32)
        gates = xw + hw + params["bias"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * act(g)
        new_h = jax.nn.sigmoid(o) * act(new_c)
        return new_h, new_c
    raise ValueError("Unknown RNN cell type '%s'." % cell_type)
