"""Recurrent cells for GGNN state updates, written as fused elementwise
epilogues around two MXU matmuls.

The reference uses tf.keras.layers.{SimpleRNN,GRU,LSTM}Cell
(utils/utils.py:10-20) called with the *aggregated messages as the cell
input* and the *previous node state as the hidden state*
(gnns/ggnn.py:92) — that argument order is preserved here.

Gate maths follow the TF 1.13 keras defaults exactly: GRU gate order
(z, r, h) with reset_after=False (the reset gate multiplies the hidden
state BEFORE the recurrent matmul), LSTM gate order (i, f, c, o) with
unit_forget_bias, and recurrent_activation = hard_sigmoid
(clip(0.2 x + 0.5, 0, 1)) — TF2 changed this default to sigmoid, but the
reference pins TF 1.13 (requirements.txt).
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


def _hard_sigmoid(x):
    """TF1-keras recurrent_activation default: clip(0.2 x + 0.5, 0, 1)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


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
        dim3 = params["recurrent_kernel"].shape[-1]
        U_z = params["recurrent_kernel"][:, : dim3 // 3]
        U_r = params["recurrent_kernel"][:, dim3 // 3 : 2 * dim3 // 3]
        U_h = params["recurrent_kernel"][:, 2 * dim3 // 3 :]
        xz, xr, xh = jnp.split(xw + params["bias"], 3, axis=-1)
        z = _hard_sigmoid(xz + jnp.dot(h, U_z, preferred_element_type=jnp.float32))
        r = _hard_sigmoid(xr + jnp.dot(h, U_r, preferred_element_type=jnp.float32))
        # reset_after=False (TF1 default): reset gate applies to the hidden
        # state BEFORE the recurrent matmul.
        hh_tilde = act(xh + jnp.dot(r * h, U_h, preferred_element_type=jnp.float32))
        return z * h + (1.0 - z) * hh_tilde, None
    if cell_type == "lstm":
        if c is None:
            c = jnp.zeros_like(h)
        hw = jnp.dot(h, params["recurrent_kernel"], preferred_element_type=jnp.float32)
        gates = xw + hw + params["bias"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = _hard_sigmoid(f) * c + _hard_sigmoid(i) * act(g)
        new_h = _hard_sigmoid(o) * act(new_c)
        return new_h, new_c
    raise ValueError("Unknown RNN cell type '%s'." % cell_type)
