"""Weight initializers matching the TF1 layers the reference uses.

tf.keras.layers.Dense / tf.layers.Dense default to glorot_uniform kernels
and zero biases; keras recurrent cells use glorot_uniform input kernels,
orthogonal recurrent kernels and zero biases. RGDCN uses truncated normal
with stddev 1/K^2 (reference: gnns/rgdcn.py:99-104).
"""

import jax
import jax.numpy as jnp


def glorot_uniform(key, shape, in_axis=-2, out_axis=-1, dtype=jnp.float32):
    return jax.nn.initializers.glorot_uniform(in_axis=in_axis, out_axis=out_axis)(
        key, shape, dtype
    )


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
    # TF's truncated_normal resamples outside 2 sigma; jax's is equivalent.
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def stacked_glorot_uniform(key, num_stack, shape, dtype=jnp.float32):
    """[num_stack, *shape] with each slice glorot-initialized independently.

    Used for per-edge-type weight tensors [L, D_in, D_out]: fan-in/out is
    per slice, matching the reference's L separate Dense layers
    (e.g. gnns/rgcn.py:69-75).
    """
    keys = jax.random.split(key, num_stack)
    return jnp.stack(
        [glorot_uniform(k, shape, dtype=dtype) for k in keys], axis=0
    )
