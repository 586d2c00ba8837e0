"""Direct parity tests against TensorFlow (the reference's substrate).

The reference delegates its cell math and scatter-aggregations to TF
kernels (utils/utils.py:10-33). TF 2.x is available in this environment, so
these tests compare our implementations against the real TF ops — with the
keras cells explicitly configured to the TF 1.13 defaults the reference ran
under (recurrent_activation='hard_sigmoid', reset_after=False)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tf_gnn_samples_tpu.nn.cells import cell_apply, cell_init
from tf_gnn_samples_tpu.ops import segment as segment_ops


def _tf1_hard_sigmoid(x):
    """TF 1.13 keras hard_sigmoid: clip(0.2 x + 0.5, 0, 1). Keras 3 renamed
    this curve away (its hard_sigmoid is now x/6 + 0.5), so the TF1 form is
    passed explicitly."""
    return tf.clip_by_value(0.2 * x + 0.5, 0.0, 1.0)


@pytest.fixture(autouse=True)
def _tf_cpu():
    # Keep TF off any accelerator plumbing.
    tf.config.set_visible_devices([], "GPU")
    yield


def test_gru_cell_matches_tf1_keras():
    d = 12
    rng = np.random.RandomState(0)
    params = cell_init(jax.random.PRNGKey(0), "gru", d)
    x = rng.randn(7, d).astype(np.float32)
    h = rng.randn(7, d).astype(np.float32)

    ours, _ = cell_apply(params, "gru", jnp.asarray(x), jnp.asarray(h), "tanh")

    cell = tf.keras.layers.GRUCell(
        d, activation="tanh", recurrent_activation=_tf1_hard_sigmoid,
        reset_after=False, implementation=1,
    )
    cell.build((None, d))
    cell.set_weights([
        np.asarray(params["kernel"]),
        np.asarray(params["recurrent_kernel"]),
        np.asarray(params["bias"]),
    ])
    theirs, _ = cell(tf.constant(x), [tf.constant(h)])
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6
    )


def test_lstm_cell_matches_tf1_keras():
    d = 10
    rng = np.random.RandomState(1)
    params = cell_init(jax.random.PRNGKey(1), "lstm", d)
    x = rng.randn(5, d).astype(np.float32)
    h = rng.randn(5, d).astype(np.float32)
    c = rng.randn(5, d).astype(np.float32)

    ours_h, ours_c = cell_apply(
        params, "lstm", jnp.asarray(x), jnp.asarray(h), "tanh", jnp.asarray(c)
    )

    cell = tf.keras.layers.LSTMCell(
        d, activation="tanh", recurrent_activation=_tf1_hard_sigmoid,
        unit_forget_bias=True, implementation=1,
    )
    cell.build((None, d))
    cell.set_weights([
        np.asarray(params["kernel"]),
        np.asarray(params["recurrent_kernel"]),
        np.asarray(params["bias"]),
    ])
    theirs_h, (_, theirs_c) = cell(tf.constant(x), [tf.constant(h), tf.constant(c)])
    np.testing.assert_allclose(np.asarray(ours_h), theirs_h.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_c), theirs_c.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_simple_rnn_cell_matches_tf_keras():
    d = 9
    rng = np.random.RandomState(2)
    params = cell_init(jax.random.PRNGKey(2), "rnn", d)
    x = rng.randn(4, d).astype(np.float32)
    h = rng.randn(4, d).astype(np.float32)
    ours, _ = cell_apply(params, "rnn", jnp.asarray(x), jnp.asarray(h), "tanh")
    cell = tf.keras.layers.SimpleRNNCell(d, activation="tanh")
    cell.build((None, d))
    cell.set_weights([
        np.asarray(params["kernel"]),
        np.asarray(params["recurrent_kernel"]),
        np.asarray(params["bias"]),
    ])
    theirs, _ = cell(tf.constant(x), [tf.constant(h)])
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["sum", "max", "mean", "sqrt_n"])
def test_segment_ops_match_tf(kind):
    rng = np.random.RandomState(3)
    data = rng.randn(100, 6).astype(np.float32)
    ids = rng.randint(0, 17, size=100).astype(np.int32)
    num = 20  # includes empty segments

    ours = segment_ops.get_aggregation_function(kind)(
        jnp.asarray(data), jnp.asarray(ids), num
    )
    tf_fn = {
        "sum": tf.math.unsorted_segment_sum,
        "max": tf.math.unsorted_segment_max,
        "mean": tf.math.unsorted_segment_mean,
        "sqrt_n": tf.math.unsorted_segment_sqrt_n,
    }[kind]
    theirs = tf_fn(tf.constant(data), tf.constant(ids), num).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)
