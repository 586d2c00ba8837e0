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


# ---------------------------------------------------------------------------
# Full-layer forward parity: each reference layer equation (gnns/*.py)
# implemented in TF2 eager and compared against <name>_apply.
# ---------------------------------------------------------------------------

from tf_gnn_samples_tpu.nn import layers as L
from tf_gnn_samples_tpu.ops.graph import pad_graph_batch


def _tiny_graph(seed=0, n=32, n_pad=48, num_types=3, d=16, e_per_type=100):
    rng = np.random.RandomState(seed)
    adj = [rng.randint(0, n, size=(e_per_type, 2)).astype(np.int32)
           for _ in range(num_types)]
    h = rng.randn(n_pad, d).astype(np.float32)
    h[n:] = 0.0
    batch = pad_graph_batch(
        np.zeros((n, 4), np.float32), adj, np.zeros(n, np.int32), 1,
        n_pad=n_pad,
    )
    counts = np.zeros((num_types, n), np.float32)
    for l, a in enumerate(adj):
        np.add.at(counts[l], a[:, 1], 1.0)
    return batch, adj, counts, h, n


def _tf_act(name):
    return {
        "relu": tf.nn.relu,
        "tanh": tf.tanh,
        "elu": tf.nn.elu,
        "leaky_relu": lambda x: tf.nn.leaky_relu(x, alpha=0.2),
        "gelu": lambda x: tf.nn.gelu(x, approximate=False),
        "linear": lambda x: x,
    }[name]


def _tf_layer_norm(x, ln_params, eps=1e-12):
    mean = tf.reduce_mean(x, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * tf.math.rsqrt(var + eps)
    return (normed * np.asarray(ln_params["scale"])
            + np.asarray(ln_params["bias"]))


def _tf_typed_messages_sum(h_tf, adj, W, n, normalize=False, counts=None):
    """Reference message/aggregate skeleton: per type, gather sources,
    per-type Dense, optionally 1/c-normalize by receiver, then
    unsorted_segment_sum over receivers (gnns/rgcn.py:91-112)."""
    small = 1e-7
    agg = tf.zeros((n, W[0].shape[-1]), tf.float32)
    for l, a in enumerate(adj):
        src = tf.gather(h_tf, a[:, 0])
        msgs = tf.matmul(src, W[l])
        if normalize:
            c = tf.gather(counts[l], a[:, 1])
            msgs = msgs / (c[:, None] + small)
        agg += tf.math.unsorted_segment_sum(msgs, a[:, 1], n)
    return agg


@pytest.mark.parametrize("normalize", [False, True])
def test_rgcn_layer_matches_tf(normalize):
    """RGCN forward vs the reference equation in TF eager
    (gnns/rgcn.py:26-31, 91-115)."""
    batch, adj, counts, h, n = _tiny_graph(seed=1)
    d = h.shape[-1]
    params = L.rgcn_init(jax.random.PRNGKey(1), len(adj), d)
    W = np.asarray(params["W"])
    agg = _tf_typed_messages_sum(tf.constant(h[:n]), adj, W, n,
                                 normalize=normalize, counts=counts)
    want = tf.tanh(agg).numpy()
    ours = L.rgcn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        activation_function="tanh", normalize_by_num_incoming=normalize,
        aggregation_strategy="segment",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-5, atol=2e-5)


def test_ggnn_layer_matches_tf():
    """GGNN forward vs reference: per-type bias-free Dense on sources,
    sum-aggregate, then GRU with messages as INPUT and the node state as
    HIDDEN state (gnns/ggnn.py:59-92)."""
    batch, adj, counts, h, n = _tiny_graph(seed=2)
    d = h.shape[-1]
    params = L.ggnn_init(jax.random.PRNGKey(2), len(adj), d,
                         gated_unit_type="gru")
    W = np.asarray(params["W"])
    agg = _tf_typed_messages_sum(tf.constant(h[:n]), adj, W, n)
    cell = tf.keras.layers.GRUCell(
        d, activation="tanh", recurrent_activation=_tf1_hard_sigmoid,
        reset_after=False, implementation=1,
    )
    cell.build((None, d))
    cp = params["cell"]
    cell.set_weights([
        np.asarray(cp["kernel"]), np.asarray(cp["recurrent_kernel"]),
        np.asarray(cp["bias"]),
    ])
    want, _ = cell(agg, [tf.constant(h[:n])])
    ours = L.ggnn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        gated_unit_type="gru", activation_function="tanh",
        aggregation_strategy="segment",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_gnn_film_layer_matches_tf():
    """GNN-FiLM forward vs reference: per-type source message, (gamma,
    beta) from the TARGET state, act(gamma * m + beta), sum, LayerNorm
    (gnns/gnn_film.py:69-120)."""
    batch, adj, counts, h, n = _tiny_graph(seed=3)
    d = h.shape[-1]
    params = L.gnn_film_init(jax.random.PRNGKey(3), len(adj), d)
    W = np.asarray(params["W"])
    Wf = np.asarray(params["W_film"])
    h_tf = tf.constant(h[:n])
    agg = tf.zeros((n, d), tf.float32)
    for l, a in enumerate(adj):
        m = tf.matmul(tf.gather(h_tf, a[:, 0]), W[l])
        gb = tf.matmul(tf.gather(h_tf, a[:, 1]), Wf[l])
        msgs = tf.nn.relu(gb[:, :d] * m + gb[:, d:])
        agg += tf.math.unsorted_segment_sum(msgs, a[:, 1], n)
    want = _tf_layer_norm(agg, params["ln"]).numpy()
    ours = L.gnn_film_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        activation_function="relu", aggregation_strategy="segment",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-5, atol=2e-5)


def _tf_rgat_reference(h_np, adj, params, n, num_heads, act_name):
    """RGAT reference equation in TF eager (gnns/rgat.py:95-138): per-type
    transforms, per-head logits via the (2D,) attention vector reshaped
    per head, segment softmax over ALL incoming edges via
    exp(unsorted_segment_log_softmax), weighted segment-sum."""
    d = h_np.shape[-1]
    dh = d // num_heads
    W = np.asarray(params["W"])
    att = np.asarray(params["att"]).reshape(len(adj), num_heads, 2 * dh)
    h_tf = tf.constant(h_np)
    all_logits, all_msgs, all_rcv = [], [], []
    for l, a in enumerate(adj):
        t = tf.matmul(h_tf, W[l])  # [V, D]
        tk = tf.reshape(t, (-1, num_heads, dh))
        src_k = tf.gather(tk, a[:, 0])  # [E, K, Dh]
        tgt_k = tf.gather(tk, a[:, 1])
        edge_in = tf.concat([src_k, tgt_k], axis=2)  # [E, K, 2Dh]
        logits = tf.nn.leaky_relu(
            tf.einsum("eki,ki->ek", edge_in, att[l]), alpha=0.2
        )
        all_logits.append(logits)
        all_msgs.append(src_k)
        all_rcv.append(a[:, 1])
    logits = tf.concat(all_logits, axis=0)  # [E_tot, K]
    msgs = tf.concat(all_msgs, axis=0)  # [E_tot, K, Dh]
    rcv = np.concatenate(all_rcv)
    # unsorted_segment_log_softmax (dpu_utils; rgat.py:126-130):
    seg_max = tf.math.unsorted_segment_max(logits, rcv, n)
    shifted = logits - tf.gather(seg_max, rcv)
    seg_lse = tf.math.log(
        tf.math.unsorted_segment_sum(tf.exp(shifted), rcv, n)
    )
    log_probs = shifted - tf.gather(seg_lse, rcv)
    attn = tf.exp(log_probs)  # [E_tot, K]
    weighted = msgs * attn[:, :, None]
    agg = tf.math.unsorted_segment_sum(weighted, rcv, n)  # [n, K, Dh]
    return _tf_act(act_name)(tf.reshape(agg, (n, d))).numpy()


@pytest.mark.parametrize("strategy", ["segment", "pallas"])
def test_rgat_layer_matches_tf(strategy):
    """RGAT forward vs the TF reference — both the XLA segment-softmax
    path (exp(log_softmax) semantics) and the streamed CLAMPED ranked
    softmax path (interpret-mode kernels)."""
    from tf_gnn_samples_tpu.ops import ranked_segment as rs

    batch, adj, counts, h, n = _tiny_graph(seed=4)
    num_heads = 4
    params = L.rgat_init(jax.random.PRNGKey(4), len(adj), h.shape[-1],
                         num_heads=num_heads)
    want = _tf_rgat_reference(h[:n], adj, params, n, num_heads, "tanh")
    old = rs._FORCE_INTERPRET
    rs._FORCE_INTERPRET = strategy == "pallas"
    try:
        ours = L.rgat_apply(
            params, jax.tree_util.tree_map(jnp.asarray, batch),
            jnp.asarray(h), num_heads=num_heads,
            activation_function="tanh", aggregation_strategy=strategy,
        )[:n]
    finally:
        rs._FORCE_INTERPRET = old
    # The streamed path runs bf16 message streams; loosen accordingly.
    tol = dict(rtol=2e-5, atol=2e-5) if strategy == "segment" else dict(
        rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ours), want, **tol)


def _tf_mlp(x, weights, inner_act):
    """Reference utils.MLP: hidden Dense layers with inner activation,
    FINAL LAYER LINEAR, no biases (utils/utils.py:77-126)."""
    for i, w in enumerate(weights):
        if i > 0:
            x = inner_act(x)
        x = tf.matmul(x, np.asarray(w))
    return x


def test_rgin_layer_matches_tf():
    """RGIN forward vs reference: per-type edge MLP on sources, act on
    messages, sum, act + unconditional LayerNorm (gnns/rgin.py:77-139)."""
    batch, adj, counts, h, n = _tiny_graph(seed=5)
    d = h.shape[-1]
    params = L.rgin_init(jax.random.PRNGKey(5), len(adj), d,
                         num_edge_MLP_hidden_layers=1)
    h_tf = tf.constant(h[:n])
    agg = tf.zeros((n, d), tf.float32)
    for l, a in enumerate(adj):
        src = tf.gather(h_tf, a[:, 0])
        m = _tf_mlp(src, [w[l] for w in params["edge_mlp"]], tf.nn.relu)
        msgs = tf.nn.relu(m)  # act on MLP outputs (rgin.py:128-129)
        agg += tf.math.unsorted_segment_sum(msgs, a[:, 1], n)
    want = _tf_layer_norm(tf.nn.relu(agg), params["ln"]).numpy()
    ours = L.rgin_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        activation_function="relu", num_edge_MLP_hidden_layers=1,
        typed_edge_scan="unroll",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("normalize", [False, True])
def test_gnn_edge_mlp_layer_matches_tf(normalize):
    """GNN-Edge-MLP forward vs reference: per-type MLP (fixed elu inner
    activation) on concat(source, target), optional 1/c, gelu on
    messages, sum, LayerNorm (gnns/gnn_edge_mlp.py:73-119)."""
    batch, adj, counts, h, n = _tiny_graph(seed=6)
    d = h.shape[-1]
    params = L.gnn_edge_mlp_init(jax.random.PRNGKey(6), len(adj), d,
                                 use_target_state_as_input=True,
                                 num_edge_hidden_layers=1)
    small = 1e-7
    h_tf = tf.constant(h[:n])
    agg = tf.zeros((n, d), tf.float32)
    for l, a in enumerate(adj):
        x = tf.concat([tf.gather(h_tf, a[:, 0]),
                       tf.gather(h_tf, a[:, 1])], axis=1)
        m = _tf_mlp(x, [w[l] for w in params["edge_mlp"]], tf.nn.elu)
        if normalize:
            c = tf.gather(counts[l], a[:, 1])
            m = m / (c[:, None] + small)
        msgs = tf.nn.gelu(m, approximate=False)
        agg += tf.math.unsorted_segment_sum(msgs, a[:, 1], n)
    want = _tf_layer_norm(agg, params["ln"]).numpy()
    ours = L.gnn_edge_mlp_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        activation_function="gelu", use_target_state_as_input=True,
        num_edge_hidden_layers=1, normalize_by_num_incoming=normalize,
        typed_edge_scan="unroll",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("full_state,tie", [(False, False), (True, True),
                                            (False, True), (True, False)])
def test_rgdcn_layer_matches_tf(full_state, tie):
    """RGDCN forward vs reference: per-type/per-channel K x K dynamic
    kernels computed from the TARGET state, message = src channel slice
    contracted with the kernel at the target, 1/c, per-channel sum,
    activation (gnns/rgdcn.py:94-164)."""
    batch, adj, counts, h, n = _tiny_graph(seed=7)
    d = h.shape[-1]
    C = 4
    K = d // C
    params = L.rgdcn_init(jax.random.PRNGKey(7), len(adj), d,
                          num_channels=C,
                          use_full_state_for_channel_weights=full_state,
                          tie_channel_weights=tie)
    W = np.asarray(params["W_wc"])  # [L, C_eff, in_dim, K*K]
    small = 1e-7
    h_tf = tf.constant(h[:n])
    h_chunk = tf.reshape(h_tf, (n, C, K))
    agg = tf.zeros((n, C, K), tf.float32)
    for l, a in enumerate(adj):
        # Kernels at the TARGET node, per channel:
        kerns = []
        for c in range(C):
            c_eff = 0 if tie else c
            if full_state:
                kin = h_tf  # [n, d]
            else:
                kin = h_chunk[:, c, :]  # channel's own slice, [n, K]
            kw = W[l, c_eff]  # [in_dim, K*K]
            kern = tf.nn.relu(tf.matmul(kin, kw))  # [n, K*K]
            kerns.append(tf.reshape(kern, (n, K, K)))
        src = tf.gather(h_chunk, a[:, 0])  # [E, C, K]
        tgt_kerns = [tf.gather(kerns[c], a[:, 1]) for c in range(C)]
        msgs = tf.stack(
            [tf.einsum("ei,eij->ej", src[:, c, :], tgt_kerns[c])
             for c in range(C)], axis=1,
        )  # [E, C, K]
        c_in = tf.gather(counts[l], a[:, 1])
        msgs = msgs / (c_in[:, None, None] + small)
        agg += tf.math.unsorted_segment_sum(msgs, a[:, 1], n)
    want = tf.nn.relu(tf.reshape(agg, (n, d))).numpy()
    ours = L.rgdcn_apply(
        params, jax.tree_util.tree_map(jnp.asarray, batch), jnp.asarray(h),
        num_channels=C, activation_function="relu",
        use_full_state_for_channel_weights=full_state,
        tie_channel_weights=tie, normalize_by_num_incoming=True,
        typed_edge_scan="unroll", aggregation_strategy="segment",
    )[:n]
    np.testing.assert_allclose(np.asarray(ours), want, rtol=2e-5, atol=2e-5)
