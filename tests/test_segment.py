import numpy as np
import jax.numpy as jnp

from tf_gnn_samples_tpu.ops import segment as S


def _np_segments(rng, m=50, n_seg=9, d=4):
    data = rng.standard_normal((m, d)).astype(np.float32)
    ids = rng.integers(0, n_seg - 2, size=m).astype(np.int32)  # leave empties
    return data, ids


def test_segment_sum_mean_sqrtn_max():
    rng = np.random.default_rng(0)
    data, ids = _np_segments(rng)
    n_seg = 9
    got_sum = np.asarray(S.segment_sum(jnp.array(data), jnp.array(ids), n_seg))
    got_mean = np.asarray(S.segment_mean(jnp.array(data), jnp.array(ids), n_seg))
    got_sqrtn = np.asarray(S.segment_sqrt_n(jnp.array(data), jnp.array(ids), n_seg))
    got_max = np.asarray(S.segment_max(jnp.array(data), jnp.array(ids), n_seg))

    for s in range(n_seg):
        rows = data[ids == s]
        if len(rows) == 0:
            np.testing.assert_allclose(got_sum[s], 0.0)
            np.testing.assert_allclose(got_mean[s], 0.0)
            np.testing.assert_allclose(got_sqrtn[s], 0.0)
            assert (got_max[s] <= np.finfo(np.float32).min).all()
        else:
            np.testing.assert_allclose(got_sum[s], rows.sum(0), rtol=1e-5)
            np.testing.assert_allclose(got_mean[s], rows.mean(0), rtol=1e-5)
            np.testing.assert_allclose(
                got_sqrtn[s], rows.sum(0) / np.sqrt(len(rows)), rtol=1e-5
            )
            np.testing.assert_allclose(got_max[s], rows.max(0), rtol=1e-5)


def test_segment_softmax_sums_to_one():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(40).astype(np.float32) * 5
    ids = rng.integers(0, 7, size=40).astype(np.int32)
    probs = np.asarray(S.segment_softmax(jnp.array(logits), jnp.array(ids), 8))
    for s in range(8):
        sel = ids == s
        if sel.any():
            np.testing.assert_allclose(probs[sel].sum(), 1.0, atol=1e-4)
            # matches a direct softmax
            ex = np.exp(logits[sel] - logits[sel].max())
            np.testing.assert_allclose(probs[sel], ex / ex.sum(), atol=1e-4)


def test_segment_softmax_multihead_and_mask():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((30, 4)).astype(np.float32)
    ids = rng.integers(0, 5, size=30).astype(np.int32)
    mask = (rng.random(30) > 0.3).astype(np.float32)
    probs = np.asarray(
        S.segment_softmax(jnp.array(logits), jnp.array(ids), 5, mask=jnp.array(mask))
    )
    assert probs.shape == (30, 4)
    for s in range(5):
        sel = (ids == s) & (mask > 0)
        if sel.any():
            np.testing.assert_allclose(probs[sel].sum(0), np.ones(4), atol=1e-4)
    assert (probs[mask == 0] < 1e-5).all()
