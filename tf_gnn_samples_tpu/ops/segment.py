"""Segment (scatter) aggregation primitives.

TPU-native equivalents of the TF kernels the reference leans on
(reference: utils/utils.py:23-33 maps aggregation names to
tf.unsorted_segment_{sum,max,mean,sqrt_n}; dpu_utils'
unsorted_segment_log_softmax is used for RGAT attention, gnns/rgat.py:128-130).

All functions take static `num_segments` so everything stays
fixed-shape under jit. Empty-segment semantics:

* sum:    0 (same as TF)
* max:    dtype.min (TF returns dtype.min; jax returns -inf, we clamp)
* mean:   0 (sum / max(count, 1), same as TF)
* sqrt_n: 0 (sum / sqrt(max(count, 1)), same as TF)
"""

import jax
import jax.numpy as jnp

from .. import BIG_NUMBER, SMALL_NUMBER


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_max(data, segment_ids, num_segments, indices_are_sorted=False):
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    # Match tf.unsorted_segment_max's empty-segment value (dtype.min, finite).
    if jnp.issubdtype(out.dtype, jnp.floating):
        out = jnp.maximum(out, jnp.finfo(out.dtype).min)
    return out


def _segment_count(segment_ids, num_segments, weights=None, indices_are_sorted=False):
    ones = (
        jnp.ones(segment_ids.shape, dtype=jnp.float32) if weights is None else weights
    )
    return jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=False):
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = _segment_count(segment_ids, num_segments, None, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))


def segment_sqrt_n(data, segment_ids, num_segments, indices_are_sorted=False):
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    count = _segment_count(segment_ids, num_segments, None, indices_are_sorted)
    count = jnp.sqrt(jnp.maximum(count, 1.0))
    return total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    """Numerically-stable softmax over variable-size segments.

    Equivalent of dpu_utils' unsorted_segment_log_softmax followed by exp
    (reference: gnns/rgat.py:126-130). `logits` may have trailing dims
    (e.g. attention heads); the softmax is per (segment, trailing-index).

    Args:
        logits: [M, ...] float array.
        segment_ids: [M] int array in [0, num_segments).
        num_segments: static int.
        mask: optional [M] float/bool; masked-out entries get ~0 probability.
    """
    mask_b = None
    if mask is not None:
        neg = jnp.asarray(-BIG_NUMBER, dtype=logits.dtype)
        mask_b = mask.astype(bool)
        mask_b = mask_b.reshape(mask_b.shape + (1,) * (logits.ndim - mask_b.ndim))
        logits = jnp.where(mask_b, logits, neg)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.maximum(seg_max, jnp.finfo(logits.dtype).min)  # kill -inf
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask_b is not None:
        exp = jnp.where(mask_b, exp, 0.0)  # exactly zero prob on masked entries
    seg_sum = jax.ops.segment_sum(exp, segment_ids, num_segments)
    return exp / (seg_sum[segment_ids] + SMALL_NUMBER)


_AGGREGATORS = {
    "sum": segment_sum,
    "unsorted_segment_sum": segment_sum,
    "max": segment_max,
    "unsorted_segment_max": segment_max,
    "mean": segment_mean,
    "unsorted_segment_mean": segment_mean,
    "sqrt_n": segment_sqrt_n,
    "unsorted_segment_sqrt_n": segment_sqrt_n,
}


def get_aggregation_function(name):
    """Name -> aggregation fn (reference: utils/utils.py:23-33)."""
    try:
        return _AGGREGATORS[name]
    except KeyError:
        raise ValueError("Unknown aggregation function '%s'!" % name) from None
