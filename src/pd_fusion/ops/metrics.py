"""Binary-classification metrics as XLA reductions.

TPU-native re-implementation of the reference metric suite
(reference: src/pd_fusion/utils/metrics.py:10-36): roc_auc, pr_auc
(average precision), balanced_accuracy, f1 (threshold 0.5), brier and
ECE (10 equal-width bins; bin membership is ``lower < p <= upper`` and
bin "accuracy" is the fraction of samples where ``y == (p >= 0.5)``,
matching the reference's semantics exactly).

Design notes (why this is not a port):
- Everything is a pure jittable function of fixed-shape arrays built from
  sort + cumsum + segment reductions, so the whole metric suite can be
  ``vmap``-ed over scenario/fold/bootstrap axes and fused by XLA into a
  single device program (the reference loops in Python over sklearn calls).
- Every metric takes an optional per-sample weight vector. Padded entries
  (weight 0) are exact no-ops, which is what lets unequal-size CV folds be
  stacked into one rectangular array and evaluated in a single vmap.
- Tie handling is exact: ROC-AUC uses midrank (Mann-Whitney) statistics
  over tie groups; average precision evaluates precision at tie-group
  boundaries, reproducing sklearn's step-wise definition.
"""
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _ones_like_weights(p: Array, w: Optional[Array]) -> Array:
    if w is None:
        return jnp.ones_like(p)
    return w.astype(p.dtype)


def _tie_group_bounds(s_sorted: Array):
    """For each position in a sorted array, indices of the first and last
    element of its tie group. O(n) via cummax / reversed cummin."""
    n = s_sorted.shape[0]
    idx = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]])
    is_end = jnp.concatenate([s_sorted[1:] != s_sorted[:-1], jnp.ones((1,), bool)])
    group_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    group_end = jax.lax.cummin(jnp.where(is_end, idx, n - 1)[::-1])[::-1]
    return group_start, group_end


def roc_auc(y_true: Array, y_prob: Array, weights: Optional[Array] = None) -> Array:
    """Tie-aware (midrank) weighted ROC-AUC.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos == score_neg)
    computed with one sort: for each positive, accumulate the negative
    weight strictly below its tie group plus half the negative weight
    inside it.
    """
    w = _ones_like_weights(y_prob, weights)
    order = jnp.argsort(y_prob)
    s = y_prob[order]
    yw = (y_true.astype(y_prob.dtype) * w)[order]
    nw = ((1.0 - y_true.astype(y_prob.dtype)) * w)[order]

    group_start, group_end = _tie_group_bounds(s)
    cum_neg = jnp.cumsum(nw)
    # negative weight strictly below the tie group / inside the tie group
    neg_below = jnp.where(group_start > 0, cum_neg[jnp.maximum(group_start - 1, 0)], 0.0)
    neg_in_group = cum_neg[group_end] - neg_below

    contrib = yw * (neg_below + 0.5 * neg_in_group)
    w_pos = jnp.sum(yw)
    w_neg = jnp.sum(nw)
    return jnp.sum(contrib) / (w_pos * w_neg)


def average_precision(y_true: Array, y_prob: Array, weights: Optional[Array] = None) -> Array:
    """Weighted average precision (sklearn ``average_precision_score``).

    AP = sum over samples of (w_i * y_i / W_pos) * precision at the end of
    sample i's tie group in descending-score order — identical to the
    step-wise sum over distinct thresholds.
    """
    w = _ones_like_weights(y_prob, weights)
    order = jnp.argsort(-y_prob)
    s = y_prob[order]
    yw = (y_true.astype(y_prob.dtype) * w)[order]
    nw = ((1.0 - y_true.astype(y_prob.dtype)) * w)[order]

    _, group_end = _tie_group_bounds(s)
    tps = jnp.cumsum(yw)
    fps = jnp.cumsum(nw)
    denom = tps[group_end] + fps[group_end]
    precision_at_end = jnp.where(denom > 0, tps[group_end] / jnp.maximum(denom, 1e-38), 0.0)
    w_pos = jnp.sum(yw)
    return jnp.sum(yw * precision_at_end) / w_pos


def brier_score(y_true: Array, y_prob: Array, weights: Optional[Array] = None) -> Array:
    w = _ones_like_weights(y_prob, weights)
    sq = (y_prob - y_true.astype(y_prob.dtype)) ** 2
    return jnp.sum(sq * w) / jnp.sum(w)


def balanced_accuracy(
    y_true: Array, y_prob: Array, weights: Optional[Array] = None, threshold: float = 0.5
) -> Array:
    w = _ones_like_weights(y_prob, weights)
    y = y_true.astype(y_prob.dtype)
    pred = (y_prob >= threshold).astype(y_prob.dtype)
    tp = jnp.sum(w * y * pred)
    fn = jnp.sum(w * y * (1.0 - pred))
    tn = jnp.sum(w * (1.0 - y) * (1.0 - pred))
    fp = jnp.sum(w * (1.0 - y) * pred)
    tpr = tp / jnp.maximum(tp + fn, 1e-38)
    tnr = tn / jnp.maximum(tn + fp, 1e-38)
    return 0.5 * (tpr + tnr)


def f1_score(
    y_true: Array, y_prob: Array, weights: Optional[Array] = None, threshold: float = 0.5
) -> Array:
    w = _ones_like_weights(y_prob, weights)
    y = y_true.astype(y_prob.dtype)
    pred = (y_prob >= threshold).astype(y_prob.dtype)
    tp = jnp.sum(w * y * pred)
    fn = jnp.sum(w * y * (1.0 - pred))
    fp = jnp.sum(w * (1.0 - y) * pred)
    return 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-38)


def expected_calibration_error(
    y_true: Array,
    y_prob: Array,
    weights: Optional[Array] = None,
    n_bins: int = 10,
) -> Array:
    """ECE with the reference's exact binning semantics
    (src/pd_fusion/utils/metrics.py:25-36): 10 equal-width bins with
    membership ``lower < p <= upper`` (p == 0 falls in no bin) and bin
    accuracy = fraction where ``y == (p >= 0.5)``.
    """
    w = _ones_like_weights(y_prob, weights)
    y = y_true.astype(y_prob.dtype)
    # bin index i satisfies i/n < p <= (i+1)/n  =>  i = ceil(p*n) - 1
    idx = jnp.ceil(y_prob * n_bins).astype(jnp.int32) - 1
    valid = (y_prob > 0.0) & (y_prob <= 1.0)
    idx = jnp.clip(idx, 0, n_bins - 1)
    wv = jnp.where(valid, w, 0.0)

    acc = (y == (y_prob >= 0.5).astype(y_prob.dtype)).astype(y_prob.dtype)
    bin_w = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv)
    bin_acc = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv * acc)
    bin_conf = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv * y_prob)

    total_w = jnp.sum(w)  # reference divides by the FULL sample count
    nonzero = bin_w > 0
    mean_acc = bin_acc / jnp.maximum(bin_w, 1e-38)
    mean_conf = bin_conf / jnp.maximum(bin_w, 1e-38)
    per_bin = jnp.where(nonzero, (bin_w / total_w) * jnp.abs(mean_acc - mean_conf), 0.0)
    return jnp.sum(per_bin)


# canonical metric order for packed single-transfer layouts (must match
# the binary_metrics dict below)
METRIC_NAMES = ("roc_auc", "pr_auc", "balanced_accuracy", "f1", "brier_score", "ece")


@partial(jax.jit, static_argnames=("threshold",))
def binary_metrics(
    y_true: Array,
    y_prob: Array,
    weights: Optional[Array] = None,
    threshold: float = 0.5,
) -> Dict[str, Array]:
    """All six reference metrics in one fused XLA program."""
    return {
        "roc_auc": roc_auc(y_true, y_prob, weights),
        "pr_auc": average_precision(y_true, y_prob, weights),
        "balanced_accuracy": balanced_accuracy(y_true, y_prob, weights, threshold),
        "f1": f1_score(y_true, y_prob, weights, threshold),
        "brier_score": brier_score(y_true, y_prob, weights),
        "ece": expected_calibration_error(y_true, y_prob, weights),
    }


def pack_metrics_and_probs(md: Dict[str, Array], probs: Array) -> Array:
    """Flatten a {metric: [...]} dict (METRIC_NAMES order) plus the probs
    tensor into ONE 1-D f32 buffer, so jitted eval programs return a
    single device array — one host fetch instead of len(md)+1 round trips
    (each device->host readback costs ~140 ms through the axon relay)."""
    import jax.numpy as jnp

    return jnp.concatenate(
        [jnp.stack([md[k] for k in METRIC_NAMES]).reshape(-1).astype(jnp.float32),
         probs.reshape(-1).astype(jnp.float32)]
    )


def unpack_metrics_and_probs(packed, metric_shape, probs_shape):
    """Host-side inverse of pack_metrics_and_probs (packed is a numpy
    array after the single fetch)."""
    import numpy as np

    n_per = int(np.prod(metric_shape))
    md = {
        k: packed[i * n_per:(i + 1) * n_per].reshape(metric_shape)
        for i, k in enumerate(METRIC_NAMES)
    }
    return md, packed[len(METRIC_NAMES) * n_per:].reshape(probs_shape)


# vmapped variant over a leading stack axis (folds / scenarios / bootstrap
# resamples). All inputs must be rectangular; use weights=0 for padding.
binary_metrics_stacked = jax.jit(
    jax.vmap(lambda y, p, w: binary_metrics(y, p, w)), static_argnums=()
)


def risk_coverage(y_true: Array, y_prob: Array) -> Dict[str, Array]:
    """Risk-coverage curve (reference: evaluation/evaluate.py:140-169).

    Sort by confidence max(p, 1-p) descending; risk at coverage k/n is the
    error rate among the k most confident predictions.
    """
    n = y_true.shape[0]
    confidence = jnp.maximum(y_prob, 1.0 - y_prob)
    order = jnp.argsort(-confidence)
    preds = (y_prob >= 0.5).astype(jnp.int32)
    correct = (preds == y_true.astype(jnp.int32)).astype(y_prob.dtype)[order]
    ks = jnp.arange(1, n + 1, dtype=y_prob.dtype)
    coverage = ks / n
    accuracy = jnp.cumsum(correct) / ks
    return {"coverage": coverage, "risk": 1.0 - accuracy}
