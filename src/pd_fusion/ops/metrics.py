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
from functools import lru_cache, partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _ones_like_weights(p: Array, w: Optional[Array]) -> Array:
    if w is None:
        return jnp.ones_like(p)
    return w.astype(p.dtype)


@lru_cache(maxsize=None)
def _lower_bin_bounds_f32(n_bins: int):
    """The n_bins LOWER bin boundaries of the reference's f64
    np.linspace(0, 1, n_bins+1), each rounded DOWN to the nearest f32.
    For an f32 probability p and f64 boundary b, (p > b) is then exactly
    (p > bound_f32) — no f32 value lies strictly between bound_f32 and b."""
    import numpy as np

    b64 = np.linspace(0.0, 1.0, n_bins + 1)[:-1]
    b32 = b64.astype(np.float32)
    too_high = b32.astype(np.float64) > b64
    b32 = np.where(too_high, np.nextafter(b32, np.float32(-np.inf)), b32)
    # numpy constant: lifted into the jit trace as a literal (returning a
    # committed jax array here could pin the wrong device across backends)
    return b32.astype(np.float32)


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
    precision_at_end = jnp.where(denom > 0, tps[group_end] / jnp.where(denom > 0, denom, 1.0), 0.0)
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
    # sklearn balanced_accuracy_score averages recall over the classes
    # PRESENT in y_true: a single-class fold scores just that class's
    # recall (verified: all-neg/all-correct -> 1.0, not nan). NOTE: an
    # epsilon guard like maximum(x, 1e-38) does NOT work here — 1e-38 is
    # an f32 subnormal that XLA flushes to zero, so the guarded division
    # still produced 0/0 = nan on degenerate folds.
    has_pos = (tp + fn) > 0
    has_neg = (tn + fp) > 0
    tpr = jnp.where(has_pos, tp / jnp.where(has_pos, tp + fn, 1.0), 0.0)
    tnr = jnp.where(has_neg, tn / jnp.where(has_neg, tn + fp, 1.0), 0.0)
    n_present = has_pos.astype(y_prob.dtype) + has_neg.astype(y_prob.dtype)
    return jnp.where(
        n_present > 0, (tpr + tnr) / jnp.maximum(n_present, 1.0), jnp.nan
    )


def f1_score(
    y_true: Array, y_prob: Array, weights: Optional[Array] = None, threshold: float = 0.5
) -> Array:
    w = _ones_like_weights(y_prob, weights)
    y = y_true.astype(y_prob.dtype)
    pred = (y_prob >= threshold).astype(y_prob.dtype)
    tp = jnp.sum(w * y * pred)
    fn = jnp.sum(w * y * (1.0 - pred))
    fp = jnp.sum(w * (1.0 - y) * pred)
    # sklearn zero_division semantics: no positives anywhere -> 0.0 (a
    # subnormal-epsilon guard is flushed to zero by XLA and returned nan)
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / jnp.where(denom > 0, denom, 1.0), 0.0)


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
    # Bin membership is lower < p <= upper against the reference's
    # float64 np.linspace(0, 1, n_bins+1) boundaries (which are NOT all
    # exactly k/n — linspace computes k*step, e.g. boundary 3 is
    # 0.30000000000000004). ceil(p*n)-1 in f32 mis-bins probabilities
    # within half an ulp of a boundary (f32(0.1)*10 rounds to exactly
    # 1.0 although f32(0.1) > 0.1), so instead compare p against each
    # lower boundary rounded DOWN to f32: for an f32 p and f64 boundary
    # b, (p > b) <=> (p > round_down_f32(b)) because no f32 lies in
    # (round_down_f32(b), b].
    idx = (
        jnp.sum(
            y_prob[:, None] > _lower_bin_bounds_f32(n_bins)[None, :], axis=1
        ).astype(jnp.int32)
        - 1
    )
    valid = (y_prob > 0.0) & (y_prob <= 1.0)
    idx = jnp.clip(idx, 0, n_bins - 1)
    wv = jnp.where(valid, w, 0.0)

    acc = (y == (y_prob >= 0.5).astype(y_prob.dtype)).astype(y_prob.dtype)
    bin_w = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv)
    bin_acc = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv * acc)
    bin_conf = jnp.zeros(n_bins, y_prob.dtype).at[idx].add(wv * y_prob)

    total_w = jnp.sum(w)  # reference divides by the FULL sample count
    nonzero = bin_w > 0
    safe_w = jnp.where(nonzero, bin_w, 1.0)
    per_bin = jnp.where(
        nonzero, (bin_w / total_w) * jnp.abs(bin_acc / safe_w - bin_conf / safe_w), 0.0
    )
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


@jax.jit
def risk_coverage(y_true: Array, y_prob: Array) -> Array:
    """Risk-coverage curve (reference: evaluation/evaluate.py:140-169).

    Sort by confidence max(p, 1-p) descending; risk at coverage k/n is
    the error rate among the k most confident predictions. Returns ONE
    packed [2, n] array (row 0 coverage, row 1 risk) so a caller pays a
    single dispatch + a single readback — the previous unjitted version
    issued ~10 eager device ops per call through the relay. Tie order
    matches the reference's ``np.argsort(confidence)[::-1]`` (stable
    ascending then reversed => ties in REVERSE input order), which
    changes intermediate risk values inside a confidence tie group."""
    n = y_true.shape[0]
    confidence = jnp.maximum(y_prob, 1.0 - y_prob)
    order = jnp.argsort(confidence)[::-1]
    preds = (y_prob >= 0.5).astype(jnp.int32)
    correct = (preds == y_true.astype(jnp.int32)).astype(y_prob.dtype)[order]
    ks = jnp.arange(1, n + 1, dtype=y_prob.dtype)
    coverage = ks / n
    accuracy = jnp.cumsum(correct) / ks
    return jnp.stack([coverage, 1.0 - accuracy])
