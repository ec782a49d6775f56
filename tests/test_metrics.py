"""Metric parity vs the sklearn oracle (the reference delegates to sklearn:
reference src/pd_fusion/utils/metrics.py:10-36)."""
import numpy as np
import pytest
from sklearn.metrics import (
    average_precision_score,
    balanced_accuracy_score,
    brier_score_loss,
    f1_score,
    roc_auc_score,
)

from pd_fusion.utils.metrics import compute_metrics, compute_ece


def _reference_ece(y_true, y_prob, n_bins=10):
    """Direct transcription of the reference ECE semantics for oracle use."""
    bin_boundaries = np.linspace(0, 1, n_bins + 1)
    ece = 0.0
    for lo, hi in zip(bin_boundaries[:-1], bin_boundaries[1:]):
        in_bin = (y_prob > lo) & (y_prob <= hi)
        prop = np.mean(in_bin)
        if prop > 0:
            acc = np.mean(y_true[in_bin] == (y_prob[in_bin] >= 0.5))
            conf = np.mean(y_prob[in_bin])
            ece += prop * abs(acc - conf)
    return ece


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [50, 500])
def test_metrics_match_sklearn(seed, n):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    if y.sum() == 0:
        y[0] = 1
    if y.sum() == n:
        y[0] = 0
    p = np.clip(rng.rand(n) * 0.6 + y * 0.3, 0, 1)

    m = compute_metrics(y, p)
    pred = (p >= 0.5).astype(int)
    assert m["roc_auc"] == pytest.approx(roc_auc_score(y, p), abs=1e-5)
    assert m["pr_auc"] == pytest.approx(average_precision_score(y, p), abs=1e-5)
    assert m["balanced_accuracy"] == pytest.approx(balanced_accuracy_score(y, pred), abs=1e-5)
    assert m["f1"] == pytest.approx(f1_score(y, pred), abs=1e-5)
    assert m["brier_score"] == pytest.approx(brier_score_loss(y, p), abs=1e-5)
    assert m["ece"] == pytest.approx(_reference_ece(y, p), abs=1e-5)


def test_metrics_with_heavy_ties():
    rng = np.random.RandomState(7)
    y = rng.randint(0, 2, 400)
    # quantized probabilities -> many exact ties
    p = np.round(rng.rand(400) * 4) / 4.0
    m = compute_metrics(y, p)
    assert m["roc_auc"] == pytest.approx(roc_auc_score(y, p), abs=1e-5)
    assert m["pr_auc"] == pytest.approx(average_precision_score(y, p), abs=1e-5)
    assert m["ece"] == pytest.approx(_reference_ece(y, p), abs=1e-5)


def test_perfect_auc_and_nonneg_ece():
    # mirrors reference tests/test_pd_fusion.py:44-49
    y = np.array([0, 0, 1, 1])
    p = np.array([0.1, 0.2, 0.8, 0.9])
    m = compute_metrics(y, p)
    assert m["roc_auc"] == pytest.approx(1.0)
    assert compute_ece(y, p) >= 0.0


def test_weighted_padding_is_noop():
    """Padded entries with weight 0 must not change any metric — the
    contract that the vmapped CV engine relies on."""
    import jax.numpy as jnp
    from pd_fusion.ops import metrics as dm

    rng = np.random.RandomState(3)
    y = rng.randint(0, 2, 200).astype(np.float32)
    p = rng.rand(200).astype(np.float32)
    base = dm.binary_metrics(jnp.array(y), jnp.array(p), None)

    pad_y = np.concatenate([y, rng.randint(0, 2, 64).astype(np.float32)])
    pad_p = np.concatenate([p, rng.rand(64).astype(np.float32)])
    w = np.concatenate([np.ones(200, np.float32), np.zeros(64, np.float32)])
    padded = dm.binary_metrics(jnp.array(pad_y), jnp.array(pad_p), jnp.array(w))
    for k in base:
        assert float(base[k]) == pytest.approx(float(padded[k]), abs=1e-5), k


def test_risk_coverage_matches_reference_semantics():
    from pd_fusion.ops.metrics import risk_coverage

    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 100)
    p = rng.rand(100)
    out = risk_coverage(np.float32(y), np.float32(p))
    # oracle: direct numpy transcription (reference evaluate.py:140-169)
    conf = np.maximum(p, 1 - p)
    idx = np.argsort(conf)[::-1]
    correct = ((p >= 0.5).astype(int) == y).astype(float)[idx]
    acc = np.cumsum(correct) / np.arange(1, 101)
    np.testing.assert_allclose(np.asarray(out["risk"]), 1 - acc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["coverage"]), np.arange(1, 101) / 100, atol=1e-6)


def test_pack_unpack_metrics_and_probs_roundtrip():
    """pack_metrics_and_probs (the single-fetch buffer layout used by the
    whole-CV and scenario-eval programs) must be the exact inverse of
    unpack_metrics_and_probs for any [K, S] metric grid."""
    import jax.numpy as jnp
    from pd_fusion.ops import metrics as dm

    rng = np.random.RandomState(7)
    K, S, N = 3, 4, 17
    md = {k: jnp.asarray(rng.rand(K, S).astype(np.float32)) for k in dm.METRIC_NAMES}
    probs = jnp.asarray(rng.rand(K, S, N).astype(np.float32))
    packed = np.asarray(dm.pack_metrics_and_probs(md, probs))
    md2, probs2 = dm.unpack_metrics_and_probs(packed, (K, S), (K, S, N))
    for k in dm.METRIC_NAMES:
        np.testing.assert_array_equal(np.asarray(md[k]), md2[k])
    np.testing.assert_array_equal(np.asarray(probs), probs2)
