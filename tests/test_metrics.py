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
    out = np.asarray(risk_coverage(np.float32(y), np.float32(p)))
    # oracle: direct numpy transcription (reference evaluate.py:140-169)
    conf = np.maximum(p, 1 - p)
    idx = np.argsort(conf)[::-1]
    correct = ((p >= 0.5).astype(int) == y).astype(float)[idx]
    acc = np.cumsum(correct) / np.arange(1, 101)
    np.testing.assert_allclose(out[1], 1 - acc, atol=1e-5)
    np.testing.assert_allclose(out[0], np.arange(1, 101) / 100, atol=1e-6)


def test_risk_coverage_tie_order_matches_reference():
    # np.argsort(conf)[::-1] puts confidence TIES in reverse input order;
    # intermediate risk values inside a tie group depend on that order,
    # so the device sort must reproduce it exactly
    from pd_fusion.ops.metrics import risk_coverage

    y = np.array([1, 0, 1, 0, 1, 0], np.float32)
    p = np.array([0.8, 0.2, 0.8, 0.8, 0.2, 0.6], np.float32)  # conf ties
    out = np.asarray(risk_coverage(y, p))
    conf = np.maximum(p, 1 - p)
    idx = np.argsort(conf)[::-1]
    correct = ((p >= 0.5).astype(int) == y.astype(int)).astype(float)[idx]
    acc = np.cumsum(correct) / np.arange(1, len(y) + 1)
    np.testing.assert_allclose(out[1], 1 - acc, atol=1e-6)


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


def test_degenerate_folds_match_sklearn_not_nan():
    """XLA flushes f32 subnormals: the old maximum(x, 1e-38) guards were
    max(x, 0) and returned nan where sklearn returns finite values."""
    from pd_fusion.ops import metrics as dm

    cases = [
        # (y_true, y_prob) — all-negative fold, correct predictions
        (np.zeros(10), np.full(10, 0.2)),
        # all-negative fold, wrong predictions
        (np.zeros(10), np.full(10, 0.9)),
        # all-positive fold, wrong predictions
        (np.ones(10), np.full(10, 0.2)),
        # mixed fold, everything predicted negative
        (np.array([0.0, 0, 1, 1]), np.full(4, 0.1)),
    ]
    for y, p in cases:
        yp = (p >= 0.5).astype(int)
        got_f1 = float(dm.f1_score(np.float32(y), np.float32(p)))
        got_ba = float(dm.balanced_accuracy(np.float32(y), np.float32(p)))
        assert got_f1 == pytest.approx(f1_score(y.astype(int), yp, zero_division=0), abs=1e-6)
        assert got_ba == pytest.approx(balanced_accuracy_score(y.astype(int), yp), abs=1e-6)


def test_ece_bin_boundaries_match_reference_float64():
    """Probabilities exactly on (or within an f32 ulp of) a bin boundary
    must bin by the reference's float64 np.linspace boundaries: e.g.
    f32(0.1) = 0.10000000149 > 0.1 belongs to bin 1, but f32(0.1)*10
    rounds to exactly 1.0 so the old ceil(p*10)-1 put it in bin 0. The
    linspace boundaries are not all k/10 either (boundary 3 is
    0.30000000000000004), which the comparison constants encode."""
    from pd_fusion.ops import metrics as dm

    # every f32 value near each boundary k/10, plus interior values
    ps = []
    for k in range(1, 10):
        b = np.float32(k / 10.0)
        ps += [np.nextafter(b, np.float32(0)), b, np.nextafter(b, np.float32(1))]
    ps += [0.05, 0.5, 0.999, 1.0, 0.01]
    p = np.array(ps, np.float32)
    rng = np.random.RandomState(3)
    y = rng.randint(0, 2, len(p)).astype(np.float32)
    got = float(dm.expected_calibration_error(y, p))
    want = compute_ece(y.astype(float), p.astype(np.float64))
    assert got == pytest.approx(want, abs=1e-6)


def test_fuzz_integer_weights_equal_repetition_and_sklearn():
    """Property fuzz over the whole metric surface: for integer sample
    weights, every weighted metric must equal (a) the unweighted metric
    on the correspondingly repeated dataset and (b) sklearn with
    sample_weight. Random sizes, tie-heavy quantized probabilities, and
    extreme class imbalance — the net that would have caught the
    subnormal-guard and ECE-binning bugs early."""
    import jax.numpy as jnp
    from sklearn.metrics import (
        average_precision_score,
        balanced_accuracy_score,
        brier_score_loss,
        f1_score,
        roc_auc_score,
    )

    from pd_fusion.ops import metrics as dm

    rng = np.random.RandomState(42)
    for case in range(12):
        n = int(rng.randint(3, 120))
        y = rng.randint(0, 2, n).astype(np.float32)
        quant = rng.choice([0, 2, 4, 10])  # 0 = continuous
        p = rng.rand(n).astype(np.float32)
        if quant:
            p = (np.round(p * quant) / quant).astype(np.float32)
        w = rng.randint(0, 4, n).astype(np.float32)
        if w.sum() == 0:
            w[0] = 1.0
        rep_idx = np.repeat(np.arange(n), w.astype(int))
        yr, pr = y[rep_idx], p[rep_idx]
        both = np.unique(yr).size == 2

        got_w = {
            k: float(v)
            for k, v in dm.binary_metrics(jnp.array(y), jnp.array(p), jnp.array(w)).items()
        }
        got_rep = {
            k: float(v)
            for k, v in dm.binary_metrics(jnp.array(yr), jnp.array(pr), None).items()
        }
        for k in dm.METRIC_NAMES:
            a, b = got_w[k], got_rep[k]
            assert (np.isnan(a) and np.isnan(b)) or a == pytest.approx(b, abs=1e-5), (
                case, k, a, b,
            )

        predr = (pr >= 0.5).astype(int)
        yi = yr.astype(int)
        if both:
            assert got_rep["roc_auc"] == pytest.approx(roc_auc_score(yi, pr), abs=1e-5), case
            assert got_rep["pr_auc"] == pytest.approx(
                average_precision_score(yi, pr), abs=1e-5
            ), case
        assert got_rep["f1"] == pytest.approx(
            f1_score(yi, predr, zero_division=0), abs=1e-5
        ), case
        assert got_rep["balanced_accuracy"] == pytest.approx(
            balanced_accuracy_score(yi, predr), abs=1e-5
        ), case
        assert got_rep["brier_score"] == pytest.approx(
            brier_score_loss(yi, pr.astype(np.float64)), abs=1e-5
        ), case
        assert got_rep["ece"] == pytest.approx(
            _reference_ece(yi, pr.astype(np.float64)), abs=1e-5
        ), case
