"""Tests for the TPU-native histogram GBDT (pd_fusion.nn.gbdt).

Oracle: an independent eager numpy implementation of the same algorithm
(quantile-binned depth-wise second-order boosting, learned missing
direction) written here with per-node Python loops — deliberately a
different code shape from the vectorized scan/segment-sum device
program, so agreement checks the algorithm, not the implementation.
"""
import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from pd_fusion.nn.gbdt import (
    MISSING_BIN,
    N_VALUE_BINS,
    DeviceHistGBDT,
    bin_features,
    fit_bin_edges,
)


# --------------------------------------------------------------------------
# numpy oracle
# --------------------------------------------------------------------------

def _oracle_gain(GL, HL, CL, G, H, C, lam, mcw, mcs):
    GR, HR, CR = G - GL, H - HL, C - CL
    if not (HL >= mcw and HR >= mcw and CL >= mcs and CR >= mcs):
        return -np.inf
    dl = HL + lam if HL + lam > 0 else 1.0
    dr = HR + lam if HR + lam > 0 else 1.0
    dp = H + lam if H + lam > 0 else 1.0
    return 0.5 * (GL * GL / dl + GR * GR / dr - G * G / dp)


def _node_gain_of(bins_sel, g_sel, h_sel, w_sel, f, t, miss_left, lam, mcw, mcs):
    """Gain of one specific (feature, threshold, missing-dir) candidate."""
    b = bins_sel[:, f]
    left = np.where(b == MISSING_BIN, miss_left, b <= t)
    GL, HL, CL = g_sel[left].sum(), h_sel[left].sum(), w_sel[left].sum()
    return _oracle_gain(
        GL, HL, CL, g_sel.sum(), h_sel.sum(), w_sel.sum(), lam, mcw, mcs
    )


def _node_best_gain(bins_sel, g_sel, h_sel, w_sel, lam, mcw, mcs):
    """Max split gain over every (feature, threshold, missing-dir)."""
    best = -np.inf
    for f in range(bins_sel.shape[1]):
        bh = bins_sel[:, f]
        hist_g = np.bincount(bh, weights=g_sel, minlength=256)
        hist_h = np.bincount(bh, weights=h_sel, minlength=256)
        hist_c = np.bincount(bh, weights=w_sel, minlength=256)
        cg = np.cumsum(hist_g[:N_VALUE_BINS])
        ch = np.cumsum(hist_h[:N_VALUE_BINS])
        cc = np.cumsum(hist_c[:N_VALUE_BINS])
        G, H, C = g_sel.sum(), h_sel.sum(), w_sel.sum()
        mg, mh, mc = hist_g[MISSING_BIN], hist_h[MISSING_BIN], hist_c[MISSING_BIN]
        for t in range(N_VALUE_BINS):
            for miss_left in (True, False):
                GL = cg[t] + mg if miss_left else cg[t]
                HL = ch[t] + mh if miss_left else ch[t]
                CL = cc[t] + mc if miss_left else cc[t]
                gain = _oracle_gain(GL, HL, CL, G, H, C, lam, mcw, mcs)
                if gain > best:
                    best = gain
    return best


def audit_device_trees(bins, y, w, trees_dev, n_rounds, depth, lr, lam, mcw, mcs, base):
    """Teacher-forced eager audit of a trained device ensemble.

    Exact gain TIES are structural in histogram boosting (a split and a
    complementary split have equal gains; samples with identical (g, h)
    are interchangeable between tied splits — both observed at seed 0,
    ties equal to 15 significant digits). So neither tree structure nor
    the margin trajectory is implementation-invariant, and the correct
    invariant is per-node OPTIMALITY of the device's own choices:
      - every real split's gain equals the node's max gain (fp tol);
      - pass-through nodes only where no candidate has positive gain;
      - leaf values match -lr*G/(H+lam) for the device's own routing.
    Any routing/histogram/gain/leaf bug breaks one of these.
    """
    n = bins.shape[0]
    y = y.astype(np.float64)
    w = w.astype(np.float64)
    margin = np.full(n, base, np.float64)
    tol = 1e-9
    for r in range(n_rounds):
        p = 1.0 / (1.0 + np.exp(-margin))
        g = (p - y) * w
        h = p * (1.0 - p) * w
        node = np.zeros(n, np.int32)
        for level in range(depth):
            for nd in range(1 << level):
                sel = node == nd
                best = _node_best_gain(bins[sel], g[sel], h[sel], w[sel], lam, mcw, mcs)
                f_d = int(trees_dev["feat"][r][level, nd])
                t_d = int(trees_dev["thr"][r][level, nd])
                ml_d = bool(trees_dev["miss_left"][r][level, nd])
                if t_d == MISSING_BIN:  # pass-through encoding
                    assert not (best > tol), (
                        f"round {r} level {level} node {nd}: device passed "
                        f"through but a split with gain {best} exists"
                    )
                else:
                    gain_d = _node_gain_of(
                        bins[sel], g[sel], h[sel], w[sel], f_d, t_d, ml_d, lam, mcw, mcs
                    )
                    assert gain_d > 0.0, (
                        f"round {r} level {level} node {nd}: device split has "
                        f"non-positive gain {gain_d}"
                    )
                    assert gain_d >= best - tol * max(1.0, abs(best)), (
                        f"round {r} level {level} node {nd}: device split gain "
                        f"{gain_d} < best {best}"
                    )
            f_of_n = trees_dev["feat"][r][level][node]
            t_of_n = trees_dev["thr"][r][level][node]
            ml_of_n = trees_dev["miss_left"][r][level][node]
            b = bins[np.arange(n), f_of_n]
            go_left = np.where(b == MISSING_BIN, ml_of_n, b <= t_of_n)
            node = node * 2 + (1 - go_left.astype(np.int32))
        for leaf in range(1 << depth):
            sel = node == leaf
            Gs, Hs = g[sel].sum(), h[sel].sum()
            denom = Hs + lam
            expect = -lr * Gs / denom if denom > 0 else 0.0
            got = float(trees_dev["leaf"][r][leaf])
            assert abs(got - expect) < 1e-9, (
                f"round {r} leaf {leaf}: value {got} != {expect}"
            )
        margin = margin + trees_dev["leaf"][r][node]
    return margin


def _make_data(seed=0, n=300, f=6, miss=0.15):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    logits = 1.5 * X[:, 0] - X[:, 1] + 0.8 * X[:, 2] * X[:, 3]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    X[rng.random((n, f)) < miss] = np.nan
    return X, y


# --------------------------------------------------------------------------
# structure + prediction equivalence vs the oracle
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "seed,hist_mode", [(0, "scatter"), (7, "scatter"), (0, "onehot")]
)
def test_device_trees_pass_eager_audit(seed, hist_mode):
    """Train in f64 (jax.enable_x64), then audit every node decision and
    leaf value against the eager numpy reference (see audit_device_trees
    for why optimality — not structure equality — is the invariant).
    Covers both histogram lowerings (scatter segment-sum and the
    MXU-friendly one-hot matmul)."""
    import jax.numpy as jnp
    from jax import enable_x64

    from pd_fusion.nn import gbdt as G

    X, y = _make_data(seed)
    w = np.ones_like(y, np.float64)
    edges = fit_bin_edges(X)
    bins = bin_features(X, edges)
    base = 0.125
    n_rounds = 8
    with enable_x64():
        trees_dev = G.train_gbdt(
            jnp.asarray(bins),
            jnp.asarray(y, jnp.float64),
            jnp.asarray(w, jnp.float64),
            jnp.float64(base),
            n_rounds=n_rounds, depth=3, lr=0.3, lam=0.5,
            min_child_weight=1e-3, min_child_samples=5.0, hist_mode=hist_mode,
        )
        margin_dev = np.asarray(
            G.predict_margin(trees_dev, jnp.asarray(bins), jnp.float64(base), depth=3)
        )
        trees_dev = {k: np.asarray(v) for k, v in trees_dev.items()}
    margin_audit = audit_device_trees(
        bins, y, w, trees_dev, n_rounds=n_rounds, depth=3, lr=0.3, lam=0.5,
        mcw=1e-3, mcs=5.0, base=base,
    )
    # the device's own margin accumulation must equal the eager replay of
    # its trees (routing semantics agree end-to-end)
    np.testing.assert_allclose(margin_dev, margin_audit, atol=1e-9)


def test_histogram_lowerings_agree():
    """scatter (segment-sum) and onehot (matmul) histogram modes compute
    the same (node, feature, bin) sums — f64 agreement to 1e-12."""
    import jax.numpy as jnp
    from jax import enable_x64

    from pd_fusion.nn.gbdt import _histograms

    rng = np.random.default_rng(13)
    n, f, L = 257, 5, 8
    bins = rng.integers(0, 256, size=(n, f)).astype(np.int32)
    bins[rng.random((n, f)) < 0.1] = MISSING_BIN
    data = rng.normal(size=(n, 3))
    node = rng.integers(0, L, size=n).astype(np.int32)
    with enable_x64():
        h1, t1 = _histograms(
            jnp.asarray(bins), jnp.asarray(data), jnp.asarray(node), L, "scatter"
        )
        h2, t2 = _histograms(
            jnp.asarray(bins), jnp.asarray(data), jnp.asarray(node), L, "onehot"
        )
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-12)
    # numpy oracle for one (node, feature) cell
    sel = node == 3
    expect = np.bincount(bins[sel, 2], weights=data[sel, 0], minlength=256)
    np.testing.assert_allclose(np.asarray(h1)[3, 2, :, 0], expect, atol=1e-12)


def test_missing_direction_is_learned():
    """Missing-ness itself carries the label: the learned default
    direction must route missing to the high-prob side."""
    rng = np.random.default_rng(3)
    n = 400
    X = rng.normal(size=(n, 2)).astype(np.float32)
    y = (rng.random(n) < 0.5).astype(np.float32)
    X[y == 1, 0] = np.nan  # feature 0 missing iff positive
    model = DeviceHistGBDT(n_estimators=5, learning_rate=0.5, max_depth=2).fit(X, y)
    auc = roc_auc_score(y, model.predict_proba(X)[:, 1])
    assert auc > 0.99


def test_weighted_equals_repetition():
    """Integer sample weights == physically repeating rows (exactness
    discipline: the whole trainer must be weight-linear)."""
    X, y = _make_data(seed=2, n=120, f=4, miss=0.1)
    w = np.asarray(np.random.default_rng(5).integers(1, 4, size=len(y)), np.float32)
    m_w = DeviceHistGBDT(n_estimators=6, learning_rate=0.3, max_depth=3)
    m_w.fit(X, y, sample_weight=w)
    reps = w.astype(int)
    Xr = np.repeat(X, reps, axis=0)
    yr = np.repeat(y, reps)
    m_r = DeviceHistGBDT(n_estimators=6, learning_rate=0.3, max_depth=3)
    # identical binning: edges must come from the same (unweighted-unique)
    # value set, so fit the repeated model on repeated rows but bin with
    # the weighted model's edges via direct comparison of predictions on
    # a fresh grid after forcing identical edges
    m_r.edges_ = fit_bin_edges(Xr)
    m_r.fit(Xr, yr)
    # quantiles of repeated data differ from weighted quantiles of unique
    # data, so compare decision FUNCTIONS only where binning agrees:
    same_bins = np.array_equal(bin_features(X, m_w.edges_), bin_features(X, m_r.edges_))
    if same_bins:
        np.testing.assert_allclose(
            m_w.predict_proba(X)[:, 1], m_r.predict_proba(X)[:, 1], atol=1e-4
        )
    else:  # binning drifted: still demand close rank agreement
        a = m_w.predict_proba(X)[:, 1]
        b = m_r.predict_proba(X)[:, 1]
        assert roc_auc_score(y, a) == pytest.approx(roc_auc_score(y, b), abs=0.02)


def test_zero_weight_rows_are_invisible():
    """With binning held fixed, appending rows with w=0 must leave the
    trained ensemble bit-identical (this is what makes the parallel CV
    engine's zero-weight fold padding exact)."""
    X, y = _make_data(seed=4, n=200, f=4)
    Xn = np.concatenate([X, np.full((50, 4), 7.7, np.float32)])
    yn = np.concatenate([y, np.ones(50, np.float32)])
    w = np.concatenate([np.ones_like(y), np.zeros(50, np.float32)])
    a = DeviceHistGBDT(n_estimators=6, max_depth=3).fit(X, y)
    bins = bin_features(X, a.edges_)
    bins_n = np.concatenate([bins, bin_features(Xn[len(X):], a.edges_)])
    from pd_fusion.nn import gbdt as G
    import jax.numpy as jnp

    ta = G.train_gbdt(
        jnp.asarray(bins), jnp.asarray(y), jnp.asarray(np.ones_like(y)),
        jnp.float32(a.base_score_), n_rounds=6, depth=3, lr=0.1, lam=0.0,
        min_child_weight=1e-3, min_child_samples=20.0,
    )
    tb = G.train_gbdt(
        jnp.asarray(bins_n), jnp.asarray(yn), jnp.asarray(w),
        jnp.float32(a.base_score_), n_rounds=6, depth=3, lr=0.1, lam=0.0,
        min_child_weight=1e-3, min_child_samples=20.0,
    )
    for key in ("feat", "thr", "miss_left"):
        np.testing.assert_array_equal(np.asarray(ta[key]), np.asarray(tb[key]))
    np.testing.assert_allclose(np.asarray(ta["leaf"]), np.asarray(tb["leaf"]), atol=1e-5)


def test_auc_parity_vs_histgb():
    """Quality parity with the shipped host backend on a nonlinear task
    with missing values (the in-image stand-in for reference LightGBM)."""
    from sklearn.ensemble import HistGradientBoostingClassifier

    rng = np.random.default_rng(11)
    n, f = 1200, 12
    X = rng.normal(size=(n, f)).astype(np.float32)
    beta = rng.normal(size=f)
    logits = X @ beta * 0.5 + 0.7 * X[:, 0] * X[:, 1]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    X[rng.random((n, f)) < 0.1] = np.nan
    Xtr, Xte, ytr, yte = X[:900], X[900:], y[:900], y[900:]
    dev = DeviceHistGBDT(n_estimators=80, learning_rate=0.1, max_depth=5).fit(Xtr, ytr)
    hist = HistGradientBoostingClassifier(max_iter=80, learning_rate=0.1, max_depth=5).fit(
        Xtr, ytr
    )
    auc_dev = roc_auc_score(yte, dev.predict_proba(Xte)[:, 1])
    auc_h = roc_auc_score(yte, hist.predict_proba(Xte)[:, 1])
    # measured: dev 0.733 vs histgb 0.747 on this (hard) task — parity
    # is the gap, not an absolute bar
    assert auc_dev > 0.70
    assert abs(auc_dev - auc_h) < 0.04


def test_vmap_over_folds():
    """The trainer is a pure fn of (bins, y, w): a leading fold axis
    trains all folds in one program; must agree with the per-fold loop."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn import gbdt as G

    X, y = _make_data(seed=9, n=240, f=5)
    edges = fit_bin_edges(X)
    bins = jnp.asarray(bin_features(X, edges))
    yj = jnp.asarray(y)
    k = 3
    fold = np.arange(len(y)) % k
    ws = jnp.asarray(np.stack([(fold != i).astype(np.float32) for i in range(k)]))

    def train_one(w):
        return G.train_gbdt(
            bins, yj, w, jnp.float32(0.0), n_rounds=4, depth=3, lr=0.3,
            lam=0.0, min_child_weight=1e-3, min_child_samples=5.0,
        )

    stacked = jax.vmap(train_one)(ws)
    for i in range(k):
        solo = train_one(ws[i])
        for key in ("feat", "thr", "miss_left"):
            np.testing.assert_array_equal(np.asarray(stacked[key][i]), np.asarray(solo[key]))
        np.testing.assert_allclose(
            np.asarray(stacked["leaf"][i]), np.asarray(solo["leaf"]), atol=1e-5
        )


def test_unimodal_gbdt_device_backend_roundtrip(tmp_path):
    from pd_fusion.models.unimodal_gbdt import UnimodalGBDT

    X, y = _make_data(seed=6, n=200, f=4)
    m = UnimodalGBDT("clinical", {"backend": "device", "n_estimators": 10, "max_depth": 3})
    assert m.backend == "device"
    m.train(X, y)
    p = m.predict_proba(X)
    assert p.shape == (len(y),) and np.all((p >= 0) & (p <= 1))
    path = tmp_path / "gbdt_device.pkl"
    m.save(path)
    m2 = UnimodalGBDT.load(path)
    np.testing.assert_allclose(m2.predict_proba(X), p, atol=0)


def test_feature_importances_gain_based(monkeypatch):
    """Signal features dominate the gain-based importances; a pure-noise
    feature is near zero; the vector is a normalized distribution. Also
    pins suite integration: extract_importance dispatches on
    hasattr(feature_importances_)."""
    rng = np.random.default_rng(21)
    n = 800
    X = rng.normal(size=(n, 5)).astype(np.float32)
    logits = 2.0 * X[:, 1] - 1.5 * X[:, 3]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    m = DeviceHistGBDT(n_estimators=20, learning_rate=0.2, max_depth=3).fit(X, y)
    imp = m.feature_importances_
    assert imp.shape == (5,)
    assert imp.sum() == pytest.approx(1.0)
    assert np.all(imp >= 0)
    assert imp[1] > 0.25 and imp[3] > 0.15  # the two signal features
    assert imp[[0, 2, 4]].sum() < 0.2  # noise features stay small
    from pathlib import Path

    monkeypatch.syspath_prepend(str(Path(__file__).resolve().parents[1] / "scripts"))
    from ppmi_meaningful_suite import extract_importance

    got = extract_importance(m, "lgbm")
    np.testing.assert_allclose(got, imp)


def test_constant_features_yield_prevalence():
    """No feature can split -> every node passes through -> the model
    predicts the (shrunken-toward-base) prevalence, with no NaNs and an
    all-zero importance vector."""
    n = 100
    X = np.full((n, 3), 2.5, np.float32)
    y = np.array([0.0, 1.0] * 50, np.float32)
    m = DeviceHistGBDT(n_estimators=5, max_depth=3).fit(X, y)
    p = m.predict_proba(X)[:, 1]
    assert np.all(np.isfinite(p))
    np.testing.assert_allclose(p, 0.5, atol=1e-5)
    np.testing.assert_array_equal(m.feature_importances_, np.zeros(3))


def test_single_class_labels_no_nan():
    X, y = _make_data(seed=15, n=80, f=4)
    m = DeviceHistGBDT(n_estimators=5, max_depth=2).fit(X, np.ones_like(y))
    p = m.predict_proba(X)[:, 1]
    assert np.all(np.isfinite(p)) and np.all(p > 0.9)


def test_boosted_tree_factory_device_backend(monkeypatch):
    """PD_FUSION_GBDT_BACKEND=device swaps the suites' shared tree
    factory (analysis.tabular.boosted_tree) onto the TPU-native trainer,
    with importances the HistGB stand-in cannot provide."""
    from pd_fusion.analysis.tabular import boosted_tree

    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "device")
    clf = boosted_tree(seed=3)
    assert isinstance(clf, DeviceHistGBDT)
    X, y = _make_data(seed=12, n=150, f=4)
    clf.fit(X, y)
    assert clf.predict_proba(X).shape == (150, 2)
    assert clf.feature_importances_.shape == (4,)
    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "host")
    from sklearn.ensemble import HistGradientBoostingClassifier

    assert isinstance(boosted_tree(seed=3), HistGradientBoostingClassifier)


def test_resolve_gbdt_backend_auto_and_forcing(monkeypatch):
    """backend 'auto' (default) = device on TPU / host on CPU; explicit
    settings and the env var (highest precedence) force either side."""
    import jax

    from pd_fusion.nn.gbdt import resolve_gbdt_backend

    monkeypatch.delenv("PD_FUSION_GBDT_BACKEND", raising=False)
    native = "device" if jax.default_backend() == "tpu" else "host"
    assert resolve_gbdt_backend(None) == native
    assert resolve_gbdt_backend("auto") == native
    assert resolve_gbdt_backend("device") == "device"
    assert resolve_gbdt_backend("host") == "host"
    assert resolve_gbdt_backend("lightgbm") == "host"
    with pytest.raises(ValueError, match="backend"):
        resolve_gbdt_backend("cuda")
    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "host")
    assert resolve_gbdt_backend("device") == "host"  # env wins
    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "device")
    assert resolve_gbdt_backend("host") == "device"


def test_class_weight_balanced_equals_manual_weights():
    """class_weight='balanced' (the lgbm arm's setting, kept by the
    device boosted_tree factory) must equal passing the sklearn balanced
    weights explicitly."""
    X, y = _make_data(seed=17, n=200, f=4)
    y = (np.arange(len(y)) % 4 == 0).astype(np.float32)  # 25% positives
    a = DeviceHistGBDT(n_estimators=8, max_depth=3, class_weight="balanced").fit(X, y)
    counts = np.bincount(y.astype(int), minlength=2)
    cw = len(y) / (2.0 * counts)
    b = DeviceHistGBDT(n_estimators=8, max_depth=3).fit(
        X, y, sample_weight=cw[y.astype(int)].astype(np.float32)
    )
    np.testing.assert_allclose(a.predict_proba(X), b.predict_proba(X), atol=0)
    with pytest.raises(ValueError, match="class_weight"):
        DeviceHistGBDT(class_weight="bogus")


def test_unfitted_importances_are_hasattr_safe():
    """hasattr probes (the suites' dispatch) must see False-ish, not a
    crash, on unfitted models and on pre-gain artifacts."""
    m = DeviceHistGBDT()
    assert not hasattr(m, "feature_importances_")  # NotFittedError is AttributeError
    X, y = _make_data(seed=18, n=100, f=4)
    m.fit(X, y)
    del m.trees_["gain"]  # simulate an artifact pickled before gain recording
    assert not hasattr(m, "feature_importances_")
    assert np.isfinite(m.predict_proba(X)).all()  # predict still works


def test_hist_mode_validation_and_depth_clamp_warning(caplog):
    import logging

    with pytest.raises(ValueError, match="hist_mode"):
        DeviceHistGBDT(hist_mode="one_hot")  # typo must not silently fall back
    with caplog.at_level(logging.WARNING, logger="pd_fusion"):
        m = DeviceHistGBDT(max_depth=12)
    assert m.max_depth == 10
    assert any("clamped" in r.message for r in caplog.records)


def test_hist_mode_auto_resolves_per_backend(monkeypatch):
    """Default hist_mode is 'auto': onehot on TPU (live A/B 2026-08-19:
    4.3-5.1x scatter), scatter elsewhere; explicit modes pass through and
    bad values raise."""
    import jax

    from pd_fusion.nn.gbdt import resolve_hist_mode

    assert DeviceHistGBDT().hist_mode == "auto"
    assert resolve_hist_mode("scatter") == "scatter"
    assert resolve_hist_mode("onehot") == "onehot"
    with pytest.raises(ValueError, match="hist_mode"):
        resolve_hist_mode("one_hot")
    expected = "onehot" if jax.default_backend() == "tpu" else "scatter"
    for alias in (None, "", "auto"):
        assert resolve_hist_mode(alias) == expected
    monkeypatch.setenv("PD_FUSION_GBDT_HIST", "onehot")
    assert DeviceHistGBDT().hist_mode == "onehot"


def test_env_backend_selection(monkeypatch):
    from pd_fusion.models import unimodal_gbdt as U

    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "device")
    m = U.UnimodalGBDT("clinical", {"n_estimators": 5})
    assert m.backend == "device"


@pytest.mark.parametrize("calibrate", [False, True])
def test_parallel_gbdt_cv_matches_sequential(calibrate, tmp_path):
    """Device-backend unimodal_gbdt routes through the one-program CV
    engine (vmapped tree training); with no RNG anywhere in the trainer
    the parallel and sequential paths must agree per fold. k=5 divides
    N=500 evenly so the stacked program sees exactly the sequential
    shapes. Uncalibrated tolerance covers reduction-order drift only
    (vmap vs solo lowering — measured exact on CPU). The calibrated band
    is wider for the same reason as the MLP calibrate parity test
    (test_cv_extras): isotonic regression quantizes probs into ties, so
    ulp-level prob differences between the two lowerings flip block
    boundaries and step AUC by ~2e-3 (measured 0.0022 at fold 4); a real
    routing/binning/calibration bug shifts AUC far more.

    cv_mesh is forced OFF: the test conftest exposes 8 virtual CPU
    devices, and on a mesh the histogram reductions psum over the data
    axis — cross-shard reduction order ulp-shifts gains, and exact gain
    ties being STRUCTURAL in histogram boosting (see module docstring
    lessons), a near-tie argmax can legitimately flip and fork the
    ensemble (measured: fold-1 AUC 0.772 vs 0.758). Mesh-on vs mesh-off
    equivalence has its own banded test
    (test_multichip.py::test_parallel_gbdt_cv_shards_over_virtual_mesh);
    THIS test pins exact same-program parallel-vs-sequential semantics."""
    import jax as _jax
    import shutil as _shutil
    import yaml as _yaml

    from pd_fusion.experiments.run_experiment import run_cv_pipeline
    from pd_fusion.paths import RUNS_DIR

    base = {
        "model_type": "unimodal_gbdt",
        "modality": "clinical",
        "calibrate": calibrate,
        "cv_mesh": "off",
        "params": {
            "backend": "device",
            "n_estimators": 30,
            "learning_rate": 0.2,
            "max_depth": 4,
        },
    }
    runs = {}
    run_ids = []
    try:
        for mode, flag in (("par", True), ("seq", False)):
            run_id = f"pytest_gbdt_parity_{mode}_{int(calibrate)}"
            run_ids.append(run_id)
            agg = run_cv_pipeline(
                "configs/quickstart.yaml",
                k=5,
                synthetic=True,
                overrides={**base, "output_dir": run_id, "parallel_cv": flag},
            )
            folds = [
                _yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
                for i in (1, 2, 3, 4, 5)
            ]
            runs[mode] = (agg, folds)
    finally:
        for run_id in run_ids:
            _shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

    if _jax.default_backend() == "cpu":
        tol = 5e-3 if calibrate else 1e-5
    else:
        tol = 1e-2
    for i in range(5):
        pf, sf = runs["par"][1][i], runs["seq"][1][i]
        for scen in ("full_observation", "clinical_only", "random_1_drop"):
            for metric in ("roc_auc", "ece", "brier_score"):
                assert pf[scen][metric] == pytest.approx(sf[scen][metric], abs=tol), (
                    i, scen, metric, pf[scen][metric], sf[scen][metric],
                )
