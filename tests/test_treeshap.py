"""Device TreeSHAP (ops/treeshap.py) vs a brute-force Shapley oracle.

The oracle enumerates ALL coalitions of ALL features and evaluates the
path-dependent game by recursive cover-weighted tree walks (exactly the
tree_path_dependent semantics of shap.TreeExplainer, which the reference
uses at scripts/ppmi_imaging_upgrade.py:783-823 — the package is absent
in-image). The device lowering must match to float tolerance, including
duplicate features on a path, missing values, pass-through nodes, and
weighted covers.
"""
from itertools import combinations
from math import factorial

import numpy as np
import pytest

from pd_fusion.nn.gbdt import MISSING_BIN, DeviceHistGBDT, bin_features


def _v_of_S(tree, x_bins, S, depth):
    """Path-dependent game value for coalition S on one tree (numpy).
    Node covers derive from descendant-leaf sums, matching the device
    implementation (the tree records only leaf covers)."""
    feat, thr, ml = tree["feat"], tree["thr"], tree["miss_left"]
    leaf_cover, leaf = tree["leaf_cover"], tree["leaf"]

    def child_cover(level, node):
        span = 1 << (depth - level)
        return float(leaf_cover[node * span : (node + 1) * span].sum())

    def walk(level, node):
        if level == depth:
            return float(leaf[node])
        f = int(feat[level, node])
        if f in S:
            b = x_bins[f]
            go_left = bool(ml[level, node]) if b == MISSING_BIN else (b <= thr[level, node])
            return walk(level + 1, node * 2 + (0 if go_left else 1))
        pc = float(child_cover(level, node))
        if pc <= 0:
            return 0.0
        lc = float(child_cover(level + 1, node * 2))
        rc = float(child_cover(level + 1, node * 2 + 1))
        return (lc * walk(level + 1, node * 2) + rc * walk(level + 1, node * 2 + 1)) / pc

    return walk(0, 0)


def _brute_shap(model, X):
    """Exact Shapley over the FULL feature set (exponential; tiny F only)."""
    bins = bin_features(np.asarray(X, np.float32), model.edges_)
    n, F = bins.shape
    D = model.max_depth
    R = model.trees_["feat"].shape[0]
    trees = [
        {k: v[r] for k, v in model.trees_.items()} for r in range(R)
    ]
    phi = np.zeros((n, F))
    ev = model.base_score_
    for t in trees:
        ev += _v_of_S(t, bins[0], set(), D)
    others = list(range(F))
    for i in range(F):
        rest = [j for j in others if j != i]
        for k in range(F):
            w = factorial(k) * factorial(F - k - 1) / factorial(F)
            for S in combinations(rest, k):
                S = set(S)
                for ni in range(n):
                    x = bins[ni]
                    for t in trees:
                        phi[ni, i] += w * (
                            _v_of_S(t, x, S | {i}, D) - _v_of_S(t, x, S, D)
                        )
    return phi, ev


def _make_data(seed, n=48, f=5, nan_frac=0.15):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    X[rng.random((n, f)) < nan_frac] = np.nan
    logits = np.nan_to_num(X[:, 0]) - 0.7 * np.nan_to_num(X[:, 1])
    y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    return X, y


@pytest.mark.parametrize("seed,class_weight", [(0, None), (1, "balanced")])
def test_matches_bruteforce_shapley(seed, class_weight):
    X, y = _make_data(seed)
    m = DeviceHistGBDT(
        n_estimators=4, max_depth=3, learning_rate=0.3, class_weight=class_weight
    ).fit(X, y)
    Xq = X[:6]
    phi = m.shap_values(Xq)
    ref, ev_ref = _brute_shap(m, Xq)
    np.testing.assert_allclose(phi, ref[: len(phi)], atol=2e-5)
    assert m.expected_value_ == pytest.approx(ev_ref, abs=2e-5)


def test_additivity_and_unused_features():
    rng = np.random.default_rng(7)
    X, y = _make_data(3, n=200, f=8)
    X[:, 7] = 1.0  # constant feature: never split on -> zero attribution
    m = DeviceHistGBDT(n_estimators=30, max_depth=5, learning_rate=0.1).fit(X, y)
    Xq = np.concatenate([X[:50], rng.normal(size=(10, 8)).astype(np.float32)])
    phi = m.shap_values(Xq)
    margins = np.log(
        m.predict_proba(Xq)[:, 1] / (1 - m.predict_proba(Xq)[:, 1])
    )
    np.testing.assert_allclose(
        phi.sum(axis=1) + m.expected_value_, margins, atol=5e-4
    )
    assert np.abs(phi[:, 7]).max() == 0.0


def test_chunking_is_invisible():
    X, y = _make_data(5, n=300, f=6)
    m = DeviceHistGBDT(n_estimators=6, max_depth=4).fit(X, y)
    import pd_fusion.ops.treeshap as ts

    full = m.shap_values(X)  # crosses the 256-sample chunk boundary
    old = ts._CHUNK
    try:
        ts._CHUNK = 64
        small = m.shap_values(X)
    finally:
        ts._CHUNK = old
    np.testing.assert_allclose(full, small, atol=1e-6)


def test_depth_gate():
    X, y = _make_data(9, n=64, f=4)
    m = DeviceHistGBDT(n_estimators=2, max_depth=9).fit(X, y)
    with pytest.raises(ValueError, match="depth"):
        m.shap_values(X[:4])


def test_empty_input_returns_zero_rows_and_expected_value():
    """ADVICE r4: n=0 must not crash — returns (0, f) zeros and the same
    expected_value a non-empty call computes."""
    X, y = _make_data(11, n=80, f=5)
    m = DeviceHistGBDT(n_estimators=4, max_depth=3).fit(X, y)
    ref = m.shap_values(X[:2])  # sets expected_value_ from a real call
    ev_ref = m.expected_value_
    phi = m.shap_values(X[:0])
    assert phi.shape == (0, 5) and phi.dtype == np.float32
    np.testing.assert_allclose(m.expected_value_, ev_ref, atol=1e-6)
