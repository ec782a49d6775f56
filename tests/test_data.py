"""Data-plane unit tests (modeled on reference tests/test_pd_fusion.py plus
stronger kernel-level checks)."""
import warnings

import numpy as np
import pandas as pd
import pytest

from pd_fusion.data.feature_utils import (
    apply_masks_to_matrix,
    get_all_feature_cols,
    get_feature_slices,
)
from pd_fusion.data.missingness import apply_missingness_scenario, get_modality_mask_matrix
from pd_fusion.data.ppmi_loader import generate_synthetic_data
from pd_fusion.data.preprocess import NaNRobustScaler, preprocess_features
from pd_fusion.data.schema import MODALITIES, TARGET_COL
from pd_fusion.data.splits import stratified_split

SYNTH = {
    "num_samples": 200,
    "clinical_dim": 4,
    "datspect_dim": 3,
    "mri_dim": 5,
    "missing_rates": [0.1, 0.3, 0.4],
}


def test_synthetic_generation_shapes():
    np.random.seed(0)
    df, masks = generate_synthetic_data(SYNTH)
    assert len(df) == 200
    assert TARGET_COL in df.columns
    assert set(masks.keys()) == set(MODALITIES)
    for m in MODALITIES:
        assert masks[m].shape == (200,)
        assert set(np.unique(masks[m])).issubset({0, 1})
    # missing rows carry NaN features
    assert df.loc[masks["mri"] == 0, "mri_f0"].isna().all()


def test_missingness_scenario_drops_modality():
    np.random.seed(0)
    df, masks = generate_synthetic_data(SYNTH)
    out = apply_missingness_scenario(df, {"name": "no_mri", "drop_modalities": ["mri"]}, masks)
    assert (out["mri"] == 0).all()
    assert (out["clinical"] == masks["clinical"]).all()
    # original untouched
    assert masks["mri"].sum() > 0


def test_missingness_random_drop_counts():
    np.random.seed(0)
    df, masks = generate_synthetic_data(SYNTH)
    before = get_modality_mask_matrix(masks).sum(axis=1)
    out = apply_missingness_scenario(df, {"name": "r1", "type": "random", "n_drop": 1}, masks)
    after = get_modality_mask_matrix(out).sum(axis=1)
    # exactly one available modality dropped wherever any was available
    expected = np.maximum(before - 1, 0)
    assert (after == expected).all()


def test_stratified_split_sizes_and_ratio():
    np.random.seed(0)
    df, _ = generate_synthetic_data(SYNTH)
    tr, va, te = stratified_split(df)
    assert len(tr) + len(va) + len(te) == len(df)
    assert abs(len(te) / len(df) - 0.2) < 0.02
    p_all = df[TARGET_COL].mean()
    for part in (tr, va, te):
        assert abs(part[TARGET_COL].mean() - p_all) < 0.1


def test_nan_robust_scaler_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    X = rng.randn(100, 5) * 3 + 1
    X[rng.rand(100, 5) < 0.2] = np.nan
    s = NaNRobustScaler().fit(X)
    med = np.nanmedian(X, axis=0)
    iqr = np.nanpercentile(X, 75, axis=0) - np.nanpercentile(X, 25, axis=0)
    iqr[iqr == 0] = 1
    expect = (X - med) / iqr
    got = s.transform(X)
    # NaNs become 0 (documented deviation = the reference's stated intent)
    assert np.allclose(got[~np.isnan(X)], expect[~np.isnan(X)], atol=1e-5)
    assert (got[np.isnan(X)] == 0).all()


def test_nan_median_quartiles_bitwise_matches_numpy():
    """The shared-sort fit statistics must be BIT-identical to numpy's
    nanmedian/nanpercentile (incl. lerp branch, ceil upper index, empty
    columns, even/odd valid counts, integral quantile positions)."""
    from pd_fusion.data.preprocess import _nan_median_quartiles

    rng = np.random.RandomState(7)
    cases = []
    X = rng.randn(100, 8) * 3 + 1
    X[rng.rand(100, 8) < 0.3] = np.nan
    cases.append(X)
    X2 = rng.randn(37, 6)  # odd rows, some columns NaN-free
    X2[rng.rand(37, 6) < 0.5] = np.nan
    X2[:, 0] = rng.randn(37)  # no NaNs
    X2[:, 1] = np.nan  # all NaN
    X2[1:, 2] = np.nan  # single valid value
    cases.append(X2)
    # n-1 divisible by 4: integral quantile positions (t == 0)
    cases.append(rng.randn(5, 4))
    cases.append(rng.randn(9, 4))
    # ties + duplicated values (zero IQR downstream) + subnormals
    X5 = np.repeat(rng.randn(1, 5), 20, axis=0)
    X5[::3, 2] = np.nan
    cases.append(X5)
    cases.append(rng.randn(50, 3) * 1e-310)
    cases.append(rng.randn(6, 4) * 1e308)  # even-count (a+b)/2 overflow edge
    for i, Xc in enumerate(cases):
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore")  # numpy warns on all-NaN slices
            med, q25, q75 = _nan_median_quartiles(Xc)
            ref_med = np.nanmedian(Xc, axis=0)
            ref_q25, ref_q75 = np.nanpercentile(Xc, [25, 75], axis=0)
        for got, ref, name in ((med, ref_med, "med"), (q25, ref_q25, "q25"), (q75, ref_q75, "q75")):
            assert got.dtype == ref.dtype, (i, name)
            same = (got == ref) | (np.isnan(got) & np.isnan(ref))
            assert same.all(), (i, name, got, ref)


def test_preprocess_missing_columns_become_zeros():
    df = pd.DataFrame({"clinical_f0": [1.0, 2.0, 3.0]})
    X, _, scaler = preprocess_features(df, ["clinical_f0", "clinical_f1"])
    assert X.shape == (3, 2)
    assert (X[:, 1] == 0).all()


def test_apply_masks_zeroes_modality_blocks():
    np.random.seed(0)
    df, masks = generate_synthetic_data(SYNTH)
    cols = get_all_feature_cols(df)
    X = np.ones((len(df), len(cols)), np.float32)
    masks0 = {m: np.zeros(len(df), dtype=int) for m in MODALITIES}
    out = apply_masks_to_matrix(X, masks0, cols)
    assert (out == 0).all()
    slices = get_feature_slices(cols)
    masks_mri_only = {
        "clinical": np.ones(len(df), dtype=int),
        "datspect": np.ones(len(df), dtype=int),
        "mri": np.zeros(len(df), dtype=int),
    }
    out2 = apply_masks_to_matrix(X, masks_mri_only, cols)
    assert (out2[:, slices["mri"]] == 0).all()
    assert (out2[:, slices["clinical"]] == 1).all()


def test_mask_matrix_order_is_canonical():
    masks = {"mri": np.array([1, 0]), "clinical": np.array([0, 1])}
    mm = get_modality_mask_matrix(masks)
    assert mm.shape == (2, 3)
    assert (mm[:, 0] == [0, 1]).all()  # clinical column first
    assert (mm[:, 1] == 0).all()  # datspect absent -> zeros
    assert (mm[:, 2] == [1, 0]).all()
