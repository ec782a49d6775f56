"""Tests for the tabular feature-helper modules (reference features/*.py
— shipped but unwired in the reference; behavior pinned here so the API
stays faithful)."""
import numpy as np
import pandas as pd


def test_clinical_sex_encoding_and_coercion():
    from pd_fusion.features.clinical import get_clinical_features

    df = pd.DataFrame(
        {
            "updrs_iii": ["12", "x", 30],
            "age": [60, "70", None],
            "sex": ["M", "F", "other"],
            "education": [12, 14, 16],
            "irrelevant": [1, 2, 3],
        }
    )
    out = get_clinical_features(df)
    assert "irrelevant" not in out.columns
    assert out["sex"].tolist()[:2] == [1, 0] and np.isnan(out["sex"].iloc[2])
    assert out["updrs_iii"].iloc[0] == 12 and np.isnan(out["updrs_iii"].iloc[1])
    assert out["age"].iloc[1] == 70


def test_datspect_asymmetry_indices():
    from pd_fusion.features.datspect import get_datspect_features

    df = pd.DataFrame(
        {"caudate_l": [2.0], "caudate_r": [1.0], "putamen_l": [1.0], "putamen_r": [1.0]}
    )
    out = get_datspect_features(df)
    # |2-1| / mean(2,1) = 1/1.5
    assert abs(out["caudate_asym"].iloc[0] - 1.0 / 1.5) < 1e-4
    assert abs(out["putamen_asym"].iloc[0]) < 1e-4


def test_mri_icv_normalization_skips_meta_and_icv():
    from pd_fusion.features.mri import get_mri_features

    df = pd.DataFrame(
        {"patno": [1], "icv": [1000.0], "hippocampus": [8.0], "label": ["a"]}
    )
    out = get_mri_features(df)
    assert "patno" not in out.columns
    assert abs(out["hippocampus"].iloc[0] - 8.0 / 1000.0) < 1e-6
    assert out["icv"].iloc[0] == 1000.0  # icv itself not divided
    assert out["label"].iloc[0] == "a"  # non-numeric untouched
