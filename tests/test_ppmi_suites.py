"""Integration tests for the stress-test, meaningful-suite, and
imaging-upgrade scripts on a synthetic PPMI-style baseline table."""
import importlib.util
import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_script(name):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def baseline_df():
    rng = np.random.RandomState(0)
    n = 120
    y = rng.randint(0, 2, n)
    df = pd.DataFrame(
        {
            "subject_id": [str(i) for i in range(n)],
            "visit_id": "BL",
            "visit_month": 0,
            "label": y,
            # non-motor block (signal)
            "moca__MCATOT": rng.randn(n) - y * 0.8,
            "depression__GDS": rng.randn(n) + y * 0.5,
            "sleep__EPWORTH": rng.randn(n),
            # DAT-SBR block with L/R pair (signal)
            "datscan_sbr__PUTAMEN_L": rng.rand(n) * 2 + (1 - y) * 1.0,
            "datscan_sbr__PUTAMEN_R": rng.rand(n) * 2 + (1 - y) * 0.8,
            "datscan_sbr__CAUDATE_L": rng.rand(n) * 2,
            # MRI block
            "mri_derived__HIPPO_VOL": rng.randn(n) - y * 0.3,
            # demographics
            "age": rng.rand(n) * 30 + 50,
            "sex": rng.choice(["M", "F"], n),
        }
    )
    # inject missingness in imaging
    miss = rng.rand(n) < 0.2
    df.loc[miss, ["datscan_sbr__PUTAMEN_L", "datscan_sbr__PUTAMEN_R"]] = np.nan
    return df


def test_stress_test_suite(baseline_df, tmp_path):
    mod = _load_script("ppmi_stress_test")
    out = mod.run_stress_test(
        baseline_df, tmp_path, folds=3, epochs=5, batch_size=32,
        logger=logging.getLogger("t"),
    )
    assert (tmp_path / "stress_test_per_fold.csv").exists()
    assert (tmp_path / "stress_test_summary.csv").exists()
    assert set(out["model"]) == {"lgbm", "moddrop_mlp"}
    assert set(out["scenario"]) == {"full", "missing_clinical", "missing_imaging"}
    assert len(out) == 2 * 3 * 3  # models x scenarios x folds
    assert np.isfinite(out["roc_auc"]).all()


def test_meaningful_suite(baseline_df, tmp_path):
    mod = _load_script("ppmi_meaningful_suite")
    out = mod.run_suite(
        baseline_df, tmp_path, seed=0, no_plot=False, logger=logging.getLogger("t")
    )
    for artifact in (
        "kept_dropped_columns.json", "per_fold_metrics.csv", "summary_mean.csv",
        "feature_importance.csv", "univariate_top.csv", "permutation_test.csv",
        "roc_auc_bar.png",
    ):
        assert (tmp_path / artifact).exists(), artifact
    kept = json.loads((tmp_path / "kept_dropped_columns.json").read_text())
    assert "moca__MCATOT" in kept["non_motor_only"]["kept"]
    assert "datscan_sbr__PUTAMEN_L" in kept["datsbr_only"]["kept"]
    # permutation test should hover near chance
    perm = pd.read_csv(tmp_path / "permutation_test.csv")
    assert perm["roc_auc"].mean() < 0.75


def test_imaging_upgrade_suite(baseline_df, tmp_path):
    mod = _load_script("ppmi_imaging_upgrade")
    # write baseline + visit CSVs (visit = two timepoints for progression)
    baseline_csv = tmp_path / "baseline.csv"
    visit_csv = tmp_path / "visits.csv"
    baseline_df.to_csv(baseline_csv, index=False)
    v2 = baseline_df.copy()
    v2["visit_id"] = "V04"
    v2["visit_month"] = 12
    pd.concat([baseline_df, v2]).to_csv(visit_csv, index=False)

    cfg = {
        "baseline_csv": str(baseline_csv),
        "visit_csv": str(visit_csv),
        "endpoint": {"type": "pd_vs_hc"},
        "cv": {"folds": 3, "seeds": [0]},
        "covariates": {"numeric": ["age"], "categorical": ["sex"]},
        "harmonization": {"method": "none", "site_cols": []},
        "models": ["logreg", "lgbm"],
    }
    out_dir = tmp_path / "run"
    out_dir.mkdir()
    per_fold = mod.run_imaging_upgrade(
        cfg, out_dir, no_plot=False, no_shap=True, logger=logging.getLogger("t")
    )
    for artifact in (
        "kept_dropped_columns.json", "imaging_columns.json",
        "imaging_availability_summary.json", "imaging_missingness_per_feature.csv",
        "imaging_missingness_per_subject.csv", "per_fold_metrics.csv", "predictions.csv",
        "summary_mean.csv", "univariate_top.csv", "permutation_test.csv",
        "paired_tests.json", "roc_auc_bar.png",
    ):
        assert (out_dir / artifact).exists(), artifact
    # asymmetry feature was engineered from the PUTAMEN L/R pair
    cols = json.loads((out_dir / "imaging_columns.json").read_text())
    assert any(c.endswith("_ASYM") for c in cols["datsbr"])
    assert set(per_fold["setting"]) >= {"non_motor_only", "datsbr_only", "fusion_nonmotor_imaging"}


def test_imaging_upgrade_progression_endpoint(baseline_df, tmp_path):
    mod = _load_script("ppmi_imaging_upgrade")
    rng = np.random.RandomState(1)
    baseline_df = baseline_df.copy()
    baseline_df["mds_updrs__NP3TOT"] = rng.rand(len(baseline_df)) * 20
    v2 = baseline_df.copy()
    v2["visit_id"] = "V04"
    v2["visit_month"] = 12
    # half the subjects progress by >= 5 points
    v2["mds_updrs__NP3TOT"] = baseline_df["mds_updrs__NP3TOT"] + np.where(
        rng.rand(len(v2)) < 0.5, 8.0, 1.0
    )
    visit_df = pd.concat([baseline_df, v2])

    out = mod.build_endpoint_labels(
        baseline_df, visit_df,
        {"type": "progression", "horizon_months": 24, "progression_feature": "mds_updrs__NP3TOT",
         "progression_threshold": 5.0},
        logging.getLogger("t"),
    )
    assert set(out["label"].unique()) == {0, 1}
    assert 0.2 < out["label"].mean() < 0.8


def test_imaging_upgrade_shap_leg_device_backend(baseline_df, tmp_path, monkeypatch):
    """The SHAP leg works WITHOUT the shap package when the tree winner is
    the device GBDT (native exact TreeSHAP, ops/treeshap.py) — the
    reference needs shap.TreeExplainer here (ppmi_imaging_upgrade.py:
    783-823) and this image has no shap wheel."""
    monkeypatch.setenv("PD_FUSION_GBDT_BACKEND", "device")
    mod = _load_script("ppmi_imaging_upgrade")
    baseline_csv = tmp_path / "baseline.csv"
    visit_csv = tmp_path / "visits.csv"
    baseline_df.to_csv(baseline_csv, index=False)
    v2 = baseline_df.copy()
    v2["visit_id"] = "V04"
    v2["visit_month"] = 12
    pd.concat([baseline_df, v2]).to_csv(visit_csv, index=False)
    cfg = {
        "baseline_csv": str(baseline_csv),
        "visit_csv": str(visit_csv),
        "endpoint": {"type": "pd_vs_hc"},
        "cv": {"folds": 3, "seeds": [0]},
        "covariates": {"numeric": ["age"], "categorical": ["sex"]},
        "harmonization": {"method": "none", "site_cols": []},
        "models": ["lgbm"],  # tree-only -> the SHAP winner is the device GBDT
    }
    out_dir = tmp_path / "run"
    out_dir.mkdir()
    mod.run_imaging_upgrade(
        cfg, out_dir, no_plot=True, no_shap=False, logger=logging.getLogger("t")
    )
    shap_csv = out_dir / "shap_summary.csv"
    assert shap_csv.exists(), "device-backend SHAP leg should have produced the CSV"
    tab = pd.read_csv(shap_csv)
    assert {"feature", "mean_abs_shap"} <= set(tab.columns)
    assert np.isfinite(tab["mean_abs_shap"]).all()
    assert (tab["mean_abs_shap"] >= 0).all()
    assert tab["mean_abs_shap"].max() > 0  # the signal features attribute
