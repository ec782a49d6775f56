"""End-to-end pipeline tests on synthetic data (the reference's E2E story is
scripts/quickstart.sh; here it is a real pytest)."""
import shutil

import numpy as np
import pytest
import yaml

from pd_fusion.paths import RUNS_DIR


@pytest.fixture
def cleanup_run():
    names = []
    yield names
    for n in names:
        shutil.rmtree(RUNS_DIR / n, ignore_errors=True)


def test_quickstart_single_run_artifacts(cleanup_run):
    from pd_fusion.experiments.run_experiment import run_full_pipeline

    run_id = "pytest_quickstart"
    cleanup_run.append(run_id)
    results = run_full_pipeline(
        "configs/quickstart.yaml", synthetic=True, overrides={"output_dir": run_id}
    )

    run_dir = RUNS_DIR / run_id
    for artifact in (
        "results.yaml",
        "model.pt",
        "preprocess.pkl",
        "resolved_config.yaml",
        "eval_config.yaml",
        "provenance.yaml",
        "degradation.png",
        "degradation.csv",
        "roc_curve.png",
        "roc_curve.csv",
        "pr_curve.png",
        "pr_curve.csv",
        "calibration.png",
        "calibration.csv",
        "risk_coverage.png",
        "risk_coverage.csv",
    ):
        assert (run_dir / artifact).exists(), artifact

    res = yaml.safe_load(open(run_dir / "results.yaml"))
    assert set(res.keys()) == {
        "full_observation", "no_dat", "no_mri", "clinical_only",
        "random_1_drop", "random_2_drop",
    }
    for scen, metrics in res.items():
        for key in ("roc_auc", "pr_auc", "balanced_accuracy", "f1", "brier_score", "ece"):
            assert key in metrics
            assert 0.0 <= float(metrics[key]) <= 1.0
    # sanity vs the reference's committed quickstart run (~0.71 ROC-AUC on
    # full_observation with identical data; training RNG differs)
    assert float(res["full_observation"]["roc_auc"]) > 0.55


def test_quickstart_moddrop_and_conformal(cleanup_run):
    from pd_fusion.experiments.run_experiment import run_full_pipeline

    run_id = "pytest_moddrop"
    cleanup_run.append(run_id)
    results = run_full_pipeline(
        "configs/quickstart.yaml",
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "model_type": "fusion_moddrop",
            "params": {"hidden_dims": [16, 8], "dropout": 0.1, "lr": 0.01,
                       "batch_size": 32, "epochs": 10, "moddrop_rate": 0.3},
            "conformal": True,
            "calibrate": True,
        },
    )
    run_dir = RUNS_DIR / run_id
    assert (run_dir / "conformal_model.pkl").exists()
    assert float(results["full_observation"]["roc_auc"]) > 0.5


def test_cv_pipeline_artifacts(cleanup_run):
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    run_id = "pytest_cv"
    cleanup_run.append(run_id)
    aggregated = run_cv_pipeline(
        "configs/quickstart.yaml", k=3, synthetic=True, overrides={"output_dir": run_id}
    )
    run_dir = RUNS_DIR / run_id
    assert (run_dir / "fold_assignments.csv").exists()
    for i in (1, 2, 3):
        assert (run_dir / f"results_fold_{i}.yaml").exists()
        assert (run_dir / f"preds_fold_{i}_full_observation.csv").exists()
    assert (run_dir / "results_aggregated.yaml").exists()
    assert (run_dir / "summary_table.csv").exists()
    assert (run_dir / "summary_table.tex").exists()

    assert "full_observation" in aggregated
    assert "mean" in aggregated["full_observation"]["roc_auc"]
    # fold assignment covers every sample exactly once
    import pandas as pd

    fa = pd.read_csv(run_dir / "fold_assignments.csv")
    assert (fa["fold"] >= 1).all() and (fa["fold"] <= 3).all()


def test_moe_end_to_end(cleanup_run):
    from pd_fusion.experiments.run_experiment import run_full_pipeline

    run_id = "pytest_moe"
    cleanup_run.append(run_id)
    results = run_full_pipeline(
        "configs/quickstart.yaml",
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "model_type": "moe",
            "params": {"expert_hidden_dims": [16, 8], "router_hidden_dims": [8],
                       "lr": 0.01, "epochs": 20},
        },
    )
    assert float(results["full_observation"]["roc_auc"]) > 0.5
