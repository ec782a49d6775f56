"""Analysis suite tests: aggregation over run dirs, device bootstrap CIs,
cross-run summary."""
import numpy as np
import pandas as pd
import pytest
import yaml


def _make_cv_run(run_dir, model_type, seed, auc):
    run_dir.mkdir(parents=True)
    yaml.safe_dump({"model_type": model_type, "seed": seed}, open(run_dir / "resolved_config.yaml", "w"))
    yaml.safe_dump({"seed": seed}, open(run_dir / "provenance.yaml", "w"))
    agg = {
        "full_observation": {"roc_auc": {"mean": auc, "std": 0.01},
                             "ece": {"mean": 0.1, "std": 0.02}},
        "random_1_drop": {"roc_auc": {"mean": auc - 0.05, "std": 0.02},
                          "ece": {"mean": 0.12, "std": 0.02}},
    }
    yaml.safe_dump(agg, open(run_dir / "results_aggregated.yaml", "w"))
    rng = np.random.RandomState(seed)
    for fold in (1, 2):
        pd.DataFrame(
            {
                "y_true": rng.randint(0, 2, 30),
                "y_prob": rng.rand(30),
                "fold": fold,
            }
        ).to_csv(run_dir / f"preds_fold_{fold}_full_observation.csv", index=False)


def test_aggregate_results_cv_runs(tmp_path):
    from pd_fusion.analysis.aggregate_results import aggregate

    _make_cv_run(tmp_path / "cv_a", "fusion_moddrop", 1, 0.85)
    _make_cv_run(tmp_path / "cv_b", "moe", 2, 0.80)
    df = aggregate(tmp_path, tmp_path / "summary.csv")
    assert df is not None and len(df) == 4
    assert (tmp_path / "summary_table.csv").exists()
    assert (tmp_path / "summary_table.tex").exists()
    assert set(df["Model"]) == {"fusion_moddrop", "moe"}
    assert "roc_auc_mean" in df.columns


def test_bootstrap_ci_device(tmp_path):
    from pd_fusion.analysis.bootstrap_ci import bootstrap_metrics, run_bootstrap

    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 200)
    p = np.clip(rng.rand(200) * 0.5 + y * 0.4, 0, 1)
    boot = bootstrap_metrics(y, p, n=200)
    assert set(boot) == {"roc_auc", "pr_auc", "balanced_accuracy", "f1", "brier_score", "ece"}
    assert boot["roc_auc"].shape == (200,)
    from sklearn.metrics import roc_auc_score

    point = roc_auc_score(y, p)
    lo, hi = np.percentile(boot["roc_auc"], [2.5, 97.5])
    assert lo < point < hi
    assert hi - lo < 0.3

    _make_cv_run(tmp_path / "cv_a", "fusion_moddrop", 1, 0.85)
    out = run_bootstrap(tmp_path, n=100)
    ci = pd.read_csv(out)
    assert len(ci) == 6
    assert (ci["CI_low"] <= ci["CI_high"]).all()


def test_generate_summary(tmp_path):
    from pd_fusion.analysis.generate_summary import generate_summary

    _make_cv_run(tmp_path / "cv_moddrop", "fusion_moddrop", 1, 0.85)
    _make_cv_run(tmp_path / "cv_moe", "moe", 2, 0.80)
    df = generate_summary(
        [str(tmp_path / "cv_moddrop"), str(tmp_path / "cv_moe")], tmp_path / "out"
    )
    assert (tmp_path / "out" / "final_benchmark_summary.csv").exists()
    assert (tmp_path / "out" / "summary_table.tex").exists()
    assert (tmp_path / "out" / "robustness_comparison.png").exists()
    assert set(df["Model"]) == {"moddrop", "moe"}
