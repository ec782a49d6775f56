"""End-to-end PPMI tabular suite: build study data from synthetic CSVs,
run the ablation x model sweep, generate the report."""
import importlib.util
import json
import logging
import sys
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
def built_dataset(tmp_path):
    rng = np.random.RandomState(0)
    raw = tmp_path / "study_data"
    raw.mkdir()
    n = 60
    labels = rng.randint(0, 2, n)
    pd.DataFrame(
        {"PATNO": np.arange(n), "COHORT": np.where(labels == 1, "PD", "HC")}
    ).to_csv(raw / "Participant_Status.csv", index=False)
    pd.DataFrame(
        {
            "PATNO": np.arange(n),
            "EVENT_ID": "BL",
            "NP3TOT": rng.rand(n) * 20 + labels * 15,
            "AGE": rng.rand(n) * 30 + 45,
        }
    ).to_csv(raw / "MDS_UPDRS.csv", index=False)
    pd.DataFrame(
        {
            "PATNO": np.arange(n),
            "EVENT_ID": "BL",
            "SBR_MEAN": rng.rand(n) * 2 + (1 - labels) * 1.2,
        }
    ).to_csv(raw / "DATSCAN_QUANT.csv", index=False)

    cfg = {
        "study_data_dir": str(raw),
        "processed_ppmi_dir": str(tmp_path / "processed"),
        "extract_zips": False,
        "tables": {
            "participant_status": {"patterns": ["*Participant_Status*.csv"], "group": "labels"},
            "mds_updrs": {"patterns": ["*MDS_UPDRS*.csv"], "group": "clinical"},
            "datscan_sbr": {"patterns": ["*DATSCAN*QUANT*.csv"], "group": "datsbr"},
        },
        "splits": {"seeds": [42], "train_size": 0.6, "val_size": 0.2, "test_size": 0.2},
        "models": ["logreg", "lgbm", "mlp"],
        "ablations": [
            {"name": "clinical_only", "groups": ["clinical"]},
            {"name": "fusion", "groups": ["clinical", "datsbr"]},
        ],
        "mlp": {"hidden_dims": [16], "max_epochs": 30, "lr": 0.01, "dropout": 0.1},
    }
    from pd_fusion.data.ppmi_studydata import build_ppmi_datasets

    build_ppmi_datasets(cfg, logging.getLogger("test"))
    return cfg, tmp_path


def test_train_tabular_suite(built_dataset):
    cfg, tmp_path = built_dataset
    mod = _load_script("ppmi_train_tabular")
    out_dir = tmp_path / "run"
    results = mod.run_suite(cfg, out_dir, seeds=[42], num_threads=1)

    assert (out_dir / "results_all.csv").exists()
    assert (out_dir / "summary_sweep_mean.csv").exists()
    assert (out_dir / "config_resolved.yaml").exists()
    # 2 ablations x 3 models
    assert len(results) == 6
    assert set(results["model"]) == {"logreg", "lgbm", "mlp"}
    # separable synthetic signal: fusion should be decent for logreg/mlp
    # (the HistGB fallback's min_samples_leaf=20 degenerates at n=60)
    fusion = results[results["ablation"] == "fusion"]
    assert (fusion[fusion["model"].isin(["logreg", "mlp"])]["roc_auc"] > 0.6).all()
    assert np.isfinite(fusion["roc_auc"]).all()
    # per-prediction CSVs exist
    preds = list(out_dir.glob("pred_*_seed42.csv"))
    assert len(preds) == 6
    p0 = pd.read_csv(preds[0])
    assert set(p0.columns) == {"subject_id", "y_true", "y_prob"}
