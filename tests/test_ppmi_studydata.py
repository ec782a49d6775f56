"""PPMI study-data builder integration (models the reference's
tests/test_ppmi_merge.py plus extra coverage for label inference,
baseline selection, and visit-level merging)."""
import json
import logging
from pathlib import Path

import pandas as pd
import pytest

from pd_fusion.data.ppmi_studydata import build_ppmi_datasets


def _write_csv(path: Path, rows):
    pd.DataFrame(rows).to_csv(path, index=False)


@pytest.fixture
def study_dir(tmp_path):
    raw = tmp_path / "raw_ppmi" / "study_data"
    raw.mkdir(parents=True)
    _write_csv(
        raw / "Participant_Status.csv",
        [
            {"PATNO": 1, "COHORT": "PD"},
            {"PATNO": 2, "COHORT": "HC"},
            {"PATNO": 3, "COHORT": "PD"},
            {"PATNO": 4, "COHORT": "Prodromal"},  # excluded
            {"PATNO": 5, "COHORT": "HC"},
            {"PATNO": 6, "COHORT": "PD"},
        ],
    )
    _write_csv(
        raw / "MDS_UPDRS_Part_III.csv",
        [
            {"PATNO": 1, "EVENT_ID": "BL", "UPDRSIII": 20},
            {"PATNO": 1, "EVENT_ID": "V04", "UPDRSIII": 24},
            {"PATNO": 2, "EVENT_ID": "BL", "UPDRSIII": 5},
            {"PATNO": 3, "EVENT_ID": "SC", "UPDRSIII": 15},  # no BL -> SC baseline
            {"PATNO": 5, "EVENT_ID": "BL", "UPDRSIII": 3},
            {"PATNO": 6, "EVENT_ID": "BL", "UPDRSIII": 30},
        ],
    )
    _write_csv(
        raw / "DaTscan_Analysis.csv",
        [
            {"PATNO": 1, "EVENT_ID": "BL", "CAUDATE_R": 1.1},
            {"PATNO": 2, "EVENT_ID": "BL", "CAUDATE_R": 2.5},
        ],
    )
    return raw, tmp_path / "processed"


def _config(raw, processed):
    return {
        "study_data_dir": str(raw),
        "processed_ppmi_dir": str(processed),
        "extract_zips": False,
        "tables": {
            "participant_status": {"patterns": ["*Participant_Status*.csv"], "group": "labels"},
            "mds_updrs": {"patterns": ["*MDS_UPDRS*.csv"], "group": "clinical"},
            "datscan": {"patterns": ["*DaTscan*.csv"], "group": "imaging"},
        },
        "splits": {"seeds": [42], "train_size": 0.67, "val_size": 0.16, "test_size": 0.17},
    }


def test_build_ppmi_datasets_end_to_end(study_dir):
    raw, processed = study_dir
    outputs = build_ppmi_datasets(_config(raw, processed), logging.getLogger("test"))

    baseline = pd.read_csv(outputs["baseline"])
    # prodromal subject 4 excluded; both classes present; one row per subject
    assert set(baseline["label"].unique()) == {0, 1}
    assert 4 not in baseline["subject_id"].astype(int).tolist()
    assert baseline["subject_id"].nunique() == baseline.shape[0]
    # table__column prefixing
    assert "mds_updrs__UPDRSIII" in baseline.columns
    assert "datscan__CAUDATE_R" in baseline.columns
    # baseline priority: subject 3 has only SC -> SC row picked
    s3 = baseline[baseline["subject_id"].astype(str) == "3"].iloc[0]
    assert s3["visit_id"] == "SC"
    # subject 1 has BL and V04 -> BL picked
    s1 = baseline[baseline["subject_id"].astype(str) == "1"].iloc[0]
    assert s1["visit_id"] == "BL"
    assert s1["mds_updrs__UPDRSIII"] == 20

    visit = pd.read_csv(outputs["visit_level"])
    assert (visit["label"].isin([0, 1])).all()
    assert visit.shape[0] >= baseline.shape[0]

    schema = json.loads(Path(outputs["schema"]).read_text())
    assert "clinical" in schema["groups"]
    assert "imaging" in schema["groups"]
    assert schema["feature_types"]["mds_updrs__UPDRSIII"] == "numeric"

    splits = json.loads((processed / "ppmi_splits_seed42.json").read_text())
    train, val, test = set(splits["train"]), set(splits["val"]), set(splits["test"])
    assert train.isdisjoint(val) and train.isdisjoint(test) and val.isdisjoint(test)
    assert outputs["manifest"].exists()


def test_label_value_map_override(study_dir):
    raw, processed = study_dir
    cfg = _config(raw, processed)
    cfg["label"] = {"value_map": {"pd": 0, "hc": 1}}  # deliberately inverted
    outputs = build_ppmi_datasets(cfg, logging.getLogger("test"))
    baseline = pd.read_csv(outputs["baseline"])
    s1 = baseline[baseline["subject_id"].astype(str) == "1"].iloc[0]
    assert s1["label"] == 0  # PD mapped to 0 by the override
