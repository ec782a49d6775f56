"""validate-data E2E (D2) and the processed-parquet PPMI load path (D1
non-synthetic): raw CSVs -> column mapping -> outer merge -> parquet ->
masks from marker columns."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def ppmi_raw(tmp_path, monkeypatch):
    import pd_fusion.data.ppmi_loader as L
    import pd_fusion.paths as paths

    processed = tmp_path / "processed"
    monkeypatch.setattr(L, "PROCESSED_DATA_DIR", processed)
    raw = tmp_path / "raw"
    raw.mkdir()

    pd.DataFrame(
        {
            "PATNO": [1, 2, 3, 4],
            "EVENT_ID": "BL",
            "NP3TOT": [20, 5, 15, 30],
            "AGE": [65, 60, 70, 55],
            "SEX": [1, 0, 1, 0],
            "EDUCYRS": [12, 16, 14, 12],
        }
    ).to_csv(raw / "clinical_baseline.csv", index=False)
    pd.DataFrame(
        {
            "PATNO": [1, 2, 3],
            "EVENT_ID": "BL",
            "CAUDATE_R": [1.1, 2.5, 1.3],
            "CAUDATE_L": [1.0, 2.4, 1.2],
            "PUTAMEN_R": [0.8, 2.0, 0.9],
            "PUTAMEN_L": [0.7, 1.9, 0.8],
            "SBR_MEAN": [0.9, 2.2, 1.05],
        }
    ).to_csv(raw / "datspect_sbr.csv", index=False)
    pd.DataFrame(
        {
            "PATNO": [1, 4],
            "EVENT_ID": "BL",
            "L_Hippocampus_Vol": [4000.0, 4200.0],
            "R_Hippocampus_Vol": [4100.0, 4150.0],
        }
    ).to_csv(raw / "mri_volumetric.csv", index=False)

    data_config = {
        "raw_data_dir": str(raw),
        "modalities": {
            "clinical": {"files": ["clinical_baseline.csv"], "id_col": "PATNO"},
            "datspect": {"files": ["datspect_sbr.csv"], "id_col": "PATNO"},
            "mri": {"files": ["mri_volumetric.csv"], "id_col": "PATNO"},
        },
    }
    from pd_fusion.utils.io import load_yaml

    column_config = load_yaml("configs/ppmi_columns.yaml")
    return data_config, column_config, processed


def test_validate_data_merge_and_masks(ppmi_raw):
    from pd_fusion.data.ppmi_loader import create_masks_from_df, load_ppmi_data, process_and_merge_data

    data_config, column_config, processed = ppmi_raw
    merged = process_and_merge_data(data_config, column_config)
    assert (processed / "ppmi_merged.parquet").exists()
    # outer merge keeps all 4 subjects; canonical renames applied
    assert merged["patno"].nunique() == 4
    for col in ("updrs_iii", "caudate_r", "hippocampus_l"):
        assert col in merged.columns, col
    # quirk preserved from the reference column map: required_columns
    # demands SBR_MEAN but the map renames MEAN_SBR, so SBR_MEAN passes
    # validation un-renamed (masks fall back to the caudate_r marker)
    assert "SBR_MEAN" in merged.columns

    masks = create_masks_from_df(merged, data_config["modalities"])
    assert masks["clinical"].sum() == 4
    assert masks["datspect"].sum() == 3  # subject 4 has no DAT
    assert masks["mri"].sum() == 2  # subjects 1, 4

    # the non-synthetic load path reads the parquet back with masks
    df, masks2 = load_ppmi_data(data_config, synthetic=False)
    assert len(df) == 4
    assert (masks2["datspect"] == masks["datspect"]).all()


def test_load_ppmi_data_missing_parquet_raises(tmp_path, monkeypatch):
    import pd_fusion.data.ppmi_loader as L

    monkeypatch.setattr(L, "PROCESSED_DATA_DIR", tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        L.load_ppmi_data({"modalities": {}}, synthetic=False)
