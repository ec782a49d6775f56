"""Dev-dataset loader tests with synthetic fixture files (the reference
only smoke-prints these via scripts/verify_loaders.py)."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def dev_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PD_FUSION_DEV_DATA_DIR", str(tmp_path))
    # paths.DEV_DATA_DIR is computed at import; patch the module attr too
    import pd_fusion.paths as paths

    monkeypatch.setattr(paths, "DEV_DATA_DIR", tmp_path)
    return tmp_path


def test_uci_parkinsons_loader(dev_dir):
    uci = dev_dir / "uci"
    uci.mkdir()
    rng = np.random.RandomState(0)
    n = 40
    df = pd.DataFrame(
        {
            "name": [f"phon_R0{i}" for i in range(n)],
            "MDVP:Fo(Hz)": rng.rand(n) * 100,
            "MDVP:Jitter(%)": rng.rand(n),
            "status": rng.randint(0, 2, n),
        }
    )
    df.to_csv(uci / "parkinsons.data", index=False)

    from pd_fusion.data.dev_datasets.uci_parkinsons import load_uci_parkinsons

    out, masks = load_uci_parkinsons()
    assert "diagnosis" in out.columns
    assert "patno" in out.columns
    assert "clinical_MDVP:Fo(Hz)" in out.columns
    assert masks["clinical"].sum() == n
    assert masks["datspect"].sum() == 0 and masks["mri"].sum() == 0


def test_uci_telemonitoring_loader(dev_dir):
    uci = dev_dir / "uci"
    uci.mkdir()
    rng = np.random.RandomState(1)
    n = 50
    df = pd.DataFrame(
        {
            "subject#": rng.randint(1, 10, n),
            "age": rng.rand(n) * 30 + 50,
            "sex": rng.randint(0, 2, n),
            "test_time": rng.rand(n) * 100,
            "motor_UPDRS": rng.rand(n) * 30,
            "total_UPDRS": rng.rand(n) * 40,
            "Jitter(%)": rng.rand(n),
        }
    )
    df.to_csv(uci / "parkinsons_updrs.data", index=False)

    from pd_fusion.data.dev_datasets.uci_telemonitoring import load_uci_telemonitoring

    out, masks = load_uci_telemonitoring()
    # median-split severity proxy -> both classes, UPDRS excluded from features
    assert set(out["diagnosis"].unique()) == {0, 1}
    assert "clinical_total_UPDRS" not in out.columns
    assert "clinical_Jitter(%)" in out.columns
    assert masks["clinical"].sum() == n


def test_openneuro_dev_loader(dev_dir):
    acc = "ds004471"
    root = dev_dir / "openneuro" / acc
    root.mkdir(parents=True)
    rng = np.random.RandomState(2)
    n = 30
    participants = pd.DataFrame(
        {
            "participant_id": [f"sub-{i:02d}" for i in range(n)],
            "group": rng.choice(["PD", "Control"], n),
            "age": rng.rand(n) * 30 + 50,
            "sex": rng.choice(["M", "F"], n),
        }
    )
    participants.to_csv(root / "participants.tsv", sep="\t", index=False)
    # give a few subjects BIDS anat dirs with T1w files (mri proxy counts)
    for i in range(5):
        anat = root / f"sub-{i:02d}" / "anat"
        anat.mkdir(parents=True)
        (anat / f"sub-{i:02d}_T1w.nii.gz").write_bytes(b"x")

    from pd_fusion.data.dev_datasets.openneuro import load_openneuro_dataset

    df, masks = load_openneuro_dataset(acc)
    assert set(df["diagnosis"].unique()) == {0, 1}
    assert "clinical_age" in df.columns
    assert "clinical_sex" in df.columns
    assert "mri_t1w_count" in df.columns
    assert masks["mri"].sum() == 5
    assert masks["clinical"].sum() == n
    # mri features NaN where absent
    assert df.loc[masks["mri"] == 0, "mri_t1w_count"].isna().all()


def test_column_mapping_validation(tmp_path):
    from pd_fusion.data.column_mapping import ColumnMapper

    cfg = {
        "clinical": {
            "required_columns": ["PATNO", "NP3TOT"],
            "column_map": {"PATNO": "patno", "NP3TOT": "updrs_iii"},
        }
    }
    mapper = ColumnMapper(cfg)
    ok = mapper.validate_and_map(pd.DataFrame({"PATNO": [1], "NP3TOT": [20]}), "clinical")
    assert list(ok.columns) == ["patno", "updrs_iii"]
    bad = mapper.validate_and_map(pd.DataFrame({"PATNO": [1]}), "clinical")
    assert bad is None
    assert mapper.validate_and_map(pd.DataFrame({"A": [1]}), "unknown_mod") is None
