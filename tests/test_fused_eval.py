"""Fused single-run scenario evaluation: one stacked device program must
produce the SAME metrics as the per-scenario host loop (reference
evaluate.py semantics), for every flat-matrix MLP family."""
import numpy as np
import pytest

from pd_fusion.data.missingness import apply_missingness_scenario
from pd_fusion.data.ppmi_loader import generate_synthetic_data
from pd_fusion.data.preprocess import preprocess_features
from pd_fusion.data.feature_utils import get_all_feature_cols
from pd_fusion.data.schema import TARGET_COL
from pd_fusion.evaluation.evaluate import evaluate_model, predict_for_masks
from pd_fusion.utils.metrics import compute_metrics
from pd_fusion.utils.seed import set_seed

SCENARIOS = [
    {"name": "full_observation", "drop_modalities": []},
    {"name": "drop_mri", "drop_modalities": ["mri"]},
    {"name": "random_1", "random_drop": 1},
]


def _data():
    set_seed(3)
    df, masks = generate_synthetic_data(
        {
            "num_samples": 120,
            "clinical_dim": 6,
            "datspect_dim": 4,
            "mri_dim": 8,
            "missing_rates": [0.1, 0.2, 0.3],
        }
    )
    return df, masks


def _loop_results(model, df, masks, prep_info):
    out = {}
    y_true = df[TARGET_COL].values
    for scenario in SCENARIOS:
        cm = apply_missingness_scenario(df, scenario, masks)
        out[scenario["name"]] = compute_metrics(
            y_true, predict_for_masks(model, df, cm, prep_info)
        )
    return out


def test_fused_moe_scenario_eval_matches_loop():
    from pd_fusion.data.feature_utils import get_modality_feature_cols
    from pd_fusion.models.moe import MoEModel

    df, masks = _data()
    mod_dims = {"clinical": 6, "datspect": 4, "mri": 8}
    prep_info, X_dict = {}, {}
    for mod in mod_dims:
        feats = get_modality_feature_cols(df, mod)
        X, _, scaler = preprocess_features(df, feats)
        prep_info[mod] = (None, scaler, feats)
        X_dict[mod] = X
    y = df[TARGET_COL].values
    mask_mat = np.stack([masks[m] for m in mod_dims], axis=1).astype(np.float32)

    model = MoEModel(
        mod_dims,
        {"expert_hidden_dims": [8], "router_hidden_dims": [4], "lr": 0.01, "epochs": 10},
    )
    model.train(X_dict, y, mask_mat)

    set_seed(11)
    fused = evaluate_model(model, df, masks, prep_info, {"scenarios": SCENARIOS})
    set_seed(11)
    loop = _loop_results(model, df, masks, prep_info)

    assert set(fused) == set(loop)
    for scen in fused:
        for metric, v in loop[scen].items():
            assert fused[scen][metric] == pytest.approx(v, abs=1e-5), (scen, metric)


@pytest.mark.parametrize("family", ["fusion_late", "fusion_masked", "fusion_moddrop"])
def test_fused_scenario_eval_matches_loop(family):
    df, masks = _data()
    feats = get_all_feature_cols(df)
    X, _, scaler = preprocess_features(df, feats)
    y = df[TARGET_COL].values
    prep_info = (None, scaler, feats)
    params = {"hidden_dims": [16], "dropout": 0.0, "lr": 0.01, "epochs": 10}

    if family == "fusion_late":
        from pd_fusion.models.fusion_late import LateFusionModel

        model = LateFusionModel(X.shape[1], params)
        model.train(X, y)
    elif family == "fusion_masked":
        from pd_fusion.data.missingness import get_modality_mask_matrix
        from pd_fusion.models.fusion_masked import MaskedFusionModel

        mm = get_modality_mask_matrix(masks).astype(np.float32)
        model = MaskedFusionModel(X.shape[1], mm.shape[1], params)
        model.train(np.concatenate([X, mm], axis=1), y)
    else:
        from pd_fusion.models.fusion_moddrop import ModalityDropoutModel

        mod_dims = {"clinical": 6, "datspect": 4, "mri": 8}
        model = ModalityDropoutModel(mod_dims, dict(params, moddrop_rate=0.2, batch_size=32))
        model.train(X, y)

    # the scenario RNG draws must match between the two paths
    set_seed(11)
    fused = evaluate_model(model, df, masks, prep_info, {"scenarios": SCENARIOS})
    set_seed(11)
    loop = _loop_results(model, df, masks, prep_info)

    assert set(fused) == set(loop)
    for scen in fused:
        for metric, v in loop[scen].items():
            assert fused[scen][metric] == pytest.approx(v, abs=1e-5), (scen, metric)


def test_fused_gbdt_scenario_eval_matches_loop(monkeypatch):
    """Device-backend unimodal GBDT: the one-program scenario eval must
    equal the per-scenario loop, and must actually be the path taken
    (guarded by a spy — a silent fallback to the loop would also pass
    the equality)."""
    from pd_fusion.data.feature_utils import get_modality_feature_cols
    from pd_fusion.evaluation import evaluate as EV
    from pd_fusion.models.unimodal_gbdt import UnimodalGBDT

    df, masks = _data()
    feats = get_modality_feature_cols(df, "clinical")
    X, _, scaler = preprocess_features(df, feats)
    y = df[TARGET_COL].values
    prep_info = (None, scaler, feats)

    model = UnimodalGBDT(
        "clinical", {"backend": "device", "n_estimators": 15, "max_depth": 3}
    )
    model.train(X, y)

    called = {"fused": 0}
    real = EV._eval_scenarios_fused_gbdt

    def spy(*a, **k):
        called["fused"] += 1
        return real(*a, **k)

    monkeypatch.setattr(EV, "_eval_scenarios_fused_gbdt", spy)
    set_seed(11)
    fused = EV.evaluate_model(model, df, masks, prep_info, {"scenarios": SCENARIOS})
    assert called["fused"] == 1
    set_seed(11)
    loop = _loop_results(model, df, masks, prep_info)

    assert set(fused) == set(loop)
    for scen in fused:
        for metric, v in loop[scen].items():
            assert fused[scen][metric] == pytest.approx(v, abs=1e-5), (scen, metric)

    # the host HistGB backend must keep the per-scenario loop (pinned:
    # backend 'auto' resolves to device on TPU)
    h = UnimodalGBDT("clinical", {"backend": "host", "n_estimators": 15, "max_depth": 3})
    h.train(X, y)
    called["fused"] = 0
    EV.evaluate_model(h, df, masks, prep_info, {"scenarios": SCENARIOS})
    assert called["fused"] == 0
