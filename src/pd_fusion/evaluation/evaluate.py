"""Scenario evaluation.

Reference contract (src/pd_fusion/evaluation/evaluate.py:11-169): for each
scenario, transform the availability masks (missingness engine), prepare
model-family-specific inputs (flat+masked matrix / per-modality dict for
MoE / None-ed bags for MIL), predict, compute the six metrics; optional
subject-level aggregation (group mean of y_prob, first y_true) adds
``subject_*``-prefixed metrics; ``compute_risk_coverage`` sorts by
confidence and accumulates error vs coverage.

The duplicated input-prep logic that the reference repeats in four places
(evaluate.py:28-96, :101-138, run_experiment.py:133-160, :425-468) is a
single ``predict_for_masks`` helper here. Metric computation is the fused
XLA program in pd_fusion.ops.metrics; risk-coverage is a device sort/
cumsum.
"""
from typing import Dict

import numpy as np
import pandas as pd

from pd_fusion.data.feature_utils import apply_masks_to_matrix
from pd_fusion.data.missingness import apply_missingness_scenario, get_modality_mask_matrix
from pd_fusion.data.preprocess import preprocess_features
from pd_fusion.data.schema import TARGET_COL
from pd_fusion.ops.metrics import risk_coverage as _risk_coverage_dev
from pd_fusion.utils.metrics import compute_metrics


def is_mil_prep(prep_info) -> bool:
    return isinstance(prep_info, tuple) and len(prep_info) >= 2 and prep_info[0] == "mil"


def is_moe_prep(prep_info) -> bool:
    return isinstance(prep_info, dict)


def predict_for_masks(model, df, masks: Dict[str, np.ndarray], prep_info) -> np.ndarray:
    """Prepare family-specific inputs under the given masks and predict."""
    if is_mil_prep(prep_info):
        mil_col = prep_info[1]
        bags = df[mil_col].tolist()
        if "mri" in masks:
            bags = [bag if m == 1 else None for bag, m in zip(bags, masks["mri"])]
        return np.asarray(model.predict_proba(bags, masks=masks)).ravel()

    if is_moe_prep(prep_info):
        X_dict = {}
        mods_used = list(prep_info.keys())
        for mod in mods_used:
            imputer, scaler, feats = prep_info[mod]
            X_mod, _, _ = preprocess_features(df, feats, imputer, scaler)
            if mod in masks:
                X_mod = X_mod * np.asarray(masks[mod]).reshape(-1, 1)
            X_dict[mod] = X_mod
        mask_mat = np.stack([masks[m] for m in mods_used], axis=1).astype(np.float32)
        return np.asarray(model.predict_proba(X_dict, mask_mat)).ravel()

    imputer, scaler, feature_cols = prep_info
    X, _, _ = preprocess_features(df, feature_cols, imputer, scaler)
    X = apply_masks_to_matrix(X, masks, feature_cols)
    if hasattr(model, "mask_dim"):
        return np.asarray(
            model.predict_proba(X, masks=get_modality_mask_matrix(masks))
        ).ravel()
    return np.asarray(model.predict_proba(X, masks=masks)).ravel()


def _subject_metrics(df, group_col, y_true, y_prob):
    tmp = pd.DataFrame({"group": df[group_col].values, "y_true": y_true, "y_prob": y_prob})
    y_true_g = tmp.groupby("group")["y_true"].first().values
    y_prob_g = tmp.groupby("group")["y_prob"].mean().values
    return compute_metrics(y_true_g, y_prob_g)


def _tiled_targets(y_true, n_scenarios):
    """[S, N] float32 labels + all-ones weights for the fused programs."""
    import jax.numpy as jnp

    y = jnp.asarray(np.tile(y_true.astype(np.float32), (n_scenarios, 1)))
    return y, jnp.ones_like(y)


def _packed_scenario_metrics(probs, y_s, w_s):
    """Shared tail of every fused scenario program: per-scenario metric
    sets + probs packed into ONE fetchable buffer. Keeping this in one
    place means a metrics/packing change cannot silently diverge between
    the MLP / MoE / GBDT fused paths."""
    import jax

    from pd_fusion.ops.metrics import binary_metrics, pack_metrics_and_probs

    md = jax.vmap(lambda yy, pp, ww: binary_metrics(yy, pp, ww, 0.5))(y_s, probs, w_s)
    return pack_metrics_and_probs(md, probs)


def _assemble_scenario_results(packed, scenarios, df_test, group_col, y_true):
    """Host tail shared by the fused paths: unpack the buffer, add
    subject-level metrics, and key by scenario name."""
    from pd_fusion.ops.metrics import unpack_metrics_and_probs

    md, probs = unpack_metrics_and_probs(
        packed, (len(scenarios),), (len(scenarios), len(y_true))
    )
    results = {}
    for si, scenario in enumerate(scenarios):
        metrics = {k: float(v[si]) for k, v in md.items()}
        if group_col and group_col in df_test.columns:
            for k, v in _subject_metrics(df_test, group_col, y_true, probs[si]).items():
                metrics[f"subject_{k}"] = v
        results[scenario["name"]] = metrics
    return results


def _eval_scenarios_fused(model, df_test, mask_test, prep_info, scenarios, group_col, y_true):
    """All scenarios as ONE device program: stacked [S, N, F'] inputs ->
    vmapped MLP forward -> vmapped metrics reduction. Mirrors the CV
    engine's [K, S, N] fused evaluation (parallel/cv_engine.py) for the
    single-split pipeline; the reference loops scenario-by-scenario
    (evaluate.py:11-169)."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.mlp import mlp_apply

    imputer, scaler, feature_cols = prep_info
    X_base, _, _ = preprocess_features(df_test, feature_cols, imputer, scaler)
    mats = []
    for scenario in scenarios:
        current_masks = apply_missingness_scenario(df_test, scenario, mask_test)
        X = apply_masks_to_matrix(X_base, current_masks, feature_cols)
        mats.append(model.prepare_eval_matrix(X, current_masks))
    stack = jnp.asarray(np.stack(mats))  # [S, N, F']
    y, w = _tiled_targets(y_true, len(scenarios))

    @jax.jit
    def program(net_params, X_s, y_s, w_s):
        probs = jax.vmap(lambda x: jax.nn.sigmoid(mlp_apply(net_params, x)))(X_s)
        return _packed_scenario_metrics(probs, y_s, w_s)  # one fetch, one relay RTT

    packed = np.asarray(program(model.net_params, stack, y, w))
    return _assemble_scenario_results(packed, scenarios, df_test, group_col, y_true)


def _eval_scenarios_fused_moe(model, df_test, mask_test, prep_info, scenarios, group_col, y_true):
    """MoE twin of ``_eval_scenarios_fused``: [S, M, N, Fmax] stacked
    per-modality inputs + [S, N, M] masks -> one vmapped stacked-expert
    forward + metrics program."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.moe import moe_apply

    mods_used = list(prep_info.keys())
    base = {}
    for mod in mods_used:
        imputer, scaler, feats = prep_info[mod]
        base[mod], _, _ = preprocess_features(df_test, feats, imputer, scaler)

    xs, mms = [], []
    for scenario in scenarios:
        cm = apply_missingness_scenario(df_test, scenario, mask_test)
        X_dict = {
            mod: (base[mod] * np.asarray(cm[mod]).reshape(-1, 1) if mod in cm else base[mod])
            for mod in mods_used
        }
        xs.append(model._stack_inputs(X_dict))
        mms.append(np.stack([cm[m] for m in mods_used], axis=1).astype(np.float32))
    x_s = jnp.asarray(np.stack(xs))  # [S, M, N, Fmax]
    m_s = jnp.asarray(np.stack(mms))  # [S, N, M]
    y, w = _tiled_targets(y_true, len(scenarios))

    @jax.jit
    def program(net_params, x, m, y_s, w_s):
        probs = jax.vmap(lambda xx, mm: moe_apply(net_params, xx, mm))(x, m)
        return _packed_scenario_metrics(probs, y_s, w_s)  # one fetch, one relay RTT

    packed = np.asarray(program(model.net_params, x_s, m_s, y, w))
    return _assemble_scenario_results(packed, scenarios, df_test, group_col, y_true)


def _eval_scenarios_fused_gbdt(model, df_test, mask_test, prep_info, scenarios, group_col, y_true):
    """Device-GBDT twin of ``_eval_scenarios_fused``: scenario matrices are
    zeroed then re-binned host-side (tiny searchsorted), and ONE device
    program traverses the ensemble for all scenarios + computes packed
    metrics. The per-scenario loop pays one dispatch per scenario over the
    relay; this pays one."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.gbdt import predict_margin

    imputer, scaler, feature_cols = prep_info
    X_base, _, _ = preprocess_features(df_test, feature_cols, imputer, scaler)
    mats = []
    for scenario in scenarios:
        current_masks = apply_missingness_scenario(df_test, scenario, mask_test)
        X = apply_masks_to_matrix(X_base, current_masks, feature_cols)
        mats.append(model.prepare_eval_bins(X))
    stack = jnp.asarray(np.stack(mats))  # [S, N, F] int32
    y, w = _tiled_targets(y_true, len(scenarios))
    inner = model.model
    if getattr(inner, "_trees_dev", None) is None:
        # populate the model's own device cache (one upload, shared with
        # later predict calls) instead of re-shipping the ensemble here
        inner._trees_dev = {k: jnp.asarray(v) for k, v in inner.trees_.items()}
    trees = inner._trees_dev
    depth = inner.max_depth
    base = jnp.float32(inner.base_score_)

    @jax.jit
    def program(t, bins_s, b0, y_s, w_s):
        probs = jax.vmap(
            lambda bb: jax.nn.sigmoid(predict_margin(t, bb, b0, depth=depth))
        )(bins_s)
        return _packed_scenario_metrics(probs, y_s, w_s)  # one fetch, one relay RTT

    packed = np.asarray(program(trees, stack, base, y, w))
    return _assemble_scenario_results(packed, scenarios, df_test, group_col, y_true)


def evaluate_model(model, df_test, mask_test, prep_info, config) -> Dict[str, Dict[str, float]]:
    results = {}
    scenarios = config.get("scenarios", [{"name": "baseline", "drop_modalities": []}])
    group_col = config.get("group_col")
    y_true = df_test[TARGET_COL].values

    # Flat-matrix MLP families and MoE fuse every scenario into one device
    # program. The check is on the model's own CLASS: calibration/conformal
    # wrappers delegate attribute access to the wrapped model, but their
    # predictions must flow through the wrapper, so they take the
    # per-scenario path.
    multi = len(scenarios) > 1 and np.unique(y_true).size >= 2
    if multi and not is_mil_prep(prep_info) and not is_moe_prep(prep_info) and hasattr(
        type(model), "prepare_eval_matrix"
    ):
        return _eval_scenarios_fused(
            model, df_test, mask_test, prep_info, scenarios, group_col, y_true
        )
    if multi and is_moe_prep(prep_info) and hasattr(type(model), "_stack_inputs"):
        return _eval_scenarios_fused_moe(
            model, df_test, mask_test, prep_info, scenarios, group_col, y_true
        )
    if (
        multi
        and not is_mil_prep(prep_info)
        and not is_moe_prep(prep_info)
        and hasattr(type(model), "prepare_eval_bins")
        and getattr(model, "backend", None) == "device"
    ):
        return _eval_scenarios_fused_gbdt(
            model, df_test, mask_test, prep_info, scenarios, group_col, y_true
        )

    for scenario in scenarios:
        current_masks = apply_missingness_scenario(df_test, scenario, mask_test)
        y_prob = predict_for_masks(model, df_test, current_masks, prep_info)
        metrics = compute_metrics(y_true, y_prob)
        if group_col and group_col in df_test.columns:
            for k, v in _subject_metrics(df_test, group_col, y_true, y_prob).items():
                metrics[f"subject_{k}"] = v
        results[scenario["name"]] = metrics

    return results


def predict_proba_for_scenario(model, df_test, mask_test, prep_info, scenario):
    """(y_true, y_prob) for one scenario — used for fold-prediction CSVs."""
    current_masks = apply_missingness_scenario(df_test, scenario, mask_test)
    y_true = df_test[TARGET_COL].values
    return y_true, predict_for_masks(model, df_test, current_masks, prep_info)


def compute_risk_coverage(y_true, y_prob, masks=None) -> Dict[str, np.ndarray]:
    # one jitted program, one [2, n] readback
    out = np.asarray(
        _risk_coverage_dev(np.asarray(y_true, np.float32), np.asarray(y_prob, np.float32))
    )
    return {"coverage": out[0], "risk": out[1]}
