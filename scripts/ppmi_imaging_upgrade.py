#!/usr/bin/env python
"""PPMI imaging-upgrade audit suite (reference: scripts/
ppmi_imaging_upgrade.py): longitudinal endpoint builders (pd_vs_hc /
HC->PD conversion within a horizon / UPDRS-delta progression), L/R
asymmetry features, covariate regression-adjustment fitted on train only,
harmonization none/ComBat(neuroCombat, site-zscore fallback)/site-zscore,
imaging-available cohort filters, missingness audits, per-fold CV across
settings x models, paired t-test between settings, SHAP summary for the
best model, and ROC/calibration plots. Same config keys and artifact
names as the reference.

TPU-native difference: univariate AUC screening and fold metrics run as
fused device reductions (pd_fusion.ops.metrics); the modeling legs remain
host sklearn (logreg / lgbm-fallback) by design.
"""
import argparse
import datetime
import json
import logging
import os
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd
import yaml

ID_COLS = {"subject_id", "visit_id", "visit_month", "date"}
DEFAULT_GLOBAL_EXCLUDE = [
    r"^.*date.*$", r"^.*time.*$", r"^.*event.*$", r"^.*protocol.*$", r"^.*dose.*$",
    r"^.*site.*$", r"^.*center.*$", r"^.*scanner.*$", r"^.*acq.*$", r"^.*acquisition.*$",
    r"^.*series.*$", r"^.*version.*$", r"^.*reason.*$", r"^.*not_analyzed.*$",
    r"^.*notanalyzed.*$",
]
DEFAULT_NONMOTOR = [
    r"moca", r"cognition", r"sleep", r"epworth", r"rbd", r"rem", r"depress", r"gds",
    r"bdi", r"anxiety", r"stai", r"mood", r"upsit", r"smell", r"autonomic",
]
DEFAULT_DATSBR = [r"datscan", r"sbr", r"putamen", r"caudate", r"striat", r"asym"]
DEFAULT_MRI = [
    r"mri_derived__", r"thickness", r"cortical", r"volume", r"area", r"aseg", r"hippo",
    r"entorhinal", r"amygdala", r"caudate", r"putamen", r"pallid", r"thalam", r"accumbens",
]


def setup_logging(out_dir: Path) -> logging.Logger:
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("ppmi_imaging")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s %(message)s")
        for handler in (logging.StreamHandler(), logging.FileHandler(out_dir / "ppmi_imaging_upgrade.log")):
            handler.setFormatter(fmt)
            logger.addHandler(handler)
    return logger


def select_numeric(df, cols):
    if not cols:
        return pd.DataFrame(index=df.index)
    return df.loc[:, cols].apply(pd.to_numeric, errors="coerce")


def filter_cols(cols, patterns):
    if not patterns:
        return cols
    return [c for c in cols if any(re.search(p, c, re.IGNORECASE) for p in patterns)]


def exclude_cols(cols, patterns):
    if not patterns:
        return cols
    return [c for c in cols if not any(re.search(p, c, re.IGNORECASE) for p in patterns)]


def get_feature_cols(df, exclude_patterns):
    cols = exclude_cols([c for c in df.columns if c not in ID_COLS and c != "label"],
                        exclude_patterns)
    num_df = select_numeric(df, cols)
    return [c for c in num_df.columns if num_df[c].notna().any()]


# ---------------------------------------------------------------------------
# feature engineering + adjustment + harmonization
# ---------------------------------------------------------------------------


def add_asymmetry_features(df, dat_cols) -> Tuple[pd.DataFrame, List[str]]:
    """L/R asymmetry: (L - R) / (L + R + eps) for paired columns."""
    out = df.copy()
    paired: Dict[str, Dict[str, str]] = {}
    for col in dat_cols:
        if re.search(r"(_L_|_LEFT_|_L$|_LEFT$)", col, re.IGNORECASE):
            base = re.sub(r"(_L_|_LEFT_|_L$|_LEFT$)", "", col, flags=re.IGNORECASE)
            paired.setdefault(base, {})["L"] = col
        elif re.search(r"(_R_|_RIGHT_|_R$|_RIGHT$)", col, re.IGNORECASE):
            base = re.sub(r"(_R_|_RIGHT_|_R$|_RIGHT$)", "", col, flags=re.IGNORECASE)
            paired.setdefault(base, {})["R"] = col
    new_cols = []
    for base, sides in paired.items():
        if "L" in sides and "R" in sides:
            lvals = pd.to_numeric(out[sides["L"]], errors="coerce")
            rvals = pd.to_numeric(out[sides["R"]], errors="coerce")
            name = f"{base}_ASYM"
            out[name] = (lvals - rvals) / (lvals + rvals + 1e-6)
            new_cols.append(name)
    return out, new_cols


def build_covariate_matrix(df, numeric_covs, categorical_covs, encoder=None):
    from sklearn.preprocessing import OneHotEncoder

    num = pd.DataFrame()
    for col in numeric_covs:
        if col in df.columns:
            num[col] = pd.to_numeric(df[col], errors="coerce")
    if not num.empty:
        num = num.fillna(num.median())
    cat = pd.DataFrame()
    for col in categorical_covs:
        if col in df.columns:
            cat[col] = df[col].astype(str).fillna("UNKNOWN")
    if encoder is None:
        try:
            encoder = OneHotEncoder(handle_unknown="ignore", sparse_output=False)
        except TypeError:  # pragma: no cover
            encoder = OneHotEncoder(handle_unknown="ignore", sparse=False)
        cat_mat = encoder.fit_transform(cat) if not cat.empty else np.zeros((len(df), 0))
    else:
        cat_mat = encoder.transform(cat) if not cat.empty else np.zeros((len(df), 0))
    num_mat = num.to_numpy() if not num.empty else np.zeros((len(df), 0))
    return np.concatenate([num_mat, cat_mat], axis=1), encoder


def adjust_features(train_df, test_df, feature_cols, numeric_covs, categorical_covs):
    """Regress covariates out of imaging features; fit on TRAIN only."""
    from sklearn.linear_model import LinearRegression

    if not feature_cols:
        return train_df, test_df
    X_train = select_numeric(train_df, feature_cols)
    X_test = select_numeric(test_df, feature_cols)
    train_medians = X_train.median()
    X_train = X_train.fillna(train_medians)
    X_test = X_test.fillna(train_medians)
    C_train, encoder = build_covariate_matrix(train_df, numeric_covs, categorical_covs, None)
    C_test, _ = build_covariate_matrix(test_df, numeric_covs, categorical_covs, encoder)
    if C_train.shape[1] == 0:
        return train_df, test_df
    reg = LinearRegression().fit(C_train, X_train)
    train_out, test_out = train_df.copy(), test_df.copy()
    train_adj = X_train - reg.predict(C_train)
    test_adj = X_test - reg.predict(C_test)
    for col in feature_cols:
        train_out[col] = train_adj[col].values
        test_out[col] = test_adj[col].values
    return train_out, test_out


def site_zscore_harmonize(train_df, test_df, feature_cols, site_col):
    if site_col not in train_df.columns:
        return train_df, test_df
    train, test = train_df.copy(), test_df.copy()
    X_train = select_numeric(train, feature_cols)
    X_test = select_numeric(test, feature_cols)
    g_mean = X_train.mean()
    g_std = X_train.std().replace(0, 1.0)
    site_stats = {}
    for site, idx in train.groupby(site_col).groups.items():
        s_mean = X_train.loc[idx].mean()
        s_std = X_train.loc[idx].std().replace(0, 1.0)
        site_stats[site] = (s_mean, s_std)
        X_train.loc[idx] = (X_train.loc[idx] - s_mean) / s_std * g_std + g_mean
    if site_col in test.columns:
        for site, idx in test.groupby(site_col).groups.items():
            s_mean, s_std = site_stats.get(site, (g_mean, g_std))
            X_test.loc[idx] = (X_test.loc[idx] - s_mean) / s_std * g_std + g_mean
    for col in feature_cols:
        train[col] = X_train[col].values
        test[col] = X_test[col].values
    return train, test


def apply_harmonization(train_df, test_df, feature_cols, method, site_cols, logger):
    if method == "none" or not feature_cols:
        return train_df, test_df
    if method == "combat":
        try:  # pragma: no cover - neuroCombat not in this image
            from neuroCombat import neuroCombat

            site_col = next((c for c in site_cols if c in train_df.columns), None)
            if site_col is None:
                return train_df, test_df
            X_train = select_numeric(train_df, feature_cols).fillna(0).T
            covars = pd.DataFrame({"batch": train_df[site_col].astype(str)})
            combat = neuroCombat(dat=X_train, covars=covars, batch_col="batch")
            train_adj = pd.DataFrame(combat["data"].T, columns=feature_cols, index=train_df.index)
            train_out, test_out = train_df.copy(), test_df.copy()
            for col in feature_cols:
                train_out[col] = train_adj[col].values
            return train_out, test_out
        except Exception as exc:
            logger.warning("ComBat not available, falling back to site_zscore (%s)", exc)
            method = "site_zscore"
    if method == "site_zscore":
        site_col = next((c for c in site_cols if c in train_df.columns), None)
        if site_col is None:
            return train_df, test_df
        return site_zscore_harmonize(train_df, test_df, feature_cols, site_col)
    return train_df, test_df


# ---------------------------------------------------------------------------
# endpoints
# ---------------------------------------------------------------------------


def build_endpoint_labels(baseline_df, visit_df, endpoint_cfg, logger):
    endpoint = endpoint_cfg.get("type", "pd_vs_hc")
    horizon = endpoint_cfg.get("horizon_months", 24)
    if endpoint == "pd_vs_hc":
        return baseline_df

    visit_df = visit_df.dropna(subset=["label"]).copy()
    if "visit_month" not in visit_df.columns:
        raise ValueError("visit_month required for longitudinal endpoints")
    if visit_df["visit_month"].isna().all():
        if "visit_id" not in visit_df.columns:
            raise ValueError("visit_month missing and visit_id not available")
        s = visit_df["visit_id"].astype(str).str.upper()
        derived = pd.to_numeric(s.str.extract(r"(\d+)", expand=False), errors="coerce")
        derived.loc[s.isin({"BL", "BASELINE", "SCR", "SCREEN", "SC", "ENRL"})] = 0
        visit_df["visit_month"] = derived
        logger.info("Derived visit_month from visit_id for longitudinal endpoints")

    if endpoint.startswith("conversion"):
        # HC-at-baseline subjects only; converted if any PD label within horizon
        base = baseline_df[["subject_id", "label"]].copy()
        base = base[base["label"] == 0]
        within = visit_df[
            visit_df["subject_id"].isin(base["subject_id"])
            & visit_df["visit_month"].notna()
            & (visit_df["visit_month"] <= horizon)
        ]
        conv = within.groupby("subject_id")["label"].max().rename("conv")
        base = base.merge(conv, on="subject_id", how="left")
        base["label"] = base["conv"].fillna(0).astype(int)
        logger.info("Conversion endpoint: %d subjects", len(base))
        return baseline_df.drop(columns=["label"], errors="ignore").merge(
            base[["subject_id", "label"]], on="subject_id", how="right"
        )

    if endpoint.startswith("progression"):
        feature = endpoint_cfg.get("progression_feature", "mds_updrs__NP3TOT")
        threshold = endpoint_cfg.get("progression_threshold", 5.0)
        allow_beyond = bool(endpoint_cfg.get("progression_allow_beyond_horizon", True))
        max_months = endpoint_cfg.get("progression_max_months")

        v = visit_df[visit_df[feature].notna()].copy()
        v["visit_month"] = pd.to_numeric(v["visit_month"], errors="coerce")
        v = v[v["visit_month"].notna()]
        if max_months is not None:
            v = v[v["visit_month"] <= max_months]

        target = (
            v[v["visit_month"] <= horizon].sort_values("visit_month").groupby("subject_id").last()
        )
        if allow_beyond:
            future = (
                v[v["visit_month"] > horizon].sort_values("visit_month").groupby("subject_id").first()
            )
            extra = future.index.difference(target.index)
            if len(extra):
                target = pd.concat([target, future.loc[extra]])
                logger.info(
                    "Progression: using %d subjects with visits beyond %s months",
                    len(extra), horizon,
                )
        target = target.reset_index()
        if target.empty:
            raise ValueError(
                f"No progression targets found for feature {feature} (horizon={horizon})."
            )

        merged = baseline_df[["subject_id", feature]].merge(
            target[["subject_id", feature]], on="subject_id", suffixes=("_base", "_target")
        )
        merged["label"] = (
            merged[f"{feature}_target"] - merged[f"{feature}_base"] >= threshold
        ).astype(int)
        out = baseline_df.drop(columns=["label"], errors="ignore").merge(
            merged[["subject_id", "label"]], on="subject_id", how="inner"
        )
        logger.info("Progression endpoint: %d subjects", len(out))
        return out

    raise ValueError(f"Unknown endpoint: {endpoint}")


# ---------------------------------------------------------------------------
# modeling helpers
# ---------------------------------------------------------------------------


def fit_model(model_name, seed, num_threads, logger):
    from sklearn.linear_model import LogisticRegression

    if model_name == "logreg":
        return LogisticRegression(max_iter=2000, class_weight="balanced")
    if model_name == "lgbm":
        try:  # pragma: no cover
            from lightgbm import LGBMClassifier

            return LGBMClassifier(
                n_estimators=300, learning_rate=0.05, num_leaves=31, subsample=0.9,
                colsample_bytree=0.9, num_threads=num_threads, force_col_wise=True,
                random_state=seed, class_weight="balanced",
            )
        except Exception as exc:
            logger.warning("LightGBM not available (%s); using HistGradientBoosting", exc)
            from sklearn.ensemble import HistGradientBoostingClassifier

            return HistGradientBoostingClassifier(random_state=seed)
    raise ValueError(f"Unknown model {model_name}")


def compute_univariate_auc(df, y, feature_cols, top_k: int = 20):
    """Device screening: lax.map of the sort AUC over all features."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.ops.metrics import roc_auc

    X = select_numeric(df, feature_cols)
    X_filled = X.fillna(X.median()).to_numpy(np.float32)
    valid = [i for i in range(X_filled.shape[1]) if np.isfinite(X_filled[:, i]).all()]
    if not valid:
        return []
    aucs = np.asarray(
        jax.jit(lambda m: jax.lax.map(lambda c: roc_auc(jnp.asarray(np.float32(y)), c), m))(
            jnp.asarray(X_filled[:, valid].T)
        )
    )
    scores = [(feature_cols[valid[i]], float(aucs[i])) for i in range(len(valid))]
    return sorted(scores, key=lambda t: abs(t[1] - 0.5), reverse=True)[:top_k]


def permutation_test(df, feature_cols, num_threads, repeats: int = 5):
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import train_test_split

    X = select_numeric(df, feature_cols).fillna(0)
    y = df["label"].values
    results = []
    for i in range(repeats):
        y_perm = np.random.permutation(y)
        X_train, X_test, y_train, y_test = train_test_split(
            X, y_perm, test_size=0.2, random_state=42 + i, stratify=y_perm
        )
        clf = LogisticRegression(max_iter=500, class_weight="balanced")
        clf.fit(X_train, y_train)
        results.append(
            {"repeat": i + 1, "roc_auc": roc_auc_score(y_test, clf.predict_proba(X_test)[:, 1])}
        )
    return results


def paired_auc_test(fold_df, setting_a, setting_b):
    a = fold_df[(fold_df["setting"] == setting_a) & (fold_df["model"] == "lgbm")]["roc_auc"]
    b = fold_df[(fold_df["setting"] == setting_b) & (fold_df["model"] == "lgbm")]["roc_auc"]
    if len(a) != len(b) or len(a) == 0:
        return {"setting_a": setting_a, "setting_b": setting_b, "p_value": None}
    try:
        from scipy.stats import ttest_rel

        _, pval = ttest_rel(a, b)
    except Exception:  # pragma: no cover
        pval = None
    return {"setting_a": setting_a, "setting_b": setting_b,
            "p_value": float(pval) if pval is not None else None}


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def run_imaging_upgrade(cfg, out_dir: Path, num_threads=2, limit=None, no_plot=False,
                        no_shap=False, logger=None):
    from sklearn.impute import SimpleImputer
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler

    from pd_fusion.utils.metrics import compute_metrics

    logger = logger or setup_logging(out_dir)
    endpoint_cfg = cfg.get("endpoint", {})
    seeds = cfg.get("cv", {}).get("seeds", [42])
    folds = int(cfg.get("cv", {}).get("folds", 5))
    cohort_cfg = cfg.get("cohort", {})

    baseline_df = pd.read_csv(cfg["baseline_csv"], low_memory=False)
    visit_path = Path(cfg["visit_csv"])
    if not visit_path.exists():
        raise ValueError("visit_csv not found")
    visit_df = pd.read_csv(visit_path, low_memory=False)
    for frame in (baseline_df, visit_df):
        if "subject_id" in frame.columns:
            frame["subject_id"] = frame["subject_id"].astype(str)

    df = build_endpoint_labels(baseline_df, visit_df, endpoint_cfg, logger)
    df = df.dropna(subset=["label"]).copy()
    if limit:
        df = df.sample(n=min(limit, len(df)), random_state=seeds[0])

    fg = cfg.get("feature_groups", {})
    all_features = get_feature_cols(df, fg.get("global_exclude_patterns", DEFAULT_GLOBAL_EXCLUDE))
    dat_cols = filter_cols(all_features, fg.get("datsbr_patterns", DEFAULT_DATSBR))
    mri_cols = filter_cols(all_features, fg.get("mri_patterns", DEFAULT_MRI))
    nonmotor_cols = filter_cols(all_features, fg.get("non_motor_patterns", DEFAULT_NONMOTOR))

    df, asym_cols = add_asymmetry_features(df, dat_cols)
    dat_cols = dat_cols + asym_cols
    imaging_cols = sorted(set(dat_cols + mri_cols))
    settings = {
        "non_motor_only": nonmotor_cols,
        "datsbr_only": dat_cols,
        "freesurfer_only": mri_cols,
        "fusion_nonmotor_imaging": sorted(set(nonmotor_cols + imaging_cols)),
    }

    kept_dropped = {
        name: {"kept": cols, "dropped": [c for c in all_features if c not in cols]}
        for name, cols in settings.items()
    }
    (out_dir / "kept_dropped_columns.json").write_text(json.dumps(kept_dropped, indent=2))
    (out_dir / "imaging_columns.json").write_text(
        json.dumps({"datsbr": dat_cols, "mri": mri_cols}, indent=2)
    )

    # availability audit + cohort filter
    dat_avail = (
        select_numeric(df, dat_cols).notna().any(axis=1).to_numpy()
        if dat_cols else np.zeros(len(df), bool)
    )
    mri_avail = (
        select_numeric(df, mri_cols).notna().any(axis=1).to_numpy()
        if mri_cols else np.zeros(len(df), bool)
    )
    any_imaging = dat_avail | mri_avail
    (out_dir / "imaging_availability_summary.json").write_text(
        json.dumps(
            {
                "total_subjects": int(len(df)),
                "dat_available": int(dat_avail.sum()),
                "mri_available": int(mri_avail.sum()),
                "any_imaging_available": int(any_imaging.sum()),
                "dat_available_rate": float(dat_avail.mean()) if len(df) else 0.0,
                "mri_available_rate": float(mri_avail.mean()) if len(df) else 0.0,
                "any_imaging_available_rate": float(any_imaging.mean()) if len(df) else 0.0,
            },
            indent=2,
        )
    )
    if cohort_cfg.get("imaging_available_only", False):
        if cohort_cfg.get("require_dat", False) and cohort_cfg.get("require_mri", False):
            mask = dat_avail & mri_avail
        elif cohort_cfg.get("require_dat", False):
            mask = dat_avail
        elif cohort_cfg.get("require_mri", False):
            mask = mri_avail
        elif cohort_cfg.get("require_any", True):
            mask = any_imaging
        else:
            mask = np.ones(len(df), bool)
        df = df.loc[mask].copy()
        logger.info("Imaging-available cohort filter applied: %d subjects", len(df))

    # missingness audits
    X_im = select_numeric(df, imaging_cols)
    miss_feat = X_im.isna().mean().reset_index()
    miss_feat.columns = ["feature", "missing_rate"]
    miss_feat.sort_values("missing_rate", ascending=False).to_csv(
        out_dir / "imaging_missingness_per_feature.csv", index=False
    )
    pd.DataFrame(
        {"subject_id": df["subject_id"].astype(str), "missing_rate": X_im.isna().mean(axis=1)}
    ).to_csv(out_dir / "imaging_missingness_per_subject.csv", index=False)

    cov_cfg = cfg.get("covariates", {})
    num_covs, cat_covs = cov_cfg.get("numeric", []), cov_cfg.get("categorical", [])
    (out_dir / "covariates_used.json").write_text(
        json.dumps({"numeric": num_covs, "categorical": cat_covs}, indent=2)
    )
    harm_cfg = cfg.get("harmonization", {})
    harm_method = harm_cfg.get("method", "none")
    harm_site_cols = harm_cfg.get("site_cols", [])

    per_fold_rows, feature_rows, univariate_rows, pred_rows = [], [], [], []
    for seed in seeds:
        skf = StratifiedKFold(n_splits=folds, shuffle=True, random_state=seed)
        for setting, feature_cols in settings.items():
            if not feature_cols:
                logger.warning("No features for %s", setting)
                continue
            for feat, auc in compute_univariate_auc(df, df["label"].values, feature_cols):
                univariate_rows.append(
                    {"setting": setting, "feature": feat, "auc": auc, "seed": seed}
                )

            for fold, (train_idx, test_idx) in enumerate(
                skf.split(df, df["label"].values), start=1
            ):
                train_df = df.iloc[train_idx].copy()
                test_df = df.iloc[test_idx].copy()

                imaging_in_setting = [c for c in feature_cols if c in imaging_cols]
                if imaging_in_setting:
                    train_df, test_df = adjust_features(
                        train_df, test_df, imaging_in_setting, num_covs, cat_covs
                    )
                    train_df, test_df = apply_harmonization(
                        train_df, test_df, imaging_in_setting, harm_method, harm_site_cols, logger
                    )

                imputer = SimpleImputer(strategy="median", add_indicator=True)
                X_train_imp = imputer.fit_transform(select_numeric(train_df, feature_cols))
                X_test_imp = imputer.transform(select_numeric(test_df, feature_cols))
                feat_names = list(feature_cols)
                if imputer.indicator_ is not None:
                    for idx in imputer.indicator_.features_:
                        feat_names.append(f"{feature_cols[idx]}_missing")
                scaler = StandardScaler()
                X_train_scaled = scaler.fit_transform(X_train_imp)
                X_test_scaled = scaler.transform(X_test_imp)

                for model_name in cfg.get("models", ["logreg", "lgbm"]):
                    clf = fit_model(model_name, seed + fold, num_threads, logger)
                    Xtr = X_train_scaled if model_name == "logreg" else X_train_imp
                    Xte = X_test_scaled if model_name == "logreg" else X_test_imp
                    clf.fit(Xtr, train_df["label"].values)
                    y_prob = (
                        clf.predict_proba(Xte)[:, 1]
                        if hasattr(clf, "predict_proba")
                        else clf.predict(Xte)
                    )
                    per_fold_rows.append(
                        {"seed": seed, "fold": fold, "setting": setting, "model": model_name,
                         **compute_metrics(test_df["label"].values, y_prob)}
                    )
                    for idx, prob in zip(test_df.index, y_prob):
                        pred_rows.append(
                            {"index": int(idx), "subject_id": test_df.loc[idx, "subject_id"],
                             "setting": setting, "model": model_name, "fold": fold, "seed": seed,
                             "y_true": int(test_df.loc[idx, "label"]), "y_prob": float(prob)}
                        )

                    if model_name == "logreg" and hasattr(clf, "coef_"):
                        imp = np.abs(clf.coef_.reshape(-1))
                    elif hasattr(clf, "feature_importances_"):
                        imp = clf.feature_importances_.astype(float)
                    else:
                        imp = None
                    if imp is not None:
                        for name, val in zip(feat_names, imp):
                            feature_rows.append(
                                {"setting": setting, "model": model_name, "fold": fold,
                                 "seed": seed, "feature": name, "importance": float(val)}
                            )

    per_fold_df = pd.DataFrame(per_fold_rows)
    per_fold_df.to_csv(out_dir / "per_fold_metrics.csv", index=False)
    pred_df = pd.DataFrame(pred_rows)
    pred_df.to_csv(out_dir / "predictions.csv", index=False)

    summary = per_fold_df.groupby(["setting", "model"]).agg(["mean", "std"]).reset_index()
    summary.columns = [
        "_".join([c for c in col if c]) if isinstance(col, tuple) else col
        for col in summary.columns
    ]
    summary.to_csv(out_dir / "summary_mean.csv", index=False)

    feat_df = pd.DataFrame(feature_rows)
    if not feat_df.empty:
        feat_summary = (
            feat_df.groupby(["setting", "model", "feature"])["importance"].mean().reset_index()
        ).sort_values(["setting", "model", "importance"], ascending=[True, True, False])
        feat_summary.groupby(["setting", "model"]).head(20).to_csv(
            out_dir / "feature_importance.csv", index=False
        )

    pd.DataFrame(univariate_rows).to_csv(out_dir / "univariate_top.csv", index=False)

    perm_rows = []
    for setting in ("non_motor_only", "fusion_nonmotor_imaging"):
        cols = settings.get(setting, [])
        if cols:
            for row in permutation_test(df, cols, num_threads, repeats=5):
                perm_rows.append({**row, "setting": setting})
    pd.DataFrame(perm_rows).to_csv(out_dir / "permutation_test.csv", index=False)

    (out_dir / "paired_tests.json").write_text(
        json.dumps(paired_auc_test(per_fold_df, "non_motor_only", "fusion_nonmotor_imaging"),
                   indent=2)
    )

    if not no_plot:
        _make_plots(summary, pred_df, out_dir, logger)
    if not no_shap:
        _shap_summary(df, settings, summary, imaging_cols, num_covs, cat_covs, harm_method,
                      harm_site_cols, seeds, num_threads, out_dir, logger)

    logger.info("Saved summary to %s", out_dir / "summary_mean.csv")
    return per_fold_df


def _make_plots(summary, pred_df, out_dir, logger):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.calibration import calibration_curve
        from sklearn.metrics import roc_auc_score, roc_curve

        plot_df = summary.sort_values("roc_auc_mean", ascending=False)
        best_df = plot_df.groupby("setting", as_index=False).first()
        fig, ax = plt.subplots(figsize=(10, 5))
        ax.bar(best_df["setting"], best_df["roc_auc_mean"], yerr=best_df["roc_auc_std"], capsize=4)
        ax.set_ylabel("ROC-AUC")
        ax.set_title("PPMI Imaging Upgrade: ROC-AUC")
        ax.set_ylim(0, 1.0)
        plt.xticks(rotation=25, ha="right")
        fig.tight_layout()
        fig.savefig(out_dir / "roc_auc_bar.png", dpi=200)
        plt.close(fig)

        key_settings = ["non_motor_only", "fusion_nonmotor_imaging"]
        fig, ax = plt.subplots(figsize=(8, 6))
        for setting in key_settings:
            sub = pred_df[(pred_df["setting"] == setting) & (pred_df["model"] == "lgbm")]
            if sub.empty:
                continue
            fpr, tpr, _ = roc_curve(sub["y_true"], sub["y_prob"])
            ax.plot(fpr, tpr, label=f"{setting} (AUC={roc_auc_score(sub['y_true'], sub['y_prob']):.3f})")
        ax.plot([0, 1], [0, 1], "--", color="gray")
        ax.set_title("ROC Curves (LGBM)")
        ax.set_xlabel("False Positive Rate")
        ax.set_ylabel("True Positive Rate")
        ax.legend()
        fig.tight_layout()
        fig.savefig(out_dir / "roc_curves.png", dpi=200)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(6, 5))
        for setting in key_settings:
            sub = pred_df[(pred_df["setting"] == setting) & (pred_df["model"] == "lgbm")]
            if sub.empty:
                continue
            frac_pos, mean_pred = calibration_curve(sub["y_true"], sub["y_prob"], n_bins=10)
            ax.plot(mean_pred, frac_pos, marker="o", label=setting)
        ax.plot([0, 1], [0, 1], "--", color="gray")
        ax.set_title("Calibration Curves (LGBM)")
        ax.set_xlabel("Mean predicted")
        ax.set_ylabel("Fraction positive")
        ax.legend()
        fig.tight_layout()
        fig.savefig(out_dir / "calibration_curves.png", dpi=200)
        plt.close(fig)
    except Exception as exc:  # pragma: no cover
        logger.warning("Plot generation failed: %s", exc)


def _shap_summary(df, settings, summary, imaging_cols, num_covs, cat_covs, harm_method,
                  harm_site_cols, seeds, num_threads, out_dir, logger):
    try:
        import shap
        from sklearn.impute import SimpleImputer
        from sklearn.preprocessing import StandardScaler

        best = summary.sort_values("roc_auc_mean", ascending=False).iloc[0]
        setting, model = best["setting"], best["model"]
        feature_cols = settings.get(setting, [])
        if not feature_cols:
            return
        full_df = df.copy()
        imaging_in_setting = [c for c in feature_cols if c in imaging_cols]
        if imaging_in_setting:
            full_df, _ = adjust_features(full_df, full_df, imaging_in_setting, num_covs, cat_covs)
            full_df, _ = apply_harmonization(
                full_df, full_df, imaging_in_setting, harm_method, harm_site_cols, logger
            )
        imputer = SimpleImputer(strategy="median", add_indicator=True)
        X_imp = imputer.fit_transform(select_numeric(full_df, feature_cols))
        feat_names = list(feature_cols)
        if imputer.indicator_ is not None:
            for idx in imputer.indicator_.features_:
                feat_names.append(f"{feature_cols[idx]}_missing")
        X_scaled = StandardScaler().fit_transform(X_imp)
        clf = fit_model(model, seeds[0], num_threads, logger)
        X_train = X_scaled if model == "logreg" else X_imp
        clf.fit(X_train, full_df["label"].values)
        sample_idx = np.random.default_rng(seeds[0]).choice(
            len(full_df), size=min(500, len(full_df)), replace=False
        )
        X_sample = X_train[sample_idx]
        if model == "lgbm" and hasattr(clf, "predict_proba"):
            explainer = shap.TreeExplainer(clf)
            shap_vals = explainer.shap_values(X_sample)
            if isinstance(shap_vals, list):
                shap_vals = shap_vals[1]
        else:
            explainer = shap.LinearExplainer(clf, X_sample)
            shap_vals = explainer.shap_values(X_sample)
        shap_df = pd.DataFrame(
            {"feature": feat_names, "mean_abs_shap": np.mean(np.abs(shap_vals), axis=0)}
        ).sort_values("mean_abs_shap", ascending=False)
        shap_df.to_csv(out_dir / "shap_summary.csv", index=False)
    except Exception as exc:
        logger.warning("SHAP computation skipped: %s", exc)


def main():
    parser = argparse.ArgumentParser(description="PPMI imaging upgrade suite")
    parser.add_argument("--config", required=True)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--num-threads", type=int, default=2)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--no-shap", action="store_true")
    args = parser.parse_args()

    cfg = yaml.safe_load(Path(args.config).read_text())
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = Path(args.out_dir or f"runs/ppmi_imaging_upgrade_{timestamp}")
    logger = setup_logging(out_dir)
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(args.num_threads)
    mpl_cache = out_dir / "mpl_cache"
    mpl_cache.mkdir(parents=True, exist_ok=True)
    os.environ["MPLCONFIGDIR"] = str(mpl_cache)

    run_imaging_upgrade(
        cfg, out_dir, num_threads=args.num_threads, limit=args.limit,
        no_plot=args.no_plot, no_shap=args.no_shap, logger=logger,
    )


if __name__ == "__main__":
    main()
