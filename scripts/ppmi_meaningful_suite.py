#!/usr/bin/env python
"""PPMI "meaningful baselines" suite (reference: scripts/
ppmi_meaningful_suite.py): six regex-defined feature settings
(full_clinical / no_motor_exam / non_motor_only / datsbr_only /
freesurfer_only / fusion union) x {logreg, lgbm-fallback} x 5-fold CV,
with kept/dropped-columns JSON, per-fold metrics, top-20 feature
importances, univariate AUC screening, a label-permutation sanity test,
and the ROC-AUC bar plot.

TPU-native difference: univariate AUC screening runs as ONE device
program over the whole feature matrix (lax.map of the tie-aware sort AUC
over columns) instead of a per-column sklearn loop; the fold metrics use
the fused XLA reduction.
"""
import argparse
import datetime
import json
import logging
import os
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd

ID_COLS = {"subject_id", "visit_id", "visit_month", "date"}
GLOBAL_EXCLUDE_REGEX = [
    r"^.*date.*$", r"^.*time.*$", r"^.*event.*$", r"^.*protocol.*$", r"^.*dose.*$",
    r"^.*site.*$", r"^.*center.*$", r"^.*scanner.*$", r"^.*acq.*$", r"^.*acquisition.*$",
    r"^.*series.*$", r"^.*version.*$",
]

SETTINGS = {
    "full_clinical": {"type": "all_numeric"},
    "no_motor_exam": {
        "type": "drop_regex",
        "drop_regex": [r"^mds_updrs__.*", r".*NHY.*", r".*TRMR.*", r".*RIG.*", r".*BRADY.*"],
    },
    "non_motor_only": {
        "type": "allow_regex",
        "allow_regex": [
            r"moca", r"cognition", r"sleep", r"epworth", r"rbd", r"rem", r"depress",
            r"gds", r"bdi", r"anxiety", r"stai", r"mood", r"upsit", r"smell", r"autonomic",
        ],
    },
    "datsbr_only": {
        "type": "allow_regex",
        "allow_regex": [r"datscan", r"sbr", r"putamen", r"caudate", r"striat"],
    },
    "freesurfer_only": {
        "type": "allow_regex",
        "allow_regex": [
            r"mri_derived__", r"thickness", r"cortical", r"volume", r"area", r"aseg",
            r"hippo", r"entorhinal", r"amygdala",
        ],
    },
    "fusion_nonmotor_imaging": {
        "type": "union",
        "sources": ["non_motor_only", "datsbr_only", "freesurfer_only"],
    },
}

MODELS = ["logreg", "lgbm"]


def setup_logging(out_dir: Path) -> logging.Logger:
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("ppmi_suite")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s %(message)s")
        for handler in (logging.StreamHandler(), logging.FileHandler(out_dir / "ppmi_meaningful_suite.log")):
            handler.setFormatter(fmt)
            logger.addHandler(handler)
    return logger


def select_numeric(df, cols):
    if not cols:
        return pd.DataFrame(index=df.index)
    return df.loc[:, cols].apply(pd.to_numeric, errors="coerce")


def get_all_numeric_features(df: pd.DataFrame) -> List[str]:
    cols = [
        c for c in df.columns
        if c not in ID_COLS and c != "label"
        and not any(re.search(p, c, re.IGNORECASE) for p in GLOBAL_EXCLUDE_REGEX)
    ]
    num_df = select_numeric(df, cols)
    return [c for c in num_df.columns if num_df[c].notna().any()]


def apply_setting(df: pd.DataFrame, setting: str, cache: Dict[str, List[str]]) -> List[str]:
    if setting in cache:
        return cache[setting]
    spec = SETTINGS[setting]
    if spec["type"] == "all_numeric":
        cols = get_all_numeric_features(df)
    elif spec["type"] == "drop_regex":
        cols = get_all_numeric_features(df)
        for pattern in spec["drop_regex"]:
            cols = [c for c in cols if not re.search(pattern, c, re.IGNORECASE)]
    elif spec["type"] == "allow_regex":
        cols = [
            c for c in get_all_numeric_features(df)
            if any(re.search(p, c, re.IGNORECASE) for p in spec["allow_regex"])
        ]
    elif spec["type"] == "union":
        cols = sorted({c for src in spec["sources"] for c in apply_setting(df, src, cache)})
    else:
        cols = []
    cache[setting] = cols
    return cols


def prepare_matrices(df, feature_cols, scale: bool, add_missing_indicators: bool):
    from sklearn.impute import SimpleImputer
    from sklearn.preprocessing import StandardScaler

    X = select_numeric(df, feature_cols)
    imputer = SimpleImputer(strategy="median", add_indicator=add_missing_indicators)
    X_imp = imputer.fit_transform(X)
    feature_names = list(feature_cols)
    if imputer.indicator_ is not None:
        for idx in imputer.indicator_.features_:
            feature_names.append(f"{feature_cols[idx]}_missing")
    scaler = None
    if scale:
        scaler = StandardScaler()
        X_imp = scaler.fit_transform(X_imp)
    return X_imp, imputer, scaler, feature_names


def transform_matrix(df, feature_cols, imputer, scaler):
    X_imp = imputer.transform(select_numeric(df, feature_cols))
    return scaler.transform(X_imp) if scaler is not None else X_imp


def get_lgbm(seed: int, num_threads: int, logger):
    try:
        from lightgbm import LGBMClassifier  # pragma: no cover

        return LGBMClassifier(
            n_estimators=300, learning_rate=0.05, num_leaves=31, subsample=0.9,
            colsample_bytree=0.9, num_threads=num_threads, force_col_wise=True,
            random_state=seed, class_weight="balanced",
        )
    except Exception as exc:
        logger.warning("LightGBM not available (%s); falling back to HistGradientBoosting", exc)
        from sklearn.ensemble import HistGradientBoostingClassifier

        return HistGradientBoostingClassifier(random_state=seed)


def compute_univariate_auc(df, y, feature_cols, top_k: int = 20):
    """One device program: lax.map of the sort-based AUC over columns."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.ops.metrics import roc_auc

    X = select_numeric(df, feature_cols)
    X_filled = X.fillna(X.median()).to_numpy(np.float32)
    valid = [i for i in range(X_filled.shape[1]) if np.isfinite(X_filled[:, i]).all()]
    if not valid:
        return []
    cols_mat = jnp.asarray(X_filled[:, valid].T)  # [F, N]
    y_arr = jnp.asarray(np.asarray(y, np.float32))
    aucs = jax.jit(lambda m: jax.lax.map(lambda col: roc_auc(y_arr, col), m))(cols_mat)
    aucs = np.asarray(aucs)
    scores = [(feature_cols[valid[i]], float(aucs[i])) for i in range(len(valid))]
    return sorted(scores, key=lambda t: abs(t[1] - 0.5), reverse=True)[:top_k]


def permutation_test(df, feature_cols, num_threads: int, repeats: int = 5):
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
        clf = LogisticRegression(max_iter=2000, class_weight="balanced")
        clf.fit(X_train, y_train)
        auc = roc_auc_score(y_test, clf.predict_proba(X_test)[:, 1])
        results.append({"repeat": i + 1, "roc_auc": auc})
    return results


def run_suite(df, out_dir: Path, seed=42, num_threads=2, limit=None,
              no_plot=False, no_missing_indicators=False, logger=None):
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import StratifiedKFold

    from pd_fusion.utils.metrics import compute_metrics

    logger = logger or setup_logging(out_dir)
    df = df.dropna(subset=["label"]).copy()
    logger.info("Label prevalence (positive class=1): %.4f", float(df["label"].mean()))
    if limit:
        df = df.sample(n=min(limit, len(df)), random_state=seed)

    cache: Dict[str, List[str]] = {}
    kept_dropped = {}
    for setting in SETTINGS:
        cols = apply_setting(df, setting, cache)
        dropped = [] if setting == "full_clinical" else [
            c for c in cache["full_clinical"] if c not in cols
        ]
        kept_dropped[setting] = {"kept": cols, "dropped": dropped}
    (out_dir / "kept_dropped_columns.json").write_text(json.dumps(kept_dropped, indent=2))

    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=seed)
    per_fold_rows, feature_rows, univariate_rows = [], [], []

    for setting in SETTINGS:
        feature_cols = kept_dropped[setting]["kept"]
        if not feature_cols:
            logger.warning("No features for setting %s", setting)
            continue

        for feat, auc in compute_univariate_auc(df, df["label"].values, feature_cols):
            univariate_rows.append({"setting": setting, "feature": feat, "auc": auc})

        for fold, (train_idx, test_idx) in enumerate(skf.split(df, df["label"].values), start=1):
            train_df, test_df = df.iloc[train_idx], df.iloc[test_idx]
            y_train, y_test = train_df["label"].values, test_df["label"].values

            X_train, imputer, scaler, feat_names = prepare_matrices(
                train_df, feature_cols, scale=True,
                add_missing_indicators=not no_missing_indicators,
            )
            X_test = transform_matrix(test_df, feature_cols, imputer, scaler)

            for model_name in MODELS:
                if model_name == "logreg":
                    clf = LogisticRegression(max_iter=2000, class_weight="balanced")
                else:
                    clf = get_lgbm(seed + fold, num_threads, logger)
                clf.fit(X_train, y_train)
                y_prob = (
                    clf.predict_proba(X_test)[:, 1]
                    if hasattr(clf, "predict_proba")
                    else clf.predict(X_test)
                )
                per_fold_rows.append(
                    {"setting": setting, "model": model_name, "fold": fold,
                     "prevalence": float(np.mean(y_test)), **compute_metrics(y_test, y_prob)}
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
                             "feature": name, "importance": float(val)}
                        )

    per_fold_df = pd.DataFrame(per_fold_rows)
    per_fold_df.to_csv(out_dir / "per_fold_metrics.csv", index=False)

    summary = per_fold_df.groupby(["setting", "model"]).agg(["mean", "std"]).reset_index()
    summary.columns = [
        "_".join([c for c in col if c]) if isinstance(col, tuple) else col
        for col in summary.columns
    ]
    counts = per_fold_df.groupby(["setting", "model"]).size().reset_index(name="fold_count")
    summary = summary.merge(counts, on=["setting", "model"], how="left")
    summary.to_csv(out_dir / "summary_mean.csv", index=False)

    feat_df = pd.DataFrame(feature_rows)
    if not feat_df.empty:
        feat_summary = (
            feat_df.groupby(["setting", "model", "feature"])["importance"].mean().reset_index()
        )
        feat_summary = feat_summary.sort_values(
            ["setting", "model", "importance"], ascending=[True, True, False]
        )
        feat_summary.groupby(["setting", "model"]).head(20).to_csv(
            out_dir / "feature_importance.csv", index=False
        )

    pd.DataFrame(univariate_rows).to_csv(out_dir / "univariate_top.csv", index=False)

    perm_rows = []
    for setting in ("full_clinical", "fusion_nonmotor_imaging"):
        cols = kept_dropped[setting]["kept"]
        if cols:
            for row in permutation_test(df, cols, num_threads, repeats=5):
                perm_rows.append({**row, "setting": setting})
    pd.DataFrame(perm_rows).to_csv(out_dir / "permutation_test.csv", index=False)

    if not no_plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plot_df = summary.sort_values("roc_auc_mean", ascending=False)
            best_df = plot_df.groupby("setting", as_index=False).first()
            fig, ax = plt.subplots(figsize=(10, 5))
            ax.bar(best_df["setting"], best_df["roc_auc_mean"],
                   yerr=best_df["roc_auc_std"], capsize=4)
            ax.set_ylabel("ROC-AUC")
            ax.set_title("PPMI meaningful baselines")
            ax.set_ylim(0, 1.0)
            plt.xticks(rotation=30, ha="right")
            fig.tight_layout()
            fig.savefig(out_dir / "roc_auc_bar.png", dpi=200)
            plt.close(fig)
        except Exception as exc:  # pragma: no cover
            logger.warning("Plot generation failed: %s", exc)

    logger.info("Saved summary to %s", out_dir / "summary_mean.csv")
    return per_fold_df


def main():
    parser = argparse.ArgumentParser(description="PPMI meaningful baseline suite")
    parser.add_argument("--input-csv", default="data/processed/ppmi/ppmi_subject_baseline.csv")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num-threads", type=int, default=2)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--no-missing-indicators", action="store_true")
    args = parser.parse_args()

    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = Path(args.output_dir or f"runs/ppmi_meaningful_suite_{timestamp}")
    logger = setup_logging(out_dir)
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(args.num_threads)
    mpl_cache = out_dir / "mpl_cache"
    mpl_cache.mkdir(parents=True, exist_ok=True)
    os.environ["MPLCONFIGDIR"] = str(mpl_cache)

    df = pd.read_csv(args.input_csv, low_memory=False)
    if "subject_id" in df.columns:
        df["subject_id"] = df["subject_id"].astype(str)
    run_suite(
        df, out_dir, seed=args.seed, num_threads=args.num_threads, limit=args.limit,
        no_plot=args.no_plot, no_missing_indicators=args.no_missing_indicators, logger=logger,
    )


if __name__ == "__main__":
    main()
