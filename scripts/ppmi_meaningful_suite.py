#!/usr/bin/env python
"""PPMI "meaningful baselines" suite.

Behavioral spec (reference scripts/ppmi_meaningful_suite.py): six
regex-defined feature settings (full_clinical / no_motor_exam /
non_motor_only / datsbr_only / freesurfer_only / fusion union) x
{logreg, lgbm-fallback} x 5-fold stratified CV, writing
kept_dropped_columns.json, per_fold_metrics.csv, summary_mean.csv,
top-20 feature_importance.csv, univariate_top.csv, permutation_test.csv
and the ROC-AUC bar plot. The regex tables below ARE that spec.

TPU-native build: every screening computation is a fused device program
from pd_fusion.analysis.tabular — univariate AUCs as one lax.map over
the column matrix, the permutation test as one vmapped linear-probe
training over all repeats — and fold metrics use the fused XLA metric
reduction. Only the per-fold sklearn classifier fits stay on host.
"""
import argparse
import datetime
import json
import os
import sys
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd

from pd_fusion.analysis.tabular import (
    balanced_logreg,
    boosted_tree,
    grep_columns,
    numeric_feature_columns,
    permutation_screen,
    rank_univariate_auc,
    suite_logger,
    TabularPrep,
)

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


def resolve_settings(df: pd.DataFrame) -> Dict[str, List[str]]:
    """Materialize every setting's column list in one pass. The union
    setting draws from already-resolved sources, so resolution order
    follows the table order (sources precede their union)."""
    base = numeric_feature_columns(df, GLOBAL_EXCLUDE_REGEX, ID_COLS)
    resolved: Dict[str, List[str]] = {}
    for name, spec in SETTINGS.items():
        kind = spec["type"]
        if kind == "all_numeric":
            resolved[name] = base
        elif kind == "drop_regex":
            resolved[name] = grep_columns(base, deny=spec["drop_regex"])
        elif kind == "allow_regex":
            resolved[name] = grep_columns(base, allow=spec["allow_regex"])
        elif kind == "union":
            merged = {c for src in spec["sources"] for c in resolved[src]}
            resolved[name] = sorted(merged)
        else:
            resolved[name] = []
    return resolved


def extract_importance(clf, model_name: str):
    """|coef| for linear probes, native importances for trees."""
    if model_name == "logreg" and hasattr(clf, "coef_"):
        return np.abs(np.ravel(clf.coef_))
    if hasattr(clf, "feature_importances_"):
        return np.asarray(clf.feature_importances_, float)
    return None


def summarize_folds(per_fold_df: pd.DataFrame) -> pd.DataFrame:
    """Mean/std per (setting, model) with flattened column names plus a
    fold_count column."""
    agg = per_fold_df.groupby(["setting", "model"]).agg(["mean", "std"]).reset_index()
    agg.columns = [
        "_".join(filter(None, c)) if isinstance(c, tuple) else c for c in agg.columns
    ]
    sizes = per_fold_df.groupby(["setting", "model"]).size().reset_index(name="fold_count")
    return agg.merge(sizes, on=["setting", "model"], how="left")


def bar_plot(summary: pd.DataFrame, out_path: Path, title: str, logger) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        best = (
            summary.sort_values("roc_auc_mean", ascending=False)
            .groupby("setting", as_index=False)
            .first()
        )
        fig, ax = plt.subplots(figsize=(10, 5))
        ax.bar(best["setting"], best["roc_auc_mean"], yerr=best["roc_auc_std"], capsize=4)
        ax.set(ylabel="ROC-AUC", title=title, ylim=(0, 1.0))
        plt.xticks(rotation=30, ha="right")
        fig.tight_layout()
        fig.savefig(out_path, dpi=200)
        plt.close(fig)
    except Exception as exc:  # pragma: no cover - headless matplotlib is in-image
        logger.warning("plot skipped: %s", exc)


def run_suite(df, out_dir: Path, seed=42, num_threads=2, limit=None,
              no_plot=False, no_missing_indicators=False, logger=None):
    from sklearn.model_selection import StratifiedKFold

    from pd_fusion.utils.metrics import compute_metrics

    out_dir = Path(out_dir)
    logger = logger or suite_logger("ppmi_suite", out_dir, "ppmi_meaningful_suite.log")
    df = df.dropna(subset=["label"]).copy()
    logger.info("Label prevalence (positive class=1): %.4f", float(df["label"].mean()))
    if limit:
        df = df.sample(n=min(limit, len(df)), random_state=seed)
    labels = df["label"].values

    columns_by_setting = resolve_settings(df)
    full_set = columns_by_setting["full_clinical"]
    (out_dir / "kept_dropped_columns.json").write_text(json.dumps(
        {
            name: {
                "kept": cols,
                "dropped": [] if name == "full_clinical"
                else [c for c in full_set if c not in cols],
            }
            for name, cols in columns_by_setting.items()
        },
        indent=2,
    ))

    folds = list(
        StratifiedKFold(n_splits=5, shuffle=True, random_state=seed).split(df, labels)
    )
    fold_rows: List[dict] = []
    importance_rows: List[dict] = []
    screening_rows: List[dict] = []

    for setting, feature_cols in columns_by_setting.items():
        if not feature_cols:
            logger.warning("setting %s resolved to zero features", setting)
            continue

        screening_rows.extend(
            {"setting": setting, "feature": feat, "auc": auc}
            for feat, auc in rank_univariate_auc(df, labels, feature_cols)
        )

        for fold, (tr, te) in enumerate(folds, start=1):
            train_df, test_df = df.iloc[tr], df.iloc[te]
            prep = TabularPrep(scale=True, add_indicators=not no_missing_indicators)
            X_train = prep.fit_transform(train_df, feature_cols)
            X_test = prep.transform(test_df)
            y_test = test_df["label"].values

            for model_name in MODELS:
                clf = (
                    balanced_logreg() if model_name == "logreg"
                    else boosted_tree(seed + fold, num_threads, logger)
                )
                clf.fit(X_train, train_df["label"].values)
                prob = (
                    clf.predict_proba(X_test)[:, 1]
                    if hasattr(clf, "predict_proba") else clf.predict(X_test)
                )
                fold_rows.append({
                    "setting": setting, "model": model_name, "fold": fold,
                    "prevalence": float(np.mean(y_test)),
                    **compute_metrics(y_test, prob),
                })
                imp = extract_importance(clf, model_name)
                if imp is not None:
                    importance_rows.extend(
                        {"setting": setting, "model": model_name, "fold": fold,
                         "feature": nm, "importance": float(v)}
                        for nm, v in zip(prep.feature_names, imp)
                    )

    per_fold_df = pd.DataFrame(fold_rows)
    per_fold_df.to_csv(out_dir / "per_fold_metrics.csv", index=False)
    summary = summarize_folds(per_fold_df)
    summary.to_csv(out_dir / "summary_mean.csv", index=False)

    imp_df = pd.DataFrame(importance_rows)
    if not imp_df.empty:
        (
            imp_df.groupby(["setting", "model", "feature"])["importance"].mean()
            .reset_index()
            .sort_values(["setting", "model", "importance"], ascending=[True, True, False])
            .groupby(["setting", "model"]).head(20)
        ).to_csv(out_dir / "feature_importance.csv", index=False)

    pd.DataFrame(screening_rows).to_csv(out_dir / "univariate_top.csv", index=False)

    perm_rows = [
        {**row, "setting": setting}
        for setting in ("full_clinical", "fusion_nonmotor_imaging")
        if columns_by_setting.get(setting)
        for row in permutation_screen(df, columns_by_setting[setting], repeats=5)
    ]
    pd.DataFrame(perm_rows).to_csv(out_dir / "permutation_test.csv", index=False)

    if not no_plot:
        bar_plot(summary, out_dir / "roc_auc_bar.png", "PPMI meaningful baselines", logger)

    logger.info("summary written: %s", out_dir / "summary_mean.csv")
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

    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = Path(args.output_dir or f"runs/ppmi_meaningful_suite_{stamp}")
    logger = suite_logger("ppmi_suite", out_dir, "ppmi_meaningful_suite.log")
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
