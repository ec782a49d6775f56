#!/usr/bin/env python
"""PPMI tabular baseline sweep: schema-group ablations x models x seeds
over saved splits (reference: scripts/ppmi_train_tabular.py).

Surface parity: same config keys (processed_ppmi_dir, modeling_level,
ablations, models, splits, mlp), same artifacts (config_resolved.yaml,
per-prediction CSVs ``pred_{model}_{ablation}_seed{seed}.csv``,
results_all.csv, summary_sweep_mean.csv, a run log), same sklearn
ColumnTransformer preprocessing (median impute WITH missing-indicator,
one-hot for categoricals), same model set {logreg, lgbm-with-fallbacks,
mlp}.

TPU-native difference: the MLP leg is the jitted JAX trainer
(nn.trainer.train_fullbatch_earlystop — pos-weighted BCE + on-device
best-val-AUC restore) instead of a torch epoch loop; metrics are the
fused XLA reduction. Thread pinning env vars are kept for the sklearn
legs.
"""
import argparse
import datetime
import json
import logging
import os
import sys
from pathlib import Path
from typing import Dict, List, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd

from pd_fusion.analysis.tabular import suite_logger

DEFAULT_MODELS = ["logreg", "lgbm", "mlp"]
DEFAULT_ABLATIONS = [
    {"name": "clinical_only", "groups": ["clinical"]},
    {"name": "mri_only", "groups": ["mri_derived"]},
    {"name": "datsbr_only", "groups": ["datsbr"]},
    {"name": "clinical_mri", "groups": ["clinical", "mri_derived"]},
    {"name": "clinical_datsbr", "groups": ["clinical", "datsbr"]},
    {"name": "full_fusion", "groups": ["clinical", "mri_derived", "datsbr", "nonmotor"]},
]


def setup_logging(out_dir: Path) -> logging.Logger:
    return suite_logger("ppmi_train", out_dir, "ppmi_train_tabular.log")


def build_preprocessor(scale: bool, numeric_cols, cat_cols, num_threads: int):
    from sklearn.compose import ColumnTransformer
    from sklearn.impute import SimpleImputer
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import OneHotEncoder, StandardScaler

    num_steps = [("imputer", SimpleImputer(strategy="median", add_indicator=True))]
    if scale:
        num_steps.append(("scaler", StandardScaler()))
    try:
        onehot = OneHotEncoder(handle_unknown="ignore", sparse_output=False)
    except TypeError:  # pragma: no cover - old sklearn
        onehot = OneHotEncoder(handle_unknown="ignore", sparse=False)
    cat_pipe = Pipeline(
        [("imputer", SimpleImputer(strategy="most_frequent")), ("onehot", onehot)]
    )
    return ColumnTransformer(
        [("num", Pipeline(num_steps), numeric_cols), ("cat", cat_pipe, cat_cols)],
        remainder="drop",
        n_jobs=num_threads,
    )


def get_tree_model(seed: int, logger, num_threads: int):
    """lgbm -> xgb -> HistGB fallback chain (reference :109-142)."""
    try:
        from lightgbm import LGBMClassifier  # pragma: no cover

        return LGBMClassifier(
            n_estimators=300, learning_rate=0.05, max_depth=-1, num_leaves=31,
            subsample=0.9, colsample_bytree=0.9, num_threads=num_threads,
            force_col_wise=True, random_state=seed, class_weight="balanced",
        )
    except Exception as exc:
        logger.warning("LightGBM not available: %s", exc)
    try:
        from xgboost import XGBClassifier  # pragma: no cover

        return XGBClassifier(
            n_estimators=300, learning_rate=0.05, max_depth=4, subsample=0.9,
            colsample_bytree=0.9, eval_metric="logloss", random_state=seed,
            n_jobs=num_threads,
        )
    except Exception as exc:
        logger.warning("XGBoost not available: %s", exc)
    from sklearn.ensemble import HistGradientBoostingClassifier

    return HistGradientBoostingClassifier(random_state=seed)


def train_mlp_jax(X_train, y_train, X_val, y_val, seed: int, cfg: Dict):
    """Jitted pos-weighted MLP with on-device early-stop restore."""
    import jax

    from pd_fusion.nn.mlp import mlp_init
    from pd_fusion.nn.trainer import predict_proba_jit, train_fullbatch_earlystop

    hidden = cfg.get("hidden_dims", [128, 64])
    params = mlp_init(jax.random.PRNGKey(seed), [X_train.shape[1], *hidden, 1])
    pos = float(y_train.sum())
    pos_weight = (len(y_train) - pos) / max(pos, 1.0)
    best = train_fullbatch_earlystop(
        params,
        np.asarray(X_train, np.float32),
        np.asarray(y_train, np.float32),
        np.asarray(X_val, np.float32),
        np.asarray(y_val, np.float32),
        jax.random.PRNGKey(seed + 1),
        float(cfg.get("lr", 1e-3)),
        np.float32(pos_weight),
        int(cfg.get("max_epochs", 100)),
        float(cfg.get("dropout", 0.3)),
        patience=int(cfg.get("patience", 10)),  # reference default
    )
    return lambda X: np.asarray(predict_proba_jit(best, np.asarray(X, np.float32)))


def run_suite(cfg: Dict, out_dir: Path, seeds=None, limit=None, num_threads: int = 2):
    from pd_fusion.data.ppmi_studydata import create_splits
    from pd_fusion.utils.metrics import compute_metrics

    logger = setup_logging(out_dir)
    import yaml

    (out_dir / "config_resolved.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))

    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(num_threads)

    processed_dir = Path(cfg["processed_ppmi_dir"])
    level = cfg.get("modeling_level", "baseline")
    dataset_path = processed_dir / (
        "ppmi_visit_level.csv" if level == "visit" else "ppmi_subject_baseline.csv"
    )
    df = pd.read_csv(dataset_path, low_memory=False)
    if "subject_id" in df.columns:
        df["subject_id"] = df["subject_id"].astype(str)
    schema = json.loads((processed_dir / "ppmi_feature_schema.json").read_text())

    if limit:
        df = df.sample(n=min(limit, len(df)), random_state=42)

    ablations = cfg.get("ablations", []) or DEFAULT_ABLATIONS
    models = cfg.get("models", DEFAULT_MODELS)
    split_cfg = cfg.get("splits", {})
    if seeds is None:
        seeds = split_cfg.get("seeds", [42, 43, 44, 45, 46])

    results = []
    for seed in seeds:
        split_path = processed_dir / f"ppmi_splits_seed{seed}.json"
        if split_path.exists():
            split_ids = {
                k: [str(v) for v in ids]
                for k, ids in json.loads(split_path.read_text()).items()
            }
        else:
            labels = df.set_index("subject_id")["label"]
            split_ids = create_splits(labels, [seed], split_cfg)[seed]

        parts = {
            name: df[df["subject_id"].isin(split_ids[name])].copy()
            for name in ("train", "val", "test")
        }
        if any(p.empty for p in parts.values()):
            logger.warning("Empty split for seed %s; check subject_id types.", seed)
            continue
        train_df, val_df, test_df = parts["train"], parts["val"], parts["test"]

        for ablation in ablations:
            feat_cols = []
            for group in ablation["groups"]:
                feat_cols.extend(schema["groups"].get(group, {}).get("features", []))
            feat_cols = [c for c in feat_cols if c in df.columns]
            if not feat_cols:
                logger.warning("No features found for ablation %s", ablation["name"])
                continue

            y_train = train_df["label"].to_numpy()
            y_val = val_df["label"].to_numpy()
            y_test = test_df["label"].to_numpy()
            numeric_cols = [c for c in feat_cols if pd.api.types.is_numeric_dtype(df[c])]
            cat_cols = [c for c in feat_cols if c not in numeric_cols]

            for model_name in models:
                scale = model_name in ("logreg", "mlp")
                pre = build_preprocessor(scale, numeric_cols, cat_cols, num_threads)
                X_tr = pre.fit_transform(train_df[feat_cols])
                X_va = pre.transform(val_df[feat_cols])
                X_te = pre.transform(test_df[feat_cols])

                if model_name == "logreg":
                    from sklearn.linear_model import LogisticRegression

                    # n_jobs is a no-op (and deprecated) on LogisticRegression
                    # since sklearn 1.8; thread pinning happens via env vars
                    clf = LogisticRegression(max_iter=1000, class_weight="balanced")
                    clf.fit(X_tr, y_train)
                    y_prob = clf.predict_proba(X_te)[:, 1]
                elif model_name == "lgbm":
                    clf = get_tree_model(seed, logger, num_threads)
                    clf.fit(X_tr, y_train)
                    y_prob = (
                        clf.predict_proba(X_te)[:, 1]
                        if hasattr(clf, "predict_proba")
                        else clf.predict(X_te)
                    )
                elif model_name == "mlp":
                    predict = train_mlp_jax(X_tr, y_train, X_va, y_val, seed, cfg.get("mlp", {}))
                    y_prob = predict(X_te)
                else:
                    logger.warning("Unknown model %s", model_name)
                    continue

                try:
                    metrics = compute_metrics(y_test, y_prob)
                except ValueError as exc:
                    logger.warning(
                        "Metric computation failed for %s/%s/%s: %s",
                        model_name, ablation["name"], seed, exc,
                    )
                    metrics = {k: float("nan") for k in
                               ("roc_auc", "pr_auc", "balanced_accuracy", "f1",
                                "brier_score", "ece")}

                results.append(
                    {"seed": seed, "ablation": ablation["name"], "model": model_name, **metrics}
                )
                pd.DataFrame(
                    {
                        "subject_id": test_df["subject_id"].values,
                        "y_true": y_test,
                        "y_prob": y_prob,
                    }
                ).to_csv(
                    out_dir / f"pred_{model_name}_{ablation['name']}_seed{seed}.csv", index=False
                )

    results_df = pd.DataFrame(results)
    results_df.to_csv(out_dir / "results_all.csv", index=False)

    summary = results_df.groupby(["model", "ablation"]).agg(["mean", "std"]).reset_index()
    summary.columns = [
        "_".join([c for c in col if c]) if isinstance(col, tuple) else col
        for col in summary.columns
    ]
    summary.to_csv(out_dir / "summary_sweep_mean.csv", index=False)
    logger.info("Saved results to %s", out_dir / "results_all.csv")
    return results_df


def main():
    parser = argparse.ArgumentParser(description="Train PPMI tabular baselines")
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--num-threads", type=int, default=2)
    parser.add_argument("--limit", type=int, default=None, help="Optional limit for smoke tests")
    args = parser.parse_args()

    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = Path(args.out_dir or f"runs/ppmi_tabular_{timestamp}")
    seeds = [args.seed] if args.seed is not None else None
    run_suite(cfg, out_dir, seeds=seeds, limit=args.limit, num_threads=args.num_threads)


if __name__ == "__main__":
    main()
