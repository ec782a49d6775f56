#!/usr/bin/env python
"""Two-modality stress test: non-motor clinical vs imaging under
full / missing_clinical / missing_imaging (reference: scripts/
ppmi_stress_test.py). LGBM-chain baseline vs a mask-vector-augmented
ModDrop MLP with PER-SAMPLE Bernoulli modality keeps (note: the flagship
fusion_moddrop drops per-batch; this suite's variant is per-sample —
SURVEY §7 hard-parts — and both semantics are implemented faithfully).

TPU design: the ModDrop-MLP training (all epochs x minibatches, with the
per-sample keep draws and the mask-vector concat fused into the forward)
is one lax.scan XLA program; metrics are the fused device reduction.
"""
import argparse
import datetime
import logging
import os
import sys
from functools import partial
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd

from pd_fusion.analysis.tabular import coerce_numeric, grep_columns, suite_logger

ID_COLS = {"subject_id", "visit_id", "visit_month", "date"}
GLOBAL_EXCLUDE = [
    r"^.*date.*$", r"^.*time.*$", r"^.*event.*$", r"^.*protocol.*$", r"^.*dose.*$",
    r"^.*site.*$", r"^.*center.*$", r"^.*scanner.*$", r"^.*acq.*$", r"^.*acquisition.*$",
    r"^.*series.*$", r"^.*version.*$", r"^.*reason.*$", r"^.*not_analyzed.*$",
    r"^.*notanalyzed.*$",
]
NONMOTOR_PATTERNS = [
    r"moca", r"cognition", r"sleep", r"epworth", r"rbd", r"rem", r"depress", r"gds",
    r"bdi", r"anxiety", r"stai", r"mood", r"upsit", r"smell", r"autonomic",
]
DATSBR_PATTERNS = [r"datscan", r"sbr", r"putamen", r"caudate", r"striat", r"asym"]
MRI_PATTERNS = [
    r"mri_derived__", r"thickness", r"cortical", r"volume", r"area", r"aseg", r"hippo",
    r"entorhinal", r"amygdala", r"caudate", r"putamen", r"pallid", r"thalam", r"accumbens",
]


def setup_logging(out_dir: Path) -> logging.Logger:
    return suite_logger("ppmi_stress", out_dir, "ppmi_stress_test.log")


def filter_cols(cols, patterns):
    return grep_columns(cols, allow=patterns)


def exclude_cols(cols, patterns):
    return grep_columns(cols, deny=patterns)


select_numeric = coerce_numeric


def build_groups(df: pd.DataFrame) -> Dict[str, List[str]]:
    cols = exclude_cols([c for c in df.columns if c not in ID_COLS and c != "label"],
                        GLOBAL_EXCLUDE)
    num_df = select_numeric(df, cols)
    all_cols = [c for c in num_df.columns if num_df[c].notna().any()]
    nonmotor = filter_cols(all_cols, NONMOTOR_PATTERNS)
    datsbr = filter_cols(all_cols, DATSBR_PATTERNS)
    mri = filter_cols(all_cols, MRI_PATTERNS)
    imaging = sorted(set(datsbr + mri))
    return {
        "clinical": nonmotor,
        "imaging": imaging,
        "full": sorted(set(nonmotor + imaging)),
        "datsbr": datsbr,
        "mri": mri,
    }


# ---------------------------------------------------------------------------
# per-sample ModDrop MLP (jitted end-to-end)
# ---------------------------------------------------------------------------


def _make_group_onehots(n_features, group_idx):
    clin = np.zeros(n_features, np.float32)
    clin[group_idx["clinical"]] = 1.0
    img = np.zeros(n_features, np.float32)
    img[group_idx["imaging"]] = 1.0
    return clin, img


def train_moddrop_mlp_jax(X_train, y_train, group_idx, moddrop_prob, epochs, batch_size, lr, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from pd_fusion.nn.mlp import bce_with_logits, mlp_apply, mlp_init

    n, F = X_train.shape
    clin_mask, img_mask = _make_group_onehots(F, group_idx)
    params = mlp_init(jax.random.PRNGKey(seed), [F + 2, 128, 64, 1])
    batch_size = min(batch_size, n)
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    tx = optax.adam(lr)

    @partial(jax.jit, static_argnames=("epochs",))
    def run(params, X, y, key, epochs):
        opt_state = tx.init(params)

        def batch_loss(p, Xb, yb, wb, keep, dk):
            # per-sample keep [bs, 2] applied to group blocks + mask concat
            feat_keep = (
                1.0
                - jnp.outer(1.0 - keep[:, 0], clin_mask)
                - jnp.outer(1.0 - keep[:, 1], img_mask)
            )
            Xin = jnp.concatenate([Xb * feat_keep, keep], axis=1)
            logits = mlp_apply(p, Xin, dropout_rate=0.2, dropout_key=dk)
            return bce_with_logits(logits, yb, wb)

        def epoch_step(carry, ek):
            p, s = carry
            pk, ek = jax.random.split(ek)
            perm = jax.random.permutation(pk, n)
            idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(n_batches, batch_size)
            wpad = jnp.concatenate([jnp.ones((n,)), jnp.zeros((pad,))]).reshape(n_batches, batch_size)
            bkeys = jax.random.split(ek, n_batches)

            def batch_step(c, inp):
                p, s = c
                bidx, bw, bk = inp
                mk, dk = jax.random.split(bk)
                keep = (jax.random.uniform(mk, (batch_size, 2)) > moddrop_prob).astype(jnp.float32)
                grads = jax.grad(batch_loss)(p, X[bidx], y[bidx], bw, keep, dk)
                updates, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), None

            (p, s), _ = jax.lax.scan(batch_step, (p, s), (idx, wpad, bkeys))
            return (p, s), None

        (p, _), _ = jax.lax.scan(epoch_step, (params, opt_state), jax.random.split(key, epochs))
        return p

    trained = run(
        params,
        jnp.asarray(X_train, jnp.float32),
        jnp.asarray(y_train, jnp.float32),
        jax.random.PRNGKey(seed + 1),
        epochs,
    )

    def predict(X, drop):
        keep_vec = np.array(
            [0.0 if drop.get("clinical") else 1.0, 0.0 if drop.get("imaging") else 1.0],
            np.float32,
        )
        Xm = mask_features(np.asarray(X, np.float32), group_idx, drop)
        Xin = np.concatenate([Xm, np.tile(keep_vec, (len(Xm), 1))], axis=1)
        return np.asarray(jax.nn.sigmoid(mlp_apply(trained, jnp.asarray(Xin))))

    return predict


def mask_features(X, group_idx, drop):
    X_masked = X.copy()
    for name, idxs in group_idx.items():
        if drop.get(name, False) and len(idxs):
            X_masked[:, idxs] = 0.0
    return X_masked


def get_tree_model(num_threads: int, seed: int):
    try:
        from lightgbm import LGBMClassifier  # pragma: no cover

        return LGBMClassifier(
            n_estimators=300, learning_rate=0.05, num_leaves=31, subsample=0.9,
            colsample_bytree=0.9, num_threads=num_threads, force_col_wise=True,
            random_state=seed, class_weight="balanced",
        )
    except Exception:
        from sklearn.ensemble import HistGradientBoostingClassifier

        return HistGradientBoostingClassifier(random_state=seed)


def run_stress_test(df, out_dir: Path, folds=5, seed=42, epochs=30, batch_size=128,
                    moddrop_prob=0.3, num_threads=2, logger=None):
    from sklearn.impute import SimpleImputer
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler

    from pd_fusion.utils.metrics import compute_metrics

    logger = logger or logging.getLogger("ppmi_stress")
    df = df.dropna(subset=["label"]).copy()
    groups = build_groups(df)
    if not groups["clinical"] or not groups["imaging"]:
        raise ValueError("Need both clinical (non-motor) and imaging features for stress test")

    feature_cols = groups["full"]
    X = select_numeric(df, feature_cols)
    X_scaled = StandardScaler().fit_transform(
        SimpleImputer(strategy="median").fit_transform(X)
    )
    col_index = {c: i for i, c in enumerate(feature_cols)}
    group_idx = {
        "clinical": [col_index[c] for c in groups["clinical"] if c in col_index],
        "imaging": [col_index[c] for c in groups["imaging"] if c in col_index],
    }
    y = df["label"].values.astype(int)

    scenarios = {
        "full": {"clinical": False, "imaging": False},
        "missing_clinical": {"clinical": True, "imaging": False},
        "missing_imaging": {"clinical": False, "imaging": True},
    }

    skf = StratifiedKFold(n_splits=folds, shuffle=True, random_state=seed)
    rows = []
    for fold, (train_idx, test_idx) in enumerate(skf.split(X_scaled, y), start=1):
        X_train, X_test = X_scaled[train_idx], X_scaled[test_idx]
        y_train, y_test = y[train_idx], y[test_idx]

        tree = get_tree_model(num_threads, seed + fold)
        tree.fit(X_train, y_train)
        predict_mod = train_moddrop_mlp_jax(
            X_train, y_train, group_idx, moddrop_prob, epochs, batch_size, 1e-3, seed + fold
        )

        for scen_name, drop in scenarios.items():
            X_test_masked = mask_features(X_test, group_idx, drop)
            p_tree = (
                tree.predict_proba(X_test_masked)[:, 1]
                if hasattr(tree, "predict_proba")
                else tree.predict(X_test_masked)
            )
            rows.append({"model": "lgbm", "scenario": scen_name, "fold": fold,
                         **compute_metrics(y_test, p_tree)})
            rows.append({"model": "moddrop_mlp", "scenario": scen_name, "fold": fold,
                         **compute_metrics(y_test, predict_mod(X_test, drop))})

    out_df = pd.DataFrame(rows)
    out_df.to_csv(out_dir / "stress_test_per_fold.csv", index=False)
    summary = out_df.groupby(["model", "scenario"]).agg(["mean", "std"]).reset_index()
    summary.columns = [
        "_".join([c for c in col if c]) if isinstance(col, tuple) else col
        for col in summary.columns
    ]
    summary.to_csv(out_dir / "stress_test_summary.csv", index=False)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        for i, model in enumerate(summary["model"].unique()):
            subset = summary[summary["model"] == model]
            ax.bar(
                np.arange(len(subset)) + i * 0.35,
                subset["roc_auc_mean"],
                yerr=subset["roc_auc_std"],
                width=0.35,
                label=model,
                capsize=3,
            )
        ax.set_xticks(np.arange(len(subset)) + 0.35 / 2)
        ax.set_xticklabels(subset["scenario"], rotation=20, ha="right")
        ax.set_ylabel("ROC-AUC")
        ax.set_title("Stress test: clinical/imaging missingness")
        ax.set_ylim(0, 1.0)
        ax.legend()
        fig.tight_layout()
        fig.savefig(out_dir / "stress_test_roc_auc.png", dpi=300)
        fig.savefig(out_dir / "stress_test_roc_auc.pdf")
        plt.close(fig)
    except Exception as exc:  # pragma: no cover
        logger.warning("Plot generation failed: %s", exc)

    logger.info("Saved stress test summary to %s", out_dir / "stress_test_summary.csv")
    return out_df


def main():
    parser = argparse.ArgumentParser(description="PPMI stress test for missing clinical data")
    parser.add_argument("--input-csv", default="data/processed/ppmi/ppmi_subject_baseline.csv")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--num-threads", type=int, default=2)
    parser.add_argument("--folds", type=int, default=5)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--moddrop-prob", type=float, default=0.3)
    args = parser.parse_args()

    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    out_dir = Path(args.output_dir or f"runs/ppmi_stress_test_{timestamp}")
    logger = setup_logging(out_dir)
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(args.num_threads)

    df = pd.read_csv(args.input_csv, low_memory=False)
    run_stress_test(
        df, out_dir, folds=args.folds, seed=args.seed, epochs=args.epochs,
        batch_size=args.batch_size, moddrop_prob=args.moddrop_prob,
        num_threads=args.num_threads, logger=logger,
    )


if __name__ == "__main__":
    main()
