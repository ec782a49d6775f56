"""Bootstrap confidence intervals over pooled fold predictions.

Reference semantics (analysis/bootstrap_ci.py:20-83): concatenate
``preds_fold_*_full_observation.csv`` across folds per model, optionally
collapse to group means, resample n=1000 times, report 2.5/97.5
percentiles per metric.

TPU design: the reference computes 1000 sklearn metric sets in a Python
loop; here the resampled index matrix [n_boot, N] gathers on device and
ALL resamples' metrics come from one jitted lax.map over
ops.metrics.binary_metrics — typically >100x faster.
"""
import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import yaml


def _model_name(run_dir: Path) -> str:
    cfg = run_dir / "resolved_config.yaml"
    if cfg.exists():
        conf = yaml.safe_load(open(cfg))
        model_type = conf.get("model_type")
        modality = conf.get("modality")
        if model_type == "unimodal_gbdt" and modality:
            return f"unimodal_{modality}"
        return model_type or run_dir.name
    parts = run_dir.name.split("_s")
    return parts[0] if len(parts) == 2 else run_dir.name


def bootstrap_metrics(y_true, y_prob, n: int = 1000, seed: int = 42):
    """Device bootstrap -> dict of metric -> [n] arrays.

    Uses ``lax.map`` over the resample axis: the metric program compiles
    ONCE (a wide vmap of sorts compiles pathologically slowly on some TPU
    toolchains) and the n resamples execute as one scanned device loop —
    still no host round-trips per resample."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.ops.metrics import binary_metrics

    rng = np.random.default_rng(seed)
    N = len(y_true)
    idx = rng.choice(np.arange(N), size=(n, N), replace=True)
    y_r = jnp.asarray(np.asarray(y_true, np.float32)[idx])
    p_r = jnp.asarray(np.asarray(y_prob, np.float32)[idx])

    @jax.jit
    def run(y_r, p_r):
        return jax.lax.map(lambda t: binary_metrics(t[0], t[1]), (y_r, p_r))

    out = run(y_r, p_r)
    return {k: np.asarray(v) for k, v in out.items()}


def run_bootstrap(sweep_dir: Path, n: int = 1000, group_col: str = ""):
    model_preds = {}
    for run_dir in sweep_dir.iterdir():
        if not run_dir.is_dir():
            continue
        pred_files = list(run_dir.glob("preds_fold_*_full_observation.csv"))
        if not pred_files:
            continue
        df_preds = pd.concat([pd.read_csv(f) for f in pred_files], ignore_index=True)
        model_preds.setdefault(_model_name(run_dir), []).append(df_preds)

    rows = []
    for model, dfs in model_preds.items():
        df = pd.concat(dfs, ignore_index=True)
        y_true, y_prob = df["y_true"].values, df["y_prob"].values
        if group_col and group_col in df.columns:
            g = df.groupby(group_col).agg({"y_true": "first", "y_prob": "mean"}).reset_index()
            y_true, y_prob = g["y_true"].values, g["y_prob"].values

        boot = bootstrap_metrics(y_true, y_prob, n=n)
        for metric, vals in boot.items():
            lo, hi = np.percentile(vals, [2.5, 97.5])
            rows.append(
                {"Model": model, "Metric": metric, "CI_low": float(lo), "CI_high": float(hi)}
            )

    out_path = sweep_dir / "summary_bootstrap_ci.csv"
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"Saved bootstrap CIs to {out_path}")
    return out_path


def main():
    parser = argparse.ArgumentParser(description="Bootstrap CIs from per-fold predictions")
    parser.add_argument("--sweep-dir", type=str, required=True)
    parser.add_argument("--n", type=int, default=1000)
    parser.add_argument("--group-col", type=str, default="")
    args = parser.parse_args()
    run_bootstrap(Path(args.sweep_dir), n=args.n, group_col=args.group_col)


if __name__ == "__main__":
    main()
