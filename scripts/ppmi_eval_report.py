#!/usr/bin/env python
"""PPMI tabular sweep report.

Behavioral spec (reference: scripts/ppmi_eval_report.py:46-64): read a
run directory's ``results_all.csv`` (one row per model x ablation x seed
x fold), optionally filter to one seed, aggregate mean/std per
(model, ablation) into ``summary_sweep_mean.csv``, and write the same
table sorted by mean ROC-AUC as ``ranking_table.csv``. Progress lines go
to stdout and ``ppmi_eval_report.log`` inside the run directory.
"""
import argparse
from pathlib import Path

import pandas as pd
import yaml

from _cli_common import file_logger

GROUP_KEYS = ["model", "ablation"]
RANK_METRIC = "roc_auc_mean"


def build_report(results: pd.DataFrame):
    """(summary, ranking): per-group mean/std with flattened column names."""
    agg = results.groupby(GROUP_KEYS).agg(["mean", "std"]).reset_index()
    flat = []
    for col in agg.columns:
        if isinstance(col, tuple):
            flat.append("_".join(part for part in col if part))
        else:  # pragma: no cover - plain Index
            flat.append(col)
    agg.columns = flat
    return agg, agg.sort_values(RANK_METRIC, ascending=False)


def main() -> None:
    cli = argparse.ArgumentParser(description="Generate PPMI tabular report")
    cli.add_argument("--config", required=True)
    cli.add_argument("--seed", type=int, default=None)
    cli.add_argument("--out_dir", required=True, help="Run directory with results_all.csv")
    args = cli.parse_args()

    # config is parsed for schema validation only; the report itself is
    # derived entirely from the run's results_all.csv
    yaml.safe_load(Path(args.config).read_text())

    out_dir = Path(args.out_dir)
    logger = file_logger("ppmi_report", out_dir, "ppmi_eval_report.log")

    source = out_dir / "results_all.csv"
    if not source.exists():
        raise FileNotFoundError(f"Missing {source}")
    results = pd.read_csv(source)
    if args.seed is not None:
        results = results[results["seed"] == args.seed]

    summary, ranking = build_report(results)
    for frame, fname in ((summary, "summary_sweep_mean.csv"),
                         (ranking, "ranking_table.csv")):
        frame.to_csv(out_dir / fname, index=False)
        logger.info("Saved %s to %s", fname.split("_")[0], out_dir / fname)


if __name__ == "__main__":
    main()
