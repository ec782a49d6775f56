#!/usr/bin/env python
"""Summarize a ppmi_train_tabular run: groupby mean/std + ROC-AUC ranking
table (reference: scripts/ppmi_eval_report.py:46-64)."""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import pandas as pd
import yaml


def setup_logging(out_dir: Path) -> logging.Logger:
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("ppmi_report")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s %(message)s")
        for handler in (logging.StreamHandler(), logging.FileHandler(out_dir / "ppmi_eval_report.log")):
            handler.setFormatter(fmt)
            logger.addHandler(handler)
    return logger


def main() -> None:
    parser = argparse.ArgumentParser(description="Generate PPMI tabular report")
    parser.add_argument("--config", required=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--out_dir", required=True, help="Run directory with results_all.csv")
    args = parser.parse_args()

    with open(args.config) as f:
        yaml.safe_load(f)  # validated for parity; report derives from results_all.csv
    out_dir = Path(args.out_dir)
    logger = setup_logging(out_dir)

    results_path = out_dir / "results_all.csv"
    if not results_path.exists():
        raise FileNotFoundError(f"Missing {results_path}")

    df = pd.read_csv(results_path)
    if args.seed is not None:
        df = df[df["seed"] == args.seed]

    summary = df.groupby(["model", "ablation"]).agg(["mean", "std"]).reset_index()
    summary.columns = [
        "_".join([c for c in col if c]) if isinstance(col, tuple) else col
        for col in summary.columns
    ]
    summary.to_csv(out_dir / "summary_sweep_mean.csv", index=False)

    ranking = summary.sort_values("roc_auc_mean", ascending=False)
    ranking.to_csv(out_dir / "ranking_table.csv", index=False)

    logger.info("Saved summary to %s", out_dir / "summary_sweep_mean.csv")
    logger.info("Saved ranking to %s", out_dir / "ranking_table.csv")


if __name__ == "__main__":
    main()
