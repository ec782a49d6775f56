#!/usr/bin/env python
"""Thin CLI over the PPMI study-data builder (reference: scripts/
ppmi_build_dataset.py:31-51)."""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import yaml

from pd_fusion.data.ppmi_studydata import build_ppmi_datasets


def setup_logging(out_dir: Path) -> logging.Logger:
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("ppmi_build")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s %(message)s")
        for handler in (logging.StreamHandler(), logging.FileHandler(out_dir / "ppmi_build_dataset.log")):
            handler.setFormatter(fmt)
            logger.addHandler(handler)
    return logger


def main() -> None:
    parser = argparse.ArgumentParser(description="Build PPMI study-data datasets")
    parser.add_argument("--config", required=True, help="Path to ppmi_studydata.yaml")
    parser.add_argument("--seed", type=int, default=None, help="Optional seed override")
    parser.add_argument("--out_dir", default=None, help="Override processed_ppmi_dir")
    args = parser.parse_args()

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    if args.out_dir:
        cfg["processed_ppmi_dir"] = args.out_dir
    if args.seed is not None:
        cfg.setdefault("splits", {})["seeds"] = [args.seed]

    logger = setup_logging(Path(cfg["processed_ppmi_dir"]))
    logger.info("Building PPMI datasets with config: %s", args.config)
    outputs = build_ppmi_datasets(cfg, logger)
    for key, path in outputs.items():
        logger.info("Saved %s -> %s", key, path)


if __name__ == "__main__":
    main()
