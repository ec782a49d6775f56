#!/usr/bin/env python
"""Build the processed PPMI study-data tables.

Behavioral spec (reference: scripts/ppmi_build_dataset.py:31-51): load
the study-data YAML config, apply optional ``--out_dir`` /``--seed``
overrides (a seed override pins the split-seed list to that one seed),
run the builder, and log each emitted artifact path.
"""
import argparse
from pathlib import Path

import yaml

from _cli_common import file_logger
from pd_fusion.data.ppmi_studydata import build_ppmi_datasets


def main() -> None:
    cli = argparse.ArgumentParser(description="Build PPMI study-data datasets")
    cli.add_argument("--config", required=True, help="Path to ppmi_studydata.yaml")
    cli.add_argument("--seed", type=int, default=None, help="Optional seed override")
    cli.add_argument("--out_dir", default=None, help="Override processed_ppmi_dir")
    args = cli.parse_args()

    cfg = yaml.safe_load(Path(args.config).read_text())
    if args.out_dir:
        cfg["processed_ppmi_dir"] = args.out_dir
    if args.seed is not None:
        cfg.setdefault("splits", {})["seeds"] = [args.seed]

    logger = file_logger(
        "ppmi_build", Path(cfg["processed_ppmi_dir"]), "ppmi_build_dataset.log"
    )
    logger.info("Building PPMI datasets with config: %s", args.config)
    for key, path in build_ppmi_datasets(cfg, logger).items():
        logger.info("Saved %s -> %s", key, path)


if __name__ == "__main__":
    main()
