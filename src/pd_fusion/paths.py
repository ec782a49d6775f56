"""Repository path constants.

Same directory layout and names the reference exposes (reference:
src/pd_fusion/paths.py:4-16) — downstream modules import these constants
directly, so the public surface is fixed; only the dev-data root honors
an environment override (``PD_FUSION_DEV_DATA_DIR``).
"""
import os
from pathlib import Path

ROOT_DIR = Path(__file__).resolve().parents[2]
SRC_DIR = ROOT_DIR / "src" / "pd_fusion"

DATA_DIR = ROOT_DIR / "data"
RAW_DATA_DIR = DATA_DIR / "raw"
PROCESSED_DATA_DIR = DATA_DIR / "processed"
# Dev datasets (UCI / OpenNeuro downloads) may live outside the repo.
DEV_DATA_DIR = Path(os.environ.get("PD_FUSION_DEV_DATA_DIR") or DATA_DIR / "raw_dev")

RUNS_DIR = ROOT_DIR / "runs"
CONFIGS_DIR = ROOT_DIR / "configs"


def get_run_dir(run_id: str) -> Path:
    """Resolve (and create) the artifact directory for one run."""
    path = RUNS_DIR / run_id
    path.mkdir(parents=True, exist_ok=True)
    return path
