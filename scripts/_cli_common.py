"""Shared helpers for the PPMI script suite CLIs.

Every suite script logs to stdout plus a per-run logfile inside its
output directory (reference scripts each inline this boilerplate; here
it is factored once).
"""
import logging
import sys
from pathlib import Path

# make `import pd_fusion` work when scripts run from a checkout
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))


def file_logger(name: str, out_dir: Path, filename: str) -> logging.Logger:
    """Logger writing to stdout and ``out_dir/filename`` (dir is created)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("[%(asctime)s] %(levelname)s %(message)s")
        for sink in (logging.StreamHandler(), logging.FileHandler(out_dir / filename)):
            sink.setFormatter(fmt)
            logger.addHandler(sink)
    return logger
