#!/usr/bin/env python
"""Smoke-check the UCI dev-dataset loaders (reference: scripts/
verify_loaders.py:9-29)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

from pd_fusion.data.dev_datasets.uci_parkinsons import load_uci_parkinsons
from pd_fusion.data.dev_datasets.uci_telemonitoring import load_uci_telemonitoring
from pd_fusion.utils.logging import setup_logging


def verify_loaders():
    setup_logging()
    for name, loader in (
        ("UCI Parkinsons", load_uci_parkinsons),
        ("UCI Telemonitoring", load_uci_telemonitoring),
    ):
        print("-" * 50)
        print(f"Verifying {name}...")
        try:
            df, masks = loader()
            print(f"SUCCESS. Shape: {df.shape}")
            print(f"Masks keys: {list(masks.keys())}")
            print(f"Clinical Present: {masks['clinical'].sum()}/{len(df)}")
        except Exception as e:
            print(f"FAILED: {e}")
    print("-" * 50)


if __name__ == "__main__":
    verify_loaders()
