"""Dev-dataset download front door (reference: src/pd_fusion/data/
download/download_manager.py:10-48). Re-exports the per-source fetchers
for `pd-fusion download-dev` (cli.py) and prints manual-acquisition
instructions for access-controlled datasets."""
import argparse
import logging
from pathlib import Path

from pd_fusion.data.download.openneuro_download import download_openneuro_datasets
from pd_fusion.data.download.uci_download import download_uci_datasets

logger = logging.getLogger("pd_fusion.download_manager")

RESTRICTED_SOURCES = (
    (
        "Synapse mPower (Mobile Parkinson's Data)",
        "https://www.synapse.org/#!Synapse:syn4993293",
        "Synapse account + Certified User status + accepted conditions",
        "data/raw_dev/synapse/",
    ),
    (
        "BioFIND (LONI/IDA)",
        "https://ida.loni.usc.edu/",
        "signed Data Use Agreement (DUA)",
        "data/raw_dev/biofind/",
    ),
)


def print_manual_instructions() -> None:
    bar = "=" * 60
    print(f"\n{bar}\nMANUAL DOWNLOAD REQUIRED FOR RESTRICTED DATASETS\n{bar}")
    for i, (name, url, needs, dest) in enumerate(RESTRICTED_SOURCES, 1):
        print(f"{i}. {name}")
        print(f"   - URL: {url}")
        print(f"   - Requires: {needs}")
        print(f"   - Place the downloaded files under '{dest}'")
    print(bar + "\n")


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
    cli = argparse.ArgumentParser(description="Fetch development datasets")
    cli.add_argument("--out", default="data/raw_dev")
    cli.add_argument("--dataset", default="all", choices=["all", "uci", "openneuro", "manual"])
    cli.add_argument("--openneuro-metadata-only", action="store_true")
    args = cli.parse_args()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.dataset in ("all", "uci"):
        download_uci_datasets(out_dir)
    if args.dataset in ("all", "openneuro"):
        download_openneuro_datasets(out_dir, metadata_only=args.openneuro_metadata_only)
    if args.dataset in ("all", "manual"):
        print_manual_instructions()


if __name__ == "__main__":
    main()
