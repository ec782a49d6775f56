#!/usr/bin/env bash
# One-command synthetic quickstart for the TPU rebuild.
set -euo pipefail

here="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$here"
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$here/src"

echo "pd_fusion quickstart: synthetic data, full pipeline, TPU backend"
python3 -m pd_fusion.cli run --config configs/quickstart.yaml --synthetic
echo "Done — artifacts are under runs/."
