#!/usr/bin/env bash
# Run every model-family config end-to-end on synthetic data
# (unimodal, late fusion, mixture-of-experts). Same sweep the reference's
# run-all script performs, against the TPU pipeline.
set -euo pipefail

here="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$here"

failures=0
for family in unimodal fusion moe; do
    cfg="configs/model_${family}.yaml"
    echo ">>> ${family}: $cfg"
    if ! python -m pd_fusion.cli run --config "$cfg" --synthetic; then
        echo ">>> ${family} FAILED" >&2
        failures=$((failures + 1))
    fi
done

if [[ "$failures" -gt 0 ]]; then
    echo "$failures experiment(s) failed." >&2
    exit 1
fi
echo "All experiments complete."
