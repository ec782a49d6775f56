#!/usr/bin/env bash
# PPMI tabular smoke run: build the study-data table, train a capped
# tabular model, and emit the eval report for the newest run directory.
# Behavioral twin of the reference smoke script (reference:
# scripts/ppmi_smoke.sh) on the TPU rebuild's script suite.
set -euo pipefail

here="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$here"

cfg="${1:-configs/ppmi_studydata.yaml}"
seed=42
limit=200

step() { printf '\n== %s ==\n' "$*"; }

step "build dataset ($cfg)"
python scripts/ppmi_build_dataset.py --config "$cfg" --seed "$seed"

step "train tabular (limit=$limit)"
python scripts/ppmi_train_tabular.py --config "$cfg" --seed "$seed" --limit "$limit"

latest_run="$(ls -td runs/ppmi_tabular_* 2>/dev/null | head -1)"
if [[ -z "$latest_run" ]]; then
    echo "no runs/ppmi_tabular_* directory produced; aborting" >&2
    exit 1
fi

step "eval report ($latest_run)"
python scripts/ppmi_eval_report.py --config "$cfg" --out_dir "$latest_run"
