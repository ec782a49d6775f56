"""Benchmark: 5-fold CV train+eval throughput on the flagship workload.

Workload (mirrors BASELINE.json's "CV training" leg): synthetic PPMI-style
multimodal data (N=500, 35 features, 3 modalities with missingness),
Fusion-ModDrop MLP (hidden [64,32], 50 epochs, batch 32, moddrop 0.3),
full 5-fold CV INCLUDING the 6-scenario missingness evaluation with all
six metrics per fold — i.e. the complete `cli run --k-fold 5` pipeline.

Baseline: the torch reference (NaN-fill patched so it runs; see SURVEY)
executes the identical workload in 5.21 s on this image's CPU
(2026-08-16 measurement, /tmp oracle run). value = subjects/sec
(N * K / wall), vs_baseline = speedup over the reference's 480 subj/s.

A warmup run amortizes jit compilation (persistent compile cache also
applies); the measured run is steady-state, which is the regime that
matters for the sweep-style usage the reference targets (hundreds of runs
per SLURM sweep).
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))

REF_WALL_S = 5.21  # reference oracle, same workload, CPU (see module docstring)
N_SUBJECTS = 500
K_FOLDS = 5


def run_once(tag):
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    overrides = {
        "output_dir": f"bench_{tag}",
        "model_type": "fusion_moddrop",
        "params": {
            "hidden_dims": [64, 32],
            "dropout": 0.2,
            "lr": 0.001,
            "batch_size": 32,
            "epochs": 50,
            "moddrop_rate": 0.3,
        },
    }
    t0 = time.time()
    agg = run_cv_pipeline("configs/quickstart.yaml", k=K_FOLDS, synthetic=True, overrides=overrides)
    wall = time.time() - t0
    return wall, agg


def main():
    from pd_fusion.utils.logging import setup_logging

    setup_logging("ERROR")
    from pd_fusion.paths import RUNS_DIR

    run_once("warmup")  # compile
    wall, agg = run_once("measure")

    for tag in ("warmup", "measure"):
        shutil.rmtree(RUNS_DIR / f"bench_{tag}", ignore_errors=True)

    subj_per_sec = N_SUBJECTS * K_FOLDS / wall
    ref_subj_per_sec = N_SUBJECTS * K_FOLDS / REF_WALL_S
    result = {
        "metric": "cv5_train_eval_subjects_per_sec",
        "value": round(subj_per_sec, 1),
        "unit": "subjects/sec",
        "vs_baseline": round(subj_per_sec / ref_subj_per_sec, 2),
        "wall_s": round(wall, 3),
        "roc_auc_full_observation": round(agg["full_observation"]["roc_auc"]["mean"], 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
