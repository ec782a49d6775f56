"""Benchmark: combined embed + 5-fold-CV throughput on the flagship workloads.

Two legs, mirroring BASELINE.json's "subjects/sec (embed+train)" metric:

1. **CV leg** — synthetic PPMI-style multimodal data (N=500, 35 features,
   3 modalities with missingness), Fusion-ModDrop MLP (hidden [64,32],
   50 epochs, batch 32, moddrop 0.3), full 5-fold CV including the
   6-scenario missingness evaluation — i.e. the complete
   `cli run --k-fold 5` pipeline (runs through the vmapped one-program
   CV engine).
   Reference baseline: the torch reference (NaN-fill patched so it runs;
   see SURVEY) executes the identical workload in 5.21 s on this image
   (2026-08-16 oracle run) = 480 subj/s.

2. **Embed leg** — 16 synthetic T1w-sized volumes (raw 180x200x180,
   .nii.gz) -> resnet18 slice embeddings (160³ resize, 24 axial slices,
   224² input, mean-pool), the reference's build_resnet2d_embeddings
   workload. Reference baseline: a faithful torch/scipy emulation of the
   reference's serial per-subject pipeline (same NIfTI reader, scipy
   zoom, percentile clip, slice select, torch bilinear+resnet18 in
   chunks) measured at 0.510 subj/s on this image (2026-08-16; the image
   has no nibabel/torchvision so the emulation substitutes our reader
   and an architecture-identical torch resnet18 — random weights on both
   sides). NOTE: this host exposes a single CPU core; the embed leg's
   host stage (gz inflate + native prep) is serialized here and scales
   linearly with cores.

value = combined subjects/sec = total subjects processed / total wall.
vs_baseline = combined speedup over the reference's combined rate.
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))

REF_CV_WALL_S = 5.21  # reference oracle, same workload, this image
REF_EMBED_RATE = 0.510  # subj/s, torch emulation of the reference embed loop
N_SUBJECTS = 500
K_FOLDS = 5
N_EMBED = 16
EMBED_DATA_DIR = Path("/tmp/pd_fusion_bench_nifti")


def run_cv_once(tag):
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
    return time.time() - t0, agg


def ensure_embed_data():
    import numpy as np

    from pd_fusion.imaging.nifti import write_nifti

    EMBED_DATA_DIR.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(N_EMBED):
        p = EMBED_DATA_DIR / f"sub{i}.nii.gz"
        if not p.exists():
            vol = (rng.rand(180, 200, 180) * 0.3).astype(np.float32)
            vol[20:160, 20:180, 20:160] += 0.5
            write_nifti(p, vol)
        else:
            rng.rand(180, 200, 180)  # keep the stream aligned
        paths.append(p)
    return paths


def run_embed_once(paths, params, mean, std):
    from pd_fusion.imaging.pipeline import run_resnet_embedding_pipeline

    t0 = time.time()
    run_resnet_embedding_pipeline(
        paths,
        [f"s{i}" for i in range(len(paths))],
        params,
        mean,
        std,
        arch="resnet18",
        target_shape=(160, 160, 160),
        axes=[2],
        counts=[24],
        input_size=224,
        tta=1,
        per_slice=False,
        progress=False,
    )
    return time.time() - t0


def main():
    import numpy as np

    from pd_fusion.utils.logging import setup_logging

    setup_logging("ERROR")
    from pd_fusion.paths import RUNS_DIR

    # --- CV leg (best of two post-warmup runs: excludes one-off
    # compile-cache deserialization and relay jitter) ---
    run_cv_once("warmup")
    cv_wall, agg = run_cv_once("measure")
    cv_wall2, _ = run_cv_once("measure2")
    cv_wall = min(cv_wall, cv_wall2)
    for tag in ("warmup", "measure", "measure2"):
        shutil.rmtree(RUNS_DIR / f"bench_{tag}", ignore_errors=True)

    # --- embed leg ---
    import jax

    from pd_fusion.nn.resnet import init_resnet

    paths = ensure_embed_data()
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.5, 0.5, 0.5], np.float32)
    run_embed_once(paths[:4], params, mean, std)  # compile warmup
    embed_wall = min(
        run_embed_once(paths, params, mean, std),
        run_embed_once(paths, params, mean, std),
    )

    cv_subjects = N_SUBJECTS * K_FOLDS
    ours_rate = (cv_subjects + N_EMBED) / (cv_wall + embed_wall)
    ref_rate = (cv_subjects + N_EMBED) / (REF_CV_WALL_S + N_EMBED / REF_EMBED_RATE)
    result = {
        "metric": "embed_plus_cv5_subjects_per_sec",
        "value": round(ours_rate, 1),
        "unit": "subjects/sec",
        "vs_baseline": round(ours_rate / ref_rate, 2),
        "cv_wall_s": round(cv_wall, 3),
        "cv_speedup": round(REF_CV_WALL_S / cv_wall, 2),
        "embed_subj_per_sec": round(N_EMBED / embed_wall, 2),
        "embed_speedup": round((N_EMBED / embed_wall) / REF_EMBED_RATE, 2),
        "roc_auc_full_observation": round(agg["full_observation"]["roc_auc"]["mean"], 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
