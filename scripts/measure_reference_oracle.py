#!/usr/bin/env python
"""Re-derive the reference-oracle baseline constants burned into bench.py.

bench.py compares against two constants measured on this image
(2026-08-16):

  REF_CV_WALL_S  = 5.21   # reference 5-fold fusion_moddrop CV, N=500
  REF_EMBED_RATE = 0.510  # subj/s, reference embed loop (torch emulation)

This script reproduces both measurements so the baseline is
re-derivable rather than asserted:

  python scripts/measure_reference_oracle.py cv
  python scripts/measure_reference_oracle.py embed
  python scripts/measure_reference_oracle.py all

Prerequisite: a patchable copy of the reference at /tmp/ref_run
(``cp -r /root/reference /tmp/ref_run``). The CV leg monkeypatches the
reference's ``preprocess_features`` to NaN->0 (its literal code crashes
on NaN features; the patch implements its docstring's stated intent —
see SURVEY deviation notes) and silences its plot output. The embed leg
emulates ``scripts/build_resnet2d_embeddings.py``'s serial per-subject
loop (reference: :112-158) with torch-cpu, substituting this repo's
NIfTI reader for absent nibabel and an architecture-identical
random-weight torch resnet18 for absent torchvision — identical
substitutions on both sides of the comparison.
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_RUN = Path("/tmp/ref_run")


def _ensure_ref_copy() -> None:
    """Self-restore the patchable reference copy (/tmp is volatile)."""
    if not REF_RUN.exists():
        import shutil

        src = Path("/root/reference")
        if not src.exists():
            raise SystemExit("reference tree not mounted at /root/reference")
        shutil.copytree(src, REF_RUN)


def measure_cv(n_subjects: int = 500, k: int = 5) -> float:
    """Wall seconds for the reference's K-fold CV on the bench workload."""
    _ensure_ref_copy()
    sys.path.insert(0, str(REF_RUN / "src"))

    import numpy as np

    # The reference's NaN handling crashes (verified; see SURVEY §deviations).
    # Patch to its documented intent so the pipeline completes.
    import pd_fusion.data.preprocess as ref_preprocess

    orig = ref_preprocess.preprocess_features

    def _nan_safe(df, feature_cols, imputer=None, scaler=None):
        X, imp, scl = orig(df, feature_cols, imputer, scaler)
        return np.nan_to_num(X), imp, scl

    ref_preprocess.preprocess_features = _nan_safe
    # run_experiment binds the name at import time in some paths; patch late
    import pd_fusion.experiments.run_experiment as ref_runner

    if hasattr(ref_runner, "preprocess_features"):
        ref_runner.preprocess_features = _nan_safe
    import pd_fusion.training.train as ref_train

    if hasattr(ref_train, "preprocess_features"):
        ref_train.preprocess_features = _nan_safe
    import pd_fusion.evaluation.evaluate as ref_eval

    if hasattr(ref_eval, "evaluate_model"):
        for mod in (ref_eval,):
            if hasattr(mod, "preprocess_features"):
                mod.preprocess_features = _nan_safe

    overrides = {
        "output_dir": "oracle_bench",
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
    cfg = str(REF_RUN / "configs" / "quickstart.yaml")
    if n_subjects != 500:
        import yaml

        data_cfg = yaml.safe_load((REF_RUN / "configs" / "data_ppmi.yaml").read_text())
        data_cfg["synthetic"]["num_samples"] = int(n_subjects)
        scaled = Path(f"/tmp/ref_oracle_data_{n_subjects}.yaml")
        scaled.write_text(yaml.safe_dump(data_cfg))
        overrides["data_config"] = str(scaled)

    walls = []
    for _ in range(2):
        t0 = time.time()
        ref_runner.run_cv_pipeline(cfg, k=k, synthetic=True, overrides=overrides)
        walls.append(time.time() - t0)
    return min(walls)


def measure_embed(scale: bool = False) -> float:
    """Reference embed loop rate (subj/s): the 16-volume mean-pool leg,
    or with ``scale`` the 64-volume per-slice (MIL-bag) leg mirroring
    reference scripts/build_resnet2d_mil_embeddings.py:112-158 (same
    prep + per-slice forward; only the final pool differs)."""
    import numpy as np
    import torch

    sys.path.insert(0, str(REPO / "src"))
    sys.path.insert(0, str(REPO))
    from bench import ensure_embed_data, ensure_embed_scale_data, N_EMBED, N_EMBED_SCALE
    from pd_fusion.imaging.nifti import read_nifti

    try:
        from scipy.ndimage import zoom as nd_zoom
    except Exception:  # pragma: no cover
        nd_zoom = None

    paths = ensure_embed_scale_data() if scale else ensure_embed_data()

    # architecture-identical resnet18 (torchvision absent in-image)
    from pd_fusion.utils.torch_utils import build_torch_resnet18

    torch.manual_seed(0)
    net = build_torch_resnet18().eval()

    mean = torch.tensor([0.5, 0.5, 0.5]).view(1, 3, 1, 1)
    std = torch.tensor([0.5, 0.5, 0.5]).view(1, 3, 1, 1)

    def embed_one(path):
        # mirrors the reference hot loop step-for-step (tta=1 path):
        # _load_volume -> _normalize_volume_for_resnet -> _select_slices
        # -> interpolate(1ch) -> repeat(3ch) -> normalize -> batched net
        # (reference: src/pd_fusion/data/openneuro_features.py:22-32,
        # 121-152, 226-263)
        vol = np.nan_to_num(np.asarray(read_nifti(path), np.float32))
        if nd_zoom is not None:
            vol = nd_zoom(vol, [t / s for t, s in zip((160, 160, 160), vol.shape)], order=1)
        fg = vol > 0
        vals = vol[fg] if fg.any() else vol
        lo, hi = np.percentile(vals, 1), np.percentile(vals, 99)
        vol = np.clip(vol, lo, hi)
        vol = ((vol - lo) / (hi - lo + 1e-6)).astype(np.float32)

        nonzero = np.where(np.any(vol > 0, axis=(0, 1)))[0]
        if len(nonzero) == 0:
            nonzero = np.arange(vol.shape[2])
        s_lo, s_hi = int(nonzero[0]), int(nonzero[-1])
        count = min(24, s_hi - s_lo + 1)
        indices = np.linspace(s_lo, s_hi, count).astype(int)
        slices = vol[:, :, indices].transpose(2, 0, 1)  # [count, H, W]

        x = torch.from_numpy(slices).unsqueeze(1)  # [N,1,H,W]
        x = torch.nn.functional.interpolate(
            x, size=(224, 224), mode="bilinear", align_corners=False
        )
        x = x.repeat(1, 3, 1, 1)
        x = (x - mean) / std
        feats = []
        with torch.no_grad():
            for i in range(0, x.size(0), 32):
                feats.append(net(x[i : i + 32]))
        emb = torch.cat(feats)
        # scale leg keeps per-slice bags (MIL builder), base leg mean-pools
        return emb.numpy() if scale else emb.mean(0).numpy()

    t0 = time.time()
    for p in paths:
        embed_one(p)
    wall = time.time() - t0
    return (N_EMBED_SCALE if scale else N_EMBED) / wall


def main():
    cli = argparse.ArgumentParser()
    cli.add_argument("leg", choices=["cv", "cv-scale", "embed", "embed-scale", "all"])
    args = cli.parse_args()

    if args.leg == "all":
        # one subprocess per leg: the cv leg imports the REFERENCE's
        # pd_fusion package, the embed leg imports this repo's — they
        # cannot coexist in one interpreter
        import subprocess

        merged = {}
        for leg in ("cv", "embed"):
            res = subprocess.run(
                [sys.executable, __file__, leg], capture_output=True, text=True
            )
            if res.returncode != 0:
                raise SystemExit(f"{leg} leg failed:\n{res.stderr[-2000:]}")
            merged.update(json.loads(res.stdout.strip().splitlines()[-1]))
        print(json.dumps(merged))
        return

    out = {}
    if args.leg == "cv":
        out["REF_CV_WALL_S"] = round(measure_cv(), 3)
    elif args.leg == "cv-scale":
        out["REF_CV_SCALE_WALL_S"] = round(measure_cv(n_subjects=5000, k=10), 3)
    elif args.leg == "embed-scale":
        out["REF_EMBED_SCALE_RATE"] = round(measure_embed(scale=True), 4)
    else:
        out["REF_EMBED_RATE"] = round(measure_embed(), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
