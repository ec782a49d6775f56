"""Measure the cross-fold slice-cache win on a mil_attention_ft CV run
(VERDICT r3 item 4).

A CV run builds a fresh MilAttentionFineTuneModel per fold, so before the
shared cache every fold re-read + re-prepped every NIfTI (the reference
re-loads per epoch AND per fold — reference
models/mil_attention_finetune.py:114-125,183; our per-instance cache
already fixed the per-epoch part in round 1). The prepped slices are a
pure function of (path, target_shape, axes, counts), so folds 2..K can
reuse fold 1's arrays exactly.

Runs the same K-fold CV twice — cache shared (default) vs
PD_FUSION_SLICE_CACHE_MB=0 (per-instance only, the old behavior) — in
fresh subprocesses, and reports walls + per-fold metric equality.
NOTE (1-core host): run nothing else concurrently.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
import numpy as np, pandas as pd
sys.path.insert(0, "src")
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.data.splits import get_kfold_splits
from pd_fusion.imaging import native
from pd_fusion.imaging.nifti import write_nifti

# count + time every actual prep so the cache effect is separable from
# relay weather (the TPU relay RTT varies ~10x between runs; wall alone
# cannot attribute the win)
_prep = {"n": 0, "s": 0.0}
_real_prep = native.prep_slices_native

def _counting_prep(*a, **k):
    t0 = time.time()
    out = _real_prep(*a, **k)
    _prep["n"] += 1
    _prep["s"] += time.time() - t0
    return out

native.prep_slices_native = _counting_prep

root = sys.argv[1]
n = 24
rng = np.random.RandomState(0)
rows = []
for i in range(n):
    label = i % 2
    vol = (rng.rand(96, 96, 96).astype(np.float32) * 400).astype(np.int16)
    if label:
        vol[30:60, 30:60, 30:60] += 600
    p = f"{root}/sub-{i:03d}.nii.gz"
    write_nifti(p, vol)
    rows.append({"subject_id": f"sub-{i:03d}", "diagnosis": label, "mri_mil": p,
                 "age": 60 + rng.randn()})
df = pd.DataFrame(rows)

config = {
    "model_type": "mil_attention_ft",
    "experiment_name": "mil_ft_cache_measure",
    "params": {
        "backbone": "resnet18", "pretrained": False,
        "target_shape": (96, 96, 96), "slice_axis": 2, "slice_count": 8,
        "input_size": 96, "batch_size": 8,
        "epochs": int(os.environ.get("PD_FUSION_MILFT_EPOCHS", "2")),
        "freeze_backbone_epochs": int(os.environ.get("PD_FUSION_MILFT_FREEZE", "1")),
        "hidden_dim": 32, "attn_dim": 16,
        "train_aug": True, "early_stopping_patience": 0,
    },
}
from pd_fusion.training.train import train_pipeline
from pd_fusion.utils.seed import set_seed

folds = get_kfold_splits(df, n_splits=3, seed=0)
t0 = time.time()
aucs = []
for train_df, val_df in folds:
    set_seed(0)
    model, (kind, mil_col) = train_pipeline(
        dict(config), train_df, val_df, None, None
    )
    probs = model.predict_proba(val_df[mil_col].tolist())
    from sklearn.metrics import roc_auc_score
    aucs.append(float(roc_auc_score(val_df["diagnosis"].values, probs)))
wall = time.time() - t0
print(json.dumps({"wall_s": round(wall, 2), "fold_aucs": aucs,
                  "n_preps": _prep["n"], "prep_s": round(_prep["s"], 2)}))
"""


def run(cache_mb, root):
    env = dict(os.environ)
    env["PD_FUSION_SLICE_CACHE_MB"] = str(cache_mb)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/jax_cache"
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(root)], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(1)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["proc_wall_s"] = round(time.time() - t0, 2)
    return res


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        # warmup pass to populate the jit compile cache (not timed)
        run(0, root)
        # interleave arms: relay RTT drifts within a session, so paired
        # samples are the only fair wall comparison
        offs, ons = [], []
        for _ in range(2):
            offs.append(run(0, root))  # per-instance caches (old behavior)
            ons.append(run(8192, root))  # shared cross-fold cache
    off = min(offs, key=lambda r: r["wall_s"])
    on = min(ons, key=lambda r: r["wall_s"])
    print(json.dumps({
        "cache_off": off, "cache_on": on,
        "off_walls": [r["wall_s"] for r in offs],
        "on_walls": [r["wall_s"] for r in ons],
        "cv_wall_saved_s": round(off["wall_s"] - on["wall_s"], 2),
        "prep_s_saved_exact": round(off["prep_s"] - on["prep_s"], 2),
        "preps": {"off": off["n_preps"], "on": on["n_preps"]},
    }))


if __name__ == "__main__":
    main()
