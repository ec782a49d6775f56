"""Multi-chip sharding validation.

Runs ``__graft_entry__.dryrun_multichip(8)`` in a subprocess with a
scrubbed environment (8 virtual CPU devices) because the axon TPU plugin
in this image registers itself at interpreter startup and cannot be
disabled in-process.
"""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_8_virtual_devices():
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # ~9 min wall even warm-cached on this 1-core host: 8 virtual
        # devices spin-wait in collectives and the MIL-FT equivalence leg
        # does ~2 TFLOP of real resnet fwd+bwd at 224px/24-slice shapes
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


def test_entry_forward_compiles():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    import numpy as np

    p = np.asarray(out)
    assert (p >= 0).all() and (p <= 1).all()


def test_parallel_cv_shards_over_virtual_mesh():
    """Multi-device CORRECTNESS by equivalence (VERDICT r2 #2): the same
    CV runs once sharded over the 8-device ("fold", "data") mesh and once
    with the mesh forced off (single-device program); every scenario
    metric of every fold must agree to numerical tolerance — a padding
    bug, wrong psum, or sharding-induced batch reorder would break this,
    not just a 0.4<auc sanity band."""
    code = """
import sys
sys.path.insert(0, "src")
import numpy as np
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.experiments.run_experiment import run_cv_pipeline
import shutil, yaml
from pd_fusion.paths import RUNS_DIR

import pandas as pd

base = {"model_type": "fusion_moddrop",
        "params": {"hidden_dims": [16], "dropout": 0.1, "lr": 0.01,
                   "batch_size": 32, "epochs": 10, "moddrop_rate": 0.3}}
folds, preds = {}, {}
for mode, mesh in (("on", "auto"), ("off", "off")):
    run_id = f"pytest_mesh_cv_{mode}"
    agg = run_cv_pipeline(
        "configs/quickstart.yaml", k=4, synthetic=True,
        overrides={**base, "output_dir": run_id, "cv_mesh": mesh},
    )
    folds[mode] = [yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
                   for i in (1, 2, 3, 4)]
    preds[mode] = [pd.read_csv(RUNS_DIR / run_id / f"preds_fold_{i}_full_observation.csv")
                   for i in (1, 2, 3, 4)]
    auc = agg["full_observation"]["roc_auc"]["mean"]
    assert 0.4 < auc <= 1.0, auc
    shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

# equivalence, two layers:
# 1. per-sample PROBABILITIES of every fold agree to ~1e-3: mesh-off is
#    the fused train+eval single program, mesh-on trains and evaluates
#    as two programs — identical math, different fusion, so 120 chained
#    Adam steps leave small ulp-chaos in the probs. A wrong psum /
#    padding / batch-order bug shifts probs by orders of magnitude more.
# 2. metric drift stays small; rank metrics step by ~1/n_pos when a
#    near-tie flips, so they get a looser band (the BIT-EXACT
#    sharded==single gate for the SAME program is dryrun_multichip's
#    equivalence check, which printed 0.00e+00 for the flagship trainer).
worst_p = 0.0
for po, px in zip(preds["on"], preds["off"]):
    assert (po["y_true"].values == px["y_true"].values).all()
    worst_p = max(worst_p, float(np.max(np.abs(po["y_prob"].values - px["y_prob"].values))))
assert worst_p < 5e-3, worst_p
worst_m = 0.0
for fo, fx in zip(folds["on"], folds["off"]):
    for scen in fo:
        if scen == "fold":
            continue
        for metric, v in fo[scen].items():
            d = abs(v - fx[scen][metric])
            worst_m = max(worst_m, d)
            assert d < 5e-2, (scen, metric, v, fx[scen][metric])
print(f"MESH_CV_EQUIV_OK max|prob diff|={worst_p:.2e} max|metric diff|={worst_m:.2e}")
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_CV_EQUIV_OK" in out.stdout


def test_parallel_gbdt_cv_shards_over_virtual_mesh():
    """Device-GBDT mesh equivalence (VERDICT r3 item 3): the one-program
    fold ensemble trains with its per-level (node, feature, bin) histogram
    reductions psum'd over the sharded batch axis — a wrong sharding there
    silently corrupts the g/h sums and flips splits. Mesh-on vs mesh-off
    per-fold probs and metrics must agree. GBDT training is deterministic
    (no RNG), so the tolerance only covers cross-shard reduction-order ulp
    drift through the sigmoid."""
    code = """
import sys
sys.path.insert(0, "src")
import numpy as np
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.experiments.run_experiment import run_cv_pipeline
import shutil, yaml
from pd_fusion.paths import RUNS_DIR
import pandas as pd

base = {"model_type": "unimodal_gbdt",
        "params": {"backend": "device", "n_estimators": 12, "max_depth": 3,
                   "learning_rate": 0.1}}
folds, preds = {}, {}
for mode, mesh in (("on", "auto"), ("off", "off")):
    run_id = f"pytest_mesh_gbdt_{mode}"
    agg = run_cv_pipeline(
        "configs/quickstart.yaml", k=4, synthetic=True,
        overrides={**base, "output_dir": run_id, "cv_mesh": mesh},
    )
    folds[mode] = [yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
                   for i in (1, 2, 3, 4)]
    preds[mode] = [pd.read_csv(RUNS_DIR / run_id / f"preds_fold_{i}_full_observation.csv")
                   for i in (1, 2, 3, 4)]
    auc = agg["full_observation"]["roc_auc"]["mean"]
    assert 0.4 < auc <= 1.0, auc
    shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

worst_p = 0.0
for po, px in zip(preds["on"], preds["off"]):
    assert (po["y_true"].values == px["y_true"].values).all()
    worst_p = max(worst_p, float(np.max(np.abs(po["y_prob"].values - px["y_prob"].values))))
assert worst_p < 5e-3, worst_p
worst_m = 0.0
for fo, fx in zip(folds["on"], folds["off"]):
    for scen in fo:
        if scen == "fold":
            continue
        for metric, v in fo[scen].items():
            d = abs(v - fx[scen][metric])
            worst_m = max(worst_m, d)
            assert d < 5e-2, (scen, metric, v, fx[scen][metric])
print(f"MESH_GBDT_EQUIV_OK max|prob diff|={worst_p:.2e} max|metric diff|={worst_m:.2e}")
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_GBDT_EQUIV_OK" in out.stdout


def test_parallel_gbdt_calibrated_cv_shards_over_virtual_mesh():
    """Calibrated device-GBDT mesh path (ADVICE r4): mesh-on device_puts
    ycal/calmask/yv/wv onto the fold-only mesh feeding _cv_program_gbdt_cal
    — the isotonic segment-sums run over those sharded buffers, and a
    mis-sharding there would corrupt the calibrated probs. Banded like the
    MLP calibrated mesh test (isotonic quantizes probs into flat blocks)."""
    code = """
import sys
sys.path.insert(0, "src")
import numpy as np
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.experiments.run_experiment import run_cv_pipeline
import shutil, yaml
from pd_fusion.paths import RUNS_DIR
import pandas as pd

base = {"model_type": "unimodal_gbdt", "calibrate": True,
        "nested_calibration": False, "calibration_split": 0.25,
        "params": {"backend": "device", "n_estimators": 12, "max_depth": 3,
                   "learning_rate": 0.1}}
folds, preds = {}, {}
for mode, mesh in (("on", "auto"), ("off", "off")):
    run_id = f"pytest_mesh_gbdtcal_{mode}"
    agg = run_cv_pipeline(
        "configs/quickstart.yaml", k=4, synthetic=True,
        overrides={**base, "output_dir": run_id, "cv_mesh": mesh},
    )
    folds[mode] = [yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
                   for i in (1, 2, 3, 4)]
    preds[mode] = [pd.read_csv(RUNS_DIR / run_id / f"preds_fold_{i}_full_observation.csv")
                   for i in (1, 2, 3, 4)]
    auc = agg["full_observation"]["roc_auc"]["mean"]
    assert 0.4 < auc <= 1.0, auc
    shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

worst_p = 0.0
for po, px in zip(preds["on"], preds["off"]):
    assert (po["y_true"].values == px["y_true"].values).all()
    worst_p = max(worst_p, float(np.max(np.abs(po["y_prob"].values - px["y_prob"].values))))
assert worst_p < 2e-2, worst_p
worst_m = 0.0
for fo, fx in zip(folds["on"], folds["off"]):
    for scen in fo:
        if scen == "fold":
            continue
        for metric, v in fo[scen].items():
            d = abs(v - fx[scen][metric])
            worst_m = max(worst_m, d)
            assert d < 5e-2, (scen, metric, v, fx[scen][metric])
print(f"MESH_GBDTCAL_EQUIV_OK max|prob diff|={worst_p:.2e} max|metric diff|={worst_m:.2e}")
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_GBDTCAL_EQUIV_OK" in out.stdout


def test_parallel_calibrated_cv_shards_over_virtual_mesh():
    """Calibrated mesh path (device isotonic): mesh-on routes through the
    sharded trainers + _eval_cal_packed_mlp (train and eval-calibrate as
    two programs), mesh-off through the fused one-dispatch calibrated
    program. Probs and metrics must agree fold-for-fold — a sharding bug
    in the isotonic segment-sums or the packed calibrated probs would
    break this."""
    code = """
import sys
sys.path.insert(0, "src")
import numpy as np
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.experiments.run_experiment import run_cv_pipeline
import shutil, yaml
from pd_fusion.paths import RUNS_DIR
import pandas as pd

base = {"model_type": "fusion_moddrop", "calibrate": True,
        "nested_calibration": False, "calibration_split": 0.25,
        "params": {"hidden_dims": [16], "dropout": 0.1, "lr": 0.01,
                   "batch_size": 32, "epochs": 10, "moddrop_rate": 0.3}}
folds, preds = {}, {}
for mode, mesh in (("on", "auto"), ("off", "off")):
    run_id = f"pytest_mesh_cal_{mode}"
    agg = run_cv_pipeline(
        "configs/quickstart.yaml", k=4, synthetic=True,
        overrides={**base, "output_dir": run_id, "cv_mesh": mesh},
    )
    folds[mode] = [yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
                   for i in (1, 2, 3, 4)]
    preds[mode] = [pd.read_csv(RUNS_DIR / run_id / f"preds_fold_{i}_full_observation.csv")
                   for i in (1, 2, 3, 4)]
    auc = agg["full_observation"]["roc_auc"]["mean"]
    assert 0.4 < auc <= 1.0, auc
    shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

# isotonic quantizes probs into flat blocks, so ulp train-drift between
# the two program shapes either vanishes (same block) or steps a whole
# knot; the bands below hold both layers (same rationale as the
# uncalibrated mesh test, plus isotonic's step structure)
worst_p = 0.0
for po, px in zip(preds["on"], preds["off"]):
    assert (po["y_true"].values == px["y_true"].values).all()
    worst_p = max(worst_p, float(np.max(np.abs(po["y_prob"].values - px["y_prob"].values))))
assert worst_p < 2e-2, worst_p
worst_m = 0.0
for fo, fx in zip(folds["on"], folds["off"]):
    for scen in fo:
        if scen == "fold":
            continue
        for metric, v in fo[scen].items():
            d = abs(v - fx[scen][metric])
            worst_m = max(worst_m, d)
            assert d < 5e-2, (scen, metric, v, fx[scen][metric])
print(f"MESH_CAL_EQUIV_OK max|prob diff|={worst_p:.2e} max|metric diff|={worst_m:.2e}")
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_CAL_EQUIV_OK" in out.stdout


def test_embed_pipeline_shards_over_virtual_mesh(tmp_path):
    """End-to-end ResNet embed pipeline under the data mesh (VERDICT r4
    #1): run_resnet_embedding_pipeline with >1 device visible activates
    PD_FUSION_EMBED_MESH (sharded-stack flush over the subject axis,
    replicated backbone); its per-subject embeddings must equal the
    single-device run (PD_FUSION_EMBED_MESH=0) — the SPMD twin of the
    reference's nn.DataParallel embedding builders. 11 subjects at
    SUBJECTS_PER_CALL=8 exercise the mesh width-rounding (widths all
    rounded up to multiples of 8 devices) AND the tail flush."""
    code = """
import sys
sys.path.insert(0, "src")
import os
import numpy as np
import jax

root = sys.argv[1]
from pd_fusion.imaging.nifti import write_nifti
from pd_fusion.imaging import pipeline
from pd_fusion.nn.resnet import init_resnet

assert jax.device_count() == 8, jax.devices()
rng = np.random.RandomState(7)
paths, sids = [], []
for i in range(11):
    p = os.path.join(root, f"sub{i}.nii.gz")
    write_nifti(p, (rng.rand(12, 10, 8) * 900).astype(np.int16))
    paths.append(p)
    sids.append(f"s{i}")

params = init_resnet(jax.random.PRNGKey(3), "resnet18")
mean = np.float32([0.5, 0.5, 0.5]); std = np.float32([0.5, 0.5, 0.5])
kw = dict(arch="resnet18", target_shape=(16, 16, 16), axes=[2], counts=[4],
          input_size=32, per_slice=True, progress=False, tta=2)
pipeline.SUBJECTS_PER_CALL = 8

os.environ["PD_FUSION_EMBED_MESH"] = "0"
single = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
os.environ["PD_FUSION_EMBED_MESH"] = "1"
meshed = pipeline.run_resnet_embedding_pipeline(paths, sids, params, mean, std, **kw)
assert len(single) == len(meshed) == 11
worst = 0.0
for a, b in zip(single, meshed):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape and np.isfinite(a).all()
    worst = max(worst, float(np.abs(a - b).max()))
assert worst < 5e-5, worst
print(f"MESH_EMBED_EQUIV_OK max|emb diff|={worst:.2e}")
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path)], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_EMBED_EQUIV_OK" in out.stdout
