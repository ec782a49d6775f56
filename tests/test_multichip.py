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
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
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
    """The parallel CV engine auto-shards (fold, data) when multiple
    devices exist — run a tiny CV under an 8-device virtual CPU mesh in a
    scrubbed subprocess and check the aggregate is sane."""
    code = """
import sys
sys.path.insert(0, "src")
import numpy as np
from pd_fusion.utils.logging import setup_logging
setup_logging("ERROR")
from pd_fusion.experiments.run_experiment import run_cv_pipeline
import shutil
from pd_fusion.paths import RUNS_DIR
agg = run_cv_pipeline(
    "configs/quickstart.yaml", k=4, synthetic=True,
    overrides={"output_dir": "pytest_mesh_cv", "model_type": "fusion_moddrop",
               "params": {"hidden_dims": [16], "dropout": 0.1, "lr": 0.01,
                          "batch_size": 32, "epochs": 10, "moddrop_rate": 0.3}},
)
auc = agg["full_observation"]["roc_auc"]["mean"]
assert 0.4 < auc <= 1.0, auc
shutil.rmtree(RUNS_DIR / "pytest_mesh_cv", ignore_errors=True)
print("MESH_CV_OK", auc)
"""
    env = {k: v for k, v in os.environ.items()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO / "src")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MESH_CV_OK" in out.stdout
