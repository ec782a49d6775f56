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
