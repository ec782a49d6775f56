"""Test bootstrap: run JAX on a virtual 8-device CPU mesh so sharding and
pjit paths are exercised without TPU hardware. Must run before jax import."""
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

SRC = Path(__file__).resolve().parent.parent / "src"
if str(SRC) not in sys.path:
    sys.path.insert(0, str(SRC))

# persistent XLA compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


# --- relay-outage guard --------------------------------------------------
# When launched from the image's normal env, the axon sitecustomize
# hijacks JAX at interpreter startup and every test runs on the
# relay-backed TPU (the JAX_PLATFORMS=cpu above is ignored there). The
# relay has been observed FULLY unreachable for hours; a suite launched
# into such an outage hangs at first device contact with zero output
# (in-process device calls cannot be timed out). Probe the relay ONCE
# from a killable subprocess and, if it is dead, skip the whole session
# with a visible reason instead of stalling. PD_FUSION_NO_RELAY_PROBE=1
# skips the probe (saves ~15 s on known-good relays).

def _probe_device_child():
    import jax.numpy as jnp

    jnp.ones((8, 8)).sum().block_until_ready()


def _relay_alive(timeout_s: float = 90.0) -> bool:
    import multiprocessing as mp

    ctx = mp.get_context("spawn")  # never fork a half-initialized backend
    p = ctx.Process(target=_probe_device_child, daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join()
        return False
    return p.exitcode == 0


def pytest_collection_modifyitems(config, items):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # CPU backend (scrubbed env): nothing to probe
    if os.environ.get("PD_FUSION_NO_RELAY_PROBE"):
        return
    if _relay_alive():
        return
    import pytest

    marker = pytest.mark.skip(
        reason="axon TPU relay unreachable (90s probe timed out) — the suite "
        "would hang at first device contact. Run the scrubbed-CPU suite: "
        "PALLAS_AXON_POOL_IPS= PYTHONPATH= JAX_PLATFORMS=cpu "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "python -m pytest tests/"
    )
    for item in items:
        item.add_marker(marker)
