"""Lightweight tracing / profiling.

The reference has no tracing at all (SURVEY §5: only tqdm bars). The
rebuild provides:
- ``phase_timer(name)``: context manager logging phase wall-clock and
  recording it in a process-local registry (``get_phase_times``);
- ``maybe_profile(name)``: wraps a block in ``jax.profiler.trace`` when
  the PD_FUSION_PROFILE env var points at a trace directory — full XLA
  traces on demand with zero overhead otherwise;
- ``throughput(n, seconds)``: subjects/sec formatting used by the
  benchmark and builders.
"""
import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict

_phase_times: Dict[str, float] = defaultdict(float)
logger = logging.getLogger("pd_fusion")


@contextlib.contextmanager
def phase_timer(name: str, log: bool = True):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _phase_times[name] += dt
        if log:
            logger.info(f"[timing] {name}: {dt:.3f}s")


def get_phase_times() -> Dict[str, float]:
    return dict(_phase_times)


def reset_phase_times():
    _phase_times.clear()


@contextlib.contextmanager
def maybe_profile(name: str = "trace"):
    """jax.profiler trace when PD_FUSION_PROFILE=<dir> is set."""
    trace_dir = os.environ.get("PD_FUSION_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


def throughput(n_items: int, seconds: float) -> float:
    return n_items / seconds if seconds > 0 else float("inf")
