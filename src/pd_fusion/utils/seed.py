"""Seeding.

The reference seeds python/numpy/torch RNGs (src/pd_fusion/utils/seed.py:6-13).
The TPU rebuild has no torch dependency; instead we seed python/numpy (host
ETL and scenario draws use the numpy global RNG exactly like the reference,
which is what makes synthetic datasets bit-identical) and install a process
-global JAX PRNG key chain used by all device-side stochastic ops (moddrop,
init, shuffles).
"""
import random
import threading

import numpy as np
import jax

_lock = threading.Lock()
_key = None


def set_seed(seed: int = 42):
    """Seed host RNGs and reset the global JAX key chain."""
    global _key
    random.seed(seed)
    np.random.seed(seed)
    with _lock:
        _key = jax.random.PRNGKey(seed)


def fresh_key():
    """Split a new key off the global chain (thread-safe).

    ``set_seed`` must have been called first; falls back to seed 0.
    """
    global _key
    with _lock:
        if _key is None:
            _key = jax.random.PRNGKey(0)
        _key, sub = jax.random.split(_key)
        return sub
