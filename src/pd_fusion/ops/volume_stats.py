"""Simple 3-D statistics features as device reductions.

Reference semantics (data/openneuro_features.py:34-73): over the nonzero
mask (all voxels if empty): mean/std/min/max/median/p10/p90; a 10-bin
density histogram on the 1-99%-clipped range; trilinear-downsampled
grid_size³ means; optional skew/kurtosis/histogram-entropy. One jitted
program per volume (the reference runs ~6 numpy/scipy passes).
"""
from functools import partial

import jax
import jax.numpy as jnp

from pd_fusion.ops.image import _masked_percentile, resize3d


@partial(jax.jit, static_argnames=("hist_bins", "grid_size", "extra_stats"))
def simple_volume_features(vol, hist_bins: int = 10, grid_size: int = 8, extra_stats: bool = False):
    flat = vol.reshape(-1)
    mask = flat > 0
    count = jnp.sum(mask)
    use_all = count == 0
    m = jnp.where(use_all, jnp.ones_like(mask), mask)
    cnt = jnp.sum(m).astype(flat.dtype)

    mw = m.astype(flat.dtype)
    mean = jnp.sum(flat * mw) / cnt
    var = jnp.sum((flat - mean) ** 2 * mw) / cnt  # population std, matching numpy .std()
    std = jnp.sqrt(var)
    big = jnp.finfo(flat.dtype).max
    vmin = jnp.min(jnp.where(m, flat, big))
    vmax = jnp.max(jnp.where(m, flat, -big))

    sorted_masked = jnp.sort(jnp.where(m, flat, big))
    median = _masked_percentile(sorted_masked, cnt, 50.0)
    p10 = _masked_percentile(sorted_masked, cnt, 10.0)
    p90 = _masked_percentile(sorted_masked, cnt, 90.0)
    lo = _masked_percentile(sorted_masked, cnt, 1.0)
    hi = _masked_percentile(sorted_masked, cnt, 99.0)

    # density histogram of clipped values on [lo, hi] (numpy semantics:
    # right-inclusive last bin, density = count / (N * bin_width))
    clipped = jnp.clip(flat, lo, hi)
    width = (hi - lo) / hist_bins
    idx = jnp.clip(((clipped - lo) / jnp.maximum(width, 1e-38)).astype(jnp.int32), 0, hist_bins - 1)
    hist = jnp.zeros(hist_bins, flat.dtype).at[idx].add(mw)
    hist = hist / (cnt * jnp.maximum(width, 1e-38))

    grid = resize3d(vol, (grid_size, grid_size, grid_size)).reshape(-1)

    feats = [mean, std, vmin, vmax, median, p10, p90]
    parts = [jnp.stack(feats), hist, grid]
    if extra_stats:
        m3 = jnp.sum((flat - mean) ** 3 * mw) / cnt
        m4 = jnp.sum((flat - mean) ** 4 * mw) / cnt
        skew = jnp.where(std > 0, m3 / jnp.maximum(std**3, 1e-38), 0.0)
        kurt = jnp.where(std > 0, m4 / jnp.maximum(std**4, 1e-38) - 3.0, 0.0)
        h = hist + 1e-12
        ent = -jnp.sum(h * jnp.log(h))
        parts.append(jnp.stack([skew, kurt, ent]))
    return jnp.concatenate(parts).astype(jnp.float32)
