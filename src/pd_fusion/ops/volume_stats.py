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
    cnt_i = jnp.sum(m).astype(jnp.int32)
    median = _masked_percentile(sorted_masked, cnt_i, 50)
    p10 = _masked_percentile(sorted_masked, cnt_i, 10)
    p90 = _masked_percentile(sorted_masked, cnt_i, 90)
    lo = _masked_percentile(sorted_masked, cnt_i, 1)
    hi = _masked_percentile(sorted_masked, cnt_i, 99)

    # density histogram of clipped values on [lo, hi] (numpy semantics:
    # right-inclusive last bin, density = count / (N * bin_width)).
    # np.histogram expands a DEGENERATE range (lo == hi, e.g. a constant
    # or mask-like volume) to (lo-0.5, hi+0.5) — the old subnormal
    # 1e-38 width guard was flushed to zero by XLA and produced
    # inf/nan features there. finfo.tiny (the smallest NORMAL f32) keeps
    # the near-degenerate hi-lo-underflows-to-subnormal edge finite.
    degen = hi <= lo
    lo_e = jnp.where(degen, lo - 0.5, lo)
    hi_e = jnp.where(degen, hi + 0.5, hi)
    clipped = jnp.clip(flat, lo, hi)
    width = jnp.maximum((hi_e - lo_e) / hist_bins, jnp.finfo(flat.dtype).tiny)
    idx = jnp.clip(((clipped - lo_e) / width).astype(jnp.int32), 0, hist_bins - 1)
    hist = jnp.zeros(hist_bins, flat.dtype).at[idx].add(mw)
    hist = hist / (cnt * width)

    grid = resize3d(vol, (grid_size, grid_size, grid_size)).reshape(-1)

    feats = [mean, std, vmin, vmax, median, p10, p90]
    parts = [jnp.stack(feats), hist, grid]
    if extra_stats:
        m3 = jnp.sum((flat - mean) ** 3 * mw) / cnt
        m4 = jnp.sum((flat - mean) ** 4 * mw) / cnt
        ok = std > 0
        safe3 = jnp.where(ok, std**3, 1.0)
        safe4 = jnp.where(ok, std**4, 1.0)
        skew = jnp.where(ok, m3 / safe3, 0.0)
        kurt = jnp.where(ok, m4 / safe4 - 3.0, 0.0)
        h = hist + 1e-12
        ent = -jnp.sum(h * jnp.log(h))
        parts.append(jnp.stack([skew, kurt, ent]))
    return jnp.concatenate(parts).astype(jnp.float32)
