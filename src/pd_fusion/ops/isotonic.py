"""TPU-native isotonic regression (fit + piecewise-linear transform).

Replicates sklearn ``IsotonicRegression(out_of_bounds="clip")`` as used
by the calibration wrapper (reference: src/pd_fusion/models/
calibrate.py:7-56 fits sklearn's sequential C PAV on a host array) — but
as a single fixed-shape XLA program so the *entire* calibrated CV
(train -> isotonic fit -> transform -> metrics) fuses into ONE device
dispatch (parallel/cv_engine.py).

Instead of the inherently sequential stack-based PAV, the fit uses the
closed-form max-min characterisation of isotonic least squares:

    yhat_i = max_{j<=i} min_{k>=i} weighted_mean(y_j..y_k)

lowered as one O(n^2) broadcast of range means from prefix sums plus a
suffix-min / prefix-max — no data-dependent control flow, trivially
vmappable over CV folds, and ideal for the VPU at calibration-set sizes
(n^2 <= ~16M elements for n <= 4096; `cv_engine` falls back to the host
fit above that). Tie handling matches sklearn's ``_make_unique``
(weighted mean of y over duplicate x); transform matches its
``interp1d(kind="linear")`` over the fitted knots with clipping outside
the training range.
"""
from functools import partial

import jax
import jax.numpy as jnp

# n^2 buffers above this get large (and the host PAV is O(n log n)):
# callers should take a host path beyond it.
MAX_DEVICE_N = 4096


def isotonic_fit_transform(xc, yc, valid, t):
    """Fit isotonic regression on (xc, yc) where ``valid`` is True, and
    return the calibrated values of ``t`` (linear interpolation between
    fitted knots, clipped to the training range).

    Shapes: xc, yc, valid -> [n]; t -> [m]. Returns [m]. Pure jnp —
    jittable and vmappable (use vmap for per-fold calibration).
    """
    n = xc.shape[0]
    dt = jnp.result_type(xc.dtype, jnp.float32)
    xc = xc.astype(dt)
    yc = yc.astype(dt)
    w = valid.astype(dt)
    inf = jnp.asarray(jnp.inf, dt)

    # sort by x with invalid entries last
    xs_key = jnp.where(valid, xc, inf)
    order = jnp.argsort(xs_key)
    xs = xs_key[order]
    ys = jnp.where(valid, yc, 0.0)[order]
    ws = w[order]

    # duplicate-x segments (sklearn _make_unique: weighted mean of y)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), xs[1:] != xs[:-1]]
    )
    gid = jnp.cumsum(new_seg) - 1
    ysum = jax.ops.segment_sum(ws * ys, gid, num_segments=n)
    wsum = jax.ops.segment_sum(ws, gid, num_segments=n)
    # unique x per segment (+inf for empty trailing segments)
    xseg = jax.ops.segment_min(xs, gid, num_segments=n)
    seg_valid = wsum > 0

    # range means from prefix sums: mean(j..k) = (Sy[k]-Sy[j-1])/(Sw[k]-Sw[j-1])
    Sy = jnp.cumsum(ysum)
    Sw = jnp.cumsum(wsum)
    Syb = jnp.concatenate([jnp.zeros((1,), dt), Sy[:-1]])  # Sy[j-1]
    Swb = jnp.concatenate([jnp.zeros((1,), dt), Sw[:-1]])
    num = Sy[None, :] - Syb[:, None]  # [j, k]
    den = Sw[None, :] - Swb[:, None]
    jk_ok = (jnp.arange(n)[:, None] <= jnp.arange(n)[None, :]) & (den > 0)
    means = jnp.where(jk_ok, num / jnp.where(jk_ok, den, 1.0), inf)

    # yhat_i = max_{j<=i, j real} min_{k>=i} means[j, k]
    suff_min = jax.lax.cummin(means, axis=1, reverse=True)  # A[j, i]
    rows = jnp.where(seg_valid[:, None], suff_min, -inf)
    yhat_seg = jnp.diagonal(jax.lax.cummax(rows, axis=0))  # [n]

    # Tie repair: members of one PAV block are mathematically equal but
    # the per-index max-min evaluation can differ by an ulp between
    # neighbours, while sklearn's PAV assigns the block mean EXACTLY to
    # every member — and downstream tie-exact AUC/ECE see those ties.
    # Recover blocks as monotone runs (gap <= tol is "same block") and
    # broadcast each block's exact weighted mean to all members.
    # tol bound: measured max |raw max-min - sklearn f64 block mean| is
    # ~2e-8 relative (200 trials, n up to 1024), so 1e-7 leaves 5x head-
    # room; the inverse failure (merging two GENUINELY distinct adjacent
    # blocks closer than tol, creating a tie sklearn does not have) is
    # bounded by tol itself and pinned by a parity test with blocks
    # separated by ~1e-6 (test_isotonic_device.py).
    tol = jnp.asarray(1e-7, dt) * (1.0 + jnp.abs(yhat_seg))
    prev = jnp.concatenate([jnp.full((1,), -inf, dt), yhat_seg[:-1]])
    new_blk = (jnp.arange(n) == 0) | (yhat_seg > prev + tol)
    bid = jnp.cumsum(new_blk) - 1
    b_ysum = jax.ops.segment_sum(ysum, bid, num_segments=n)
    b_wsum = jax.ops.segment_sum(wsum, bid, num_segments=n)
    yhat_seg = (b_ysum / jnp.where(b_wsum > 0, b_wsum, 1.0))[bid]

    # knots: (xseg, yhat_seg) over valid segments; pad knots sit at +inf
    # with the last real fitted value so interp beyond x_max is flat
    n_seg = jnp.sum(seg_valid.astype(jnp.int32))
    last = jnp.maximum(n_seg - 1, 0)
    y_last = yhat_seg[last]
    x_max = xseg[last]
    x_min = xseg[0]
    yknot = jnp.where(seg_valid, yhat_seg, y_last)

    tclip = jnp.clip(t.astype(dt), x_min, x_max)
    # scipy interp1d._call_linear replicated operation-for-operation
    # (LEFT-side searchsorted; f32 slope = dy/dx then slope*(t-x_lo)+y_lo):
    # sklearn's transform evaluates a t that EQUALS a ramp-boundary knot
    # through the LEFT interval, whose f32 lerp rounds to y_hi +- 1 ulp —
    # a value DISTINCT from the flat block's. Downstream tie-exact AUC
    # sees precisely that tie structure (the non-nested calibrated CV
    # transforms the very probs the fit saw), so jnp.interp's exact-knot
    # semantics would break parallel-vs-sequential parity by ~4e-3 AUC.
    idx = jnp.clip(jnp.searchsorted(xseg, tclip, side="left"), 1, n - 1)
    x_lo = xseg[idx - 1]
    x_hi = xseg[idx]
    y_lo = yknot[idx - 1]
    y_hi = yknot[idx]
    dx = x_hi - x_lo
    slope = (y_hi - y_lo) / jnp.where(dx > 0, dx, 1.0)
    # The data-dependent select between the multiply and the add serves
    # two purposes: it zeroes the single-knot degenerate case (dx == 0,
    # sklearn returns the constant), and it BLOCKS mul+add FMA
    # contraction — LLVM fuses across optimization_barrier and
    # reduce_precision, but not through a runtime select. scipy rounds
    # the product separately; at a knot-exact ramp t the fused rounding
    # lands back ON the flat-block value, creating a tie sklearn does
    # not have (observed: fused 0.47058824 vs scipy 0.4705882 -> ~4e-3
    # AUC drift in the non-nested calibrated parity, where the eval
    # probs ARE the calibration probs).
    prod = jnp.where(dx > 0, slope * (tclip - x_lo), 0.0)
    return prod + y_lo
