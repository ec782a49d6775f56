"""Device image kernels: resampling, normalization, slicing, augmentation.

These replace the reference's scipy.ndimage host calls (reference data/
openneuro_features.py: ``ndimage.zoom`` :30, percentile normalize
:121-132, slice select :134-151, ``ndimage.affine_transform`` :166-178)
with jitted XLA programs so the whole volume -> slices -> ResNet pipeline
runs on device with no host round-trips.

Numerical contracts:
- ``resize3d`` matches ``scipy.ndimage.zoom(order=1)`` (align-corners
  grid: output j samples input at j*(in-1)/(out-1)), implemented as three
  separable 1-D linear interpolations (gather + lerp — VPU work that XLA
  fuses; no MXU needed).
- ``resize2d_halfpix`` matches ``torch.nn.functional.interpolate(mode=
  'bilinear', align_corners=False)`` (half-pixel centers, edge clamp).
- ``percentile_normalize`` reproduces the 1-99% clip over the nonzero
  mask via one device sort (masked values sorted to +inf, index from the
  mask count, numpy 'linear' interpolation semantics).
- ``select_slice_indices``/``take_slices``: nonzero-extent linspace. The
  reference SHRINKS slice_count when the extent is small (:146-147);
  for static shapes we keep the count and allow duplicate indices —
  identical output whenever extent >= slice_count (the realistic case),
  duplicates otherwise (documented deviation).
- ``affine2d_batch`` = rotation about the center + translation with
  bilinear sampling and zero padding, equal to the reference's
  ``ndimage.affine_transform(rot, offset, order=1, mode='constant')``.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _resize_axis_ac(x: Array, axis: int, out_len: int) -> Array:
    """Align-corners linear resize along one axis (scipy zoom order=1)."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    if in_len == 1:
        return jnp.repeat(x, out_len, axis=axis)
    pos = jnp.linspace(0.0, in_len - 1.0, out_len)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_len - 2)
    t = (pos - i0).astype(x.dtype)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    t = t.reshape(shape)
    return a * (1.0 - t) + b * t


@partial(jax.jit, static_argnames=("target_shape",))
def resize3d(vol: Array, target_shape: Tuple[int, int, int]) -> Array:
    """Trilinear volume resize with scipy-zoom grid semantics. Integer
    inputs (e.g. raw int16 NIfTI voxels) are promoted to f32 first — the
    lerp weight t is cast to the input dtype, which would silently
    degrade an integer input to nearest-neighbor."""
    if not jnp.issubdtype(vol.dtype, jnp.floating):
        vol = vol.astype(jnp.float32)
    out = vol
    for axis in range(3):
        out = _resize_axis_ac(out, axis, target_shape[axis])
    return out


def _resize_axis_halfpix(x: Array, axis: int, out_len: int) -> Array:
    """Half-pixel-centers linear resize (torch bilinear align_corners=False)."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    scale = in_len / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(in_len - 2, 0))
    t = (pos - i0).astype(x.dtype)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, jnp.minimum(i0 + 1, in_len - 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    t = t.reshape(shape)
    return a * (1.0 - t) + b * t


@partial(jax.jit, static_argnames=("size",))
def resize2d_halfpix(imgs: Array, size: Tuple[int, int]) -> Array:
    """imgs [..., H, W] -> [..., size0, size1], torch-bilinear semantics."""
    if not jnp.issubdtype(imgs.dtype, jnp.floating):
        imgs = imgs.astype(jnp.float32)
    out = _resize_axis_halfpix(imgs, imgs.ndim - 2, size[0])
    out = _resize_axis_halfpix(out, out.ndim - 1, size[1])
    return out


def _masked_percentile(sorted_vals: Array, count: Array, q: int) -> Array:
    """Percentile with numpy 'linear' interpolation over the first `count`
    entries of an ascending-sorted array. ``count`` is an int32 scalar and
    ``q`` an INTEGER percentile. The fractional rank (count-1)*q/100 is
    computed with exact integer arithmetic, split to stay inside int32
    (count can be ~2^24 voxels and beyond, where the old f32 computation
    had ulp 0.5+ and picked off-by-one indices vs np.percentile). The
    integer floor provably equals numpy's float64 virtual index for every
    q used here: float64(q/100) rounds UP for q in {1,10,50,90,99}, so
    exact-integer ranks stay exact, and non-integer ranks sit >= 1/100
    away from an integer — far beyond f64 rounding error."""
    k = count - 1
    a = k // 100
    r = k - a * 100
    rq = r * q
    lo = a * q + rq // 100
    rem = rq - (rq // 100) * 100
    t = rem.astype(sorted_vals.dtype) / 100.0
    hi = jnp.where(rem > 0, lo + 1, lo)
    return sorted_vals[lo] * (1.0 - t) + sorted_vals[hi] * t


@jax.jit
def percentile_normalize(vol: Array) -> Array:
    """1-99 percentile clip over the nonzero mask -> [0, 1] (reference
    _normalize_volume_for_resnet). Falls back to global min/max when the
    volume has no positive voxels."""
    flat = vol.reshape(-1)
    mask = flat > 0
    count = jnp.sum(mask)
    big = jnp.finfo(flat.dtype).max
    sorted_masked = jnp.sort(jnp.where(mask, flat, big))
    cnt_i = jnp.maximum(count, 1).astype(jnp.int32)
    lo_m = _masked_percentile(sorted_masked, cnt_i, 1)
    hi_m = _masked_percentile(sorted_masked, cnt_i, 99)
    lo = jnp.where(count > 0, lo_m, jnp.min(flat))
    hi = jnp.where(count > 0, hi_m, jnp.max(flat))
    out = jnp.clip(vol, lo, hi)
    return ((out - lo) / (hi - lo + 1e-6)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("axis", "slice_count"))
def select_slice_indices(vol: Array, axis: int, slice_count: int) -> Array:
    """Nonzero-extent linspace indices along `axis` (static count).

    Computed as ``lo + floor(k*(hi-lo) / (n-1))`` with EXACT int32
    arithmetic. The previous f32 ``lo + (hi-lo)*linspace(0,1,n)`` lost
    the truncation at many realistic (extent, count) pairs (e.g. extent
    92 at count 24: 92*(6/23 in f32) = 23.999998 -> 23 instead of 24).
    Documented deviation: the reference truncates a float64
    ``np.linspace(lo, hi, n)`` (openneuro_features.py:144) = fl64(k *
    fl64(d/(n-1))) + lo, whose rounding can land just below an exact
    integer; a brute-force scan over lo<229, extent<256 found the
    integer formula equal to np.linspace for counts 2-48 and differing
    at 52 of 58k (lo, extent) pairs for count 64 (one index lower). The
    host-prep and native paths replicate numpy's float64 computation
    operation-for-operation; this f32-device path (PD_FUSION_DEVICE_
    PREP=1, non-default) uses the exact rational floor instead — f64 is
    unavailable on the TPU.
    """
    other = tuple(i for i in range(3) if i != axis)
    nonzero = jnp.any(vol > 0, axis=other)
    n = vol.shape[axis]
    idx = jnp.arange(n)
    any_nz = jnp.any(nonzero)
    lo = jnp.where(any_nz, jnp.min(jnp.where(nonzero, idx, n)), 0)
    hi = jnp.where(any_nz, jnp.max(jnp.where(nonzero, idx, -1)), n - 1)
    if slice_count == 1:
        return lo.astype(jnp.int32)[None]
    k = jnp.arange(slice_count, dtype=jnp.int32)
    d = (hi - lo).astype(jnp.int32)
    return (lo.astype(jnp.int32) + (k * d) // jnp.int32(slice_count - 1)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("axis", "slice_count"))
def take_slices(vol: Array, axis: int, slice_count: int) -> Array:
    """-> [slice_count, H, W] 2-D slices along `axis` with leading slice dim."""
    indices = select_slice_indices(vol, axis, slice_count)
    out = jnp.take(vol, indices, axis=axis)
    if axis == 0:
        return out
    if axis == 1:
        return jnp.transpose(out, (1, 0, 2))
    return jnp.transpose(out, (2, 0, 1))


@jax.jit
def affine2d_batch(slices: Array, angle_deg: Array, translate: Array) -> Array:
    """Rotate about the image center + translate, bilinear, zero-padded.

    slices: [N, H, W]; angle_deg scalar; translate [2] (pixels). Matches
    scipy affine_transform's convention: output coord o maps to input
    coord rot @ o + offset where offset = center - rot @ center +
    translate.
    """
    n, h, w = slices.shape
    theta = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, -s], [s, c]])
    center = jnp.array([h, w], slices.dtype) / 2.0
    offset = center - rot @ center + translate

    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_i = rot[0, 0] * ii + rot[0, 1] * jj + offset[0]
    src_j = rot[1, 0] * ii + rot[1, 1] * jj + offset[1]

    i0 = jnp.floor(src_i).astype(jnp.int32)
    j0 = jnp.floor(src_j).astype(jnp.int32)
    ti = src_i - i0
    tj = src_j - j0

    def gather(img, ia, ja):
        valid = (ia >= 0) & (ia < h) & (ja >= 0) & (ja < w)
        ia_c = jnp.clip(ia, 0, h - 1)
        ja_c = jnp.clip(ja, 0, w - 1)
        return jnp.where(valid, img[ia_c, ja_c], 0.0)

    # scipy mode='constant' returns cval for ANY coordinate outside
    # [0, size-1] (no partial blending at the border) — reproduce that
    in_bounds = (src_i >= 0) & (src_i <= h - 1) & (src_j >= 0) & (src_j <= w - 1)

    def sample_one(img):
        v00 = gather(img, i0, j0)
        v01 = gather(img, i0, j0 + 1)
        v10 = gather(img, i0 + 1, j0)
        v11 = gather(img, i0 + 1, j0 + 1)
        val = (
            v00 * (1 - ti) * (1 - tj)
            + v01 * (1 - ti) * tj
            + v10 * ti * (1 - tj)
            + v11 * ti * tj
        )
        return jnp.where(in_bounds, val, 0.0)

    return jax.vmap(sample_one)(slices)


@partial(jax.jit, static_argnames=("input_size",))
def slices_to_imagenet_batch(
    slices: Array, input_size: int, mean: Array, std: Array
) -> Array:
    """[N, H, W] grayscale slices -> [N, input_size, input_size, 3] NHWC
    ImageNet-normalized ResNet input (bilinear half-pixel resize, channel
    repeat, per-channel mean/std). One fused program replacing the
    reference's interpolate/repeat/normalize torch chain."""
    x = resize2d_halfpix(slices, (input_size, input_size))  # [N, S, S]
    x = jnp.repeat(x[..., None], 3, axis=-1)  # NHWC
    return (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)


@jax.jit
def zscore_volume(vol: Array) -> Array:
    """Z-score normalization over the whole volume (reference
    build_cnn3d_embeddings.py:36-41)."""
    mu = jnp.mean(vol)
    sd = jnp.std(vol)
    return ((vol - mu) / (sd + 1e-6)).astype(jnp.float32)
