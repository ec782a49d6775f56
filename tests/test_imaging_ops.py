"""Imaging kernel parity tests vs the scipy/torch oracles the reference
uses (reference data/openneuro_features.py)."""
import numpy as np
import pytest

from pd_fusion.imaging.nifti import read_nifti, write_nifti
from pd_fusion.ops.image import (
    affine2d_batch,
    percentile_normalize,
    resize2d_halfpix,
    resize3d,
    take_slices,
    zscore_volume,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(13, 17, 11).astype(np.float32)
    for name in ("a.nii", "b.nii.gz"):
        p = tmp_path / name
        write_nifti(p, vol)
        back = read_nifti(p)
        np.testing.assert_allclose(back, vol, atol=1e-6)


def test_nifti_int16_with_scaling(tmp_path):
    rng = np.random.RandomState(1)
    vol = (rng.rand(8, 9, 10) * 1000).astype(np.int16)
    p = tmp_path / "c.nii"
    write_nifti(p, vol)
    back = read_nifti(p)
    np.testing.assert_allclose(back, vol.astype(np.float32), atol=1e-3)


def test_resize3d_matches_scipy_zoom():
    from scipy import ndimage

    rng = np.random.RandomState(0)
    vol = rng.rand(20, 24, 18).astype(np.float32)
    target = (12, 12, 12)
    zoom = [t / s for t, s in zip(target, vol.shape)]
    expect = ndimage.zoom(vol, zoom, order=1)
    got = np.asarray(resize3d(vol, target))
    assert got.shape == expect.shape
    # scipy's spline prefilter is identity at order=1; grids match
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_resize2d_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.rand(4, 30, 40).astype(np.float32)
    expect = (
        F.interpolate(
            torch.from_numpy(img).unsqueeze(1), size=(224, 224), mode="bilinear",
            align_corners=False,
        )
        .squeeze(1)
        .numpy()
    )
    got = np.asarray(resize2d_halfpix(img, (224, 224)))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_percentile_normalize_matches_reference_semantics():
    rng = np.random.RandomState(0)
    vol = rng.rand(16, 16, 16).astype(np.float32) * 100
    vol[vol < 30] = 0.0  # background
    mask = vol > 0
    vals = vol[mask]
    lo, hi = np.percentile(vals, 1), np.percentile(vals, 99)
    expect = np.clip(vol, lo, hi)
    expect = (expect - lo) / (hi - lo + 1e-6)
    got = np.asarray(percentile_normalize(vol))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_take_slices_matches_reference_when_extent_sufficient():
    rng = np.random.RandomState(0)
    vol = np.zeros((32, 32, 32), np.float32)
    vol[4:28, 4:28, 6:30] = rng.rand(24, 24, 24) + 0.1
    for axis in (0, 1, 2):
        # numpy oracle (reference _select_slices semantics)
        other = tuple(i for i in range(3) if i != axis)
        nz = np.any(vol > 0, axis=other)
        idxs = np.where(nz)[0]
        lo, hi = idxs[0], idxs[-1]
        count = 8
        indices = np.linspace(lo, hi, count).astype(int)
        expect = np.take(vol, indices, axis=axis)
        if axis == 1:
            expect = expect.transpose(1, 0, 2)
        elif axis == 2:
            expect = expect.transpose(2, 0, 1)
        got = np.asarray(take_slices(vol, axis, count))
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_affine2d_matches_scipy():
    from scipy import ndimage

    rng = np.random.RandomState(0)
    img = rng.rand(40, 44).astype(np.float32)
    angle, translate = 4.0, np.array([1.5, -2.0])
    theta = np.deg2rad(angle)
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    center = np.array(img.shape) / 2.0
    offset = center - rot @ center + translate
    expect = ndimage.affine_transform(img, rot, offset=offset, order=1, mode="constant", cval=0.0)
    got = np.asarray(affine2d_batch(img[None], np.float32(angle), translate.astype(np.float32)))[0]
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_zscore_volume():
    rng = np.random.RandomState(0)
    vol = rng.rand(8, 8, 8).astype(np.float32) * 7 + 3
    got = np.asarray(zscore_volume(vol))
    np.testing.assert_allclose(got, (vol - vol.mean()) / (vol.std() + 1e-6), atol=1e-4)


def test_bf16_embed_close_to_f32():
    import jax
    import numpy as np

    from pd_fusion.imaging.pipeline import embed_slices_batch
    from pd_fusion.nn.resnet import init_resnet

    rng = np.random.RandomState(0)
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    slices = rng.rand(2, 4, 32, 32).astype(np.float32)
    mean = np.array([0.5] * 3, np.float32)
    std = np.array([0.5] * 3, np.float32)
    e32 = np.asarray(embed_slices_batch(params, slices, mean, std, "resnet18", 32, False))
    e16 = np.asarray(
        embed_slices_batch(params, slices, mean, std, "resnet18", 32, False, "bfloat16")
    )
    assert e16.dtype == np.float32
    for a, b in zip(e32, e16):
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.99


def test_select_slice_indices_exact_at_former_f32_failures():
    """The f32 lo+(hi-lo)*linspace formula truncated one index low at
    extents where k*(d/(n-1)) rounds just below an integer in f32 (e.g.
    d=92, count=24: 92*(6/23) = 23.999998f -> 23). The integer-exact
    formula must return floor(k*d/(n-1)) for every k."""
    from pd_fusion.ops.image import select_slice_indices

    count = 24
    for lo, d in [(2, 23), (0, 46), (10, 69), (3, 92), (0, 95)]:
        n = lo + d + 5
        vol = np.zeros((n, 4, 4), np.float32)
        vol[lo : lo + d + 1] = 1.0
        got = np.asarray(select_slice_indices(vol, 0, count))
        k = np.arange(count)
        want = lo + (k * d) // (count - 1)
        np.testing.assert_array_equal(got, want)


def test_masked_percentile_exact_at_large_counts():
    """The fractional rank used to be computed in f32, whose ulp exceeds
    0.25 above ~8.4M entries — the floor index then differed from
    np.percentile's f64 virtual index. The integer-arithmetic rank must
    agree with np.percentile at any count (checked in f32)."""
    import jax.numpy as jnp

    from pd_fusion.ops.image import _masked_percentile

    # counts straddling f32-exactness limits, incl. count-1 % 100 == 0
    for count in (8_400_001, 8_400_017, 9_000_001, 2**23 + 3):
        vals = np.arange(count, dtype=np.float32)  # identity: value == rank
        s = jnp.asarray(vals)
        for q in (1, 10, 50, 90, 99):
            got = float(_masked_percentile(s, jnp.int32(count), q))
            want = np.float32(np.percentile(vals.astype(np.float64), q))
            assert got == pytest.approx(float(want), rel=2e-7), (count, q)


def test_resize3d_integer_input_promoted_not_nearest_neighbor():
    from pd_fusion.ops.image import resize3d

    rng = np.random.RandomState(0)
    vol16 = (rng.rand(9, 9, 9) * 1000).astype(np.int16)
    got = np.asarray(resize3d(vol16, (17, 17, 17)))
    want = np.asarray(resize3d(vol16.astype(np.float32), (17, 17, 17)))
    np.testing.assert_array_equal(got, want)
    # discrimination: true interpolation, not nearest-neighbor
    assert not np.all(np.isin(got, vol16.astype(np.float32)))


def test_volume_features_constant_volume_matches_numpy_histogram():
    """np.histogram expands a degenerate (lo == hi) range to
    (lo-0.5, hi+0.5); the old subnormal width guard was flushed to zero
    by XLA and emitted inf/nan density features."""
    from pd_fusion.ops.volume_stats import simple_volume_features

    vol = np.full((6, 6, 6), 2.5, np.float32)
    feats = np.asarray(simple_volume_features(vol, hist_bins=10, grid_size=2))
    assert np.isfinite(feats).all()
    hist = feats[7:17]
    want, _ = np.histogram(
        np.full(216, 2.5), bins=10, range=(2.5, 2.5), density=True
    )
    np.testing.assert_allclose(hist, want, atol=1e-6)
