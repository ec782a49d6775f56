"""Native C++ IO tier parity tests (skipped when no compiler/zlib)."""
import numpy as np
import pytest

from pd_fusion.imaging import native
from pd_fusion.imaging.nifti import read_nifti, write_nifti

pytestmark = pytest.mark.skipif(not native.available(), reason="native pd_io not built")


def test_native_read_matches_python(tmp_path):
    rng = np.random.RandomState(0)
    for name, arr in (
        ("f32.nii", rng.rand(11, 13, 9).astype(np.float32)),
        ("f32.nii.gz", rng.rand(12, 8, 10).astype(np.float32)),
        ("i16.nii.gz", (rng.rand(7, 9, 8) * 500).astype(np.int16)),
        ("f64.nii.gz", rng.rand(6, 7, 5).astype(np.float64)),
        ("u8.nii.gz", (rng.rand(7, 6, 9) * 250).astype(np.uint8)),
        ("i32.nii.gz", (rng.rand(5, 8, 7) * 9000 - 200).astype(np.int32)),
    ):
        p = tmp_path / name
        write_nifti(p, arr)
        py = read_nifti(p)
        nat = native.read_nifti_native(p)
        assert nat is not None
        np.testing.assert_allclose(nat, py, atol=1e-5)


def test_native_resize_matches_device_kernel():
    import jax.numpy as jnp

    from pd_fusion.ops.image import resize3d

    rng = np.random.RandomState(1)
    vol = rng.rand(20, 24, 18).astype(np.float32)
    target = (12, 14, 10)
    expect = np.asarray(resize3d(jnp.asarray(vol), target))
    got = native.resize3d_native(vol, target, n_threads=3)
    assert got is not None
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_native_fused_read_resize(tmp_path):
    import jax.numpy as jnp

    from pd_fusion.ops.image import resize3d

    rng = np.random.RandomState(2)
    vol = rng.rand(16, 20, 14).astype(np.float32)
    p = tmp_path / "v.nii.gz"
    write_nifti(p, vol)
    target = (8, 10, 12)
    expect = np.asarray(resize3d(jnp.asarray(read_nifti(p)), target))
    got = native.read_resize_nifti_native(p, target)
    assert got is not None
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_native_prep_slices_matches_python_mirror_adversarial(tmp_path):
    """pd_prep_slices (read+resize+histogram-select percentile normalize+
    extent slice select) against the python mirror on adversarial value
    distributions: all-negative (empty positive mask), constant volumes
    (degenerate hi==lo), near-duplicate values (percentile ranks land in
    one histogram bucket), huge dynamic range, sparse positives, and
    multi-axis selection. The mirror computes percentiles in float64 so
    equality is to float32 eps, not bitwise."""
    from pd_fusion.imaging.pipeline import (
        load_volume,
        normalize_volume_host,
        select_slices_host,
    )

    rng = np.random.RandomState(5)
    shape = (24, 24, 24)
    cases = {
        "uniform": rng.rand(18, 20, 16).astype(np.float32),
        "all_negative": (-1.0 - rng.rand(18, 20, 16)).astype(np.float32),
        "constant": np.full((18, 20, 16), 0.73, np.float32),
        "near_duplicates": np.where(
            rng.rand(18, 20, 16) < 0.95, np.float32(0.5), rng.rand(18, 20, 16)
        ).astype(np.float32),
        "huge_range": (rng.rand(18, 20, 16) * 1e20 + 1e-20).astype(np.float32),
        "sparse_positive": np.where(
            rng.rand(18, 20, 16) < 0.02, rng.rand(18, 20, 16), np.float32(0.0)
        ).astype(np.float32),
    }
    for name, vol in cases.items():
        p = tmp_path / f"{name}.nii.gz"
        write_nifti(p, vol)
        for axes, counts in (([2], [5]), ([0, 1, 2], [3, 4, 5])):
            nat = native.prep_slices_native(p, shape, axes, counts)
            assert nat is not None, name
            resized = load_volume(p, shape)
            normed = normalize_volume_host(resized)
            mirror = np.concatenate(
                [select_slices_host(normed, ax, ct) for ax, ct in zip(axes, counts)],
                axis=0,
            )
            np.testing.assert_allclose(nat, mirror, rtol=2e-5, atol=2e-6,
                                       err_msg=f"{name} axes={axes}")


def test_native_prep_slices_int16_direct_paths(tmp_path):
    """The 16-bit direct-resize fast path (native/pd_io.cpp pd_prep_slices:
    int16/uint16 volumes resize straight from the inflated bytes, skipping
    the full-volume f32 convert) against the python mirror, plus the
    scl_slope!=1 header case which must fall back to convert-then-resize.
    Covers the realistic T1w case the bench volumes use (int16, slope 1)."""
    import struct

    from pd_fusion.imaging.pipeline import (
        load_volume,
        normalize_volume_host,
        select_slices_host,
    )

    rng = np.random.RandomState(11)
    shape = (20, 20, 20)
    vols = {
        # odd extents exercise the AVX masked-tail lanes; negatives make
        # the positive-mask percentile non-trivial
        "i16": (rng.rand(33, 29, 31) * 1200 - 100).astype(np.int16),
        "u16": (rng.rand(33, 29, 31) * 2400).astype(np.uint16),
    }
    for name, vol in vols.items():
        p = tmp_path / f"{name}.nii.gz"
        write_nifti(p, vol)
        nat = native.prep_slices_native(p, shape, [2], [7])
        assert nat is not None, name
        normed = normalize_volume_host(load_volume(p, shape))
        mirror = select_slices_host(normed, 2, 7)
        np.testing.assert_allclose(nat, mirror, rtol=2e-5, atol=2e-6, err_msg=name)

    # scl_slope/inter set -> the fast path must NOT fire (scaling does not
    # commute with the lerp in f32); result must still match the mirror
    import gzip

    p = tmp_path / "i16_scaled.nii.gz"
    write_nifti(p, vols["i16"])
    raw = bytearray(gzip.decompress(p.read_bytes()))
    struct.pack_into("<f", raw, 112, 2.5)  # scl_slope
    struct.pack_into("<f", raw, 116, -7.0)  # scl_inter
    p.write_bytes(gzip.compress(bytes(raw)))
    nat = native.prep_slices_native(p, shape, [2], [7])
    assert nat is not None
    normed = normalize_volume_host(load_volume(p, shape))
    mirror = select_slices_host(normed, 2, 7)
    np.testing.assert_allclose(nat, mirror, rtol=2e-5, atol=2e-6)


def test_native_fused_read_resize_int16(tmp_path):
    """pd_read_resize_nifti's 16-bit direct path vs python read+resize."""
    import jax.numpy as jnp

    from pd_fusion.ops.image import resize3d

    rng = np.random.RandomState(12)
    vol = (rng.rand(17, 21, 15) * 900 - 50).astype(np.int16)
    p = tmp_path / "v16.nii.gz"
    write_nifti(p, vol)
    target = (9, 11, 13)
    expect = np.asarray(resize3d(jnp.asarray(read_nifti(p)), target))
    got = native.read_resize_nifti_native(p, target)
    assert got is not None
    # values span ~[-50, 850]: the f32 atol scales with the range
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-3)


def test_native_prep_slices_f16_bitwise_matches_astype(tmp_path):
    """pd_prep_slices_f16 (wire-mode half output emitted in the C++
    gather epilogue) must equal the f32 output's numpy astype(np.float16)
    BITWISE — both are IEEE round-to-nearest-even — across adversarial
    distributions incl. values that land in the half-subnormal range and
    exact ties at the 10-bit rounding boundary."""
    rng = np.random.RandomState(7)
    shape = (24, 24, 24)
    cases = {
        "uniform": rng.rand(18, 20, 16).astype(np.float32),
        "tiny_positive": (rng.rand(18, 20, 16) * 1e-4).astype(np.float32),
        "sparse_positive": np.where(
            rng.rand(18, 20, 16) < 0.02, rng.rand(18, 20, 16), np.float32(0.0)
        ).astype(np.float32),
        "constant": np.full((18, 20, 16), 0.73, np.float32),
        "int16_like": (rng.rand(18, 20, 16) * 900 - 50).astype(np.int16).astype(np.float32),
    }
    for name, vol in cases.items():
        p = tmp_path / f"{name}.nii.gz"
        write_nifti(p, vol)
        for axes, counts in (([2], [5]), ([0, 1, 2], [3, 4, 5])):
            f32 = native.prep_slices_native(p, shape, axes, counts)
            f16 = native.prep_slices_native(p, shape, axes, counts, out_dtype=np.float16)
            assert f32 is not None and f16 is not None, name
            assert f16.dtype == np.float16
            np.testing.assert_array_equal(
                f16.view(np.uint16),
                f32.astype(np.float16).view(np.uint16),
                err_msg=f"{name} axes={axes}",
            )


def test_slices_loader_out_dtype_fallback_paths(tmp_path, monkeypatch):
    """make_slices_loader(out_dtype=f16) yields f16 payloads on every
    tier: native-f16, native-f32+astype (f16 symbol unavailable), and the
    pure-python mirror (native disabled) — all value-identical."""
    from pd_fusion.imaging.pipeline import make_slices_loader

    rng = np.random.RandomState(11)
    vol = rng.rand(18, 20, 16).astype(np.float32)
    p = tmp_path / "v.nii.gz"
    write_nifti(p, vol)
    shape, axes, counts = (24, 24, 24), [0, 2], [3, 4]

    loader = make_slices_loader(shape, axes, counts, out_dtype=np.float16)
    native_f16 = loader(p)
    assert native_f16.dtype == np.float16

    real_prep = native.prep_slices_native

    def no_f16(path, tshape, ax, ct, n_threads=2, out_dtype=np.float32):
        if np.dtype(out_dtype) == np.float16:
            return None  # simulate a library predating pd_prep_slices_f16
        return real_prep(path, tshape, ax, ct, n_threads, out_dtype)

    monkeypatch.setattr(native, "prep_slices_native", no_f16)
    astype_f16 = make_slices_loader(shape, axes, counts, out_dtype=np.float16)(p)
    monkeypatch.undo()
    assert astype_f16.dtype == np.float16
    np.testing.assert_array_equal(
        native_f16.view(np.uint16), astype_f16.view(np.uint16)
    )

    monkeypatch.setattr(native, "prep_slices_native", lambda *a, **k: None)
    python_f16 = make_slices_loader(shape, axes, counts, out_dtype=np.float16)(p)
    monkeypatch.undo()
    assert python_f16.dtype == np.float16
    # python mirror computes percentiles in float64 -> f32-eps difference
    # BEFORE the half rounding; equality after rounding is to 1 ulp of f16
    np.testing.assert_allclose(
        python_f16.astype(np.float32), native_f16.astype(np.float32), atol=1e-3
    )


def test_native_slice_indices_match_numpy_linspace_quirks(tmp_path):
    """np.linspace(lo, hi, n) computes fl64(fl64(k*step) + lo), which
    truncates one index LOWER than the algebraically equal
    lo + d*(k/(n-1)) at some (lo, extent) pairs (the rounding lands just
    below an integer). The native gather must reproduce the python
    mirror's np.linspace indices operation-for-operation; the old
    lo + d*(k/q) association picked a different slice at these extents."""
    from pd_fusion.imaging.pipeline import (
        load_volume,
        normalize_volume_host,
        select_slices_host,
    )

    rng = np.random.RandomState(11)
    count = 24
    # (lo, extent) pairs where trunc(np.linspace) != lo + d*(k/q) trunc
    for lo, d, n_axis in ((0, 46, 47), (1, 23, 30), (0, 92, 96)):
        vol = np.zeros((n_axis, 8, 8), np.float32)
        band = 1.0 + rng.rand(d + 1, 8, 8).astype(np.float32)
        band[0, 0, 0] = band.max() + 1.0   # keep both band endpoints
        band[-1, 0, 0] = band.max() + 1.0  # above the low clip
        vol[lo : lo + d + 1] = band
        p = tmp_path / f"quirk_{lo}_{d}.nii.gz"
        write_nifti(p, vol)
        shape = vol.shape  # identity resize: extent survives exactly
        nat = native.prep_slices_native(p, shape, [0], [count])
        assert nat is not None
        normed = normalize_volume_host(load_volume(p, shape))
        mirror = select_slices_host(normed, 0, count)
        np.testing.assert_allclose(
            nat, mirror, rtol=2e-5, atol=2e-6, err_msg=f"lo={lo} d={d}"
        )
        # the pair actually exercises a quirk: the two formulas disagree
        k = np.arange(count)
        ls = np.trunc(np.linspace(float(lo), float(lo + d), count)).astype(int)
        assert not np.array_equal(ls, (lo + d * (k / (count - 1))).astype(int))
