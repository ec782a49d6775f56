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
