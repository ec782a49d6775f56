"""ctypes bindings for the native host-IO tier (native/pd_io.cpp).

Auto-builds the shared library on first use when a compiler is present;
every entry point has a pure-Python fallback (imaging.nifti /
ops.image.resize3d) so the framework works without the native tier —
it's a throughput upgrade, not a dependency.
"""
import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("pd_fusion")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpd_io.so"
_lib = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("PD_FUSION_NO_NATIVE"):
        return None
    src = _NATIVE_DIR / "pd_io.cpp"
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if not _LIB_PATH.exists() or stale:
        build = _NATIVE_DIR / "build.sh"
        if not build.exists():
            if stale:
                return None  # stale lib and no way to rebuild it
        else:
            try:
                subprocess.run(["bash", str(build)], check=True, capture_output=True, timeout=120)
            except Exception as e:
                # never serve a lib older than its source
                logger.info(f"native pd_io build skipped: {e}")
                return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.pd_read_nifti.restype = ctypes.c_int
        lib.pd_read_nifti.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pd_resize3d.restype = None
        lib.pd_resize3d.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.pd_read_resize_nifti.restype = ctypes.c_int
        lib.pd_read_resize_nifti.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.pd_prep_slices.restype = ctypes.c_int
        lib.pd_prep_slices.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        # f16 variant may be absent from an older cached build — the
        # callers fall back to f32 + numpy astype when it is
        if hasattr(lib, "pd_prep_slices_f16"):
            lib.pd_prep_slices_f16.restype = ctypes.c_int
            lib.pd_prep_slices_f16.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
            ]
        _lib = lib
        logger.info(f"native pd_io loaded from {_LIB_PATH}")
    except Exception as e:  # pragma: no cover
        logger.info(f"native pd_io unavailable: {e}")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_nifti_native(path) -> Optional[np.ndarray]:
    """Native NIfTI read -> float32 [x, y, z]; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 3)()
    rc = lib.pd_read_nifti(str(path).encode(), dims, None)
    if rc != 0:
        return None
    shape = (dims[0], dims[1], dims[2])
    # Fortran voxel buffer == C-order reversed dims; build F-order view
    try:
        buf = np.empty(int(np.prod(shape)), np.float32)
    except MemoryError:
        # corrupt headers can claim absurd dims; the full native read
        # below would reject the file (rc 8) — fail soft the same way
        return None
    rc = lib.pd_read_nifti(
        str(path).encode(), dims, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if rc != 0:
        return None
    return buf.reshape(shape, order="F")


def read_resize_nifti_native(path, target_shape: Tuple[int, int, int],
                             n_threads: int = 4) -> Optional[np.ndarray]:
    """Fused native read + align-corners trilinear resize -> [t0, t1, t2]."""
    lib = _load()
    if lib is None:
        return None
    t0, t1, t2 = (int(t) for t in target_shape)
    out = np.empty(t0 * t1 * t2, np.float32)
    rc = lib.pd_read_resize_nifti(
        str(path).encode(), t0, t1, t2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if rc != 0:
        return None
    return out.reshape((t0, t1, t2), order="F")


def resize3d_native(vol: np.ndarray, target_shape: Tuple[int, int, int],
                    n_threads: int = 4) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    t0, t1, t2 = (int(t) for t in target_shape)
    out = np.empty((t0, t1, t2), np.float32)
    lib.pd_resize3d(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.shape[0], vol.shape[1], vol.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t0, t1, t2, n_threads,
    )
    return out


def prep_slices_native(path, target_shape, axes, counts,
                       n_threads: int = 2, out_dtype=np.float32) -> Optional[np.ndarray]:
    """Fully native embed prep: read + resize + percentile-normalize +
    multi-axis slice select -> [sum(counts), h, w] (cubic targets).
    Mirrors imaging.pipeline's host prep exactly (equality-tested).
    out_dtype float32 (exact mirror) or float16 (wire mode: binary16 bits
    emitted in the C++ gather epilogue, bitwise-equal to
    float32-output.astype(np.float16)); float16 falls back to None when
    the loaded library predates the pd_prep_slices_f16 symbol."""
    lib = _load()
    if lib is None:
        return None
    f16 = np.dtype(out_dtype) == np.float16
    if f16 and not hasattr(lib, "pd_prep_slices_f16"):
        return None
    t0, t1, t2 = (int(t) for t in target_shape)
    if not (t0 == t1 == t2) and len(axes) > 1:
        return None
    axes_arr = (ctypes.c_int64 * len(axes))(*[int(a) for a in axes])
    counts_arr = (ctypes.c_int64 * len(counts))(*[int(c) for c in counts])
    per_axis_dims = {0: (t1, t2), 1: (t0, t2), 2: (t0, t1)}
    h, w = per_axis_dims[int(axes[0])]
    total = sum(int(c) for c in counts)
    if f16:
        out = np.empty(total * h * w, np.float16)
        rc = lib.pd_prep_slices_f16(
            str(path).encode(), t0, t1, t2, axes_arr, counts_arr, len(axes),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_threads,
        )
    else:
        out = np.empty(total * h * w, np.float32)
        rc = lib.pd_prep_slices(
            str(path).encode(), t0, t1, t2, axes_arr, counts_arr, len(axes),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
        )
    if rc != 0:
        return None
    return out.reshape((total, h, w))
