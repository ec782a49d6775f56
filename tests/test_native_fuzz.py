"""Corrupt-input robustness of the native NIfTI tier (native/pd_io.cpp).

A production IO tier must fail SOFT on corrupt/malicious files: return an
error code so the python wrappers yield None (callers fall back to the
python reader), never abort/segfault the host process. Fuzz-found bug
pinned here: vox_offset = 2^64 - 2^40 with exactly 2^40 claimed uint8
voxels made offset + count*elem wrap to 0 past the size check, then the
convert-buffer allocation threw bad_alloc through the C ABI ->
std::terminate (SIGABRT). Reference reader behavior: nibabel raises a
python exception on such files (/root/reference/src/pd_fusion/data/
openneuro_features.py:22-32); our contract is None + fallback.
"""
import gzip
import struct
import subprocess
import sys

import numpy as np
import pytest

from pd_fusion.imaging import native
from pd_fusion.imaging.nifti import write_nifti


def _base_bytes(tmp_path):
    p = tmp_path / "base.nii.gz"
    rng = np.random.RandomState(0)
    write_nifti(p, (rng.rand(12, 10, 8) * 100).astype(np.int16))
    return gzip.open(p, "rb").read()


def _corpus(tmp_path):
    """Deterministic adversarial corpus; returns list of file paths."""
    raw = _base_bytes(tmp_path)
    cases = {}

    def header(mods):
        hb = bytearray(raw[:352])
        for (fmt, off), val in mods.items():
            struct.pack_into(fmt, hb, off, *(val if isinstance(val, tuple) else (val,)))
        return bytes(hb) + raw[352:]

    # size-check wrap: offset + count*elem == 2^64 exactly (see module doc)
    cases["wrap_exact"] = header({
        ("<h", 40): 3, ("<hhh", 42): (16384, 16384, 4096),
        ("<h", 70): 2, ("<f", 108): float(2**64 - 2**40),
    })
    cases["nan_offset"] = header({("<f", 108): float("nan")})
    cases["neg_offset"] = header({("<f", 108): -1e9})
    cases["huge_count"] = header({
        ("<h", 40): 7, ("<hhhhhhh", 42): (32767,) * 7,
    })
    for cut in (10, 200, 347, 349, len(raw) // 2):
        cases[f"trunc_{cut}"] = raw[:cut]
    for i in range(12):
        r = np.random.RandomState(100 + i)
        b = bytearray(raw)
        for _ in range(4):
            b[r.randint(0, 352)] = r.randint(0, 256)
        cases[f"hdrflip_{i}"] = bytes(b)

    paths = []
    for name, payload in cases.items():
        p = tmp_path / f"{name}.nii.gz"
        p.write_bytes(gzip.compress(payload))
        paths.append(str(p))
    # compressed-domain corruption: forged ISIZE trailer + stream flips
    comp = bytearray(gzip.compress(raw))
    comp[-4:] = struct.pack("<I", 0xFFFFFFFF)
    p = tmp_path / "forged_isize.nii.gz"
    p.write_bytes(bytes(comp))
    paths.append(str(p))
    for i in range(8):
        r = np.random.RandomState(200 + i)
        b = bytearray(gzip.compress(raw))
        for _ in range(4):
            b[r.randint(0, len(b))] = r.randint(0, 256)
        p = tmp_path / f"gzflip_{i}.nii.gz"
        p.write_bytes(bytes(b))
        paths.append(str(p))
    return paths


_DRIVER = """
import sys
from pd_fusion.imaging import native
if not native.available():
    print("native-unavailable")
    sys.exit(0)
for p in sys.argv[1:]:
    native.read_nifti_native(p)
    native.prep_slices_native(p, (16, 16, 16), [2], [4])
    native.read_resize_nifti_native(p, (8, 8, 8))
print("survived", len(sys.argv) - 1)
"""


def test_corrupt_nifti_never_crashes_process(tmp_path):
    """Every entry point survives the whole corpus in one subprocess —
    an abort/segfault (regression) fails here instead of killing pytest."""
    paths = _corpus(tmp_path)
    import os

    import pd_fusion

    env = dict(os.environ)
    src_dir = str(os.path.dirname(os.path.dirname(pd_fusion.__file__)))
    env["PYTHONPATH"] = src_dir + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, *paths],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, (
        f"native tier crashed on corrupt input (rc={proc.returncode}):\n"
        f"{proc.stdout[-500:]}\n{proc.stderr[-2000:]}"
    )
    if "native-unavailable" in proc.stdout:
        pytest.skip("native tier failed to load in the subprocess — corpus not exercised")
    assert "survived" in proc.stdout, proc.stdout[-500:]


def test_crafted_overflow_headers_fail_soft(tmp_path):
    """The specific fuzz-found cases return None in-process (the soft-fail
    contract the pipeline's fallback chain relies on)."""
    if not native.available():
        pytest.skip("native tier unavailable")
    corpus = _corpus(tmp_path)
    for name in ("wrap_exact", "nan_offset", "neg_offset", "huge_count"):
        paths = [p for p in corpus if name in p]
        assert paths, name
        assert native.prep_slices_native(paths[0], (16, 16, 16), [2], [4]) is None, name
        assert native.read_nifti_native(paths[0]) is None, name


def _be_nifti_bytes():
    """Hand-built big-endian NIfTI-1 (swap path) with known int16 voxels."""
    hdr = bytearray(352)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">h", hdr, 40, 3)
    struct.pack_into(">hhh", hdr, 42, 12, 10, 8)
    struct.pack_into(">h", hdr, 70, 4)  # int16
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">f", hdr, 112, 1.0)
    hdr[344:348] = b"n+1\x00"
    vox = (np.random.RandomState(3).rand(8, 10, 12) * 100).astype(">i2")
    return bytes(hdr) + vox.tobytes(), vox.astype(np.int16)


def test_byteswapped_nifti_reads_and_survives_mutation(tmp_path):
    """The swap (big-endian) parse/convert paths: a valid BE file reads
    value-exactly, and 20 seeded mutations of it fail soft."""
    if not native.available():
        pytest.skip("native tier unavailable")
    raw, vox = _be_nifti_bytes()
    base = tmp_path / "be.nii.gz"
    base.write_bytes(gzip.compress(raw))
    got = native.read_nifti_native(base)
    assert got is not None
    # F-order x-fastest buffer == C-order [z,y,x] source -> [x,y,z] view
    np.testing.assert_array_equal(got, vox.astype(np.float32).transpose(2, 1, 0))

    paths = []
    for i in range(20):
        r = np.random.RandomState(3000 + i)
        b = bytearray(raw)
        for _ in range(r.randint(1, 8)):
            b[r.randint(0, len(b))] = r.randint(0, 256)
        if r.rand() < 0.25:
            b = b[: r.randint(1, len(b))]
        p = tmp_path / f"be_m{i}.nii.gz"
        p.write_bytes(gzip.compress(bytes(b)))
        paths.append(str(p))
    import os

    import pd_fusion

    env = dict(os.environ)
    src_dir = str(os.path.dirname(os.path.dirname(pd_fusion.__file__)))
    env["PYTHONPATH"] = src_dir + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, *paths],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
