"""Device isotonic regression vs sklearn's PAV (the oracle the
calibration wrapper uses — reference calibrate.py:7-56).

The device op (ops/isotonic.py) must reproduce
IsotonicRegression(out_of_bounds="clip").fit(x, y).transform(t)
including duplicate-x averaging, interpolation between knots, and
clipping outside the training range — it replaces the host fit inside
the one-dispatch calibrated CV programs.
"""
import numpy as np
import pytest
from sklearn.isotonic import IsotonicRegression

import jax
import jax.numpy as jnp

from pd_fusion.ops.isotonic import isotonic_fit_transform


def _oracle(x, y, t):
    iso = IsotonicRegression(out_of_bounds="clip")
    iso.fit(x, y)
    return iso.transform(t)


def _device(x, y, t, n_pad=0):
    n = len(x) + n_pad
    xc = np.zeros(n, np.float32)
    yc = np.zeros(n, np.float32)
    valid = np.zeros(n, bool)
    xc[: len(x)] = x
    yc[: len(x)] = y
    valid[: len(x)] = True
    if n_pad:  # garbage in the pad lanes must not matter
        xc[len(x):] = np.linspace(-5, 5, n_pad)
        yc[len(x):] = 7.0
    out = jax.jit(isotonic_fit_transform)(
        jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(valid), jnp.asarray(t)
    )
    return np.asarray(out)


def test_bitexact_on_cpu_mostly():
    """The transform replicates scipy interp1d._call_linear operation for
    operation (left-interval searchsorted, separately-rounded f32 lerp —
    the where() between mul and add blocks FMA contraction). On the CPU
    backend most datasets reproduce sklearn BITWISE; the residue is
    1-ulp block means from a different (mathematically equal) f32
    summation order in the PAV, which shifts whole blocks uniformly and
    preserves tie classes."""
    if jax.default_backend() != "cpu":
        pytest.skip("bitwise claim is CPU-backend-specific")
    n_exact, worst = 0, 0.0
    for seed in range(12):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(3, 300))
        x = (np.round(rng.random(n), 2) if seed % 2 else rng.random(n)).astype(np.float32)
        y = (rng.random(n) < x).astype(np.float32)
        t = np.concatenate([x, rng.random(2 * n).astype(np.float32)])
        ref = _oracle(x, y, t).astype(np.float32)
        ours = _device(x, y, t)
        n_exact += int((ref == ours).all())
        worst = max(worst, float(np.abs(ref - ours).max()))
    assert n_exact >= 9, (n_exact, worst)
    assert worst <= 1.2e-7  # never more than ~1 ulp of [0,1] values


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [5, 37, 200])
def test_matches_sklearn_random(seed, n):
    rng = np.random.default_rng(seed)
    # quantized x forces duplicate-x groups (sklearn _make_unique path)
    x = np.round(rng.random(n).astype(np.float32), 2)
    y = (rng.random(n) < x).astype(np.float32)  # calibratable signal
    t = np.concatenate(
        [rng.random(3 * n).astype(np.float32), [-1.0, 0.0, 1.0, 2.0]]
    )
    ours = _device(x, y, t, n_pad=11)
    ref = _oracle(x, y, t)
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_padding_is_inert():
    rng = np.random.default_rng(7)
    x = rng.random(40).astype(np.float32)
    y = (rng.random(40) < 0.5).astype(np.float32)
    t = rng.random(60).astype(np.float32)
    np.testing.assert_array_equal(_device(x, y, t, 0), _device(x, y, t, 64))


def test_degenerate_cases():
    t = np.array([-1.0, 0.1, 0.5, 0.9, 2.0], np.float32)
    # single point: constant map
    np.testing.assert_allclose(
        _device(np.array([0.4]), np.array([1.0]), t),
        _oracle(np.array([0.4]), np.array([1.0]), t), atol=3e-6)
    # all x identical: constant = mean(y)
    x = np.full(9, 0.3, np.float32)
    y = np.array([0, 1, 1, 0, 1, 0, 0, 1, 1], np.float32)
    np.testing.assert_allclose(_device(x, y, t), _oracle(x, y, t), atol=3e-6)
    # single-class labels: constant 0 / constant 1
    x = np.linspace(0.1, 0.9, 12).astype(np.float32)
    for c in (0.0, 1.0):
        y = np.full(12, c, np.float32)
        np.testing.assert_allclose(_device(x, y, t), _oracle(x, y, t), atol=3e-6)
    # perfectly anti-monotone y: PAV pools everything to one block
    y = 1.0 - (x > 0.5).astype(np.float32)
    np.testing.assert_allclose(_device(x, y, t), _oracle(x, y, t), atol=3e-6)


def test_output_is_monotone_and_clipped():
    rng = np.random.default_rng(3)
    x = rng.random(80).astype(np.float32)
    y = (rng.random(80) < x).astype(np.float32)
    t = np.sort(rng.random(500).astype(np.float32) * 1.4 - 0.2)
    out = _device(x, y, t)
    assert np.all(np.diff(out) >= -1e-7)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_vmap_over_folds_equals_loop():
    rng = np.random.default_rng(11)
    K, n, m = 4, 50, 30
    xc = rng.random((K, n)).astype(np.float32)
    yc = (rng.random((K, n)) < xc).astype(np.float32)
    valid = rng.random((K, n)) < 0.8
    valid[:, 0] = True
    t = rng.random((K, m)).astype(np.float32)
    batched = np.asarray(
        jax.jit(jax.vmap(isotonic_fit_transform))(
            jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(valid), jnp.asarray(t)
        )
    )
    for k in range(K):
        one = np.asarray(
            jax.jit(isotonic_fit_transform)(
                jnp.asarray(xc[k]), jnp.asarray(yc[k]),
                jnp.asarray(valid[k]), jnp.asarray(t[k]),
            )
        )
        np.testing.assert_allclose(batched[k], one, atol=1e-7)
        ref = _oracle(xc[k][valid[k]], yc[k][valid[k]], t[k])
        np.testing.assert_allclose(batched[k], ref, atol=3e-6)


def test_adjacent_blocks_separated_by_1e6_stay_distinct():
    """ADVICE r4: the tie-repair tol must not merge two GENUINELY
    distinct adjacent PAV blocks whose means differ by ~1e-6 (the old
    1e-6 tol did exactly that); with tol=1e-7 the fitted values must
    match sklearn's two distinct block means (raw max-min wobble vs the
    f64 block mean is measured at ~2e-8 relative, so 1e-7 is safe)."""
    gap = np.float32(0.5 + 1e-6) - np.float32(0.5)  # one-ulp-clean tiny gap
    assert 0 < gap < 1.5e-6
    # strictly increasing y per unique x -> PAV keeps each x its own block
    x = np.asarray([0.2, 0.4, 0.6, 0.8], np.float32)
    y = np.asarray([0.1, 0.5, np.float32(0.5) + gap, 0.9], np.float32)
    t = x.copy()
    got = _device(x, y, t)
    ref = _oracle(x, y, t)
    np.testing.assert_allclose(got, ref, atol=1e-7)
    assert got[2] > got[1], (got[1], got[2])  # blocks NOT merged
