"""Native C++ host arithmetic vs the pure-Python spec layer.

The native library (halo2_tpu/native/h2native.cpp) mirrors msm_host /
fold_window_buckets / batch_to_affine / jac_mul (reference best_multiexp,
arithmetic.rs:41-198). These tests pin byte-exact agreement on randomized
inputs including identity points, zero scalars, and all registered curves.
"""

import random
from contextlib import contextmanager

import pytest

from halo2_tpu import native
from halo2_tpu.curves import (
    Bn254G1,
    Pallas,
    Secp256k1,
    Vesta,
    batch_to_affine,
    jac_mul,
)
from halo2_tpu.ops.msm import fold_window_buckets, msm_host

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

CURVES = [Pallas, Vesta, Bn254G1, Secp256k1]


@contextmanager
def python_only():
    """Temporarily hide the native library so spec paths run pure Python."""
    lib, native._LIB = native._LIB, None
    try:
        yield
    finally:
        native._LIB = lib


def rand_points(curve, n, rng):
    return [curve.generator().mul(rng.randrange(1, 1 << 64)) for _ in range(n)]


@pytest.mark.parametrize("curve", CURVES)
def test_native_msm_matches_spec(curve):
    rng = random.Random(17)
    n = 100
    pts = rand_points(curve, n, rng)
    pts[5] = curve.identity()
    scalars = [rng.randrange(curve.SCALAR.MODULUS) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = curve.SCALAR.MODULUS - 1
    got = msm_host(scalars, pts, curve)  # native path
    with python_only():
        want = msm_host(scalars, pts, curve)
    assert got == want


@pytest.mark.parametrize("curve", [Pallas, Secp256k1])
def test_native_point_mul_matches_spec(curve):
    rng = random.Random(23)
    base = curve.generator()
    for _ in range(5):
        k = rng.randrange(1 << 17, curve.SCALAR.MODULUS)
        got = base.mul(k)  # native path (k > 0xFFFF)
        want = curve.from_jacobian(jac_mul(base.jacobian(), k, curve.p()))
        assert got == want
        base = got


def test_native_bucket_fold_matches_spec():
    rng = random.Random(31)
    curve = Vesta
    nwin, c = 5, 3
    buckets = rand_points(curve, nwin << c, rng)
    buckets[2] = curve.identity()
    buckets[9] = curve.identity()
    got = fold_window_buckets(buckets, curve, nwin, c)
    with python_only():
        want = fold_window_buckets(buckets, curve, nwin, c)
    assert got == want


def test_native_g_ntt_matches_spec():
    from halo2_tpu.poly.ipa import _g_to_lagrange

    rng = random.Random(53)
    curve = Vesta
    k = 4
    g = rand_points(curve, 1 << k, rng)
    got = _g_to_lagrange(curve, g, k)  # native path
    with python_only():
        want = _g_to_lagrange(curve, g, k)
    assert got == want


@pytest.mark.parametrize("curve", CURVES)
def test_native_batch_normalize_matches_spec(curve):
    rng = random.Random(41)
    jacs = []
    for _ in range(20):
        pt = curve.generator().mul(rng.randrange(1, 1 << 48))
        z = rng.randrange(1, curve.p())
        # un-normalize: (X z^2, Y z^3, z)
        x, y = pt.xy
        p = curve.p()
        jacs.append((x * z * z % p, y * z * z * z % p, z))
    jacs.append((0, 1, 0))  # identity
    got = batch_to_affine(jacs, curve.p())  # native path (n >= 16)
    with python_only():
        want = batch_to_affine(jacs, curve.p())
    assert got == want
