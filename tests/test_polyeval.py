"""Device polynomial-tail kernels vs host bigint oracles
(reference arithmetic.rs:243-306)."""

import numpy as np
import pytest

from halo2_tpu.fields import Fp, Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.polyeval import batch_eval, horner_fold_mont, kate_division_mont
from halo2_tpu.poly import FVec, eval_polynomial_host

pytestmark = pytest.mark.slow


def _rand_coeffs(rng, n, p):
    return [int.from_bytes(rng.bytes(32), "little") % p for _ in range(n)]


@pytest.mark.parametrize("field", [Fp, Fq])
def test_batch_eval_matches_host(field):
    p = field.MODULUS
    rng = np.random.default_rng(1)
    n, M = 64, 5
    polys = [_rand_coeffs(rng, n, p) for _ in range(M)]
    points = [_rand_coeffs(rng, 1, p)[0] for _ in range(3)]
    pts = [points[i % 3] for i in range(M)]  # duplicates exercise dedup

    import jax.numpy as jnp

    stack = jnp.stack([FVec.from_ints(field, c).vals for c in polys])
    got = batch_eval(field, stack, pts)
    want = [eval_polynomial_host(c, x, p) for c, x in zip(polys, pts)]
    assert got == want


def test_horner_fold_matches_host():
    p = Fp.MODULUS
    rng = np.random.default_rng(2)
    n, M = 32, 4
    polys = [_rand_coeffs(rng, n, p) for _ in range(M)]
    x = _rand_coeffs(rng, 1, p)[0]

    import jax.numpy as jnp

    stack = jnp.stack([FVec.from_ints(Fp, c).vals for c in polys])
    out = FVec(Fp, horner_fold_mont(Fp, stack, x)).to_ints()

    want = list(polys[0])
    for poly in polys[1:]:
        want = [(a * x + b) % p for a, b in zip(want, poly)]
    assert out == want


def test_kate_division_matches_host():
    from halo2_tpu.poly.commitment import kate_division

    p = Fp.MODULUS
    rng = np.random.default_rng(3)
    n = 128
    coeffs = _rand_coeffs(rng, n, p)
    b = _rand_coeffs(rng, 1, p)[0]

    got = FVec(Fp, kate_division_mont(Fp, FVec.from_ints(Fp, coeffs).vals, b)).to_ints()
    want = kate_division(coeffs, b, p)
    assert got[: n - 1] == list(want)
    assert got[n - 1] == 0
