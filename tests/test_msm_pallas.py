"""Oracle tests for the Pallas bucket MSM (ops/msm_pallas.py).

Pins the VMEM-bucket kernel pipeline (accumulate -> fold -> lane reduce)
against the host Pippenger spec (`msm_host`, reference
arithmetic.rs:41-129). The kernel itself targets TPU; off-TPU the suite
runs it through the Pallas interpreter on a tiny instance (slow), plus the
always-on dispatch and batched-commit equality checks that exercise the
surrounding plumbing on the jnp path.
"""

import random

import jax.numpy as jnp
import pytest

from halo2_tpu.curves import Pallas, Vesta
from halo2_tpu.ops.limbs import ints_to_limbs
from halo2_tpu.ops.msm import MSMBases, msm, msm_host


def rand_points(curve, n, seed):
    rng = random.Random(seed)
    g = curve.generator()
    return [g.mul(rng.randrange(1, curve.SCALAR.MODULUS)) for _ in range(n)]


@pytest.mark.slow
def test_msm_pallas_interpret_tiny():
    from halo2_tpu.ops.msm_pallas import msm_pallas

    curve = Pallas
    q = curve.SCALAR.MODULUS
    pts = rand_points(curve, 4, seed=7)
    scalars = [0, 1, q - 1, 1234567890123456789]
    bases = MSMBases(curve, pts)
    got = msm_pallas(scalars, bases, interpret=True)
    assert got == msm_host(scalars, pts, curve)


@pytest.mark.slow
def test_msm_pallas_many_interpret(
):
    from halo2_tpu.ops.field_jax import FieldCtx
    from halo2_tpu.ops.msm_pallas import msm_pallas_many

    curve = Vesta
    q = curve.SCALAR.MODULUS
    rng = random.Random(3)
    n = 4
    pts = rand_points(curve, n, seed=11)
    cols = [[rng.randrange(q) for _ in range(n)] for _ in range(2)]
    sctx = FieldCtx(curve.SCALAR)
    canon = jnp.stack([jnp.asarray(ints_to_limbs(c)) for c in cols])
    got = msm_pallas_many(canon, MSMBases(curve, pts), interpret=True, mont=False)
    for col, pt in zip(cols, got):
        assert pt == msm_host(col, pts, curve)


def test_msm_dispatch_env_jax(monkeypatch):
    """`MSM=jax` routes device-size problems through the scan kernel."""
    n = 64
    curve = Pallas
    pts = rand_points(curve, n, seed=9)
    rng = random.Random(11)
    scalars = [rng.randrange(curve.SCALAR.MODULUS) for _ in range(n)]
    monkeypatch.setenv("MSM", "jax")
    bases = MSMBases(curve, pts)
    got = msm(scalars, bases, backend="jax")
    assert got == msm_host(scalars, pts, curve)


def test_commit_many_matches_commit():
    """Batched device commits == per-column commit_lagrange (CPU fallback
    path; the TPU path is pinned by the same decode on-chip)."""
    from halo2_tpu.poly import FVec
    from halo2_tpu.poly.commitment import Blind
    from halo2_tpu.poly.ipa import ParamsIPA

    params = ParamsIPA.cached(Vesta, 3)
    F = Vesta.SCALAR
    rng = random.Random(5)
    q = F.MODULUS
    cols = [[rng.randrange(q) for _ in range(params.n)] for _ in range(3)]
    blinds = [Blind(rng.randrange(q)) for _ in range(3)]
    fvecs = [FVec.from_ints(F, c) for c in cols]
    got = params.commit_many(fvecs, blinds, lagrange=True)
    for col, blind, pt in zip(cols, blinds, got):
        assert pt == params.commit_lagrange(col, blind)
