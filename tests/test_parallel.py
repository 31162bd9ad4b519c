"""Sharded kernel correctness on the 8-device virtual CPU mesh.

Mirrors the reference's FFT cross-implementation equality test
(`halo2_proofs/src/fft.rs:161-224`): the sharded four-step NTT and sharded
MSM must agree exactly with the single-device / host oracles.
"""

import random

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.msm import MSMBases, msm_host
from halo2_tpu.ops.ntt import NttPlan
from halo2_tpu.parallel import FourStepNtt, ShardedQuotient, make_mesh, sharded_msm


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_four_step_ntt_matches_single_device(mesh):
    k = 8
    n = 1 << k
    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
    random.seed(101)
    vals = [random.randrange(p) for _ in range(n)]
    ctx = FieldCtx(Fq)
    a = ctx.encode_ints(vals)
    ref = ctx.decode_ints(NttPlan(Fq, k, omega)(a))
    out = ctx.decode_ints(FourStepNtt(Fq, k, omega, mesh)(a))
    assert ref == out


def test_sharded_msm_matches_host(mesh):
    random.seed(102)
    n = 256
    q = Vesta.SCALAR.MODULUS
    pts = [Vesta.generator().mul(random.randrange(1, 1000)) for _ in range(n)]
    scalars = [random.randrange(q) for _ in range(n)]
    ref = msm_host(scalars, pts, Vesta)
    out = sharded_msm(scalars, MSMBases(Vesta, pts), mesh, lanes=8)
    assert ref == out


def test_sharded_quotient_roundtrip(mesh):
    """extend -> to_coeff is the identity on (padded) coefficients."""
    import jax.numpy as jnp

    k = 5
    sq = ShardedQuotient(Fq, 3, k, mesh)
    n = 1 << k
    p = Fq.MODULUS
    random.seed(103)
    vals = [random.randrange(p) for _ in range(n)]
    a = sq.ctx.encode_ints(vals)
    ext = sq.extend(a)
    back = sq.to_coeff(ext)
    out = sq.ctx.decode_ints(back)
    assert out[:n] == vals
    assert all(v == 0 for v in out[n:])
