"""MXU Toeplitz Montgomery-mul-by-constant vs the limb oracle.

Exactness argument under test: nibble products <= 225 and 64-term column
sums <= 14400 stay exact through bf16 x bf16 -> f32 (and int8 -> int32)
matmuls; carry relaxation + REDC with a redundant m < 1.07R still lands in
[0, 2p) and one conditional subtract canonicalizes (ops/mxu_mont.py).
"""

import os
import random

import jax.numpy as jnp
import pytest

from halo2_tpu.fields import Fp, Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.mxu_mont import mont_mul_const


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
@pytest.mark.parametrize("field", [Fp, Fq])
def test_mont_mul_const_matches_oracle(field, dtype):
    os.environ["MXU_DTYPE"] = dtype
    try:
        ctx = FieldCtx(field)
        p = field.MODULUS
        r = ctx.r_int
        rng = random.Random(0xC0FFEE + (dtype == "int8"))
        vals = [rng.randrange(p) for _ in range(64)]
        # edge cases
        vals[:4] = [0, 1, p - 1, (1 << 255) % p]
        c = rng.randrange(p)
        c_mont = c * r % p

        a = ctx.encode_ints(vals)  # canonical Montgomery limbs
        got = ctx.decode_ints(mont_mul_const(field, a, c_mont))
        want = [v * c % p for v in vals]
        assert got == want
    finally:
        os.environ.pop("MXU_DTYPE", None)


@pytest.mark.parametrize("k", [6, 10])
def test_mxu_ntt_matches_radix2(k):
    """Cross-implementation NTT equality (reference fft.rs:161-224 pattern):
    MXU Toeplitz plan == jnp radix-2 plan on identical input."""
    from halo2_tpu.ops.mxu_mont import MxuNttPlan
    from halo2_tpu.ops.ntt import NttPlan

    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
    rng = random.Random(k)
    vals = [rng.randrange(p) for _ in range(1 << k)]
    ctx = FieldCtx(Fq)
    a = ctx.encode_ints(vals)
    ref = ctx.decode_ints(NttPlan(Fq, k, omega)(a))
    got = ctx.decode_ints(MxuNttPlan(Fq, k, omega)(a))
    assert got == ref
