"""JAX limb field arithmetic vs the host spec layer (exact agreement)."""

import random

import numpy as np
import pytest

from halo2_tpu.fields import Fp, Fq, FrBn
from halo2_tpu.ops import field_jax as fj
from halo2_tpu.ops.limbs import int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints


def rand_ints(F, n, seed=0):
    rng = random.Random(seed)
    vals = [0, 1, F.MODULUS - 1, F.MODULUS - 2]
    vals += [rng.randrange(F.MODULUS) for _ in range(n - len(vals))]
    return vals


def test_limb_roundtrip():
    v = 0x1234_5678_9ABC_DEF0_1111_2222_3333_4444_5555_6666_7777_8888_9999_AAAA
    assert limbs_to_int(int_to_limbs(v)) == v
    vals = [0, 1, (1 << 256) - 1, v]
    assert limbs_to_ints(ints_to_limbs(vals)) == vals


@pytest.mark.parametrize("F", [Fp, Fq, FrBn])
def test_mont_roundtrip(F):
    ctx = fj.FieldCtx(F)
    vals = rand_ints(F, 32, seed=1)
    enc = ctx.encode_ints(vals)
    assert ctx.decode_ints(enc) == vals


@pytest.mark.parametrize("F", [Fp, Fq])
def test_mul_add_sub_vs_spec(F):
    ctx = fj.FieldCtx(F)
    a_ints = rand_ints(F, 64, seed=2)
    b_ints = rand_ints(F, 64, seed=3)
    a = ctx.encode_ints(a_ints)
    b = ctx.encode_ints(b_ints)
    p = F.MODULUS
    got_mul = ctx.decode_ints(fj.mont_mul(a, b, ctx))
    got_add = ctx.decode_ints(fj.add_mod(a, b, ctx))
    got_sub = ctx.decode_ints(fj.sub_mod(a, b, ctx))
    got_neg = ctx.decode_ints(fj.neg_mod(a, ctx))
    for i, (x, y) in enumerate(zip(a_ints, b_ints)):
        assert got_mul[i] == x * y % p, f"mul mismatch at {i}"
        assert got_add[i] == (x + y) % p
        assert got_sub[i] == (x - y) % p
        assert got_neg[i] == (-x) % p


@pytest.mark.parametrize("F", [Fp, FrBn])
def test_inv_and_pow(F):
    ctx = fj.FieldCtx(F)
    vals = rand_ints(F, 16, seed=4)
    a = ctx.encode_ints(vals)
    inv = ctx.decode_ints(fj.inv_mod(a, ctx))
    for x, xi in zip(vals, inv):
        if x == 0:
            assert xi == 0
        else:
            assert x * xi % F.MODULUS == 1
    p7 = ctx.decode_ints(fj.pow_const(a, 7, ctx))
    for x, y in zip(vals, p7):
        assert y == pow(x, 7, F.MODULUS)


def test_broadcast_and_const():
    ctx = fj.FieldCtx(Fp)
    vals = rand_ints(Fp, 8, seed=5)
    a = ctx.encode_ints(vals)
    c = ctx.const(12345)
    got = ctx.decode_ints(fj.mont_mul(a, c, ctx))
    for x, y in zip(vals, got):
        assert y == x * 12345 % Fp.MODULUS
    one = ctx.decode_ints(fj.mont_mul(a, ctx.one, ctx))
    assert one == vals


def test_is_zero_select():
    ctx = fj.FieldCtx(Fp)
    a = ctx.encode_ints([0, 5, 0, 7])
    z = np.asarray(fj.is_zero(a, ctx))
    assert z.tolist() == [True, False, True, False]


def test_jit_compiles():
    import jax

    ctx = fj.FieldCtx(Fq)
    vals = rand_ints(Fq, 128, seed=6)
    a = ctx.encode_ints(vals)

    @jax.jit
    def f(x):
        return fj.mont_mul(fj.add_mod(x, x, ctx), x, ctx)

    out = ctx.decode_ints(f(a))
    for x, y in zip(vals, out):
        assert y == 2 * x * x % Fq.MODULUS
