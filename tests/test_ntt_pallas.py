"""Cross-implementation NTT equality (reference `fft.rs:161-224`
test_fft_all): the fused Pallas four-step plan must agree exactly with the
jnp radix-2 plan. Runs in Pallas interpreter mode on the CPU backend."""

import random

import jax
import pytest

from halo2_tpu.fields import Fq, FrBn


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """XLA segfaults when serializing some interpret-mode Pallas CPU
    executables into the persistent compilation cache; keep these compiles
    in-memory only. The initialized cache singleton must be reset for the
    config change to take effect."""
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    _cc.reset_cache()
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.ntt import NttPlan
from halo2_tpu.ops.ntt_pallas import PallasNttPlan


@pytest.mark.parametrize("field,k", [(Fq, 4), (Fq, 9), (FrBn, 5)])
def test_pallas_ntt_matches_jnp(field, k):
    n = 1 << k
    p = field.MODULUS
    omega = pow(field.ROOT_OF_UNITY, 1 << (field.S - k), p)
    random.seed(1000 + k)
    vals = [random.randrange(p) for _ in range(n)]
    ctx = FieldCtx(field)
    a = ctx.encode_ints(vals)
    ref = ctx.decode_ints(NttPlan(field, k, omega)(a))
    out = ctx.decode_ints(PallasNttPlan(field, k, omega)(a))
    assert ref == out


def test_pallas_intt_roundtrip():
    k = 6
    n = 1 << k
    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
    omega_inv = pow(omega, -1, p)
    n_inv = pow(n, -1, p)
    random.seed(7)
    vals = [random.randrange(p) for _ in range(n)]
    ctx = FieldCtx(Fq)
    a = ctx.encode_ints(vals)
    fwd = PallasNttPlan(Fq, k, omega)(a)
    back = PallasNttPlan(Fq, k, omega_inv)(fwd)
    import jax.numpy as jnp

    back = ctx.mul(back, jnp.broadcast_to(ctx.const(n_inv), back.shape))
    assert ctx.decode_ints(back) == vals
