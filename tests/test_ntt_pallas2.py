"""Constant-geometry Pallas NTT (ops/ntt_pallas2.py) vs the jnp plan.

Comparison is on CANONICAL values: both plans compute in the lazy
Montgomery domain [0, 2p) and may return different representatives of
equal field elements (x vs x+p), which is fine for every consumer
(canonicalization happens at host/commitment boundaries).

Shrunken levels (MAX_LOG_F=3) keep interpret-mode wall time sane while
still exercising multi-level recursion + inter-level twiddles; the
cross-implementation equality mirrors the reference's test_fft_all
(halo2_proofs/src/fft.rs:161-224).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields import Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.limbs import NLIMBS, ints_to_limbs
from halo2_tpu.ops.ntt import NttPlan
from halo2_tpu.ops.ntt_pallas2 import CgNttPlan, _cg_stage_tables

pytestmark = pytest.mark.slow


def test_cg_stage_tables_invariant():
    # the build-time asserts prove the constant-geometry slot invariant
    p = Fq.MODULUS
    for log_f in (3, 5, 8):
        f = 1 << log_f
        w_f = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - log_f), p)
        stages, rev = _cg_stage_tables(f, w_f, p, FieldCtx(Fq).r_int)
        assert len(stages) == log_f
        assert sorted(int(v) for v in rev) == list(range(f))


@pytest.mark.parametrize("k", [3, 6, 7, 11])
def test_cg_matches_jnp_canonical(k):
    # k=11 with MAX_LOG_F=3 gives a level with g=256 > LANES, exercising
    # the multi-block inter-twiddle indexing (nblk >= 2) whose truncation
    # broke every fused-NTT transform with a second factor > 2^8 (the
    # round-4 k=14 proof failure; latent in ntt_pallas.py since round 1)
    p = Fq.MODULUS
    ctx = FieldCtx(Fq)
    rng = np.random.default_rng(1)
    n = 1 << k
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
    a = ctx.to_mont(
        jnp.asarray(rng.integers(0, 1 << 16, (n, NLIMBS), dtype=np.uint32))
    )
    ref = NttPlan(Fq, k, omega)(a)
    old = CgNttPlan.MAX_LOG_F
    CgNttPlan.MAX_LOG_F = 3
    CgNttPlan._cache.clear()
    try:
        got = CgNttPlan(Fq, k, omega, interpret=True)(a)
    finally:
        CgNttPlan.MAX_LOG_F = old
        CgNttPlan._cache.clear()
    ref_c = np.asarray(jax.device_get(ctx.from_mont(ref)))
    got_c = np.asarray(jax.device_get(ctx.from_mont(got)))
    assert (ref_c == got_c).all()
