"""Kogge-Stone carry/borrow sweeps vs the serial reference chains
(ops/ntt_pallas.py). Pure jnp eager on CPU — the helpers are plain tensor
programs, identical inside or outside a Pallas kernel."""

import random

import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields import Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.limbs import ints_to_limbs
from halo2_tpu.ops.ntt_pallas import (
    NCOLS,
    NLIMBS,
    _sub_2p_if_ge_ks,
    _sub_2p_if_ge_serial,
    _sub_mod_ks,
    _sub_mod_serial,
    _sweep_ks,
    _sweep_serial,
)

W = 8


def test_sweep_ks_matches_serial():
    rng = np.random.default_rng(0)
    # accumulator-like columns < 2^22, incl. crafted full-propagate chains
    cols = rng.integers(0, 1 << 22, size=(5, NCOLS, W), dtype=np.uint32)
    cols[0, :, 0] = 0xFFFF  # all-propagate chain
    cols[0, 0, 0] = 0x1FFFF
    cols[1, :, 1] = 0x1FFFE
    cols[2, :, 2] = 0
    for nout in (NLIMBS, NCOLS):
        a = np.asarray(_sweep_serial(jnp.asarray(cols), nout))
        b = np.asarray(_sweep_ks(jnp.asarray(cols), nout))
        assert np.array_equal(a, b), nout


def _batch(rows):
    """List of rows of ints -> (B, 16, W) limb tensor."""
    return jnp.asarray(np.stack([np.asarray(ints_to_limbs(row)).T for row in rows]))


def test_sub_2p_and_sub_mod_match_serial():
    ctx = FieldCtx(Fq)
    p = ctx.p_int
    tp = jnp.asarray(np.asarray(ctx.twop_limbs)[:, None])  # (16, 1) as in kernels
    r = random.Random(3)
    a_ints = [[r.randrange(2 * p) for _ in range(W)] for _ in range(4)]
    b_ints = [[r.randrange(2 * p) for _ in range(W)] for _ in range(4)]
    # edges: 0-0, (2p-1)-(2p-1), 0-(2p-1), (2p-1)-0, equal values
    a_ints[0][:5] = [0, 2 * p - 1, 0, 2 * p - 1, 12345]
    b_ints[0][:5] = [0, 2 * p - 1, 2 * p - 1, 0, 12345]
    A, B = _batch(a_ints), _batch(b_ints)
    s1 = np.asarray(_sub_mod_serial(A, B, tp))
    s2 = np.asarray(_sub_mod_ks(A, B, tp))
    assert np.array_equal(s1, s2)
    g1 = np.asarray(_sub_2p_if_ge_serial(A, tp))
    g2 = np.asarray(_sub_2p_if_ge_ks(A, tp))
    assert np.array_equal(g1, g2)
