"""Sorted-bucket MSM (ops/msm_sorted.py).

The Pallas kernels are validated against the host Pippenger oracle on
real TPU hardware (run there via `JAX_PLATFORMS= pytest -m tpu`); on the
CPU mesh we validate the XLA pre-stage (recode, counting sort, grid
gather) against a direct numpy re-computation -- interpret-mode Pallas at
the sorted kernel's W=1024 geometry is impractically slow on one core.

Covers the recode edge cases: zero, one, q-1 (all-carry chain), digits
straddling +-2^15 (the side list), and negative-digit signs.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.curves import Pallas
from halo2_tpu.ops.limbs import ints_to_limbs
from halo2_tpu.ops.msm import MSMBases, msm_host
from halo2_tpu.ops.msm_sorted import (
    SIDE_CAP,
    _cap_classes,
    _num_windows,
    _prestage_fn,
    _recode_signed,
    msm_sorted,
)

Q = Pallas.SCALAR.MODULUS


def _edge_scalars(rng, n):
    return [rng.randrange(Q) for _ in range(n - 6)] + [
        0,
        1,
        Q - 1,
        (1 << 15),
        ((1 << 15) << (16 * 3)) % Q,  # side-list entry in window 3
        (1 << 16) - 1,
    ]


def test_recode_signed_roundtrip():
    rng = random.Random(7)
    vals = [0, 1, Q - 1, (1 << 15), (1 << 16) - 1, (1 << 255) % Q] + [
        rng.randrange(Q) for _ in range(64)
    ]
    nw = _num_windows(Q)
    e = np.asarray(_recode_signed(jnp.asarray(ints_to_limbs(vals)), nw))
    for i, v in enumerate(vals):
        back = sum(int(e[w, i]) << (16 * w) for w in range(nw))
        assert back == v, (v, e[:, i])
        assert all(abs(int(e[w, i])) <= 1 << 15 for w in range(nw))


def test_prestage_grid_matches_numpy():
    """Every grid slot must hold the right point for its (lane, rank)
    bucket assignment, with correct sub/sign/valid meta and side list."""
    rng = random.Random(3)
    n = 1 << 8
    w_lanes = 128
    kb = (1 << 15) // w_lanes
    scalars = _edge_scalars(rng, n)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    nw = _num_windows(Q)
    classes = _cap_classes(n, w_lanes, kb, Q)
    # fake "points": x-row i = i, y-row i = 2i (recognizable payloads)
    px = jnp.asarray(np.tile(np.arange(n, dtype=np.uint32)[:, None], (1, 16)))
    py = px * 2

    grids, sx, sy, sv, ovf = _prestage_fn(n, nw, classes, w_lanes, kb)(
        limbs, px, py
    )
    # stitch classes back into per-window arrays (caps may differ: pad);
    # meta rides x-limb-0's high 16 bits
    cap = max(c for (_, _, c) in classes)
    gx = np.zeros((nw, cap, 16, w_lanes), np.uint32)
    for (w0, cnt, ccap), (cgx, cgy) in zip(classes, grids):
        gx[w0 : w0 + cnt, :ccap] = np.asarray(cgx)
    meta = gx[:, :, 0, :] >> 16
    gx = gx & 0xFFFF
    sx, sv = np.asarray(sx), np.asarray(sv)
    assert not bool(np.asarray(ovf))

    e = np.asarray(_recode_signed(limbs, nw))
    for w in range(nw):
        buckets = np.abs(e[w])
        by_lane = {}
        side = []
        for i in range(n):
            b = int(buckets[i])
            if b == (1 << 15):
                side.append(i)
            elif b != 0:  # zero digits are discarded (contribute nothing)
                by_lane.setdefault(b // kb, []).append(i)
        sb = kb.bit_length() - 1
        for lane, members in by_lane.items():
            got = []
            for r in range(cap):
                m = int(meta[w, r, lane])
                if (m >> (sb + 1)) & 1:  # valid
                    got.append((int(gx[w, r, 0, lane]),
                                m & (kb - 1), (m >> sb) & 1))
            assert len(got) == len(members), (w, lane)
            assert sorted(g[0] for g in got) == sorted(members)
            for idx, sub, sign in got:
                assert sub == int(buckets[idx]) % kb
                assert sign == (1 if e[w, idx] < 0 else 0)
        got_side = sorted(
            int(sx[w, 0, j]) for j in range(SIDE_CAP) if sv[w, j]
        )
        assert got_side == sorted(side), w


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled-kernel test; run on TPU"
)
def test_msm_sorted_matches_host_tpu():
    rng = random.Random(11)
    n = 1 << 9
    pts = [Pallas.generator().mul(rng.randrange(1, 1 << 62)) for _ in range(n)]
    bases = MSMBases(Pallas, pts)
    scalars = _edge_scalars(rng, n)
    got = msm_sorted(jnp.asarray(ints_to_limbs(scalars)), bases)
    assert got == msm_host(scalars, pts, Pallas)
