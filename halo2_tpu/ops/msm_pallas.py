"""Pallas bucket-accumulation MSM.

The scan MSM (`msm.py` msm_jax) keeps lane-private buckets and pays a
T-wide tree reduction plus XLA-level curve arithmetic on (n, 16)-shaped
tensors whose minor dimension wastes 7/8 of the VPU lanes. This module
restructures Pippenger for the TPU:

  * HOST: per window, stable-sort point indices by digit and lay them out
    as a dense plan IDX[step, window*B + bucket] (sentinel = identity
    point) - every (window, bucket) pair becomes one LANE, and step t
    feeds each lane the t-th point of its bucket. No scatters anywhere.
  * DEVICE: `lax.scan` over steps; each step gathers a (pairs, L) slab of
    point coordinates and folds it into the per-lane accumulators with a
    fused Pallas RCB15 complete-addition kernel ((L, W) tiles: limbs on
    sublanes, bucket-lanes on lanes - the same layout discipline as the
    fused NTT, reusing its Montgomery limb helpers).
  * HOST tail: decode nwin*B bucket points, suffix-sum buckets and Horner
    windows exactly like `msm_host` (reference arithmetic.rs:119-127).

Bucket-0 lanes only ever receive the sentinel, matching Pippenger's
skip-zero-digit convention. Complete addition makes identity handling
free. Total device work is n*nwin point additions with no cross-lane
reduction.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves import Curve, Point
from .curve_jax import CurveCtx, PointVec
from .limbs import NLIMBS
from .msm import MSMBases, _digits
from .ntt_pallas import _add_mod, _mont_mul, _sub_mod

U32 = jnp.uint32
LANES = 128


def _padd_tile(a, b, nprime, plimbs, twop, b3):
    """RCB15 Algorithm 7 (a=0 curves) on (L, W) limb tiles; 12M."""
    X1, Y1, Z1 = a
    X2, Y2, Z2 = b

    def mul(x, y):
        return _mont_mul(x, y, nprime, plimbs)

    def add(x, y):
        return _add_mod(x, y, twop)

    def sub(x, y):
        return _sub_mod(x, y, twop)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = add(X1, Y1)
    t4 = add(X2, Y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(Y1, Z1)
    X3 = add(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = add(t1, t2)
    t4 = sub(t4, X3)
    X3 = add(X1, Z1)
    Y3 = add(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = add(t0, t2)
    Y3 = sub(X3, Y3)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return X3, Y3, Z3


MACRO_STEPS = 64  # step quantum (keeps compile geometry stable)
PAIR_LANES = 8192  # bucket-lanes per kernel block


@lru_cache(maxsize=None)
def _msm_pallas_fn(curve: Type[Curve], pairs: int, steps: int, interpret: bool):
    """One pallas grid (pairs//W, steps): the j-axis picks a lane block,
    the s-axis streams the gathered point slabs through VMEM while the
    revisited output block holds the running accumulator. XLA gathers are
    pathologically slow on TPU, so the slabs arrive pre-gathered (host
    numpy fancy indexing); the (steps, pairs, L) -> (steps, L, pairs)
    transpose runs on device."""
    cc = CurveCtx(curve)
    consts = jnp.stack(
        [cc.fctx.nprime_limbs, cc.fctx.p_limbs, cc.fctx.twop_limbs, cc.b3]
    )
    W = min(PAIR_LANES, pairs)
    L = NLIMBS

    def kernel(ax, ay, az, px, py, pz, c_ref, ox, oy, oz):
        s = pl.program_id(1)
        nprime = c_ref[0][:, None]
        plimbs = c_ref[1][:, None]
        twop = c_ref[2][:, None]
        b3 = c_ref[3][:, None]

        @pl.when(s == 0)
        def _init():
            ox[:] = ax[:]
            oy[:] = ay[:]
            oz[:] = az[:]

        X3, Y3, Z3 = _padd_tile(
            (ox[:], oy[:], oz[:]),
            (px[0], py[0], pz[0]),
            nprime, plimbs, twop, b3,
        )
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    acc_spec = pl.BlockSpec((L, W), lambda j, s: (0, j), memory_space=pltpu.VMEM)
    pts_spec = pl.BlockSpec(
        (1, L, W), lambda j, s: (s, 0, j), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec((4, NLIMBS), lambda j, s: (0, 0), memory_space=pltpu.VMEM)

    def run(gx, gy, gz):
        """gx/gy/gz: (steps, pairs, L) pre-gathered coordinate slabs."""
        idv = cc.identity_vec((pairs,))
        acc = (idv.x.T, idv.y.T, idv.z.T)  # (L, pairs)
        pts = tuple(g.transpose(0, 2, 1) for g in (gx, gy, gz))
        return pl.pallas_call(
            kernel,
            grid=(pairs // W, steps),
            in_specs=[acc_spec] * 3 + [pts_spec] * 3 + [cspec],
            out_specs=(acc_spec, acc_spec, acc_spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((L, pairs), U32) for _ in range(3)
            ),
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(*acc, *pts, consts)

    return jax.jit(run)


def _index_plan(dg: np.ndarray, nwin: int, B: int, n: int) -> np.ndarray:
    """(steps, nwin*B) int32 plan; sentinel index n for empty slots.
    Lane w*B + b accumulates the points whose window-w digit equals b
    (b = 0 lanes stay identity)."""
    cols = []
    max_count = 1
    per_wb = {}
    for w in range(nwin):
        d = dg[:, w]
        order = np.argsort(d, kind="stable")
        sorted_d = d[order]
        # bucket boundaries
        starts = np.searchsorted(sorted_d, np.arange(B), side="left")
        ends = np.searchsorted(sorted_d, np.arange(B), side="right")
        for b in range(1, B):
            cnt = ends[b] - starts[b]
            if cnt > max_count:
                max_count = cnt
            per_wb[(w, b)] = order[starts[b]:ends[b]]
    # pad steps to a coarse quantum so the scan length (and hence the
    # compiled executable) is stable across scalar sets
    max_count = int(max_count)
    quantum = max(MACRO_STEPS, 1 << max(0, (max_count - 1).bit_length() - 2))
    steps = ((max_count + quantum - 1) // quantum) * quantum
    plan = np.full((steps, nwin * B), n, dtype=np.int32)
    for (w, b), idxs in per_wb.items():
        plan[: len(idxs), w * B + b] = idxs
    return plan


def msm_pallas(
    scalars: Sequence[int],
    bases: MSMBases,
    c: int = None,
    interpret: bool = None,
) -> Point:
    """Digit-sorted Pallas MSM; exact same result as msm_host."""
    curve = bases.curve
    n = len(scalars)
    assert n <= bases.n
    if c is None:
        # pairs = nwin * 2^c lanes; keep mean bucket occupancy >= ~4 so the
        # dense plan's padding overhead stays small
        c = 8 if n >= (1 << 15) else 4
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bits = curve.SCALAR.MODULUS.bit_length()
    nwin = (bits + c - 1) // c
    B = 1 << c
    dg = _digits(scalars, c, nwin)
    plan = _index_plan(dg, nwin, B, n)
    steps, pairs = plan.shape

    cc = bases.cc
    tx, ty, tz = bases.host_tables()

    # host gather (numpy fancy indexing; XLA gathers on TPU are ~3us/row)
    gx = tx[plan]
    gy = ty[plan]
    gz = tz[plan]

    fn = _msm_pallas_fn(curve, pairs, steps, interpret)
    ax, ay, az = fn(jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz))

    buckets = cc.decode_points(PointVec(ax.T, ay.T, az.T))  # nwin*B points
    from .msm import fold_window_buckets

    return fold_window_buckets(buckets, curve, nwin, c)
