"""Pallas MSM: VMEM-resident Pippenger buckets, device digits, device fold.

TPU-native reformulation of the reference's `best_multiexp`
(`halo2_proofs/src/arithmetic.rs:41-198`). Measured constraints that shape
the design (tools/microbench.py on TPU v5e):

  * host<->device transfers run at ~0.03 GB/s through the tunnel - nothing
    per-MSM may cross the host boundary except the ~100-byte window sums,
    so window digits are computed ON DEVICE from the scalar limb tensor
    and the bucket fold stays on device;
  * XLA-level (jnp) limb arithmetic costs ~470 ns per point-add because
    every Montgomery product materializes HBM temporaries, while fused
    Pallas limb math runs at ~4 ns per field-mul in VMEM - so the bucket
    loop must be a Pallas kernel.

Three stages:

1. **Accumulate kernel** (grid = (M msms, nwin windows, n/T steps)):
   scratch holds B buckets x (16 limbs, T lanes) per coordinate in VMEM;
   lane t owns a private bucket column, so the scatter is conflict-free.
   Each step loads one (16, T) slab of affine base coordinates (shared
   across windows and msms), extracts the window digit from the canonical
   scalar limb tile by shift/mask, folds the slab into the selected
   buckets with a complete mixed addition (RCB15 algorithm 8, a=0, Z2=1),
   and merges with a vectorized one-hot select over the bucket axis (no
   data-dependent control flow anywhere). The bucket state is written to
   HBM on the last step.
2. **Fold kernel** (grid = (M * nwin,)): run/total suffix sums over the
   bucket axis via `lax.scan` (sum_b b * bucket_b, reference
   arithmetic.rs:119-127), leaving T per-lane partial window sums.
3. **jnp tail**: log-depth lane-tree reduce of the (M*nwin, T) partial
   points (7 batched XLA point-adds) and a host Horner over windows with
   c doublings per step, exactly like `msm_host`.

Digit convention matches `ops/msm.py:_digits` (unsigned base-2^c windows
of the little-endian scalar); bucket 0 is the discard lane, so zero digits
and padding rows are free. Identity never appears among the bases (URS
points), and the accumulator identity (0:1:0) flows through the complete
formulas.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves import JAC_IDENTITY, Curve, Point, jac_add, jac_double
from .curve_jax import CurveCtx, PointVec
from .field_jax import FieldCtx, from_mont
from .limbs import NLIMBS
from .ntt_pallas import _add_mod, _mont_mul, _sub_mod

U32 = jnp.uint32
LANES = 128


def _mixed_padd(a, bxy, nprime, plimbs, twop, b3):
    """Complete mixed addition (RCB15 Algorithm 8, a=0, Z2=1) on (16, T)
    limb tiles; 13 Montgomery products. `a` projective, `bxy` affine."""
    X1, Y1, Z1 = a
    X2, Y2 = bxy

    def mul(x, y):
        return _mont_mul(x, y, nprime, plimbs)

    def add(x, y):
        return _add_mod(x, y, twop)

    def sub(x, y):
        return _sub_mod(x, y, twop)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = add(X2, Y2)
    t4 = add(X1, Y1)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)          # X1*Y2 + X2*Y1
    t4 = mul(Y2, Z1)
    t4 = add(t4, Y1)          # Y1 + Y2*Z1
    Y3 = mul(X2, Z1)
    Y3 = add(Y3, X1)          # X1 + X2*Z1
    X3 = add(t0, t0)
    t0 = add(X3, t0)          # 3*X1*X2
    t2 = mul(b3, Z1)          # 3b*Z1
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


def _full_padd(a, b, nprime, plimbs, twop, b3):
    """Complete projective addition (RCB15 Algorithm 7, a=0); 14M."""
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


def _consts5(curve: Type[Curve]) -> jnp.ndarray:
    cc = CurveCtx(curve)
    fctx = cc.fctx
    return jnp.stack(
        [fctx.nprime_limbs, fctx.p_limbs, fctx.twop_limbs,
         jnp.asarray(np.asarray(cc.b3)), fctx.r_limbs]
    )


@lru_cache(maxsize=None)
def _accum_fn(curve: Type[Curve], M: int, n_pad: int, T: int, c: int,
              nwin: int, interpret: bool):
    B = 1 << c
    steps = n_pad // T
    digs_per_limb = 16 // c  # digits carried by one 16-bit limb (4 or 2)
    consts = _consts5(curve)

    def kernel(sref, pxref, pyref, cref, ox, oy, oz):
        # the revisited (B, 16, T) output blocks ARE the bucket state: they
        # stay VMEM-resident across the step axis and flush to HBM once per
        # (m, w) when the block index changes
        w = pl.program_id(1)
        s = pl.program_id(2)
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        onem_col = cref[4][:, None]

        @pl.when(s == 0)
        def _init():
            ox[:] = jnp.zeros((B, NLIMBS, T), U32)
            oy[:] = jnp.broadcast_to(onem_col[None], (B, NLIMBS, T))
            oz[:] = jnp.zeros((B, NLIMBS, T), U32)

        # window digit: limb w // digs_per_limb of the canonical scalar
        # holds this window's digit at bit offset c * (w % digs_per_limb)
        lw = w // digs_per_limb
        row = sref[0, pl.ds(lw, 1), :][0]  # (T,) u32
        shift = ((w % digs_per_limb) * c).astype(U32)
        dg = (row >> shift) & U32(B - 1)  # (T,)

        # one-hot bucket select: every lane matches exactly one bucket row
        # (digit 0 -> discard row 0)
        iota = jax.lax.broadcasted_iota(U32, (B, 1, T), 0)
        mask = iota == dg[None, None, :]

        def sel(ref):  # limb values < 2^16: exact in an int32 masked sum
            v = jnp.where(mask, ref[:].astype(jnp.int32), 0)
            return jnp.sum(v, axis=0).astype(U32)

        cur = (sel(ox), sel(oy), sel(oz))
        X3, Y3, Z3 = _mixed_padd(
            cur, (pxref[:], pyref[:]), nprime, plimbs, twop, b3
        )
        ox[:] = jnp.where(mask, X3[None], ox[:])
        oy[:] = jnp.where(mask, Y3[None], oy[:])
        oz[:] = jnp.where(mask, Z3[None], oz[:])

    sspec = pl.BlockSpec(
        (1, NLIMBS, T), lambda m, w, s: (m, 0, s), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec((NLIMBS, T), lambda m, w, s: (0, s), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((5, NLIMBS), lambda m, w, s: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (B, NLIMBS, T), lambda m, w, s, _nw=nwin: (m * _nw + w, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def run(scal_limbs, px, py):
        """scal_limbs (M, 16, n_pad) u32 canonical; px/py (16, n_pad)."""
        out_shape = tuple(
            jax.ShapeDtypeStruct((M * nwin * B, NLIMBS, T), U32)
            for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(M, nwin, steps),
            in_specs=[sspec, pspec, pspec, cspec],
            out_specs=(ospec, ospec, ospec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
        )(scal_limbs, px, py, consts)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _fold_fn(curve: Type[Curve], rows: int, B: int, T: int, interpret: bool):
    """Per (msm, window) bucket fold: run/total suffix sums over the bucket
    axis (lax.scan, buckets B-1 .. 1), leaving T per-lane partials."""
    consts = _consts5(curve)

    def kernel(bxr, byr, bzr, cref, ox, oy, oz):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        onem_col = cref[4][:, None]
        idx = jnp.zeros((NLIMBS, T), U32)
        idy = jnp.broadcast_to(onem_col, (NLIMBS, T))
        idz = jnp.zeros((NLIMBS, T), U32)

        # buckets B-1 down to 1 (row 0 is the discard lane); Mosaic has no
        # extensive-input scan, so fori with dynamic ref reads
        def body(i, carry):
            rx, ry, rz, tx, ty, tz = carry
            b = B - 1 - i
            bpt = (
                bxr[pl.ds(b, 1)][0],
                byr[pl.ds(b, 1)][0],
                bzr[pl.ds(b, 1)][0],
            )
            rx, ry, rz = _full_padd(
                (rx, ry, rz), bpt, nprime, plimbs, twop, b3
            )
            tx, ty, tz = _full_padd(
                (tx, ty, tz), (rx, ry, rz), nprime, plimbs, twop, b3
            )
            return rx, ry, rz, tx, ty, tz

        carry = jax.lax.fori_loop(
            0, B - 1, body, (idx, idy, idz, idx, idy, idz)
        )
        ox[:] = carry[3][None]
        oy[:] = carry[4][None]
        oz[:] = carry[5][None]

    bspec = pl.BlockSpec(
        (B, NLIMBS, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec((5, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, NLIMBS, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(bx, by, bz):
        """bx/by/bz (rows * B, 16, T) -> (rows, 16, T) window partials."""
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, NLIMBS, T), U32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(rows,),
            in_specs=[bspec, bspec, bspec, cspec],
            out_specs=(ospec, ospec, ospec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(bx, by, bz, consts)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _lane_reduce_fn(curve: Type[Curve], rows: int, T: int, interpret: bool = False):
    """(rows, 16, T) per-lane partial points -> (rows, 16, T) with EVERY
    lane holding the lane-total, via log2(T) circular-roll point-adds in
    one Pallas kernel.

    Each level l combines lane i with lane (i + T/2^(l+1)) mod T; after
    log2(T) levels every lane has accumulated all T partials exactly once
    (the offsets reached form all residues mod T). Replaces a jnp tree
    whose unrolled limb graph took ~200 s of XLA compile (the round-3
    bottleneck); the caller reads lane 0."""
    consts = _consts5(curve)
    log_t = T.bit_length() - 1

    def kernel(xr, yr, zr, cref, ox, oy, oz):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        x, y, z = xr[0], yr[0], zr[0]
        for lvl in range(log_t):
            sh = T >> (lvl + 1)
            rolled = (
                pltpu.roll(x, sh, 1),
                pltpu.roll(y, sh, 1),
                pltpu.roll(z, sh, 1),
            )
            x, y, z = _full_padd((x, y, z), rolled, nprime, plimbs, twop, b3)
        ox[0], oy[0], oz[0] = x, y, z

    spec = pl.BlockSpec((1, NLIMBS, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((5, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def run(x, y, z):
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, NLIMBS, T), U32) for _ in range(3)
        )
        ox, oy, oz = pl.pallas_call(
            kernel,
            grid=(rows,),
            in_specs=[spec, spec, spec, cspec],
            out_specs=(spec, spec, spec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(x, y, z, consts)
        return ox[:, :, 0], oy[:, :, 0], oz[:, :, 0]

    return jax.jit(run)


def _msm_geometry(curve: Type[Curve], n: int):
    bits = curve.SCALAR.MODULUS.bit_length()
    c = 8 if n >= (1 << 15) else 4
    nwin = (bits + c - 1) // c
    T = LANES
    n_pad = ((n + T - 1) // T) * T
    return c, nwin, T, n_pad


class DeviceBases:
    """Transposed affine coordinate tables for the Pallas MSM, padded to a
    lane multiple and cached on the owning MSMBases."""

    def __init__(self, curve: Type[Curve], points: Sequence[Point], n_pad: int):
        # An MSM over n scalars uses the first n bases (reference
        # best_multiexp zips scalars with bases); extra basis points are
        # dropped and missing lanes are padded with the generator, whose
        # zero digits land in the discard bucket.
        points = list(points)[:n_pad]
        self.curve = curve
        self.n = len(points)
        self.n_pad = n_pad
        cc = CurveCtx(curve)
        p = curve.p()
        r = cc.fctx.r_int
        g = curve.generator().xy
        xs, ys = [], []
        for pt in points:
            assert not pt.is_identity(), "device MSM bases must be affine"
            xs.append(pt.xy[0] * r % p)
            ys.append(pt.xy[1] * r % p)
        pad = n_pad - len(points)
        xs.extend([g[0] * r % p] * pad)
        ys.extend([g[1] * r % p] * pad)
        from .limbs import ints_to_limbs

        self.px = jnp.asarray(ints_to_limbs(xs)).T.copy()  # (16, n_pad)
        self.py = jnp.asarray(ints_to_limbs(ys)).T.copy()


def msm_pallas_many(
    scal: jnp.ndarray,
    bases,
    interpret: bool = None,
    mont: bool = True,
) -> List[Point]:
    """M MSMs over shared bases: scal (M, n, 16) device limb tensors
    (Montgomery when mont=True, canonical [0, p) otherwise) -> M Points.
    Exact same group elements as msm_host."""
    curve = bases.curve
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, n, _ = scal.shape
    c, nwin, T, n_pad = _msm_geometry(curve, n)
    B = 1 << c
    db = bases.device_tables(n_pad)

    sctx = FieldCtx(curve.SCALAR)
    canon = from_mont(scal, sctx) if mont else scal  # (M, n, 16) in [0, p)
    canon = jnp.transpose(canon, (0, 2, 1))
    if n_pad != n:
        canon = jnp.pad(canon, [(0, 0), (0, 0), (0, n_pad - n)])

    bx, by, bz = _accum_fn(curve, M, n_pad, T, c, nwin, interpret)(
        canon, db.px, db.py
    )
    fx, fy, fz = _fold_fn(curve, M * nwin, B, T, interpret)(bx, by, bz)
    rx, ry, rz = _lane_reduce_fn(curve, M * nwin, T, interpret)(fx, fy, fz)

    cc = bases.cc
    wins = cc.decode_points(PointVec(rx, ry, rz))  # M * nwin window sums

    p = curve.p()
    out = []
    for m in range(M):
        acc = JAC_IDENTITY
        for w in range(nwin - 1, -1, -1):
            for _ in range(c):
                acc = jac_double(acc, p)
            acc = jac_add(acc, wins[m * nwin + w].jacobian(), p)
        out.append(curve.from_jacobian(acc))
    return out


def msm_pallas(scalars, bases, interpret: bool = None) -> Point:
    """Single MSM; `scalars` is a host int sequence or an (n, 16) Montgomery
    limb tensor already on device."""
    if isinstance(scalars, jnp.ndarray):
        return msm_pallas_many(scalars[None], bases, interpret=interpret)[0]
    from .limbs import ints_to_limbs

    q = bases.curve.SCALAR.MODULUS
    canon = jnp.asarray(ints_to_limbs([int(s) % q for s in scalars]))
    return msm_pallas_many(canon[None], bases, interpret=interpret, mont=False)[0]
