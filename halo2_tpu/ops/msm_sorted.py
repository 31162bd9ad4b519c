"""Sorted-bucket Pallas MSM: signed 16-bit windows, counting-sorted points,
bucket-per-lane accumulation with zero scatter cost.

TPU-native redesign of Pippenger (`best_multiexp`,
halo2_proofs/src/arithmetic.rs:41-198) replacing ops/msm_pallas.py's
one-hot VMEM-bucket kernel, whose per-step full-bucket merge dominated
runtime (VERDICT round 3). Design, driven by measured machine constants
(tools/profile_kernels.py):

  * **c = 16 signed windows = the scalar's own limbs.** Balanced recoding
    maps limb w to e_w in [-2^15, 2^15] with a carry into the next limb,
    so digit extraction is free and the window count drops from 32 (c=8)
    to 16 -- the big bucket space (2^15 by |e|; sign folds into point
    negation) is paid for by sorting, not VMEM.
  * **Counting sort by bucket, bucket-per-lane grid.** For each window,
    points are argsorted by bucket index and gathered into a
    (Cap, L, W) grid where lane l owns the KB consecutive buckets
    [KB*l, KB*l + KB) (W * KB = 2^15): rank r of lane l is the r-th
    sorted point of that bucket range. The Pallas kernel is then a pure
    strided accumulation: one complete mixed add per step into one of KB
    lane-private accumulators (a KB-row one-hot select, ~10% of the add
    cost) -- the classic Pippenger scatter (SURVEY.md hard parts #3)
    disappears into the XLA sort + gather.
  * **Poisson padding.** Lane occupancy is Binomial(n, KB/2^15) ~=
    Poisson(lam = n/W); Cap = lam + 6*sqrt(lam) + 8 makes overflow
    astronomically unlikely for field-random scalars (blinded prover
    polynomials). Structured scalars can overflow a lane: the result
    carries an overflow flag read back with the point, and the caller
    falls back to the unsorted kernel -- correctness never depends on
    the scalar distribution.
  * |e| = 2^15 (sign always -1) falls outside the KB*W bucket grid and
    is accumulated from a small (128-slot) per-window side list inside
    the fold kernel.
  * Bucket fold and window Horner run on device: sum_b b*S_b =
    KB*sum_l l*P_l + sum_s s*C_s via lane-suffix scans (log-depth
    pltpu.roll adds) and a sub-suffix loop. The whole MSM performs
    exactly ONE device->host readback (affine result + flags) -- readback
    latency is ~175 ms/call through the tunnel, measured.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves import Curve, Point
from .curve_jax import CurveCtx
from .field_jax import from_mont, inv_mod, is_zero, mont_mul
from .limbs import NLIMBS, limbs_to_ints
from .msm_pallas import _consts5, _full_padd, _mixed_padd
from .ntt_pallas import _sub_mod

U32 = jnp.uint32
I32 = jnp.int32
BUCKET_BITS = 15  # buckets by |e|, e in [-2^15, 2^15]
SIDE_CAP = 128  # slots for |e| = 2^15 points per window
DEF_W = 1024  # kernel lane width (8 hardware lane-tiles)
DEF_KB = 32  # buckets per lane; W * KB = 2^15


def _cap_for(n: int, w: int) -> int:
    lam = max(1.0, n / float(w))
    return int(math.ceil((lam + 6.0 * math.sqrt(lam) + 8.0) / 8.0)) * 8


def _cap_classes(n: int, w_lanes: int, kb: int, q: int):
    """Windows grouped by lane capacity.

    Digits of windows 0..14 are uniform over [-2^15, 2^15] so lane
    occupancy is Poisson(n/W); the TOP window's digit is bounded by the
    modulus' top limb (e.g. 0x4000 for Pasta), concentrating its points
    on the first R_top buckets - its capacity must scale by 2^15/R_top
    or it overflows DETERMINISTICALLY (not a tail event).
    Returns [(first_window, n_windows, cap), ...] in window order."""
    nw = _num_windows(q)
    cap_uni = _cap_for(n, w_lanes)
    r_top = ((q - 1) >> 240) + 2  # top recoded digit range incl. carry
    lam_top = max(1.0, n * kb / float(r_top))
    cap_top = int(math.ceil((lam_top + 6.0 * math.sqrt(lam_top) + 8.0) / 8.0)) * 8
    assert nw == 16, "17-window curves fall back to the unsorted kernel"
    return ((0, 15, cap_uni), (15, 1, cap_top))


def _num_windows(q: int) -> int:
    # the top recoded digit fits window 15 iff (q-1)'s top limb + carry
    # stays below 2^15 (true for Pasta & BN254-Fr; secp256k1 needs 17)
    return 16 if ((q - 1) >> 240) + 1 < (1 << 15) else 17


# ---------------------------------------------------------------------------
# XLA pre-stage: recode, sort, grid gather
# ---------------------------------------------------------------------------


def _recode_signed(limbs: jnp.ndarray, nw: int):
    """(n, 16) u32 canonical limbs -> (nw, n) i32 balanced digits."""
    n = limbs.shape[0]
    es = []
    carry = jnp.zeros((n,), I32)
    for w in range(16):
        t = limbs[:, w].astype(I32) + carry
        big = t >= (1 << 15)
        es.append(jnp.where(big, t - (1 << 16), t))
        carry = big.astype(I32)
    if nw > 16:
        es.append(carry)
    return jnp.stack(es[:nw])


@lru_cache(maxsize=None)
def _prestage_fn(n: int, nw: int, classes: tuple, w_lanes: int, kb: int):
    """Jitted: canonical scalar limbs + row-major base tables -> per-class
    kernel inputs (grids, meta), side lists, overflow flag. `classes` is
    ((first_window, n_windows, cap), ...) from _cap_classes."""

    assert n <= 1 << 21, "packed lane-sort key holds 11 + 21 bits"

    def run(limbs, px_rows, py_rows):
        e = _recode_signed(limbs, nw)  # (nw, n)
        bucket = jnp.abs(e)  # (nw, n) in [0, 2^15]
        # single-u32 value sort of (lane << 21 | index): accumulation is
        # commutative so only LANE grouping matters, and sorting one u32
        # beats argsort's key+payload pair sort ~2x. Zero digits sort to a
        # discard lane PAST the side lane: real columns are often mostly
        # zeros (selectors, sparse advice), which would deterministically
        # overflow lane 0's Poisson capacity - and they contribute nothing.
        lane_of = jnp.where(
            bucket == 0, U32(w_lanes + 1), (bucket // kb).astype(U32)
        )
        idx = jnp.arange(n, dtype=U32)[None, :]
        packed = jnp.sort((lane_of << 21) | idx, axis=1)
        order = packed & U32((1 << 21) - 1)  # (nw, n)
        slane = packed >> 21
        # lane boundaries: gstart[w, l] = first sorted pos with lane >= l;
        # [gstart[W], gstart[W+1]) = side list, beyond = discarded zeros
        queries = jnp.arange(w_lanes + 2, dtype=U32)
        gstart = jax.vmap(lambda sl: jnp.searchsorted(sl, queries))(slane)
        gcnt = gstart[:, 1:w_lanes + 1] - gstart[:, :w_lanes]
        side_cnt = gstart[:, w_lanes + 1] - gstart[:, w_lanes]
        caps = jnp.asarray(
            [cap for (w0, cnt, cap) in classes for _ in range(cnt)],
            gcnt.dtype,
        )
        overflow = jnp.max(
            (jnp.max(gcnt, axis=1) > caps) | (side_cnt > SIDE_CAP)
        )

        def build_window(w, cap):
            r_iota = jnp.arange(cap)[:, None]  # (cap, 1)
            pos = gstart[w, :w_lanes][None, :] + r_iota  # (cap, w_lanes)
            valid = pos < gstart[w, 1 : w_lanes + 1][None, :]
            src = jnp.take(order[w], jnp.clip(pos, 0, n - 1).reshape(-1))
            sb = kb.bit_length() - 1
            bsub = (jnp.take(bucket[w], src) % kb).astype(U32)
            sign = (jnp.take(e[w], src) < 0).astype(U32)
            meta = bsub | (sign << sb) | (valid.reshape(-1).astype(U32) << (sb + 1))
            # meta rides the unused high 16 bits of x-limb 0: no separate
            # meta tensor, no extra HBM traffic, and the kernel reads it
            # from a static sublane row
            gx = jnp.take(px_rows, src, axis=0).reshape(cap, w_lanes, NLIMBS)
            gx = gx.at[:, :, 0].set(
                gx[:, :, 0] | (meta.reshape(cap, w_lanes) << 16)
            )
            gy = jnp.take(py_rows, src, axis=0).reshape(cap, w_lanes, NLIMBS)
            return gx, gy

        grids = []
        for w0, cnt, cap in classes:
            gx, gy = zip(*(build_window(w, cap) for w in range(w0, w0 + cnt)))
            grid_x = jnp.stack(gx).transpose(0, 1, 3, 2)  # (cnt, cap, L, W)
            grid_y = jnp.stack(gy).transpose(0, 1, 3, 2)
            grids.append((grid_x, grid_y))

        sx, sy, sv = [], [], []
        for w in range(nw):
            spos = gstart[w, w_lanes] + jnp.arange(SIDE_CAP)
            svalid = spos < gstart[w, w_lanes + 1]  # zeros lie beyond
            ssrc = jnp.take(order[w], jnp.clip(spos, 0, n - 1))
            sx.append(jnp.take(px_rows, ssrc, axis=0))
            sy.append(jnp.take(py_rows, ssrc, axis=0))
            sv.append(svalid)
        side_x = jnp.stack(sx).transpose(0, 2, 1)  # (nw, L, SIDE_CAP)
        side_y = jnp.stack(sy).transpose(0, 2, 1)
        side_valid = jnp.stack(sv)  # (nw, SIDE_CAP) bool
        return grids, side_x, side_y, side_valid, overflow

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Pallas accumulate kernel
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _accum_fn(curve: Type[Curve], nw: int, cap: int, w_lanes: int, kb: int,
              chains: int, interpret: bool):
    """`chains` independent accumulator banks per lane: each grid step
    folds `chains` consecutive sorted ranks into separate bucket banks, so
    the serial add-chain dependency is split `chains` ways and the VPU can
    overlap the independent adds (the single-chain kernel was ~2x slower
    than its pure-multiply cost: latency-bound on the accumulate
    dependency). Banks are merged per bucket inside the fold kernel."""
    consts = _consts5(curve)

    def kernel(gx, gy, cref, ox, oy, oz):
        r = pl.program_id(1)
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        onem = cref[4][:, None]

        @pl.when(r == 0)
        def _init():
            ox[:] = jnp.zeros((1, chains * kb, NLIMBS, w_lanes), U32)
            oy[:] = jnp.broadcast_to(
                onem[None, None], (1, chains * kb, NLIMBS, w_lanes)
            )
            oz[:] = jnp.zeros((1, chains * kb, NLIMBS, w_lanes), U32)

        sb = kb.bit_length() - 1
        iota = jax.lax.broadcasted_iota(U32, (kb, 1, w_lanes), 0)

        for c in range(chains):
            raw = gx[0, c]
            m = raw[0:1] >> 16  # meta in x-limb-0's high bits; (1, W)
            sub = m & U32(kb - 1)
            sign = (m >> sb) & 1
            valid = (m >> (sb + 1)) & 1
            mask = iota == sub[None]  # (kb, 1, W)
            bank = slice(c * kb, (c + 1) * kb)

            def sel(ref):  # one-hot accumulator read; limbs < 2^16 so exact
                v = jnp.where(mask, ref[0, bank].astype(I32), 0)
                return jnp.sum(v, axis=0).astype(U32)

            px = raw & U32(0xFFFF)
            py = gy[0, c]
            py = jnp.where(
                sign == 1,
                _sub_mod(jnp.zeros((NLIMBS, w_lanes), U32), py, twop),
                py,
            )
            cur = (sel(ox), sel(oy), sel(oz))
            X3, Y3, Z3 = _mixed_padd(cur, (px, py), nprime, plimbs, twop, b3)
            upd = mask & (valid == 1)[None]  # (kb, 1, W)
            ox[0, bank] = jnp.where(upd, X3[None], ox[0, bank])
            oy[0, bank] = jnp.where(upd, Y3[None], oy[0, bank])
            oz[0, bank] = jnp.where(upd, Z3[None], oz[0, bank])

    gspec = pl.BlockSpec(
        (1, chains, NLIMBS, w_lanes), lambda w, r: (w, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cspec = pl.BlockSpec((5, NLIMBS), lambda w, r: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, chains * kb, NLIMBS, w_lanes), lambda w, r: (w, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def run(grid_x, grid_y):
        out_shape = tuple(
            jax.ShapeDtypeStruct((nw, chains * kb, NLIMBS, w_lanes), U32)
            for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(nw, cap // chains),
            in_specs=[gspec, gspec, cspec],
            out_specs=(ospec, ospec, ospec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(grid_x, grid_y, consts)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Pallas fold kernel: buckets (+ side list) -> one point per window
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _fold_fn(curve: Type[Curve], nw: int, w_lanes: int, kb: int,
             chains: int, interpret: bool):
    """(nw, chains*KB, L, W) bucket banks + side lists -> (nw, L, W)
    per-window sums (every lane equal): sum_b b*S_b with b = KB*lane + sub,
    plus 2^15 * side_sum. The `chains` accumulator banks of bucket s are
    merged with full adds as each bucket is consumed."""
    consts = _consts5(curve)

    def kernel(bx, by, bz, sxr, syr, svr, cref, ox, oy, oz):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        onem = cref[4][:, None]
        ident = (
            jnp.zeros((NLIMBS, w_lanes), U32),
            jnp.broadcast_to(onem, (NLIMBS, w_lanes)),
            jnp.zeros((NLIMBS, w_lanes), U32),
        )
        lanes = jax.lax.broadcasted_iota(U32, (1, w_lanes), 1)

        def padd(a, b):
            return _full_padd(a, b, nprime, plimbs, twop, b3)

        def pick(cond, a, b):  # cond (1, W) bool
            return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))

        def bucket_at(s):  # merge the chain banks of bucket s
            v = (
                bx[0, pl.ds(s, 1)][0],
                by[0, pl.ds(s, 1)][0],
                bz[0, pl.ds(s, 1)][0],
            )
            for c in range(1, chains):
                v = padd(v, (
                    bx[0, pl.ds(c * kb + s, 1)][0],
                    by[0, pl.ds(c * kb + s, 1)][0],
                    bz[0, pl.ds(c * kb + s, 1)][0],
                ))
            return v

        # sub-suffix: run = sum_{s>=j} S_s ; tot = sum_s s*S_s   (per lane)
        def sub_body(i, carry):
            run, tot = carry
            run = padd(run, bucket_at(kb - 1 - i))
            tot = padd(tot, run)
            return run, tot

        run, tot = jax.lax.fori_loop(0, kb - 1, sub_body, (ident, ident))
        p1 = padd(run, bucket_at(0))  # plain lane total

        # lane-suffix scan of p1: suf[l] = sum_{j>=l} p1[j]
        suf = p1
        sh = w_lanes // 2
        while sh >= 1:
            rolled = tuple(pltpu.roll(t, w_lanes - sh, 1) for t in suf)
            keep = lanes < U32(w_lanes - sh)  # drop wrapped-in lanes
            suf = padd(suf, pick(keep, rolled, ident))
            sh //= 2

        # LW = sum_{l>=1} suf[l]  (circular tree => all lanes equal)
        lw = pick(lanes >= 1, suf, ident)
        sh = w_lanes // 2
        while sh >= 1:
            lw = padd(lw, tuple(pltpu.roll(t, sh, 1) for t in lw))
            sh //= 2

        # SUBTOT = sum over lanes of tot (circular tree)
        st = tot
        sh = w_lanes // 2
        while sh >= 1:
            st = padd(st, tuple(pltpu.roll(t, sh, 1) for t in st))
            sh //= 2

        # total = KB * LW + SUBTOT
        acc = lw
        for _ in range(kb.bit_length() - 1):  # * KB
            acc = padd(acc, acc)
        acc = padd(acc, st)

        # side list: points with |e| = 2^15, sign always -1. Lay the
        # SIDE_CAP slots on lanes, mask invalid to the identity, circular
        # tree-reduce, then weight by 2^15.
        sval = svr[0, 0:1]  # (1, SIDE_CAP) u32 0/1
        svx = sxr[0]  # (L, SIDE_CAP)
        svy = syr[0]
        keep = sval == 1
        side = (
            jnp.where(keep, svx, 0),
            jnp.where(
                keep,
                _sub_mod(jnp.zeros_like(svy), svy, twop),  # negate y
                jnp.broadcast_to(onem, svy.shape),
            ),
            jnp.where(keep, jnp.broadcast_to(onem, svx.shape), 0),
        )
        sh = SIDE_CAP // 2
        while sh >= 1:
            side = padd(side, tuple(pltpu.roll(t, sh, 1) for t in side))
            sh //= 2
        # all SIDE_CAP lanes now hold the side total; widen to W with a
        # real lane-repeat (a broadcast view of a column feeds _mul_cols
        # a (1,1)-sliced operand, an unsupported Mosaic relayout)
        side = tuple(
            pltpu.repeat(t, w_lanes // SIDE_CAP, 1) for t in side
        )
        for _ in range(15):  # * 2^15
            side = padd(side, side)
        acc = padd(acc, side)

        ox[0], oy[0], oz[0] = acc

    bspec = pl.BlockSpec(
        (1, chains * kb, NLIMBS, w_lanes), lambda w: (w, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sspec = pl.BlockSpec(
        (1, NLIMBS, SIDE_CAP), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
    )
    svspec = pl.BlockSpec(
        (1, 8, SIDE_CAP), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec((5, NLIMBS), lambda w: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (1, NLIMBS, w_lanes), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
    )

    def run(bx, by, bz, side_x, side_y, side_valid):
        sv = jnp.broadcast_to(
            side_valid.astype(U32)[:, None, :], (nw, 8, SIDE_CAP)
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct((nw, NLIMBS, w_lanes), U32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(nw,),
            in_specs=[bspec, bspec, bspec, sspec, sspec, svspec, cspec],
            out_specs=(ospec, ospec, ospec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(bx, by, bz, side_x, side_y, sv, consts)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Horner over windows (device)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _horner_fn(curve: Type[Curve], nw: int, w_lanes: int, interpret: bool):
    """(nw, L, W) window sums -> (L, W) total = sum_w 2^(16w) * win_w."""
    consts = _consts5(curve)

    def kernel(wx, wy, wz, cref, ox, oy, oz):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]

        def padd(a, b):
            return _full_padd(a, b, nprime, plimbs, twop, b3)

        def body(i, acc):
            w = nw - 2 - i
            for _ in range(16):
                acc = padd(acc, acc)
            v = (
                wx[pl.ds(w, 1)][0],
                wy[pl.ds(w, 1)][0],
                wz[pl.ds(w, 1)][0],
            )
            return padd(acc, v)

        top = (wx[nw - 1], wy[nw - 1], wz[nw - 1])
        acc = jax.lax.fori_loop(0, nw - 1, body, top)
        ox[:], oy[:], oz[:] = acc

    spec = pl.BlockSpec(
        (nw, NLIMBS, w_lanes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    cspec = pl.BlockSpec((5, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (NLIMBS, w_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    def run(wx, wy, wz):
        out_shape = tuple(
            jax.ShapeDtypeStruct((NLIMBS, w_lanes), U32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[spec, spec, spec, cspec],
            out_specs=(ospec, ospec, ospec),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(wx, wy, wz, consts)

    return jax.jit(run)


class BucketOverflow(RuntimeError):
    """Capacity exceeded (structured scalars); caller falls back."""


@lru_cache(maxsize=None)
def _finalize_fn(curve: Type[Curve]):
    """One jitted graph: lane-0 projective total + overflow flag ->
    (33,) packed [affine x limbs | affine y limbs | is_identity | ovf]."""
    fctx = CurveCtx(curve).fctx

    @jax.jit
    def run(tx, ty, tz, overflow):
        x = tx[:, 0]
        y = ty[:, 0]
        z = tz[:, 0]
        zinv = inv_mod(z, fctx)
        xa = from_mont(mont_mul(x, zinv, fctx), fctx)
        ya = from_mont(mont_mul(y, zinv, fctx), fctx)
        zz = is_zero(z, fctx).astype(U32).reshape(1)
        ovf = overflow.astype(U32).reshape(1)
        return jnp.concatenate([xa, ya, zz, ovf])

    return run


def msm_sorted(
    scal_canon: jnp.ndarray,
    bases,
    interpret: bool = None,
    w_lanes: int = DEF_W,
) -> Point:
    """One MSM: (n, 16) canonical u32 scalar limbs x row-major device base
    tables -> host Point. Raises BucketOverflow if a capacity was
    exceeded (caller falls back to the unsorted kernel)."""
    curve = bases.curve
    q = curve.SCALAR.MODULUS
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kb = (1 << BUCKET_BITS) // w_lanes
    n = scal_canon.shape[0]
    nw = _num_windows(q)
    if nw != 16:
        raise BucketOverflow("17-window curve: unsorted kernel handles it")
    if n > (1 << 21):
        # packed lane-sort key holds 11 + 21 bits (_prestage_fn); route
        # k>=21 MSMs to the unsorted kernel instead of tripping its assert
        raise BucketOverflow(f"n={n} exceeds the 2^21 packed-sort capacity")
    classes = _cap_classes(n, w_lanes, kb, q)
    try:
        px_rows, py_rows = bases.device_rows()
    except AssertionError as e:  # identity base point: kernel needs affine
        raise BucketOverflow(str(e))
    assert px_rows.shape[0] >= n, "more scalars than bases"
    if px_rows.shape[0] != n:  # an MSM over n scalars uses the first n bases
        px_rows = px_rows[:n]
        py_rows = py_rows[:n]

    chains = int(os.environ.get("MSM_CHAINS", "4"))
    grids, sx, sy, sv, overflow = _prestage_fn(n, nw, classes, w_lanes, kb)(
        scal_canon, px_rows, py_rows
    )
    buckets = [
        _accum_fn(curve, cnt, cap, w_lanes, kb, chains, interpret)(gx, gy)
        for (_, cnt, cap), (gx, gy) in zip(classes, grids)
    ]
    bx, by, bz = (
        jnp.concatenate([b[i] for b in buckets], axis=0) for i in range(3)
    )
    wx, wy, wz = _fold_fn(curve, nw, w_lanes, kb, chains, interpret)(
        bx, by, bz, sx, sy, sv
    )
    tx, ty, tz = _horner_fn(curve, nw, w_lanes, interpret)(wx, wy, wz)

    # single readback: affine coords + identity flag + overflow flag
    packed = _finalize_fn(curve)(tx, ty, tz, overflow)
    host = np.asarray(jax.device_get(packed))
    if host[2 * NLIMBS + 1]:
        raise BucketOverflow("bucket capacity exceeded (structured scalars)")
    if host[2 * NLIMBS]:
        return Point(curve, None)
    xi = limbs_to_ints(np.ascontiguousarray(host[None, :NLIMBS]))[0]
    yi = limbs_to_ints(np.ascontiguousarray(host[None, NLIMBS : 2 * NLIMBS]))[0]
    return Point(curve, (xi, yi))
