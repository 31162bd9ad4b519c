"""Montgomery multiplication by a CONSTANT as MXU matmuls.

Every multiply in an NTT is by a constant (stage twiddles, inter-level
twiddles, N', p), so the schoolbook limb product a*c can be phrased as ONE
matrix product with a precomputed Toeplitz operand:

    cols[k, w] = sum_i T_c[k, i] * a_nib[i, w],   T_c[k, i] = nib_{k-i}(c)

with the variable operand expanded to 64 4-bit limbs ("nibbles"). Nibble
products are <= 225 and column sums <= 64*225 = 14400 < 2^24, so the whole
contraction is EXACT in bf16 x bf16 -> f32 on the MXU (bf16 represents
0..255 exactly; f32 accumulation is exact below 2^24). int8 x int8 -> int32
is used instead when the backend supports it (half the bytes, ~2x TOPS).

REDC with a constant modulus is two more Toeplitz products (x N' truncated
to 64 columns, x p full width). Carries are propagated by vectorized
log-style relaxation over the column (sublane) axis - no serial sweeps -
then the final recombination to 16-bit limbs runs the usual 16-step sweep.

Result domain matches `field_jax.mont_mul`: inputs in [0, 2p) x [0, 2p)
would overflow the nibble bound, so inputs follow the canonical [0, p)
convention of `FieldCtx` tensors; outputs land in [0, 2p) and are reduced
to [0, p) by the same conditional subtract the fused NTT kernels use.

This is the compute core for pushing the NTT toward the chip roofline
(BASELINE.md: >= 90%): the 16x16-bit VPU schoolbook costs ~256 int32
multiplies per field mul on the 8-sublane vector unit, while the MXU does
the 64x127 nibble contraction at matrix-engine rates.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Type

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldElement
from .field_jax import FieldCtx
from .limbs import LIMB_BITS, NLIMBS, ints_to_limbs

NNIB = 4 * NLIMBS  # 64 4-bit limbs
NCOLS = 2 * NNIB - 1  # 127 product columns


def to_nibbles(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, W) u32 16-bit limbs -> (..., 64, W) u32 nibbles."""
    parts = [(a >> (4 * j)) & 0xF for j in range(4)]
    # limb i contributes nibbles 4i..4i+3: stacking on a new axis AFTER the
    # limb axis yields (..., 16, 4, W) = [limb, nibble] order, so the flat
    # index is 4*i + j
    stacked = jnp.stack(parts, axis=-2)
    shape = a.shape[:-2] + (NNIB, a.shape[-1])
    return stacked.reshape(shape)


def from_nibble_cols(cols: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(..., >=64, W) nonneg column values (any magnitude < 2^24) holding a
    value < 2^256 spread over nibble positions -> exact (..., 16, W) 16-bit
    limbs via recombination + the standard 16-step carry sweep."""
    n_in = cols.shape[-2]
    if n_in < NNIB:
        pad = [(0, 0)] * (cols.ndim - 2) + [(0, NNIB - n_in), (0, 0)]
        cols = jnp.pad(cols, pad)
    cols = cols[..., :NNIB, :]
    grp = cols.reshape(cols.shape[:-2] + (NLIMBS, 4) + cols.shape[-1:])
    w = jnp.asarray([1, 16, 256, 4096], cols.dtype).reshape(
        (1,) * (cols.ndim - 2) + (1, 4, 1)
    )
    limb_cols = (grp * w).sum(axis=-2)  # (..., 16, W), < 2^28
    # serial 16-step sweep to canonical 16-bit limbs (carry < 2^13)
    out = []
    carry = jnp.zeros(limb_cols.shape[:-2] + limb_cols.shape[-1:], limb_cols.dtype)
    for k in range(NLIMBS):
        v = limb_cols[..., k, :] + carry
        out.append(v & 0xFFFF)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-2).astype(jnp.uint32)


def _relax(cols: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Vectorized carry relaxation along the column (sublane) axis:
    col <- (col & 15) + (col_below >> 4). Each round divides the excess by
    16; `rounds` chosen so values land < 32 (enough for exact downstream
    recombination)."""
    for _ in range(rounds):
        lo = cols & 0xF
        hi = cols >> 4
        shifted = jnp.pad(
            hi, [(0, 0)] * (cols.ndim - 2) + [(1, 0), (0, 0)]
        )[..., :-1, :]
        cols = lo + shifted
    return cols


@lru_cache(maxsize=None)
def _const_tables(field: Type[FieldElement]):
    ctx = FieldCtx(field)
    nprime = int(
        sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(np.asarray(ctx.nprime_limbs)))
    )
    p = field.MODULUS
    return ctx, nprime, p


def _nibs_of(value: int, n: int) -> np.ndarray:
    return np.asarray([(value >> (4 * i)) & 0xF for i in range(n)], np.int32)


def toeplitz(value: int, out_cols: int, dtype) -> jnp.ndarray:
    """(out_cols, 64) matrix T[k, i] = nibble_{k-i}(value)."""
    nibs = _nibs_of(value, NNIB)
    t = np.zeros((out_cols, NNIB), np.int32)
    for k in range(out_cols):
        lo = max(0, k - (NNIB - 1))
        for i in range(lo, min(k, NNIB - 1) + 1):
            t[k, i] = nibs[k - i]
    # tables may be built lazily from inside a jit trace (lru caches);
    # force eager conversion so no tracer leaks into the cache
    with jax.ensure_compile_time_eval():
        return jnp.asarray(t, dtype)


def _matdtypes():
    """(operand dtype, accumulator dtype) for exact MXU contraction."""
    import os

    if os.environ.get("MXU_DTYPE", "bf16") == "int8":
        return jnp.int8, jnp.int32
    return jnp.bfloat16, jnp.float32


class MxuConstMul:
    """REDC(a * c) for fixed (field, c): three Toeplitz matmuls."""

    _cache: dict = {}

    def __new__(cls, field: Type[FieldElement], c_mont: int):
        key = (field, c_mont)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        ctx, nprime, p = _const_tables(field)
        self.ctx = ctx
        od, ad = _matdtypes()
        self.od, self.ad = od, ad
        R_mask = (1 << (LIMB_BITS * NLIMBS)) - 1
        self.t_c = toeplitz(c_mont, NCOLS, od)
        self.t_np = toeplitz(nprime & R_mask, NNIB, od)  # mod-R truncated
        self.t_p = toeplitz(p, NCOLS, od)
        return self

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        """a: (16, W) canonical [0, p) Montgomery limbs -> REDC(a*c) in
        [0, p), exact."""
        od, ad = self.od, self.ad

        def mm(t, x):
            return jax.lax.dot_general(
                t, x.astype(od), (((1,), (0,)), ((), ())),
                preferred_element_type=ad,
            )

        nib = to_nibbles(a).astype(od)  # (64, W)
        t_cols = mm(self.t_c, nib)  # (127, W) exact, <= 14400 each
        # m = (t mod R) * N' mod R: nibbles of t's low 256 bits
        t_lo32 = _relax(t_cols[:NNIB].astype(jnp.int32), 4)
        # after 4 rounds values < 32; one more exact split for pure nibbles
        lo = t_lo32 & 0xF
        car = jnp.pad(t_lo32 >> 4, [(1, 0), (0, 0)])[:-1]
        t_nib = lo + car  # < 17; a value-17 "nibble" still multiplies exactly
        m_cols = mm(self.t_np, t_nib.astype(od))  # (64, W) <= 64*16*17 ok
        m_lo32 = _relax(m_cols.astype(jnp.int32), 4)
        m_nib = (m_lo32 & 0xF) + jnp.pad(m_lo32 >> 4, [(1, 0), (0, 0)])[:-1]
        mp_cols = mm(self.t_p, m_nib.astype(od))  # (127, W)
        total = t_cols.astype(jnp.int32) + mp_cols.astype(jnp.int32)
        # t + m*p == 0 mod R: columns >= 64 of the carried form hold the
        # result; pad so relaxation keeps the carries above column 126
        # (t + m*p < 2^512 fills 128 nibble positions), relax, recombine,
        # and fold the low half's carry-out into column 64
        total = jnp.pad(total, [(0, 2 * NNIB + 1 - NCOLS), (0, 0)])
        total = _relax(total, 5)
        low, high = total[:NNIB], total[NNIB:]
        # low columns carry out into high[0]; low value itself ends as 0 mod R
        low_val_carry = _carry_out(low)
        high = high.at[0].add(low_val_carry)
        out = from_nibble_cols(high, self.ctx)  # [0, 2p)
        return _cond_sub_p_vec(out, self.ctx)


def _carry_out(low: jnp.ndarray) -> jnp.ndarray:
    """Exact carry out of the low 64 nibble columns (value/R). Columns are
    < 32 after relaxation, so the full low value < 32 * (16^64...) - compute
    via a serial mini-sweep of the 64 columns' carries only."""
    carry = jnp.zeros(low.shape[1:], low.dtype)
    for k in range(low.shape[0]):
        carry = (low[k] + carry) >> 4
    return carry


def _cond_sub_p_vec(t: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(16, W) limbs in [0, 2p) -> [0, p)."""
    p_limbs = ctx.p_limbs[:, None]
    borrow = jnp.zeros(t.shape[1:], jnp.uint32)
    diffs = []
    for k in range(NLIMBS):
        d = t[k] - p_limbs[k] - borrow
        borrow = (d >> 31) & 1
        diffs.append(d & 0xFFFF)
    diff = jnp.stack(diffs)
    return jnp.where((borrow == 0)[None, :], diff, t)


def mont_mul_const(field: Type[FieldElement], a: jnp.ndarray, c_mont: int) -> jnp.ndarray:
    """(n, 16) canonical Montgomery limbs -> REDC(a * c_mont), (n, 16).

    Transposes to the (limb, lane) layout the matmuls want and back; the
    fused NTT integration keeps tensors in (limb, lane) layout throughout.
    """
    mul = MxuConstMul(field, c_mont)
    return mul(a.T).T


# ---------------------------------------------------------------------------
# Axis-last helpers (field_jax (..., 16)-limbs-last layout) + the MXU NTT
# ---------------------------------------------------------------------------


def to_nibbles_last(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) u32 16-bit limbs -> (..., 64) u32 nibbles (index 4i+j)."""
    parts = [(a >> (4 * j)) & 0xF for j in range(4)]
    stacked = jnp.stack(parts, axis=-1)  # (..., 16, 4)
    return stacked.reshape(a.shape[:-1] + (NNIB,))


def _relax_last(cols: jnp.ndarray, rounds: int) -> jnp.ndarray:
    for _ in range(rounds):
        lo = cols & 0xF
        hi = cols >> 4
        shifted = jnp.pad(hi, [(0, 0)] * (cols.ndim - 1) + [(1, 0)])[..., :-1]
        cols = lo + shifted
    return cols


def _from_nibble_cols_last(cols: jnp.ndarray) -> jnp.ndarray:
    """(..., >=64) nonneg columns -> exact (..., 16) 16-bit u32 limbs."""
    cols = cols[..., :NNIB]
    grp = cols.reshape(cols.shape[:-1] + (NLIMBS, 4))
    w = jnp.asarray([1, 16, 256, 4096], cols.dtype)
    limb_cols = (grp * w).sum(axis=-1)
    out = []
    carry = jnp.zeros(limb_cols.shape[:-1], limb_cols.dtype)
    for k in range(NLIMBS):
        v = limb_cols[..., k] + carry
        out.append(v & 0xFFFF)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1).astype(jnp.uint32)


def _carry_out_last(low: jnp.ndarray) -> jnp.ndarray:
    carry = jnp.zeros(low.shape[:-1], low.dtype)
    for k in range(low.shape[-1]):
        carry = (low[..., k] + carry) >> 4
    return carry


def _cond_sub_p_last(t: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(..., 16) limbs in [0, 2.1p) -> [0, 1.1p) (stays in the lazy
    [0, 2p) domain of field_jax)."""
    p_limbs = ctx.p_limbs
    borrow = jnp.zeros(t.shape[:-1], jnp.uint32)
    diffs = []
    for k in range(NLIMBS):
        d = t[..., k] - p_limbs[k] - borrow
        borrow = (d >> 31) & 1
        diffs.append(d & 0xFFFF)
    diff = jnp.stack(diffs, axis=-1)
    return jnp.where((borrow == 0)[..., None], diff, t)


@lru_cache(maxsize=None)
def _shared_tables(field: Type[FieldElement]):
    ctx, nprime, p = _const_tables(field)
    od, ad = _matdtypes()
    R_mask = (1 << (LIMB_BITS * NLIMBS)) - 1
    return (
        ctx,
        toeplitz(nprime & R_mask, NNIB, od),
        toeplitz(p, NCOLS, od),
        od,
        ad,
    )


def mont_mul_const_batched(
    field: Type[FieldElement], a: jnp.ndarray, t_c: jnp.ndarray
) -> jnp.ndarray:
    """REDC(a * c_j) with a (..., m, 16) lazy-domain limbs and a batch of
    Toeplitz constants t_c (m, 127, 64); returns (..., m, 16) in [0, 2p).

    The three contractions run on the MXU (bf16/int8 per MXU_DTYPE);
    everything else is vectorized carry relaxation on the VPU."""
    ctx, t_np, t_p, od, ad = _shared_tables(field)

    def mm(t, x, out_cols):
        # out[..., j, c] = sum_i t[j, c, i] * x[..., j, i]
        return jnp.einsum(
            "jci,...ji->...jc", t[:, :out_cols], x.astype(od),
            preferred_element_type=ad,
        )

    nib = to_nibbles_last(a).astype(od)
    t_cols = mm(t_c, nib, NCOLS)
    t_lo32 = _relax_last(t_cols[..., :NNIB].astype(jnp.int32), 4)
    t_nib = (t_lo32 & 0xF) + jnp.pad(
        t_lo32 >> 4, [(0, 0)] * (t_lo32.ndim - 1) + [(1, 0)]
    )[..., :-1]
    m_cols = jnp.einsum(
        "ci,...ji->...jc", t_np, t_nib.astype(od), preferred_element_type=ad
    )
    m_lo32 = _relax_last(m_cols.astype(jnp.int32), 4)
    m_nib = (m_lo32 & 0xF) + jnp.pad(
        m_lo32 >> 4, [(0, 0)] * (m_lo32.ndim - 1) + [(1, 0)]
    )[..., :-1]
    mp_cols = jnp.einsum(
        "ci,...ji->...jc", t_p, m_nib.astype(od), preferred_element_type=ad
    )
    total = t_cols.astype(jnp.int32) + mp_cols.astype(jnp.int32)
    total = jnp.pad(total, [(0, 0)] * (total.ndim - 1) + [(0, 2 * NNIB + 1 - NCOLS)])
    total = _relax_last(total, 5)
    low, high = total[..., :NNIB], total[..., NNIB:]
    high = high.at[..., 0].add(_carry_out_last(low))
    out = _from_nibble_cols_last(high)
    return _cond_sub_p_last(out, ctx)


class MxuNttPlan:
    """NTT with stage-twiddle multiplies on the MXU (NTT=mxu).

    Same recursive mixed-radix decomposition as the fused Pallas plan
    (levels of <= 2^8), but at the jnp level: each level's <= 255 distinct
    stage twiddles become stacked Toeplitz operands for exact bf16/int8
    matmuls (mont_mul_const_batched); the n inter-level twiddles (one per
    element, no constant structure) stay on the VPU schoolbook path."""

    _cache: dict = {}
    MAX_LOG_F = 8

    def __new__(cls, field: Type[FieldElement], log_n: int, omega: int):
        key = (field, log_n, omega, _matdtypes()[0].__name__)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self.field = field
        self.ctx = FieldCtx(field)
        self.log_n = log_n
        self.n = 1 << log_n
        p = field.MODULUS
        od, _ad = _matdtypes()
        from .ntt import _bitrev_perm

        levels = []
        size = self.n
        root = omega
        while size > 1:
            log_size = size.bit_length() - 1
            log_f = min(log_size, self.MAX_LOG_F)
            f = 1 << log_f
            g = size // f
            w_f = pow(root, g, p)
            stage_ts = []
            for s in range(log_f):
                m = 1 << s
                w_m = pow(w_f, f >> (s + 1), p)
                tw = []
                cur = 1
                for _ in range(m):
                    tw.append(cur * self.ctx.r_int % p)
                    cur = cur * w_m % p
                stage_ts.append(
                    jnp.stack([toeplitz(t, NCOLS, od) for t in tw])
                )
            inter = None
            if g > 1:
                vals = []
                for k1 in range(f):
                    wk = pow(root, k1, p)
                    cur = self.ctx.r_int % p
                    for _ in range(g):
                        vals.append(cur)
                        cur = cur * wk % p
                inter = jnp.asarray(ints_to_limbs(vals)).reshape(f, g, 1, NLIMBS)
            levels.append(
                dict(
                    f=f, g=g, log_f=log_f, stage_ts=stage_ts, inter=inter,
                    perm=jnp.asarray(_bitrev_perm(log_f)),
                )
            )
            size = g
            root = pow(root, f, p)
        self.levels = levels
        self._fn = jax.jit(self._run)
        return self

    def _col_ntt(self, x: jnp.ndarray, lvl) -> jnp.ndarray:
        """(f, M, 16) bit-reversed rows -> all radix-2 stages, natural out."""
        from .field_jax import add_mod, sub_mod

        f = lvl["f"]
        M = x.shape[1]
        for s in range(lvl["log_f"]):
            m = 1 << s
            blocks = x.reshape(f // (2 * m), 2, m, M, NLIMBS)
            lo = blocks[:, 0]
            hi = blocks[:, 1]
            if s == 0:
                t = hi
            else:
                # batch axis j=m is axis -3 of (blk, m, M, 16): move the
                # twiddle batch next to the limb axis for the einsum
                hi_b = jnp.swapaxes(hi, 1, 2)  # (blk, M, m, 16)
                t = mont_mul_const_batched(self.field, hi_b, lvl["stage_ts"][s])
                t = jnp.swapaxes(t, 1, 2)
            x = jnp.stack(
                [add_mod(lo, t, self.ctx), sub_mod(lo, t, self.ctx)], axis=1
            ).reshape(f, M, NLIMBS)
        return x

    def _ntt_axis0(self, x: jnp.ndarray, level_idx: int) -> jnp.ndarray:
        from .field_jax import mont_mul

        lvl = self.levels[level_idx]
        f, g = lvl["f"], lvl["g"]
        B = x.shape[1]
        x = x.reshape(f, g, B, NLIMBS)
        x = jnp.take(x, lvl["perm"], axis=0)
        y = self._col_ntt(x.reshape(f, g * B, NLIMBS), lvl)
        if g == 1:
            return y.reshape(f, B, NLIMBS)
        y = y.reshape(f, g, B, NLIMBS)
        y = mont_mul(y, jnp.broadcast_to(lvl["inter"], y.shape), self.ctx)
        y = jnp.swapaxes(y, 0, 1).reshape(g, f * B, NLIMBS)
        z = self._ntt_axis0(y, level_idx + 1)  # (g, (f, B), 16)
        return z.reshape(g * f, B, NLIMBS)

    def _run(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._ntt_axis0(a.reshape(self.n, 1, NLIMBS), 0).reshape(
            self.n, NLIMBS
        )

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        from ..utils.measure import span

        with span(f"ntt-mxu 2^{self.log_n}", category="fft"):
            if a.ndim == 2:
                return self._fn(a)
            flat = a.reshape(-1, self.n, NLIMBS)
            return jax.vmap(self._run)(flat).reshape(a.shape)
