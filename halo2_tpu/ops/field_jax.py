"""Batched prime-field arithmetic over 16-bit limb tensors in JAX.

This is the TPU-native counterpart of the reference's `ff`-based scalar
arithmetic (SURVEY.md layer 0/1): every operation is vectorized over an
arbitrary batch of field elements held as (..., 16) uint32 tensors (16-bit
little-endian limbs) in Montgomery form (x*R mod p, R = 2^256).

Design (TPU-first):

  * **Lazy reduction domain [0, 2p).** All device values are Montgomery
    residues reduced only below 2p. REDC is closed on [0,2p) (for p < 2^254,
    (4p^2 + 2^256 p)/2^256 < 2p), so multiplication needs *no* final
    conditional subtraction; adds/subs do one branchless compare-subtract of
    2p. Exact canonicalization happens once, at the host boundary.
  * **Three-multiply REDC** (m = t_lo * (-p^-1) mod R; r = (t + m*p)/R)
    instead of serially interleaved CIOS: each big multiply is one batched
    (…,16,16) limb-product plus static shears - a handful of XLA ops rather
    than hundreds, which keeps both compile time and VPU dispatch low.
  * 16-bit limbs because the TPU VPU has no 32x32->64 multiply: limb products
    fit uint32 exactly, and a 33-column accumulator stays below 2^22.
  * Fermat inversion (x^(p-2)) via lax.scan over exponent bits - a single
    mont_mul pair in the compiled graph, data-independent control flow.

Everything is jit-friendly: static shapes, no data-dependent branching.
"""

from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldElement
from .limbs import LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs, ints_to_limbs, limbs_to_ints

U32 = jnp.uint32
I32 = jnp.int32
MASK = jnp.uint32(LIMB_MASK)
NCOLS = 2 * NLIMBS + 1  # 33 product columns


class FieldCtx:
    """Per-modulus constants for limb arithmetic, derived from a spec field.

    Cached per field class; hashable by identity so it can close over jitted
    functions.
    """

    _cache: dict = {}

    def __new__(cls, field: Type[FieldElement]):
        if field in cls._cache:
            return cls._cache[field]
        self = super().__new__(cls)
        cls._cache[field] = self
        p = field.MODULUS
        self.field = field
        self.p_int = p
        self.p_limbs = jnp.asarray(int_to_limbs(p))
        self.twop_limbs = jnp.asarray(int_to_limbs(2 * p))
        # N' = -p^{-1} mod 2^256 (full-width for the 3-multiply REDC)
        self.nprime_int = (-pow(p, -1, 1 << 256)) % (1 << 256)
        self.nprime_limbs = jnp.asarray(int_to_limbs(self.nprime_int))
        self.r_int = (1 << 256) % p
        self.r2_int = (self.r_int * self.r_int) % p
        self.r_limbs = jnp.asarray(int_to_limbs(self.r_int))
        self.r2_limbs = jnp.asarray(int_to_limbs(self.r2_int))
        # p-2 bits msb-first for Fermat inversion ladder
        e = p - 2
        self.inv_exp_bits = [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)]
        # jitted entry points bound to this ctx (compiled once per shape);
        # use the raw functions when composing inside a larger jit
        self.mul = jax.jit(lambda a, b: mont_mul(a, b, self))
        self.add = jax.jit(lambda a, b: add_mod(a, b, self))
        self.sub = jax.jit(lambda a, b: sub_mod(a, b, self))
        self.neg = jax.jit(lambda a: neg_mod(a, self))
        self.inv = jax.jit(lambda a: inv_mod(a, self))
        self._to_mont_jit = jax.jit(
            lambda x: mont_mul(x, jnp.broadcast_to(self.r2_limbs, x.shape), self)
        )
        self._from_mont_jit = jax.jit(lambda x: from_mont(x, self))
        return self

    # ---------------- host <-> device conversion ----------------
    def to_mont(self, x):
        """Canonical limbs -> Montgomery limbs (multiply by R^2, REDC)."""
        return self._to_mont_jit(x)

    def from_mont(self, x):
        """Montgomery limbs -> canonical (< p) limbs."""
        return self._from_mont_jit(x)

    def encode_ints(self, vals) -> jnp.ndarray:
        """Python ints -> (n,16) Montgomery limbs on device."""
        canon = jnp.asarray(ints_to_limbs([v % self.p_int for v in vals]))
        return self.to_mont(canon)

    def encode_elems(self, elems) -> jnp.ndarray:
        return self.encode_ints([e.v for e in elems])

    def decode(self, x) -> list:
        """Montgomery limbs -> list of spec field elements."""
        canon = np.asarray(jax.device_get(self.from_mont(x)))
        flat = canon.reshape(-1, NLIMBS)
        return [self.field(v) for v in limbs_to_ints(flat)]

    def decode_ints(self, x) -> list:
        canon = np.asarray(jax.device_get(self.from_mont(x)))
        return limbs_to_ints(canon.reshape(-1, NLIMBS))

    def const(self, v: int) -> jnp.ndarray:
        """Single constant in Montgomery form, shape (16,)."""
        return jnp.asarray(int_to_limbs((v % self.p_int) * self.r_int % self.p_int))

    def consts(self, vals) -> jnp.ndarray:
        """Constants in Montgomery form, shape (n, 16) (host-side packing)."""
        return jnp.asarray(
            ints_to_limbs([(v % self.p_int) * self.r_int % self.p_int for v in vals])
        )

    @property
    def one(self) -> jnp.ndarray:
        return self.r_limbs


# ---------------- internal column helpers ----------------


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product in column form: (...,16) x (...,16) -> (...,33).

    Column k accumulates lo halves of a_i*b_j with i+j=k and hi halves with
    i+j=k-1; at most 32 16-bit terms per column -> < 2^21, exact in uint32.
    """
    prod = a[..., :, None] * b[..., None, :]  # (...,16,16), a_i*b_j < 2^32
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    nd = lo.ndim - 2
    rows = []
    for i in range(NLIMBS):
        pad_lo = [(0, 0)] * nd + [(i, NCOLS - NLIMBS - i)]
        pad_hi = [(0, 0)] * nd + [(i + 1, NCOLS - NLIMBS - i - 1)]
        rows.append(jnp.pad(lo[..., i, :], pad_lo))
        rows.append(jnp.pad(hi[..., i, :], pad_hi))
    return sum(rows[1:], rows[0])


def _sweep(cols: jnp.ndarray, nout: int) -> jnp.ndarray:
    """Serial exact carry propagation; returns first `nout` limbs (< 2^16)."""
    n = cols.shape[-1]
    out = []
    carry = jnp.zeros(cols.shape[:-1], U32)
    for k in range(min(n, nout)):
        v = cols[..., k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    res = jnp.stack(out, axis=-1)
    if res.shape[-1] < nout:
        pad = [(0, 0)] * (res.ndim - 1) + [(0, nout - res.shape[-1])]
        res = jnp.pad(res, pad)
    return res


def _sub_if_ge(t: jnp.ndarray, m_limbs: jnp.ndarray) -> jnp.ndarray:
    """Branchless: t - m if t >= m else t, for 16-limb t,m with t < 2m."""
    borrow = jnp.zeros(t.shape[:-1], U32)
    diffs = []
    for k in range(NLIMBS):
        d = t[..., k] - m_limbs[k] - borrow
        borrow = (d >> 31) & 1  # wraparound sign bit = underflow
        diffs.append(d & MASK)
    diff = jnp.stack(diffs, axis=-1)
    ge = (borrow == 0)[..., None]
    return jnp.where(ge, diff, t)


# ---------------- public primitives (shape (..., 16) uint32) ----------------


def mont_mul(a: jnp.ndarray, b: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Montgomery product REDC(a*b) on the lazy domain [0, 2p).

    3-multiply REDC: t = a*b; m = (t mod R) * N' mod R; r = (t + m*p)/R.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t_cols = _mul_cols(a, b)  # (...,33)
    t_lo = _sweep(t_cols[..., :NLIMBS], NLIMBS)
    m = _sweep(
        _mul_cols(t_lo, jnp.broadcast_to(ctx.nprime_limbs, shape))[..., :NLIMBS], NLIMBS
    )
    mp_cols = _mul_cols(m, jnp.broadcast_to(ctx.p_limbs, shape))
    total = t_cols + mp_cols  # columns < 2^22
    # (t + m*p) is divisible by R; sweep everything, keep limbs 16..31
    full = _sweep(total, NCOLS)
    # carries from the low half must flow into the high half: _sweep already
    # propagated serially across all 33 columns, so the result is exact.
    return full[..., NLIMBS : NLIMBS + NLIMBS]


def from_mont(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Montgomery -> canonical (< p): REDC against 1, then reduce mod p."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    r = mont_mul(a, one, ctx)  # < 2p
    return _sub_if_ge(r, ctx.p_limbs)


def add_mod(a: jnp.ndarray, b: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(a + b) on the lazy domain: result < 2p."""
    s = _sweep(a + b, NLIMBS + 1)
    # a+b < 4p < 2^257: limb 16 holds the 2^256 bit
    hi = s[..., NLIMBS]
    t = s[..., :NLIMBS]
    # subtract 2p when the 2^256 bit is set (value surely >= 2p) or when
    # the 16-limb value >= 2p
    borrow = jnp.zeros(t.shape[:-1], U32)
    diffs = []
    for k in range(NLIMBS):
        d = t[..., k] - ctx.twop_limbs[k] - borrow
        borrow = (d >> 31) & 1
        diffs.append(d & MASK)
    diff = jnp.stack(diffs, axis=-1)
    ge = ((borrow == 0) | (hi > 0))[..., None]
    return jnp.where(ge, diff, t)


def sub_mod(a: jnp.ndarray, b: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(a - b) on the lazy domain: a - b + 2p, reduced below 2p."""
    av = a.astype(I32)
    bv = b.astype(I32)
    tp = ctx.twop_limbs.astype(I32)
    cols = av + tp - bv  # in (-2^16, 2^17+2^16), signed
    out = []
    carry = jnp.zeros(cols.shape[:-1], I32)
    for k in range(NLIMBS):
        v = cols[..., k] + carry
        out.append(v & jnp.int32(LIMB_MASK))
        carry = v >> LIMB_BITS  # arithmetic shift: negative carries work
    hi = carry  # 2^256 bit (0 or 1; total in (0, 4p))
    t = jnp.stack(out, axis=-1).astype(U32)
    borrow = jnp.zeros(t.shape[:-1], U32)
    diffs = []
    for k in range(NLIMBS):
        d = t[..., k] - ctx.twop_limbs[k] - borrow
        borrow = (d >> 31) & 1
        diffs.append(d & MASK)
    diff = jnp.stack(diffs, axis=-1)
    ge = ((borrow == 0) | (hi > 0))[..., None]
    return jnp.where(ge, diff, t)


def neg_mod(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    return sub_mod(jnp.zeros_like(a), a, ctx)


def double_mod(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    return add_mod(a, a, ctx)


def mont_sqr(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    return mont_mul(a, a, ctx)


def inv_mod(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Fermat inversion x^(p-2) in Montgomery form; 0 maps to 0.

    lax.scan over exponent bits: one square + one select-multiply instance in
    the compiled graph.
    """
    bits = jnp.asarray(ctx.inv_exp_bits, dtype=jnp.uint32)

    def step(acc, bit):
        sq = mont_mul(acc, acc, ctx)
        withmul = mont_mul(sq, a, ctx)
        return select(bit > 0, withmul, sq), None

    acc0 = jnp.broadcast_to(ctx.r_limbs, a.shape)  # one
    acc, _ = jax.lax.scan(step, acc0, bits)
    return acc


def pow_const(a: jnp.ndarray, e: int, ctx: FieldCtx) -> jnp.ndarray:
    """a^e for a static exponent (unrolled; use for small e)."""
    if e == 0:
        return jnp.broadcast_to(ctx.r_limbs, a.shape)
    acc = None
    for i in range(e.bit_length() - 1, -1, -1):
        if acc is not None:
            acc = mont_mul(acc, acc, ctx)
        if (e >> i) & 1:
            acc = a if acc is None else mont_mul(acc, a, ctx)
    return acc


def is_zero(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """(...,) bool mask; on the lazy domain zero is represented as 0 or p."""
    z = jnp.all(a == 0, axis=-1)
    zp = jnp.all(a == ctx.p_limbs, axis=-1)
    return z | zp


def eq_mod(a: jnp.ndarray, b: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Value equality on the lazy domain."""
    return is_zero(sub_mod(a, b, ctx), ctx)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branchless where over limb vectors; mask shape broadcastable to (...,)."""
    return jnp.where(jnp.asarray(mask)[..., None], a, b)


def batch_invert_mod(a: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Invert a batch; zeros pass through (0^(p-2) = 0)."""
    return inv_mod(a, ctx)
