"""Fused Pallas NTT: recursive mixed-radix decomposition with every
sub-transform's butterfly stages executed in VMEM.

The jnp radix-2 path (`ops/ntt.py`) materializes every butterfly stage's
limb temporaries in HBM (~25 GB of traffic for k=20, ~200x off the memory
roofline). Here the transform is decomposed Cooley-Tukey style into factors
of at most 2^8 (standing in for the reference's four-step `fft/parallel.rs`
structure): each level is ONE `pallas_call` that runs all log2(f) butterfly
stages of a size-f column NTT on a VMEM-resident tile and folds in the
inter-level twiddle multiply; XLA transposes (single HBM passes) re-stripe
between levels.

Tile layout is (rows, 16 limbs, W): limbs on the sublane axis, a block of
W=128 independent transforms on the lane axis. All broadcasts are
single-axis (limb slices broadcast over sublanes, per-row twiddles over
lanes), which is the form Mosaic supports; the Montgomery product
accumulates shifted limb products into a (rows, 33, W) column accumulator
without ever forming the (16, 16) outer product.

Level math (j = j1 * g + j2, j1 < f, j2 < g):
    X[k1 + f*k2] = ntt_g over j2 [ w_size^(j1... ) ]:
    Y[k1, j2] = (sum_j1 w_f^(j1*k1) M[j1, j2]) * w_size^(k1*j2)
    X[k1 + f*k2] = ntt_g(Y[k1, :])[k2]   (recurse, root w^f)
"""

from __future__ import annotations

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FieldElement
from .field_jax import FieldCtx
from .limbs import LIMB_BITS, LIMB_MASK, NLIMBS, ints_to_limbs
from .ntt import _bitrev_perm

U32 = jnp.uint32
I32 = jnp.int32
MASK = np.uint32(LIMB_MASK)
NCOLS = 2 * NLIMBS + 1
MAX_KERNEL_ROWS = 1 << 8
LANES = 128

# limb axis is -2 throughout: tensors are (..., L, W)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, W) x (..., 16, W) -> (..., 33, W) schoolbook columns.

    a's limb i is sliced (sublane slice, broadcast over b's 16 sublanes);
    the shifted partial products accumulate via sublane-offset pads."""
    nd = a.ndim
    rows = []
    for i in range(NLIMBS):
        prod = a[..., i : i + 1, :] * b  # (..., 16, W), < 2^32
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        rows.append(
            jnp.pad(lo, [(0, 0)] * (nd - 2) + [(i, NCOLS - NLIMBS - i), (0, 0)])
        )
        rows.append(
            jnp.pad(hi, [(0, 0)] * (nd - 2) + [(i + 1, NCOLS - NLIMBS - i - 1), (0, 0)])
        )
    acc = rows[0]
    for r in rows[1:]:
        acc = acc + r
    return acc


def _sweep_serial(cols: jnp.ndarray, nout: int) -> jnp.ndarray:
    """Serial carry propagation along the limb (sublane) axis.

    All row temporaries keep an explicit (..., 1, W) shape: a 1-D (W,)
    vector with W > 128 gets packed across sublanes by Mosaic, and
    re-broadcasting it against (..., L, W) is an unsupported
    sublane+lane broadcast (the round-4 W=1024 kernel failure)."""
    n = cols.shape[-2]
    out = []
    carry = jnp.zeros(cols.shape[:-2] + (1,) + cols.shape[-1:], U32)
    for k in range(min(n, nout)):
        v = cols[..., k : k + 1, :] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    res = jnp.concatenate(out, axis=-2)
    if res.shape[-2] < nout:
        res = jnp.pad(
            res, [(0, 0)] * (res.ndim - 2) + [(0, nout - res.shape[-2]), (0, 0)]
        )
    return res


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Move row k to row k+d (zeros shift in below), same length."""
    n = x.shape[-2]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(d, 0), (0, 0)])[..., :n, :]


def _sweep_ks(cols: jnp.ndarray, nout: int) -> jnp.ndarray:
    """Log-depth exact carry propagation (Kogge-Stone).

    The serial sweep is a ~C-step dependent chain of (..., 1, W) row ops —
    latency-bound (ROADMAP r4: ~35% of the tile multiply). Here: one
    squeeze turns the < 2^22 accumulator columns into 16-bit limbs plus
    BINARY carries (carry < 2^6, so local + carry < 2^17), then a 6-step
    Kogge-Stone generate/propagate prefix resolves all carry chains with
    full-height (..., C, W) ops the VPU runs at 8 sublanes/tick.
    Carries beyond row nout-1 are dropped (same contract as serial)."""
    n = min(cols.shape[-2], nout)
    v = cols[..., :n, :]
    v2 = (v & MASK) + _shift_up(v >> LIMB_BITS, 1)
    g = v2 >> LIMB_BITS  # in {0, 1}
    p = ((v2 & MASK) == MASK).astype(U32)
    d = 1
    while d < n:
        gs = _shift_up(g, d)
        ps = _shift_up(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    res = (v2 + _shift_up(g, 1)) & MASK
    if res.shape[-2] < nout:
        res = jnp.pad(
            res, [(0, 0)] * (res.ndim - 2) + [(0, nout - res.shape[-2]), (0, 0)]
        )
    return res


def _sweep(cols: jnp.ndarray, nout: int) -> jnp.ndarray:
    import os

    if os.environ.get("H2_SWEEP", "ks") == "serial":
        return _sweep_serial(cols, nout)
    return _sweep_ks(cols, nout)


def _mont_mul(a, b, nprime, plimbs):
    """REDC(a*b) on [0, 2p); nprime/plimbs are (16, 1) lane-broadcastable."""
    t_cols = _mul_cols(a, b)
    t_lo = _sweep(t_cols[..., :NLIMBS, :], NLIMBS)
    m = _sweep(_mul_cols(t_lo, nprime)[..., :NLIMBS, :], NLIMBS)
    total = t_cols + _mul_cols(m, plimbs)
    full = _sweep(total, NCOLS)
    return full[..., NLIMBS : 2 * NLIMBS, :]


def _sub_2p_if_ge_serial(t, twop, hi=None):
    # row temporaries stay (..., 1, W) -- see _sweep
    borrow = jnp.zeros(t.shape[:-2] + (1,) + t.shape[-1:], U32)
    diffs = []
    for k in range(NLIMBS):
        d = t[..., k : k + 1, :] - twop[..., k : k + 1, :] - borrow
        borrow = (d >> 31) & 1
        diffs.append(d & MASK)
    diff = jnp.concatenate(diffs, axis=-2)
    ge = borrow == 0
    if hi is not None:
        ge = ge | (hi > 0)
    return jnp.where(ge, diff, t)


def _sub_2p_if_ge_ks(t, twop, hi=None):
    """Log-depth borrow chain: generate g_k = t_k < m_k, propagate
    p_k = t_k == m_k, Kogge-Stone prefix; borrow_in[k] = prefix[k-1]."""
    tp = jnp.broadcast_to(twop, t.shape)
    g = (t < tp).astype(U32)
    p = (t == tp).astype(U32)
    d = 1
    while d < NLIMBS:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    diff = (t - tp - _shift_up(g, 1)) & MASK
    ge = g[..., NLIMBS - 1 : NLIMBS, :] == 0  # no borrow out of the top limb
    if hi is not None:
        ge = ge | (hi > 0)
    return jnp.where(ge, diff, t)


def _sub_2p_if_ge(t, twop, hi=None):
    import os

    if os.environ.get("H2_SWEEP", "ks") == "serial":
        return _sub_2p_if_ge_serial(t, twop, hi)
    return _sub_2p_if_ge_ks(t, twop, hi)


def _add_mod(a, b, twop):
    s = _sweep(a + b, NLIMBS + 1)
    return _sub_2p_if_ge(s[..., :NLIMBS, :], twop, s[..., NLIMBS : NLIMBS + 1, :])


def _sub_mod_serial(a, b, twop):
    cols = a.astype(I32) + twop.astype(I32) - b.astype(I32)
    out = []
    carry = jnp.zeros(cols.shape[:-2] + (1,) + cols.shape[-1:], I32)
    for k in range(NLIMBS):
        v = cols[..., k : k + 1, :] + carry
        out.append(v & jnp.int32(LIMB_MASK))
        carry = v >> LIMB_BITS
    hi = carry.astype(U32)
    t = jnp.concatenate(out, axis=-2).astype(U32)
    return _sub_2p_if_ge_serial(t, twop, hi)


def _sub_mod_ks(a, b, twop):
    """a - b + 2p via 2^256-complement so every column stays unsigned and
    the log-depth sweep applies: a + 2p + (2^256 - b) = wanted + 2^256,
    and the sweep's limb-16 row is exactly 1 + the old signed carry-out."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    cols = a + (MASK - b) + jnp.broadcast_to(twop, shape)
    cols = jnp.concatenate(
        [cols[..., 0:1, :] + 1, cols[..., 1:, :]], axis=-2
    )
    cols = jnp.pad(cols, [(0, 0)] * (cols.ndim - 2) + [(0, 1), (0, 0)])
    s = _sweep_ks(cols, NLIMBS + 1)
    hi = s[..., NLIMBS : NLIMBS + 1, :] - 1
    return _sub_2p_if_ge_ks(s[..., :NLIMBS, :], twop, hi)


def _sub_mod(a, b, twop):
    import os

    if os.environ.get("H2_SWEEP", "ks") == "serial":
        return _sub_mod_serial(a, b, twop)
    return _sub_mod_ks(a, b, twop)


def _col_ntt_kernel(rows: int, with_twiddle: bool):
    """All radix-2 stages of a size-`rows` column NTT (bit-reversed input,
    natural output), optionally followed by a pointwise twiddle multiply."""
    log_rows = rows.bit_length() - 1

    def kernel(*refs):
        if with_twiddle:
            x_ref, stw_ref, consts_ref, inter_ref, o_ref = refs
        else:
            x_ref, stw_ref, consts_ref, o_ref = refs
        nprime = consts_ref[0][:, None]  # (L, 1) lane-broadcast
        plimbs = consts_ref[1][:, None]
        twop = consts_ref[2][:, None]
        x = x_ref[:]  # (rows, L, W), bit-reversed row order
        W = x.shape[-1]
        for s in range(log_rows):
            m = 1 << s
            blocks = x.reshape(rows // (2 * m), 2, m, NLIMBS, W)
            lo = blocks[:, 0]
            hi = blocks[:, 1]
            if s == 0:
                t = hi  # stage-0 twiddles are all 1
            else:
                tw = stw_ref[s].reshape(rows // (2 * m), m, NLIMBS, 1)
                t = _mont_mul(hi, tw, nprime, plimbs)
            x = jnp.stack(
                [_add_mod(lo, t, twop), _sub_mod(lo, t, twop)], axis=1
            ).reshape(rows, NLIMBS, W)
        if with_twiddle:
            x = _mont_mul(x, inter_ref[:], nprime, plimbs)
        o_ref[:] = x

    return kernel


class PallasNttPlan:
    """Recursive NTT plan; __call__ maps (n, 16) -> (n, 16) Montgomery limbs."""

    _cache: dict = {}

    def __new__(cls, field: Type[FieldElement], log_n: int, omega: int,
                interpret: bool = None):
        key = (field, log_n, omega)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self.field = field
        self.ctx = FieldCtx(field)
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega
        self.p = field.MODULUS
        self.r = self.ctx.r_int
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        self.consts = jnp.stack(
            [self.ctx.nprime_limbs, self.ctx.p_limbs, self.ctx.twop_limbs]
        )
        self._host_arrays = []  # keep twiddle arrays alive per level
        self._plan_levels()
        self._fn = jax.jit(self._run)
        return self

    # ---------------- plan construction (host side) ----------------
    def _plan_levels(self):
        p, r = self.p, self.r
        levels = []
        size = self.n
        root = self.omega
        while size > 1:
            log_size = size.bit_length() - 1
            log_f = min(log_size, MAX_KERNEL_ROWS.bit_length() - 1)
            f = 1 << log_f
            g = size // f
            # packed per-stage butterfly twiddles (log_f, f//2, L)
            stages = []
            w_f = pow(root, g, p)
            for s in range(log_f):
                m = 1 << s
                w_m = pow(w_f, f >> (s + 1), p)
                base = [1]
                for _ in range(m - 1):
                    base.append(base[-1] * w_m % p)
                for _ in range(f // (2 * m)):
                    stages.extend(base)
            stw = jnp.asarray(
                ints_to_limbs([v * r % p for v in stages])
            ).reshape(log_f, f // 2, NLIMBS)

            inter = None
            tw_width = None
            if g > 1:
                # inter-level twiddle T[k1, j2] = root^(k1*j2); stored
                # (f, L, tw_width) with the j2 pattern tiled to >= LANES
                tw_width = max(g, LANES)
                vals = []
                for k1 in range(f):
                    wk = pow(root, k1, p)
                    row = []
                    cur = r % p
                    for _ in range(g):
                        row.append(cur)
                        cur = cur * wk % p
                    row = row * (tw_width // g)
                    vals.extend(row)
                inter = jnp.transpose(
                    jnp.asarray(ints_to_limbs(vals)).reshape(f, tw_width, NLIMBS),
                    (0, 2, 1),
                )
            levels.append(
                dict(
                    f=f, g=g, log_f=log_f, stw=stw, inter=inter, tw_width=tw_width,
                    perm=jnp.asarray(_bitrev_perm(log_f)),
                )
            )
            size = g
            root = pow(root, f, p)
        self.levels = levels

    # ---------------- one level's pallas_call ----------------
    def _level_call(self, x, lvl):
        """x: (f, L, batch) with rows bit-reversed; returns transformed
        (+ twiddled) (f, L, batch)."""
        f = lvl["f"]
        g = lvl["g"]
        batch = x.shape[-1]
        W = min(LANES, batch)
        with_tw = lvl["inter"] is not None
        kernel = _col_ntt_kernel(f, with_tw)
        in_specs = [
            pl.BlockSpec((f, NLIMBS, W), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (lvl["log_f"], f // 2, NLIMBS), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [x, lvl["stw"], self.consts]
        if with_tw:
            tw = lvl["inter"]
            tw_width = lvl["tw_width"]
            if W < LANES:
                # batch < one lane tile: a single narrow block; period g
                # (<= batch = W) divides W. Slicing when W == 128 but
                # g > 128 truncated the twiddle pattern (wrong transforms
                # for n with a > 2^8 second factor - latent since round 1)
                tw = tw[:, :, :W]
                tw_width = W
            nblk = max(1, tw_width // W)
            in_specs.append(
                pl.BlockSpec(
                    (f, NLIMBS, W),
                    lambda i, _n=nblk: (0, 0, jax.lax.rem(i, _n)),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(tw)
        return pl.pallas_call(
            kernel,
            grid=(batch // W,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (f, NLIMBS, W), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((f, NLIMBS, batch), U32),
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    # ---------------- recursive driver (traced) ----------------
    def _ntt_axis0(self, x, level_idx: int):
        """x: (size, L, B) -> NTT over axis 0, natural in/out order.

        The level's flattened batch is b-major, j2-minor so the inter-level
        twiddle (period g, j2 cycling fastest) aligns with lane blocks."""
        lvl = self.levels[level_idx]
        f, g = lvl["f"], lvl["g"]
        B = x.shape[-1]
        # split rows j = j1*g + j2: (f, g, L, B); bit-reverse j1
        x = x.reshape(f, g, NLIMBS, B)
        x = jnp.take(x, lvl["perm"], axis=0)
        x = x.transpose(0, 2, 3, 1).reshape(f, NLIMBS, B * g)
        y = self._level_call(x, lvl)  # (f=k1, L, (b, j2))
        if g == 1:
            return y.reshape(f, NLIMBS, B)
        # recurse over j2 with batch (k1, b): -> (g, L, f*B)
        y = y.reshape(f, NLIMBS, B, g).transpose(3, 1, 0, 2).reshape(g, NLIMBS, f * B)
        z = self._ntt_axis0(y, level_idx + 1)  # (g=k2, L, (k1, b))
        # output index k1 + f*k2: k2-major rows
        return z.reshape(g, NLIMBS, f, B).transpose(0, 2, 1, 3).reshape(
            g * f, NLIMBS, B
        )

    def _run(self, a):
        x = a.reshape(self.n, NLIMBS, 1)
        out = self._ntt_axis0(x, 0)
        return out.reshape(self.n, NLIMBS)

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        assert a.shape == (self.n, NLIMBS)
        if self.interpret and not getattr(self, "_warm", False):
            # XLA segfaults (de)serializing interpret-mode Pallas CPU
            # executables through the persistent compilation cache; compile
            # the first call with the cache scoped off.
            with _no_persistent_cache():
                out = self._fn(a)
            self._warm = True
            return out
        return self._fn(a)


from contextlib import contextmanager


@contextmanager
def _no_persistent_cache():
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    if prev is None:
        yield
        return
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        _cc.reset_cache()
