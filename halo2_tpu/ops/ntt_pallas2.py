"""Constant-geometry (Pease) fused Pallas NTT.

Drop-in successor to ops/ntt_pallas.py solving its fatal flaw: the
original kernel unrolled every radix-2 stage (8 stages x ~10^3 Mosaic ops)
and took >10 MINUTES to compile per shape on this box (VERDICT round 3:
the k=20 bench never finished compiling). Here every stage of the
size-f column NTT is the SAME constant-geometry butterfly

    y[2i]   = x[i] + tw_s[i] * x[i + f/2]
    y[2i+1] = x[i] - tw_s[i] * x[i + f/2]        i < f/2

so the kernel is ONE `lax.fori_loop` whose body holds a single Montgomery
multiply - an order of magnitude fewer ops to compile, identical math.
Derivation (verified exhaustively at build time in `_cg_stage_tables`):
tracking which standard-DIT working-array position each constant-geometry
slot holds shows the UNIQUE valid slot order is the bit-reversal
permutation itself, which means the CG iteration consumes NATURAL-order
input and emits bit-REVERSED output (slot i = DFT[rev(i)]); the stage-s
twiddle for slot i is w_{2m}^{pos_s(i) mod m}, m = 2^s, with pos evolving
as pos' [2i, 2i+1] = [pos(i), pos(i)+m] from pos_0 = rev.

Level structure (mixed-radix factors of <= 2^8 with inter-level twiddles
and XLA transposes between levels) mirrors ops/ntt_pallas.py, which in
turn mirrors the reference's four-step split (fft/parallel.rs:195-255).
The inter-level twiddle table is stored in slot order so the kernel needs
no gather; the rev reorder happens in the surrounding XLA (one fused
transpose-gather pass per level).
"""

from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FieldElement
from .field_jax import FieldCtx
from .limbs import NLIMBS, ints_to_limbs
from .ntt import _bitrev_perm
from .ntt_pallas import _add_mod, _mont_mul, _sub_mod

U32 = jnp.uint32
LANES = 128


def _cg_stage_tables(f: int, w_f: int, p: int, r: int):
    """Per-stage constant-geometry twiddles (log_f, f/2) ints (Montgomery)
    + the slot permutation rev (output slot i holds DFT index rev[i])."""
    log_f = f.bit_length() - 1
    rev = _bitrev_perm(log_f)
    pos = [int(v) for v in rev]
    stages = []
    for s in range(log_f):
        m = 1 << s
        w_m = pow(w_f, f >> (s + 1), p)
        assert all(
            pos[i + f // 2] == pos[i] + m and (pos[i] & m) == 0
            for i in range(f // 2)
        ), "constant-geometry invariant"
        stages.append([pow(w_m, pos[i] % m, p) * r % p for i in range(f // 2)])
        npos = [0] * f
        for i in range(f // 2):
            npos[2 * i] = pos[i]
            npos[2 * i + 1] = pos[i] + m
        pos = npos
    assert list(pos) == list(rev)
    return stages, rev


def _cg_kernel(f: int, with_twiddle: bool):
    log_f = f.bit_length() - 1

    def kernel(*refs):
        if with_twiddle:
            x_ref, stw_ref, consts_ref, inter_ref, o_ref = refs
        else:
            x_ref, stw_ref, consts_ref, o_ref = refs
        nprime = consts_ref[0][:, None]
        plimbs = consts_ref[1][:, None]
        twop = consts_ref[2][:, None]
        W = x_ref.shape[-1]

        def stage(s, x):
            lo = x[: f // 2]
            hi = x[f // 2 :]
            tw = stw_ref[pl.ds(s, 1)][0][..., None]  # (f/2, L, 1)
            t = _mont_mul(hi, tw, nprime, plimbs)
            a = _add_mod(lo, t, twop)
            b = _sub_mod(lo, t, twop)
            return jnp.stack([a, b], axis=1).reshape(f, NLIMBS, W)

        x = jax.lax.fori_loop(0, log_f, stage, x_ref[:])
        if with_twiddle:
            x = _mont_mul(x, inter_ref[:], nprime, plimbs)
        o_ref[:] = x

    return kernel


class CgNttPlan:
    """Constant-geometry fused NTT; (n, 16) -> (n, 16) Montgomery limbs."""

    _cache: dict = {}
    MAX_LOG_F = 8

    def __new__(cls, field: Type[FieldElement], log_n: int, omega: int,
                interpret: bool = None):
        key = (cls, field, log_n, omega)
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
        self._plan_levels()
        # fused-stage count for the bench roofline: each level is one HBM
        # round trip (+1 for each inter-level transpose/gather)
        self.hbm_passes = 2 * len(self.levels)
        self._fn = jax.jit(self._run)
        return self

    def _plan_levels(self):
        p, r = self.p, self.r
        levels = []
        size = self.n
        root = self.omega
        while size > 1:
            log_size = size.bit_length() - 1
            log_f = min(log_size, self.MAX_LOG_F)
            f = 1 << log_f
            g = size // f
            w_f = pow(root, g, p)
            stages, rev = _cg_stage_tables(f, w_f, p, r)
            stw = jnp.asarray(
                ints_to_limbs([v for st in stages for v in st])
            ).reshape(log_f, f // 2, NLIMBS)
            inter = None
            tw_width = None
            if g > 1:
                # inter-level twiddle in SLOT order: slot i carries k1 =
                # rev(i); T[i, j2] = root^(rev(i) * j2), j2 tiled to lanes
                tw_width = max(g, LANES)
                vals = []
                for slot in range(f):
                    k1 = int(rev[slot])
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
                    f=f, g=g, log_f=log_f, stw=stw, inter=inter,
                    tw_width=tw_width, rev=jnp.asarray(rev),
                )
            )
            size = g
            root = pow(root, f, p)
        self.levels = levels

    def _level_call(self, x, lvl):
        """x: (f, L, batch) natural rows -> CG-transformed (+ inter
        twiddle) with rows still in SLOT order (k1 = rev(slot))."""
        f = lvl["f"]
        batch = x.shape[-1]
        W = min(LANES, batch)
        with_tw = lvl["inter"] is not None
        kernel = _cg_kernel(f, with_tw)
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
                # batch < one lane tile: a single narrow block whose j2
                # period g (<= batch = W) divides W. Slicing when W == 128
                # but g > 128 would TRUNCATE the twiddle pattern - the
                # round-1..3 fused-NTT correctness bug at extended sizes.
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

    def _ntt_axis0(self, x, level_idx: int):
        """x: (size, L, B) -> NTT over axis 0, natural in/out order."""
        lvl = self.levels[level_idx]
        f, g = lvl["f"], lvl["g"]
        B = x.shape[-1]
        # split rows j = j1*g + j2 (natural j1 order - CG needs no bitrev)
        x = x.reshape(f, g, NLIMBS, B)
        x = x.transpose(0, 2, 3, 1).reshape(f, NLIMBS, B * g)
        y = self._level_call(x, lvl)  # slots: row i holds k1 = rev(i)
        y = jnp.take(y, lvl["rev"], axis=0)  # -> k1-ordered rows
        if g == 1:
            return y.reshape(f, NLIMBS, B)
        y = y.reshape(f, NLIMBS, B, g).transpose(3, 1, 0, 2).reshape(g, NLIMBS, f * B)
        z = self._ntt_axis0(y, level_idx + 1)  # (g=k2, L, (k1, b))
        return z.reshape(g, NLIMBS, f, B).transpose(0, 2, 1, 3).reshape(
            g * f, NLIMBS, B
        )

    def _run(self, a):
        x = a.reshape(self.n, NLIMBS, 1)
        return self._ntt_axis0(x, 0).reshape(self.n, NLIMBS)

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        assert a.shape == (self.n, NLIMBS)
        return self._fn(a)
