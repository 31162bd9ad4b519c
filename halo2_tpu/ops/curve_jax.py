"""Batched elliptic-curve arithmetic over limb tensors (TPU-native).

Points are held in **homogeneous projective coordinates** (X : Y : Z) as
three (..., 16) Montgomery limb tensors, using the *complete* addition and
doubling formulas of Renes-Costello-Batina 2015 (eprint 2015/1060,
Algorithms 7/9 specialized to a = 0). Complete formulas have no exceptional
cases - identity (0:1:0), doubling, and inverses all flow through the same
straight-line code - which is exactly what a branchless TPU kernel needs
(SURVEY.md "hard parts" #3; the reference instead branches in Jacobian
coordinates, `halo2curves` internals).

Cost: 12M per add, 6M+2S per double, plus mul-by-3b constants.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Curve, Point
from ..fields import FieldElement
from .field_jax import FieldCtx, add_mod, from_mont, inv_mod, is_zero, mont_mul, select, sub_mod
from .limbs import NLIMBS, ints_to_limbs, limbs_to_ints


class PointVec(NamedTuple):
    """A batch of projective points: X, Y, Z limb tensors (..., 16)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class CurveCtx:
    """Per-curve constants for batched point arithmetic."""

    _cache: dict = {}

    def __new__(cls, curve: Type[Curve]):
        if curve in cls._cache:
            return cls._cache[curve]
        self = super().__new__(cls)
        cls._cache[curve] = self
        self.curve = curve
        self.fctx = FieldCtx(curve.BASE)
        self.b3 = self.fctx.const(3 * curve.B)  # (16,), Montgomery
        return self

    # ---- host <-> device ----
    def encode_points(self, points: Sequence[Point]) -> PointVec:
        """Affine host points -> projective device batch (identity ok)."""
        p = self.curve.p()
        r = self.fctx.r_int
        xs, ys, zs = [], [], []
        for pt in points:
            if pt.is_identity():
                xs.append(0)
                ys.append(r % p)  # 1 in Montgomery form
                zs.append(0)
            else:
                xs.append(pt.xy[0] * r % p)
                ys.append(pt.xy[1] * r % p)
                zs.append(r % p)
        return PointVec(
            jnp.asarray(ints_to_limbs(xs)),
            jnp.asarray(ints_to_limbs(ys)),
            jnp.asarray(ints_to_limbs(zs)),
        )

    def _decode_packed_fn(self):
        """One jitted graph for the affine decode: the eager chain
        (Fermat-inversion scan + muls) costs ~2 s per call dispatched
        op-by-op through the tunnel runtime."""
        if not hasattr(self, "_decode_jit"):
            fctx = self.fctx

            @jax.jit
            def run(x, y, z):
                zinv = inv_mod(z, fctx)
                xa = from_mont(mont_mul(x, zinv, fctx), fctx).reshape(-1, NLIMBS)
                ya = from_mont(mont_mul(y, zinv, fctx), fctx).reshape(-1, NLIMBS)
                zz = is_zero(z, fctx).reshape(-1, 1).astype(jnp.uint32)
                return jnp.concatenate([xa, ya, zz], axis=1)  # (R, 33)

            self._decode_jit = run
        return self._decode_jit

    def decode_points(self, pv: PointVec) -> list:
        """Projective device batch -> affine host points.

        Device->host readback through the tunnel costs ~175 ms latency per
        call regardless of size (tools/profile_kernels.py), so everything
        (x, y, z-is-zero flag) is packed into ONE buffer and fetched with a
        single device_get."""
        packed = self._decode_packed_fn()(pv.x, pv.y, pv.z)
        host = np.ascontiguousarray(np.asarray(jax.device_get(packed)))
        xs = limbs_to_ints(np.ascontiguousarray(host[:, :NLIMBS]))
        ys = limbs_to_ints(np.ascontiguousarray(host[:, NLIMBS : 2 * NLIMBS]))
        zzero = host[:, 2 * NLIMBS]
        out = []
        for xi, yi, zz_i in zip(xs, ys, zzero):
            out.append(Point(self.curve, None) if zz_i else Point(self.curve, (xi, yi)))
        return out

    def identity_vec(self, shape: Tuple[int, ...]) -> PointVec:
        zeros = jnp.zeros(shape + (NLIMBS,), jnp.uint32)
        one = jnp.broadcast_to(self.fctx.r_limbs, shape + (NLIMBS,))
        return PointVec(zeros, one, zeros)


def padd(a: PointVec, b: PointVec, cc: CurveCtx) -> PointVec:
    """Complete projective addition, RCB15 Algorithm 7 (a = 0). 12M."""
    ctx = cc.fctx
    b3 = cc.b3
    X1, Y1, Z1 = a
    X2, Y2, Z2 = b
    t0 = mont_mul(X1, X2, ctx)
    t1 = mont_mul(Y1, Y2, ctx)
    t2 = mont_mul(Z1, Z2, ctx)
    t3 = add_mod(X1, Y1, ctx)
    t4 = add_mod(X2, Y2, ctx)
    t3 = mont_mul(t3, t4, ctx)
    t4 = add_mod(t0, t1, ctx)
    t3 = sub_mod(t3, t4, ctx)
    t4 = add_mod(Y1, Z1, ctx)
    X3 = add_mod(Y2, Z2, ctx)
    t4 = mont_mul(t4, X3, ctx)
    X3 = add_mod(t1, t2, ctx)
    t4 = sub_mod(t4, X3, ctx)
    X3 = add_mod(X1, Z1, ctx)
    Y3 = add_mod(X2, Z2, ctx)
    X3 = mont_mul(X3, Y3, ctx)
    Y3 = add_mod(t0, t2, ctx)
    Y3 = sub_mod(X3, Y3, ctx)
    X3 = add_mod(t0, t0, ctx)
    t0 = add_mod(X3, t0, ctx)
    t2 = mont_mul(jnp.broadcast_to(b3, t2.shape), t2, ctx)
    Z3 = add_mod(t1, t2, ctx)
    t1 = sub_mod(t1, t2, ctx)
    Y3 = mont_mul(jnp.broadcast_to(b3, Y3.shape), Y3, ctx)
    X3 = mont_mul(t4, Y3, ctx)
    t2 = mont_mul(t3, t1, ctx)
    X3 = sub_mod(t2, X3, ctx)
    Y3 = mont_mul(Y3, t0, ctx)
    t1 = mont_mul(t1, Z3, ctx)
    Y3 = add_mod(t1, Y3, ctx)
    t0 = mont_mul(t0, t3, ctx)
    Z3 = mont_mul(Z3, t4, ctx)
    Z3 = add_mod(Z3, t0, ctx)
    return PointVec(X3, Y3, Z3)


def pdouble(a: PointVec, cc: CurveCtx) -> PointVec:
    """Complete projective doubling, RCB15 Algorithm 9 (a = 0). 6M+2S."""
    ctx = cc.fctx
    b3 = cc.b3
    X, Y, Z = a
    t0 = mont_mul(Y, Y, ctx)
    Z3 = add_mod(t0, t0, ctx)
    Z3 = add_mod(Z3, Z3, ctx)
    Z3 = add_mod(Z3, Z3, ctx)
    t1 = mont_mul(Y, Z, ctx)
    t2 = mont_mul(Z, Z, ctx)
    t2 = mont_mul(jnp.broadcast_to(b3, t2.shape), t2, ctx)
    X3 = mont_mul(t2, Z3, ctx)
    Y3 = add_mod(t0, t2, ctx)
    Z3 = mont_mul(t1, Z3, ctx)
    t1 = add_mod(t2, t2, ctx)
    t2 = add_mod(t1, t2, ctx)
    t0 = sub_mod(t0, t2, ctx)
    Y3 = mont_mul(t0, Y3, ctx)
    Y3 = add_mod(X3, Y3, ctx)
    t1 = mont_mul(X, Y, ctx)
    X3 = mont_mul(t0, t1, ctx)
    X3 = add_mod(X3, X3, ctx)
    return PointVec(X3, Y3, Z3)


def pneg(a: PointVec, cc: CurveCtx) -> PointVec:
    from .field_jax import neg_mod

    return PointVec(a.x, neg_mod(a.y, cc.fctx), a.z)


def pselect(mask: jnp.ndarray, a: PointVec, b: PointVec) -> PointVec:
    return PointVec(select(mask, a.x, b.x), select(mask, a.y, b.y), select(mask, a.z, b.z))


def pgather(pv: PointVec, idx: jnp.ndarray) -> PointVec:
    return PointVec(
        jnp.take(pv.x, idx, axis=0), jnp.take(pv.y, idx, axis=0), jnp.take(pv.z, idx, axis=0)
    )


def tree_reduce(pv: PointVec, cc: CurveCtx, axis: int = 0) -> PointVec:
    """Sum a batch of points along `axis` by halving (log-depth adds)."""
    assert axis == 0
    n = pv.x.shape[0]
    while n > 1:
        if n % 2 == 1:
            idv = cc.identity_vec(pv.x.shape[:-1])
            pv = PointVec(
                jnp.concatenate([pv.x, idv.x[:1]]),
                jnp.concatenate([pv.y, idv.y[:1]]),
                jnp.concatenate([pv.z, idv.z[:1]]),
            )
            n += 1
        half = n // 2
        a = PointVec(pv.x[:half], pv.y[:half], pv.z[:half])
        b = PointVec(pv.x[half:], pv.y[half:], pv.z[half:])
        pv = padd(a, b, cc)
        n = half
    return pv
