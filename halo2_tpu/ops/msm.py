"""Multi-scalar multiplication: host Pippenger (spec/oracle) + TPU batch MSM.

Host path mirrors the reference's `best_multiexp` bucket method
(`halo2_proofs/src/arithmetic.rs:41-198`) over Python bigints - used for
small commitments and as the correctness oracle.

Device path is a TPU-native reformulation (SURVEY.md section 2c / "hard
parts" #3): Pippenger's bucket scatter-add is the classic TPU-hostile
pattern, so instead each of T lanes owns a private bucket row and a
`lax.scan` sweeps the points in T-wide slabs - every step is one gather,
one batched complete point-add (RCB15), and one conflict-free scatter
(lane t only ever writes row t). Windows are a leading batch axis so all
windows advance in the same scan. Bucket rows are then tree-reduced across
lanes on device, and the tiny (windows x 2^c) bucket tails are folded on
host (suffix sums + Horner over windows).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import List, Optional, Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import JAC_IDENTITY, Curve, Point, jac_add, jac_add_affine, jac_double
from .curve_jax import CurveCtx, PointVec, padd, pselect, tree_reduce
from .limbs import NLIMBS


# ---------------------------------------------------------------------------
# Host Pippenger (exact, python ints)
# ---------------------------------------------------------------------------


def msm_host(scalars: Sequence[int], points: Sequence[Point], curve: Type[Curve]) -> Point:
    """Bucket-method MSM over host bigints (reference arithmetic.rs:160-198).

    Dispatches to the native C++ Pippenger (`native/h2native.cpp`) when
    built; the Python loop below is the spec/oracle (pinned equal in
    tests/test_native.py)."""
    assert len(scalars) == len(points)
    n = len(scalars)
    if n == 0:
        return curve.identity()
    p = curve.p()
    q = curve.SCALAR.MODULUS
    bits = q.bit_length()
    c = 3 if n < 32 else max(1, (n.bit_length() - 1) // 2 + 1)
    c = min(c, 15)
    nwin = (bits + c - 1) // c
    if n >= 16:
        from ..native import native_msm

        jac = native_msm(scalars, points, curve, c, nwin)
        if jac is not None:
            return curve.from_jacobian(jac)
    acc = JAC_IDENTITY
    for w in range(nwin - 1, -1, -1):
        for _ in range(c):
            acc = jac_double(acc, p)
        buckets = [JAC_IDENTITY] * ((1 << c) - 1)
        shift = w * c
        mask = (1 << c) - 1
        for s, pt in zip(scalars, points):
            if pt.is_identity():
                continue
            d = (s >> shift) & mask
            if d != 0:
                buckets[d - 1] = jac_add_affine(buckets[d - 1], pt.xy[0], pt.xy[1], p)
        run = JAC_IDENTITY
        total = JAC_IDENTITY
        for b in reversed(buckets):
            run = jac_add(run, b, p)
            total = jac_add(total, run, p)
        acc = jac_add(acc, total, p)
    return curve.from_jacobian(acc)


# ---------------------------------------------------------------------------
# Device MSM
# ---------------------------------------------------------------------------


class MSMBases:
    """Device-resident MSM bases (projective limb tensors), reusable across
    many commitments like the reference's ParamsIPA.g arrays."""

    def __init__(self, curve: Type[Curve], points: Sequence[Point]):
        self.curve = curve
        self.cc = CurveCtx(curve)
        self.n = len(points)
        self.host_points = list(points)
        self.pv: Optional[PointVec] = None  # lazy device upload

    def device(self) -> PointVec:
        if self.pv is None:
            self.pv = self.cc.encode_points(self.host_points)
        return self.pv

    def device_tables(self, n_pad: int):
        """Transposed affine (16, n_pad) coordinate tables for the Pallas
        MSM kernel, cached per padded size."""
        cache = getattr(self, "_device_tables", None)
        if cache is None:
            cache = self._device_tables = {}
        if n_pad not in cache:
            from .msm_pallas import DeviceBases

            cache[n_pad] = DeviceBases(self.curve, self.host_points, n_pad)
        return cache[n_pad]

    def device_rows(self):
        """Row-major affine Montgomery tables (n, 16) x2 for the sorted
        Pallas MSM's gather stage; cached."""
        if not hasattr(self, "_rows"):
            from .limbs import ints_to_limbs

            p = self.curve.p()
            r = self.cc.fctx.r_int
            xs, ys = [], []
            for pt in self.host_points:
                assert not pt.is_identity(), "device MSM bases must be affine"
                xs.append(pt.xy[0] * r % p)
                ys.append(pt.xy[1] * r % p)
            self._rows = (
                jnp.asarray(ints_to_limbs(xs)),
                jnp.asarray(ints_to_limbs(ys)),
            )
        return self._rows


def _digits(scalars: Sequence[int], c: int, nwin: int) -> np.ndarray:
    """(n, nwin) unsigned base-2^c digits from little-endian scalar bytes."""
    n = len(scalars)
    raw = np.frombuffer(
        b"".join(int(s).to_bytes(32, "little") for s in scalars), dtype=np.uint8
    ).reshape(n, 32)
    if c == 8:
        d = raw
    elif c == 4:
        lo = raw & 0xF
        hi = raw >> 4
        d = np.stack([lo, hi], axis=2).reshape(n, 64)
    else:
        raise ValueError("c must be 4 or 8")
    return d[:, :nwin].astype(np.int32)


@lru_cache(maxsize=None)
def _msm_kernel(curve: Type[Curve], n_pad: int, T: int, nwin: int, c: int):
    """Build the jitted scan kernel for a given geometry."""
    cc = CurveCtx(curve)
    B = 1 << c
    steps = n_pad // T

    def kernel(px, py, pz, digits):  # digits (steps, T, nwin) int32
        buckets = cc.identity_vec((nwin, T, B))
        w_idx = jnp.arange(nwin)[:, None]
        t_idx = jnp.arange(T)[None, :]

        def body(bk, inp):
            bx, by, bz = bk
            sx, sy, sz, dg = inp  # point slab (T, L); dg (T, nwin)
            dgt = dg.T  # (nwin, T)
            cur = PointVec(bx[w_idx, t_idx, dgt], by[w_idx, t_idx, dgt], bz[w_idx, t_idx, dgt])
            slab = PointVec(
                jnp.broadcast_to(sx[None], (nwin, T, NLIMBS)),
                jnp.broadcast_to(sy[None], (nwin, T, NLIMBS)),
                jnp.broadcast_to(sz[None], (nwin, T, NLIMBS)),
            )
            new = padd(cur, slab, cc)
            bx = bx.at[w_idx, t_idx, dgt].set(new.x)
            by = by.at[w_idx, t_idx, dgt].set(new.y)
            bz = bz.at[w_idx, t_idx, dgt].set(new.z)
            return (bx, by, bz), None

        slabs = (
            px.reshape(steps, T, NLIMBS),
            py.reshape(steps, T, NLIMBS),
            pz.reshape(steps, T, NLIMBS),
            digits,
        )
        (bx, by, bz), _ = jax.lax.scan(body, (buckets.x, buckets.y, buckets.z), slabs)
        # tree-reduce over lanes: (nwin, T, B) -> (nwin, B)
        pv = PointVec(
            bx.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
            by.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
            bz.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
        )
        red = tree_reduce(pv, cc, axis=0)
        return (
            red.x.reshape(nwin, B, NLIMBS),
            red.y.reshape(nwin, B, NLIMBS),
            red.z.reshape(nwin, B, NLIMBS),
        )

    return jax.jit(kernel)


def msm_jax(
    scalars: Sequence[int],
    bases: MSMBases,
    c: int = 4,
    lanes: int = 1 << 13,
) -> Point:
    """Device MSM; exact same result as msm_host."""
    curve = bases.curve
    n = len(scalars)
    assert n <= bases.n
    bits = curve.SCALAR.MODULUS.bit_length()
    nwin = (bits + c - 1) // c
    T = min(lanes, max(64, 1 << max(0, (n - 1).bit_length() - 3)))
    n_pad = ((n + T - 1) // T) * T
    dg = _digits(scalars, c, nwin)
    dg = np.pad(dg, [(0, n_pad - n), (0, 0)])  # padded digits=0 -> bucket 0 unused
    steps = n_pad // T
    dg = dg.reshape(steps, T, nwin)

    pv = bases.device()
    cc = bases.cc
    if bases.n == n_pad:
        px, py, pz = pv.x, pv.y, pv.z
    else:
        idv = cc.identity_vec((max(0, n_pad - bases.n),))
        px = jnp.concatenate([pv.x, idv.x])[:n_pad]
        py = jnp.concatenate([pv.y, idv.y])[:n_pad]
        pz = jnp.concatenate([pv.z, idv.z])[:n_pad]

    kern = _msm_kernel(curve, n_pad, T, nwin, c)
    bx, by, bz = kern(px, py, pz, jnp.asarray(dg))
    window_buckets = cc.decode_points(
        PointVec(
            bx.reshape(nwin * (1 << c), NLIMBS),
            by.reshape(nwin * (1 << c), NLIMBS),
            bz.reshape(nwin * (1 << c), NLIMBS),
        )
    )
    return fold_window_buckets(window_buckets, curve, nwin, c)


def fold_window_buckets(window_buckets, curve: Type[Curve], nwin: int, c: int) -> Point:
    """Host tail: per window sum_d d * bucket_d (suffix sums), then Horner
    over windows (reference arithmetic.rs:119-127). Native C++ when built;
    the Python loop is the spec."""
    from ..native import native_bucket_fold

    jac = native_bucket_fold(window_buckets, curve, nwin, c)
    if jac is not None:
        return curve.from_jacobian(jac)
    p = curve.p()
    B = 1 << c
    acc = JAC_IDENTITY
    for w in range(nwin - 1, -1, -1):
        for _ in range(c):
            acc = jac_double(acc, p)
        run = JAC_IDENTITY
        total = JAC_IDENTITY
        row = window_buckets[w * B : (w + 1) * B]
        for b in reversed(row[1:]):  # buckets 1..B-1
            run = jac_add(run, b.jacobian(), p)
            total = jac_add(total, run, p)
        acc = jac_add(acc, total, p)
    return curve.from_jacobian(acc)


def msm(
    scalars: Sequence[int],
    bases,
    curve: Type[Curve] = None,
    backend: str = "auto",
) -> Point:
    """Dispatching MSM.

    `bases` may be a list of host Points or an MSMBases. Small problems run
    on host (no compile cost); large ones on device.
    """
    if isinstance(bases, MSMBases):
        curve = bases.curve
        host_points = bases.host_points
    else:
        host_points = list(bases)
        assert curve is not None or host_points, "need curve"
        curve = curve or host_points[0].curve
    from ..utils.measure import span

    from ..parallel.context import active_mesh

    n = len(scalars)
    with span(f"msm n={n}", category="msm"):
        mc = active_mesh()
        if backend in ("auto", "sharded") and mc is not None and mc.can_shard_msm(n):
            from ..parallel.msm import sharded_msm

            if not isinstance(bases, MSMBases):
                bases = MSMBases(curve, host_points)
            return sharded_msm(scalars, bases, mc.mesh, mc.axis)
        if backend == "host" or (backend == "auto" and n < (1 << 12)):
            return msm_host(scalars, host_points[:n], curve)
        if not isinstance(bases, MSMBases):
            bases = MSMBases(curve, host_points)
        impl = os.environ.get("MSM", "auto")
        if impl == "jax":
            return msm_jax(scalars, bases)
        if impl == "host":
            return msm_host(scalars, host_points[:n], curve)
        on_tpu = jax.default_backend() == "tpu"
        # MSM=pallas pins the unsorted kernel unconditionally (debug /
        # bisection escape hatch); only auto/sorted route to the sorted one
        if impl == "sorted" or (impl == "auto" and on_tpu and n >= (1 << 16)):
            from .limbs import ints_to_limbs
            from .msm_sorted import BucketOverflow, msm_sorted

            q = curve.SCALAR.MODULUS
            ints = [int(s) % q for s in scalars]
            # cheap host pre-check: small/structured scalars (selector or
            # constant columns) concentrate digits and would overflow the
            # sorted kernel's Poisson capacities after a wasted compile
            if impl == "sorted" or max(ints, default=0) >= (1 << 128):
                canon = jnp.asarray(ints_to_limbs(ints))
                try:
                    return msm_sorted(canon, bases)
                except BucketOverflow:
                    pass  # unsorted kernel below
        if impl == "pallas" or (impl == "auto" and on_tpu):
            from .msm_pallas import msm_pallas

            return msm_pallas(scalars, bases)
        return msm_jax(scalars, bases)
