"""Sharded Pippenger MSM over a device mesh.

Points and scalar digits are sharded along the point axis (pure data
parallelism over ICI, the TPU counterpart of the reference's per-thread
coefficient split in `halo2_proofs/src/arithmetic.rs:166-189`). Each device
runs the private-bucket lane-scan kernel of `halo2_tpu.ops.msm` on its local
slab, then the (nwin, B) bucket grids are combined across devices with a
log2(D)-round ppermute butterfly of complete point additions - point sums
have no `psum` analogue, so the reduction is expressed directly in curve ops
riding ICI.

The tiny (nwin x B) bucket tail (suffix sums + window Horner) is folded on
host exactly like the single-chip path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves import JAC_IDENTITY, Curve, Point, jac_add, jac_double
from ..ops.curve_jax import CurveCtx, PointVec, padd, tree_reduce
from ..ops.limbs import NLIMBS
from ..ops.msm import MSMBases, _digits


@lru_cache(maxsize=None)
def _sharded_kernel(curve: Type[Curve], n_local: int, T: int, nwin: int, c: int,
                    mesh_key, axis: str):
    """Per-device bucket scan + cross-device butterfly reduction."""
    cc = CurveCtx(curve)
    B = 1 << c
    steps = n_local // T
    mesh = _MESHES[mesh_key]
    D = mesh.shape[axis]

    def local(px, py, pz, digits):
        bx = cc.identity_vec((nwin, T, B)).x
        by = cc.identity_vec((nwin, T, B)).y
        bz = cc.identity_vec((nwin, T, B)).z
        w_idx = jnp.arange(nwin)[:, None]
        t_idx = jnp.arange(T)[None, :]

        def body(bk, inp):
            bx, by, bz = bk
            sx, sy, sz, dg = inp
            dgt = dg.T  # (nwin, T)
            cur = PointVec(bx[w_idx, t_idx, dgt], by[w_idx, t_idx, dgt], bz[w_idx, t_idx, dgt])
            slab = PointVec(
                jnp.broadcast_to(sx[None], (nwin, T, NLIMBS)),
                jnp.broadcast_to(sy[None], (nwin, T, NLIMBS)),
                jnp.broadcast_to(sz[None], (nwin, T, NLIMBS)),
            )
            new = padd(cur, slab, cc)
            return (
                bx.at[w_idx, t_idx, dgt].set(new.x),
                by.at[w_idx, t_idx, dgt].set(new.y),
                bz.at[w_idx, t_idx, dgt].set(new.z),
            ), None

        slabs = (
            px.reshape(steps, T, NLIMBS),
            py.reshape(steps, T, NLIMBS),
            pz.reshape(steps, T, NLIMBS),
            digits.reshape(steps, T, nwin),
        )
        (bx, by, bz), _ = jax.lax.scan(body, (bx, by, bz), slabs)
        # lane reduce: (nwin, T, B) -> (nwin*B,)
        pv = PointVec(
            bx.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
            by.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
            bz.transpose(1, 0, 2, 3).reshape(T, nwin * B, NLIMBS),
        )
        red = tree_reduce(pv, cc, axis=0)
        # cross-device butterfly: log2(D) rounds of shift-and-add
        x, y, z = red.x, red.y, red.z
        shift = 1
        while shift < D:
            perm = [(i, (i + shift) % D) for i in range(D)]
            ox = jax.lax.ppermute(x, axis, perm)
            oy = jax.lax.ppermute(y, axis, perm)
            oz = jax.lax.ppermute(z, axis, perm)
            s = padd(PointVec(x, y, z), PointVec(ox, oy, oz), cc)
            x, y, z = s.x, s.y, s.z
            shift *= 2
        return x[None], y[None], z[None]

    ax = axis
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax, None), P(ax, None), P(ax, None), P(ax, None)),
        out_specs=(P(ax, None, None), P(ax, None, None), P(ax, None, None)),
        check_rep=False,
    )
    return jax.jit(fn)


_MESHES: dict = {}


def _mesh_key(mesh: Mesh) -> int:
    k = id(mesh)
    _MESHES[k] = mesh
    return k


def sharded_msm(
    scalars: Sequence[int],
    bases: MSMBases,
    mesh: Mesh,
    axis: str = "x",
    c: int = 4,
    lanes: int = 1 << 10,
) -> Point:
    """MSM with the point axis sharded over `mesh`; exact host-equal result."""
    curve = bases.curve
    cc = bases.cc
    D = mesh.shape[axis]
    n = len(scalars)
    bits = curve.SCALAR.MODULUS.bit_length()
    nwin = (bits + c - 1) // c
    T = min(lanes, max(8, 1 << max(0, (n // D - 1).bit_length() - 3)))
    n_pad = ((n + T * D - 1) // (T * D)) * (T * D)
    dg = _digits(scalars, c, nwin)
    dg = np.pad(dg, [(0, n_pad - n), (0, 0)])

    pv = bases.device()
    if bases.n >= n_pad:
        px, py, pz = pv.x[:n_pad], pv.y[:n_pad], pv.z[:n_pad]
    else:
        idv = cc.identity_vec((n_pad - bases.n,))
        px = jnp.concatenate([pv.x, idv.x])
        py = jnp.concatenate([pv.y, idv.y])
        pz = jnp.concatenate([pv.z, idv.z])

    sh = NamedSharding(mesh, P(axis, None))
    px, py, pz = (jax.device_put(t, sh) for t in (px, py, pz))
    dgd = jax.device_put(jnp.asarray(dg), sh)

    kern = _sharded_kernel(curve, n_pad // D, T, nwin, c, _mesh_key(mesh), axis)
    bx, by, bz = kern(px, py, pz, dgd)
    # all devices hold the same reduced grid; take replica 0
    B = 1 << c
    grid = cc.decode_points(
        PointVec(
            bx[0].reshape(nwin * B, NLIMBS),
            by[0].reshape(nwin * B, NLIMBS),
            bz[0].reshape(nwin * B, NLIMBS),
        )
    )
    p = curve.p()
    acc = JAC_IDENTITY
    for w in range(nwin - 1, -1, -1):
        for _ in range(c):
            acc = jac_double(acc, p)
        run = JAC_IDENTITY
        total = JAC_IDENTITY
        row = grid[w * B : (w + 1) * B]
        for b in reversed(row[1:]):
            run = jac_add(run, b.jacobian(), p)
            total = jac_add(total, run, p)
        acc = jac_add(acc, total, p)
    return curve.from_jacobian(acc)
