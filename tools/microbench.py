"""Device primitive microbenchmarks: the numbers that decide kernel design.

Run on the real chip:  python tools/microbench.py
Prints ns/op for mont_mul, padd (RCB15), H2D upload bandwidth, row gather,
and the MXU const-mul path. These set the speed-of-light budget for the
MSM and NTT kernels (BASELINE.md roofline accounting).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from halo2_tpu.curves import Pallas
from halo2_tpu.fields import Fp
from halo2_tpu.ops.curve_jax import CurveCtx, PointVec, padd
from halo2_tpu.ops.field_jax import FieldCtx, mont_mul
from halo2_tpu.ops.limbs import NLIMBS


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    ctx = FieldCtx(Fp)
    rng = np.random.default_rng(0)

    M = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, (M, NLIMBS), np.uint32))
    a = ctx.to_mont(a)
    b = ctx.to_mont(jnp.asarray(rng.integers(0, 1 << 16, (M, NLIMBS), np.uint32)))

    mul = jax.jit(lambda x, y: mont_mul(x, y, ctx))
    dt = timeit(mul, a, b)
    print(f"mont_mul  M=2^20: {dt*1e3:8.2f} ms  {dt/M*1e9:7.2f} ns/op")

    # chain of 8 muls (amortize HBM in/out traffic -> closer to pure compute)
    def chain(x, y):
        for _ in range(8):
            x = mont_mul(x, y, ctx)
        return x

    chain_j = jax.jit(chain)
    dt = timeit(chain_j, a, b)
    print(f"mont_mul chain8:  {dt*1e3:8.2f} ms  {dt/(8*M)*1e9:7.2f} ns/op")

    # point addition RCB15
    cc = CurveCtx(Pallas)
    g = Pallas.generator()
    pts = [g.mul(i + 1) for i in range(64)]
    P = 1 << 17
    pv_small = cc.encode_points(pts)
    reps = P // 64
    pv = PointVec(
        jnp.tile(pv_small.x, (reps, 1)),
        jnp.tile(pv_small.y, (reps, 1)),
        jnp.tile(pv_small.z, (reps, 1)),
    )
    addf = jax.jit(lambda p, q: padd(p, q, cc))

    def as_tuple(p):
        return (p.x, p.y, p.z)

    dt = timeit(lambda x, y, z: as_tuple(addf(PointVec(x, y, z), pv)), pv.x, pv.y, pv.z)
    print(f"padd      M=2^17: {dt*1e3:8.2f} ms  {dt/P*1e9:7.2f} ns/op")

    def chain4(p, q):
        for _ in range(4):
            p = padd(p, q, cc)
        return p

    c4 = jax.jit(lambda x, y, z: as_tuple(chain4(PointVec(x, y, z), pv)))
    dt = timeit(c4, pv.x, pv.y, pv.z)
    print(f"padd chain4:      {dt*1e3:8.2f} ms  {dt/(4*P)*1e9:7.2f} ns/op")

    # H2D upload bandwidth
    big = np.zeros((1 << 26,), np.uint32)  # 256 MB
    t0 = time.perf_counter()
    darr = jax.device_put(big)
    jax.block_until_ready(darr)
    dt = time.perf_counter() - t0
    print(f"H2D 256MB: {dt*1e3:8.1f} ms  {big.nbytes/dt/1e9:6.2f} GB/s")

    # D2H
    t0 = time.perf_counter()
    _ = np.asarray(darr)
    dt = time.perf_counter() - t0
    print(f"D2H 256MB: {dt*1e3:8.1f} ms  {big.nbytes/dt/1e9:6.2f} GB/s")

    # device row gather: (n,16) u32 rows by random idx
    n = 1 << 20
    tbl = jnp.asarray(rng.integers(0, 1 << 16, (n, NLIMBS), np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (n,), np.int32))
    gat = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(gat, tbl, idx)
    print(f"gather (2^20,16)u32 rows: {dt*1e3:8.2f} ms  {dt/n*1e9:7.2f} ns/row  "
          f"{tbl.nbytes/dt/1e9:6.2f} GB/s")

    # MXU const-mul (Toeplitz path)
    from halo2_tpu.ops.mxu_mont import MxuConstMul

    cm = MxuConstMul(Fp, ctx.r_int)  # multiply by R (any const)
    aT = a[: 1 << 19].T  # canonical domain expected; close enough for timing
    f = jax.jit(lambda x: cm(x))
    dt = timeit(f, aT)
    print(f"mxu const-mul M=2^19: {dt*1e3:8.2f} ms  {dt/(1<<19)*1e9:7.2f} ns/op")

    # elementwise u32 mul baseline (pure VPU speed-of-light reference)
    x32 = jnp.asarray(rng.integers(0, 1 << 31, (M, 16), np.uint32))

    def raw(u, v):
        for _ in range(8):
            u = (u * v + (u >> 7)) & jnp.uint32(0x7FFFFFFF)
        return u

    rawj = jax.jit(raw)
    dt = timeit(rawj, x32, x32)
    ops = 8 * M * 16 * 3
    print(f"raw u32 fma chain: {dt*1e3:8.2f} ms  {ops/dt/1e12:6.2f} Tops/s")


if __name__ == "__main__":
    main()
