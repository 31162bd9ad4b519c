"""Microbenchmarks for the round-4 perf work: isolates the costs that
VERDICT.md round 3 flags (MSM merge traffic, Pallas NTT compile blowup,
XLA sort/gather throughput for a sort-based MSM design).

Usage: python tools/profile_kernels.py <section> [args]
Sections: tilemul, msm_accum, ntt_compile, sortgather
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sec_tilemul():
    """Cost of one Pallas mont_mul / point-add on a (16,128) tile, amortized
    over a grid of many tiles (the MSM accumulate inner loop's compute)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from halo2_tpu.curves import Pallas
    from halo2_tpu.ops.curve_jax import CurveCtx
    from halo2_tpu.ops.field_jax import FieldCtx
    from halo2_tpu.ops.limbs import NLIMBS
    from halo2_tpu.ops.msm_pallas import _consts5, _mixed_padd
    from halo2_tpu.ops.ntt_pallas import _mont_mul

    T = 128
    steps = 2048
    consts = _consts5(Pallas)

    def mul_kernel(aref, bref, cref, oref):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        o = aref[:]
        for _ in range(8):  # 8 muls per step to amortize grid overhead
            o = _mont_mul(o, bref[:], nprime, plimbs)
        oref[:] = o

    spec = pl.BlockSpec((NLIMBS, T), lambda s: (0, s), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((5, NLIMBS), lambda s: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run_mul(a, b):
        return pl.pallas_call(
            mul_kernel,
            grid=(steps,),
            in_specs=[spec, spec, cspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NLIMBS, T * steps), jnp.uint32),
        )(a, b, consts)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (NLIMBS, T * steps), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (NLIMBS, T * steps), dtype=np.uint32))
    dt = timeit(run_mul, a, b)
    per_mul_tile = dt / steps / 8
    print(f"mont_mul tile (16,128): {per_mul_tile*1e9:.0f} ns/tile-mul, "
          f"{per_mul_tile/T*1e9:.2f} ns/element-mul")

    def padd_kernel(axref, ayref, azref, bxref, byref, cref, ox, oy, oz):
        nprime = cref[0][:, None]
        plimbs = cref[1][:, None]
        twop = cref[2][:, None]
        b3 = cref[3][:, None]
        X, Y, Z = _mixed_padd(
            (axref[:], ayref[:], azref[:]), (bxref[:], byref[:]),
            nprime, plimbs, twop, b3,
        )
        ox[:] = X
        oy[:] = Y
        oz[:] = Z

    @jax.jit
    def run_padd(ax, ay, az, bx, by):
        return pl.pallas_call(
            padd_kernel,
            grid=(steps,),
            in_specs=[spec] * 5 + [cspec],
            out_specs=(spec, spec, spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((NLIMBS, T * steps), jnp.uint32)
                for _ in range(3)
            ),
        )(ax, ay, az, bx, by, consts)

    args = [jnp.asarray(rng.integers(0, 1 << 16, (NLIMBS, T * steps),
                                     dtype=np.uint32)) for _ in range(5)]
    dt = timeit(run_padd, *args)
    print(f"mixed_padd tile (16,128): {dt/steps*1e6:.2f} us/tile-add, "
          f"{dt/steps/T*1e9:.1f} ns/point")


def sec_msm_accum():
    """Time the three MSM stages separately at 2^k points."""
    import random

    from halo2_tpu.curves import Pallas
    from halo2_tpu.ops.limbs import ints_to_limbs
    from halo2_tpu.ops.msm import MSMBases
    from halo2_tpu.ops.msm_pallas import (_accum_fn, _fold_fn, _lane_reduce_fn,
                                          _msm_geometry)

    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << K
    random.seed(5)
    m = 1 << 10
    pts = [Pallas.generator().mul(random.randrange(1, 1 << 62)) for _ in range(m)]
    small = MSMBases(Pallas, pts)
    c, nwin, T, n_pad = _msm_geometry(Pallas, n)
    B = 1 << c
    db = small.device_tables(m)
    px = jnp.tile(db.px, (1, n_pad // m))
    py = jnp.tile(db.py, (1, n_pad // m))
    q = Pallas.SCALAR.MODULUS
    scal = jnp.asarray(
        ints_to_limbs([random.randrange(q) for _ in range(n)])
    ).T[None]  # (1, 16, n)

    t0 = time.perf_counter()
    accum = _accum_fn(Pallas, 1, n_pad, T, c, nwin, False)
    bx, by, bz = jax.block_until_ready(accum(scal, px, py))
    print(f"accum compile+run: {time.perf_counter()-t0:.1f}s")
    dt = timeit(accum, scal, px, py, iters=3, warm=1)
    print(f"accum: {dt:.3f}s  ({n/dt/1e6:.3f} M pts/s equivalent)")

    t0 = time.perf_counter()
    fold = _fold_fn(Pallas, nwin, B, T, False)
    f = jax.block_until_ready(fold(bx, by, bz))
    print(f"fold compile+run: {time.perf_counter()-t0:.1f}s")
    dt = timeit(fold, bx, by, bz, iters=3, warm=1)
    print(f"fold: {dt:.3f}s")

    t0 = time.perf_counter()
    lane = _lane_reduce_fn(Pallas, nwin, T)
    r = jax.block_until_ready(lane(*f))
    print(f"lane_reduce compile+run: {time.perf_counter()-t0:.1f}s")
    dt = timeit(lane, *f, iters=3, warm=1)
    print(f"lane_reduce: {dt:.3f}s")


def sec_ntt_compile():
    """Compile+run time of the Pallas NTT at each k (the round-3 k=20
    blowup), with the persistent cache disabled."""
    jax.config.update("jax_compilation_cache_dir", None)
    from halo2_tpu.fields import Fq
    from halo2_tpu.ops.limbs import NLIMBS
    from halo2_tpu.ops.ntt_pallas import PallasNttPlan

    ks = [int(v) for v in (sys.argv[2:] or ["14", "16", "18", "20"])]
    rng = np.random.default_rng(0)
    p = Fq.MODULUS
    for K in ks:
        omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
        a = jnp.asarray(rng.integers(0, 1 << 16, (1 << K, NLIMBS), dtype=np.uint32))
        t0 = time.perf_counter()
        plan = PallasNttPlan(Fq, K, omega)
        out = jax.block_until_ready(plan(a))
        t_compile = time.perf_counter() - t0
        dt = timeit(plan, a, iters=3, warm=1)
        print(f"k={K}: compile+first {t_compile:.1f}s   warm {dt*1e3:.1f} ms   "
              f"{(1 << K)/dt/1e6:.1f} M elems/s", flush=True)


def sec_sortgather():
    """XLA sort / argsort / gather throughput at 2^20 (for sort-based MSM)."""
    n = 1 << 20
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
    vals = jnp.asarray(rng.integers(0, 1 << 16, (n, 32), dtype=np.uint32))

    srt = jax.jit(jnp.sort)
    dt = timeit(srt, keys)
    print(f"sort u32 2^20: {dt*1e3:.2f} ms")

    asrt = jax.jit(jnp.argsort)
    dt = timeit(asrt, keys)
    print(f"argsort u32 2^20: {dt*1e3:.2f} ms")

    idx = jax.block_until_ready(asrt(keys))

    gath = jax.jit(lambda v, i: jnp.take(v, i, axis=0))
    dt = timeit(gath, vals, idx)
    gb = n * 32 * 4 * 2 / 1e9
    print(f"gather (2^20,32)u32 rows: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s)")

    # one-hot histogram via segment trick
    hist = jax.jit(lambda k: jnp.zeros((1 << 16,), jnp.int32).at[k].add(1))
    dt = timeit(hist, keys)
    print(f"scatter-add histogram 2^20 -> 2^16: {dt*1e3:.2f} ms")

    cs = jax.jit(lambda v: jnp.cumsum(v, axis=0))
    dt = timeit(cs, vals)
    print(f"cumsum (2^20,32): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    globals()["sec_" + sys.argv[1]]()
