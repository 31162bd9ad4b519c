import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import sys; sys.path.insert(0, "/root/repo")
from halo2_tpu.fields import Fq
from halo2_tpu.ops.limbs import NLIMBS
from halo2_tpu.ops.ntt import NttPlan
from halo2_tpu.ops.mxu_mont import MxuNttPlan
from halo2_tpu.ops.field_jax import FieldCtx
rng = np.random.default_rng(0)
p = Fq.MODULUS
ctx = FieldCtx(Fq)

K = 10
omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
a = ctx.to_mont(jnp.asarray(rng.integers(0, 1 << 16, (1 << K, NLIMBS), dtype=np.uint32)))
t0=time.perf_counter()
got = jax.block_until_ready(MxuNttPlan(Fq, K, omega)(a))
print(f"mxu k=10 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
ref = jax.block_until_ready(NttPlan(Fq, K, omega)(a))
print(f"jnp k=10 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
eq = np.array_equal(np.asarray(jax.device_get(ctx.from_mont(ref))), np.asarray(jax.device_get(ctx.from_mont(got))))
print("k=10 mxu == jnp:", eq, flush=True)

for K in (14, 20):
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
    a = jnp.asarray(rng.integers(0, 1 << 16, (1 << K, NLIMBS), dtype=np.uint32))
    t0 = time.perf_counter()
    plan = MxuNttPlan(Fq, K, omega)
    out = jax.block_until_ready(plan(a))
    print(f"mxu k={K} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3): out = plan(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"mxu k={K} warm {dt*1e3:.1f} ms  {(1<<K)/dt/1e6:.1f} M elems/s", flush=True)

# jnp plan k=20 (the NTT=jnp fallback): explain the r1->r3 regression
K = 20
omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
a = jnp.asarray(rng.integers(0, 1 << 16, (1 << K, NLIMBS), dtype=np.uint32))
t0 = time.perf_counter()
plan = NttPlan(Fq, K, omega)
out = jax.block_until_ready(plan(a))
print(f"jnp k=20 compile+first {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(3): out = plan(out)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3
print(f"jnp k=20 warm {dt*1e3:.1f} ms  {(1<<K)/dt/1e6:.1f} M elems/s", flush=True)
