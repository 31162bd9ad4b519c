"""Multi-chip scaling-shape proxy on the virtual CPU mesh.

Real hardware is one chip, so the >= 70% scaling-efficiency north star
(BASELINE.md) cannot be measured directly; this reports the next-best
evidence: the mesh-sharded four-step NTT's wall time on 1 vs 8 virtual
host devices (correctness-weighted: same bytes as the single-chip plan,
pinned by tests/test_mesh_ntt equality checks). Run in a SUBPROCESS by
bench.py because the bench process owns the TPU backend.

Prints one JSON line: {"k": .., "t1_ms": .., "t8_ms": .., "devices": 8}.
Virtual-device timings share one physical core, so t8 ~= t1 means the
sharded program adds no redundant work (perfect-overlap proxy), while
t8 >> t1 would reveal collective overhead.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from halo2_tpu.fields import Fq
    from halo2_tpu.ops.limbs import NLIMBS
    from halo2_tpu.ops.ntt import NttPlan
    from halo2_tpu.parallel import make_mesh
    from halo2_tpu.parallel.ntt import FourStepNtt

    K = int(os.environ.get("SCALING_K", "12"))
    n = 1 << K
    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (n, NLIMBS), dtype=np.uint32))

    def timed(plan):
        out = jax.block_until_ready(plan(a))
        t0 = time.perf_counter()
        for _ in range(3):
            out = plan(out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3

    t1 = timed(NttPlan(Fq, K, omega))
    mesh = make_mesh(8)
    t8 = timed(FourStepNtt(Fq, K, omega, mesh, "x"))
    print(json.dumps({
        "k": K,
        "t1_ms": round(t1 * 1e3, 2),
        "t8_ms": round(t8 * 1e3, 2),
        "devices": 8,
        "note": "8 virtual devices share 1 core: t8/t1 ~ 1 means the "
                "sharded four-step NTT adds no redundant work",
    }))


if __name__ == "__main__":
    main()
