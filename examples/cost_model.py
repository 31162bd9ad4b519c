"""Standalone proof cost estimator (reference examples/cost-model.rs):
times a real MSM on this machine to extrapolate verification cost."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import random

from circuits import MulCircuit

from halo2_tpu.curves import Vesta
from halo2_tpu.dev.cost import CircuitCost
from halo2_tpu.ops.msm import msm_host


def main():
    k = 8
    cost = CircuitCost.measure(4, MulCircuit(7))
    print(f"marginal proof size: {cost.marginal_proof_size()} bytes")
    print(f"proof size (1 instance): {cost.proof_size(1)} bytes")

    # time a real MSM to extrapolate verifier cost (cost-model.rs:14-47)
    random.seed(0)
    n = 1 << k
    pts = [Vesta.generator().mul(random.randrange(1, 997)) for _ in range(n)]
    scalars = [random.randrange(Vesta.SCALAR.MODULUS) for _ in range(n)]
    t0 = time.perf_counter()
    msm_host(scalars, pts, Vesta)
    dt = time.perf_counter() - t0
    print(f"2^{k} MSM: {dt * 1e3:.1f} ms -> verification estimate "
          f"~{dt * 1e3 * (1 + cost.point_sets / 8):.1f} ms")


if __name__ == "__main__":
    main()
