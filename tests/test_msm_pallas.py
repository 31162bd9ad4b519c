"""Oracle tests for the Pallas bucket-accumulation MSM (ops/msm_pallas.py).

Pins the digit-sorted dense-plan kernel against the host Pippenger spec
(`msm_host`, reference arithmetic.rs:41-129) and the `MSM=pallas` dispatch
path in `ops.msm.msm`. Runs in interpret mode off-TPU.
"""

import os
import random

import pytest

from halo2_tpu.curves import Pallas, Vesta
from halo2_tpu.ops.msm import MSMBases, msm, msm_host
from halo2_tpu.ops.msm_pallas import msm_pallas


def rand_points(curve, n, seed):
    rng = random.Random(seed)
    g = curve.generator()
    return [g.mul(rng.randrange(1, curve.SCALAR.MODULUS)) for _ in range(n)]


@pytest.mark.parametrize("curve,n,seed", [(Pallas, 64, 7), (Vesta, 33, 8)])
def test_msm_pallas_matches_host(curve, n, seed):
    rng = random.Random(seed + 100)
    pts = rand_points(curve, n, seed)
    scalars = [rng.randrange(curve.SCALAR.MODULUS) for _ in range(n)]
    # edge digits: zero scalar, scalar 1, modulus-1
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = curve.SCALAR.MODULUS - 1
    bases = MSMBases(curve, pts)
    expect = msm_host(scalars, pts, curve)
    got = msm_pallas(scalars, bases, c=4)
    assert got == expect


def test_msm_dispatch_env_pallas(monkeypatch):
    """`MSM=pallas` routes device-size problems through msm_pallas."""
    n = 64
    curve = Pallas
    pts = rand_points(curve, n, seed=9)
    rng = random.Random(11)
    scalars = [rng.randrange(curve.SCALAR.MODULUS) for _ in range(n)]
    monkeypatch.setenv("MSM", "pallas")
    bases = MSMBases(curve, pts)
    # backend="jax" skips the small-n host shortcut so the env dispatch runs
    got = msm(scalars, bases, backend="jax")
    assert got == msm_host(scalars, pts, curve)
