"""Cyclotomic final exponentiation vs the plain-pow oracle + bilinearity."""

import random

from halo2_tpu.curves import Bn254G1
from halo2_tpu.pairing import R as FR_ORDER
from halo2_tpu.pairing import (
    FQ12_ONE,
    PointG2,
    final_exponentiation,
    final_exponentiation_plain,
    miller_loop,
    pairing_check,
)


def test_final_exp_matches_plain_oracle():
    rng = random.Random(7)
    for _ in range(3):
        P = Bn254G1.generator().mul(rng.randrange(1, FR_ORDER))
        Q2 = PointG2.generator().mul(rng.randrange(1, FR_ORDER))
        f = miller_loop(P, Q2)
        assert final_exponentiation(f) == final_exponentiation_plain(f)


def test_pairing_check_bilinearity():
    rng = random.Random(8)
    a = rng.randrange(1, FR_ORDER)
    b = rng.randrange(1, FR_ORDER)
    G = Bn254G1.generator()
    H = PointG2.generator()
    # e(aG, bH) * e(-abG, H) == 1
    assert pairing_check([(G.mul(a), H.mul(b)), ((-G.mul(a * b)), H)])
    assert not pairing_check([(G.mul(a), H.mul(b)), ((-G.mul(a * b + 1)), H)])
