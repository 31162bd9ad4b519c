"""V1 floor planner (reference floor_planner/v1.rs): slot-in placement
equivalence test from v1/strategy.rs:228-265 plus an end-to-end proof using
the dual-pass planner."""

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend.floor_planner import (
    Allocations,
    RegionShape,
    V1FloorPlanner,
    _first_fit_region,
)
from halo2_tpu.plonk.expression import ADVICE, Column

from circuits import MulCircuit


def _shape(idx, cols, rows):
    s = RegionShape(idx)
    s.columns = {("column", Column(ADVICE, c)) for c in cols}
    s.row_count = rows
    return s


def test_slot_in_reference_vector():
    """Mirrors the reference test_slot_in (v1/strategy.rs:228-265)."""
    shapes = [_shape(0, [0, 1], 15), _shape(1, [2], 10), _shape(2, [2, 0], 10)]
    allocs = {}
    starts = []
    for s in shapes:
        cols = sorted(s.columns, key=lambda rc: (rc[1].index,))
        starts.append(_first_fit_region(allocs, cols, s.row_count, 0, None))
    assert starts == [0, 0, 15]


class MulCircuitV1(MulCircuit):
    floor_planner = V1FloorPlanner

    def without_witnesses(self):
        return MulCircuitV1(self.constant)


def test_v1_mock_prover():
    p = Fp.MODULUS
    a, b = 2, 3
    c = 7 * a * a % p * b % p * b % p
    MockProver.run(4, MulCircuitV1(7, a, b), [[c]]).assert_satisfied()


def test_v1_prove_verify():
    from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
    from halo2_tpu.plonk.prover import create_proof
    from halo2_tpu.plonk.verifier import verify_proof
    from halo2_tpu.poly.ipa import ParamsIPA
    from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
    from halo2_tpu.utils.chacha import ChaCha20Rng

    p = Fp.MODULUS
    a, b = 2, 3
    c = 7 * a * a % p * b % p * b % p
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuitV1(7))
    pk = keygen_pk(params, vk, MulCircuitV1(7))
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuitV1(7, a, b)], [[[c]]], ChaCha20Rng(b"\x03" * 32), t)
    assert verify_proof(params, vk, [[[c]]], Blake2bRead(Vesta, t.finalize())) is True
