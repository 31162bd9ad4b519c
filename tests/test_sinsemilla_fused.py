"""Fused one-row-per-word Sinsemilla chip vs host primitives (reference
sinsemilla/chip/hash_to_point.rs tests)."""

import random

import pytest

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.frontend import Circuit, Layouter
from halo2_tpu.gadgets.sinsemilla_fused import SinsemillaFusedChip
from halo2_tpu.gadgets.sinsemilla_primitives import K, HashDomain
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow

NUM_WORDS = 30  # two pieces: 25 + 5 words
DOMAIN = "sinsemilla-fused-test"


class FusedCircuit(Circuit):
    def __init__(self, bits=None):
        self.bits = bits

    def without_witnesses(self):
        return FusedCircuit(None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advices = [meta.advice_column() for _ in range(5)]
        witness_pieces = meta.advice_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return SinsemillaFusedChip.configure(meta, advices, witness_pieces)

    def synthesize(self, config, layouter: Layouter):
        chip = SinsemillaFusedChip(config)
        chip.load_table(layouter)
        domain = HashDomain(DOMAIN)
        pieces = chip.witness_message(layouter, self.bits, NUM_WORDS)
        out = chip.hash_to_point(layouter, domain.Q, pieces)
        if self.bits is not None:
            expected = domain.hash_to_point(self.bits)
            got = out.point().force_value()
            assert got == expected, (got, expected)


def test_fused_sinsemilla_matches_primitive():
    random.seed(77)
    bits = [bool(random.getrandbits(1)) for _ in range(NUM_WORDS * K)]
    MockProver.run(11, FusedCircuit(bits), []).assert_satisfied()


def test_fused_sinsemilla_bad_witness_fails():
    class Bad(FusedCircuit):
        def synthesize(self, config, layouter):
            chip = SinsemillaFusedChip(config)
            chip.load_table(layouter)
            domain = HashDomain(DOMAIN)
            pieces = chip.witness_message(layouter, self.bits, NUM_WORDS)
            # corrupt one word: lookup/secant constraints must fail
            pieces[0].words[3] ^= 1
            chip.hash_to_point(layouter, domain.Q, pieces)

    random.seed(78)
    bits = [bool(random.getrandbits(1)) for _ in range(NUM_WORDS * K)]
    failures = MockProver.run(11, Bad(bits), []).verify()
    assert failures, "corrupted word must violate constraints"
