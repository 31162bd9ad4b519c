"""Sinsemilla chip vs host primitives (reference sinsemilla/chip tests)."""

import random

import pytest

from halo2_tpu.curves import Pallas
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.sinsemilla import SinsemillaChip, SinsemillaHashGadget
from halo2_tpu.gadgets.sinsemilla_primitives import K, HashDomain
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow

NUM_WORDS = 3
DOMAIN = "sinsemilla-gadget-test"


class SinsemillaCircuit(Circuit):
    def __init__(self, bits=None):
        self.bits = bits  # NUM_WORDS*K bools or None

    def without_witnesses(self):
        return SinsemillaCircuit(None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        ecc_advices = [meta.advice_column() for _ in range(10)]
        ecc_config = EccChip.configure(meta, ecc_advices)
        sin_advices = [meta.advice_column() for _ in range(3)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return SinsemillaChip.configure(meta, sin_advices, ecc_config)

    def synthesize(self, config, layouter: Layouter):
        chip = SinsemillaChip(config)
        chip.load_table(layouter)
        domain = HashDomain(DOMAIN)
        gadget = SinsemillaHashGadget(chip, domain)
        out = gadget.hash_to_point(layouter, self.bits, NUM_WORDS)
        if self.bits is not None:
            expected = domain.hash_to_point(self.bits)
            assert out.point().force_value() == expected


def test_sinsemilla_hash_gadget():
    random.seed(21)
    bits = [bool(random.getrandbits(1)) for _ in range(NUM_WORDS * K)]
    MockProver.run(11, SinsemillaCircuit(bits), []).assert_satisfied()


def test_sinsemilla_bad_word_fails():
    class BadCircuit(SinsemillaCircuit):
        def synthesize(self, config, layouter):
            chip = SinsemillaChip(config)
            chip.load_table(layouter)
            # word out of range: fails the generator lookup
            chip.witness_message_words(layouter, [None])

            def in_region(region):
                from halo2_tpu.frontend import Value

                region.enable_selector(config.q_lookup, 0)
                region.assign_advice(config.word_col, 0, Value.known(1 << K), "bad")
                region.assign_advice(config.x_s_col, 0, Value.known(1), "x")
                region.assign_advice(config.y_s_col, 0, Value.known(1), "y")

            layouter.assign_region("bad word", in_region)

    prover = MockProver.run(11, BadCircuit(None), [])
    assert prover.verify(), "expected lookup failure for out-of-range word"


def test_commit_domain_in_circuit():
    """In-circuit CommitDomain vs host commit (sinsemilla.rs CommitDomain)."""
    import random

    from halo2_tpu.gadgets.ecc_api import EccGadgetChip, EccGadgetConfig
    from halo2_tpu.gadgets.sinsemilla import CommitDomainGadget, SinsemillaChip
    from halo2_tpu.gadgets.sinsemilla_primitives import CommitDomain

    domain = CommitDomain("test-commit")
    rng = random.Random(13)
    bits = [bool(rng.getrandbits(1)) for _ in range(2 * K)]
    r = rng.randrange(1, Pallas.SCALAR.MODULUS)
    expected = domain.commit(bits, r)
    assert expected is not None

    class CommitCircuit(Circuit):
        def __init__(self, known=True):
            self.known = known

        def without_witnesses(self):
            return CommitCircuit(False)

        @classmethod
        def configure(cls, meta):
            advices = [meta.advice_column() for _ in range(10)]
            constants = meta.fixed_column()
            meta.enable_constant(constants)
            ecc_cfg = EccGadgetConfig.configure(meta, advices)
            sin_advices = [meta.advice_column() for _ in range(3)]
            sin = SinsemillaChip.configure(meta, sin_advices, ecc_cfg.ecc)
            return ecc_cfg, sin

        def synthesize(self, config, layouter):
            ecc_cfg, sin = config
            chip = SinsemillaChip(sin)
            chip.load_table(layouter)
            gadget = CommitDomainGadget(chip, EccGadgetChip(ecc_cfg), domain)
            rv = Value.known(r) if self.known else Value.unknown()
            out = gadget.commit(layouter, bits if self.known else None, 2, rv)
            if self.known:
                assert out.point().force_value() == expected

    MockProver.run(11, CommitCircuit(), []).assert_satisfied()
