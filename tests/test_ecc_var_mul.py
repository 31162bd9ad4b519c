"""Row-optimized variable-base mul (reference ecc/chip/mul.rs tests):
[alpha]T for edge and random alphas, checked by MockProver with the 10-bit
overflow-check table loaded."""

import random

import pytest

from halo2_tpu.curves import Pallas
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp, Fq
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.utilities import LookupRangeCheckConfig, load_private
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow


class VarMulCircuit(Circuit):
    def __init__(self, alpha=None, base=None):
        self.alpha = alpha  # base-field int or None
        self.base = base  # Pallas Point or None

    def without_witnesses(self):
        return VarMulCircuit(None, None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advices = [meta.advice_column() for _ in range(10)]
        table = meta.lookup_table_column()
        lookup = LookupRangeCheckConfig.configure(meta, advices[9], table, 10, Fp)
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return EccChip.configure(meta, advices, lookup_config=lookup)

    def synthesize(self, config, layouter: Layouter):
        chip = EccChip(config)
        config.var_mul.lookup.load(layouter)
        base = chip.witness_point_non_id(
            layouter,
            Value.known(self.base) if self.base is not None else Value.unknown(),
        )
        alpha = load_private(
            layouter, config.advices[0],
            Value.known(self.alpha) if self.alpha is not None else Value.unknown(),
        )
        result, _ = chip.mul_var(layouter, alpha, base)
        if self.alpha is not None:
            expect = self.base.mul(self.alpha % Fq.MODULUS)
            got = result.point().force_value()
            assert got == expect


@pytest.mark.parametrize(
    "alpha",
    [
        1,
        (1 << 130) - 1,  # boundary of the hi/lo split
        1 << 130,
        Fp.MODULUS - 1,  # largest witnessable base-field scalar
        0xDEADBEEF1234,
    ],
)
def test_var_mul_edge_scalars(alpha):
    base = Pallas.generator().mul(7)
    MockProver.run(11, VarMulCircuit(alpha, base), []).assert_satisfied()


def test_var_mul_random():
    rng = random.Random(99)
    base = Pallas.generator().mul(rng.randrange(1, 1 << 64))
    alpha = rng.randrange(Fp.MODULUS)
    MockProver.run(11, VarMulCircuit(alpha, base), []).assert_satisfied()
