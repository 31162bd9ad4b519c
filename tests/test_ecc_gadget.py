"""ECC chip instruction tests via MockProver
(reference halo2_gadgets/src/ecc/chip tests)."""

import random

import pytest

from halo2_tpu.curves import Pallas, Point
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow


class EccOpsCircuit(Circuit):
    """Witness P, Q; check P+Q (complete & incomplete), P+P, P+(-P),
    identity cases, and [s]P for a small scalar width."""

    MUL_BITS = 8

    def __init__(self, p=None, q=None, s=None):
        self.p, self.q, self.s = p, q, s

    def without_witnesses(self):
        return EccOpsCircuit()

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return EccChip.configure(meta, advices)

    def synthesize(self, config, layouter: Layouter):
        chip = EccChip(config)
        val = lambda v: Value.unknown() if v is None else Value.known(v)
        p = chip.witness_point(layouter, val(self.p))
        q = chip.witness_point(layouter, val(self.q))

        # complete addition covers all cases
        r = chip.add(layouter, p, q)
        if self.p is not None:
            assert r.point().force_value() == self.p + self.q
        # doubling through the complete gate
        d = chip.add(layouter, p, p)
        if self.p is not None:
            assert d.point().force_value() == self.p + self.p
        # identity + P
        idp = chip.witness_point(layouter, val(Pallas.identity() if self.p is not None else None))
        r2 = chip.add(layouter, idp, p)
        if self.p is not None:
            assert r2.point().force_value() == self.p
        # incomplete addition (valid case)
        if self.p is None or (not self.p.is_identity() and not self.q.is_identity()
                              and self.p.xy[0] != self.q.xy[0]):
            pi = chip.witness_point_non_id(layouter, val(self.p))
            qi = chip.witness_point_non_id(layouter, val(self.q))
            ri = chip.add_incomplete(layouter, pi, qi)
            if self.p is not None:
                assert ri.point().force_value() == self.p + self.q
        # variable-base mul (small width for test speed)
        m, _ = chip.mul(layouter, val(self.s), p, num_bits=self.MUL_BITS)
        if self.p is not None:
            assert m.point().force_value() == self.p.mul(self.s)


def test_ecc_ops_mock():
    random.seed(11)
    g = Pallas.generator()
    p = g.mul(random.randrange(2, 1000))
    q = g.mul(random.randrange(2, 1000))
    s = random.randrange(1, 1 << EccOpsCircuit.MUL_BITS)
    MockProver.run(7, EccOpsCircuit(p, q, s), []).assert_satisfied()


def test_ecc_neg_case_mock():
    """P + (-P) = identity through the complete gate."""

    class NegCircuit(EccOpsCircuit):
        def synthesize(self, config, layouter):
            chip = EccChip(config)
            val = lambda v: Value.unknown() if v is None else Value.known(v)
            p = chip.witness_point(layouter, val(self.p))
            np_ = chip.witness_point(layouter, val(-self.p if self.p else None))
            r = chip.add(layouter, p, np_)
            if self.p is not None:
                assert r.point().force_value().is_identity()

    g = Pallas.generator()
    MockProver.run(7, NegCircuit(g.mul(5), g, 1), []).assert_satisfied()


def test_ecc_bad_witness_fails():
    """A point not on the curve must fail the witness gate."""

    class BadCircuit(EccOpsCircuit):
        def synthesize(self, config, layouter):
            chip = EccChip(config)

            def in_region(region):
                region.enable_selector(config.q_point_non_id, 0)
                region.assign_advice(config.x_p, 0, Value.known(3), "x")
                region.assign_advice(config.y_p, 0, Value.known(4), "y")

            layouter.assign_region("bad point", in_region)

    prover = MockProver.run(6, BadCircuit(None, None, None), [])
    assert prover.verify(), "expected failure for off-curve point"


@pytest.mark.slow
def test_ecc_var_base_mul_full_width():
    """Full 255-bit variable-base mul (reference ecc/chip/mul.rs tests)."""
    import random as _r

    rng = _r.Random(23)
    g = Pallas.generator()
    base = g.mul(rng.randrange(2, 1 << 64))
    s = rng.randrange(1, Pallas.SCALAR.MODULUS)

    class FullMulCircuit(EccOpsCircuit):
        def synthesize(self, config, layouter):
            chip = EccChip(config)
            val = lambda v: Value.unknown() if v is None else Value.known(v)
            p = chip.witness_point(layouter, val(self.p))
            m, _ = chip.mul(layouter, val(self.s), p, num_bits=255)
            if self.p is not None:
                assert m.point().force_value() == self.p.mul(self.s)

    MockProver.run(12, FullMulCircuit(base, base, s), []).assert_satisfied()
