"""MockProver tests over the simple mul circuit (reference
examples/simple-example.rs run through dev.rs MockProver)."""

import pytest

from halo2_tpu.fields import Fp
from halo2_tpu.dev.mock_prover import MockProver

from circuits import MulCircuit


def expected_c(constant, a, b, p):
    return constant * a * a % p * b % p * b % p


def test_mock_prover_satisfied():
    p = Fp.MODULUS
    const, a, b = 7, 2, 3
    c = expected_c(const, a, b, p)
    circuit = MulCircuit(const, a, b)
    prover = MockProver.run(4, circuit, [[c]], field_cls=Fp)
    prover.assert_satisfied()


def test_mock_prover_bad_instance():
    p = Fp.MODULUS
    const, a, b = 7, 2, 3
    c = expected_c(const, a, b, p)
    circuit = MulCircuit(const, a, b)
    prover = MockProver.run(4, circuit, [[(c + 1) % p]], field_cls=Fp)
    failures = prover.verify()
    assert failures, "tampered instance must fail"
    assert any(f.kind == "permutation" for f in failures)


def test_mock_prover_bad_witness():
    # break the mul gate: claim a*b where it isn't
    p = Fp.MODULUS

    class Cheat(MulCircuit):
        def synthesize(self, config, layouter):
            a = layouter.assign_region(
                "a", lambda r: r.assign_advice(config.advice0, 0, self.a, "a")
            )
            b = layouter.assign_region(
                "b", lambda r: r.assign_advice(config.advice1, 0, self.b, "b")
            )

            def bad_mul(region):
                config.s_mul.enable(region, 0)
                a.copy_advice(region, config.advice0, 0)
                b.copy_advice(region, config.advice1, 0)
                return region.assign_advice(config.advice0, 1, 999999, "wrong")

            out = layouter.assign_region("bad", bad_mul)
            layouter.constrain_instance(out.cell(), config.instance, 0)

    circuit = Cheat(7, 2, 3)
    prover = MockProver.run(4, circuit, [[999999]], field_cls=Fp)
    failures = prover.verify()
    assert any(f.kind == "constraint" for f in failures)


def test_mock_prover_unassigned_cell():
    class Hole(MulCircuit):
        def synthesize(self, config, layouter):
            def region_fn(region):
                config.s_mul.enable(region, 0)
                region.assign_advice(config.advice0, 0, self.a, "a")
                region.assign_advice(config.advice1, 0, self.b, "b")
                # deliberately do NOT assign the output cell at offset 1

            layouter.assign_region("hole", region_fn)

    prover = MockProver.run(4, Hole(7, 2, 3), [[]], field_cls=Fp)
    failures = prover.verify()
    assert any(f.kind == "cell_not_assigned" for f in failures), failures


def test_mock_prover_too_small_k():
    from halo2_tpu.plonk.error import NotEnoughRowsAvailable

    with pytest.raises(NotEnoughRowsAvailable):
        MockProver.run(2, MulCircuit(7, 2, 3), [[0]], field_cls=Fp)


def test_failure_rendering_reference_parity():
    """Failure output carries the reference's information content
    (dev/failure.rs:125-188 + metadata.rs): Constraint/Gate identity,
    Region location with offset, cell-value table with '<--' marker, and
    Region::name_column annotations labeling the table columns."""

    class Cheat(MulCircuit):
        def synthesize(self, config, layouter):
            a = layouter.assign_region(
                "a", lambda r: r.assign_advice(config.advice0, 0, self.a, "a")
            )
            b = layouter.assign_region(
                "b", lambda r: r.assign_advice(config.advice1, 0, self.b, "b")
            )

            def bad_mul(region):
                region.name_column(config.advice0, "lhs-operand")
                config.s_mul.enable(region, 0)
                a.copy_advice(region, config.advice0, 0)
                b.copy_advice(region, config.advice1, 0)
                return region.assign_advice(config.advice0, 1, 999999, "wrong")

            out = layouter.assign_region("bad mul", bad_mul)
            layouter.constrain_instance(out.cell(), config.instance, 0)

    prover = MockProver.run(4, Cheat(7, 2, 3), [[999999]], field_cls=Fp)
    failures = [f for f in prover.verify() if f.kind == "constraint"]
    assert failures
    text = str(failures[0])
    assert "in Gate" in text and "is not satisfied" in text
    assert "in Region" in text and "'bad mul'" in text and "at offset" in text
    assert "<--" in text  # gate-row marker in the cell table
    assert "lhs-operand" in text  # name_column annotation reaches the emitter

    # cell_not_assigned carries Region/Gate/offset identity
    class Hole(MulCircuit):
        def synthesize(self, config, layouter):
            def region_fn(region):
                config.s_mul.enable(region, 0)
                region.assign_advice(config.advice0, 0, self.a, "a")
                region.assign_advice(config.advice1, 0, self.b, "b")

            layouter.assign_region("hole", region_fn)

    prover = MockProver.run(4, Hole(7, 2, 3), [[]], field_cls=Fp)
    fails = [f for f in prover.verify() if f.kind == "cell_not_assigned"]
    assert fails
    text = str(fails[0])
    assert "uses Gate" in text and "does not assign Column" in text
