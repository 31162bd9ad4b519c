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
