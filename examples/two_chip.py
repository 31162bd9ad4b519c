"""Two-chip composition: a FieldChip composed of separate Add and Mul
sub-chips sharing columns, computing a * (b + c) against a public output
(reference examples/two-chip.rs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Region, Value
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import Rotation

P = Fp.MODULUS


def _as_int(v):
    from halo2_tpu.plonk.assigned import Assigned

    return v.evaluate(P) if isinstance(v, Assigned) else int(v) % P


class AddChip:
    """a + b = c on one row (two-chip.rs AddChip)."""

    def __init__(self, config):
        self.advice, self.s_add = config

    @staticmethod
    def configure(meta: ConstraintSystem, advice):
        s_add = meta.selector()

        def add_gate(cells):
            lhs = cells.query_advice(advice[0], Rotation.cur())
            rhs = cells.query_advice(advice[1], Rotation.cur())
            out = cells.query_advice(advice[0], Rotation.next())
            s = cells.query_selector(s_add)
            return [s * (lhs + rhs - out)]

        meta.create_gate("add", add_gate)
        return advice, s_add

    def add(self, layouter: Layouter, a, b):
        def in_region(region: Region):
            region.enable_selector(self.s_add, 0)
            a.copy_advice(region, self.advice[0], 0, "lhs")
            b.copy_advice(region, self.advice[1], 0, "rhs")
            va, vb = a.value(), b.value()
            if va.is_none() or vb.is_none():
                out = Value.unknown()
            else:
                out = Value.known((_as_int(va.force_value()) + _as_int(vb.force_value())) % P)
            return region.assign_advice(self.advice[0], 1, out, "lhs + rhs")

        return layouter.assign_region("add", in_region)


class MulChip:
    """a * b = c on one row (two-chip.rs MulChip)."""

    def __init__(self, config):
        self.advice, self.s_mul = config

    @staticmethod
    def configure(meta: ConstraintSystem, advice):
        s_mul = meta.selector()

        def mul_gate(cells):
            lhs = cells.query_advice(advice[0], Rotation.cur())
            rhs = cells.query_advice(advice[1], Rotation.cur())
            out = cells.query_advice(advice[0], Rotation.next())
            s = cells.query_selector(s_mul)
            return [s * (lhs * rhs - out)]

        meta.create_gate("mul", mul_gate)
        return advice, s_mul

    def mul(self, layouter: Layouter, a, b):
        def in_region(region: Region):
            region.enable_selector(self.s_mul, 0)
            a.copy_advice(region, self.advice[0], 0, "lhs")
            b.copy_advice(region, self.advice[1], 0, "rhs")
            va, vb = a.value(), b.value()
            if va.is_none() or vb.is_none():
                out = Value.unknown()
            else:
                out = Value.known(_as_int(va.force_value()) * _as_int(vb.force_value()) % P)
            return region.assign_advice(self.advice[0], 1, out, "lhs * rhs")

        return layouter.assign_region("mul", in_region)


class FieldChip:
    """Composes the two sub-chips (two-chip.rs FieldChip)."""

    def __init__(self, config):
        self.advice, self.instance, self.add_cfg, self.mul_cfg = config

    @staticmethod
    def configure(meta: ConstraintSystem, advice, instance):
        for col in advice:
            meta.enable_equality(col)
        meta.enable_equality(instance)
        add_cfg = AddChip.configure(meta, advice)
        mul_cfg = MulChip.configure(meta, advice)
        return advice, instance, add_cfg, mul_cfg

    def load_private(self, layouter: Layouter, value):
        return layouter.assign_region(
            "load private",
            lambda region: region.assign_advice(self.advice[0], 0, value, "private"),
        )

    def add_and_mul(self, layouter: Layouter, a, b, c):
        bc = AddChip(self.add_cfg).add(layouter, b, c)
        return MulChip(self.mul_cfg).mul(layouter, a, bc)

    def expose_public(self, layouter: Layouter, num, row: int):
        layouter.constrain_instance(num.cell(), self.instance, row)


class TwoChipCircuit(Circuit):
    def __init__(self, a=None, b=None, c=None):
        self.a, self.b, self.c = a, b, c

    def without_witnesses(self):
        return TwoChipCircuit()

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advice = [meta.advice_column() for _ in range(2)]
        instance = meta.instance_column()
        return FieldChip.configure(meta, advice, instance)

    def synthesize(self, config, layouter: Layouter):
        chip = FieldChip(config)
        val = lambda v: Value.unknown() if v is None else Value.known(v)
        a = chip.load_private(layouter, val(self.a))
        b = chip.load_private(layouter, val(self.b))
        c = chip.load_private(layouter, val(self.c))
        d = chip.add_and_mul(layouter, a, b, c)
        chip.expose_public(layouter, d, 0)


def main():
    a, b, c = 5, 7, 11
    d = a * (b + c) % P
    MockProver.run(4, TwoChipCircuit(a, b, c), [[d]]).assert_satisfied()
    print(f"two-chip circuit satisfied: {a} * ({b} + {c}) = {d}")

    bad = MockProver.run(4, TwoChipCircuit(a, b, c), [[d + 1]])
    assert bad.verify(), "expected failure for wrong public output"
    print("wrong public input rejected")


if __name__ == "__main__":
    main()
