"""Shared example circuits for tests.

`MulCircuit` is the equivalent of the reference's `examples/simple-example.rs`
(also the plonk bench circuit shape): private a, b; fixed constant;
computes c = constant * a^2 * b^2 and exposes it as a public input.
"""

from dataclasses import dataclass

from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import Rotation


@dataclass
class MulConfig:
    advice0: object
    advice1: object
    instance: object
    constant: object
    s_mul: object


class MulCircuit(Circuit):
    def __init__(self, constant: int, a=None, b=None):
        self.constant = constant
        self.a = Value.unknown() if a is None else Value.known(a)
        self.b = Value.unknown() if b is None else Value.known(b)

    def without_witnesses(self):
        return MulCircuit(self.constant)

    @classmethod
    def configure(cls, meta: ConstraintSystem) -> MulConfig:
        advice0 = meta.advice_column()
        advice1 = meta.advice_column()
        instance = meta.instance_column()
        constant = meta.fixed_column()
        meta.enable_equality(instance)
        meta.enable_constant(constant)
        meta.enable_equality(advice0)
        meta.enable_equality(advice1)
        s_mul = meta.selector()

        def mul_gate(cells):
            lhs = cells.query_advice(advice0, Rotation.cur())
            rhs = cells.query_advice(advice1, Rotation.cur())
            out = cells.query_advice(advice0, Rotation.next())
            s = cells.query_selector(s_mul)
            return [s * (lhs * rhs - out)]

        meta.create_gate("mul", mul_gate)
        return MulConfig(advice0, advice1, instance, constant, s_mul)

    def synthesize(self, config: MulConfig, layouter: Layouter):
        # load private inputs
        def load_private(value, name):
            return layouter.assign_region(
                f"load {name}",
                lambda region: region.assign_advice(config.advice0, 0, value, name),
            )

        a = load_private(self.a, "a")
        b = load_private(self.b, "b")
        const_cell = layouter.assign_region(
            "load constant",
            lambda region: region.assign_advice_from_constant(
                config.advice0, 0, self.constant, "constant"
            ),
        )

        def mul(lhs, rhs, name):
            def in_region(region):
                config.s_mul.enable(region, 0)
                lhs.copy_advice(region, config.advice0, 0, "lhs")
                rhs.copy_advice(region, config.advice1, 0, "rhs")
                out = lhs.value() * rhs.value()
                return region.assign_advice(config.advice0, 1, out, "lhs*rhs")

            return layouter.assign_region(name, in_region)

        ab = mul(a, b, "ab")
        absq = mul(ab, ab, "absq")
        c = mul(const_cell, absq, "c")
        layouter.constrain_instance(c.cell(), config.instance, 0)
