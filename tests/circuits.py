"""Shared example circuits for tests.

`MulCircuit` is the equivalent of the reference's `examples/simple-example.rs`
(also the plonk bench circuit shape): private a, b; fixed constant;
computes c = constant * a^2 * b^2 and exposes it as a public input.
"""

from dataclasses import dataclass

from halo2_tpu.fields import Fp
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

class MixedDegreeCircuit(Circuit):
    """Gates of degree 2 and 5 plus a lookup and copy constraints: spreads
    constraints across clusters 1, 2 and the running-product clusters so
    the `need_to_compute` part-skipping engine (evaluation.rs:426-428) is
    exercised with a non-trivial cluster split (L = 2, m = 4 parts)."""

    TABLE_BITS = 3

    def __init__(self, values=None):
        self.values = values  # list of ints < 2^TABLE_BITS, or None

    def without_witnesses(self):
        return MixedDegreeCircuit(None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a = meta.advice_column()
        b = meta.advice_column()
        table = meta.lookup_table_column()
        s_low = meta.selector()
        s_high = meta.selector()
        q = meta.complex_selector()
        meta.enable_equality(a)
        meta.enable_equality(b)

        def low_gate(cells):
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            s = cells.query_selector(s_low)
            return [s * (av - bv)]  # degree 2

        def high_gate(cells):
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            s = cells.query_selector(s_high)
            return [s * (av * av * av * av - bv)]  # degree 5

        meta.create_gate("low", low_gate)
        meta.create_gate("high", high_gate)

        def lookup_map(cells):
            av = cells.query_advice(a, Rotation.cur())
            qq = cells.query_selector(q)
            return [(qq * av, table)]

        meta.lookup("range", lookup_map)
        return (a, b, table, s_low, s_high, q)

    def synthesize(self, config, layouter):
        a, b, table, s_low, s_high, q = config

        def fill_table(t):
            for i in range(1 << self.TABLE_BITS):
                t.assign_cell(table, i, i, f"row {i}")

        layouter.assign_table("table", fill_table)
        values = self.values or [None] * 3

        def region_fn(region):
            from halo2_tpu.frontend import Value

            def val(x):
                return Value.known(x) if x is not None else Value.unknown()

            cells = []
            for i, v in enumerate(values):
                q.enable(region, i)
                s_low.enable(region, i)
                ca = region.assign_advice(a, i, val(v), f"a{i}")
                cb = region.assign_advice(b, i, val(v), f"b{i}")
                region.constrain_equal(ca.cell(), cb.cell())
                cells.append(ca)
            # one high-degree row: b = a^4
            row = len(values)
            s_high.enable(region, row)
            q.enable(region, row)
            v0 = values[0]
            region.assign_advice(a, row, val(v0), "a_high")
            region.assign_advice(
                b, row, val(None if v0 is None else pow(v0, 4, Fp.MODULUS)), "b_high"
            )
            return cells

        layouter.assign_region("rows", region_fn)
