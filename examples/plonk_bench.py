"""Benchmark circuit: standard PLONK gate + lookup + copies, parametric rows.

The k=14 proof-latency workload (BASELINE.md north star #3; reference
workload shape: `halo2_proofs/benches/plonk.rs:9-120` MyCircuit, which fills
the domain with mul/add regions and copy constraints). The synthesis path is
deliberately one flat region with row-indexed assignments so Python witness
generation stays O(n) with tiny constants even at k=14+.

Per active row i:  c = a*b + a + b  enforced by
    sm*(a*b) + sa*a + sb*b - sc*c = 0
with a copy constraint chaining c[i] -> a[i+1] (a real permutation argument
over two columns) and a lookup  b[i] in table  (a real lookup argument with a
2^bits fixed table).
"""

from __future__ import annotations

from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Region, Value
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import Rotation


class BenchConfig:
    def __init__(self, a, b, c, sa, sb, sc, sm, sl):
        self.a, self.b, self.c = a, b, c
        self.sa, self.sb, self.sc, self.sm = sa, sb, sc, sm
        self.sl = sl


class BenchCircuit(Circuit):
    """`rows` active gate rows; `seed` drives the witness chain."""

    def __init__(self, rows: int, table_bits: int = 8, seed: int = None):
        self.rows = rows
        self.table_bits = table_bits
        self.seed = seed

    def without_witnesses(self):
        return BenchCircuit(self.rows, self.table_bits, None)

    @classmethod
    def configure(cls, meta: ConstraintSystem) -> BenchConfig:
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sm = meta.fixed_column()
        sl = meta.lookup_table_column()
        meta.enable_equality(a)
        meta.enable_equality(c)

        def gate(cells):
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            cv = cells.query_advice(c, Rotation.cur())
            return [
                av * cells.query_fixed(sa, Rotation.cur())
                + bv * cells.query_fixed(sb, Rotation.cur())
                + av * bv * cells.query_fixed(sm, Rotation.cur())
                - cv * cells.query_fixed(sc, Rotation.cur())
            ]

        meta.create_gate("plonk", gate)

        def lookup_map(cells):
            return [(cells.query_advice(b, Rotation.cur()), sl)]

        meta.lookup("range", lookup_map)
        return BenchConfig(a, b, c, sa, sb, sc, sm, sl)

    def synthesize(self, config: BenchConfig, layouter: Layouter):
        P = Fp.MODULUS
        mask = (1 << self.table_bits) - 1
        rows = self.rows
        witness = self.seed is not None

        def main_region(region: Region):
            acells = []
            ccells = []
            av = (self.seed or 0) % P
            for i in range(rows):
                bv = (av * 0x9E3779B9 + i) & mask
                cv = (av * bv + av + bv) % P
                acells.append(
                    region.assign_advice(
                        config.a, i,
                        Value.known(av) if witness else Value.unknown(), "a",
                    ).cell()
                )
                region.assign_advice(
                    config.b, i,
                    Value.known(bv) if witness else Value.unknown(), "b",
                )
                ccells.append(
                    region.assign_advice(
                        config.c, i,
                        Value.known(cv) if witness else Value.unknown(), "c",
                    ).cell()
                )
                region.assign_fixed(config.sa, i, Value.known(1), "sa")
                region.assign_fixed(config.sb, i, Value.known(1), "sb")
                region.assign_fixed(config.sc, i, Value.known(1), "sc")
                region.assign_fixed(config.sm, i, Value.known(1), "sm")
                av = cv
            # chain: c[i] is copied into a[i+1]
            for i in range(rows - 1):
                region.constrain_equal(ccells[i], acells[i + 1])

        layouter.assign_region("main", main_region)

        def in_table(table):
            for v in range(1 << self.table_bits):
                table.assign_cell(config.sl, v, v, "t")

        layouter.assign_table("table", in_table)


def bench_circuit_for_k(k: int, seed: int = 42):
    """Fill ~all usable rows of a 2^k domain (leave room for blinding +
    the lookup table tail)."""
    rows = (1 << k) - 64
    return BenchCircuit(rows, table_bits=min(8, k - 1), seed=seed)
