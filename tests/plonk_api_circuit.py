"""Replica of the reference integration-test circuit
(`halo2_proofs/tests/plonk_api.rs` MyCircuit / StandardPlonk): standard
PLONK gate with an extra sf*(d*e) term, a public-input gate, one lookup,
and heavy equality. Column allocation, query allocation, and equality
enables follow the reference's exact call order so the pinned VK matches."""

from __future__ import annotations

from typing import List, Optional

from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Region, Value
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import Rotation


class PlonkApiConfig:
    def __init__(self, a, b, c, d, e, sa, sb, sc, sm, sp, sl, p):
        self.a, self.b, self.c, self.d, self.e = a, b, c, d, e
        self.sa, self.sb, self.sc, self.sm, self.sp = sa, sb, sc, sm, sp
        self.sl = sl
        self.p = p


class PlonkApiCircuit(Circuit):
    """plonk_api.rs MyCircuit; `a=None` for keygen (without witnesses)."""

    def __init__(self, a: Optional[int], lookup_table: List[int]):
        self.a = a
        self.lookup_table = lookup_table

    def without_witnesses(self):
        return PlonkApiCircuit(None, self.lookup_table)

    @classmethod
    def configure(cls, meta: ConstraintSystem) -> PlonkApiConfig:
        e = meta.advice_column()
        a = meta.advice_column()
        b = meta.advice_column()
        sf = meta.fixed_column()
        c = meta.advice_column()
        d = meta.advice_column()
        p = meta.instance_column()

        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)

        sm = meta.fixed_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sp = meta.fixed_column()
        sl = meta.lookup_table_column()

        def lookup_map(cells):
            a_ = cells.query_advice(a, Rotation.cur())
            return [(a_, sl)]

        meta.lookup("lookup", lookup_map)

        def combined_gate(cells):
            dq = cells.query_advice(d, Rotation.next())
            aq = cells.query_advice(a, Rotation.cur())
            sfq = cells.query_fixed(sf, Rotation.cur())
            eq = cells.query_advice(e, Rotation.prev())
            bq = cells.query_advice(b, Rotation.cur())
            cq = cells.query_advice(c, Rotation.cur())
            saq = cells.query_fixed(sa, Rotation.cur())
            sbq = cells.query_fixed(sb, Rotation.cur())
            scq = cells.query_fixed(sc, Rotation.cur())
            smq = cells.query_fixed(sm, Rotation.cur())
            return [aq * saq + bq * sbq + aq * bq * smq - (cq * scq) + sfq * (dq * eq)]

        meta.create_gate("Combined add-mult", combined_gate)

        def public_gate(cells):
            aq = cells.query_advice(a, Rotation.cur())
            pq = cells.query_instance(p, Rotation.cur())
            spq = cells.query_fixed(sp, Rotation.cur())
            return [spq * (aq - pq)]

        meta.create_gate("Public input", public_gate)

        meta.enable_equality(sf)
        meta.enable_equality(e)
        meta.enable_equality(d)
        meta.enable_equality(p)
        meta.enable_equality(sm)
        meta.enable_equality(sa)
        meta.enable_equality(sb)
        meta.enable_equality(sc)
        meta.enable_equality(sp)

        return PlonkApiConfig(a, b, c, d, e, sa, sb, sc, sm, sp, sl, p)

    # -- StandardCs ops (plonk_api.rs StandardPlonk impl) --

    def _raw(self, layouter: Layouter, cfg: PlonkApiConfig, mul: bool, vals):
        P = Fp.MODULUS

        def in_region(region: Region):
            if vals is None:
                v = [Value.unknown()] * 3
                lhs4 = rhs4 = Value.unknown()
            else:
                l, r, o = vals
                v = [Value.known(l), Value.known(r), Value.known(o)]
                lhs4 = Value.known(pow(l, 4, P))
                rhs4 = Value.known(pow(r, 4, P))
            lhs = region.assign_advice(cfg.a, 0, v[0], "lhs")
            region.assign_advice(cfg.d, 0, lhs4, "lhs^4")
            rhs = region.assign_advice(cfg.b, 0, v[1], "rhs")
            region.assign_advice(cfg.e, 0, rhs4, "rhs^4")
            out = region.assign_advice(cfg.c, 0, v[2], "out")
            region.assign_fixed(cfg.sa, 0, Value.known(0 if mul else 1), "a")
            region.assign_fixed(cfg.sb, 0, Value.known(0 if mul else 1), "b")
            region.assign_fixed(cfg.sc, 0, Value.known(1), "c")
            region.assign_fixed(cfg.sm, 0, Value.known(1 if mul else 0), "a * b")
            return lhs.cell(), rhs.cell(), out.cell()

        return layouter.assign_region("raw_multiply" if mul else "raw_add", in_region)

    def synthesize(self, config: PlonkApiConfig, layouter: Layouter):
        P = Fp.MODULUS

        def public_region(region: Region):
            value = region.assign_advice(config.a, 0, Value.known(2), "value")
            region.assign_fixed(config.sp, 0, Value.known(1), "public")
            return value.cell()

        layouter.assign_region("public_input", public_region)

        a = self.a
        for _ in range(10):
            if a is None:
                mul_vals = add_vals = None
            else:
                a2 = a * a % P
                mul_vals = (a, a, a2)
                add_vals = (a, a2, (a + a2) % P)
            a0, _, c0 = self._raw(layouter, config, True, mul_vals)
            a1, b1, _ = self._raw(layouter, config, False, add_vals)

            def copy_region(region: Region, l=a0, r=a1):
                region.constrain_equal(l, r)
                region.constrain_equal(l, r)

            layouter.assign_region("copy", copy_region)

            def copy_region2(region: Region, l=b1, r=c0):
                region.constrain_equal(l, r)
                region.constrain_equal(l, r)

            layouter.assign_region("copy", copy_region2)

        def in_table(table):
            for index, value in enumerate(self.lookup_table):
                table.assign_cell(config.sl, index, value, "table col")

        layouter.assign_table("", in_table)


def plonk_api_inputs():
    """(a, instance, lookup_table) per plonk_api.rs common! macro."""
    P = Fp.MODULUS
    a = 2834758237 * Fp.ZETA % P
    instance = 2
    lookup_table = [instance, a, a, 0]
    return a, instance, lookup_table
