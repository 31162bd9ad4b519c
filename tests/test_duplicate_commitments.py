"""Regression: equal-valued commitments must not collapse in the verifier.

The reference's multiopen verifiers key commitments by REFERENCE
(`CommitmentReference` PartialEq is `std::ptr::eq`, poly/ipa/msm.rs /
poly/kzg/msm.rs), so two circuit columns with identical contents - hence
identical commitment points - stay separate entries in the verifier's
x1/y fold. A value-keyed dedup diverges from the prover's per-poly fold
multiplicities and rejects perfectly valid proofs.

This pins the fix on a circuit whose four selector-style fixed columns all
carry the same 0/1 pattern (the plonk bench circuit shape,
halo2_proofs/benches/plonk.rs:9-120 with sa=sb=sc=sm=1): prove + verify
under IPA and under KZG (SHPLONK and GWC).
"""

import pytest

from halo2_tpu.fields import FieldElement
from halo2_tpu.frontend import Circuit, Value
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly import Rotation
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

pytestmark = pytest.mark.slow

K = 4
ROWS = 6


class DupFixedCircuit(Circuit):
    """c = a*b + a + b with four always-1 fixed 'selector' columns whose
    contents (and commitments) are identical."""

    def __init__(self, field, seed=None):
        self.field = field
        self.seed = seed

    def without_witnesses(self):
        return DupFixedCircuit(self.field)

    @classmethod
    def configure(cls, meta):
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sm = meta.fixed_column()
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
        return (a, b, c, sa, sb, sc, sm)

    def synthesize(self, cfg, layouter):
        P = self.field.MODULUS
        a, b, c, sa, sb, sc, sm = cfg
        witness = self.seed is not None

        def main(region):
            av = (self.seed or 0) % P
            ccells, acells = [], []
            for i in range(ROWS):
                bv = (av * 0x9E3779B9 + i) & 0xF
                cv = (av * bv + av + bv) % P
                acells.append(region.assign_advice(
                    a, i, Value.known(av) if witness else Value.unknown(), "a").cell())
                region.assign_advice(
                    b, i, Value.known(bv) if witness else Value.unknown(), "b")
                ccells.append(region.assign_advice(
                    c, i, Value.known(cv) if witness else Value.unknown(), "c").cell())
                for col in (sa, sb, sc, sm):
                    region.assign_fixed(col, i, Value.known(1), "s")
                av = cv
            for i in range(ROWS - 1):
                region.constrain_equal(ccells[i], acells[i + 1])

        layouter.assign_region("main", main)


def test_duplicate_fixed_commitments_ipa():
    from halo2_tpu.curves import Vesta
    from halo2_tpu.fields import Fp
    from halo2_tpu.poly.ipa import ParamsIPA

    params = ParamsIPA.cached(Vesta, K)
    circuit = DupFixedCircuit(Fp, seed=3)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    assert len({c.xy for c in vk.fixed_commitments}) < len(vk.fixed_commitments), \
        "circuit must actually produce duplicate commitments"
    tr = Blake2bWrite(Vesta)
    create_proof(params, pk, [circuit], [[]], ChaCha20Rng(b"\x2a" * 32), tr)
    proof = tr.finalize()
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof)) is True


@pytest.mark.parametrize("multiopen", ["shplonk", "gwc"])
def test_duplicate_fixed_commitments_kzg(multiopen):
    import random

    from halo2_tpu.curves import Bn254G1
    from halo2_tpu.fields import FrBn
    from halo2_tpu.poly.kzg import ParamsKZG

    params = ParamsKZG.setup(K, random.Random(99))
    circuit = DupFixedCircuit(FrBn, seed=3)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    tr = Blake2bWrite(Bn254G1)
    create_proof(params, pk, [circuit], [[]], ChaCha20Rng(b"\x2a" * 32), tr,
                 multiopen=multiopen)
    proof = tr.finalize()
    assert verify_proof(params, vk, [[]], Blake2bRead(Bn254G1, proof),
                        multiopen=multiopen) is True


def test_mock_poison_zero_annihilates():
    """dev.rs Value::mul: Real(0) * Poison = Real(0) - gates disabled by
    zeroed fixed/selector columns must NOT report ConstraintPoisoned on
    blinding rows."""
    from halo2_tpu.dev.mock_prover import MockProver
    from halo2_tpu.fields import Fp

    mp = MockProver.run(K, DupFixedCircuit(Fp, seed=3), [])
    assert mp.verify(vectorized=False) == []
