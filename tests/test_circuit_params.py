"""circuit-params feature: `Circuit::Params` / `configure_with_params`
(reference plonk/circuit.rs:752-793, plonk.rs:198-210).

A parameterized circuit's shape (here: how many squaring steps the gate
chain performs) is decided at configure time from the *instance's*
`params()` value rather than baked into the class.
"""

from dataclasses import dataclass

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly import Rotation
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

pytestmark = pytest.mark.slow


@dataclass
class WidthConfig:
    advice: list
    instance: object
    s_sum: object


class SumCircuit(Circuit):
    """Sums `width` private inputs; `width` arrives via circuit-params."""

    def __init__(self, width: int, values=None):
        self.width = width
        self.values = values

    def without_witnesses(self):
        return SumCircuit(self.width)

    def params(self):
        return self.width

    @classmethod
    def configure_with_params(cls, meta: ConstraintSystem, width) -> WidthConfig:
        assert width is not None, "configure_with_params must receive params()"
        advice = [meta.advice_column() for _ in range(width)]
        instance = meta.instance_column()
        meta.enable_equality(instance)
        for col in advice:
            meta.enable_equality(col)
        s_sum = meta.selector()

        def sum_gate(cells):
            terms = [cells.query_advice(col, Rotation.cur()) for col in advice]
            out = cells.query_advice(advice[0], Rotation.next())
            s = cells.query_selector(s_sum)
            acc = terms[0]
            for t in terms[1:]:
                acc = acc + t
            return [s * (acc - out)]

        meta.create_gate("sum", sum_gate)
        return WidthConfig(advice, instance, s_sum)

    def synthesize(self, config: WidthConfig, layouter: Layouter):
        def in_region(region):
            config.s_sum.enable(region, 0)
            total = None
            for i, col in enumerate(config.advice):
                v = (
                    Value.known(self.values[i])
                    if self.values is not None
                    else Value.unknown()
                )
                region.assign_advice(col, 0, v, f"x{i}")
                total = v if total is None else total + v
            return region.assign_advice(config.advice[0], 1, total, "sum")

        out = layouter.assign_region("sum", in_region)
        layouter.constrain_instance(out.cell(), config.instance, 0)


def test_params_change_circuit_shape():
    """Different params() values yield different constraint systems."""
    cs2 = ConstraintSystem()
    SumCircuit.configure_with_params(cs2, 2)
    cs3 = ConstraintSystem()
    SumCircuit.configure_with_params(cs3, 3)
    assert cs2.num_advice_columns == 2
    assert cs3.num_advice_columns == 3


@pytest.mark.parametrize("width", [2, 3])
def test_mock_prover_uses_instance_params(width):
    values = list(range(1, width + 1))
    total = sum(values)
    prover = MockProver.run(4, SumCircuit(width, values), [[total]])
    prover.assert_satisfied()

    bad = MockProver.run(4, SumCircuit(width, values), [[total + 1]])
    assert bad.verify() != []


def test_prove_verify_with_params():
    width = 3
    values = [5, 7, 11]
    total = sum(values) % Fp.MODULUS
    params = ParamsIPA.cached(Vesta, 4)
    circuit = SumCircuit(width, values)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [circuit], [[[total]]], ChaCha20Rng(b"\x11" * 32), t)
    proof = t.finalize()
    verify_proof(params, vk, [[[total]]], Blake2bRead(Vesta, proof))
