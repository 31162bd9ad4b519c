"""Dev tooling: CircuitCost, CircuitGates, measure spans
(reference dev/cost.rs, dev/gates.rs, plonk.rs:48-140)."""

from circuits import MulCircuit

from halo2_tpu.dev.cost import CircuitCost
from halo2_tpu.dev.gates import CircuitGates
from halo2_tpu.utils import measure


def test_circuit_cost_measure():
    cost = CircuitCost.measure(4, MulCircuit(7))
    assert cost.advice_columns == 2
    assert cost.lookups == 0
    assert cost.permutation_cols == 4  # advice0, advice1, instance, constant
    assert cost.marginal_proof_size() > 0
    assert cost.proof_size(1) > cost.marginal_proof_size()
    assert cost.proof_size(2) > cost.proof_size(1)


def test_circuit_gates_collect():
    gates = CircuitGates.collect(MulCircuit)
    s = str(gates)
    assert "mul:" in s
    assert "S0" in s and "A0@0" in s and "A1@0" in s and "A0@1" in s
    assert gates.total_multiplications == 2


def test_measure_spans(capsys, monkeypatch):
    monkeypatch.setenv("MEASURE", "1")
    measure.reset_totals()
    with measure.span("outer"):
        with measure.span("inner fft", category="fft"):
            pass
    out = capsys.readouterr().out
    assert "outer" in out and "inner fft" in out
    assert measure.get_totals()["fft"] >= 0
