"""dev-graph tooling (reference dev/graph.rs + dev/graph/layout.rs)."""

import os

from circuits import MulCircuit

from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph


def test_circuit_dot_graph():
    dot = circuit_dot_graph(MulCircuit(7))
    assert dot.startswith("digraph Circuit {")
    assert "load constant" in dot or "mul" in dot
    assert dot.rstrip().endswith("}")


def test_circuit_layout_render(tmp_path):
    path = os.path.join(tmp_path, "layout.png")
    CircuitLayout().render(4, MulCircuit(7), path)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
