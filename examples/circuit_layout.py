"""Render the circuit layout grid to a PNG
(reference examples/circuit-layout.rs, feature dev-graph)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from circuits import MulCircuit

from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph


def main():
    out = Path(__file__).with_name("layout.png")
    CircuitLayout().render(4, MulCircuit(7), str(out))
    print(f"wrote {out}")
    print(circuit_dot_graph(MulCircuit(7)))


if __name__ == "__main__":
    main()
