"""Golden determinism matrix for the gating configs beyond config 1
(VERDICT r4 #5; reference analogue: `halo2_proofs/tests/plonk_api.rs:624`
pins the full VK debug string, and each gadget bench is a fixed workload).

Pins VK transcript_repr + proof bytes for:
  * config 2 — Poseidon hash gadget circuit, k=11
    (`halo2_gadgets/benches/poseidon.rs` shape)
  * config 4 — Sinsemilla hash circuit with its generator-table lookup
    argument, k=14 (`halo2_gadgets/benches/sinsemilla` class workload)

Fixtures are produced by `tools/regen_golden_matrix.py` (which also
verifies each proof before pinning). `tools/capture_rust_golden/` carries
the cargo programs that replace these self-pinned values with
Rust-captured ones when a cargo toolchain is available.
"""

import hashlib
import json
import os

import pytest

from golden_circuits import golden_configs

pytestmark = pytest.mark.slow

_PATH = os.path.join(os.path.dirname(__file__), "fixtures_golden_matrix.json")


@pytest.mark.parametrize("name", [c["name"] for c in golden_configs()])
def test_golden_matrix(name):
    fixtures = json.load(open(_PATH))
    assert name in fixtures, f"run tools/regen_golden_matrix.py ({name} missing)"
    cfg = next(c for c in golden_configs() if c["name"] == name)
    want = fixtures[name]

    vk, pk, prove = cfg["build"]()
    assert hex(vk.transcript_repr) == want["vk_transcript_repr"]
    proof = prove(pk)
    assert len(proof) == want["proof_len"]
    assert hashlib.sha256(proof).hexdigest() == want["proof_sha256"]
