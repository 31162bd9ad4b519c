"""Regenerate tests/fixtures_golden_matrix.json (gating configs 2 and 4).

Each config's proof is VERIFIED before its bytes are pinned. Run after any
intentional change to the arithmetization, transcript framing, parameter
derivation, or proof layout. Companion cargo capture programs live in
tools/capture_rust_golden/ for replacing these self-pinned values with
Rust-captured ones.

Usage: python tools/regen_golden_matrix.py [config ...]   (default: all)
"""

import hashlib
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax  # noqa: E402

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

from golden_circuits import golden_configs  # noqa: E402


def main():
    only = set(sys.argv[1:])
    path = os.path.join(_REPO, "tests", "fixtures_golden_matrix.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    for cfg in golden_configs():
        if only and cfg["name"] not in only:
            continue
        print(f"[{cfg['name']}] keygen + prove ...", flush=True)
        vk, pk, prove, verify = cfg["full"]()
        proof = prove(pk)
        assert verify(proof) is True, f"{cfg['name']}: proof failed verification"
        out[cfg["name"]] = {
            "vk_transcript_repr": hex(vk.transcript_repr),
            "proof_len": len(proof),
            "proof_sha256": hashlib.sha256(proof).hexdigest(),
        }
        json.dump(out, open(path, "w"), indent=1)
        print(f"[{cfg['name']}] pinned: {out[cfg['name']]}", flush=True)


if __name__ == "__main__":
    main()
