"""Regenerate tests/fixtures_golden.json (self-determinism fixtures).

Run after any intentional change to the arithmetization, transcript
framing, parameter derivation, or proof layout."""

import hashlib
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from circuits import MulCircuit  # noqa: E402

from halo2_tpu.curves import Vesta  # noqa: E402
from halo2_tpu.fields import Fp  # noqa: E402
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk  # noqa: E402
from halo2_tpu.plonk.prover import create_proof  # noqa: E402
from halo2_tpu.plonk.verifier import verify_proof  # noqa: E402
from halo2_tpu.poly.ipa import ParamsIPA  # noqa: E402
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite  # noqa: E402
from halo2_tpu.utils.chacha import ChaCha20Rng  # noqa: E402


def main():
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))
    c = 7 * 4 * 9 % Fp.MODULUS
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuit(7, 2, 3)], [[[c]]], ChaCha20Rng(b"\x2a" * 32), t)
    proof = t.finalize()
    verify_proof(params, vk, [[[c]]], Blake2bRead(Vesta, proof))
    out = {
        "vk_transcript_repr": hex(vk.transcript_repr),
        "vk_pinned_sha256": hashlib.sha256(vk.pinned_repr().encode()).hexdigest(),
        "proof_len": len(proof),
        "proof_sha256": hashlib.sha256(proof).hexdigest(),
    }
    path = os.path.join(_REPO, "tests", "fixtures_golden.json")
    json.dump(out, open(path, "w"), indent=1)
    print("regenerated + verified:", out)


if __name__ == "__main__":
    main()
