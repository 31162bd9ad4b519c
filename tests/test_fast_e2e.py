"""Tiny end-to-end prove -> verify for the fast lane (VERDICT r4 #9).

One k=4 IPA proof over the gating-config-1 mul circuit, plus a negative
check, so `pytest -m fast` exercises keygen/prover/verifier/transcript
end-to-end in well under a minute (reference smoke analogue:
halo2_proofs/examples/simple-example.rs).
"""

import pytest

from circuits import MulCircuit

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

pytestmark = pytest.mark.fast


def test_tiny_e2e_prove_verify():
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))
    c = 7 * 2 * 3 % Fp.MODULUS
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuit(7, 2, 3)], [[[c]]], ChaCha20Rng(b"\x01" * 32), t)
    proof = t.finalize()
    assert verify_proof(params, vk, [[[c]]], Blake2bRead(Vesta, proof)) is True
    # wrong public input must fail
    assert verify_proof(params, vk, [[[(c + 1) % Fp.MODULUS]]], Blake2bRead(Vesta, proof)) is not True
