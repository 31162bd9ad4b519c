"""Golden determinism regression (the analogue of plonk_api.rs's pinned VK
string and the byte-exactness harness of SURVEY.md section 4.2).

These fixtures pin OUR framework's determinism: any change to the
arithmetization, transcript framing, challenge derivation, or proof layout
shows up as a diff here. Cross-checking against Rust-generated proof bytes
(BASELINE config 1) replaces these with reference-captured values once the
SSWU/transcript_repr parity gaps close (docs/PARITY.md)."""

import pytest

import hashlib
import json
import os

from circuits import MulCircuit

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

pytestmark = pytest.mark.slow

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "fixtures_golden.json")))


def test_golden_vk_and_proof_bytes():
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))
    assert hex(vk.transcript_repr) == GOLDEN["vk_transcript_repr"]
    assert hashlib.sha256(vk.pinned_repr().encode()).hexdigest() == GOLDEN["vk_pinned_sha256"]

    p = Fp.MODULUS
    c = 7 * 4 * 9 % p
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuit(7, 2, 3)], [[[c]]], ChaCha20Rng(b"\x2a" * 32), t)
    proof = t.finalize()
    assert len(proof) == GOLDEN["proof_len"]
    assert hashlib.sha256(proof).hexdigest() == GOLDEN["proof_sha256"]
