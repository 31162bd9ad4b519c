"""End-to-end: keygen -> prove -> verify for the simple mul circuit
(IPA commitment scheme over Vesta, Blake2b transcript) - the equivalent of
the reference's plonk_api/simple-example flow."""

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.plonk.error import OpeningError, Error
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite, TranscriptError
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MulCircuit

pytestmark = pytest.mark.slow

K = 4


@pytest.fixture(scope="module")
def setup():
    params = ParamsIPA.cached(Vesta, K)
    circuit = MulCircuit(7)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk


def make_proof(setup, a=2, b=3, seed=b"\x2a" * 32):
    params, vk, pk = setup
    p = Fp.MODULUS
    c = 7 * a * a % p * b % p * b % p
    circuit = MulCircuit(7, a, b)
    transcript = Blake2bWrite(Vesta)
    rng = ChaCha20Rng(seed)
    create_proof(params, pk, [circuit], [[[c]]], rng, transcript)
    return transcript.finalize(), c


def test_prove_and_verify(setup):
    params, vk, pk = setup
    proof, c = make_proof(setup)
    assert len(proof) > 0
    t = Blake2bRead(Vesta, proof)
    assert verify_proof(params, vk, [[[c]]], t) is True


def test_proof_deterministic_given_seed(setup):
    p1, _ = make_proof(setup)
    p2, _ = make_proof(setup)
    assert p1 == p2
    p3, _ = make_proof(setup, seed=b"\x2b" * 32)
    assert p3 != p1


def test_wrong_instance_rejected(setup):
    params, vk, pk = setup
    proof, c = make_proof(setup)
    bad = (c + 1) % Fp.MODULUS
    t = Blake2bRead(Vesta, proof)
    with pytest.raises((OpeningError, Error, TranscriptError)):
        verify_proof(params, vk, [[[bad]]], t)


def test_corrupted_proof_rejected(setup):
    params, vk, pk = setup
    proof, c = make_proof(setup)
    for pos in [0, len(proof) // 2, len(proof) - 1]:
        bad = bytearray(proof)
        bad[pos] ^= 1
        t = Blake2bRead(Vesta, bytes(bad))
        with pytest.raises((OpeningError, Error, TranscriptError, ValueError)):
            verify_proof(params, vk, [[[c]]], t)
