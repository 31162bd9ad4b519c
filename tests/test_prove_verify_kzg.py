"""End-to-end keygen -> prove -> verify with the KZG scheme (BN254), both
GWC and SHPLONK multiopen variants - the KZG legs of the reference's
`tests/plonk_api.rs:1023-1025`."""

import random

import pytest

from halo2_tpu.curves import Bn254G1
from halo2_tpu.fields import FrBn
from halo2_tpu.plonk.error import Error, OpeningError
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite, TranscriptError
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MulCircuit

pytestmark = pytest.mark.slow

K = 4


@pytest.fixture(scope="module")
def setup():
    params = ParamsKZG.setup(K, random.Random(99))
    circuit = MulCircuit(7)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk


def make_proof(setup, variant, a=2, b=3):
    params, vk, pk = setup
    p = FrBn.MODULUS
    c = 7 * a * a % p * b % p * b % p
    circuit = MulCircuit(7, a, b)
    transcript = Blake2bWrite(Bn254G1)
    rng = ChaCha20Rng(b"\x2a" * 32)
    create_proof(params, pk, [circuit], [[[c]]], rng, transcript, multiopen=variant)
    return transcript.finalize(), c


@pytest.mark.parametrize("variant", ["gwc", "shplonk"])
def test_prove_and_verify_kzg(setup, variant):
    params, vk, pk = setup
    proof, c = make_proof(setup, variant)
    t = Blake2bRead(Bn254G1, proof)
    assert verify_proof(params, vk, [[[c]]], t, multiopen=variant) is True


@pytest.mark.parametrize("variant", ["gwc", "shplonk"])
def test_wrong_instance_rejected_kzg(setup, variant):
    params, vk, pk = setup
    proof, c = make_proof(setup, variant)
    bad = (c + 1) % FrBn.MODULUS
    t = Blake2bRead(Bn254G1, proof)
    with pytest.raises((OpeningError, Error, TranscriptError, AssertionError)):
        verify_proof(params, vk, [[[bad]]], t, multiopen=variant)


def test_variant_mismatch_rejected(setup):
    """A GWC proof must not verify under SHPLONK."""
    params, vk, pk = setup
    proof, c = make_proof(setup, "gwc")
    t = Blake2bRead(Bn254G1, proof)
    with pytest.raises((OpeningError, Error, TranscriptError, AssertionError)):
        verify_proof(params, vk, [[[c]]], t, multiopen="shplonk")
