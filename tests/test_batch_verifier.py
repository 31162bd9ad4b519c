"""BatchVerifier (reference plonk/verifier/batch.rs, feature `batch`)."""

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.batch import BatchVerifier
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MulCircuit

pytestmark = pytest.mark.slow


def _proof(params, pk, a, b, seed):
    p = Fp.MODULUS
    c = 7 * a * a % p * b % p * b % p
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuit(7, a, b)], [[[c]]], ChaCha20Rng(seed), t)
    return [[[c]]], t.finalize()


def test_batch_verifier():
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))

    batch = BatchVerifier()
    for i, (a, b) in enumerate([(2, 3), (4, 5), (1, 9)]):
        inst, proof = _proof(params, pk, a, b, bytes([i + 1]) * 32)
        batch.add_proof(inst, proof)
    assert batch.finalize(params, vk, ChaCha20Rng(b"\x55" * 32)) is True

    # one bad instance poisons the batch
    bad = BatchVerifier()
    inst, proof = _proof(params, pk, 2, 3, b"\x07" * 32)
    bad.add_proof(inst, proof)
    bad_inst = [[[(inst[0][0][0] + 1) % Fp.MODULUS]]]
    inst2, proof2 = _proof(params, pk, 4, 5, b"\x08" * 32)
    bad.add_proof(bad_inst, proof2)
    assert bad.finalize(params, vk, ChaCha20Rng(b"\x56" * 32)) is False


def test_batch_verifier_corrupted_proof_bytes():
    """Corrupted proof bytes -> False, not an exception
    (reference batch.rs:107-118 treats transcript errors as invalid)."""
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))

    inst, proof = _proof(params, pk, 2, 3, b"\x07" * 32)

    # flip a byte in the middle of the proof stream
    corrupted = bytearray(proof)
    corrupted[len(corrupted) // 2] ^= 0xFF
    batch = BatchVerifier()
    batch.add_proof(inst, bytes(corrupted))
    assert batch.finalize(params, vk, ChaCha20Rng(b"\x57" * 32)) is False

    # truncated proof stream
    batch2 = BatchVerifier()
    batch2.add_proof(inst, proof[: len(proof) // 2])
    assert batch2.finalize(params, vk, ChaCha20Rng(b"\x58" * 32)) is False
