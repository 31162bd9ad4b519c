"""VK/PK serialization round-trips (reference plonk_api.rs pk/vk serde tests
and examples/serialization.rs)."""

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.helpers import PROCESSED, RAW_BYTES, RAW_BYTES_UNCHECKED
from halo2_tpu.plonk.keygen import ProvingKey, VerifyingKey, keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MulCircuit

K = 4


@pytest.fixture(scope="module")
def setup():
    params = ParamsIPA.cached(Vesta, K)
    circuit = MulCircuit(7)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk


@pytest.mark.parametrize("fmt", [PROCESSED, RAW_BYTES, RAW_BYTES_UNCHECKED])
def test_vk_roundtrip(setup, fmt):
    params, vk, pk = setup
    data = vk.to_bytes(fmt)
    vk2 = VerifyingKey.from_bytes(data, MulCircuit, params, fmt)
    assert vk2.fixed_commitments == vk.fixed_commitments
    assert vk2.permutation.commitments == vk.permutation.commitments
    assert vk2.selectors == vk.selectors
    assert vk2.transcript_repr == vk.transcript_repr
    assert vk2.to_bytes(fmt) == data


@pytest.mark.parametrize("fmt", [PROCESSED, RAW_BYTES_UNCHECKED])
def test_pk_roundtrip_and_prove(setup, fmt):
    """Prove with a deserialized PK and verify with a deserialized VK
    (examples/serialization.rs flow)."""
    params, vk, pk = setup
    pk2 = ProvingKey.from_bytes(pk.to_bytes(fmt), MulCircuit, params, fmt)
    assert pk2.to_bytes(fmt) == pk.to_bytes(fmt)

    p = Fp.MODULUS
    a, b = 4, 5
    c = 7 * a * a % p * b % p * b % p
    t = Blake2bWrite(Vesta)
    create_proof(params, pk2, [MulCircuit(7, a, b)], [[[c]]], ChaCha20Rng(b"\x09" * 32), t)
    proof = t.finalize()
    vk2 = VerifyingKey.from_bytes(vk.to_bytes(fmt), MulCircuit, params, fmt)
    assert verify_proof(params, vk2, [[[c]]], Blake2bRead(Vesta, proof)) is True


def test_params_ipa_roundtrip():
    params = ParamsIPA.cached(Vesta, K)
    data = params.write()
    back = ParamsIPA.read(Vesta, data)
    assert back.k == params.k
    assert back.g == params.g
    assert back.g_lagrange == params.g_lagrange
    assert back.w == params.w and back.u == params.u
