"""Transcript, Keccak, and ChaCha20Rng tests with external known vectors."""

import hashlib

from halo2_tpu.curves import Pallas
from halo2_tpu.fields import Fq
from halo2_tpu.transcript import (
    Blake2bRead,
    Blake2bWrite,
    Keccak256Read,
    Keccak256Write,
)
from halo2_tpu.utils.chacha import ChaCha20Rng
from halo2_tpu.utils.keccak import keccak256


def test_keccak256_known_vectors():
    # Ethereum Keccak-256 vectors (original padding, NOT SHA3-256)
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136 bytes rate)
    long = b"a" * 200
    assert (
        keccak256(long).hex()
        == hashlib.new("sha3_256", long).hexdigest()
        or True
    )  # sha3 differs; just check incremental == one-shot below
    from halo2_tpu.utils.keccak import Keccak256

    inc = Keccak256()
    inc.update(long[:77])
    inc.update(long[77:])
    assert inc.digest() == keccak256(long)
    # copy() isolates state
    a = Keccak256().update(b"xy")
    b = a.copy()
    b.update(b"z")
    assert a.digest() != b.digest()
    assert a.digest() == keccak256(b"xy")


def test_chacha20_zero_seed_vector():
    # djb/RFC keystream for key=0, nonce=0, counter=0:
    # 76 b8 e0 ad a0 f1 3d 90 ...
    rng = ChaCha20Rng(bytes(32))
    assert rng.fill_bytes(8).hex() == "76b8e0ada0f13d90"
    rng2 = ChaCha20Rng(bytes(32))
    assert rng2.next_u32() == 0xADE0B876
    # next_u64 = lo | hi<<32 of consecutive words
    rng3 = ChaCha20Rng(bytes(32))
    assert rng3.next_u64() == (0xADE0B876 | (0x903DF1A0 << 32))


def test_chacha20_block_boundary():
    rng = ChaCha20Rng(bytes(32))
    first = rng.fill_bytes(64)
    second = rng.fill_bytes(64)
    assert first != second
    # Known byte 64..68 of the zero-key stream (block 1): 9f 07 e7 be
    assert second[:4].hex() == "9f07e7be"


def test_blake2b_transcript_deterministic():
    t1 = Blake2bWrite(Pallas)
    t2 = Blake2bWrite(Pallas)
    c1 = t1.squeeze_challenge()
    c2 = t2.squeeze_challenge()
    assert c1 == c2
    t1.common_scalar(Fq(42))
    t2.common_scalar(Fq(42))
    assert t1.squeeze_challenge() == t2.squeeze_challenge()
    # diverges on different input
    t2.common_scalar(Fq(43))
    assert t1.squeeze_challenge() != t2.squeeze_challenge()


def test_transcript_write_read_agree():
    for W, R in [(Blake2bWrite, Blake2bRead), (Keccak256Write, Keccak256Read)]:
        w = W(Pallas)
        P = Pallas.generator().mul(123)
        Q = Pallas.generator().mul(456)
        w.write_point(P)
        s_chal_w = w.squeeze_challenge()
        w.write_scalar(Fq(999))
        w.write_point(Q)
        proof = w.finalize()
        assert len(proof) == 32 * 3

        r = R(Pallas, proof)
        assert r.read_point() == P
        assert r.squeeze_challenge() == s_chal_w
        assert r.read_scalar() == Fq(999)
        assert r.read_point() == Q


def test_growing_state_squeezes_differ():
    w = Blake2bWrite(Pallas)
    a = w.squeeze_challenge()
    b = w.squeeze_challenge()
    assert a != b  # prefix byte absorbed each time -> state grows


def test_keccak_challenge_lo_hi():
    w = Keccak256Write(Pallas)
    c = w.squeeze_challenge()
    # manual recompute
    from halo2_tpu.utils.keccak import Keccak256

    st = Keccak256().update(b"Halo2-Transcript").update(b"\x00")
    lo = st.copy().update(b"\x0a").digest()
    hi = st.copy().update(b"\x0b").digest()
    assert c == Fq.from_uniform_bytes(lo + hi)
