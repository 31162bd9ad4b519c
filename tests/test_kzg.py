"""KZG commitment scheme round-trip tests.

Mirrors the reference's `poly/multiopen_test.rs`: prover/verifier round trip
per multiopen variant (GWC and SHPLONK) including a deliberately-invalid
proof, plus pairing/bilinearity sanity and params serde.
"""

import random

import pytest

from halo2_tpu.curves import Bn254G1
from halo2_tpu.pairing import PointG2, pairing, pairing_check, fq12_pow
from halo2_tpu.poly.commitment import Blind, ProverQuery, VerifierQuery
from halo2_tpu.poly.kzg import MULTIOPEN, DualMSM, ParamsKZG
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite, Keccak256Read, Keccak256Write

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.setup(4, random.Random(42))


def test_pairing_bilinear():
    g1 = Bn254G1.generator()
    g2 = PointG2.generator()
    assert g2.mul(Bn254G1.SCALAR.MODULUS).is_identity()
    assert pairing(g1.mul(3), g2.mul(5)) == pairing(g1.mul(5), g2.mul(3))
    assert pairing_check([(g1.mul(7), g2), (-g1.mul(7), g2)])
    assert not pairing_check([(g1.mul(7), g2), (-g1.mul(6), g2)])


def test_params_commit_consistency(params):
    """commit(coeff form) == commit_lagrange(eval form) for the same poly."""
    from halo2_tpu.fields import FrBn
    from halo2_tpu.poly import eval_polynomial_host

    q = FrBn.MODULUS
    rng = random.Random(1)
    coeffs = [rng.randrange(q) for _ in range(params.n)]
    k = params.k
    omega = pow(FrBn.ROOT_OF_UNITY, 1 << (FrBn.S - k), q)
    evals = [eval_polynomial_host(coeffs, pow(omega, i, q), q) for i in range(params.n)]
    assert params.commit(coeffs) == params.commit_lagrange(evals)


def test_params_serde(params):
    data = params.write()
    back = ParamsKZG.read(data)
    assert back.k == params.k
    assert back.g == params.g
    assert back.g_lagrange == params.g_lagrange
    assert back.g2 == params.g2 and back.s_g2 == params.s_g2


def _roundtrip(params, variant, transcript_pair, corrupt=False):
    prove, verify = MULTIOPEN[variant]
    writer_cls, reader_cls = transcript_pair
    q = Bn254G1.SCALAR.MODULUS
    rng = random.Random(7)
    n = params.n

    ax = [rng.randrange(q) for _ in range(n)]
    bx = [rng.randrange(q) for _ in range(n)]
    cx = [rng.randrange(q) for _ in range(n)]

    x = rng.randrange(q)
    y = rng.randrange(q)
    from halo2_tpu.poly import eval_polynomial_host

    a_c = params.commit(ax)
    b_c = params.commit(bx)
    c_c = params.commit(cx)

    t = writer_cls(Bn254G1)
    prove(
        params,
        rng,
        t,
        [
            ProverQuery(x, ax, Blind()),
            ProverQuery(x, bx, Blind()),
            ProverQuery(y, bx, Blind()),
            ProverQuery(y, cx, Blind()),
        ],
    )
    proof = t.finalize()

    av = eval_polynomial_host(ax, x, q)
    bv = eval_polynomial_host(bx, x, q)
    bv_y = eval_polynomial_host(bx, y, q)
    cv = eval_polynomial_host(cx, y, q)
    if corrupt:
        av = (av + 1) % q

    r = reader_cls(Bn254G1, proof)
    guard = verify(
        params,
        r,
        [
            VerifierQuery.from_commitment(a_c, x, av),
            VerifierQuery.from_commitment(b_c, x, bv),
            VerifierQuery.from_commitment(b_c, y, bv_y),
            VerifierQuery.from_commitment(c_c, y, cv),
        ],
        DualMSM(params),
    )
    return guard.msm_accumulator.check()


@pytest.mark.parametrize("variant", ["gwc", "shplonk"])
def test_multiopen_roundtrip_blake2b(params, variant):
    assert _roundtrip(params, variant, (Blake2bWrite, Blake2bRead))


@pytest.mark.parametrize("variant", ["gwc", "shplonk"])
def test_multiopen_roundtrip_keccak(params, variant):
    assert _roundtrip(params, variant, (Keccak256Write, Keccak256Read))


@pytest.mark.parametrize("variant", ["gwc", "shplonk"])
def test_multiopen_rejects_bad_eval(params, variant):
    assert not _roundtrip(params, variant, (Blake2bWrite, Blake2bRead), corrupt=True)
