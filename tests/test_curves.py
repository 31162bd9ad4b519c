"""Curve spec layer tests: group laws, serialization, cross-curve checks."""

import random

import pytest

from halo2_tpu.curves import (
    JAC_IDENTITY,
    Bn254G1,
    Pallas,
    Point,
    Vesta,
    batch_to_affine,
    jac_add,
    jac_add_affine,
    jac_double,
    jac_mul,
)

CURVES = [Pallas, Vesta, Bn254G1]


@pytest.mark.parametrize("C", CURVES)
def test_generator_on_curve_and_order(C):
    g = C.generator()
    assert C.is_on_curve(*g.xy)
    # group order = scalar modulus: n*G = identity
    assert g.mul(C.SCALAR.MODULUS).is_identity()
    assert not g.mul(2).is_identity()


@pytest.mark.parametrize("C", CURVES)
def test_group_laws(C):
    rng = random.Random(1)
    g = C.generator()
    a, b = rng.randrange(1, 2**64), rng.randrange(1, 2**64)
    P, Q = g.mul(a), g.mul(b)
    assert P + Q == Q + P
    assert (P + Q) + P == P + (Q + P)
    assert g.mul(a + b) == P + Q
    assert P - P == C.identity()
    assert P + C.identity() == P


@pytest.mark.parametrize("C", CURVES)
def test_jacobian_mixed_add(C):
    rng = random.Random(2)
    p = C.p()
    g = C.generator().jacobian()
    P = jac_mul(g, rng.randrange(1, 2**100), p)
    Q = jac_mul(g, rng.randrange(1, 2**100), p)
    qa = C.from_jacobian(Q).xy
    assert C.from_jacobian(jac_add_affine(P, qa[0], qa[1], p)) == C.from_jacobian(
        jac_add(P, Q, p)
    )
    # doubling edge case via add
    assert C.from_jacobian(jac_add(P, P, p)) == C.from_jacobian(jac_double(P, p))
    # identity edges
    assert jac_add(P, JAC_IDENTITY, p) == P
    assert C.from_jacobian(jac_add_affine(JAC_IDENTITY, qa[0], qa[1], p)) == C.from_jacobian(Q)


@pytest.mark.parametrize("C", CURVES)
def test_compressed_roundtrip(C):
    rng = random.Random(3)
    for _ in range(10):
        P = C.generator().mul(rng.randrange(1, C.SCALAR.MODULUS))
        b = P.to_bytes()
        assert len(b) == 32
        assert C.from_bytes(b) == P
    assert C.from_bytes(C.identity().to_bytes()).is_identity()


def test_pasta_generator_value():
    # pasta_curves generators are (-1, 2)
    assert Pallas.generator().xy == (Pallas.p() - 1, 2)
    assert Vesta.generator().xy == (Vesta.p() - 1, 2)
    assert Bn254G1.generator().xy == (1, 2)


def test_batch_to_affine():
    rng = random.Random(4)
    p = Pallas.p()
    g = Pallas.generator().jacobian()
    pts = [jac_mul(g, rng.randrange(1, 2**80), p) for _ in range(9)]
    pts.insert(3, JAC_IDENTITY)
    outs = batch_to_affine(pts, p)
    for pt, out in zip(pts, outs):
        expect = Pallas.from_jacobian(pt)
        if expect.is_identity():
            assert out is None
        else:
            assert out == expect.xy


def test_secp256k1():
    """secp256k1 constants and group law (halo2curves secp256k1/curve.rs);
    2G pinned from the SEC 2 standard test vectors."""
    from halo2_tpu.curves import Secp256k1
    from halo2_tpu.fields import FqSecp

    g = Secp256k1.generator()
    two_g = g + g
    assert two_g.xy == (
        0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5,
        0x1AE168FEA63DC339A3C58419466CEAEEF7F632653266D0E1236431A950CFE52A,
    )
    assert g.mul(2) == two_g
    # group order annihilates
    assert g.mul(FqSecp.MODULUS).is_identity()
    # 33-byte compressed round trip (sign in trailing byte)
    for pt in (g, two_g, -two_g, Secp256k1.identity()):
        b = pt.to_bytes()
        assert len(b) == 33
        assert Secp256k1.from_bytes(b) == pt
    # scalar field 2-adic root of unity has exact order 2^6
    w = FqSecp.ROOT_OF_UNITY
    n = FqSecp.MODULUS
    assert pow(w, 1 << 6, n) == 1 and pow(w, 1 << 5, n) != 1
