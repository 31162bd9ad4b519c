"""Field spec layer tests: constants, arithmetic laws, encodings.

Mirrors the reference's field expectations (ff::PrimeField invariants used
throughout halo2; see SURVEY.md layer 0).
"""

import random

import pytest

from halo2_tpu.fields import Fp, Fq, FqBn, FrBn, batch_invert

FIELDS = [Fp, Fq, FrBn, FqBn]


@pytest.mark.parametrize("F", FIELDS)
def test_modulus_prime_and_generator(F):
    p = F.MODULUS
    # Miller-Rabin via Python (small rounds, deterministic bases fine here)
    assert p > 2 and pow(2, p - 1, p) == 1
    # GENERATOR has full order: g^((p-1)/q) != 1 for q in {2, 3 if 3|p-1}
    g = F.GENERATOR
    assert pow(g, (p - 1) // 2, p) != 1
    if (p - 1) % 3 == 0:
        assert pow(g, (p - 1) // 3, p) != 1


@pytest.mark.parametrize("F", FIELDS)
def test_two_adicity_root_of_unity(F):
    p = F.MODULUS
    assert (p - 1) % (1 << F.S) == 0
    assert (p - 1) % (1 << (F.S + 1)) != 0
    w = F.ROOT_OF_UNITY
    assert pow(w, 1 << F.S, p) == 1
    assert pow(w, 1 << (F.S - 1), p) == p - 1


def test_pasta_moduli_values():
    # 2^254 + t structure of the Pasta primes
    assert Fp.MODULUS == (1 << 254) + 45560315531419706090280762371685220353
    assert Fq.MODULUS == (1 << 254) + 45560315531506369815346746415080538113


@pytest.mark.parametrize("F", FIELDS)
def test_arithmetic_laws(F):
    rng = random.Random(42)
    for _ in range(50):
        a, b, c = (F(rng.randrange(F.MODULUS)) for _ in range(3))
        assert (a + b) * c == a * c + b * c
        assert a * b == b * a
        assert a - a == F.zero()
        assert a.square() == a * a
        assert a.double() == a + a
        if not a.is_zero():
            assert a * a.invert() == F.one()
        assert -a + a == F.zero()


@pytest.mark.parametrize("F", FIELDS)
def test_repr_roundtrip(F):
    rng = random.Random(7)
    for _ in range(20):
        a = F(rng.randrange(F.MODULUS))
        assert F.from_repr(a.to_repr()) == a
    # non-canonical rejected
    with pytest.raises(ValueError):
        F.from_repr(F.MODULUS.to_bytes(32, "little"))


@pytest.mark.parametrize("F", FIELDS)
def test_from_uniform_bytes(F):
    b = bytes(range(64))
    expect = int.from_bytes(b, "little") % F.MODULUS
    assert F.from_uniform_bytes(b).v == expect


@pytest.mark.parametrize("F", [Fp, Fq])
def test_sqrt(F):
    rng = random.Random(3)
    for _ in range(20):
        a = F(rng.randrange(F.MODULUS))
        s = a.square()
        r = s.sqrt()
        assert r is not None and r.square() == s
    # A known non-residue: GENERATOR (since g^((p-1)/2) = -1)
    assert F(F.GENERATOR).sqrt() is None


def test_batch_invert():
    rng = random.Random(9)
    xs = [Fp(rng.randrange(Fp.MODULUS)) for _ in range(17)]
    xs[5] = Fp.zero()  # zeros pass through
    out = batch_invert(xs)
    for x, o in zip(xs, out):
        if x.is_zero():
            assert o.is_zero()
        else:
            assert x * o == Fp.one()


def test_delta_zeta():
    for F in (Fp, Fq):
        assert pow(F.DELTA, (F.MODULUS - 1) // (1 << F.S), F.MODULUS) != 0
        z = F.ZETA
        assert z != 1 and pow(z, 3, F.MODULUS) == 1
