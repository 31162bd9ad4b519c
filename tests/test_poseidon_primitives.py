"""Poseidon host primitives vs the reference's pinned constants and the
zcash-test-vectors permutation/hash fixtures
(`halo2_gadgets/src/poseidon/primitives/test_vectors.rs`, fp.rs, fq.rs)."""

import json
import os

import pytest

from halo2_tpu.gadgets.poseidon_primitives import (
    ConstantLength,
    P128Pow5T3Fp,
    P128Pow5T3Fq,
    permute,
    poseidon_hash,
)

FIXTURES = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures_poseidon.json"))
)

# First entries of the reference's hard-coded constant tables
# (halo2_gadgets/src/poseidon/primitives/{fp,fq}.rs).
FP_RC00 = 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303
FP_RC01 = 0x2BAB94D7AE222D135DC3C6C5FEBFAA314908AC2F12EBE06FBDB74213BF63188B
FP_MDS00 = 0x0AB5E5B874A68DE7B3D59FBDC8C9EAD497D7A0AB23850B56323F2486D7E11B63
FQ_RC00 = 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303
FQ_MDS00 = 0x1853B4977C6FA22791913F56CF21AF2B5F710AFC43DDC5F6EB4F1F742963421F


def test_generated_constants_match_reference():
    rc, mds, mds_inv = P128Pow5T3Fp.constants()
    assert rc[0][0] == FP_RC00 and rc[0][1] == FP_RC01
    assert mds[0][0] == FP_MDS00
    assert len(rc) == 64
    rcq, mdsq, _ = P128Pow5T3Fq.constants()
    assert rcq[0][0] == FQ_RC00
    assert mdsq[0][0] == FQ_MDS00
    # MDS * MDS^-1 == I
    p = P128Pow5T3Fp.FIELD.MODULUS
    ident = [
        [sum(mds[i][k] * mds_inv[k][j] for k in range(3)) % p for j in range(3)]
        for i in range(3)
    ]
    assert ident == [[1, 0, 0], [0, 1, 0], [0, 0, 1]]


@pytest.mark.parametrize("name,spec", [("fp", P128Pow5T3Fp), ("fq", P128Pow5T3Fq)])
def test_permute_vectors(name, spec):
    for tv in FIXTURES[name]["permute"]:
        assert permute(list(tv["initial"]), spec) == tv["final"]


@pytest.mark.parametrize("name,spec", [("fp", P128Pow5T3Fp), ("fq", P128Pow5T3Fq)])
def test_hash_vectors(name, spec):
    for tv in FIXTURES[name]["hash"]:
        got = poseidon_hash(list(tv["input"]), spec, ConstantLength(2))
        assert got == tv["output"]
