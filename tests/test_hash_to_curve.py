"""Byte-exact hash_to_curve validation against reference-captured
SINSEMILLA_S vectors (sampled from
halo2_gadgets/src/sinsemilla/primitives/sinsemilla_s.rs, the output of
pasta_curves' hash_to_curve("z.cash:SinsemillaS") on LE32 indices)."""

import json
import os

import pytest

from halo2_tpu.curves import Pallas
from halo2_tpu.fields import Fp
from halo2_tpu.gadgets.sinsemilla_primitives import S_PERSONALIZATION, sinsemilla_s
from halo2_tpu.hash_to_curve import hash_to_curve, hash_to_field

FIXTURES = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures_sinsemilla_s.json"))
)


def test_sinsemilla_s_byte_exact():
    hasher = hash_to_curve(Pallas, S_PERSONALIZATION)
    for j_str, (xh, yh) in FIXTURES.items():
        j = int(j_str)
        pt = hasher(j.to_bytes(4, "little"))
        assert pt.xy == (int(xh, 16), int(yh, 16)), f"S[{j}] mismatch"


def test_sinsemilla_s_table_matches_fixture():
    S = sinsemilla_s()
    for j_str, (xh, yh) in FIXTURES.items():
        assert S[int(j_str)].xy == (int(xh, 16), int(yh, 16))


def test_hash_to_field_big_endian_reduction():
    """RFC 9380 OS2IP is big-endian; regression guard for the reduction
    direction."""
    u0, u1 = hash_to_field(Pallas, "z.cash:SinsemillaS", (0).to_bytes(4, "little"))
    assert 0 < u0.v < Fp.MODULUS and 0 < u1.v < Fp.MODULUS
    # pin the derived values (computed from the validated pipeline)
    hasher = hash_to_curve(Pallas, S_PERSONALIZATION)
    pt = hasher((0).to_bytes(4, "little"))
    assert pt.xy == tuple(int(v, 16) for v in FIXTURES["0"])
