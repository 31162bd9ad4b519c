"""Bit-exactness against the Rust reference's pinned verification key
(tests/plonk_api.rs:624-1006): IPA params on Vesta (hash_to_curve), keygen
(selector-free standard PLONK + lookup + heavy equality), MSM commitments,
and permutation sigmas must all reproduce the reference exactly."""

import os
import re

import pytest

from plonk_api_circuit import PlonkApiCircuit, plonk_api_inputs

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_vk
from halo2_tpu.poly.ipa import ParamsIPA

pytestmark = pytest.mark.slow

K = 5

_FIXTURE = open(
    os.path.join(os.path.dirname(__file__), "fixtures_plonk_api_vk.txt")
).read()


def _parse_points(section: str):
    block = _FIXTURE.split(section)[1]
    pts = re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", block)
    return [(int(x, 16), int(y, 16)) for x, y in pts]


def _keygen():
    _, _, lookup_table = plonk_api_inputs()
    params = ParamsIPA.cached(Vesta, K)
    return params, keygen_vk(params, PlonkApiCircuit(None, lookup_table))


def test_params_w_matches_pinned_sf_commitment():
    """fixed_commitments[0] is [1]W (sf never assigned): a direct
    hash_to_curve oracle for Vesta."""
    params = ParamsIPA.cached(Vesta, K)
    pinned = _parse_points("fixed_commitments: [")
    assert (params.w.xy[0], params.w.xy[1]) == pinned[0]


def test_fixed_commitments_match_pinned():
    params, vk = _keygen()
    pinned = _parse_points("fixed_commitments: [")[:7]
    ours = [(c.xy[0], c.xy[1]) if not c.is_identity() else (0, 0)
            for c in vk.fixed_commitments]
    assert len(ours) == 7
    for i, (got, want) in enumerate(zip(ours, pinned)):
        assert got == want, f"fixed commitment {i} mismatch"


def test_permutation_commitments_match_pinned():
    params, vk = _keygen()
    pinned = _parse_points("permutation: VerifyingKey {")[:12]
    ours = [(c.xy[0], c.xy[1]) for c in vk.permutation.commitments]
    assert len(ours) == 12
    for i, (got, want) in enumerate(zip(ours, pinned)):
        assert got == want, f"permutation commitment {i} mismatch"


def test_cs_shape_matches_pinned():
    params, vk = _keygen()
    cs = vk.cs
    assert cs.num_fixed_columns == 7
    assert cs.num_advice_columns == 5
    assert cs.num_instance_columns == 1
    assert cs.num_selectors == 0
    # advice query allocation order (enable_equality allocates cur queries)
    assert [(c.index, r.i) for c, r in cs.advice_queries] == [
        (1, 0), (2, 0), (3, 0), (4, 1), (0, -1), (0, 0), (4, 0)
    ]
    assert [(c.index, r.i) for c, r in cs.fixed_queries] == [
        (6, 0), (0, 0), (2, 0), (3, 0), (4, 0), (1, 0), (5, 0)
    ]
    assert [(c.index, r.i) for c, r in cs.instance_queries] == [(0, 0)]
    kinds = {"advice": "A", "fixed": "F", "instance": "I"}
    perm = [(c.kind, c.index) for c in cs.permutation.columns]
    assert perm == [
        ("advice", 1), ("advice", 2), ("advice", 3), ("fixed", 0),
        ("advice", 0), ("advice", 4), ("instance", 0), ("fixed", 1),
        ("fixed", 2), ("fixed", 3), ("fixed", 4), ("fixed", 5),
    ]


def test_domain_matches_pinned():
    params, vk = _keygen()
    assert vk.domain.k == 5
    assert vk.domain.extended_k == 7
    m = re.search(r"omega: 0x([0-9a-f]+)", _FIXTURE)
    assert vk.domain.omega == int(m.group(1), 16)


def test_pinned_vk_string_byte_exact():
    """Our Rust-Debug renderer reproduces format!("{:#?}", vk.pinned())
    byte-for-byte; transcript_repr hashes the compact form of the same
    tree (plonk.rs:301-313)."""
    params, vk = _keygen()
    assert vk.pinned_repr(pretty=True) == _FIXTURE
    compact = vk.pinned_repr(pretty=False)
    assert "\n" not in compact and compact.startswith("PinnedVerificationKey {")
