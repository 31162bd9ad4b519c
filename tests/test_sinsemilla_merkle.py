"""Merkle path gadget tests (reference
halo2_gadgets/src/sinsemilla/merkle.rs tests)."""

import random

import pytest

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.sinsemilla import SinsemillaChip
from halo2_tpu.gadgets.sinsemilla_merkle import (
    MerkleChip,
    MerklePath,
    merkle_crh,
    merkle_crh_domain,
    merkle_layer_words,
)
from halo2_tpu.gadgets.sinsemilla_primitives import K
from halo2_tpu.gadgets.utilities import LookupRangeCheckConfig, i2lebsp, load_private
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow

P = Fp.MODULUS
DEPTH = 2

_DOMAIN = merkle_crh_domain()


def test_merkle_layer_words_roundtrip():
    rng = random.Random(3)
    left = rng.randrange(1 << 255)
    right = rng.randrange(1 << 255)
    words = merkle_layer_words(5, left, right)
    assert len(words) == 52 and all(0 <= w < (1 << K) for w in words)
    msg = 0
    for i, w in enumerate(words):
        msg |= w << (K * i)
    assert msg & ((1 << K) - 1) == 5
    assert (msg >> K) & ((1 << 255) - 1) == left
    assert msg >> (K + 255) == right


def _host_root(leaf, pos, path):
    node = leaf
    for l, sibling in enumerate(path):
        bit = (pos >> l) & 1
        left, right = (sibling, node) if bit else (node, sibling)
        node = merkle_crh(_DOMAIN, l, left, right)
    return node


class MerkleCircuit(Circuit):
    def __init__(self, leaf=None, pos=None, path=None, expected_root=None):
        self.leaf = leaf
        self.pos = pos
        self.path = path or [None] * DEPTH
        self.expected_root = expected_root

    def without_witnesses(self):
        return MerkleCircuit()

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        ecc_advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        ecc = EccChip.configure(meta, ecc_advices)
        sin_advices = [meta.advice_column() for _ in range(3)]
        sin = SinsemillaChip.configure(meta, sin_advices, ecc)
        # 10-bit lookup range check sharing the generator index table
        # (reference SinsemillaConfig bundles a LookupRangeCheckConfig on
        # the same table_idx column, sinsemilla/chip.rs).
        lookup_col = meta.advice_column()
        lookup = LookupRangeCheckConfig.configure(meta, lookup_col, sin.table_idx, K, Fp)
        merkle_advices = [meta.advice_column() for _ in range(5)]
        merkle = MerkleChip.configure(meta, merkle_advices, sin, lookup)
        return merkle

    def synthesize(self, config, layouter: Layouter):
        chip = MerkleChip(config)
        chip.sinsemilla.load_table(layouter)
        val = Value.unknown() if self.leaf is None else Value.known(self.leaf)
        leaf = load_private(layouter, config.advices[0], val)
        path = MerklePath(chip, _DOMAIN, self.pos, self.path)
        root = path.calculate_root(layouter, leaf)
        if self.expected_root is not None:
            rv = root.value()
            assert not rv.is_none()
            from halo2_tpu.gadgets.poseidon import _as_int

            assert _as_int(rv.force_value(), P) == self.expected_root % P


def test_merkle_path_mock():
    # node values are field elements (non-canonical 255-bit encodings are
    # deliberately not constrained, merkle/chip.rs:51-53; the host oracle
    # must see the same reduced values the circuit sees)
    rng = random.Random(21)
    leaf = rng.randrange(P)
    path = [rng.randrange(P) for _ in range(DEPTH)]
    pos = rng.randrange(1 << DEPTH)
    root = _host_root(leaf, pos, path)
    MockProver.run(
        11, MerkleCircuit(leaf, pos, path, root), []
    ).assert_satisfied()
