"""SHA-256 Table16 gadget tests (reference halo2_gadgets/src/sha256 tests).

The full circuit needs the 2^16-row spread table (k=17); MockProver's
vectorized verify path keeps that tractable. Host helpers are validated
against hashlib."""

import hashlib

import pytest

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.sha256 import (
    IV,
    MASK32,
    Sha256,
    Table16Chip,
    _sigma_coeffs,
    _sigma_host,
    _SIGMA_DEFS,
    even_odd_bits,
    sha256_host_blocks,
    sha256_pad,
    spread_bits,
)
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow


def _ref_digest(msg: bytes):
    h = hashlib.sha256(msg).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") for i in range(8)]


def test_host_sha256_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 100, bytes(range(256))):
        blocks = sha256_pad(msg)
        assert sha256_host_blocks(blocks) == _ref_digest(msg)


def test_spread_even_odd_roundtrip():
    x, y = 0xBEEF, 0x1234
    s = spread_bits(x) + spread_bits(y)
    even, odd = even_odd_bits(s, 16)
    assert even == x ^ y
    assert odd == x & y


def test_sigma_coeffs_match_host():
    """Spread-space sums with the derived coefficients must have the sigma
    value as their even bit plane."""
    import random

    rng = random.Random(5)
    for name, (widths, rots, shifts) in _SIGMA_DEFS.items():
        coeffs = _sigma_coeffs(widths, rots, shifts)
        for _ in range(20):
            x = rng.randrange(1 << 32)
            total = 0
            off = 0
            for w, c in zip(widths, coeffs):
                piece = (x >> off) & ((1 << w) - 1)
                total += spread_bits(piece, w) * c
                off += w
            even, _odd = even_odd_bits(total, 32)
            assert even == _sigma_host(x, name), name


class ShaCircuit(Circuit):
    NUM_BLOCKS = 1

    def __init__(self, message=None):
        self.message = message

    def without_witnesses(self):
        return ShaCircuit()

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return Table16Chip.configure(meta)

    def synthesize(self, config, layouter: Layouter):
        chip = Table16Chip(config)
        chip.load_table(layouter)
        digest = Sha256(chip).digest_bytes(layouter, self.message, self.NUM_BLOCKS)
        if self.message is not None:
            expected = _ref_digest(self.message)
            got = [d.value for d in digest]
            assert got == expected, (got, expected)


@pytest.mark.slow
def test_sha256_circuit_abc():
    prover = MockProver.run(17, ShaCircuit(b"abc"), [])
    failures = prover.verify(vectorized=True)
    assert not failures, "\n".join(str(f) for f in failures[:10])

    # corruption must be caught (constraints actually bite)
    for row, v in enumerate(prover.advice[0]):
        if isinstance(v, tuple) and v[0] == "assigned" and v[1] not in (0, 1):
            prover.advice[0][row] = ("assigned", (v[1] + 1) % prover.p)
            break
    assert prover.verify(vectorized=True), "corrupted witness passed"
