"""Fixed-base scalar mul tests via MockProver (reference
halo2_gadgets/src/ecc/chip/mul_fixed/{full_width,short,base_field_elem}.rs
tests and ecc/chip/constants.rs tests)."""

import random

import pytest

from halo2_tpu.curves import Pallas
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp, Fq
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.ecc_fixed import (
    H,
    NUM_WINDOWS,
    NUM_WINDOWS_SHORT,
    FixedPointBase,
    MulFixedBaseField,
    MulFixedConfig,
    MulFixedFullWidth,
    MulFixedShort,
    compute_lagrange_coeffs,
    compute_window_table,
    find_zs_and_us_cached,
)
from halo2_tpu.gadgets.utilities import LookupRangeCheckConfig, load_private
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import eval_polynomial_host

pytestmark = pytest.mark.slow

P = Fp.MODULUS
Q = Fq.MODULUS

_G = Pallas.generator()
_FULL = FixedPointBase(_G, NUM_WINDOWS)
_SHORT = FixedPointBase(_G, NUM_WINDOWS_SHORT)


# ---------------------------------------------------------------------------
# Host-side constant tests (constants.rs:175-228 test_lagrange_coeffs,
# :259-276 zs_and_us)
# ---------------------------------------------------------------------------


def test_lagrange_coeffs_interpolate_window_table():
    nw = 6  # prefix of windows is enough to exercise both formulas
    table = compute_window_table(_G, nw)
    coeffs = compute_lagrange_coeffs(_G, nw)
    for w in range(nw):
        for k in range(H):
            x = eval_polynomial_host(coeffs[w], k, P)
            assert x == table[w][k].xy[0], (w, k)


def test_zs_and_us_conditions():
    nw = 4
    # windows 0..nw-1 of the FULL 85-window table (the last window of a
    # truncated table uses the offset-correction formula and would not match)
    table = compute_window_table(_G, NUM_WINDOWS)[:nw]
    zs_us = find_zs_and_us_cached(_G, NUM_WINDOWS)[:nw]
    for w, (z, us) in enumerate(zs_us):
        for k in range(H):
            y = table[w][k].xy[1]
            assert us[k] * us[k] % P == (z + y) % P
            assert Fp((z - y) % P).sqrt() is None


def test_msb_window_offset_correction():
    """Sum over windows of [(k_w+2)*8^w]B plus the MSB window must equal
    [scalar]B (the defining property of the table; constants.rs:40-82)."""
    s = random.Random(5).randrange(Q)
    windows = [(s >> (3 * i)) & 7 for i in range(NUM_WINDOWS)]
    acc = Pallas.identity()
    for w in range(NUM_WINDOWS - 1):
        acc = acc + _G.mul((windows[w] + 2) * pow(H, w, Q) % Q)
    offset = sum(1 << (3 * j + 1) for j in range(NUM_WINDOWS - 1))
    acc = acc + _G.mul((windows[NUM_WINDOWS - 1] * pow(H, NUM_WINDOWS - 1, Q) - offset) % Q)
    assert acc == _G.mul(s)


# ---------------------------------------------------------------------------
# Circuit tests
# ---------------------------------------------------------------------------


class FixedMulCircuit(Circuit):
    """variant: 'full' | 'short' | 'base'."""

    variant = "full"

    def __init__(self, scalar=None, sign=1):
        self.scalar = scalar
        self.sign = sign

    def without_witnesses(self):
        c = type(self)()
        return c

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        ecc = EccChip.configure(meta, advices)
        lookup = None
        if cls.variant == "base":
            table_idx = meta.lookup_table_column()
            lookup = LookupRangeCheckConfig.configure(meta, advices[8], table_idx, 10, Fp)
        mf = MulFixedConfig(meta, ecc, lookup)
        return ecc, mf

    def synthesize(self, config, layouter: Layouter):
        ecc, mf = config
        chip = EccChip(ecc)
        val = Value.unknown() if self.scalar is None else Value.known(self.scalar)
        if self.variant == "full":
            result, _ = MulFixedFullWidth(mf, chip).assign(layouter, val, _FULL)
            if self.scalar is not None:
                assert result.point().force_value() == _G.mul(self.scalar)
        elif self.variant == "short":
            magnitude = load_private(layouter, ecc.advices[0], val)
            sign_v = (
                Value.unknown() if self.scalar is None
                else Value.known(1 if self.sign == 1 else P - 1)
            )
            sign = load_private(layouter, ecc.advices[1], sign_v)
            result, _ = MulFixedShort(mf, chip).assign(layouter, (magnitude, sign), _SHORT)
            if self.scalar is not None and self.scalar < (1 << 64):
                expected = _G.mul(self.scalar if self.sign == 1 else Q - self.scalar)
                assert result.point().force_value() == expected
        else:
            mf.lookup.load(layouter)
            alpha = load_private(layouter, ecc.advices[0], val)
            result = MulFixedBaseField(mf, chip).assign(layouter, alpha, _FULL)
            if self.scalar is not None:
                assert result.point().force_value() == _G.mul(self.scalar % Q)


class ShortMulCircuit(FixedMulCircuit):
    variant = "short"


class BaseFieldMulCircuit(FixedMulCircuit):
    variant = "base"


def test_mul_fixed_full_width():
    s = random.Random(7).randrange(1, Q)
    MockProver.run(7, FixedMulCircuit(s), []).assert_satisfied()


def test_mul_fixed_short():
    rng = random.Random(8)
    for magnitude, sign in [(rng.randrange(1, 1 << 64), 1),
                            ((1 << 64) - 1, -1),
                            (1, -1)]:
        MockProver.run(7, ShortMulCircuit(magnitude, sign), []).assert_satisfied()


def test_mul_fixed_short_overflow_fails():
    """Magnitude >= 2^64 must fail the decomposition."""
    prover = MockProver.run(7, ShortMulCircuit(1 << 64, 1), [])
    assert prover.verify(), "expected failure for 65-bit magnitude"


def test_mul_fixed_base_field():
    a = random.Random(9).randrange(1, P)
    MockProver.run(11, BaseFieldMulCircuit(a), []).assert_satisfied()
