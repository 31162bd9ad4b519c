"""Utility gadget tests through MockProver (mirrors the reference's
cond_swap/decompose_running_sum/lookup_range_check in-module tests)."""

import random

import pytest

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.utilities import (
    CondSwapChip,
    LookupRangeCheckConfig,
    RunningSumConfig,
    bitrange_subset,
    decompose_word,
    i2lebsp,
    lebs2ip,
    load_private,
)
from halo2_tpu.plonk import ConstraintSystem

P = Fp.MODULUS


def test_bit_helpers():
    v = 0b1101_0110_1001
    assert bitrange_subset(v, 0, 4) == 0b1001
    assert bitrange_subset(v, 4, 8) == 0b0110
    assert decompose_word(v, 12, 3) == [0b001, 0b101, 0b101, 0b110]
    # recomposition
    words = decompose_word(v, 12, 3)
    assert sum(w << (3 * i) for i, w in enumerate(words)) == v
    bits = i2lebsp(v, 12)
    assert lebs2ip(bits) == v


class SwapCircuit(Circuit):
    def __init__(self, a=None, b=None, swap=None):
        self.a, self.b, self.swap_flag = a, b, swap

    def without_witnesses(self):
        return SwapCircuit()

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advices = [meta.advice_column() for _ in range(5)]
        return CondSwapChip.configure(meta, advices)

    def synthesize(self, config, layouter: Layouter):
        chip = CondSwapChip(config, Fp)
        a = load_private(
            layouter, config.a,
            Value.unknown() if self.a is None else Value.known(self.a),
        )
        b = Value.unknown() if self.b is None else Value.known(self.b)
        sw = Value.unknown() if self.swap_flag is None else Value.known(self.swap_flag)
        a_sw, b_sw = chip.swap(layouter, (a, b), sw)
        if self.a is not None:
            from halo2_tpu.gadgets.poseidon import _as_int

            exp_a, exp_b = (self.b, self.a) if self.swap_flag else (self.a, self.b)
            assert _as_int(a_sw.value().force_value(), P) == exp_a % P
            assert _as_int(b_sw.value().force_value(), P) == exp_b % P


@pytest.mark.parametrize("swap", [False, True])
def test_cond_swap(swap):
    MockProver.run(4, SwapCircuit(11, 22, swap), []).assert_satisfied()


class RunningSumCircuit(Circuit):
    WORD_BITS = 12
    WINDOW = 3

    def __init__(self, alpha=None, strict=True):
        self.alpha = alpha
        self.strict = strict

    def without_witnesses(self):
        return RunningSumCircuit(None, self.strict)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        z = meta.advice_column()
        q = meta.selector()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return RunningSumConfig.configure(meta, q, z, cls.WINDOW, Fp)

    def synthesize(self, config, layouter: Layouter):
        num_windows = self.WORD_BITS // self.WINDOW

        def in_region(region):
            alpha = Value.unknown() if self.alpha is None else Value.known(self.alpha)
            config.witness_decompose(
                region, 0, alpha, self.strict, self.WORD_BITS, num_windows
            )

        layouter.assign_region("decompose", in_region)


def test_running_sum_ok():
    MockProver.run(6, RunningSumCircuit(0xABC), []).assert_satisfied()


def test_running_sum_overflow_fails():
    # alpha with more than WORD_BITS bits must fail the strict z_W == 0 check
    prover = MockProver.run(6, RunningSumCircuit((1 << 12) + 5), [])
    assert prover.verify(), "expected failures for overflowing word"


class LookupRCCircuit(Circuit):
    K = 4

    def __init__(self, element=None, num_words=3, short_bits=None):
        self.element = element
        self.num_words = num_words
        self.short_bits = short_bits

    def without_witnesses(self):
        return LookupRCCircuit(None, self.num_words, self.short_bits)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        running_sum = meta.advice_column()
        table_idx = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return LookupRangeCheckConfig.configure(meta, running_sum, table_idx, cls.K, Fp)

    def synthesize(self, config, layouter: Layouter):
        config.load(layouter)
        value = Value.unknown() if self.element is None else Value.known(self.element)
        if self.short_bits is not None:
            config.witness_short_check(layouter, value, self.short_bits)
        else:
            config.witness_check(layouter, value, self.num_words, True)


def test_lookup_range_check_ok():
    MockProver.run(6, LookupRCCircuit(0xABC), []).assert_satisfied()


def test_lookup_range_check_overflow_fails():
    prover = MockProver.run(6, LookupRCCircuit((1 << 12) + 1), [])
    assert prover.verify(), "expected failures for out-of-range element"


def test_lookup_short_range_check_ok():
    MockProver.run(6, LookupRCCircuit(5, short_bits=3), []).assert_satisfied()


def test_lookup_short_range_check_fails():
    prover = MockProver.run(6, LookupRCCircuit(9, short_bits=3), [])
    assert prover.verify(), "9 does not fit in 3 bits"
