"""Randomized property tests mirroring the reference's proptest suites
(SURVEY.md section 4 item 4):

  * `Assigned` rational arithmetic vs direct field semantics
    (plonk/assigned.rs:623 proptest),
  * selector compression correctness (compress_selectors.rs:276 proptest),
  * SHPLONK `construct_intermediate_sets` invariants
    (kzg/multiopen/shplonk.rs:242 proptest).

Fixed seeds play the role of committed proptest-regressions files."""

import random

import pytest

from halo2_tpu.fields import Fp
from halo2_tpu.plonk.assigned import Assigned, batch_invert_assigned
from halo2_tpu.plonk.constraint_system import ConstraintSystem
from halo2_tpu.plonk.expression import Constant
from halo2_tpu.poly import Rotation
from halo2_tpu.poly.kzg import construct_intermediate_sets_shplonk

P = Fp.MODULUS


# ---------------------------------------------------------------------------
# Assigned rational arithmetic
# ---------------------------------------------------------------------------


def _rand_assigned(rng):
    kind = rng.randrange(3)
    if kind == 0:
        return Assigned.zero()
    if kind == 1:
        return Assigned.trivial(rng.randrange(P))
    return Assigned(rng.randrange(P), rng.randrange(1, P))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_assigned_arithmetic_matches_field_semantics(seed):
    rng = random.Random(seed)
    for _ in range(300):
        a = _rand_assigned(rng)
        b = _rand_assigned(rng)
        av, bv = a.evaluate(P), b.evaluate(P)
        assert (a + b).evaluate(P) == (av + bv) % P
        assert (a - b).evaluate(P) == (av - bv) % P
        assert (a * b).evaluate(P) == av * bv % P
        assert (-a).evaluate(P) == (-av) % P
        assert a.square().evaluate(P) == av * av % P
        assert a.cube().evaluate(P) == pow(av, 3, P)
        inv = a.invert().evaluate(P)
        if av == 0:
            assert inv == 0  # inv0 semantics for deferred division
        else:
            assert inv * av % P == 1


def test_batch_invert_assigned_matches_serial():
    rng = random.Random(7)
    cols = [[_rand_assigned(rng) for _ in range(17)] for _ in range(3)]
    out = batch_invert_assigned(P, cols)
    for col, ocol in zip(cols, out):
        for a, v in zip(col, ocol):
            assert v == a.evaluate(P)


# ---------------------------------------------------------------------------
# Selector compression
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 11])
def test_selector_compression_roundtrip(seed):
    """Random selectors with random max degrees: the combination
    expressions substituted for each selector must reproduce the original
    0/1 activations on every row (compress_selectors.rs:276)."""
    rng = random.Random(seed)
    n = 32
    num_selectors = rng.randrange(2, 8)

    cs = ConstraintSystem()
    sels = [cs.selector() if rng.random() < 0.7 else cs.complex_selector()
            for _ in range(num_selectors)]
    adv = cs.advice_column()

    # one gate per selector with a random extra degree so compression sees
    # heterogeneous budgets
    for s in sels:
        def gate(cells, s=s, deg=rng.randrange(1, 4)):
            q = cells.query_selector(s)
            e = cells.query_advice(adv, Rotation(0))
            expr = q
            for _ in range(deg):
                expr = expr * e
            return [expr]

        cs.create_gate("g", gate)

    activations = [
        [rng.random() < 0.5 for _ in range(n)] for _ in range(num_selectors)
    ]
    # simple selectors must be exclusive per row for degree-aware packing?
    # (the reference handles arbitrary boolean assignments; ours too)
    new_fixed = cs.compress_selectors([list(a) for a in activations])

    # after compression, gates reference fixed queries via selector_map
    assert cs.num_selectors == num_selectors
    assert len(cs.selector_map) == num_selectors

    # Evaluate each selector's replacement expression on every row
    fixed_base = cs.num_fixed_columns - len(new_fixed)
    for s_idx, rows in enumerate(activations):
        expr = cs.selector_replacements[s_idx]
        for row in range(n):
            def fixed_val(q):
                col = q.column_index
                return new_fixed[col - fixed_base][row] if col >= fixed_base else 0

            v = expr.evaluate(
                constant=lambda c: c % P,
                selector=lambda s: (_ for _ in ()).throw(ValueError("selector")),
                fixed=lambda q: fixed_val(q),
                advice=lambda q: 0,
                instance=lambda q: 0,
                challenge=lambda c: 0,
                negated=lambda a: (-a) % P,
                sum_=lambda a, b: (a + b) % P,
                product=lambda a, b: a * b % P,
                scaled=lambda a, f: a * f % P,
            )
            assert (v % P == 1 if rows[row] else v % P == 0), (s_idx, row)


# ---------------------------------------------------------------------------
# SHPLONK intermediate sets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [5, 9])
def test_shplonk_intermediate_sets_invariants(seed):
    """Invariants from shplonk.rs:242 proptest: every commitment lands in
    exactly one rotation set whose point set equals the union of its query
    points; the super point set is the union of all points."""
    rng = random.Random(seed)
    num_commitments = rng.randrange(2, 8)
    points = [rng.randrange(P) for _ in range(5)]
    queries = []
    for c in range(num_commitments):
        for pt in rng.sample(points, rng.randrange(1, 5)):
            queries.append((c, pt, rng.randrange(P)))

    rotation_sets, super_points = construct_intermediate_sets_shplonk(
        queries,
        get_commitment_key=lambda q: q[0],
        get_point=lambda q: q[1],
        get_eval=lambda q: q[2],
    )

    assert super_points == sorted({q[1] for q in queries})

    seen = set()
    by_commitment = {}
    for q in queries:
        by_commitment.setdefault(q[0], set()).add(q[1])
    for pts, commitments in rotation_sets:
        assert list(pts) == sorted(pts)
        for key, evals in commitments:
            assert key not in seen
            seen.add(key)
            assert set(pts) == by_commitment[key]
            assert len(evals) == len(pts)
    assert seen == set(by_commitment)
