"""Lookup argument prover (reference `halo2_proofs/src/plonk/lookup/prover.rs`).

commit_permuted: theta-compress input/table expressions, sort/permute the
pair (permute_expression_pair: sorted inputs; table counts via map; repeats
filled with leftovers), commit A' and S'. commit_product: grand product Z
with batch-inverted denominators. evaluate: five transcript evals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

from ..fields import FieldElement
from ..poly import LAGRANGE, FVec, Polynomial, Rotation, eval_polynomial_host
from ..poly.commitment import Blind, ProverQuery
from .error import ConstraintSystemFailure
from .evaluation import evaluate_expr_rows


@dataclass
class PermutedLookup:
    compressed_input: List[int]
    permuted_input: List[int]
    permuted_input_poly: Polynomial
    permuted_input_blind: Blind
    compressed_table: List[int]
    permuted_table: List[int]
    permuted_table_poly: Polynomial
    permuted_table_blind: Blind


@dataclass
class CommittedLookup:
    permuted_input_poly: Polynomial
    permuted_input_blind: Blind
    permuted_table_poly: Polynomial
    permuted_table_blind: Blind
    product_poly: Polynomial
    product_blind: Blind


def commit_permuted(
    argument,
    pk,
    params,
    domain,
    theta: int,
    advice_values: List[List[int]],
    fixed_values: List[List[int]],
    instance_values: List[List[int]],
    challenges: List[int],
    rng,
    transcript,
) -> PermutedLookup:
    F = params.curve.SCALAR
    p = F.MODULUS
    n = params.n

    def compress(expressions) -> List[int]:
        acc = [0] * n
        for expr in expressions:
            vals = evaluate_expr_rows(
                expr, n, p, fixed_values, advice_values, instance_values, challenges
            )
            acc = [(a * theta + v) % p for a, v in zip(acc, vals)]
        return acc

    compressed_input = compress(argument.input_expressions)
    compressed_table = compress(argument.table_expressions)
    permuted_input, permuted_table = permute_expression_pair(
        pk, params, rng, compressed_input, compressed_table
    )

    def commit_values(values: List[int]):
        lag = Polynomial(LAGRANGE, FVec.from_ints(F, values))
        poly = domain.lagrange_to_coeff(lag)
        blind = Blind(F.random(rng).v)
        commitment = params.commit_lagrange(values, blind)
        return poly, blind, commitment

    pi_poly, pi_blind, pi_c = commit_values(permuted_input)
    pt_poly, pt_blind, pt_c = commit_values(permuted_table)
    transcript.write_point(pi_c)
    transcript.write_point(pt_c)
    return PermutedLookup(
        compressed_input, permuted_input, pi_poly, pi_blind,
        compressed_table, permuted_table, pt_poly, pt_blind,
    )


def permute_expression_pair(pk, params, rng, input_expression, table_expression):
    """Sort inputs; align table values (reference lookup/prover.rs:392-460)."""
    F = params.curve.SCALAR
    blinding = pk.vk.cs.blinding_factors()
    usable_rows = params.n - (blinding + 1)

    permuted_input = sorted(input_expression[:usable_rows])
    leftover: Dict[int, int] = {}
    for v in table_expression[:usable_rows]:
        leftover[v] = leftover.get(v, 0) + 1
    permuted_table = [0] * usable_rows
    repeated_rows = []
    for row, v in enumerate(permuted_input):
        if row == 0 or v != permuted_input[row - 1]:
            permuted_table[row] = v
            if leftover.get(v, 0) > 0:
                leftover[v] -= 1
            else:
                raise ConstraintSystemFailure(f"lookup input {v} not in table")
        else:
            repeated_rows.append(row)
    # fill repeats with leftovers (BTreeMap iteration = sorted by key)
    for coeff in sorted(leftover.keys()):
        for _ in range(leftover[coeff]):
            permuted_table[repeated_rows.pop()] = coeff
    assert not repeated_rows

    permuted_input += [F.random(rng).v for _ in range(blinding + 1)]
    permuted_table += [F.random(rng).v for _ in range(blinding + 1)]
    return permuted_input, permuted_table


def commit_product(
    permuted: PermutedLookup, pk, params, domain, beta: int, gamma: int, rng, transcript
) -> CommittedLookup:
    F = params.curve.SCALAR
    p = F.MODULUS
    n = params.n
    blinding = pk.vk.cs.blinding_factors()

    denom = [
        (beta + pi) * (gamma + pt) % p
        for pi, pt in zip(permuted.permuted_input, permuted.permuted_table)
    ]
    denom_inv = [pow(d, -1, p) if d else 0 for d in denom]
    product = [
        di * (ci + beta) % p * (ct + gamma) % p
        for di, ci, ct in zip(denom_inv, permuted.compressed_input, permuted.compressed_table)
    ]
    z = [1]
    for i in range(n - blinding - 1):
        z.append(z[-1] * product[i] % p)
    z += [F.random(rng).v for _ in range(blinding)]
    assert len(z) == n

    product_blind = Blind(F.random(rng).v)
    product_commitment = params.commit_lagrange(z, product_blind)
    z_poly = domain.lagrange_to_coeff(Polynomial(LAGRANGE, FVec.from_ints(F, z)))
    transcript.write_point(product_commitment)
    return CommittedLookup(
        permuted.permuted_input_poly, permuted.permuted_input_blind,
        permuted.permuted_table_poly, permuted.permuted_table_blind,
        z_poly, product_blind,
    )


@dataclass
class EvaluatedLookup:
    constructed: CommittedLookup


def evaluate_lookup(committed: CommittedLookup, pk, x: int, transcript) -> EvaluatedLookup:
    """z/a'/s' evals at x, wx, w^-1 x in one batched device kernel
    (reference lookup/prover.rs:365-390)."""
    import jax.numpy as jnp

    from ..ops.polyeval import batch_eval

    domain = pk.vk.domain
    F = pk.vk.curve.SCALAR
    x_inv = domain.rotate_omega(x, Rotation(-1))
    x_next = domain.rotate_omega(x, Rotation(1))
    prod = committed.product_poly.vec.vals
    pin = committed.permuted_input_poly.vec.vals
    ptab = committed.permuted_table_poly.vec.vals
    stack = jnp.stack([prod, prod, pin, pin, ptab])
    for v in batch_eval(F, stack, [x, x_next, x, x_inv, x]):
        transcript.write_scalar(F(v))
    return EvaluatedLookup(committed)


def open_lookup(evaluated: EvaluatedLookup, pk, x: int) -> List[ProverQuery]:
    domain = pk.vk.domain
    x_inv = domain.rotate_omega(x, Rotation(-1))
    x_next = domain.rotate_omega(x, Rotation(1))
    c = evaluated.constructed
    return [
        ProverQuery(x, c.product_poly, c.product_blind),
        ProverQuery(x, c.permuted_input_poly, c.permuted_input_blind),
        ProverQuery(x, c.permuted_table_poly, c.permuted_table_blind),
        ProverQuery(x_inv, c.permuted_input_poly, c.permuted_input_blind),
        ProverQuery(x_next, c.product_poly, c.product_blind),
    ]
