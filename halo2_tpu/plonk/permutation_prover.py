"""Permutation argument prover
(reference `halo2_proofs/src/plonk/permutation/prover.rs`).

Columns are chunked by (cs_degree - 2); each chunk gets a running-product z
with cross-chunk continuation via last_z; z polys are blinded, committed, and
evaluated at x, omega*x (and omega^last*x for non-final sets).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..poly import LAGRANGE, FVec, Polynomial, Rotation, eval_polynomial_host
from ..poly.commitment import Blind, ProverQuery
from .expression import ADVICE, FIXED, INSTANCE


@dataclass
class CommittedSet:
    poly: Polynomial  # coeff basis
    blind: Blind


@dataclass
class CommittedPermutation:
    sets: List[CommittedSet]


def commit_permutation(
    params,
    pk,
    advice_values: List[List[int]],
    fixed_values: List[List[int]],
    instance_values: List[List[int]],
    beta: int,
    gamma: int,
    rng,
    transcript,
) -> CommittedPermutation:
    domain = pk.vk.domain
    F = pk.vk.curve.SCALAR
    p = F.MODULUS
    n = params.n
    cs = pk.vk.cs
    assert pk.vk.cs_degree >= 3
    chunk_len = pk.vk.cs_degree - 2
    blinding = cs.blinding_factors()
    columns = cs.permutation.columns
    sigma_values = pk.permutation.permutations

    def column_values(column) -> List[int]:
        if column.kind == ADVICE:
            return advice_values[column.index]
        if column.kind == FIXED:
            return fixed_values[column.index]
        return instance_values[column.index]

    deltaomega_base = 1  # delta^(columns processed so far)
    last_z = 1
    sets = []
    delta = F.DELTA
    omega = domain.omega
    omega_powers = [1] * n
    for j in range(1, n):
        omega_powers[j] = omega_powers[j - 1] * omega % p

    for chunk_start in range(0, len(columns), chunk_len):
        cols = columns[chunk_start : chunk_start + chunk_len]
        sigmas = sigma_values[chunk_start : chunk_start + chunk_len]

        modified = [1] * n
        for col, sigma in zip(cols, sigmas):
            vals = column_values(col)
            for i in range(n):
                modified[i] = modified[i] * ((beta * sigma[i] + gamma + vals[i]) % p) % p
        # batch invert
        prefix = []
        acc = 1
        for m in modified:
            prefix.append(acc)
            acc = acc * m % p
        inv = pow(acc, -1, p)
        for i in range(n - 1, -1, -1):
            tmp = inv * prefix[i] % p
            inv = inv * modified[i] % p
            modified[i] = tmp
        # numerators
        d = deltaomega_base
        for col in cols:
            vals = column_values(col)
            for i in range(n):
                modified[i] = modified[i] * ((d * omega_powers[i] % p * beta + gamma + vals[i]) % p) % p
            d = d * delta % p
        deltaomega_base = d

        z = [last_z]
        for row in range(1, n):
            z.append(z[-1] * modified[row - 1] % p)
        for i in range(n - blinding, n):
            z[i] = F.random(rng).v
        last_z = z[n - (blinding + 1)]

        blind = Blind(F.random(rng).v)
        commitment = params.commit_lagrange(z, blind)
        z_poly = domain.lagrange_to_coeff(Polynomial(LAGRANGE, FVec.from_ints(F, z)))
        transcript.write_point(commitment)
        sets.append(CommittedSet(z_poly, blind))

    return CommittedPermutation(sets)


def evaluate_permutation(committed: CommittedPermutation, pk, x: int, transcript):
    """z evals at x, wx (+ w^last x for continuation sets) in one batched
    device kernel (reference permutation/prover.rs evaluate)."""
    import jax.numpy as jnp

    from ..ops.polyeval import batch_eval

    domain = pk.vk.domain
    F = pk.vk.curve.SCALAR
    blinding = pk.vk.cs.blinding_factors()
    x_next = domain.rotate_omega(x, Rotation(1))
    x_last = domain.rotate_omega(x, Rotation(-(blinding + 1)))
    stack, points = [], []
    for i, s in enumerate(committed.sets):
        vals = s.poly.vec.vals
        stack.extend([vals, vals])
        points.extend([x, x_next])
        if i + 1 < len(committed.sets):
            stack.append(vals)
            points.append(x_last)
    if stack:
        for v in batch_eval(F, jnp.stack(stack), points):
            transcript.write_scalar(F(v))
    return committed


def open_permutation(committed: CommittedPermutation, pk, x: int) -> List[ProverQuery]:
    domain = pk.vk.domain
    blinding = pk.vk.cs.blinding_factors()
    x_next = domain.rotate_omega(x, Rotation(1))
    x_last = domain.rotate_omega(x, Rotation(-(blinding + 1)))
    queries = []
    for s in committed.sets:
        queries.append(ProverQuery(x, s.poly, s.blind))
        queries.append(ProverQuery(x_next, s.poly, s.blind))
    for s in committed.sets[:-1][::-1]:
        queries.append(ProverQuery(x_last, s.poly, s.blind))
    return queries


def evaluate_permutation_common(pk, x: int, transcript) -> List[int]:
    """pk.permutation.evaluate: sigma poly evals at x (prover side),
    batched on device."""
    import jax.numpy as jnp

    from ..ops.polyeval import batch_eval

    F = pk.vk.curve.SCALAR
    if not pk.permutation.polys:
        return []
    stack = jnp.stack([poly.vec.vals for poly in pk.permutation.polys])
    evals = batch_eval(F, stack, [x] * len(pk.permutation.polys))
    for v in evals:
        transcript.write_scalar(F(v))
    return evals


def open_permutation_common(pk, x: int) -> List[ProverQuery]:
    return [ProverQuery(x, poly, Blind()) for poly in pk.permutation.polys]
