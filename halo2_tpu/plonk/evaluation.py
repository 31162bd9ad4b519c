"""Quotient (h) polynomial evaluation engine.

TPU-native counterpart of the reference's `plonk/evaluation.rs`: all gate,
permutation, and lookup constraints are evaluated over the extended coset
domain as batched device tensor programs (FVec ops lower to XLA), folded with
powers of y in exactly the verifier's expression order
(`plonk/verifier.rs:245-327`, `permutation/verifier.rs:115-196`,
`lookup/verifier.rs:80-167`).

This v1 engine materializes full extended-domain vectors (the reference's
memory-optimized *part-wise* walk - evaluation.rs:394-975 - is the planned
sharding axis; the domain layer already provides `coeff_to_extended_part` /
`lagrange_vecs_to_extended` for it).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from ..poly import COEFF, EXTENDED, LAGRANGE, FVec, Polynomial, Rotation
from ..ops.ntt import powers
from .expression import ADVICE, FIXED, INSTANCE, Expression


def evaluate_expr_rows(
    expr: Expression,
    n: int,
    p: int,
    fixed: List[List[int]],
    advice: List[List[int]],
    instance: List[List[int]],
    challenges: List[int],
) -> List[int]:
    """Evaluate an expression over all n rows of Lagrange-basis columns with
    wrapping rotations (reference plonk/evaluation.rs free `evaluate`)."""

    def rot(col: List[int], r: int) -> List[int]:
        if r == 0:
            return col
        return col[r % n :] + col[: r % n]

    return expr.evaluate(
        constant=lambda c: [c % p] * n,
        selector=lambda s: (_ for _ in ()).throw(
            ValueError("virtual selectors are removed during optimization")
        ),
        fixed=lambda q: rot(fixed[q.column_index], q.rotation.i),
        advice=lambda q: rot(advice[q.column_index], q.rotation.i),
        instance=lambda q: rot(instance[q.column_index], q.rotation.i),
        challenge=lambda c: [challenges[c.index]] * n,
        negated=lambda a: [(-x) % p for x in a],
        sum_=lambda a, b: [(x + y) % p for x, y in zip(a, b)],
        product=lambda a, b: [(x * y) % p for x, y in zip(a, b)],
        scaled=lambda a, f: [(x * f) % p for x in a],
    )


class Evaluator:
    """Extended-domain constraint evaluator bound to a proving key."""

    def __init__(self, pk):
        self.pk = pk
        self.domain = pk.vk.domain
        self.field = pk.vk.curve.SCALAR

    def evaluate_h(
        self,
        advice_polys: List[List[Polynomial]],
        instance_polys: List[List[Polynomial]],
        challenges: List[int],
        y: int,
        beta: int,
        gamma: int,
        theta: int,
        lookups: List[List],
        permutations: List,
    ) -> Polynomial:
        """Dispatch: part-wise walk (the fork's memory-optimized engine,
        default) or the full extended-domain fold (EVAL_H=full)."""
        import os

        if os.environ.get("EVAL_H", "parts") == "full":
            return self.evaluate_h_full(
                advice_polys, instance_polys, challenges, y, beta, gamma,
                theta, lookups, permutations,
            )
        return self.evaluate_h_parts(
            advice_polys, instance_polys, challenges, y, beta, gamma, theta,
            lookups, permutations,
        )

    def evaluate_h_parts(
        self,
        advice_polys: List[List[Polynomial]],
        instance_polys: List[List[Polynomial]],
        challenges: List[int],
        y: int,
        beta: int,
        gamma: int,
        theta: int,
        lookups: List[List],
        permutations: List,
    ) -> Polynomial:
        """Part-wise quotient evaluation (reference plonk/evaluation.rs
        :394-975 + domain.rs:314-495): walk the extended domain in
        extended_n/n parts, materializing only O(n) coset evaluations per
        column per part. Part i holds the evaluations at
        zeta * ext_omega^i * omega^t, so base-row rotations act within a
        part as plain rolls, and the per-part coset abscissa is
        (zeta * ext_omega^i) * omega^t."""
        pk = self.pk
        domain = self.domain
        F = self.field
        p = F.MODULUS
        cs = pk.vk.cs
        n = domain.n
        m = domain.extended_n >> domain.k

        blinding = cs.blinding_factors()
        last_rotation = -(blinding + 1)
        chunk_len = pk.vk.cs_degree - 2
        delta = F.DELTA

        # ---- collect the (part-invariant) poly list in deterministic order
        # so the whole per-part fold can be traced ONCE and jit-executed per
        # part (the part only changes the coset factor / input arrays).
        num_proofs = len(advice_polys)
        poly_list: List[Polynomial] = []
        poly_list.extend(pk.fixed_polys)
        n_fixed = len(pk.fixed_polys)
        poly_list.extend([pk.l0, pk.l_last, pk.l_active_row])
        sigma_base = len(poly_list)
        poly_list.extend(pk.permutation.polys)
        layout = []  # per-proof offsets
        for proof_idx in range(num_proofs):
            entry = {"advice": len(poly_list)}
            poly_list.extend(advice_polys[proof_idx])
            entry["instance"] = len(poly_list)
            poly_list.extend(instance_polys[proof_idx])
            entry["z"] = len(poly_list)
            poly_list.extend([s.poly for s in permutations[proof_idx].sets])
            entry["lookups"] = len(poly_list)
            for committed in lookups[proof_idx]:
                poly_list.extend([
                    committed.product_poly,
                    committed.permuted_input_poly,
                    committed.permuted_table_poly,
                ])
            layout.append(entry)

        n_sigma = len(pk.permutation.polys)
        num_lookups = tuple(len(lk) for lk in lookups)
        num_sets = tuple(len(pm.sets) for pm in permutations)
        num_ch = len(challenges)

        def fold_fn(arrays, coset_x_vals, scal):
            """The full per-part constraint fold over raw jnp arrays; traced
            once per proving-key structure (reference evaluation.rs:442-973).
            Fiat-Shamir scalars arrive as traced Montgomery limb arrays so
            the compiled program is reused across proofs."""
            vecs = [FVec(F, a) for a in arrays]
            fixed_ext = vecs[:n_fixed]
            l0, l_last, l_active = vecs[n_fixed:n_fixed + 3]
            sigma_ext = vecs[sigma_base:sigma_base + n_sigma]
            coset_x = FVec(F, coset_x_vals)
            # (NLIMBS,)-shaped scalars broadcast against (n, NLIMBS) columns
            y_s = FVec(F, scal["y"])
            beta_s = FVec(F, scal["beta"])
            gamma_s = FVec(F, scal["gamma"])
            theta_s = FVec(F, scal["theta"])
            ch_s = [FVec(F, c) for c in scal["ch"]]

            def rot(vec: FVec, r: int) -> FVec:
                return vec.rotate(r)

            def const_vec(c: int) -> FVec:
                return FVec.fill(F, n, c)

            one = const_vec(1)
            h: List[Optional[FVec]] = [None]

            def fold(value: FVec):
                h[0] = value if h[0] is None else h[0] * y_s + value

            def eval_expr(expr: Expression, advice_ext, instance_ext) -> FVec:
                return expr.evaluate(
                    constant=lambda c: const_vec(c),
                    selector=lambda s: (_ for _ in ()).throw(
                        ValueError("virtual selector in evaluate_h")
                    ),
                    fixed=lambda q: rot(fixed_ext[q.column_index], q.rotation.i),
                    advice=lambda q: rot(advice_ext[q.column_index], q.rotation.i),
                    instance=lambda q: rot(instance_ext[q.column_index], q.rotation.i),
                    challenge=lambda c: ch_s[c.index],
                    negated=lambda a: -a,
                    sum_=lambda a, b: a + b,
                    product=lambda a, b: a * b,
                    scaled=lambda a, f: a * F(f),
                )

            for proof_idx in range(num_proofs):
                entry = layout[proof_idx]
                advice_ext = vecs[entry["advice"]:entry["instance"]]
                instance_ext = vecs[entry["instance"]:entry["z"]]
                z_ext = vecs[entry["z"]:entry["lookups"]]

                for gate in cs.gates:
                    for poly in gate.polys:
                        fold(eval_expr(poly, advice_ext, instance_ext))

                if z_ext:
                    fold(l0 * (one - z_ext[0]))
                    zl = z_ext[-1]
                    fold(l_last * (zl * zl - zl))
                    for i in range(1, len(z_ext)):
                        fold(l0 * (z_ext[i] - rot(z_ext[i - 1], last_rotation)))
                    columns = cs.permutation.columns
                    for chunk_index in range(len(z_ext)):
                        cols = columns[chunk_index * chunk_len : (chunk_index + 1) * chunk_len]
                        sigmas = sigma_ext[chunk_index * chunk_len : (chunk_index + 1) * chunk_len]
                        left = rot(z_ext[chunk_index], 1)
                        for col, sigma in zip(cols, sigmas):
                            cv = self._column_part(col, fixed_ext, advice_ext, instance_ext)
                            left = left * (cv + sigma * beta_s + gamma_s)
                        right = z_ext[chunk_index]
                        for j, col in enumerate(cols):
                            # beta * delta^(chunk*len + j), delta power static
                            cur_s = beta_s * F(pow(delta, chunk_index * chunk_len + j, p))
                            cv = self._column_part(col, fixed_ext, advice_ext, instance_ext)
                            right = right * (cv + coset_x * cur_s + gamma_s)
                        fold(l_active * (left - right))

                off = entry["lookups"]
                for lk_idx in range(num_lookups[proof_idx]):
                    argument = cs.lookups[lk_idx]
                    z, a_prime, s_prime = vecs[off + 3 * lk_idx : off + 3 * lk_idx + 3]
                    fold(l0 * (one - z))
                    fold(l_last * (z * z - z))

                    def compress(expressions):
                        acc = const_vec(0)
                        for e in expressions:
                            acc = acc * theta_s + eval_expr(e, advice_ext, instance_ext)
                        return acc

                    inp = compress(argument.input_expressions)
                    tab = compress(argument.table_expressions)
                    left = rot(z, 1) * (a_prime + beta_s) * (s_prime + gamma_s)
                    right = z * (inp + beta_s) * (tab + gamma_s)
                    fold(l_active * (left - right))
                    fold(l0 * (a_prime - s_prime))
                    fold(l_active * (a_prime - s_prime) * (a_prime - rot(a_prime, -1)))

            assert h[0] is not None, "no constraints to evaluate"
            return h[0].vals

        import jax

        # the traced structure depends only on the pk + proof shape: cache
        # the compiled fold ON THE PK (the prover constructs a fresh
        # Evaluator per proof) so later proofs skip tracing/compilation
        cache_key = (num_proofs, num_lookups, num_sets, num_ch, n)
        cache = pk.__dict__.setdefault("_evalh_fold_cache", {})
        if cache_key not in cache:
            cache[cache_key] = jax.jit(fold_fn)
        fold_jit = cache[cache_key]

        ctx = domain.ctx
        scal = {
            "y": ctx.const(y),
            "beta": ctx.const(beta),
            "gamma": ctx.const(gamma),
            "theta": ctx.const(theta),
            "ch": [ctx.const(c) for c in challenges],
        }

        pw = powers(domain.omega, n, ctx)
        part_results: List[Polynomial] = []
        factor = 1
        for part_idx in range(m):
            arrays = [
                domain.coeff_to_extended_part(poly.copy(), factor).vec.vals
                for poly in poly_list
            ]
            shift = domain.g_coset * factor % p
            shift_c = ctx.const(shift)
            coset_x_vals = ctx.mul(pw, jnp.broadcast_to(shift_c, pw.shape))
            h_vals = fold_jit(arrays, coset_x_vals, scal)
            part_results.append(Polynomial(LAGRANGE, FVec(F, h_vals)))
            factor = factor * domain.extended_omega % p

        return domain.lagrange_vec_to_extended(part_results)

    def evaluate_h_full(
        self,
        advice_polys: List[List[Polynomial]],  # per proof, coeff basis
        instance_polys: List[List[Polynomial]],
        challenges: List[int],
        y: int,
        beta: int,
        gamma: int,
        theta: int,
        lookups: List[List],  # per proof: CommittedLookup
        permutations: List,  # per proof: CommittedPermutation (sets)
    ) -> Polynomial:
        pk = self.pk
        domain = self.domain
        F = self.field
        p = F.MODULUS
        cs = pk.vk.cs
        ext_n = domain.extended_n

        ext_cache: Dict[int, FVec] = {}

        def ext(poly: Polynomial) -> FVec:
            key = id(poly)
            if key not in ext_cache:
                ext_cache[key] = domain.coeff_to_extended(poly.copy()).vec
            return ext_cache[key]

        def rot_ext(vec: FVec, r: int) -> FVec:
            step = (1 << (domain.extended_k - domain.k)) * r
            return vec.rotate(step)

        fixed_ext = [ext(poly) for poly in pk.fixed_polys]
        l0 = ext(pk.l0)
        l_last = ext(pk.l_last)
        l_active = ext(pk.l_active_row)

        # coset point coordinates zeta * ext_omega^i (for the beta*X term)
        pw = powers(domain.extended_omega, ext_n, domain.ctx)
        zeta_c = domain.ctx.const(domain.g_coset)
        coset_x = FVec(self.field, domain.ctx.mul(pw, jnp.broadcast_to(zeta_c, pw.shape)))

        def const_vec(c: int) -> FVec:
            return FVec.fill(F, ext_n, c)

        one = const_vec(1)

        h: Optional[FVec] = None

        def fold(value: FVec):
            nonlocal h
            if h is None:
                h = value
            else:
                h = h * F(y) + value

        def eval_expr(expr: Expression, advice_ext, instance_ext) -> FVec:
            return expr.evaluate(
                constant=lambda c: const_vec(c),
                selector=lambda s: (_ for _ in ()).throw(
                    ValueError("virtual selector in evaluate_h")
                ),
                fixed=lambda q: rot_ext(fixed_ext[q.column_index], q.rotation.i),
                advice=lambda q: rot_ext(advice_ext[q.column_index], q.rotation.i),
                instance=lambda q: rot_ext(instance_ext[q.column_index], q.rotation.i),
                challenge=lambda c: const_vec(challenges[c.index]),
                negated=lambda a: -a,
                sum_=lambda a, b: a + b,
                product=lambda a, b: a * b,
                scaled=lambda a, f: a * F(f),
            )

        blinding = cs.blinding_factors()
        last_rotation = -(blinding + 1)
        chunk_len = pk.vk.cs_degree - 2
        delta = F.DELTA

        for proof_idx in range(len(advice_polys)):
            advice_ext = [ext(poly) for poly in advice_polys[proof_idx]]
            instance_ext = [ext(poly) for poly in instance_polys[proof_idx]]

            # ---- custom gates ----
            for gate in cs.gates:
                for poly in gate.polys:
                    fold(eval_expr(poly, advice_ext, instance_ext))

            # ---- permutation argument ----
            perm = permutations[proof_idx]
            sets = perm.sets
            if sets:
                z_ext = [ext(s.poly) for s in sets]
                # l_0(X) * (1 - z_0(X))
                fold(l0 * (one - z_ext[0]))
                # l_last(X) * (z_l(X)^2 - z_l(X))
                zl = z_ext[-1]
                fold(l_last * (zl * zl - zl))
                # l_0(X) * (z_i(X) - z_{i-1}(omega^last X))
                for i in range(1, len(sets)):
                    fold(l0 * (z_ext[i] - rot_ext(z_ext[i - 1], last_rotation)))
                # product constraints per chunk
                sigma_ext = [ext(sp) for sp in pk.permutation.polys]
                columns = cs.permutation.columns
                for chunk_index, set_i in enumerate(sets):
                    cols = columns[chunk_index * chunk_len : (chunk_index + 1) * chunk_len]
                    sigmas = sigma_ext[chunk_index * chunk_len : (chunk_index + 1) * chunk_len]
                    left = rot_ext(z_ext[chunk_index], 1)
                    for col, sigma in zip(cols, sigmas):
                        cv = self._column_ext(col, fixed_ext, advice_ext, instance_ext)
                        left = left * (cv + sigma * F(beta) + F(gamma))
                    right = z_ext[chunk_index]
                    delta_pow = pow(delta, chunk_index * chunk_len, p)
                    cur = beta * delta_pow % p
                    for col in cols:
                        cv = self._column_ext(col, fixed_ext, advice_ext, instance_ext)
                        right = right * (cv + coset_x * F(cur) + F(gamma))
                        cur = cur * delta % p
                    fold(l_active * (left - right))

            # ---- lookups ----
            for lk_idx, committed in enumerate(lookups[proof_idx]):
                argument = cs.lookups[lk_idx]
                z = ext(committed.product_poly)
                a_prime = ext(committed.permuted_input_poly)
                s_prime = ext(committed.permuted_table_poly)
                fold(l0 * (one - z))
                fold(l_last * (z * z - z))
                # compressed expressions over the extended domain
                def compress(expressions):
                    acc = const_vec(0)
                    for e in expressions:
                        acc = acc * F(theta) + eval_expr(e, advice_ext, instance_ext)
                    return acc

                inp = compress(argument.input_expressions)
                tab = compress(argument.table_expressions)
                left = rot_ext(z, 1) * (a_prime + F(beta)) * (s_prime + F(gamma))
                right = z * (inp + F(beta)) * (tab + F(gamma))
                fold(l_active * (left - right))
                fold(l0 * (a_prime - s_prime))
                fold(
                    l_active
                    * (a_prime - s_prime)
                    * (a_prime - rot_ext(a_prime, -1))
                )

        assert h is not None, "no constraints to evaluate"
        return Polynomial(EXTENDED, h)

    def _column_ext(self, column, fixed_ext, advice_ext, instance_ext) -> FVec:
        if column.kind == FIXED:
            return fixed_ext_lookup(self.pk, column, fixed_ext)
        if column.kind == ADVICE:
            return advice_ext[column.index]
        return instance_ext[column.index]

    _column_part = _column_ext


def fixed_ext_lookup(pk, column, fixed_ext):
    return fixed_ext[column.index]
