"""Evaluation domains with part-wise extended-domain transforms.

TPU-native port of the semantics of `halo2_proofs/src/poly/domain.rs`:

  * `EvaluationDomain.new(j, k)` precomputes omega / extended_omega /
    zeta-coset / t(X) evaluations / barycentric weight exactly as the
    reference (`domain.rs:49-162`) - all host bigints, tiny.
  * Basis transforms (`lagrange_to_coeff`, `coeff_to_extended`,
    `extended_to_coeff`, `divide_by_vanishing_poly`) run on device as batched
    NTTs over limb tensors.
  * The fork's **part-wise** transforms (`coeff_to_extended_part`,
    `lagrange_vecs_to_extended`, reference `domain.rs:314-495`) keep peak
    memory at O(n) instead of O(extended_n) and are the natural sharding axis
    across TPU devices (SURVEY.md section 5 "long-context equivalent").
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Type

import jax.numpy as jnp

from ..fields import FieldElement, batch_invert
from ..ops import field_jax as fj
from ..ops.limbs import NLIMBS, ints_to_limbs
from ..ops.ntt import get_plan, powers
from . import COEFF, EXTENDED, LAGRANGE, FVec, Polynomial, Rotation


class EvaluationDomain:
    def __init__(self, field: Type[FieldElement], j: int, k: int):
        """j = max constraint degree (quotient_poly_degree = j - 1)."""
        p = field.MODULUS
        self.field = field
        self.ctx = fj.FieldCtx(field)
        self.k = k
        self.n = 1 << k
        self.quotient_poly_degree = j - 1

        extended_k = k
        while (1 << extended_k) < self.n * self.quotient_poly_degree:
            extended_k += 1
        self.extended_k = extended_k
        self.extended_n = 1 << extended_k

        # omega = ROOT_OF_UNITY^(2^(S-k)); extended likewise (domain.rs:68-90)
        self.extended_omega = pow(field.ROOT_OF_UNITY, 1 << (field.S - extended_k), p)
        self.omega = pow(self.extended_omega, 1 << (extended_k - k), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.extended_omega_inv = pow(self.extended_omega, -1, p)

        self.g_coset = field.ZETA
        self.g_coset_inv = field.ZETA * field.ZETA % p

        # t(zeta * ext_omega^i) = zeta^n * ext_omega^(n i) - 1, inverted
        num_parts = 1 << (extended_k - k)
        orig = pow(field.ZETA, self.n, p)
        step = pow(self.extended_omega, self.n, p)
        t_evals = []
        cur = orig
        for _ in range(num_parts):
            t_evals.append((cur - 1) % p)
            cur = cur * step % p
        self.t_evaluations_inv = [pow(t, -1, p) for t in t_evals]

        self.ifft_divisor = pow(1 << k, -1, p)
        self.extended_ifft_divisor = pow(1 << extended_k, -1, p)
        self.barycentric_weight = pow(self.n, -1, p)

        self._plan = lambda log_n, omega: get_plan(field, log_n, omega)

    # ---------------- constructors ----------------
    def empty_lagrange(self) -> Polynomial:
        return Polynomial(LAGRANGE, FVec.zeros(self.field, self.n))

    def empty_coeff(self) -> Polynomial:
        return Polynomial(COEFF, FVec.zeros(self.field, self.n))

    def empty_extended(self) -> Polynomial:
        return Polynomial(EXTENDED, FVec.zeros(self.field, self.extended_n))

    def constant_lagrange(self, c: int) -> Polynomial:
        return Polynomial(LAGRANGE, FVec.fill(self.field, self.n, c))

    def constant_extended(self, c: int) -> Polynomial:
        return Polynomial(EXTENDED, FVec.fill(self.field, self.extended_n, c))

    def lagrange_from_vec(self, vec: FVec) -> Polynomial:
        assert len(vec) == self.n
        return Polynomial(LAGRANGE, vec)

    def coeff_from_vec(self, vec: FVec) -> Polynomial:
        assert len(vec) == self.n
        return Polynomial(COEFF, vec)

    # ---------------- transforms ----------------
    def lagrange_to_coeff(self, a: Polynomial) -> Polynomial:
        assert a.basis == LAGRANGE and len(a) == self.n
        plan = self._plan(self.k, self.omega_inv)
        out = plan(a.vec.vals)
        div = self.ctx.const(self.ifft_divisor)
        out = self.ctx.mul(out, jnp.broadcast_to(div, out.shape))
        return Polynomial(COEFF, FVec(self.field, out))

    def coeff_to_extended(self, a: Polynomial) -> Polynomial:
        assert a.basis == COEFF and len(a) == self.n
        v = self._distribute_powers_zeta(a.vec.vals, into_coset=True)
        v = jnp.pad(v, [(0, self.extended_n - self.n), (0, 0)])
        plan = self._plan(self.extended_k, self.extended_omega)
        return Polynomial(EXTENDED, FVec(self.field, plan(v)))

    def coeff_to_extended_part(self, a: Polynomial, ext_omega_factor: int) -> Polynomial:
        """FFT(f(zeta * ext_omega_factor * X), n) - one O(n) part of the
        extended coset evaluation (reference domain.rs:314-380)."""
        assert a.basis == COEFF and len(a) == self.n
        c = self.g_coset * ext_omega_factor % self.field.MODULUS
        v = self._distribute_powers(a.vec.vals, c)
        plan = self._plan(self.k, self.omega)
        return Polynomial(LAGRANGE, FVec(self.field, plan(v)))

    def coeff_to_extended_parts(self, a: Polynomial) -> List[Polynomial]:
        num_parts = self.extended_n >> self.k
        factor = 1
        parts = []
        for _ in range(num_parts):
            parts.append(self.coeff_to_extended_part(a, factor))
            factor = factor * self.extended_omega % self.field.MODULUS
        return parts

    def lagrange_vec_to_extended(self, values: Sequence[Polynomial]) -> Polynomial:
        """Interleave m n-sized part vectors into one extended vector
        (row-major transpose; reference domain.rs:193-212)."""
        m = self.extended_n >> self.k
        assert len(values) == m and all(len(v) == self.n for v in values)
        stacked = jnp.stack([v.vec.vals for v in values], axis=1)  # (n, m, L)
        return Polynomial(
            EXTENDED, FVec(self.field, stacked.reshape(self.extended_n, NLIMBS))
        )

    def extended_to_coeff(self, a: Polynomial) -> FVec:
        """iFFT out of the extended coset; truncated to quotient size
        (reference domain.rs:404-430)."""
        assert a.basis == EXTENDED and len(a) == self.extended_n
        plan = self._plan(self.extended_k, self.extended_omega_inv)
        v = plan(a.vec.vals)
        div = self.ctx.const(self.extended_ifft_divisor)
        v = self.ctx.mul(v, jnp.broadcast_to(div, v.shape))
        v = self._distribute_powers_zeta(v, into_coset=False)
        v = v[: self.n * self.quotient_poly_degree]
        return FVec(self.field, v)

    def lagrange_vecs_to_extended(self, a: List[List[Polynomial]]) -> Polynomial:
        """Merge per-degree-cluster partial results (lists of 2^i n-sized
        Lagrange parts) into one extended-basis polynomial
        (reference domain.rs:433-495)."""
        p = self.field.MODULUS
        a = list(a)
        if a and len(a[-1]) == (1 << (self.extended_k - self.k)):
            result_poly = self.lagrange_vec_to_extended(a.pop())
        else:
            result_poly = self.empty_extended()
        if not a:
            return result_poly

        ifft_divisor = self.extended_ifft_divisor
        omega_inv = self.extended_omega_inv
        i = len(a[-1]) << self.k
        while i < self.extended_n:
            ifft_divisor = ifft_divisor * 2 % p
            omega_inv = omega_inv * omega_inv % p
            i <<= 1

        result = jnp.zeros((self.extended_n, NLIMBS), jnp.uint32)
        for i in range(len(a) - 1, -1, -1):
            parts = a[i]
            assert len(parts) == (1 << i)
            size = self.n << i
            stacked = jnp.stack([pp.vec.vals for pp in parts], axis=1)
            vec = stacked.reshape(size, NLIMBS)
            plan = self._plan(self.k + i, omega_inv)
            v = plan(vec)
            # ifft_divisor already holds 1 / 2^(k+i)
            div = self.ctx.const(ifft_divisor)
            v = self.ctx.mul(v, jnp.broadcast_to(div, v.shape))
            ifft_divisor = ifft_divisor * 2 % p
            omega_inv = omega_inv * omega_inv % p
            result = result.at[:size].set(self.ctx.add(result[:size], v))
        plan = self._plan(self.extended_k, self.extended_omega)
        merged = plan(result)
        return Polynomial(
            EXTENDED, FVec(self.field, self.ctx.add(result_poly.vec.vals, merged))
        )

    def divide_by_vanishing_poly(self, a: Polynomial) -> Polynomial:
        assert a.basis == EXTENDED and len(a) == self.extended_n
        m = len(self.t_evaluations_inv)
        tinv = FVec.from_ints(self.field, self.t_evaluations_inv).vals  # (m, L)
        tiled = jnp.tile(tinv, (self.extended_n // m, 1))
        return Polynomial(
            EXTENDED, FVec(self.field, self.ctx.mul(a.vec.vals, tiled))
        )

    def rotate_extended(self, a: Polynomial, rotation: Rotation) -> Polynomial:
        assert a.basis == EXTENDED
        step = (1 << (self.extended_k - self.k)) * rotation.i
        return Polynomial(EXTENDED, FVec(self.field, jnp.roll(a.vec.vals, -step, axis=0)))

    # ---------------- host-side scalar helpers ----------------
    def rotate_omega(self, value: int, rotation: Rotation) -> int:
        p = self.field.MODULUS
        if rotation.i >= 0:
            return value * pow(self.omega, rotation.i, p) % p
        return value * pow(self.omega_inv, -rotation.i, p) % p

    def l_i_range(self, x: int, xn: int, rotations) -> List[int]:
        """Barycentric Lagrange evaluations l_i(x) (reference domain.rs:652-677)."""
        p = self.field.MODULUS
        rotations = list(rotations)
        denoms = [(x - self.rotate_omega(1, Rotation(r))) % p for r in rotations]
        inv = [pow(d, -1, p) if d else 0 for d in denoms]
        common = (xn - 1) * self.barycentric_weight % p
        return [
            self.rotate_omega(iv * common % p, Rotation(r))
            for r, iv in zip(rotations, inv)
        ]

    def get_quotient_poly_degree(self) -> int:
        return self.quotient_poly_degree

    # ---------------- internal ----------------
    def _distribute_powers_zeta(self, v: jnp.ndarray, into_coset: bool) -> jnp.ndarray:
        """Multiply index i by [1, zeta, zeta^2][i mod 3] (or inverse pattern)."""
        p = self.field.MODULUS
        cp = [self.g_coset, self.g_coset_inv] if into_coset else [self.g_coset_inv, self.g_coset]
        pattern = [1, cp[0], cp[1]]
        n = v.shape[0]
        idx = jnp.arange(n) % 3
        pat = FVec.from_ints(self.field, pattern).vals  # (3, L)
        mults = jnp.take(pat, idx, axis=0)
        return self.ctx.mul(v, mults)

    def _distribute_powers(self, v: jnp.ndarray, c: int) -> jnp.ndarray:
        pw = powers(c, v.shape[0], self.ctx)
        return self.ctx.mul(v, pw)


@lru_cache(maxsize=None)
def domain_cache(field: Type[FieldElement], j: int, k: int) -> EvaluationDomain:
    return EvaluationDomain(field, j, k)
