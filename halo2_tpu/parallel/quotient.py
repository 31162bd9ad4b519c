"""Sharded quotient (h) evaluation: the multi-chip `evaluate_h` path.

The reference walks the extended domain part-by-part in a serial loop
(`plonk/evaluation.rs:394-975`) to bound memory; on a TPU mesh the same axis
is sharded instead: extended-domain vectors live row-sharded `P('x')` across
devices, pointwise constraint programs partition for free under XLA SPMD
(rotations become `ppermute`s at shard edges), and the basis changes are the
four-step sharded NTTs of `parallel.ntt`.

One jitted step performs: coeff -> zeta-coset extend (sharded NTT per
column) -> gate-constraint fold with y-powers (pointwise, sharded) ->
divide by t(X) evaluations (pointwise) -> inverse sharded NTT back to
coefficients (reference `domain.rs:269-430` + `evaluation.rs:442-533`).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Type

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import FieldElement
from ..ops.field_jax import FieldCtx, add_mod, mont_mul, neg_mod, sub_mod
from ..ops.limbs import NLIMBS, ints_to_limbs
from ..ops.ntt import powers
from .ntt import FourStepNtt


class ShardedQuotient:
    """Mesh-sharded extended-domain engine for a fixed (field, j, k, mesh)."""

    def __init__(self, field: Type[FieldElement], j: int, k: int, mesh: Mesh,
                 axis: str = "x"):
        p = field.MODULUS
        self.field = field
        self.ctx = FieldCtx(field)
        self.mesh = mesh
        self.axis = axis
        self.k = k
        self.n = 1 << k
        self.quotient_poly_degree = j - 1
        extended_k = k
        while (1 << extended_k) < self.n * (j - 1):
            extended_k += 1
        self.extended_k = extended_k
        self.extended_n = 1 << extended_k
        self.extended_omega = pow(field.ROOT_OF_UNITY, 1 << (field.S - extended_k), p)
        self.omega = pow(self.extended_omega, 1 << (extended_k - k), p)
        self.extended_omega_inv = pow(self.extended_omega, -1, p)
        self.extended_ifft_divisor = pow(1 << extended_k, -1, p)
        self.g_coset = field.ZETA
        self.g_coset_inv = field.ZETA * field.ZETA % p

        self.fwd = FourStepNtt(field, extended_k, self.extended_omega, mesh, axis)
        self.bwd = FourStepNtt(field, extended_k, self.extended_omega_inv, mesh, axis)

        sh = NamedSharding(mesh, P(axis, None))
        r = self.ctx.r_int

        def zeta_pattern(c0: int, c1: int, n: int) -> jnp.ndarray:
            pat = [1 * r % p, c0 * r % p, c1 * r % p]
            vals = [pat[i % 3] for i in range(n)]
            return jax.device_put(jnp.asarray(ints_to_limbs(vals)), sh)

        # multiply-in zeta pattern on the n coefficient slots (rest are 0-pad)
        self.zeta_n = zeta_pattern(self.g_coset, self.g_coset_inv, self.n)
        self.zeta_inv_ext = zeta_pattern(self.g_coset_inv, self.g_coset, self.extended_n)

        # t(zeta * ext_omega^i)^-1 tiled over the extended domain
        m = self.extended_n >> k
        orig = pow(field.ZETA, self.n, p)
        step = pow(self.extended_omega, self.n, p)
        tinv = []
        cur = orig
        for _ in range(m):
            tinv.append(pow((cur - 1) % p, -1, p) * r % p)
            cur = cur * step % p
        tiled = jnp.asarray(ints_to_limbs(tinv * (self.extended_n // m)))
        self.t_inv_tiled = jax.device_put(tiled, sh)
        self.ext_div = self.ctx.const(self.extended_ifft_divisor)

    # ---- traced building blocks (compose inside one jit) ----
    def extend(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(n, L) coeff -> (extended_n, L) zeta-coset evaluations, sharded."""
        v = mont_mul(coeffs, self.zeta_n[: self.n], self.ctx)
        v = jnp.pad(v, [(0, self.extended_n - self.n), (0, 0)])
        return self.fwd(v)

    def rotate(self, ext: jnp.ndarray, rotation: int) -> jnp.ndarray:
        """Rotation by `rotation` rows of the base domain."""
        step = (1 << (self.extended_k - self.k)) * rotation
        return jnp.roll(ext, -step, axis=0)

    def divide_vanishing(self, ext: jnp.ndarray) -> jnp.ndarray:
        return mont_mul(ext, self.t_inv_tiled, self.ctx)

    def to_coeff(self, ext: jnp.ndarray) -> jnp.ndarray:
        """Extended evaluations -> quotient coefficients (full extended_n;
        caller truncates to n * quotient_poly_degree)."""
        v = self.bwd(ext)
        v = mont_mul(v, jnp.broadcast_to(self.ext_div, v.shape), self.ctx)
        return mont_mul(v, self.zeta_inv_ext, self.ctx)


def compile_gate_program(
    exprs: Sequence, sq: ShardedQuotient, num_fixed: int, num_advice: int,
    num_instance: int,
) -> Callable:
    """Compile Expression ASTs into one traced fold over extended columns.

    Returns fn(fixed_ext, advice_ext, instance_ext, challenges_mont, y_mont)
    -> folded (extended_n, L) constraint vector; the TPU analogue of the
    reference's CSE'd `GraphEvaluator` straight-line `Calculation` program
    (`plonk/evaluation.rs:1007-1210`) - XLA performs the CSE and fusion.
    """
    from ..plonk.expression import Expression  # noqa: F401  (type only)

    ctx = sq.ctx
    r = ctx.r_int
    p = ctx.p_int

    def build(expr, fixed, advice, instance, challenges):
        return expr.evaluate(
            constant=lambda c: jnp.broadcast_to(
                jnp.asarray(ints_to_limbs([c * r % p])[0:1])[0],
                (sq.extended_n, NLIMBS),
            ),
            selector=lambda s: (_ for _ in ()).throw(ValueError("virtual selector")),
            fixed=lambda q: sq.rotate(fixed[q.column_index], q.rotation.i),
            advice=lambda q: sq.rotate(advice[q.column_index], q.rotation.i),
            instance=lambda q: sq.rotate(instance[q.column_index], q.rotation.i),
            challenge=lambda c: jnp.broadcast_to(challenges[c.index], (sq.extended_n, NLIMBS)),
            negated=lambda a: neg_mod(a, ctx),
            sum_=lambda a, b: add_mod(a, b, ctx),
            product=lambda a, b: mont_mul(a, b, ctx),
            scaled=lambda a, f: mont_mul(
                a, jnp.broadcast_to(ctx.const(f), a.shape), ctx
            ),
        )

    def fold_fn(fixed_ext, advice_ext, instance_ext, challenges, y):
        h = None
        for expr in exprs:
            v = build(expr, fixed_ext, advice_ext, instance_ext, challenges)
            h = v if h is None else add_mod(mont_mul(h, y, ctx), v, ctx)
        return h

    return fold_fn
