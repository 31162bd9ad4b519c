"""Device kernels for the prover's polynomial tail.

The reference runs these on the host: parallel Horner evaluation
(`arithmetic.rs:243-268`), Kate division by (X - b) (`arithmetic.rs:287-306`),
and the multiopen linear combinations (`ipa/multiopen/prover.rs`,
`kzg/multiopen/*`). At k=14+ the O(n)-per-query Python bigint loops dominate
proof latency, so the TPU build keeps polynomials as (n, 16) Montgomery limb
tensors and evaluates them with three batched kernels:

  * `batch_eval`: evaluate M stacked polynomials at (few) points via a
    log-doubling power ladder + log-depth tree reduction - one fused XLA
    program instead of M serial Horner loops.
  * `horner_fold`: fold a stack of polynomials by a scalar (the q_poly /
    p_poly accumulations of the multiopen protocols).
  * `kate_division`: (p(X) - p(b)) / (X - b) as a reverse
    `lax.associative_scan` of affine maps v -> b*v + a_i - the suffix
    Horner recurrence s_i = a_i + b*s_{i+1} is exactly a composition scan,
    log-depth on device instead of a serial host loop.

All kernels are jitted per geometry and cached.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Type

import jax
import jax.numpy as jnp

from ..fields import FieldElement
from .field_jax import FieldCtx, add_mod, mont_mul
from .limbs import NLIMBS


def device_powers(x_mont: jnp.ndarray, n: int, ctx: FieldCtx) -> jnp.ndarray:
    """[1, x, ..., x^(n-1)] from a (..., 16) Montgomery scalar by
    log-doubling: pw_{2l} = pw_l ++ (x^l * pw_l). Traced; O(log n) muls."""
    lead = x_mont.shape[:-1]
    one = jnp.broadcast_to(ctx.r_limbs, lead + (1, NLIMBS))
    pw = one  # (..., 1, 16)
    xl = x_mont  # x^(current length)
    length = 1
    while length < n:
        ext = mont_mul(pw, xl[..., None, :], ctx)
        pw = jnp.concatenate([pw, ext], axis=-2)
        if 2 * length < n:
            xl = mont_mul(xl, xl, ctx)
        length *= 2
    return pw[..., :n, :]


def _tree_sum(t: jnp.ndarray, ctx: FieldCtx, axis: int) -> jnp.ndarray:
    """Log-depth modular sum along `axis` (power-of-two length or padded)."""
    n = t.shape[axis]
    while n > 1:
        if n % 2 == 1:
            pad = [(0, 0)] * t.ndim
            pad[axis] = (0, 1)
            t = jnp.pad(t, pad)
            n += 1
        half = n // 2
        lo = jax.lax.slice_in_dim(t, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(t, half, n, axis=axis)
        t = add_mod(lo, hi, ctx)
        n = half
    return jnp.squeeze(t, axis=axis)


@lru_cache(maxsize=None)
def _batch_eval_kernel(field: Type[FieldElement], M: int, n: int, Q: int):
    ctx = FieldCtx(field)

    def kernel(coeffs, xs_mont, sel):  # (M, n, L), (Q, L), (M,) int32
        pws = device_powers(xs_mont, n, ctx)  # (Q, n, L)
        pw_sel = jnp.take(pws, sel, axis=0)  # (M, n, L)
        t = mont_mul(coeffs, pw_sel, ctx)
        return _tree_sum(t, ctx, axis=1)  # (M, L)

    return jax.jit(kernel)


def batch_eval_mont(
    field: Type[FieldElement],
    coeff_stack: jnp.ndarray,
    points: Sequence[int],
) -> jnp.ndarray:
    """Evaluate coeff_stack[i] (Montgomery limbs, coeff basis) at points[i].

    Returns (M, 16) Montgomery evaluations on device. Points are deduplicated
    so the power ladder runs once per distinct point."""
    ctx = FieldCtx(field)
    M, n, _ = coeff_stack.shape
    uniq = sorted(set(int(x) % ctx.p_int for x in points))
    index = {x: i for i, x in enumerate(uniq)}
    xs_mont = ctx.consts(uniq)  # (Q, L)
    sel = jnp.asarray([index[int(x) % ctx.p_int] for x in points], dtype=jnp.int32)
    kern = _batch_eval_kernel(field, M, n, len(uniq))
    return kern(coeff_stack, xs_mont, sel)


def batch_eval(
    field: Type[FieldElement],
    coeff_stack: jnp.ndarray,
    points: Sequence[int],
) -> List[int]:
    """Host-int results of `batch_eval_mont` (single device->host decode)."""
    ctx = FieldCtx(field)
    return ctx.decode_ints(batch_eval_mont(field, coeff_stack, points))


@lru_cache(maxsize=None)
def _horner_fold_kernel(field: Type[FieldElement], M: int, n: int):
    ctx = FieldCtx(field)

    def kernel(stack, x_mont):  # (M, n, L), (L,)
        acc = stack[0]
        for i in range(1, M):
            acc = add_mod(mont_mul(acc, x_mont[None, :], ctx), stack[i], ctx)
        return acc

    return jax.jit(kernel)


def horner_fold_mont(
    field: Type[FieldElement], stack: jnp.ndarray, x: int
) -> jnp.ndarray:
    """acc = (...(s_0 * x + s_1) * x + ...) + s_{M-1} over (M, n, 16)."""
    ctx = FieldCtx(field)
    M = stack.shape[0]
    if M == 1:
        return stack[0]
    return _horner_fold_kernel(field, M, stack.shape[1])(stack, ctx.const(x))


@lru_cache(maxsize=None)
def _kate_kernel(field: Type[FieldElement], n: int):
    ctx = FieldCtx(field)

    def kernel(coeffs, b_mont):  # (n, L), (L,)
        # T_i(v) = b*v + a_i; s_i = (T_i o T_{i+1} o ... o T_{n-1})(0).
        # reverse=True feeds the LATER element as the left operand, so
        # combine(left, right) = right o left: (mr*ml, mr*cl + cr)
        m0 = jnp.broadcast_to(b_mont, coeffs.shape)

        def combine(left, right):
            ml, cl = left
            mr, cr = right
            return mont_mul(ml, mr, ctx), add_mod(mont_mul(mr, cl, ctx), cr, ctx)

        _, s = jax.lax.associative_scan(combine, (m0, coeffs), reverse=True, axis=0)
        # quotient q_i = s_{i+1} for i in [0, n-1); remainder p(b) = s_0
        q = jnp.concatenate([s[1:], jnp.zeros((1, NLIMBS), jnp.uint32)], axis=0)
        return q, s[0]

    return jax.jit(kernel)


def kate_division_mont(
    field: Type[FieldElement], coeffs: jnp.ndarray, b: int
) -> jnp.ndarray:
    """(p(X) - p(b)) / (X - b) over (n, 16) Montgomery limbs; returns n limbs
    with the top coefficient zero (reference arithmetic.rs:287-306)."""
    ctx = FieldCtx(field)
    q, _rem = _kate_kernel(field, coeffs.shape[0])(coeffs, ctx.const(b))
    return q
