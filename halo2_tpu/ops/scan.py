"""Device prefix-product scans and Montgomery-trick batch inversion.

TPU-native replacement for the prover's serial grand-product and
batch-inversion row loops (reference `permutation/prover.rs:44-160` builds
running products row-by-row under `parallelize`, and `lookup/prover.rs:
168-330` batch-inverts denominators with `batch_invert`): here the prefix
product is a log-depth `jax.lax.associative_scan` over (n, 16) Montgomery
limb tensors, and batch inversion is two scans + ONE Fermat ladder on the
single total element (~2 n log n multiplies instead of ~380 n).

Exactness: `mont_mul` is closed on the lazy domain [0, 2p) and exact mod p,
so scan results equal the host bigint loops modulo p; canonicalization
happens at the usual host/transcript boundaries.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .field_jax import FieldCtx, inv_mod, is_zero, mont_mul, select
from .limbs import NLIMBS


def prefix_product(vals: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Inclusive prefix products along axis 0: out[i] = prod_{j<=i} vals[j].

    (n, 16) Montgomery limbs -> (n, 16) Montgomery limbs, log-depth.
    """
    return jax.lax.associative_scan(lambda a, b: mont_mul(a, b, ctx), vals, axis=0)


def exclusive_prefix_product(
    vals: jnp.ndarray, ctx: FieldCtx, init: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """out[i] = init * prod_{j<i} vals[j]  (init defaults to one).

    The grand-product shape: z[0] = init, z[i+1] = z[i] * vals[i].
    `init` is a (16,) Montgomery element (e.g. the previous chunk's last_z,
    reference permutation/prover.rs cross-chunk continuation).
    """
    incl = prefix_product(vals, ctx)
    one = jnp.broadcast_to(ctx.r_limbs, (1, NLIMBS))
    excl = jnp.concatenate([one, incl[:-1]], axis=0)
    if init is not None:
        excl = mont_mul(excl, jnp.broadcast_to(init, excl.shape), ctx)
    return excl


def batch_invert(vals: jnp.ndarray, ctx: FieldCtx) -> jnp.ndarray:
    """Montgomery's trick on device: invert all n elements with ONE Fermat
    ladder (reference `poly.rs:179-206` / `arithmetic.rs` batch_invert).

    inv[i] = (prod_{j<i} v_j) * (prod_{j>i} v_j) * (prod_all)^-1, with the
    two partial products from forward/backward log-depth scans. Zeros pass
    through as zero (matching `pow(d, -1, p) if d else 0` call sites).
    """
    zero_mask = is_zero(vals, ctx)
    one = jnp.broadcast_to(ctx.r_limbs, vals.shape)
    safe = select(zero_mask, one, vals)

    pre = exclusive_prefix_product(safe, ctx)  # prod_{j<i}
    suf = exclusive_prefix_product(safe[::-1], ctx)[::-1]  # prod_{j>i}
    total = mont_mul(mont_mul(pre[-1:], safe[-1:], ctx)[0], jnp.asarray(ctx.r_limbs), ctx)
    # total is prod(safe) * 1; invert the single element
    total_inv = inv_mod(total, ctx)
    out = mont_mul(mont_mul(pre, suf, ctx), jnp.broadcast_to(total_inv, vals.shape), ctx)
    return select(zero_mask, jnp.zeros_like(vals), out)
