"""Sharded four-step NTT over a device mesh.

The size-n transform is decomposed as n = n1 * n2 (both powers of two, both
multiples of the mesh size D). Viewing the coefficient vector row-major as an
(n1, n2) matrix M[j1, j2] = a[j1*n2 + j2]:

    X[k1 + n1*k2] = sum_j2 w^(j2*k1) * w_n2^(j2*k2) * sum_j1 w_n1^(j1*k1) * M[j1, j2]

  1. column FFTs (size n1, root w^n2) over the j1 axis,
  2. twiddle by w^(j2*k1),
  3. transpose (the cross-device `lax.all_to_all`),
  4. row FFTs (size n2, root w^n1),
  5. transpose back to natural output order.

This is the distributed mirror of the reference's shared-memory split-radix
shuffle (`halo2_proofs/src/fft/parallel.rs:195-255`): its split/shuffle/
sub-FFT/unshuffle passes become local sub-NTTs + ICI all-to-alls. Data stays
flat-sharded `P('x')` on entry and exit so callers can chain pointwise
sharded ops without resharding.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Type

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import FieldElement
from ..ops.field_jax import FieldCtx, mont_mul
from ..ops.limbs import NLIMBS, ints_to_limbs
from ..ops.ntt import NttPlan


def make_mesh(n_devices: int = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


class FourStepNtt:
    """Precompiled sharded NTT for a fixed (field, log_n, omega, mesh)."""

    _cache: dict = {}

    def __new__(cls, field: Type[FieldElement], log_n: int, omega: int, mesh: Mesh,
                axis: str = "x"):
        key = (field, log_n, omega, id(mesh), axis)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self.field = field
        self.ctx = FieldCtx(field)
        self.mesh = mesh
        self.axis = axis
        self.n = 1 << log_n
        D = mesh.shape[axis]
        assert D & (D - 1) == 0, "mesh size must be a power of two"
        log_d = D.bit_length() - 1
        assert log_n >= 2 * log_d, (
            f"four-step NTT needs n >= D^2 (n=2^{log_n}, D={D})"
        )
        # balanced split with both factors divisible by D
        log_n1 = max(log_d, log_n // 2)
        self.n1 = 1 << log_n1
        self.n2 = 1 << (log_n - log_n1)
        self.D = D
        p = field.MODULUS
        self.col_plan = NttPlan(field, log_n1, pow(omega, self.n2, p))
        self.row_plan = NttPlan(field, log_n - log_n1, pow(omega, self.n1, p))
        # twiddle T[j2, k1] = omega^(j2*k1), Montgomery form, (n2, n1, L);
        # built host-side once per plan (n bigint muls)
        r = self.ctx.r_int
        rows = []
        for j2 in range(self.n2):
            w = pow(omega, j2, p)
            cur = r % p  # 1 in Montgomery form
            row = []
            wr = w  # multiply canonical w in: (x*R)*w mod p keeps Montgomery form
            for _ in range(self.n1):
                row.append(cur)
                cur = cur * wr % p
            rows.append(row)
        flat = [v for row in rows for v in row]
        self.twiddle = jnp.asarray(ints_to_limbs(flat)).reshape(
            self.n2, self.n1, NLIMBS
        )
        self._fn = self._build()
        return self

    def _build(self):
        ctx = self.ctx
        n1, n2, D, ax = self.n1, self.n2, self.D, self.axis
        col_plan, row_plan = self.col_plan, self.row_plan

        def local(a, tw):
            # a: (n/D, L) flat local chunk = rows j1 in this device's block
            a = a.reshape(n1 // D, n2, NLIMBS)
            # gather full columns: (n1, n2/D, L)
            a = jax.lax.all_to_all(a, ax, split_axis=1, concat_axis=0, tiled=True)
            a = jnp.transpose(a, (1, 0, 2))  # (n2/D, n1, L)
            a = jax.vmap(col_plan._ntt)(a)
            a = mont_mul(a, tw, ctx)
            # transpose: (n2/D, n1, L) -> (n2, n1/D, L)
            a = jax.lax.all_to_all(a, ax, split_axis=1, concat_axis=0, tiled=True)
            a = jnp.transpose(a, (1, 0, 2))  # (n1/D, n2, L)
            a = jax.vmap(row_plan._ntt)(a)
            # to natural flat order: (n1/D, n2, L) -> (n1, n2/D, L) -> local
            # (n2/D, n1, L) rows k2, flatten = X[k2*n1 + k1] chunk
            a = jax.lax.all_to_all(a, ax, split_axis=1, concat_axis=0, tiled=True)
            a = jnp.transpose(a, (1, 0, 2))
            return a.reshape(-1, NLIMBS)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(ax, None), P(ax, None, None)),
            out_specs=P(ax, None),
            check_rep=False,
        )
        return jax.jit(fn)

    def _tw_sharded(self) -> jnp.ndarray:
        if not hasattr(self, "_tw_dev"):
            self._tw_dev = jax.device_put(
                self.twiddle, NamedSharding(self.mesh, P(self.axis, None, None))
            )
        return self._tw_dev

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        """(n, L) Montgomery limbs, sharded or replicated -> DFT, sharded P('x')."""
        sh = NamedSharding(self.mesh, P(self.axis, None))
        if isinstance(a, jax.core.Tracer):
            a = jax.lax.with_sharding_constraint(a, sh)
        else:
            a = jax.device_put(a, sh)
        return self._fn(a, self._tw_sharded())
