"""Number-theoretic transform over limb tensors.

TPU-native counterpart of the reference's three FFT engines
(`halo2_proofs/src/fft/{baseline,parallel,recursive}.rs`): a radix-2
iterative Cooley-Tukey over (n, 16)-limb Montgomery tensors. All stages are
static-shape reshapes + one batched mont_mul per stage - exactly the
structure XLA pipelines well; the four-step variant for cross-device
sharding (reference `fft/parallel.rs` split -> shuffle -> sub-FFT ->
unshuffle) is built from the same primitive in `halo2_tpu.parallel`.

Twiddle factors are precomputed per (field, k) and cached device-side, like
the reference's `FFTData` (`fft/recursive.rs:22-151`).

Semantics oracle: `best_fft(a, omega, log_n)` maps a_i -> sum_j a_j w^{ij}
(DFT with the given root of unity); the inverse pass uses omega_inv and the
caller divides by n (reference `poly/domain.rs:556-566`).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Type

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldElement
from .field_jax import FieldCtx, add_mod, mont_mul, sub_mod
from .limbs import NLIMBS, ints_to_limbs


@lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class NttPlan:
    """Precomputed twiddles for a given field, size, and root of unity."""

    _cache: dict = {}

    def __new__(cls, field: Type[FieldElement], log_n: int, omega: int):
        key = (field, log_n, omega)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        self.ctx = FieldCtx(field)
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega
        p = field.MODULUS
        r = self.ctx.r_int
        # stage s operates on blocks of 2m (m = 2^s); twiddle_j = w_m^j where
        # w_m = omega^(n / 2m), j in [0, m)
        self.stage_twiddles = []
        for s in range(log_n):
            m = 1 << s
            w_m = pow(omega, self.n >> (s + 1), p)
            tw = []
            cur = 1
            for _ in range(m):
                tw.append(cur * r % p)  # Montgomery form
                cur = cur * w_m % p
            self.stage_twiddles.append(jnp.asarray(ints_to_limbs(tw)))
        self.perm = jnp.asarray(_bitrev_perm(log_n))
        self._jit = jax.jit(lambda a: self._ntt(a))
        return self

    def _ntt(self, a: jnp.ndarray) -> jnp.ndarray:
        """(n, 16) -> (n, 16) DFT with this plan's omega (Montgomery in/out)."""
        ctx = self.ctx
        n = self.n
        a = jnp.take(a, self.perm, axis=0)
        for s in range(self.log_n):
            m = 1 << s
            blocks = a.reshape(n // (2 * m), 2, m, NLIMBS)
            lo = blocks[:, 0]
            hi = blocks[:, 1]
            t = mont_mul(hi, self.stage_twiddles[s][None, :, :], ctx)
            a = jnp.stack([add_mod(lo, t, ctx), sub_mod(lo, t, ctx)], axis=1).reshape(
                n, NLIMBS
            )
        return a

    def __call__(self, a: jnp.ndarray) -> jnp.ndarray:
        from ..utils.measure import span

        with span(f"ntt 2^{self.log_n}", category="fft"):
            if a.ndim == 2:
                return self._jit(a)
            # batched over leading axes
            flat = a.reshape(-1, self.n, NLIMBS)
            return jax.vmap(self._ntt)(flat).reshape(a.shape)


def get_plan(field: Type[FieldElement], log_n: int, omega: int):
    """Runtime-dispatched NTT implementation (reference fft.rs:15-44 env
    dispatcher; `NTT=jnp|pallas`, default pallas on TPU for log_n >= 10).

    When a `parallel.context` mesh is active and the transform is large
    enough for the four-step split (n >= D^2), the sharded all-to-all NTT
    is returned instead - this single dispatch point is what makes every
    basis change inside `create_proof` mesh-parallel."""
    import os

    from ..parallel.context import active_mesh

    mc = active_mesh()
    if mc is not None and mc.can_shard_ntt(log_n):
        from ..parallel.ntt import FourStepNtt

        return FourStepNtt(field, log_n, omega, mc.mesh, mc.axis)

    impl = os.environ.get("NTT", "auto")
    if impl == "jnp":
        return NttPlan(field, log_n, omega)
    if impl == "mxu":
        from .mxu_mont import MxuNttPlan

        return MxuNttPlan(field, log_n, omega)
    if impl == "pallas":  # original unrolled kernels (slow compile)
        from .ntt_pallas import PallasNttPlan

        return PallasNttPlan(field, log_n, omega)
    if impl in ("pallas2", "cg") or (
        impl == "auto" and log_n >= 10 and jax.default_backend() == "tpu"
    ):
        from .ntt_pallas2 import CgNttPlan

        return CgNttPlan(field, log_n, omega)
    return NttPlan(field, log_n, omega)


def ntt(a: jnp.ndarray, field: Type[FieldElement], omega: int) -> jnp.ndarray:
    """Forward DFT of (..., n, 16) Montgomery limbs with root `omega` (int)."""
    n = a.shape[-2]
    plan = NttPlan(field, n.bit_length() - 1, omega)
    return plan(a)


def intt(
    a: jnp.ndarray, field: Type[FieldElement], omega_inv: int, n_inv: int
) -> jnp.ndarray:
    """Inverse DFT: forward pass with omega_inv, then scale by 1/n."""
    ctx = FieldCtx(field)
    out = ntt(a, field, omega_inv)
    divisor = ctx.const(n_inv)
    return mont_mul(out, jnp.broadcast_to(divisor, out.shape), ctx)


def powers(c: int, n: int, ctx: FieldCtx) -> jnp.ndarray:
    """[1, c, c^2, ..., c^(n-1)] in Montgomery form, (n, 16).

    Built host-side (cheap bigint loop) - used for coset shifts.
    """
    p = ctx.p_int
    r = ctx.r_int
    out = []
    cur = 1
    for _ in range(n):
        out.append(cur * r % p)
        cur = cur * c % p
    return jnp.asarray(ints_to_limbs(out))
