"""Cross-implementation NTT equality (reference `fft.rs:161-224`
test_fft_all): the fused Pallas four-step plan must agree exactly with the
jnp radix-2 plan.

Interpret-mode Pallas compiles are large; after ~100 suite tests in one
process XLA:CPU can segfault compiling them (memory pressure), so each
equality case runs in a fresh subprocess. The small round-trip test stays
in-process."""

import os
import subprocess
import sys
import textwrap

import pytest

from halo2_tpu.fields import Fq, FrBn

pytestmark = pytest.mark.slow

_SNIPPET = textwrap.dedent(
    """
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import random
    from halo2_tpu.fields import Fq, FrBn
    from halo2_tpu.ops.field_jax import FieldCtx
    from halo2_tpu.ops.ntt import NttPlan
    from halo2_tpu.ops.ntt_pallas import PallasNttPlan

    field = {field}
    k = {k}
    n = 1 << k
    p = field.MODULUS
    omega = pow(field.ROOT_OF_UNITY, 1 << (field.S - k), p)
    random.seed(1000 + k)
    vals = [random.randrange(p) for _ in range(n)]
    ctx = FieldCtx(field)
    a = ctx.encode_ints(vals)
    ref = ctx.decode_ints(NttPlan(field, k, omega)(a))
    out = ctx.decode_ints(PallasNttPlan(field, k, omega)(a))
    assert ref == out, "mismatch"
    print("OK")
    """
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("field_name,k", [("Fq", 4), ("Fq", 9), ("FrBn", 5)])
def test_pallas_ntt_matches_jnp(field_name, k):
    code = _SNIPPET.format(repo=_REPO, field=field_name, k=k)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout


_ROUNDTRIP_SNIPPET = textwrap.dedent(
    """
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import random
    from halo2_tpu.fields import Fq
    from halo2_tpu.ops.field_jax import FieldCtx
    from halo2_tpu.ops.ntt_pallas import PallasNttPlan

    k = 6
    n = 1 << k
    p = Fq.MODULUS
    omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
    omega_inv = pow(omega, -1, p)
    n_inv = pow(n, -1, p)
    random.seed(7)
    vals = [random.randrange(p) for _ in range(n)]
    ctx = FieldCtx(Fq)
    a = ctx.encode_ints(vals)
    fwd = PallasNttPlan(Fq, k, omega)(a)
    back = PallasNttPlan(Fq, k, omega_inv)(fwd)
    back = ctx.mul(back, jnp.broadcast_to(ctx.const(n_inv), back.shape))
    assert ctx.decode_ints(back) == vals
    print("OK")
    """
)


def test_pallas_intt_roundtrip():
    code = _ROUNDTRIP_SNIPPET.format(repo=_REPO)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout
