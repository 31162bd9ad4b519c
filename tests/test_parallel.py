"""Sharded kernel correctness on the 8-device virtual CPU mesh.

Mirrors the reference's FFT cross-implementation equality test
(`halo2_proofs/src/fft.rs:161-224`): the sharded four-step NTT and sharded
MSM must agree exactly with the single-device / host oracles.

Each case runs in a fresh subprocess: XLA:CPU segfaults inside
backend_compile_and_load when compiling the large 8-way sharded limb
programs late in a long suite run (cumulative compile memory pressure);
fresh processes keep the suite stable (same workaround as
test_ntt_pallas.py)."""

import os
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PRELUDE = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import sys
sys.path.insert(0, {repo!r})
# fresh processes compile few programs, so the persistent cache is safe
# here (the in-suite segfault is tied to large single-process accumulation)
import jax
# env var alone does not stop the axon plugin from initializing;
# the config API is authoritative (see conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import random
from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.msm import MSMBases, msm_host
from halo2_tpu.ops.ntt import NttPlan
from halo2_tpu.parallel import FourStepNtt, ShardedQuotient, make_mesh, sharded_msm
mesh = make_mesh(8)
"""

_CASES = {
    "four_step_ntt": """
k = 8
n = 1 << k
p = Fq.MODULUS
omega = pow(Fq.ROOT_OF_UNITY, 1 << (Fq.S - k), p)
random.seed(101)
vals = [random.randrange(p) for _ in range(n)]
ctx = FieldCtx(Fq)
a = ctx.encode_ints(vals)
ref = ctx.decode_ints(NttPlan(Fq, k, omega)(a))
out = ctx.decode_ints(FourStepNtt(Fq, k, omega, mesh)(a))
assert ref == out
print("OK")
""",
    "sharded_msm": """
random.seed(102)
n = 256
q = Vesta.SCALAR.MODULUS
pts = [Vesta.generator().mul(random.randrange(1, 1000)) for _ in range(n)]
scalars = [random.randrange(q) for _ in range(n)]
ref = msm_host(scalars, pts, Vesta)
out = sharded_msm(scalars, MSMBases(Vesta, pts), mesh, lanes=8)
assert ref == out
print("OK")
""",
    "sharded_quotient": """
k = 5
sq = ShardedQuotient(Fq, 3, k, mesh)
n = 1 << k
p = Fq.MODULUS
random.seed(103)
vals = [random.randrange(p) for _ in range(n)]
a = sq.ctx.encode_ints(vals)
ext = sq.extend(a)
back = sq.to_coeff(ext)
out = sq.ctx.decode_ints(back)
assert out[:n] == vals
assert all(v == 0 for v in out[n:])
print("OK")
""",
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_parallel_case(case):
    cache = os.path.join(_REPO, "tests", ".jax_cache_subproc")
    code = _PRELUDE.format(repo=_REPO, cache=cache) + textwrap.dedent(_CASES[case])
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK" in result.stdout
