"""Mesh-integrated proving: multi-chip proof bytes == single-chip bytes.

The reference's parallel backend lives inside `create_proof` (rayon scopes,
`plonk/evaluation.rs:454,507-533`, `arithmetic.rs:166-189`); here the same
integration is `parallel.use_mesh`: activating a mesh re-routes every NTT
basis change, every commitment MSM, and the evaluate_h fold through the
sharded kernels with no prover code changes. Because all limb math is exact,
the sharded proof must be BYTE-IDENTICAL to the single-chip proof for the
same ChaCha seed - pinned here on a lookup + permutation circuit over the
8-device virtual CPU mesh.

The single-chip and mesh proofs run in SEPARATE subprocesses (XLA:CPU
segfaults with "LLVM compilation error: Cannot allocate memory" once too
many programs accumulate in one process; both provers together cross the
line), comparing proof bytes through files."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "examples"))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from halo2_tpu.curves import Vesta
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.parallel import make_mesh, use_mesh
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from plonk_bench import BenchCircuit

K = 5
params = ParamsIPA.cached(Vesta, K)
circuit = BenchCircuit(12, table_bits=4, seed=3)
vk = keygen_vk(params, circuit)
pk = keygen_pk(params, vk, circuit)
assert vk.domain.extended_k >= 6, "mesh must engage: extended_k >= 2*log2(8)"

def prove():
    tr = Blake2bWrite(Vesta)
    create_proof(params, pk, [circuit], [[]], ChaCha20Rng(b"\\x2a" * 32), tr)
    return tr.finalize()

if {mesh!r} == "mesh":
    with use_mesh(make_mesh(8), msm_min=32):
        proof = prove()
else:
    proof = prove()
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof)) is True

open({out!r}, "wb").write(proof)
print("OK")
"""


def _run(mode: str, out_path: str) -> bytes:
    cache = os.path.join(_REPO, ".jax_cache_tests")
    script = _SCRIPT.format(repo=_REPO, cache=cache, mesh=mode, out=out_path)
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=3600, env=dict(os.environ),
    )
    assert res.returncode == 0, res.stdout + res.stderr[-4000:]
    assert "OK" in res.stdout
    with open(out_path, "rb") as fh:
        return fh.read()


def test_mesh_proof_bytes_equal_single_chip(tmp_path):
    single = _run("single", str(tmp_path / "single.bin"))
    sharded = _run("mesh", str(tmp_path / "mesh.bin"))
    assert sharded == single, "mesh proof bytes differ from single-chip"
