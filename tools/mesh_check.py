"""Dev harness: single-chip vs mesh-sharded proof byte equality.

Run on the 8-device virtual CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/mesh_check.py [k]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_dev"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from halo2_tpu.curves import Pallas
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.parallel import make_mesh, use_mesh
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from plonk_api_circuit import PlonkApiCircuit, plonk_api_inputs


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    params = ParamsIPA.cached(Pallas, k)
    a, instance, lookup = plonk_api_inputs()
    circuit = PlonkApiCircuit(a, lookup)
    t0 = time.time()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    print(f"keygen: {time.time()-t0:.1f}s (extended_k={vk.domain.extended_k})")
    inst = [instance]

    t0 = time.time()
    tr = Blake2bWrite(Pallas)
    create_proof(params, pk, [circuit], [[inst]], ChaCha20Rng(b"\x2a" * 32), tr)
    single = tr.finalize()
    print(f"single-chip proof: {time.time()-t0:.1f}s, {len(single)} bytes")
    assert verify_proof(params, vk, [[inst]], Blake2bRead(Pallas, single)) is True
    print("single-chip verify OK")
    bad = bytearray(single)
    bad[len(bad) // 2] ^= 1
    try:
        ok = verify_proof(params, vk, [[inst]], Blake2bRead(Pallas, bytes(bad)))
    except Exception:
        ok = False
    assert ok is not True, "corrupted proof verified"
    print("corrupted proof rejected OK")

    t0 = time.time()
    with use_mesh(make_mesh(8), msm_min=32):
        tr = Blake2bWrite(Pallas)
        create_proof(params, pk, [circuit], [[inst]], ChaCha20Rng(b"\x2a" * 32), tr)
        sharded = tr.finalize()
    print(f"mesh proof: {time.time()-t0:.1f}s, {len(sharded)} bytes")
    assert sharded == single, "mesh proof bytes differ from single-chip"
    print("MESH PROOF BYTES == SINGLE-CHIP PROOF BYTES")


if __name__ == "__main__":
    main()
