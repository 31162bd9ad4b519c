"""Shared circuit builders for the golden determinism matrix
(tests/test_golden_matrix.py + tools/regen_golden_matrix.py).

Config shapes follow BASELINE.md's gating configs:
  2. Poseidon hash gadget (halo2_gadgets/benches/poseidon.rs workload), k=11
  4. Sinsemilla hash + generator-table lookup argument, k=14
Config 1 (simple mul circuit, k=4/8) is pinned by tests/test_golden.py;
config 3 is the kernel-level MSM/NTT oracle (tests/test_msm_*.py,
test_ntt_*.py); config 5 is the multi-chip dryrun (tests/test_mesh_prover.py).
"""

from __future__ import annotations


def _prove_ipa(params, pk, circuits, instances, seed: bytes):
    from halo2_tpu.curves import Vesta
    from halo2_tpu.plonk.prover import create_proof
    from halo2_tpu.transcript import Blake2bWrite
    from halo2_tpu.utils.chacha import ChaCha20Rng

    t = Blake2bWrite(Vesta)
    create_proof(params, pk, circuits, instances, ChaCha20Rng(seed), t)
    return t.finalize()


def _poseidon_k11():
    from test_poseidon_gadget import HashCircuit

    from halo2_tpu.curves import Vesta
    from halo2_tpu.gadgets.poseidon_primitives import (
        ConstantLength,
        P128Pow5T3Fp,
        poseidon_hash,
    )
    from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
    from halo2_tpu.poly.ipa import ParamsIPA

    msg = [7, 11]
    expected = poseidon_hash(msg, P128Pow5T3Fp, ConstantLength(2))
    params = ParamsIPA.cached(Vesta, 11)
    vk = keygen_vk(params, HashCircuit(None))
    pk = keygen_pk(params, vk, HashCircuit(None))

    def prove(pk):
        return _prove_ipa(
            params, pk, [HashCircuit(msg)], [[[expected]]], b"\x02" * 32
        )

    def verify(proof):
        from halo2_tpu.plonk.verifier import verify_proof
        from halo2_tpu.transcript import Blake2bRead

        return verify_proof(params, vk, [[[expected]]], Blake2bRead(Vesta, proof))

    return vk, pk, prove, verify


def _sinsemilla_k14():
    import random

    from test_sinsemilla_gadget import NUM_WORDS, SinsemillaCircuit

    from halo2_tpu.curves import Vesta
    from halo2_tpu.gadgets.sinsemilla_primitives import K
    from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
    from halo2_tpu.poly.ipa import ParamsIPA

    rng = random.Random(21)
    bits = [bool(rng.getrandbits(1)) for _ in range(NUM_WORDS * K)]
    params = ParamsIPA.cached(Vesta, 14)
    vk = keygen_vk(params, SinsemillaCircuit(None))
    pk = keygen_pk(params, vk, SinsemillaCircuit(None))

    def prove(pk):
        return _prove_ipa(params, pk, [SinsemillaCircuit(bits)], [[]], b"\x04" * 32)

    def verify(proof):
        from halo2_tpu.plonk.verifier import verify_proof
        from halo2_tpu.transcript import Blake2bRead

        return verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof))

    return vk, pk, prove, verify


def golden_configs():
    def wrap(builder):
        def build():
            vk, pk, prove, _verify = builder()
            return vk, pk, prove

        return build

    return [
        {"name": "poseidon_k11", "build": wrap(_poseidon_k11), "full": _poseidon_k11},
        {"name": "sinsemilla_k14", "build": wrap(_sinsemilla_k14), "full": _sinsemilla_k14},
    ]
