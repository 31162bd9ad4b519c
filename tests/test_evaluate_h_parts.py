"""Part-wise vs full-domain evaluate_h equivalence (the oracle for the
fork's memory-optimized engine; reference domain.rs:794-901 and
evaluation.rs:394-975)."""

import os

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit
from halo2_tpu.plonk import ConstraintSystem
from halo2_tpu.poly import Rotation
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MixedDegreeCircuit, MulCircuit

pytestmark = pytest.mark.slow


def _proof(params, pk, monkeypatch_env):
    os.environ["EVAL_H"] = monkeypatch_env
    try:
        p = Fp.MODULUS
        c = 7 * 4 * 9 % p
        t = Blake2bWrite(Vesta)
        create_proof(params, pk, [MulCircuit(7, 2, 3)], [[[c]]],
                     ChaCha20Rng(b"\x2a" * 32), t)
        return t.finalize(), c
    finally:
        os.environ.pop("EVAL_H", None)


def test_parts_and_full_produce_identical_proofs():
    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))
    proof_full, c = _proof(params, pk, "full")
    proof_parts, _ = _proof(params, pk, "parts")
    assert proof_full == proof_parts
    assert verify_proof(params, vk, [[[c]]], Blake2bRead(Vesta, proof_parts)) is True



def test_mixed_degree_clusters_identical_proofs():
    """Cluster-aware parts engine == full fold on a circuit whose
    constraints span clusters (degree 2/5 gates + lookup + permutation)."""
    params = ParamsIPA.cached(Vesta, 5)
    circuit = MixedDegreeCircuit()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    # L must be >= 2 for a real cluster split
    assert vk.domain.extended_k - vk.domain.k >= 2

    witness = MixedDegreeCircuit([3, 5, 7])

    def prove(mode):
        os.environ["EVAL_H"] = mode
        try:
            t = Blake2bWrite(Vesta)
            create_proof(params, pk, [witness], [[]], ChaCha20Rng(b"\x2b" * 32), t)
            return t.finalize()
        finally:
            os.environ.pop("EVAL_H", None)

    proof_full = prove("full")
    proof_parts = prove("parts")
    assert proof_full == proof_parts
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof_parts)) is True
