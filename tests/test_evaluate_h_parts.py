"""Part-wise vs full-domain evaluate_h equivalence (the oracle for the
fork's memory-optimized engine; reference domain.rs:794-901 and
evaluation.rs:394-975)."""

import os

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng

from circuits import MulCircuit


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
