"""Mul-gate circuit: MockProver check + full IPA prove/verify
(reference examples/simple-example.rs, extended with the real prover)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from circuits import MulCircuit

from halo2_tpu.curves import Vesta
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng


def main():
    constant, a, b = 7, 2, 3
    p = Fp.MODULUS
    c = constant * a * a % p * b % p * b % p

    prover = MockProver.run(4, MulCircuit(constant, a, b), [[c]])
    prover.assert_satisfied()
    print("MockProver satisfied")

    params = ParamsIPA.cached(Vesta, 4)
    vk = keygen_vk(params, MulCircuit(constant))
    pk = keygen_pk(params, vk, MulCircuit(constant))
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [MulCircuit(constant, a, b)], [[[c]]],
                 ChaCha20Rng(b"\x2a" * 32), t)
    proof = t.finalize()
    print(f"proof: {len(proof)} bytes")
    assert verify_proof(params, vk, [[[c]]], Blake2bRead(Vesta, proof)) is True
    print("verified OK")


if __name__ == "__main__":
    main()
