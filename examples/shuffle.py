"""Multi-phase challenge API example (reference examples/shuffle.rs):
prove that one list is a permutation of another using a second-phase
grand-product column keyed by first-phase challenges."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import random

from test_lookup_and_phases import ShuffleCircuit

from halo2_tpu.curves import Vesta
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng


def main():
    random.seed(0)
    original = [random.randrange(1, 1000) for _ in range(4)]
    shuffled = list(original)
    random.shuffle(shuffled)

    params = ParamsIPA.cached(Vesta, 4)
    empty = ShuffleCircuit(None, None)
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)

    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [ShuffleCircuit(original, shuffled)], [[]],
                 ChaCha20Rng(b"\x11" * 32), t)
    proof = t.finalize()
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof)) is True
    print(f"shuffle proof verified ({len(proof)} bytes)")

    # negative test: a non-permutation must fail to prove a valid statement
    bad = list(shuffled)
    bad[0] = (bad[0] + 1) % 1000
    t2 = Blake2bWrite(Vesta)
    create_proof(params, pk, [ShuffleCircuit(original, bad)], [[]],
                 ChaCha20Rng(b"\x12" * 32), t2)
    try:
        ok = verify_proof(params, vk, [[]], Blake2bRead(Vesta, t2.finalize()))
        assert ok is not True
    except Exception:
        pass
    print("corrupted shuffle rejected")


if __name__ == "__main__":
    main()
