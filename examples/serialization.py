"""Write a proving key to bytes, reload it, and prove with the reloaded key
(reference examples/serialization.rs, KZG/GWC with RawBytesUnchecked)."""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from circuits import MulCircuit

from halo2_tpu.curves import Bn254G1
from halo2_tpu.fields import FrBn
from halo2_tpu.helpers import RAW_BYTES_UNCHECKED
from halo2_tpu.plonk.keygen import ProvingKey, keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.poly.kzg import ParamsKZG
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
from halo2_tpu.utils.chacha import ChaCha20Rng


def main():
    params = ParamsKZG.setup(4, random.Random(42))
    vk = keygen_vk(params, MulCircuit(7))
    pk = keygen_pk(params, vk, MulCircuit(7))

    blob = pk.to_bytes(RAW_BYTES_UNCHECKED)
    print(f"pk serialized: {len(blob)} bytes")
    pk2 = ProvingKey.from_bytes(blob, MulCircuit, params, RAW_BYTES_UNCHECKED)

    p = FrBn.MODULUS
    a, b = 2, 3
    c = 7 * a * a % p * b % p * b % p
    t = Blake2bWrite(Bn254G1)
    create_proof(params, pk2, [MulCircuit(7, a, b)], [[[c]]],
                 ChaCha20Rng(b"\x01" * 32), t, multiopen="gwc")
    proof = t.finalize()
    assert verify_proof(params, pk2.get_vk(), [[[c]]],
                        Blake2bRead(Bn254G1, proof), multiopen="gwc") is True
    print("proved and verified with reloaded pk")


if __name__ == "__main__":
    main()
