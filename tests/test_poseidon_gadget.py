"""Pow5 Poseidon chip vs host primitives, checked by MockProver
(mirrors `halo2_gadgets/src/poseidon/pow5.rs` tests: poseidon_permute and
poseidon_hash at k=6/7)."""

import pytest

from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Layouter, Value
from halo2_tpu.gadgets.poseidon import PoseidonHash, Pow5Chip
from halo2_tpu.gadgets.poseidon_primitives import (
    ConstantLength,
    P128Pow5T3Fp,
    permute,
    poseidon_hash,
)
from halo2_tpu.plonk import ConstraintSystem

pytestmark = pytest.mark.slow


class HashCircuit(Circuit):
    def __init__(self, message=None):
        self.message = message  # list of 2 ints or None

    def without_witnesses(self):
        return HashCircuit(None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        width = 3
        state = [meta.advice_column() for _ in range(width)]
        partial_sbox = meta.advice_column()
        rc_a = [meta.fixed_column() for _ in range(width)]
        rc_b = [meta.fixed_column() for _ in range(width)]
        meta.enable_constant(rc_b[0])
        config = Pow5Chip.configure(meta, P128Pow5T3Fp, state, partial_sbox, rc_a, rc_b)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        return config, instance

    def synthesize(self, config, layouter: Layouter):
        pow5_config, instance = config
        chip = Pow5Chip(pow5_config)

        def load_message(region):
            cells = []
            for i in range(2):
                v = Value.unknown() if self.message is None else Value.known(self.message[i])
                cells.append(
                    region.assign_advice(pow5_config.state[i], 0, v, f"load message_{i}")
                )
            return cells

        message = layouter.assign_region("load message", load_message)
        hasher = PoseidonHash(chip, layouter.namespace("init"), ConstantLength(2))
        output = hasher.hash(layouter.namespace("hash"), message)
        layouter.constrain_instance(output.cell(), instance, 0)


def test_poseidon_hash_gadget_mock():
    msg = [101, 202]
    expected = poseidon_hash(msg, P128Pow5T3Fp, ConstantLength(2))
    prover = MockProver.run(7, HashCircuit(msg), [[expected]])
    prover.assert_satisfied()


def test_poseidon_hash_gadget_wrong_output_fails():
    msg = [101, 202]
    expected = poseidon_hash(msg, P128Pow5T3Fp, ConstantLength(2))
    prover = MockProver.run(7, HashCircuit(msg), [[(expected + 1) % Fp.MODULUS]])
    failures = prover.verify()
    assert failures, "expected constraint failures for wrong instance"


def test_poseidon_hash_prove_verify_ipa():
    """Full IPA proof of the Poseidon hash circuit (reference
    halo2_gadgets/benches/poseidon.rs shape, K=7)."""
    from halo2_tpu.curves import Vesta
    from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
    from halo2_tpu.plonk.prover import create_proof
    from halo2_tpu.plonk.verifier import verify_proof
    from halo2_tpu.poly.ipa import ParamsIPA
    from halo2_tpu.transcript import Blake2bRead, Blake2bWrite
    from halo2_tpu.utils.chacha import ChaCha20Rng

    msg = [7, 11]
    expected = poseidon_hash(msg, P128Pow5T3Fp, ConstantLength(2))
    params = ParamsIPA.cached(Vesta, 7)
    empty = HashCircuit(None)
    vk = keygen_vk(params, empty)
    pk = keygen_pk(params, vk, empty)
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [HashCircuit(msg)], [[[expected]]], ChaCha20Rng(b"\x01" * 32), t)
    proof = t.finalize()
    r = Blake2bRead(Vesta, proof)
    assert verify_proof(params, vk, [[[expected]]], r) is True
