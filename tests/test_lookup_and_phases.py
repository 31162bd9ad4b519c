"""End-to-end tests for the lookup argument and the multi-phase challenge API
(reference parity: examples with lookup tables, examples/shuffle.rs)."""

import pytest

from halo2_tpu.curves import Vesta
from halo2_tpu.dev.mock_prover import MockProver
from halo2_tpu.fields import Fp
from halo2_tpu.frontend import Circuit, Value
from halo2_tpu.plonk import ConstraintSystem, FIRST_PHASE, SECOND_PHASE
from halo2_tpu.plonk.keygen import keygen_pk, keygen_vk
from halo2_tpu.plonk.prover import create_proof
from halo2_tpu.plonk.verifier import verify_proof
from halo2_tpu.plonk.error import Error, OpeningError
from halo2_tpu.poly import Rotation
from halo2_tpu.poly.ipa import ParamsIPA
from halo2_tpu.transcript import Blake2bRead, Blake2bWrite, TranscriptError
from halo2_tpu.utils.chacha import ChaCha20Rng

pytestmark = pytest.mark.slow

K = 5
TABLE_BITS = 3  # table = [0, 8)


class RangeCheckCircuit(Circuit):
    """Advice values range-checked against a fixed table via a lookup."""

    N_VALUES = 5

    def __init__(self, values=None):
        # values: list of length N_VALUES (None entries = unknown witness);
        # circuit shape (selector pattern) is witness-independent
        self.values = values if values is not None else [None] * self.N_VALUES
        assert len(self.values) == self.N_VALUES

    def without_witnesses(self):
        return RangeCheckCircuit(None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        advice = meta.advice_column()
        table = meta.lookup_table_column()
        q = meta.complex_selector()

        def lookup_map(cells):
            a = cells.query_advice(advice, Rotation.cur())
            qq = cells.query_selector(q)
            # gate the input: disabled rows look up 0 (present in table)
            return [(qq * a, table)]

        meta.lookup("range", lookup_map)
        return (advice, table, q)

    def synthesize(self, config, layouter):
        advice, table, q = config

        def fill_table(t):
            for i in range(1 << TABLE_BITS):
                t.assign_cell(table, i, i, f"row {i}")

        layouter.assign_table("table", fill_table)

        values = self.values

        def region_fn(region):
            for i, v in enumerate(values):
                q.enable(region, i)
                region.assign_advice(advice, i, Value.known(v) if v is not None else Value.unknown(), f"v{i}")

        layouter.assign_region("values", region_fn)


def test_lookup_mock_prover():
    prover = MockProver.run(K, RangeCheckCircuit([1, 5, 7, 0, 3]), [], field_cls=Fp)
    prover.assert_satisfied()
    bad = MockProver.run(K, RangeCheckCircuit([1, 200, 0, 0, 0]), [], field_cls=Fp)
    assert any(f.kind == "lookup" for f in bad.verify())


@pytest.fixture(scope="module")
def lookup_setup():
    params = ParamsIPA.cached(Vesta, K)
    circuit = RangeCheckCircuit(None)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk


def test_lookup_prove_verify(lookup_setup):
    params, vk, pk = lookup_setup
    circuit = RangeCheckCircuit([1, 5, 7, 0, 3])
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [circuit], [[]], ChaCha20Rng(b"\x11" * 32), t)
    proof = t.finalize()
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof)) is True
    # corrupt -> reject
    bad = bytearray(proof)
    bad[7] ^= 0x40
    with pytest.raises((OpeningError, Error, TranscriptError, ValueError)):
        verify_proof(params, vk, [[]], Blake2bRead(Vesta, bytes(bad)))


def test_lookup_out_of_range_witness_fails_to_prove(lookup_setup):
    params, vk, pk = lookup_setup
    from halo2_tpu.plonk.error import ConstraintSystemFailure

    circuit = RangeCheckCircuit([1, 200, 0, 0, 0])
    t = Blake2bWrite(Vesta)
    with pytest.raises(ConstraintSystemFailure):
        create_proof(params, pk, [circuit], [[]], ChaCha20Rng(b"\x12" * 32), t)


class ShuffleCircuit(Circuit):
    """Multi-phase: proves column b is a permutation of column a using a
    grand product over a challenge theta (reference examples/shuffle.rs)."""

    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def without_witnesses(self):
        return ShuffleCircuit(None, None)

    @classmethod
    def configure(cls, meta: ConstraintSystem):
        a = meta.advice_column_in(FIRST_PHASE)
        b = meta.advice_column_in(FIRST_PHASE)
        z = meta.advice_column_in(SECOND_PHASE)
        theta = meta.challenge_usable_after(FIRST_PHASE)
        q = meta.selector()
        q_last = meta.selector()

        def shuffle_gate(cells):
            qq = cells.query_selector(q)
            av = cells.query_advice(a, Rotation.cur())
            bv = cells.query_advice(b, Rotation.cur())
            zv = cells.query_advice(z, Rotation.cur())
            z_next = cells.query_advice(z, Rotation.next())
            th = cells.query_challenge(theta)
            # z_{i+1} * (b_i + theta) = z_i * (a_i + theta)
            return [qq * (z_next * (bv + th) - zv * (av + th))]

        meta.create_gate("shuffle", shuffle_gate)

        def boundary_gate(cells):
            ql = cells.query_selector(q_last)
            zv = cells.query_advice(z, Rotation.cur())
            return [ql * (zv - 1)]

        meta.create_gate("boundary", boundary_gate)
        return (a, b, z, theta, q, q_last)

    def synthesize(self, config, layouter):
        a_col, b_col, z_col, theta, q, q_last = config
        p = Fp.MODULUS
        theta_val = layouter.get_challenge(theta)
        n_items = len(self.a) if self.a else 4

        def region_fn(region):
            q_last.enable(region, 0)
            if self.a is None:
                avs = [Value.unknown()] * n_items
                bvs = [Value.unknown()] * n_items
            else:
                avs = [Value.known(v) for v in self.a]
                bvs = [Value.known(v) for v in self.b]
            region.assign_advice(z_col, 0, Value.known(1), "z0")
            z = Value.known(1)
            for i in range(n_items):
                q.enable(region, i)
                region.assign_advice(a_col, i, avs[i], f"a{i}")
                region.assign_advice(b_col, i, bvs[i], f"b{i}")
                num = avs[i].zip(theta_val).map(lambda t: (t[0] + t[1]) % p)
                den = bvs[i].zip(theta_val).map(lambda t: pow((t[0] + t[1]) % p, -1, p))
                z = z.zip(num).map(lambda t: t[0] * t[1] % p)
                z = z.zip(den).map(lambda t: t[0] * t[1] % p)
                region.assign_advice(z_col, i + 1, z, f"z{i+1}")
            q_last.enable(region, n_items)

        layouter.assign_region("shuffle", region_fn)


def test_shuffle_multiphase_prove_verify():
    params = ParamsIPA.cached(Vesta, K)
    circuit = ShuffleCircuit(None, None)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)

    a = [5, 9, 13, 21]
    b = [13, 5, 21, 9]
    t = Blake2bWrite(Vesta)
    create_proof(params, pk, [ShuffleCircuit(a, b)], [[]], ChaCha20Rng(b"\x21" * 32), t)
    proof = t.finalize()
    assert verify_proof(params, vk, [[]], Blake2bRead(Vesta, proof)) is True

    # not a permutation -> proof cannot verify
    t2 = Blake2bWrite(Vesta)
    create_proof(params, pk, [ShuffleCircuit(a, [13, 5, 21, 10])], [[]],
                 ChaCha20Rng(b"\x22" * 32), t2)
    with pytest.raises((OpeningError, Error, TranscriptError, ValueError)):
        verify_proof(params, vk, [[]], Blake2bRead(Vesta, t2.finalize()))
