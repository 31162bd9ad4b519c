//! Capture reference golden values for halo2_tpu's bit-exactness harness.
//!
//! Proves the simple-example multiplication circuit (the same circuit as
//! halo2_tpu's tests/circuits.py::MulCircuit and the reference's
//! halo2_proofs/examples/simple-example.rs) at k = 4 with IPA/Vesta and a
//! Blake2b transcript, using a fixed ChaCha20 seed (0x2a * 32) so the
//! proof bytes are deterministic, then prints the fixture JSON consumed by
//! halo2_tpu's tests/test_golden.py (same schema as
//! tests/fixtures_golden.json, plus the raw proof hex).
//!
//! Usage: cargo run --release > fixtures_golden_rust.json
//! Then diff against tests/fixtures_golden.json: all five fields must
//! match halo2_tpu's self-pinned values (BASELINE.md gating config 1;
//! reference golden-pinning analogue: halo2_proofs/tests/plonk_api.rs).

use blake2b_simd::Params as Blake2bParams;
use ff::{Field, FromUniformBytes, PrimeField};
use halo2_proofs::circuit::{AssignedCell, Layouter, SimpleFloorPlanner, Value};
use halo2_proofs::plonk::{
    create_proof, keygen_pk, keygen_vk, verify_proof, Advice, Circuit, Column,
    ConstraintSystem, Error, Fixed, Instance, Selector,
};
use halo2_proofs::poly::commitment::ParamsProver;
use halo2_proofs::poly::ipa::commitment::{IPACommitmentScheme, ParamsIPA};
use halo2_proofs::poly::ipa::multiopen::{ProverIPA, VerifierIPA};
use halo2_proofs::poly::ipa::strategy::SingleStrategy;
use halo2_proofs::poly::{Rotation, VerificationStrategy};
use halo2_proofs::transcript::{
    Blake2bRead, Blake2bWrite, Challenge255, TranscriptReadBuffer, TranscriptWriterBuffer,
};
use halo2curves::pasta::{vesta, Fp};
use rand_chacha::rand_core::SeedableRng;
use rand_chacha::ChaCha20Rng;
use sha2::{Digest, Sha256};

#[derive(Clone)]
struct MulConfig {
    advice0: Column<Advice>,
    advice1: Column<Advice>,
    instance: Column<Instance>,
    s_mul: Selector,
}

#[derive(Default)]
struct MulCircuit {
    constant: Fp,
    a: Value<Fp>,
    b: Value<Fp>,
}

impl Circuit<Fp> for MulCircuit {
    type Config = MulConfig;
    type FloorPlanner = SimpleFloorPlanner;

    fn without_witnesses(&self) -> Self {
        Self {
            constant: self.constant,
            ..Default::default()
        }
    }

    fn configure(meta: &mut ConstraintSystem<Fp>) -> MulConfig {
        // Column/gate order matters: it must mirror
        // halo2_tpu/tests/circuits.py::MulCircuit.configure exactly.
        let advice0 = meta.advice_column();
        let advice1 = meta.advice_column();
        let instance = meta.instance_column();
        let constant: Column<Fixed> = meta.fixed_column();
        meta.enable_equality(instance);
        meta.enable_constant(constant);
        meta.enable_equality(advice0);
        meta.enable_equality(advice1);
        let s_mul = meta.selector();

        meta.create_gate("mul", |meta| {
            let lhs = meta.query_advice(advice0, Rotation::cur());
            let rhs = meta.query_advice(advice1, Rotation::cur());
            let out = meta.query_advice(advice0, Rotation::next());
            let s = meta.query_selector(s_mul);
            vec![s * (lhs * rhs - out)]
        });
        MulConfig {
            advice0,
            advice1,
            instance,
            s_mul,
        }
    }

    fn synthesize(
        &self,
        config: MulConfig,
        mut layouter: impl Layouter<Fp>,
    ) -> Result<(), Error> {
        let mut load_private = |name: &str, value: Value<Fp>| {
            layouter.assign_region(
                || name.to_string(),
                |mut region| region.assign_advice(|| name, config.advice0, 0, || value),
            )
        };
        let a = load_private("load a", self.a)?;
        let b = load_private("load b", self.b)?;
        let constant = layouter.assign_region(
            || "load constant",
            |mut region| {
                region.assign_advice_from_constant(
                    || "constant",
                    config.advice0,
                    0,
                    self.constant,
                )
            },
        )?;

        let mut mul = |name: &str,
                       lhs: &AssignedCell<Fp, Fp>,
                       rhs: &AssignedCell<Fp, Fp>|
         -> Result<AssignedCell<Fp, Fp>, Error> {
            layouter.assign_region(
                || name.to_string(),
                |mut region| {
                    config.s_mul.enable(&mut region, 0)?;
                    lhs.copy_advice(|| "lhs", &mut region, config.advice0, 0)?;
                    rhs.copy_advice(|| "rhs", &mut region, config.advice1, 0)?;
                    let out = lhs.value().copied() * rhs.value();
                    region.assign_advice(|| "lhs*rhs", config.advice0, 1, || out)
                },
            )
        };
        let ab = mul("ab", &a, &b)?;
        let absq = mul("absq", &ab, &ab)?;
        let c = mul("c", &constant, &absq)?;
        layouter.constrain_instance(c.cell(), config.instance, 0)
    }
}

fn fp_hex(v: Fp) -> String {
    // little-endian repr -> big-endian 0x hex (matches hex(int) in Python)
    let repr = v.to_repr();
    let mut bytes = repr.as_ref().to_vec();
    bytes.reverse();
    let s = bytes
        .iter()
        .map(|b| format!("{:02x}", b))
        .collect::<String>();
    format!("0x{}", s.trim_start_matches('0'))
}

fn main() {
    let k = 4u32;
    let constant = Fp::from(7);
    let a = Fp::from(2);
    let b = Fp::from(3);
    let c = constant * a.square() * b.square();

    let params: ParamsIPA<vesta::Affine> = ParamsIPA::new(k);
    let empty = MulCircuit {
        constant,
        a: Value::unknown(),
        b: Value::unknown(),
    };
    let vk = keygen_vk(&params, &empty).expect("keygen_vk");

    // transcript_repr: the scalar the verifier hashes first
    // (plonk.rs:302-315: blake2b-512 personal "Halo2-Verify-Key" over the
    // pinned Debug string, then from_uniform_bytes)
    let pinned = format!("{:?}", vk.pinned());
    let hasher = Blake2bParams::new()
        .hash_length(64)
        .personal(b"Halo2-Verify-Key")
        .to_state()
        .update(pinned.as_bytes())
        .finalize();
    let mut uniform = [0u8; 64];
    uniform.copy_from_slice(hasher.as_bytes());
    let transcript_repr = Fp::from_uniform_bytes(&uniform);

    let pk = keygen_pk(&params, vk, &empty).expect("keygen_pk");

    let circuit = MulCircuit {
        constant,
        a: Value::known(a),
        b: Value::known(b),
    };
    let rng = ChaCha20Rng::from_seed([0x2a; 32]);
    let mut transcript = Blake2bWrite::<Vec<u8>, vesta::Affine, Challenge255<_>>::init(vec![]);
    create_proof::<IPACommitmentScheme<vesta::Affine>, ProverIPA<_>, _, _, _, _>(
        &params,
        &pk,
        &[circuit],
        &[&[&[c]]],
        rng,
        &mut transcript,
    )
    .expect("create_proof");
    let proof = transcript.finalize();

    // sanity: the proof verifies
    let strategy = SingleStrategy::new(&params);
    let mut rt = Blake2bRead::<&[u8], vesta::Affine, Challenge255<_>>::init(&proof[..]);
    verify_proof::<IPACommitmentScheme<vesta::Affine>, VerifierIPA<_>, _, _, _>(
        &params,
        pk.get_vk(),
        strategy,
        &[&[&[c]]],
        &mut rt,
    )
    .expect("verify_proof");

    let pinned_sha = Sha256::digest(pinned.as_bytes());
    let proof_sha = Sha256::digest(&proof);
    let hex = |d: &[u8]| d.iter().map(|b| format!("{:02x}", b)).collect::<String>();
    println!("{{");
    println!(
        " \"vk_transcript_repr\": \"{}\",",
        fp_hex(transcript_repr)
    );
    println!(" \"vk_pinned_sha256\": \"{}\",", hex(&pinned_sha));
    println!(" \"proof_len\": {},", proof.len());
    println!(" \"proof_sha256\": \"{}\",", hex(&proof_sha));
    println!(" \"proof_hex\": \"{}\",", hex(&proof));
    println!(" \"source\": \"taikoxyz/halo2 reference capture\"");
    println!("}}");
}
