"""halo2_tpu: a TPU-native PLONKish zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
`taikoxyz/halo2` (see SURVEY.md): circuit-definition front-end, key
generation, prover/verifier with IPA (Pasta) and KZG (BN254) polynomial
commitment schemes, Blake2b/Keccak256 Fiat-Shamir transcripts, MockProver
dev tooling, and a gadget library - with the hot kernels (multi-limb field
arithmetic, NTT, Pippenger MSM, quotient evaluation) designed for TPU:
batched limb tensors in VMEM-friendly layouts, branchless complete curve
formulas, and `shard_map` sharding over device meshes.
"""

__version__ = "0.1.0"

# Facade re-exports (the reference `halo2` crate re-exports halo2_proofs,
# halo2/src/lib.rs); resolved lazily so `import halo2_tpu` stays light.
_EXPORTS = {
    # plonk core
    "ConstraintSystem": ("halo2_tpu.plonk", "ConstraintSystem"),
    "keygen_vk": ("halo2_tpu.plonk.keygen", "keygen_vk"),
    "keygen_pk": ("halo2_tpu.plonk.keygen", "keygen_pk"),
    "VerifyingKey": ("halo2_tpu.plonk.keygen", "VerifyingKey"),
    "ProvingKey": ("halo2_tpu.plonk.keygen", "ProvingKey"),
    "create_proof": ("halo2_tpu.plonk.prover", "create_proof"),
    "verify_proof": ("halo2_tpu.plonk.verifier", "verify_proof"),
    "BatchVerifier": ("halo2_tpu.plonk.batch", "BatchVerifier"),
    # front-end
    "Circuit": ("halo2_tpu.frontend", "Circuit"),
    "Layouter": ("halo2_tpu.frontend", "Layouter"),
    "Region": ("halo2_tpu.frontend", "Region"),
    "Value": ("halo2_tpu.frontend", "Value"),
    "AssignedCell": ("halo2_tpu.frontend", "AssignedCell"),
    # poly / commitments
    "Rotation": ("halo2_tpu.poly", "Rotation"),
    "EvaluationDomain": ("halo2_tpu.poly.domain", "EvaluationDomain"),
    "ParamsIPA": ("halo2_tpu.poly.ipa", "ParamsIPA"),
    "ParamsKZG": ("halo2_tpu.poly.kzg", "ParamsKZG"),
    # transcripts
    "Blake2bWrite": ("halo2_tpu.transcript", "Blake2bWrite"),
    "Blake2bRead": ("halo2_tpu.transcript", "Blake2bRead"),
    "Keccak256Write": ("halo2_tpu.transcript", "Keccak256Write"),
    "Keccak256Read": ("halo2_tpu.transcript", "Keccak256Read"),
    # dev tooling
    "MockProver": ("halo2_tpu.dev.mock_prover", "MockProver"),
    "CircuitCost": ("halo2_tpu.dev.cost", "CircuitCost"),
    # fields / curves
    "Fp": ("halo2_tpu.fields", "Fp"),
    "Fq": ("halo2_tpu.fields", "Fq"),
    "Pallas": ("halo2_tpu.curves", "Pallas"),
    "Vesta": ("halo2_tpu.curves", "Vesta"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'halo2_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
