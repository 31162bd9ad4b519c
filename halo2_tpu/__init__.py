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
