"""Active-mesh context: makes `create_proof` itself multi-chip.

The reference's entire parallel backend lives *inside* the hot path (rayon
scopes in `plonk/evaluation.rs:454,507-533`, per-thread MSM splits in
`arithmetic.rs:166-189`). The TPU counterpart is this context: activating a
mesh re-routes the framework's two kernel entry points -

  * `ops.ntt.get_plan`  -> the four-step all-to-all NTT (`parallel.ntt`)
    whenever the transform is large enough for the mesh, and
  * `ops.msm.msm`       -> the point-sharded ppermute-butterfly MSM
    (`parallel.msm`) whenever the point count clears `msm_min` -

so every basis change, coset extension, commitment, and the evaluate_h fold
of an ordinary `create_proof` call runs SPMD over the mesh with NO prover
code changes. All limb math is exact integer arithmetic, so the proof bytes
are identical to the single-chip path (pinned by tests/test_mesh_prover.py).

Usage:

    from halo2_tpu.parallel import use_mesh, make_mesh
    with use_mesh(make_mesh(8)):
        create_proof(params, pk, [circuit], [[inst]], rng, transcript)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh


class MeshContext:
    """A mesh activation: which jax Mesh, which axis, and the dispatch
    thresholds deciding when a problem is large enough to shard."""

    def __init__(self, mesh: Mesh, axis: str = "x", msm_min: int = 1 << 12):
        D = mesh.shape[axis]
        assert D & (D - 1) == 0, "mesh axis size must be a power of two"
        self.mesh = mesh
        self.axis = axis
        self.D = D
        self.log_d = D.bit_length() - 1
        self.msm_min = msm_min

    def can_shard_ntt(self, log_n: int) -> bool:
        """Four-step split needs n >= D^2 (parallel/ntt.py geometry)."""
        return self.D > 1 and log_n >= 2 * self.log_d

    def can_shard_msm(self, n: int) -> bool:
        return self.D > 1 and n >= max(self.msm_min, 8 * self.D)


_ACTIVE: Optional[MeshContext] = None


def active_mesh() -> Optional[MeshContext]:
    return _ACTIVE


@contextmanager
def use_mesh(mesh: Mesh, axis: str = "x", msm_min: int = 1 << 12):
    """Activate `mesh` for every kernel dispatched inside the block."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = MeshContext(mesh, axis, msm_min)
    try:
        yield _ACTIVE
    finally:
        _ACTIVE = prev
