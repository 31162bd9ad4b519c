"""Multi-chip sharding layer: mesh/shard_map replacements for rayon.

The reference's only parallelism is shared-memory chunking via rayon
(`halo2_proofs/src/multicore.rs`, `arithmetic.rs:310-327`). The TPU-native
counterpart (SURVEY.md section 2c / section 5 "distributed communication
backend") shards the three hot axes over a `jax.sharding.Mesh`:

  * **NTT** - four-step decomposition (mirroring the split -> shuffle ->
    sub-FFT -> unshuffle structure of `fft/parallel.rs:195-255`) with the
    transpose steps as `lax.all_to_all` over ICI (`ntt.py`).
  * **MSM** - points sharded per device; each device runs the private-bucket
    scan kernel on its slab, bucket grids are tree-reduced across devices
    with log2(D) `ppermute` rounds (`msm.py`).
  * **evaluate_h** - the fork's extended-domain part axis
    (`domain.rs:314-380`, `plonk/evaluation.rs:394-975`) doubles as the
    device-sharding axis: pointwise constraint programs are evaluated on
    row-sharded extended vectors around the sharded NTTs (`quotient.py`).
"""

from .context import MeshContext, active_mesh, use_mesh
from .ntt import FourStepNtt, make_mesh
from .msm import sharded_msm
from .quotient import ShardedQuotient

__all__ = [
    "FourStepNtt",
    "MeshContext",
    "ShardedQuotient",
    "active_mesh",
    "make_mesh",
    "sharded_msm",
    "use_mesh",
]
