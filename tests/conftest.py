"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices exactly like the driver's
`dryrun_multichip` harness.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU even though the environment routes JAX to the tunneled single
# TPU chip ('axon' platform overrides the JAX_PLATFORMS env var; only the
# config API wins). Eager per-op dispatch over the tunnel is pathologically
# slow; tests validate sharding on 8 virtual host devices instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: limb-arithmetic graphs are large (hundreds of
# scalar-limb ops) and CPU XLA takes 10-30s per kernel; cache across runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
