"""Limb packing: Python bigints <-> (batch, 16) uint32 tensors of 16-bit limbs.

The on-device representation of a field element batch is a uint32 tensor
whose last axis holds 16 little-endian limbs of 16 bits each (256 bits
total). 16-bit limbs are chosen so that a limb product fits exactly in a
uint32 lane (TPU VPU has no 32x32->64 multiply) and a full column of
schoolbook products plus Montgomery-reduction terms accumulates without
overflow (<= 64 terms * 2^16 < 2^23 per column; see field_jax.mont_mul).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int) -> np.ndarray:
    """One 256-bit integer -> (16,) uint32 limb vector."""
    b = v.to_bytes(32, "little")
    return np.frombuffer(b, dtype="<u2").astype(np.uint32)


def ints_to_limbs(vals: Sequence[int]) -> np.ndarray:
    """Batch of integers -> (n, 16) uint32 limbs."""
    buf = b"".join(v.to_bytes(32, "little") for v in vals)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(vals), NLIMBS)
    return arr.astype(np.uint32)


def limbs_to_int(l: np.ndarray) -> int:
    """(16,) limb vector -> integer."""
    l = np.asarray(l, dtype=np.uint32)
    return int.from_bytes(l.astype("<u2").tobytes(), "little")


def limbs_to_ints(arr: np.ndarray) -> List[int]:
    """(n, 16) limbs -> list of integers."""
    arr = np.asarray(arr, dtype=np.uint32).astype("<u2")
    raw = arr.tobytes()
    return [int.from_bytes(raw[32 * i : 32 * i + 32], "little") for i in range(arr.shape[0])]
