"""Native (C++) host arithmetic: Pippenger MSM, bucket tails, batch
normalization.

The reference's host compute path is native Rust (`best_multiexp`,
`arithmetic.rs:41-198`; field ops in halo2curves). Here the *device* path
is JAX/Pallas, and this package supplies the native host tails the device
kernels hand off to. Everything is optional: `H2_NATIVE=0` (or a missing
g++) falls back to the pure-Python spec layer in `halo2_tpu.curves`, which
remains the correctness oracle (tests/test_native.py pins equality).

Encodings across the ctypes ABI (all little-endian, plain non-Montgomery):
  field element  32 bytes
  affine point   64 bytes, (0,0) = identity
  Jacobian point 96 bytes, Z = 0 = identity
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

_LIB = None
_LOADED = False
_CURVE_IDS: dict = {}


def _load():
    global _LIB, _LOADED
    if _LOADED:
        return _LIB
    _LOADED = True
    if os.environ.get("H2_NATIVE", "1") == "0":
        return None
    from .build import ensure_built

    path = ensure_built()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.h2_curve_new.restype = ctypes.c_int
    lib.h2_curve_new.argtypes = [ctypes.c_char_p]
    lib.h2_msm.restype = None
    lib.h2_msm.argtypes = [
        ctypes.c_int, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.h2_bucket_fold.restype = None
    lib.h2_bucket_fold.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.h2_batch_normalize.restype = None
    lib.h2_batch_normalize.argtypes = [
        ctypes.c_int, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.h2_mul.restype = None
    lib.h2_mul.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.h2_g_ntt.restype = None
    lib.h2_g_ntt.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _mod_id(p: int) -> int:
    lib = _load()
    if p not in _CURVE_IDS:
        cid = lib.h2_curve_new(p.to_bytes(32, "little"))
        if cid < 0:
            raise RuntimeError("native curve registry full")
        _CURVE_IDS[p] = cid
    return _CURVE_IDS[p]


def _curve_id(curve) -> int:
    return _mod_id(curve.BASE.MODULUS)


def _encode_affine(points) -> bytes:
    out = bytearray(64 * len(points))
    for i, pt in enumerate(points):
        if pt.is_identity():
            continue  # zeros = identity
        x, y = pt.xy
        out[64 * i : 64 * i + 32] = x.to_bytes(32, "little")
        out[64 * i + 32 : 64 * i + 64] = y.to_bytes(32, "little")
    return bytes(out)


def _decode_jac(buf: bytes):
    x = int.from_bytes(buf[:32], "little")
    y = int.from_bytes(buf[32:64], "little")
    z = int.from_bytes(buf[64:96], "little")
    return (x, y, z)


def native_msm(scalars: Sequence[int], points, curve, c: int, nwin: int):
    """Pippenger MSM via the native library; returns a plain Jacobian tuple
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cid = _curve_id(curve)
    n = len(scalars)
    sbuf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    pbuf = _encode_affine(points)
    out = ctypes.create_string_buffer(96)
    lib.h2_msm(cid, n, sbuf, pbuf, c, nwin, out)
    return _decode_jac(out.raw)


def native_bucket_fold(window_buckets, curve, nwin: int, c: int):
    """Fold nwin * 2^c affine bucket Points; returns a plain Jacobian tuple
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cid = _curve_id(curve)
    buf = _encode_affine(window_buckets)
    out = ctypes.create_string_buffer(96)
    lib.h2_bucket_fold(cid, nwin, c, buf, out)
    return _decode_jac(out.raw)


def native_g_ntt(jacs, curve, logn: int, omega_inv: int, n_inv: int,
                 q: int):
    """Inverse NTT over Jacobian points (ParamsIPA g -> g_lagrange);
    returns the transformed plain-Jacobian list or None when the library is
    unavailable. Twiddle powers are computed here in the scalar field and
    streamed to C++ flat (stage-major, j-minor)."""
    lib = _load()
    if lib is None:
        return None
    cid = _curve_id(curve)
    n = 1 << logn
    buf = bytearray(96 * n)
    for i, (x, y, z) in enumerate(jacs):
        buf[96 * i : 96 * i + 32] = x.to_bytes(32, "little")
        buf[96 * i + 32 : 96 * i + 64] = y.to_bytes(32, "little")
        buf[96 * i + 64 : 96 * i + 96] = z.to_bytes(32, "little")
    tw = bytearray(32 * max(1, n - 1))
    off = 0
    m = 1
    while m < n:
        w_m = pow(omega_inv, n // (2 * m), q)
        w = 1
        for _ in range(m):
            tw[32 * off : 32 * off + 32] = w.to_bytes(32, "little")
            w = w * w_m % q
            off += 1
        m *= 2
    arr = ctypes.create_string_buffer(bytes(buf), 96 * n)
    lib.h2_g_ntt(cid, logn, arr, bytes(tw), n_inv.to_bytes(32, "little"))
    raw = arr.raw
    out = []
    for i in range(n):
        out.append(
            (
                int.from_bytes(raw[96 * i : 96 * i + 32], "little"),
                int.from_bytes(raw[96 * i + 32 : 96 * i + 64], "little"),
                int.from_bytes(raw[96 * i + 64 : 96 * i + 96], "little"),
            )
        )
    return out


def native_point_mul(xy, k: int, curve):
    """[k]P for affine P = (x, y); returns a plain Jacobian tuple or None
    when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cid = _curve_id(curve)
    out = ctypes.create_string_buffer(96)
    lib.h2_mul(
        cid, int(k).to_bytes(32, "little"),
        xy[0].to_bytes(32, "little") + xy[1].to_bytes(32, "little"), out,
    )
    return _decode_jac(out.raw)


def native_batch_normalize(jacs, modulus: int):
    """Batch Jacobian -> affine; returns list of (x, y) or None (identity)
    tuples, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cid = _mod_id(modulus)
    n = len(jacs)
    buf = bytearray(96 * n)
    for i, (x, y, z) in enumerate(jacs):
        buf[96 * i : 96 * i + 32] = x.to_bytes(32, "little")
        buf[96 * i + 32 : 96 * i + 64] = y.to_bytes(32, "little")
        buf[96 * i + 64 : 96 * i + 96] = z.to_bytes(32, "little")
    out = ctypes.create_string_buffer(64 * n)
    lib.h2_batch_normalize(cid, n, bytes(buf), out)
    res = []
    raw = out.raw
    for i in range(n):
        x = int.from_bytes(raw[64 * i : 64 * i + 32], "little")
        y = int.from_bytes(raw[64 * i + 32 : 64 * i + 64], "little")
        res.append(None if x == 0 and y == 0 else (x, y))
    return res
