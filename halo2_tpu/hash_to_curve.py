"""Hash-to-curve for parameter/generator derivation.

The reference derives IPA generators via pasta_curves'
`hash_to_curve(domain_prefix)` - an expand_message_xmd(BLAKE2b) +
simplified-SWU construction over a 3-isogenous curve (used at
`poly/ipa/commitment.rs:160-201` with prefix "Halo2-Parameters", and by the
Sinsemilla gadget with the "z.cash:*" prefixes).

STATUS: this module currently ships an *interim* deterministic map
(XMD:BLAKE2b field derivation + try-and-increment) that yields valid,
uniformly-derived curve points, so the full proving stack is end-to-end
functional and self-consistent. It is NOT yet byte-compatible with
pasta_curves' SSWU: replacing `map_to_curve` with the exact iso-Pallas SSWU
(validated against the 1024 `SINSEMILLA_S` vectors in
halo2_gadgets/src/sinsemilla/primitives/sinsemilla_s.rs) is tracked parity
work - see docs/PARITY.md.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Type

from .curves import Curve, Point


def _expand_message_xmd_blake2b(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    """RFC 9380 expand_message_xmd with BLAKE2b-512 (block size 128)."""
    b_in_bytes = 64
    r_in_bytes = 128
    ell = -(-len_in_bytes // b_in_bytes)
    assert ell <= 255 and len(dst) <= 255
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(r_in_bytes)
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = hashlib.blake2b(z_pad + msg + l_i_b_str + b"\x00" + dst_prime, digest_size=64).digest()
    bs = []
    prev = hashlib.blake2b(b0 + b"\x01" + dst_prime, digest_size=64).digest()
    bs.append(prev)
    for i in range(2, ell + 1):
        xored = bytes(a ^ b for a, b in zip(b0, prev))
        prev = hashlib.blake2b(xored + bytes([i]) + dst_prime, digest_size=64).digest()
        bs.append(prev)
    return b"".join(bs)[:len_in_bytes]


def hash_to_field(curve: Type[Curve], domain_prefix: str, message: bytes):
    """Two base-field elements from the message (RFC 9380 hash_to_field with
    expand_message_xmd(BLAKE2b), DST = prefix||"-"||curve_id||suffix)."""
    dst = (domain_prefix + "-" + curve.CURVE_ID + "_XMD:BLAKE2b_SSWU_RO_").encode()
    uniform = _expand_message_xmd_blake2b(message, dst, 128)
    F = curve.BASE
    u0 = F.from_uniform_bytes(uniform[:64])
    u1 = F.from_uniform_bytes(uniform[64:])
    return u0, u1


def _map_to_curve_interim(curve: Type[Curve], u) -> Point:
    """Interim deterministic field->curve map (try-and-increment from u).

    To be replaced by the exact simplified-SWU + 3-isogeny of pasta_curves.
    """
    p = curve.p()
    x = u.v
    while True:
        rhs = curve.BASE((x * x % p * x + curve.B) % p)
        y = rhs.sqrt()
        if y is not None:
            # canonical root choice: even y
            yv = y.v if y.v % 2 == 0 else p - y.v
            return Point(curve, (x, yv))
        x = (x + 1) % p


def hash_to_curve(curve: Type[Curve], domain_prefix: str) -> Callable[[bytes], Point]:
    """Returns a message -> point hasher (mirrors CurveExt::hash_to_curve)."""

    def hasher(message: bytes) -> Point:
        u0, u1 = hash_to_field(curve, domain_prefix, message)
        q0 = _map_to_curve_interim(curve, u0)
        q1 = _map_to_curve_interim(curve, u1)
        return q0 + q1

    return hasher
