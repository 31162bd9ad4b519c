"""Re-derive the pasta_curves iso-curve SSWU constants from first principles.

This script reproduces the constants hard-coded in
`halo2_tpu/hash_to_curve.py` (`_PALLAS_ISO`) without access to the
pasta_curves source:

 1. The 3-division polynomial of Pallas (y^2 = x^3 + 5) is
    psi_3(x) = 3x(x^3 + 20); its nonzero Fp-rational roots are the cube
    roots of -20, each an x-coordinate of an order-3 subgroup defined
    over Fp.
 2. Vélu's formulas give the 3-isogeny image for each kernel:
    a_img = -30 x0^2, b_img = -70 x0^3 - 135 = 1265 (all kernels).
    These are the three conjugate candidates for pasta's IsoEp.
 3. The dual direction: each candidate iso curve has a unique Fp-rational
    3-torsion x-coordinate X0; Vélu from X0 lands on y^2 = x^3 + 3645,
    and the sextic scaling W (W^6 = 5/3645) finishes on Pallas. The
    normalized Vélu map is (x, y) -> (X(x), y X'(x)) with
    X(x) = x + t/(x-X0) + u/(x-X0)^2, t = 6 X0^2 + 2 a, u = 4 g(X0).
 4. Which conjugate + which W branch pasta chose is fixed empirically by
    matching hash_to_curve("z.cash:SinsemillaS") outputs against the
    SINSEMILLA_S table (tests/fixtures_sinsemilla_s.json, sampled from
    halo2_gadgets/src/sinsemilla/primitives/sinsemilla_s.rs).

Run: python tools/derive_sswu_params.py   (takes ~1 min; brute-forces the
18 candidate maps over the first fixture entry, then re-validates the
winner on all fixture entries).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo2_tpu.curves import Pallas, Point  # noqa: E402
from halo2_tpu.fields import Fp  # noqa: E402
from halo2_tpu.hash_to_curve import IsoParams, _iso_map, _sswu_iso, hash_to_field  # noqa: E402

P = Fp.MODULUS
B_ISO = 1265
Z = -13


def cube_roots(v: int, p: int):
    """All cube roots of v mod p (p = 1 mod 3), via AMM + Pohlig-Hellman."""
    if pow(v, (p - 1) // 3, p) != 1:
        return []
    g = 2
    while pow(g, (p - 1) // 3, p) == 1:
        g += 1
    s, t = 0, p - 1
    while t % 3 == 0:
        s += 1
        t //= 3
    gt = pow(g, t, p)
    x = pow(v, pow(3, -1, t), p)

    def dlog3(h):
        e = 0
        gamma = pow(gt, 3 ** (s - 1), p)
        for k in range(s):
            hk = pow(h * pow(gt, -e, p) % p, 3 ** (s - 1 - k), p)
            d, cur = 0, 1
            while cur != hk:
                cur = cur * gamma % p
                d += 1
                assert d < 3
            e += d * 3 ** k
        return e

    e = dlog3(pow(x, 3, p) * pow(v, -1, p) % p)
    assert e % 3 == 0
    x = x * pow(gt, -(e // 3), p) % p
    assert pow(x, 3, p) == v
    w = pow(g, (p - 1) // 3, p)
    return sorted([x, x * w % p, x * w % p * w % p])


def iso_torsion_x(a_iso: int) -> int:
    """The unique Fp-rational root of the iso curve's 3-division polynomial
    3x^4 + 6 a x^2 + 12 b x - a^2 (found by quartic root search via the
    resolvent-free radical structure: roots of psi3 are x-coords of
    3-torsion; solve by factoring over Fp)."""
    # psi3 roots satisfy the quartic; find roots by trying the four roots of
    # the resolvent using generic root extraction: here we simply solve by
    # rational root search over the factorization pattern using sqrt/cbrt
    # towers is messy - use a gcd(x^p - x, psi3) free approach: the quartic
    # has exactly one Fp root for these curves, recoverable by Newton-like
    # search over the factored form. For tooling simplicity use sympy-free
    # Cantor-Zassenhaus.
    import random as _r

    rng = _r.Random(0)
    f = [(-a_iso * a_iso) % P, (12 * B_ISO) % P, (6 * a_iso) % P, 0, 3]

    def pm_rem(a, m):
        a = a[:]
        dm = len(m) - 1
        inv = pow(m[-1], -1, P)
        while len(a) - 1 >= dm:
            c = a[-1] * inv % P
            if c:
                off = len(a) - 1 - dm
                for i, mi in enumerate(m):
                    a[off + i] = (a[off + i] - c * mi) % P
            a.pop()
        while len(a) > 1 and a[-1] == 0:
            a.pop()
        return a

    def pm_mul(a, b, m):
        r = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            if ai:
                for j, bj in enumerate(b):
                    r[i + j] = (r[i + j] + ai * bj) % P
        return pm_rem(r, m)

    def pgcd(a, b):
        while len(b) > 1 or (len(b) == 1 and b[0] != 0):
            a, b = b, pm_rem(a, b)
        return a

    def pdiv(a, b):
        a = a[:]
        out = [0] * (len(a) - len(b) + 1)
        inv = pow(b[-1], -1, P)
        while len(a) >= len(b):
            c = a[-1] * inv % P
            out[len(a) - len(b)] = c
            if c:
                off = len(a) - len(b)
                for i, bi in enumerate(b):
                    a[off + i] = (a[off + i] - c * bi) % P
            a.pop()
        while len(a) > 1 and a[-1] == 0:
            a.pop()
        return out

    # restrict to the Fp-rational part: gcd(x^p - x, f)
    acc, base, e = [1], [0, 1], P
    while e:
        if e & 1:
            acc = pm_mul(acc, base, f)
        base = pm_mul(base, base, f)
        e >>= 1
    g = acc[:]
    while len(g) < 2:
        g += [0]
    g[1] = (g[1] - 1) % P
    while len(g) > 1 and g[-1] == 0:
        g.pop()
    h = pgcd(f, g)
    inv = pow(h[-1], -1, P)
    h = [c * inv % P for c in h]

    def split(fp):
        d = len(fp) - 1
        if d == 0:
            return []
        if d == 1:
            return [(-fp[0]) * pow(fp[1], -1, P) % P]
        while True:
            a = rng.randrange(P)
            acc, b, e = [1], [a, 1], (P - 1) // 2
            while e:
                if e & 1:
                    acc = pm_mul(acc, b, fp)
                b = pm_mul(b, b, fp)
                e >>= 1
            acc = acc[:]
            acc[0] = (acc[0] - 1) % P
            while len(acc) > 1 and acc[-1] == 0:
                acc.pop()
            gg = pgcd(fp, acc)
            if len(gg) - 1 in range(1, d):
                ginv = pow(gg[-1], -1, P)
                gg = [c * ginv % P for c in gg]
                return split(gg) + split(pdiv(fp, gg))

    roots = [r for r in split(h)
             if (3 * pow(r, 4, P) + 6 * a_iso * r * r + 12 * B_ISO * r - a_iso * a_iso) % P == 0]
    assert len(roots) == 1, roots
    return roots[0]


def main():
    fixtures = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures_sinsemilla_s.json"))
    )
    s0 = tuple(int(v, 16) for v in fixtures["0"])

    tors = cube_roots((-20) % P, P)
    print("Pallas 3-torsion x:", [hex(x) for x in tors])
    a_cands = [(-30 * x0 * x0) % P for x0 in tors]
    for a in a_cands:
        assert (-70 * -20 - 135) == B_ISO

    # W candidates: W^6 = 5/3645
    ratio = 5 * pow(3645, -1, P) % P
    sq = Fp(ratio).sqrt()
    ws = []
    for s6 in (sq.v, P - sq.v):
        ws += cube_roots(s6, P)

    win = None
    for a_iso in a_cands:
        x0 = iso_torsion_x(a_iso)
        for w in ws:
            iso = IsoParams(Fp, a_iso, B_ISO, Z, x0, w)
            u0, u1 = hash_to_field(Pallas, "z.cash:SinsemillaS", (0).to_bytes(4, "little"))
            pt = _iso_map(Pallas, iso, *_sswu_iso(iso, u0.v)) + _iso_map(
                Pallas, iso, *_sswu_iso(iso, u1.v)
            )
            if pt.xy == s0:
                win = (a_iso, x0, w)
                print("winner: a_iso=%s x0=%s w=%s" % (hex(a_iso), hex(x0), hex(w)))
    assert win, "no candidate matched SINSEMILLA_S[0]"

    a_iso, x0, w = win
    iso = IsoParams(Fp, a_iso, B_ISO, Z, x0, w)
    ok = 0
    for j_str, (xh, yh) in fixtures.items():
        j = int(j_str)
        u0, u1 = hash_to_field(Pallas, "z.cash:SinsemillaS", j.to_bytes(4, "little"))
        pt = _iso_map(Pallas, iso, *_sswu_iso(iso, u0.v)) + _iso_map(
            Pallas, iso, *_sswu_iso(iso, u1.v)
        )
        ok += pt.xy == (int(xh, 16), int(yh, 16))
    print("validated %d/%d fixture entries" % (ok, len(fixtures)))
    assert ok == len(fixtures)


if __name__ == "__main__":
    main()
