"""Device curve ops and MSM vs the host spec layer."""

import random

import numpy as np
import pytest

from halo2_tpu.curves import Pallas, Vesta
from halo2_tpu.ops.curve_jax import CurveCtx, PointVec, padd, pdouble, pselect, tree_reduce
from halo2_tpu.ops.msm import MSMBases, msm, msm_host, msm_jax


def rand_points(curve, n, seed=0):
    rng = random.Random(seed)
    g = curve.generator()
    return [g.mul(rng.randrange(1, curve.SCALAR.MODULUS)) for _ in range(n)]


def test_padd_matches_host():
    cc = CurveCtx(Pallas)
    pts_a = rand_points(Pallas, 8, seed=1)
    pts_b = rand_points(Pallas, 8, seed=2)
    # include exceptional cases: identity, doubling, inverse pair
    pts_a[0] = Pallas.identity()
    pts_b[1] = Pallas.identity()
    pts_b[2] = pts_a[2]  # doubling
    pts_b[3] = -pts_a[3]  # sum = identity
    a = cc.encode_points(pts_a)
    b = cc.encode_points(pts_b)
    out = cc.decode_points(padd(a, b, cc))
    for pa, pb, o in zip(pts_a, pts_b, out):
        assert o == pa + pb


def test_pdouble_matches_host():
    cc = CurveCtx(Vesta)
    pts = rand_points(Vesta, 4, seed=3)
    pts[0] = Vesta.identity()
    dv = cc.decode_points(pdouble(cc.encode_points(pts), cc))
    for pt, o in zip(pts, dv):
        assert o == pt + pt


def test_encode_decode_roundtrip():
    cc = CurveCtx(Pallas)
    pts = rand_points(Pallas, 5, seed=4)
    pts.append(Pallas.identity())
    assert cc.decode_points(cc.encode_points(pts)) == pts


def test_tree_reduce():
    cc = CurveCtx(Pallas)
    pts = rand_points(Pallas, 7, seed=5)  # odd count exercises padding
    expect = Pallas.identity()
    for pt in pts:
        expect = expect + pt
    got = cc.decode_points(tree_reduce(cc.encode_points(pts), cc))[0]
    assert got == expect


def test_msm_host_small():
    rng = random.Random(6)
    pts = rand_points(Pallas, 20, seed=6)
    scalars = [rng.randrange(Pallas.SCALAR.MODULUS) for _ in range(20)]
    expect = Pallas.identity()
    for s, pt in zip(scalars, pts):
        expect = expect + pt.mul(s)
    assert msm_host(scalars, pts, Pallas) == expect
    # edge scalars
    assert msm_host([0, 1], pts[:2], Pallas) == pts[1]


def test_msm_jax_matches_host():
    n = 256
    rng = random.Random(7)
    pts = rand_points(Pallas, n, seed=7)
    pts[3] = Pallas.identity()
    scalars = [rng.randrange(Pallas.SCALAR.MODULUS) for _ in range(n)]
    scalars[5] = 0
    bases = MSMBases(Pallas, pts)
    got = msm_jax(scalars, bases, lanes=32)
    expect = msm_host(scalars, pts, Pallas)
    assert got == expect


def test_msm_dispatch():
    n = 64
    rng = random.Random(8)
    pts = rand_points(Vesta, n, seed=8)
    scalars = [rng.randrange(Vesta.SCALAR.MODULUS) for _ in range(n)]
    assert msm(scalars, pts, Vesta) == msm_host(scalars, pts, Vesta)
