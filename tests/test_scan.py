"""ops/scan.py: device prefix products + batch inversion vs host bigints."""

import numpy as np

from halo2_tpu.fields import Fp, Fq
from halo2_tpu.ops.field_jax import FieldCtx
from halo2_tpu.ops.scan import batch_invert, exclusive_prefix_product, prefix_product


def _rand_ints(n, p, rng, with_zeros=False):
    vals = [int(rng.integers(1, 1 << 62)) * int(rng.integers(1, 1 << 62)) % p
            for _ in range(n)]
    if with_zeros:
        for i in range(0, n, 7):
            vals[i] = 0
    return vals


def test_prefix_product_matches_host():
    p = Fq.MODULUS
    ctx = FieldCtx(Fq)
    rng = np.random.default_rng(1)
    vals = _rand_ints(65, p, rng)
    dev = prefix_product(ctx.encode_ints(vals), ctx)
    got = ctx.decode_ints(dev)
    acc, want = 1, []
    for v in vals:
        acc = acc * v % p
        want.append(acc)
    assert got == want


def test_exclusive_prefix_with_init():
    p = Fp.MODULUS
    ctx = FieldCtx(Fp)
    rng = np.random.default_rng(2)
    vals = _rand_ints(33, p, rng)
    init = 0xDEADBEEF
    dev = exclusive_prefix_product(
        ctx.encode_ints(vals), ctx, init=ctx.encode_ints([init])[0]
    )
    got = ctx.decode_ints(dev)
    want = []
    acc = init
    for v in vals:
        want.append(acc)
        acc = acc * v % p
    assert got == want


def test_batch_invert_with_zeros():
    p = Fq.MODULUS
    ctx = FieldCtx(Fq)
    rng = np.random.default_rng(3)
    vals = _rand_ints(64, p, rng, with_zeros=True)
    got = ctx.decode_ints(batch_invert(ctx.encode_ints(vals), ctx))
    want = [pow(v, -1, p) if v else 0 for v in vals]
    assert got == want
