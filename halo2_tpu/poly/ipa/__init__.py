"""Inner-product-argument (Halo) polynomial commitment scheme over Pasta.

Mirrors `halo2_proofs/src/poly/ipa/`:
  * `ParamsIPA` {g, g_lagrange, w, u} derived from
    hash_to_curve("Halo2-Parameters") (commitment.rs:160-201)
  * the log-round opening argument (commitment/prover.rs:29-153 /
    verifier.rs) with blinded s-poly, xi/z challenges and u_j folds
  * the x1/x2/x3/x4 multiopen protocol grouping queries by point sets
    (multiopen.rs / multiopen/{prover,verifier}.rs)
  * `MSMIPA` accumulation and `GuardIPA` + Single/Accumulator strategies
    (msm.rs, strategy.rs)

QUERY_INSTANCE = True: instance columns are committed and absorbed as common
points (multiopen/prover.rs:25).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple, Type

from ...curves import Curve, Point
from ...fields import FieldElement
from ...hash_to_curve import hash_to_curve
from ...ops.msm import MSMBases, msm
from ...poly import COEFF, LAGRANGE, FVec, Polynomial, eval_polynomial_host, lagrange_interpolate_host
from ..commitment import (
    Blind,
    ProverQuery,
    VerifierQuery,
    compute_inner_product,
    construct_intermediate_sets,
    kate_division,
)

QUERY_INSTANCE = True


class ParamsIPA:
    def __init__(self, curve: Type[Curve], k: int, g: List[Point], g_lagrange: List[Point], w: Point, u: Point):
        self.curve = curve
        self.k = k
        self.n = 1 << k
        self.g = g
        self.g_lagrange = g_lagrange
        self.w = w
        self.u = u
        self._bases_g = MSMBases(curve, g + [w])
        self._bases_lagrange = MSMBases(curve, g_lagrange + [w])

    # -- construction (commitment.rs new()) --
    @classmethod
    def new(cls, curve: Type[Curve], k: int) -> "ParamsIPA":
        assert k < 32
        n = 1 << k
        hasher = hash_to_curve(curve, "Halo2-Parameters")
        g = []
        for i in range(n):
            msg = b"\x00" + int(i).to_bytes(4, "little")
            g.append(hasher(msg))
        g_lagrange = _g_to_lagrange(curve, g, k)
        w = hasher(b"\x01")
        u = hasher(b"\x02")
        return cls(curve, k, g, g_lagrange, w, u)

    _cache: Dict[Tuple[str, int], "ParamsIPA"] = {}

    @classmethod
    def cached(cls, curve: Type[Curve], k: int) -> "ParamsIPA":
        """Memory- and disk-cached params (the reference's sha256 bench
        caches params on disk the same way, benches/sha256.rs:92-106).
        Disk location: $H2_PARAMS_CACHE or <package>/../.params_cache;
        set H2_PARAMS_CACHE=0 to disable the disk layer."""
        key = (curve.__name__, k)
        if key not in cls._cache:
            cache_dir = os.environ.get("H2_PARAMS_CACHE", "")
            if cache_dir != "0":
                if not cache_dir:
                    cache_dir = os.path.join(
                        os.path.dirname(os.path.dirname(os.path.dirname(
                            os.path.dirname(os.path.abspath(__file__))))),
                        ".params_cache",
                    )
                path = os.path.join(cache_dir, f"ipa-{curve.__name__}-k{k}.raw")
                if os.path.exists(path):
                    cls._cache[key] = cls._read_raw(curve, path)
                    return cls._cache[key]
            # derive from a larger cached params if available (downsize)
            bigger = [kk for (cn, kk) in cls._cache if cn == curve.__name__ and kk > k]
            if bigger:
                big = cls._cache[(curve.__name__, min(bigger))]
                g = big.g[: 1 << k]
                cls._cache[key] = cls(curve, k, g, _g_to_lagrange(curve, g, k), big.w, big.u)
            else:
                cls._cache[key] = cls.new(curve, k)
            if cache_dir != "0":
                try:
                    cls._cache[key]._write_raw(path)
                except OSError:
                    pass
        return cls._cache[key]

    # raw uncompressed disk-cache format (no per-point sqrt on load, unlike
    # the compressed write()/read() wire format)
    def _write_raw(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.k.to_bytes(4, "little"))
            for pt in self.g + self.g_lagrange + [self.w, self.u]:
                f.write(pt.to_bytes_uncompressed())
        os.replace(tmp, path)

    @classmethod
    def _read_raw(cls, curve: Type[Curve], path: str) -> "ParamsIPA":
        with open(path, "rb") as f:
            data = f.read()
        k = int.from_bytes(data[:4], "little")
        n = 1 << k
        pts = [
            curve.from_bytes_uncompressed(data[4 + 64 * i : 4 + 64 * (i + 1)])
            for i in range(2 * n + 2)
        ]
        return cls(curve, k, pts[:n], pts[n : 2 * n], pts[2 * n], pts[2 * n + 1])

    # -- commitments --
    def commit_lagrange(self, values: Sequence[int], blind: Blind) -> Point:
        scalars = list(values) + [blind.value % self.curve.SCALAR.MODULUS]
        return msm(scalars, self._bases_lagrange, self.curve)

    def commit_many(self, stacks, blinds: Sequence[Blind], lagrange: bool,
                    mont: bool = True) -> List[Point]:
        """Batched commits from device-resident columns: `stacks` is an
        (M, n, 16) limb tensor (Montgomery when mont=True, canonical
        otherwise) or a list of FVec/(n, 16) tensors; one Pallas MSM launch
        computes all M commitments. Group elements are identical to
        commit/commit_lagrange."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ...ops.field_jax import FieldCtx
        from ...ops.limbs import int_to_limbs, limbs_to_ints

        if not isinstance(stacks, jnp.ndarray):
            stacks = jnp.stack([getattr(s, "vals", s) for s in stacks])
        M, n, _ = stacks.shape
        q = self.curve.SCALAR.MODULUS
        sctx = FieldCtx(self.curve.SCALAR)
        bmul = sctx.r_int if mont else 1
        blind_rows = jnp.asarray(
            np.stack(
                [int_to_limbs((b.value % q) * bmul % q) for b in blinds]
            )
        )[:, None, :]
        scal = jnp.concatenate([stacks, blind_rows], axis=1)  # (M, n+1, 16)
        bases = self._bases_lagrange if lagrange else self._bases_g
        if jax.default_backend() == "tpu":
            from ...ops.msm_pallas import msm_pallas_many

            return msm_pallas_many(scal, bases, mont=mont)
        # CPU fall-back: decode once, host MSM per column
        flat = scal.reshape(M * (n + 1), -1)
        if mont:
            decoded = sctx.decode_ints(flat)
        else:
            decoded = limbs_to_ints(np.asarray(jax.device_get(flat)))
        out = []
        for m in range(M):
            sc = decoded[m * (n + 1) : (m + 1) * (n + 1)]
            out.append(msm(sc, bases, self.curve))
        return out

    def commit(self, coeffs: Sequence[int], blind: Blind) -> Point:
        scalars = list(coeffs) + [blind.value % self.curve.SCALAR.MODULUS]
        return msm(scalars, self._bases_g, self.curve)

    def empty_msm(self) -> "MSMIPA":
        return MSMIPA(self)

    # -- serialization (commitment.rs write/read) --
    def write(self) -> bytes:
        out = [self.k.to_bytes(4, "little")]
        for pt in self.g:
            out.append(pt.to_bytes())
        for pt in self.g_lagrange:
            out.append(pt.to_bytes())
        out.append(self.w.to_bytes())
        out.append(self.u.to_bytes())
        return b"".join(out)

    @classmethod
    def read(cls, curve: Type[Curve], data: bytes) -> "ParamsIPA":
        k = int.from_bytes(data[:4], "little")
        n = 1 << k
        off = 4
        pts = []
        for _ in range(2 * n + 2):
            pts.append(curve.from_bytes(data[off : off + 32]))
            off += 32
        return cls(curve, k, pts[:n], pts[n : 2 * n], pts[2 * n], pts[2 * n + 1])


def _g_to_lagrange(curve: Type[Curve], g: List[Point], k: int) -> List[Point]:
    """Inverse NTT over the group: monomial-basis generators -> Lagrange basis
    (reference arithmetic.rs g_to_lagrange)."""
    from ...curves import JAC_IDENTITY, batch_to_affine, jac_add, jac_double, jac_mul

    F = curve.SCALAR
    q = F.MODULUS
    p = curve.p()
    n = 1 << k
    omega_inv = pow(pow(F.ROOT_OF_UNITY, 1 << (F.S - k), q), -1, q)
    n_inv = pow(n, -1, q)
    a = [pt.jacobian() for pt in g]
    from ...native import native_g_ntt

    nat = native_g_ntt(a, curve, k, omega_inv, n_inv, q)
    if nat is not None:
        return [
            Point(curve, xy) if xy else Point(curve, None)
            for xy in batch_to_affine(nat, p)
        ]
    # iterative radix-2 NTT over jacobian points with omega_inv twiddles
    # (pure-Python spec; pinned equal by tests/test_native.py)
    # bit reversal
    rev = 0
    for i in range(1, n):
        bit = n >> 1
        while rev & bit:
            rev ^= bit
            bit >>= 1
        rev |= bit
        if i < rev:
            a[i], a[rev] = a[rev], a[i]
    m = 1
    while m < n:
        w_m = pow(omega_inv, n // (2 * m), q)
        for s in range(0, n, 2 * m):
            w = 1
            for j in range(m):
                t = jac_mul(a[s + j + m], w, p)
                u_ = a[s + j]
                a[s + j] = jac_add(u_, t, p)
                a[s + j + m] = jac_add(u_, (t[0], (-t[1]) % p, t[2]), p)
                w = w * w_m % q
        m *= 2
    a = [jac_mul(pt, n_inv, p) for pt in a]
    return [
        Point(curve, xy) if xy else Point(curve, None) for xy in batch_to_affine(a, p)
    ]


class MSMIPA:
    """Deferred MSM accumulator (reference ipa/msm.rs)."""

    def __init__(self, params: ParamsIPA):
        self.params = params
        self.q = params.curve.SCALAR.MODULUS
        self.terms: List[Tuple[int, Point]] = []
        self.g_scalars: Optional[List[int]] = None
        self.w_scalar: Optional[int] = None
        self.u_scalar: Optional[int] = None

    def clone(self) -> "MSMIPA":
        m = MSMIPA(self.params)
        m.terms = list(self.terms)
        m.g_scalars = list(self.g_scalars) if self.g_scalars else None
        m.w_scalar = self.w_scalar
        m.u_scalar = self.u_scalar
        return m

    def append_term(self, scalar: int, point: Point):
        self.terms.append((scalar % self.q, point))

    def add_constant_term(self, scalar: int):
        # constant term multiplies G_0 of the URS... reference adds to g[0]
        self.add_to_g_scalars([scalar] + [0] * (self.params.n - 1))

    def add_to_g_scalars(self, scalars: Sequence[int]):
        if self.g_scalars is None:
            self.g_scalars = [0] * self.params.n
        for i, s in enumerate(scalars):
            self.g_scalars[i] = (self.g_scalars[i] + s) % self.q

    def add_to_w_scalar(self, scalar: int):
        self.w_scalar = ((self.w_scalar or 0) + scalar) % self.q

    def add_to_u_scalar(self, scalar: int):
        self.u_scalar = ((self.u_scalar or 0) + scalar) % self.q

    def add_msm(self, other: "MSMIPA"):
        self.terms.extend(other.terms)
        if other.g_scalars:
            self.add_to_g_scalars(other.g_scalars)
        if other.w_scalar is not None:
            self.add_to_w_scalar(other.w_scalar)
        if other.u_scalar is not None:
            self.add_to_u_scalar(other.u_scalar)

    def scale(self, factor: int):
        self.terms = [(s * factor % self.q, pt) for s, pt in self.terms]
        if self.g_scalars:
            self.g_scalars = [s * factor % self.q for s in self.g_scalars]
        if self.w_scalar is not None:
            self.w_scalar = self.w_scalar * factor % self.q
        if self.u_scalar is not None:
            self.u_scalar = self.u_scalar * factor % self.q

    def eval(self) -> Point:
        scalars = [s for s, _ in self.terms]
        points = [pt for _, pt in self.terms]
        if self.w_scalar is not None:
            scalars.append(self.w_scalar)
            points.append(self.params.w)
        if self.u_scalar is not None:
            scalars.append(self.u_scalar)
            points.append(self.params.u)
        if self.g_scalars is not None:
            scalars.extend(self.g_scalars)
            points.extend(self.params.g)
        return msm(scalars, points, self.params.curve)

    def check(self) -> bool:
        return self.eval().is_identity()


# ---------------------------------------------------------------------------
# Commitment opening argument (ipa/commitment/{prover,verifier}.rs)
# ---------------------------------------------------------------------------


def _ipa_round_fns(field, n: int):
    """Shape-stable jitted round pieces for the k-round fold.

    Every round reuses the SAME two compiled graphs - the live length m is
    a traced scalar (limb 0 of `mrow`) and lanes >= m are masked - so the
    opening costs two XLA compiles total instead of ~8 per round (the
    round-3 dryrun spent 449 s of its 771 s in exactly this shape churn)."""
    import jax
    import jax.numpy as jnp

    from ...ops.field_jax import FieldCtx, add_mod, mont_mul, select
    from ...ops.polyeval import _tree_sum

    key = (field, n)
    if key in _ROUND_FNS:
        return _ROUND_FNS[key]
    ctx = FieldCtx(field)
    lane = jnp.arange(n, dtype=jnp.uint32)

    def gat(v, idx):
        return jnp.take(v, jnp.clip(idx, 0, n - 1), axis=0)

    @jax.jit
    def emit(pprime, b, s_mult, mrow, z_mont, rands):
        """-> (2, n+2, 16) Montgomery scalars over bases g ++ [u, w]:
        row 0 = L_j (w_l coefficients, z*<p'_hi, b_lo> on u, l_rand on w),
        row 1 = R_j."""
        m = mrow[0]
        half = m // 2
        j = lane & (m - 1)
        hi = (j & half) != 0
        zero = jnp.zeros_like(s_mult)
        wl = select(
            jnp.logical_not(hi), mont_mul(s_mult, gat(pprime, half + j), ctx),
            zero,
        )
        wr = select(
            hi,
            mont_mul(s_mult, gat(pprime, jnp.where(hi, j - half, 0)), ctx),
            zero,
        )
        first = lane < half
        vl = select(first, mont_mul(gat(pprime, lane + half), b, ctx), zero)
        vr = select(first, mont_mul(pprime, gat(b, lane + half), ctx), zero)
        value_l = _tree_sum(vl, ctx, axis=0)
        value_r = _tree_sum(vr, ctx, axis=0)
        tail_l = jnp.stack([mont_mul(z_mont, value_l, ctx), rands[0]])
        tail_r = jnp.stack([mont_mul(z_mont, value_r, ctx), rands[1]])
        return jnp.stack(
            [jnp.concatenate([wl, tail_l]), jnp.concatenate([wr, tail_r])]
        )

    @jax.jit
    def fold(pprime, b, s_mult, mrow, uu):
        """p' <- p'_lo + u^-1 p'_hi ; b <- b_lo + u b_hi ;
        s_mult <- u * s_mult on lanes with the half-bit set.
        uu = (2, 16): [u_mont, u_inv_mont]."""
        m = mrow[0]
        half = m // 2
        first = lane < half
        hi_sel = (lane & half) != 0
        um = jnp.broadcast_to(uu[0], pprime.shape)
        uim = jnp.broadcast_to(uu[1], pprime.shape)
        ppn = add_mod(pprime, mont_mul(gat(pprime, lane + half), uim, ctx), ctx)
        bn = add_mod(b, mont_mul(gat(b, lane + half), um, ctx), ctx)
        zero = jnp.zeros_like(pprime)
        return (
            select(first, ppn, zero),
            select(first, bn, zero),
            select(hi_sel, mont_mul(s_mult, um, ctx), s_mult),
        )

    _ROUND_FNS[key] = (emit, fold)
    return emit, fold


_ROUND_FNS: Dict = {}


def ipa_commit_open(params: ParamsIPA, rng, transcript, p_poly, p_blind: Blind, x_3: int):
    """The k-round inner product opening (commitment/prover.rs:29-153).

    TPU-native fold: the reference folds g in place each round
    (g' = g_lo + u_j * g_hi, commitment/prover.rs:119-152) - n host
    scalar-muls of points in round 1 alone. Instead g is NEVER folded:
    after r rounds g'[i] = (prod of the u_t selected by i's high bits) *
    g[i] (the compute_s structure, commitment/verifier.rs), so each
    round's L/R is one batched 2-MSM over static bases [g..., u, w] whose
    last two coefficients carry the z*<.,.> and blinding terms - the round
    syncs with the host exactly once (the L/R decode the transcript needs)
    and uploads exactly once (next round's u, u^-1, blinds, m). All vector
    folds run through two shape-stable jitted graphs (`_ipa_round_fns`).
    `p_poly` may be a host int list or a device FVec. Identical group
    elements -> identical proof bytes.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ...ops.field_jax import FieldCtx, add_mod, mont_mul
    from ...ops.limbs import NLIMBS as NLIMBS_IPA, int_to_limbs, ints_to_limbs
    from ...ops.polyeval import batch_eval_mont, device_powers
    from ...poly import FVec

    q = params.curve.SCALAR.MODULUS
    F = params.curve.SCALAR
    n = params.n
    ctx = FieldCtx(F)

    from ...utils.measure import span

    s_poly = [F.random(rng).v for _ in range(n)]
    s_poly_blind = F.random(rng).v

    with span("ipa: s-poly commit", category="ipa"):
        spm = ctx.to_mont(jnp.asarray(ints_to_limbs(s_poly)))
        s_at_x3 = ctx.decode_ints(batch_eval_mont(F, spm[None], [x_3]))[0]
        spm = spm.at[0].set(ctx.const((s_poly[0] - s_at_x3) % q))
        s_commitment = params.commit_many(
            spm[None], [Blind(s_poly_blind)], lagrange=False
        )[0]
    transcript.write_point(s_commitment)

    xi = int(transcript.squeeze_challenge())
    z = int(transcript.squeeze_challenge())

    # p' = xi * s + p, then force p'(x_3) = 0 on the constant term
    if isinstance(p_poly, FVec):
        ppm = p_poly.vals
    else:
        assert len(p_poly) == n
        ppm = ctx.to_mont(jnp.asarray(ints_to_limbs([v % q for v in p_poly])))
    with span("ipa: p' setup", category="ipa"):
        pprime = add_mod(
            mont_mul(spm, jnp.broadcast_to(ctx.const(xi), spm.shape), ctx), ppm, ctx
        )
        v0, p0 = ctx.decode_ints(
            jnp.concatenate([batch_eval_mont(F, pprime[None], [x_3]), pprime[:1]])
        )
        pprime = pprime.at[0].set(ctx.const((p0 - v0) % q))
    f = (s_poly_blind * xi + p_blind.value) % q

    b = device_powers(ctx.const(x_3), n, ctx)  # (n, 16) Montgomery
    s_mult = jnp.broadcast_to(ctx.one, (n, NLIMBS_IPA))  # prod of folded u_t
    z_mont = ctx.const(z)
    if not hasattr(params, "_bases_guw"):
        params._bases_guw = MSMBases(
            params.curve, params.g + [params.u, params.w]
        )

    emit, fold_fn = _ipa_round_fns(F, n)
    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("H2_IPA_HOST") != "1"  # debug: force host L/R
    )
    r_mont = ctx.r_int

    def upload(m_cur, l_rand, r_rand):
        """One host->device transfer per round: m + Montgomery blinds."""
        rows = np.zeros((3, NLIMBS_IPA), np.uint32)
        rows[0, 0] = m_cur & 0xFFFFFFFF
        rows[0, 1] = m_cur >> 32
        rows[1] = int_to_limbs(l_rand * r_mont % q)
        rows[2] = int_to_limbs(r_rand * r_mont % q)
        return jnp.asarray(rows)

    m = n
    l_rand = F.random(rng).v
    r_rand = F.random(rng).v
    packed = upload(m, l_rand, r_rand)
    for _round in range(params.k):
        with span(f"ipa: round {_round} emit", category="ipa"):
            scal = emit(pprime, b, s_mult, packed[0], z_mont, packed[1:])
        if use_pallas:
            from ...ops.msm_pallas import msm_pallas_many

            l_j, r_j = msm_pallas_many(scal, params._bases_guw)
        else:
            both = ctx.decode_ints(scal.reshape(2 * (n + 2), NLIMBS_IPA))
            pts = params.g + [params.u, params.w]
            l_j = msm(both[: n + 2], pts, params.curve)
            r_j = msm(both[n + 2 :], pts, params.curve)
        transcript.write_point(l_j)
        transcript.write_point(r_j)

        u_j = int(transcript.squeeze_challenge())
        u_j_inv = pow(u_j, -1, q)
        uu = jnp.asarray(
            np.stack(
                [
                    int_to_limbs(u_j * r_mont % q),
                    int_to_limbs(u_j_inv * r_mont % q),
                ]
            )
        )
        pprime, b, s_mult = fold_fn(pprime, b, s_mult, packed[0], uu)
        f = (f + l_rand * u_j_inv + r_rand * u_j) % q
        m //= 2
        if m >= 2:  # prefetch next round; rng draw ORDER matches reference
            l_rand = F.random(rng).v
            r_rand = F.random(rng).v
            packed = upload(m, l_rand, r_rand)

    c0 = ctx.decode_ints(pprime[:1])[0]
    transcript.write_scalar(params.curve.SCALAR(c0))
    transcript.write_scalar(params.curve.SCALAR(f))


class GuardIPA:
    def __init__(self, msm_acc: MSMIPA, neg_c: int, u: List[int]):
        self.msm = msm_acc
        self.neg_c = neg_c
        self.u = u

    def use_challenges(self) -> MSMIPA:
        s = compute_s(self.u, self.neg_c, self.msm.q)
        self.msm.add_to_g_scalars(s)
        return self.msm


def ipa_commit_verify(params: ParamsIPA, msm_acc: MSMIPA, transcript, x: int, v: int) -> GuardIPA:
    """commitment/verifier.rs verify_proof."""
    q = params.curve.SCALAR.MODULUS
    msm_acc.add_constant_term(-v)
    s_commitment = transcript.read_point()
    xi = int(transcript.squeeze_challenge())
    msm_acc.append_term(xi, s_commitment)
    z = int(transcript.squeeze_challenge())

    u = []
    for _ in range(params.k):
        l = transcript.read_point()
        r = transcript.read_point()
        u_j = int(transcript.squeeze_challenge())
        msm_acc.append_term(pow(u_j, -1, q), l)
        msm_acc.append_term(u_j, r)
        u.append(u_j)

    c = int(transcript.read_scalar())
    f = int(transcript.read_scalar())
    b = compute_b(x, u, q)

    msm_acc.add_to_u_scalar((-c) * b % q * z % q)
    msm_acc.add_to_w_scalar(-f)
    return GuardIPA(msm_acc, (-c) % q, u)


def compute_b(x: int, u: List[int], q: int) -> int:
    tmp = 1
    cur = x
    for u_j in reversed(u):
        tmp = tmp * (1 + u_j * cur) % q
        cur = cur * cur % q
    return tmp


def compute_s(u: List[int], init: int, q: int) -> List[int]:
    """Coefficients of g(X) = prod (1 + u_{k-1-i} X^{2^i}) scaled by init."""
    v = [0] * (1 << len(u))
    v[0] = init % q
    length = 1
    for u_j in reversed(u):
        for i in range(length):
            v[length + i] = v[i] * u_j % q
        length *= 2
    return v


# ---------------------------------------------------------------------------
# Multiopen (ipa/multiopen/{prover,verifier}.rs)
# ---------------------------------------------------------------------------


def multiopen_prove(params: ParamsIPA, rng, transcript, queries: List[ProverQuery]):
    """x1..x4 multiopen (reference ipa/multiopen/prover.rs).

    The reference's per-set q-poly accumulation, Kate divisions, and evals
    are O(n)-per-query host loops (`arithmetic.rs:243-306`); here every
    polynomial stays an (n, 16) Montgomery limb tensor and the tail runs as
    three device kernels (ops/polyeval.py): x1/x2/x4 scalar folds, the
    associative-scan Kate division, and one batched eval at x3. Host ints
    appear only at the transcript boundary."""
    import jax.numpy as jnp

    from ...ops.polyeval import batch_eval_mont, kate_division_mont

    q = params.curve.SCALAR.MODULUS
    F = params.curve.SCALAR
    field = F
    n = params.n
    x_1 = int(transcript.squeeze_challenge())
    x_2 = int(transcript.squeeze_challenge())

    # commitment key: identity of (poly object, blind value)
    poly_cache: Dict[int, FVec] = {}

    def key_of(query):
        pid = id(query.poly)
        if pid not in poly_cache:
            poly_cache[pid] = (
                FVec.from_ints(field, query.poly)
                if isinstance(query.poly, list)
                else query.poly.vec
            )
        return (pid, query.blind.value)

    poly_map, point_sets = construct_intermediate_sets(
        queries,
        get_point=lambda qq: qq.point,
        get_commitment_key=key_of,
        get_eval=lambda qq: None,
    )

    from ...utils.measure import span

    x1_s = F(x_1)
    q_polys: List[Optional[FVec]] = [None] * len(point_sets)
    q_blinds = [0] * len(point_sets)
    _qspan = span("multiopen: q-poly folds", category="ipa")
    _qspan.__enter__()
    for cd in poly_map:
        pid, blind_v = cd.commitment
        coeffs = poly_cache[pid]
        si = cd.set_index
        if q_polys[si] is None:
            q_polys[si] = coeffs.copy()
        else:
            q_polys[si] = q_polys[si] * x1_s + coeffs
        q_blinds[si] = (q_blinds[si] * x_1 + blind_v) % q
    _qspan.__exit__(None, None, None)

    x2_s = F(x_2)
    q_prime: Optional[FVec] = None
    with span("multiopen: kate divisions", category="ipa"):
        for points, poly in zip(point_sets, q_polys):
            reduced = poly.vals
            for point in points:
                # same length with top coeff zeroed, so folds stay aligned
                reduced = kate_division_mont(field, reduced, point)
            rvec = FVec(field, reduced)
            q_prime = rvec if q_prime is None else q_prime * x2_s + rvec

    q_prime_blind = F.random(rng).v
    with span("multiopen: q' commit", category="ipa"):
        q_prime_commitment = params.commit_many(
            q_prime.vals[None], [Blind(q_prime_blind)], lagrange=False
        )[0]
    transcript.write_point(q_prime_commitment)

    x_3 = int(transcript.squeeze_challenge())
    with span("multiopen: q evals at x3", category="ipa"):
        stacked = jnp.stack([qp.vals for qp in q_polys])
        ctx = q_prime.ctx
        for ev in ctx.decode_ints(
            batch_eval_mont(field, stacked, [x_3] * len(q_polys))
        ):
            transcript.write_scalar(F(ev))

    x_4 = int(transcript.squeeze_challenge())
    x4_s = F(x_4)
    p_vec = q_prime
    p_blind = q_prime_blind
    for poly, blind in zip(q_polys, q_blinds):
        p_vec = p_vec * x4_s + poly
        p_blind = (p_blind * x_4 + blind) % q

    ipa_commit_open(params, rng, transcript, p_vec, Blind(p_blind), x_3)


def multiopen_verify(params: ParamsIPA, transcript, queries: List[VerifierQuery], msm_acc: MSMIPA) -> GuardIPA:
    q = params.curve.SCALAR.MODULUS
    F = params.curve.SCALAR
    x_1 = int(transcript.squeeze_challenge())
    x_2 = int(transcript.squeeze_challenge())

    # Key by commitment OBJECT IDENTITY, not value: the reference's
    # CommitmentReference compares with std::ptr::eq
    # (ipa/msm.rs / multiopen.rs), so two distinct columns whose contents -
    # and therefore commitments - are equal must stay separate entries in
    # the x1-fold to mirror the prover's per-poly fold multiplicities.
    def key_of(qq):
        return ("c" if qq.kind == "commitment" else "m", id(qq.commitment))

    commitment_map, point_sets = construct_intermediate_sets(
        queries,
        get_point=lambda qq: qq.point,
        get_commitment_key=key_of,
        get_eval=lambda qq: qq.eval,
    )

    q_commitments = [params.empty_msm() for _ in point_sets]
    q_eval_sets = [[0] * len(ps) for ps in point_sets]
    obj_by_id = {id(qq.commitment): qq.commitment for qq in queries}
    for cd in commitment_map:
        si = cd.set_index
        q_commitments[si].scale(x_1)
        kind, ref = cd.commitment
        if kind == "c":
            q_commitments[si].append_term(1, obj_by_id[ref])
        else:
            q_commitments[si].add_msm(obj_by_id[ref])
        for i, ev in enumerate(cd.evals):
            q_eval_sets[si][i] = (q_eval_sets[si][i] * x_1 + ev) % q

    q_prime_commitment = transcript.read_point()
    x_3 = int(transcript.squeeze_challenge())
    u = [int(transcript.read_scalar()) for _ in q_eval_sets]

    msm_eval = 0
    for points, evals, proof_eval in zip(point_sets, q_eval_sets, u):
        r_poly = lagrange_interpolate_host(points, evals, F)
        r_eval = eval_polynomial_host(r_poly, x_3, q)
        ev = (proof_eval - r_eval) % q
        for point in points:
            ev = ev * pow((x_3 - point) % q, -1, q) % q
        msm_eval = (msm_eval * x_2 + ev) % q

    x_4 = int(transcript.squeeze_challenge())
    msm_acc.append_term(1, q_prime_commitment)
    v = msm_eval
    for q_commitment, q_eval in zip(q_commitments, u):
        msm_acc.scale(x_4)
        msm_acc.add_msm(q_commitment)
        v = (v * x_4 + q_eval) % q

    return ipa_commit_verify(params, msm_acc, transcript, x_3, v)
