"""KZG polynomial commitment scheme over BN254 with GWC and SHPLONK multiopen.

Mirrors `halo2_proofs/src/poly/kzg/`:
  * `ParamsKZG` {g, g_lagrange, g2, s_g2} with the insecure test `setup`
    (commitment.rs:23-133); commitments ignore blinds.
  * `MSMKZG` (scalars x bases accumulator) and `DualMSM` (left/right pair
    checked via e(left, s_g2) * e(right, -g2) == 1) (msm.rs:13-170).
  * GWC multiopen: one kate quotient per distinct point, v/u challenges
    (multiopen/gwc/{prover,verifier}.rs).
  * SHPLONK multiopen: rotation-set quotients with y/v/u challenges and the
    h1/h2 two-commitment protocol (multiopen/shplonk/{prover,verifier}.rs,
    construct_intermediate_sets at shplonk.rs:56).
  * Single/Accumulator strategies finalize via the pairing check
    (strategy.rs:50-162).

QUERY_INSTANCE = False for both variants: instance values are hashed into
the transcript as scalars, never committed (gwc/prover.rs:36,
shplonk/prover.rs:112).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Type

from ...curves import Bn254G1, Curve, Point
from ...fields import FieldElement
from ...ops.msm import MSMBases, msm
from ...pairing import PointG2, pairing_check
from ...poly import eval_polynomial_host, lagrange_interpolate_host
from ..commitment import Blind, ProverQuery, VerifierQuery, kate_division

QUERY_INSTANCE = False


class ParamsKZG:
    """BN254 structured reference string (kzg/commitment.rs:23-133)."""

    def __init__(self, curve: Type[Curve], k: int, g: List[Point],
                 g_lagrange: List[Point], g2: PointG2, s_g2: PointG2):
        self.curve = curve
        self.k = k
        self.n = 1 << k
        self.g = g
        self.g_lagrange = g_lagrange
        self.g2 = g2
        self.s_g2 = s_g2
        self._bases_g = MSMBases(curve, g)
        self._bases_lagrange = MSMBases(curve, g_lagrange)

    @classmethod
    def setup(cls, k: int, rng, curve: Type[Curve] = Bn254G1) -> "ParamsKZG":
        """Insecure trusted setup for tests (commitment.rs `setup`)."""
        assert k < 28
        q = curve.SCALAR.MODULUS
        s = curve.SCALAR.random(rng).v
        g1 = curve.generator()
        g = []
        cur = 1
        for _ in range(1 << k):
            g.append(g1.mul(cur))
            cur = cur * s % q
        from ..ipa import _g_to_lagrange

        g_lagrange = _g_to_lagrange(curve, g, k)
        g2 = PointG2.generator()
        s_g2 = g2.mul(s)
        return cls(curve, k, g, g_lagrange, g2, s_g2)

    _cache: Dict[int, "ParamsKZG"] = {}

    @classmethod
    def cached(cls, k: int) -> "ParamsKZG":
        """Deterministic-seed cached setup for tests."""
        if k not in cls._cache:
            import random

            rng = random.Random(0x5E7)
            cls._cache[k] = cls.setup(k, rng)
        return cls._cache[k]

    # -- commitments: blinds ignored (KZG is not hiding in halo2) --
    def commit_lagrange(self, values: Sequence[int], blind: Blind = None) -> Point:
        return msm(list(values), self._bases_lagrange, self.curve)

    def commit(self, coeffs: Sequence[int], blind: Blind = None) -> Point:
        return msm(list(coeffs), self._bases_g, self.curve)

    def empty_msm(self) -> "MSMKZG":
        return MSMKZG(self.curve)

    def accumulator(self) -> "DualMSM":
        """Verification accumulator (the strategy's DualMSM, strategy.rs:58-84)."""
        return DualMSM(self)

    # -- serialization (commitment.rs write/read, RawBytes layout) --
    def write(self) -> bytes:
        out = [self.k.to_bytes(4, "little")]
        for pt in self.g:
            out.append(pt.to_bytes_uncompressed())
        for pt in self.g_lagrange:
            out.append(pt.to_bytes_uncompressed())
        out.append(self.g2.to_bytes_uncompressed())
        out.append(self.s_g2.to_bytes_uncompressed())
        return b"".join(out)

    @classmethod
    def read(cls, data: bytes, curve: Type[Curve] = Bn254G1) -> "ParamsKZG":
        k = int.from_bytes(data[:4], "little")
        n = 1 << k
        off = 4
        pts = []
        for _ in range(2 * n):
            pts.append(curve.from_bytes_uncompressed(data[off : off + 64]))
            off += 64
        g2 = PointG2.from_bytes_uncompressed(data[off : off + 128])
        s_g2 = PointG2.from_bytes_uncompressed(data[off + 128 : off + 256])
        return cls(curve, k, pts[:n], pts[n:], g2, s_g2)


class MSMKZG:
    """Deferred scalar*point accumulator (kzg/msm.rs:13-80)."""

    def __init__(self, curve: Type[Curve] = Bn254G1):
        self.curve = curve
        self.q = curve.SCALAR.MODULUS
        self.scalars: List[int] = []
        self.bases: List[Point] = []

    def clone(self) -> "MSMKZG":
        m = MSMKZG(self.curve)
        m.scalars = list(self.scalars)
        m.bases = list(self.bases)
        return m

    def append_term(self, scalar: int, point: Point):
        self.scalars.append(scalar % self.q)
        self.bases.append(point)

    def add_msm(self, other: "MSMKZG"):
        self.scalars.extend(other.scalars)
        self.bases.extend(other.bases)

    def scale(self, factor: int):
        self.scalars = [s * factor % self.q for s in self.scalars]

    def combine_with_base(self, base: int):
        """In-place right-to-left power combination (msm.rs:28-37)."""
        acc = 1
        for i in range(len(self.scalars) - 1, -1, -1):
            self.scalars[i] = self.scalars[i] * acc % self.q
            acc = acc * base % self.q

    def eval(self) -> Point:
        return msm(self.scalars, self.bases, self.curve)

    def check(self) -> bool:
        return self.eval().is_identity()


class DualMSM:
    """Two-channel accumulator checked by pairing (kzg/msm.rs:122-170)."""

    def __init__(self, params: ParamsKZG):
        self.params = params
        self.left = MSMKZG(params.curve)
        self.right = MSMKZG(params.curve)

    def clone(self) -> "DualMSM":
        d = DualMSM(self.params)
        d.left = self.left.clone()
        d.right = self.right.clone()
        return d

    def scale(self, e: int):
        self.left.scale(e)
        self.right.scale(e)

    def add_msm(self, other: "DualMSM"):
        self.left.add_msm(other.left)
        self.right.add_msm(other.right)

    def check(self) -> bool:
        left = self.left.eval()
        right = self.right.eval()
        return pairing_check(
            [(left, self.params.s_g2), (right, self.params.g2.neg())]
        )


class GuardKZG:
    def __init__(self, msm_accumulator: DualMSM):
        self.msm_accumulator = msm_accumulator

    # parity with GuardIPA.use_challenges() call-sites
    def use_challenges(self) -> DualMSM:
        return self.msm_accumulator


# ---------------------------------------------------------------------------
# GWC multiopen (multiopen/gwc/{prover,verifier}.rs)
# ---------------------------------------------------------------------------


def _gwc_sets(queries, get_point):
    """Group queries per distinct point, first-seen order (gwc.rs:36-61)."""
    point_query_map: List[Tuple[int, List]] = []
    for query in queries:
        pt = get_point(query)
        for entry in point_query_map:
            if entry[0] == pt:
                entry[1].append(query)
                break
        else:
            point_query_map.append((pt, [query]))
    return point_query_map


def gwc_prove(params: ParamsKZG, rng, transcript, queries: List[ProverQuery]):
    q = params.curve.SCALAR.MODULUS
    v = int(transcript.squeeze_challenge())

    poly_cache: Dict[int, List[int]] = {}

    def coeffs_of(query) -> List[int]:
        pid = id(query.poly)
        if pid not in poly_cache:
            poly_cache[pid] = (
                query.poly if isinstance(query.poly, list) else query.poly.vec.to_ints()
            )
        return poly_cache[pid]

    for z, qs in _gwc_sets(queries, lambda qq: qq.point):
        poly_batch = [0] * params.n
        power_of_v = 1
        for query in qs:
            coeffs = coeffs_of(query)
            for i, c in enumerate(coeffs):
                poly_batch[i] = (poly_batch[i] + c * power_of_v) % q
            power_of_v = power_of_v * v % q
        # no eval subtraction needed before kate division: division by (X-z)
        # ignores the remainder, matching reference's poly_batch - eval_batch
        witness = kate_division(poly_batch, z, q)
        witness += [0] * (params.n - len(witness))
        w = params.commit(witness)
        transcript.write_point(w)


def gwc_verify(params: ParamsKZG, transcript, queries: List[VerifierQuery],
               msm_accumulator: DualMSM) -> GuardKZG:
    q = params.curve.SCALAR.MODULUS
    v = int(transcript.squeeze_challenge())

    sets = _gwc_sets(queries, lambda qq: qq.point)
    w = [transcript.read_point() for _ in sets]
    u = int(transcript.squeeze_challenge())

    commitment_multi = MSMKZG(params.curve)
    eval_multi = 0
    witness = MSMKZG(params.curve)
    witness_with_aux = MSMKZG(params.curve)

    power_of_u = 1
    for (z, qs), wi in zip(sets, w):
        commitment_batch = MSMKZG(params.curve)
        eval_batch = 0
        power_of_v = 1
        for query in qs:
            if query.kind == "commitment":
                commitment_batch.append_term(power_of_v, query.commitment)
            else:
                m = query.commitment.clone()
                m.scale(power_of_v)
                commitment_batch.add_msm(m)
            eval_batch = (eval_batch + power_of_v * query.eval) % q
            power_of_v = power_of_v * v % q
        commitment_batch.scale(power_of_u)
        commitment_multi.add_msm(commitment_batch)
        eval_multi = (eval_multi + power_of_u * eval_batch) % q
        witness_with_aux.append_term(power_of_u * z % q, wi)
        witness.append_term(power_of_u, wi)
        power_of_u = power_of_u * u % q

    msm_accumulator.left.add_msm(witness)
    msm_accumulator.right.add_msm(witness_with_aux)
    msm_accumulator.right.add_msm(commitment_multi)
    msm_accumulator.right.append_term(eval_multi, -params.g[0])
    return GuardKZG(msm_accumulator)


# ---------------------------------------------------------------------------
# SHPLONK multiopen (multiopen/shplonk/{prover,verifier}.rs)
# ---------------------------------------------------------------------------


def construct_intermediate_sets_shplonk(queries, get_commitment_key, get_point, get_eval):
    """(rotation_sets, super_point_set) per shplonk.rs:56-146.

    rotation_sets: list of (points_sorted, [(commitment_key, evals), ...]),
    grouped by the *set* of points each commitment is queried at, in
    first-seen commitment order; points sorted ascending (BTreeSet order).
    """
    queries = list(queries)
    super_point_set = set()
    commitment_rotation: List[Tuple[object, set]] = []
    for query in queries:
        pt = get_point(query)
        super_point_set.add(pt)
        key = get_commitment_key(query)
        for entry in commitment_rotation:
            if entry[0] == key:
                entry[1].add(pt)
                break
        else:
            commitment_rotation.append((key, {pt}))

    rotation_set_map: List[Tuple[frozenset, List[object]]] = []
    for key, rotset in commitment_rotation:
        fs = frozenset(rotset)
        for entry in rotation_set_map:
            if entry[0] == fs:
                entry[1].append(key)
                break
        else:
            rotation_set_map.append((fs, [key]))

    eval_lookup = {}
    for query in queries:
        eval_lookup[(get_commitment_key(query), get_point(query))] = get_eval(query)

    rotation_sets = []
    for fs, keys in rotation_set_map:
        points = sorted(fs)
        commitments = [(key, [eval_lookup[(key, pt)] for pt in points]) for key in keys]
        rotation_sets.append((points, commitments))
    return rotation_sets, sorted(super_point_set)


def _eval_vanishing(roots: Sequence[int], x: int, q: int) -> int:
    acc = 1
    for r in roots:
        acc = acc * ((x - r) % q) % q
    return acc


def shplonk_prove(params: ParamsKZG, rng, transcript, queries: List[ProverQuery]):
    q = params.curve.SCALAR.MODULUS
    F = params.curve.SCALAR
    y = int(transcript.squeeze_challenge())

    poly_cache: Dict[int, List[int]] = {}

    def key_of(query):
        pid = id(query.poly)
        if pid not in poly_cache:
            poly_cache[pid] = (
                query.poly if isinstance(query.poly, list) else query.poly.vec.to_ints()
            )
        return pid

    rotation_sets, super_point_set = construct_intermediate_sets_shplonk(
        queries,
        get_commitment_key=key_of,
        get_point=lambda qq: qq.point,
        get_eval=lambda qq: None,
    )

    # low-degree equivalents r_i_j(X) per commitment
    extended = []
    for points, commitments in rotation_sets:
        exts = []
        for key, _ in commitments:
            coeffs = poly_cache[key]
            evals = [eval_polynomial_host(coeffs, pt, q) for pt in points]
            low = lagrange_interpolate_host(points, evals, F)
            exts.append((key, low))
        extended.append((points, exts))

    v = int(transcript.squeeze_challenge())

    # h(X) = sum_i v^i * (sum_j y^j (P_ij - R_ij)) / Z_i
    h_x = [0] * params.n
    power_of_v = 1
    for points, exts in extended:
        n_x = [0] * params.n
        power_of_y = 1
        for key, low in exts:
            coeffs = poly_cache[key]
            for i, c in enumerate(coeffs):
                n_x[i] = (n_x[i] + power_of_y * c) % q
            for i, c in enumerate(low):
                n_x[i] = (n_x[i] - power_of_y * c) % q
            power_of_y = power_of_y * y % q
        for pt in points:
            n_x = kate_division(n_x, pt, q)
        n_x += [0] * (params.n - len(n_x))
        for i, c in enumerate(n_x):
            h_x[i] = (h_x[i] + power_of_v * c) % q
        power_of_v = power_of_v * v % q

    h = params.commit(h_x)
    transcript.write_point(h)
    u = int(transcript.squeeze_challenge())

    # linearisation L(X) = sum_i v^i z_diff_i * (sum_j y^j (P_ij - r_ij(u))) - Z_T(u) h(X)
    l_x = [0] * params.n
    z_diffs = []
    power_of_v = 1
    for points, exts in extended:
        diffs = [pt for pt in super_point_set if pt not in points]
        z_i = _eval_vanishing(diffs, u, q)
        z_diffs.append(z_i)
        inner = [0] * params.n
        power_of_y = 1
        for key, low in exts:
            coeffs = poly_cache[key]
            r_eval = eval_polynomial_host(low, u, q)
            for i, c in enumerate(coeffs):
                inner[i] = (inner[i] + power_of_y * c) % q
            inner[0] = (inner[0] - power_of_y * r_eval) % q
            power_of_y = power_of_y * y % q
        scale = power_of_v * z_i % q
        for i, c in enumerate(inner):
            l_x[i] = (l_x[i] + scale * c) % q
        power_of_v = power_of_v * v % q

    zt_eval = _eval_vanishing(super_point_set, u, q)
    for i, c in enumerate(h_x):
        l_x[i] = (l_x[i] - zt_eval * c) % q

    assert eval_polynomial_host(l_x, u, q) == 0, "SHPLONK linearisation sanity"

    h2_x = kate_division(l_x, u, q)
    z_0_diff_inv = pow(z_diffs[0], -1, q)
    h2_x = [c * z_0_diff_inv % q for c in h2_x]
    h2_x += [0] * (params.n - len(h2_x))
    h2 = params.commit(h2_x)
    transcript.write_point(h2)


def shplonk_verify(params: ParamsKZG, transcript, queries: List[VerifierQuery],
                   msm_accumulator: DualMSM) -> GuardKZG:
    q = params.curve.SCALAR.MODULUS
    F = params.curve.SCALAR

    def key_of(qq):
        if qq.kind == "commitment":
            return ("c", qq.commitment)
        return ("m", id(qq.commitment))

    msm_by_id = {id(qq.commitment): qq.commitment for qq in queries if qq.kind == "msm"}

    rotation_sets, super_point_set = construct_intermediate_sets_shplonk(
        queries,
        get_commitment_key=key_of,
        get_point=lambda qq: qq.point,
        get_eval=lambda qq: qq.eval,
    )

    y = int(transcript.squeeze_challenge())
    v = int(transcript.squeeze_challenge())
    h1 = transcript.read_point()
    u = int(transcript.squeeze_challenge())
    h2 = transcript.read_point()

    z_0_diff_inverse = 0
    z_0 = 0
    outer_msm = MSMKZG(params.curve)
    r_outer_acc = 0
    power_of_v = 1
    for i, (points, commitments) in enumerate(rotation_sets):
        diffs = [pt for pt in super_point_set if pt not in points]
        z_diff_i = _eval_vanishing(diffs, u, q)
        if i == 0:
            z_0 = _eval_vanishing(points, u, q)
            z_0_diff_inverse = pow(z_diff_i, -1, q)
            z_diff_i = 1
        else:
            z_diff_i = z_diff_i * z_0_diff_inverse % q

        inner_msm = MSMKZG(params.curve)
        r_inner_acc = 0
        power_of_y = 1
        for key, evals in commitments:
            r_x = lagrange_interpolate_host(points, evals, F)
            r_inner_acc = (r_inner_acc + power_of_y * eval_polynomial_host(r_x, u, q)) % q
            kind, ref = key
            if kind == "c":
                inner_msm.append_term(power_of_y, ref)
            else:
                m = msm_by_id[ref].clone()
                m.scale(power_of_y)
                inner_msm.add_msm(m)
            power_of_y = power_of_y * y % q
        inner_msm.scale(power_of_v * z_diff_i % q)
        outer_msm.add_msm(inner_msm)
        r_outer_acc = (r_outer_acc + power_of_v * r_inner_acc % q * z_diff_i) % q
        power_of_v = power_of_v * v % q

    outer_msm.append_term((-r_outer_acc) % q, params.g[0])
    outer_msm.append_term((-z_0) % q, h1)
    outer_msm.append_term(u, h2)

    msm_accumulator.left.append_term(1, h2)
    msm_accumulator.right.add_msm(outer_msm)
    return GuardKZG(msm_accumulator)


# scheme descriptors used by plonk.{prover,verifier} dispatch
MULTIOPEN = {
    "gwc": (gwc_prove, gwc_verify),
    "shplonk": (shplonk_prove, shplonk_verify),
}
