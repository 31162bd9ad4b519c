"""NTT and EvaluationDomain tests, mirroring the reference's domain test
oracles (`domain.rs:722-965`): rotation, l_i, extended-part equivalence, and
cluster-merge equivalence."""

import random

import pytest

from halo2_tpu.fields import Fp, Fq
from halo2_tpu.ops import field_jax as fj
from halo2_tpu.ops.ntt import NttPlan, intt, ntt
from halo2_tpu.poly import COEFF, EXTENDED, LAGRANGE, FVec, Polynomial, Rotation, eval_polynomial_host
from halo2_tpu.poly.domain import EvaluationDomain


def naive_dft(vals, omega, p):
    n = len(vals)
    return [
        sum(vals[j] * pow(omega, i * j, p) for j in range(n)) % p for i in range(n)
    ]


@pytest.mark.parametrize("k", [3, 6])
def test_ntt_matches_naive_dft(k):
    F = Fq
    p = F.MODULUS
    n = 1 << k
    omega = pow(F.ROOT_OF_UNITY, 1 << (F.S - k), p)
    rng = random.Random(k)
    vals = [rng.randrange(p) for _ in range(n)]
    a = FVec.from_ints(F, vals)
    out = FVec(F, ntt(a.vals, F, omega)).to_ints()
    assert out == naive_dft(vals, omega, p)


def test_intt_roundtrip():
    F = Fq
    p = F.MODULUS
    k, n = 5, 32
    omega = pow(F.ROOT_OF_UNITY, 1 << (F.S - k), p)
    omega_inv = pow(omega, -1, p)
    n_inv = pow(n, -1, p)
    rng = random.Random(1)
    vals = [rng.randrange(p) for _ in range(n)]
    a = FVec.from_ints(F, vals)
    fwd = ntt(a.vals, F, omega)
    back = FVec(F, intt(fwd, F, omega_inv, n_inv)).to_ints()
    assert back == vals


def test_lagrange_to_coeff_eval_agree():
    # iFFT output must evaluate back to the lagrange values at omega^i
    F = Fq
    p = F.MODULUS
    dom = EvaluationDomain(F, 3, 4)
    rng = random.Random(2)
    vals = [rng.randrange(p) for _ in range(dom.n)]
    lag = dom.lagrange_from_vec(FVec.from_ints(F, vals))
    coeff = dom.lagrange_to_coeff(lag)
    cs = coeff.vec.to_ints()
    for i in [0, 1, 7, 15]:
        x = pow(dom.omega, i, p)
        assert eval_polynomial_host(cs, x, p) == vals[i]


def test_rotate_omega_and_l_i():
    # mirrors reference test_rotate / test_l_i (domain.rs:722-792)
    F = Fq
    p = F.MODULUS
    dom = EvaluationDomain(F, 1, 3)
    x = random.Random(3).randrange(p)
    assert dom.rotate_omega(x, Rotation(1)) == x * dom.omega % p
    assert dom.rotate_omega(x, Rotation(-1)) == x * dom.omega_inv % p
    # l_i(x) at random x matches the direct product formula
    n = dom.n
    x = random.Random(33).randrange(p)
    evals = dom.l_i_range(x, pow(x, n, p), range(n))
    for i in range(n):
        wi = pow(dom.omega, i, p)
        num, den = 1, 1
        for j in range(n):
            if j == i:
                continue
            wj = pow(dom.omega, j, p)
            num = num * (x - wj) % p
            den = den * (wi - wj) % p
        assert evals[i] == num * pow(den, -1, p) % p, i


def test_coeff_to_extended_part_equivalence():
    # mirrors reference test_coeff_to_extended_part (domain.rs:794-812):
    # interleaved parts == full coset extended FFT
    F = Fq
    p = F.MODULUS
    dom = EvaluationDomain(F, 3, 4)
    rng = random.Random(4)
    vals = [rng.randrange(p) for _ in range(dom.n)]
    coeff = dom.coeff_from_vec(FVec.from_ints(F, vals))
    full = dom.coeff_to_extended(coeff.copy()).vec.to_ints()
    parts = dom.coeff_to_extended_parts(coeff)
    merged = dom.lagrange_vec_to_extended(parts).vec.to_ints()
    assert merged == full


def test_extended_roundtrip_and_vanishing_division():
    # (x^n - 1) * q(x) in extended basis, divided by vanishing, matches q
    F = Fq
    p = F.MODULUS
    dom = EvaluationDomain(F, 3, 4)
    rng = random.Random(5)
    n = dom.n
    # construct h = t(X) * q(X) with deg(q) < n*(j-1), via coefficient mult
    q = [rng.randrange(p) for _ in range(n)]  # low-degree q
    h = [0] * (2 * n)
    for i, c in enumerate(q):
        h[i] = (h[i] - c) % p  # -q
        h[i + n] = (h[i + n] + c) % p  # X^n q
    h += [0] * (dom.extended_n - len(h))
    # bring h (coeff form, extended length) into extended evaluation basis:
    # evaluate at zeta*ext_omega^i via plain NTT after coset shift
    hv = FVec.from_ints(F, h)
    shifted = dom._distribute_powers(hv.vals, dom.g_coset)
    ext_eval = FVec(F, ntt(shifted, F, dom.extended_omega))
    hpoly = Polynomial(EXTENDED, ext_eval)
    divided = dom.divide_by_vanishing_poly(hpoly)
    back = dom.extended_to_coeff(divided).to_ints()
    assert back[:n] == q
    assert all(v == 0 for v in back[n:])


def test_lagrange_vecs_to_extended():
    # mirrors reference test_lagrange_vecs_to_extended (domain.rs:847-901):
    # sum of per-cluster contributions equals direct extended evaluation.
    # Cluster c holds 2^c parts of length n; part j is the evaluation of the
    # cluster polynomial on the sub-coset zeta * ext_omega^(j*(m>>c)) * <omega>
    # (evaluation.rs:426-428: need_to_compute uses part_idx % (m>>c) == 0).
    F = Fq
    p = F.MODULUS
    dom = EvaluationDomain(F, 5, 3)  # k=3, extended_k=5, m=4 parts
    m = dom.extended_n >> dom.k
    rng = random.Random(6)

    def eval_at(coeffs, x):
        return eval_polynomial_host(coeffs, x, p)

    clusters = []
    total_ext = [0] * dom.extended_n
    num_clusters = (dom.extended_k - dom.k) + 1
    for c in range(num_clusters):
        size = dom.n << c
        coeffs = [rng.randrange(p) for _ in range(size)]
        for t in range(dom.extended_n):
            x = dom.g_coset * pow(dom.extended_omega, t, p) % p
            total_ext[t] = (total_ext[t] + eval_at(coeffs, x)) % p
        cluster_parts = []
        for j in range(1 << c):
            factor = pow(dom.extended_omega, j * (m >> c), p)
            pts = [
                dom.g_coset * factor % p * pow(dom.omega, i, p) % p
                for i in range(dom.n)
            ]
            cluster_parts.append(
                Polynomial(LAGRANGE, FVec.from_ints(F, [eval_at(coeffs, x) for x in pts]))
            )
        clusters.append(cluster_parts)

    merged = dom.lagrange_vecs_to_extended(clusters).vec.to_ints()
    assert merged == total_ext
