// Native host-side group arithmetic for halo2_tpu.
//
// The reference implements its host compute path in Rust (field ops in
// halo2curves, `best_multiexp` in halo2_proofs/src/arithmetic.rs:41-198);
// the TPU framework keeps the *device* path in JAX/Pallas but, like the
// reference, runs the small host tails natively: this translation unit
// provides 4x64-limb Montgomery field arithmetic, Jacobian point ops, the
// Pippenger bucket MSM (mirroring ops/msm.py msm_host semantics exactly),
// the window-bucket tail fold, and batch Jacobian->affine normalization.
//
// External encodings are PLAIN (non-Montgomery) 32-byte little-endian
// field elements; points are 64-byte affine (x,y) with (0,0) = identity,
// or 96-byte Jacobian (X,Y,Z) with Z = 0 = identity. All math happens in
// Montgomery form internally.
//
// Exposed via a C ABI consumed with ctypes (halo2_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

namespace {

struct Fe {
    u64 v[4];
};

struct CurveParams {
    Fe p;        // modulus (plain)
    u64 n0inv;   // -p^{-1} mod 2^64
    Fe r2;       // 2^512 mod p (to-Montgomery factor)
    Fe one_m;    // 1 in Montgomery form (= 2^256 mod p)
    bool used;
};

static CurveParams g_curves[16];
static int g_ncurves = 0;

static inline bool fe_is_zero(const Fe &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fe_eq(const Fe &a, const Fe &b) {
    return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
           a.v[3] == b.v[3];
}

static inline int fe_cmp(const Fe &a, const Fe &b) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] < b.v[i]) return -1;
        if (a.v[i] > b.v[i]) return 1;
    }
    return 0;
}

// a += b, returns carry
static inline u64 fe_add_raw(Fe &a, const Fe &b) {
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        c += (u128)a.v[i] + b.v[i];
        a.v[i] = (u64)c;
        c >>= 64;
    }
    return (u64)c;
}

// a -= b, returns borrow
static inline u64 fe_sub_raw(Fe &a, const Fe &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    return (u64)borrow;
}

static inline Fe fe_add(const Fe &a, const Fe &b, const Fe &p) {
    Fe r = a;
    u64 carry = fe_add_raw(r, b);
    if (carry || fe_cmp(r, p) >= 0) fe_sub_raw(r, p);
    return r;
}

static inline Fe fe_sub(const Fe &a, const Fe &b, const Fe &p) {
    Fe r = a;
    if (fe_sub_raw(r, b)) fe_add_raw(r, p);
    return r;
}

static inline Fe fe_dbl(const Fe &a, const Fe &p) { return fe_add(a, a, p); }

// CIOS Montgomery multiplication: r = a*b*R^{-1} mod p, result < p.
static Fe mont_mul(const Fe &a, const Fe &b, const CurveParams &cp) {
    const Fe &p = cp.p;
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        // t += a[i] * b
        u128 c = 0;
        for (int j = 0; j < 4; ++j) {
            c += (u128)t[j] + (u128)a.v[i] * b.v[j];
            t[j] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[4] = (u64)c;
        t[5] = (u64)(c >> 64);
        // reduce one limb
        u64 m = t[0] * cp.n0inv;
        c = (u128)t[0] + (u128)m * p.v[0];
        c >>= 64;
        for (int j = 1; j < 4; ++j) {
            c += (u128)t[j] + (u128)m * p.v[j];
            t[j - 1] = (u64)c;
            c >>= 64;
        }
        c += t[4];
        t[3] = (u64)c;
        t[4] = t[5] + (u64)(c >> 64);
        t[5] = 0;
    }
    Fe r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fe_cmp(r, p) >= 0) fe_sub_raw(r, p);
    return r;
}

static inline Fe to_mont(const Fe &a, const CurveParams &cp) {
    return mont_mul(a, cp.r2, cp);
}

static inline Fe from_mont(const Fe &a, const CurveParams &cp) {
    Fe one = {{1, 0, 0, 0}};
    return mont_mul(a, one, cp);
}

// Jacobian point in Montgomery coordinates; z == 0 <=> identity.
struct Pt {
    Fe x, y, z;
};

static inline bool pt_is_id(const Pt &a) { return fe_is_zero(a.z); }

// Doubling for a = 0 curves (mirrors curves.py jac_double).
static Pt pt_double(const Pt &pt, const CurveParams &cp) {
    const Fe &p = cp.p;
    if (fe_is_zero(pt.z) || fe_is_zero(pt.y)) {
        Pt r;
        memset(&r, 0, sizeof r);
        r.y = cp.one_m;
        return r;
    }
    Fe A = mont_mul(pt.x, pt.x, cp);
    Fe B = mont_mul(pt.y, pt.y, cp);
    Fe C = mont_mul(B, B, cp);
    Fe t = fe_add(pt.x, B, p);
    t = mont_mul(t, t, cp);
    t = fe_sub(t, A, p);
    t = fe_sub(t, C, p);
    Fe D = fe_dbl(t, p);
    Fe E = fe_add(fe_dbl(A, p), A, p);
    Fe F = mont_mul(E, E, cp);
    Pt r;
    r.x = fe_sub(F, fe_dbl(D, p), p);
    Fe c8 = fe_dbl(fe_dbl(fe_dbl(C, p), p), p);
    r.y = fe_sub(mont_mul(E, fe_sub(D, r.x, p), cp), c8, p);
    r.z = fe_dbl(mont_mul(pt.y, pt.z, cp), p);
    return r;
}

// Complete Jacobian + Jacobian addition (mirrors curves.py jac_add).
static Pt pt_add(const Pt &a, const Pt &b, const CurveParams &cp) {
    const Fe &p = cp.p;
    if (pt_is_id(a)) return b;
    if (pt_is_id(b)) return a;
    Fe z1z1 = mont_mul(a.z, a.z, cp);
    Fe z2z2 = mont_mul(b.z, b.z, cp);
    Fe u1 = mont_mul(a.x, z2z2, cp);
    Fe u2 = mont_mul(b.x, z1z1, cp);
    Fe s1 = mont_mul(mont_mul(a.y, b.z, cp), z2z2, cp);
    Fe s2 = mont_mul(mont_mul(b.y, a.z, cp), z1z1, cp);
    if (fe_eq(u1, u2)) {
        if (!fe_eq(s1, s2)) {
            Pt r;
            memset(&r, 0, sizeof r);
            r.y = cp.one_m;
            return r;
        }
        return pt_double(a, cp);
    }
    Fe h = fe_sub(u2, u1, p);
    Fe h2 = fe_dbl(h, p);
    Fe i = mont_mul(h2, h2, cp);
    Fe j = mont_mul(h, i, cp);
    Fe rr = fe_dbl(fe_sub(s2, s1, p), p);
    Fe v = mont_mul(u1, i, cp);
    Pt r;
    r.x = fe_sub(fe_sub(mont_mul(rr, rr, cp), j, p), fe_dbl(v, p), p);
    Fe s1j = mont_mul(s1, j, cp);
    r.y = fe_sub(mont_mul(rr, fe_sub(v, r.x, p), cp), fe_dbl(s1j, p), p);
    Fe zs = fe_add(a.z, b.z, p);
    zs = mont_mul(zs, zs, cp);
    zs = fe_sub(zs, z1z1, p);
    zs = fe_sub(zs, z2z2, p);
    r.z = mont_mul(zs, h, cp);
    return r;
}

// Mixed addition: Jacobian + affine (mirrors curves.py jac_add_affine).
static Pt pt_add_affine(const Pt &a, const Fe &bx, const Fe &by,
                        const CurveParams &cp) {
    const Fe &p = cp.p;
    if (pt_is_id(a)) {
        Pt r;
        r.x = bx;
        r.y = by;
        r.z = cp.one_m;
        return r;
    }
    Fe z1z1 = mont_mul(a.z, a.z, cp);
    Fe u2 = mont_mul(bx, z1z1, cp);
    Fe s2 = mont_mul(mont_mul(by, a.z, cp), z1z1, cp);
    if (fe_eq(u2, a.x)) {
        if (!fe_eq(s2, a.y)) {
            Pt r;
            memset(&r, 0, sizeof r);
            r.y = cp.one_m;
            return r;
        }
        return pt_double(a, cp);
    }
    Fe h = fe_sub(u2, a.x, p);
    Fe hh = mont_mul(h, h, cp);
    Fe i = fe_dbl(fe_dbl(hh, p), p);
    Fe j = mont_mul(h, i, cp);
    Fe rr = fe_dbl(fe_sub(s2, a.y, p), p);
    Fe v = mont_mul(a.x, i, cp);
    Pt r;
    r.x = fe_sub(fe_sub(mont_mul(rr, rr, cp), j, p), fe_dbl(v, p), p);
    Fe yj = mont_mul(a.y, j, cp);
    r.y = fe_sub(mont_mul(rr, fe_sub(v, r.x, p), cp), fe_dbl(yj, p), p);
    Fe zs = fe_add(a.z, h, p);
    zs = mont_mul(zs, zs, cp);
    zs = fe_sub(zs, z1z1, p);
    r.z = fe_sub(zs, hh, p);
    return r;
}

// ---------------------------------------------------------------------------
// Encoding helpers
// ---------------------------------------------------------------------------

static Fe fe_load(const uint8_t *b) {
    Fe r;
    memcpy(r.v, b, 32);  // little-endian limbs on little-endian hosts
    return r;
}

static void fe_store(uint8_t *b, const Fe &a) { memcpy(b, a.v, 32); }

static Pt pt_load_affine(const uint8_t *b, const CurveParams &cp) {
    Fe x = fe_load(b), y = fe_load(b + 32);
    Pt r;
    if (fe_is_zero(x) && fe_is_zero(y)) {
        memset(&r, 0, sizeof r);
        r.y = cp.one_m;
        return r;
    }
    r.x = to_mont(x, cp);
    r.y = to_mont(y, cp);
    r.z = cp.one_m;
    return r;
}

static Pt pt_load_jac(const uint8_t *b, const CurveParams &cp) {
    Pt r;
    r.x = to_mont(fe_load(b), cp);
    r.y = to_mont(fe_load(b + 32), cp);
    r.z = to_mont(fe_load(b + 64), cp);
    return r;
}

static void pt_store_jac(uint8_t *b, const Pt &a, const CurveParams &cp) {
    fe_store(b, from_mont(a.x, cp));
    fe_store(b + 32, from_mont(a.y, cp));
    fe_store(b + 64, from_mont(a.z, cp));
}

}  // namespace

extern "C" {

// Register a curve (modulus little-endian 32 bytes); returns handle or -1.
int h2_curve_new(const uint8_t *p_le) {
    if (g_ncurves >= 16) return -1;
    CurveParams &cp = g_curves[g_ncurves];
    cp.p = fe_load(p_le);
    // n0inv = -p^{-1} mod 2^64 via Newton iteration
    u64 p0 = cp.p.v[0];
    u64 inv = 1;
    for (int i = 0; i < 6; ++i) inv *= 2 - p0 * inv;
    cp.n0inv = (u64)(0 - inv);
    // one_m = 2^256 mod p: start from (2^256 - p) ... compute by doubling 1
    Fe one = {{1, 0, 0, 0}};
    Fe acc = one;
    for (int i = 0; i < 256; ++i) acc = fe_dbl(acc, cp.p);
    cp.one_m = acc;  // 2^256 mod p
    // r2 = 2^512 mod p: double 256 more times
    for (int i = 0; i < 256; ++i) acc = fe_dbl(acc, cp.p);
    cp.r2 = acc;
    cp.used = true;
    return g_ncurves++;
}

// Pippenger MSM mirroring ops/msm.py msm_host: scalars 32B LE each, points
// 64B affine ((0,0) = identity), window width c, nwin windows. Output:
// 96-byte plain Jacobian.
void h2_msm(int curve, size_t n, const uint8_t *scalars,
            const uint8_t *points, int c, int nwin, uint8_t *out) {
    const CurveParams &cp = g_curves[curve];
    // preload points into Montgomery affine (skip flag for identity)
    std::vector<Fe> px(n), py(n);
    std::vector<uint8_t> skip(n);
    for (size_t i = 0; i < n; ++i) {
        Fe x = fe_load(points + 64 * i);
        Fe y = fe_load(points + 64 * i + 32);
        if (fe_is_zero(x) && fe_is_zero(y)) {
            skip[i] = 1;
            continue;
        }
        skip[i] = 0;
        px[i] = to_mont(x, cp);
        py[i] = to_mont(y, cp);
    }
    const u64 mask = ((u64)1 << c) - 1;
    size_t nbuckets = ((size_t)1 << c) - 1;
    std::vector<Pt> buckets(nbuckets);
    Pt id;
    memset(&id, 0, sizeof id);
    id.y = cp.one_m;
    Pt acc = id;
    for (int w = nwin - 1; w >= 0; --w) {
        for (int d = 0; d < c; ++d) acc = pt_double(acc, cp);
        for (size_t b = 0; b < nbuckets; ++b) buckets[b] = id;
        int shift = w * c;
        for (size_t i = 0; i < n; ++i) {
            if (skip[i]) continue;
            int byte = shift >> 3, bit = shift & 7;
            // read up to c+7 bits starting at `shift` from the 32-byte LE
            // scalar (zero-padded read window)
            u64 window = 0;
            for (int k = 0; k < 8 && (size_t)(byte + k) < 32; ++k)
                window |= (u64)scalars[32 * i + byte + k] << (8 * k);
            u64 dg = (window >> bit) & mask;
            if (dg != 0)
                buckets[dg - 1] = pt_add_affine(buckets[dg - 1], px[i], py[i], cp);
        }
        Pt run = id, total = id;
        for (size_t b = nbuckets; b-- > 0;) {
            run = pt_add(run, buckets[b], cp);
            total = pt_add(total, run, cp);
        }
        acc = pt_add(acc, total, cp);
    }
    pt_store_jac(out, acc, cp);
}

// Window-bucket tail fold mirroring ops/msm.py fold_window_buckets:
// buckets = nwin * B affine points (64B each, (0,0) = identity), bucket 0
// of each window ignored. Output 96-byte plain Jacobian.
void h2_bucket_fold(int curve, int nwin, int c, const uint8_t *buckets,
                    uint8_t *out) {
    const CurveParams &cp = g_curves[curve];
    size_t B = (size_t)1 << c;
    Pt id;
    memset(&id, 0, sizeof id);
    id.y = cp.one_m;
    Pt acc = id;
    for (int w = nwin - 1; w >= 0; --w) {
        for (int d = 0; d < c; ++d) acc = pt_double(acc, cp);
        Pt run = id, total = id;
        for (size_t b = B; b-- > 1;) {
            Pt pt = pt_load_affine(buckets + 64 * (w * B + b), cp);
            run = pt_add(run, pt, cp);
            total = pt_add(total, run, cp);
        }
        acc = pt_add(acc, total, cp);
    }
    pt_store_jac(out, acc, cp);
}

// Batch Jacobian -> affine normalization (mirrors curves.py
// batch_to_affine). Input: n 96-byte plain Jacobian points. Output: n
// 64-byte affine points, identity -> (0,0).
void h2_batch_normalize(int curve, size_t n, const uint8_t *jac,
                        uint8_t *affine_out) {
    const CurveParams &cp = g_curves[curve];
    const Fe &p = cp.p;
    std::vector<Pt> pts(n);
    for (size_t i = 0; i < n; ++i) pts[i] = pt_load_jac(jac + 96 * i, cp);
    // prefix products of nonzero z's
    std::vector<Fe> prefix(n);
    Fe run = cp.one_m;  // 1 in mont
    for (size_t i = 0; i < n; ++i) {
        prefix[i] = run;
        if (!fe_is_zero(pts[i].z)) run = mont_mul(run, pts[i].z, cp);
    }
    // invert the full product via Fermat: run^(p-2)
    Fe e = p;
    {
        Fe two = {{2, 0, 0, 0}};
        fe_sub_raw(e, two);
    }
    Fe inv = cp.one_m;
    Fe base = run;
    for (int limb = 0; limb < 4; ++limb) {
        for (int bit = 0; bit < 64; ++bit) {
            if ((e.v[limb] >> bit) & 1) inv = mont_mul(inv, base, cp);
            base = mont_mul(base, base, cp);
        }
    }
    for (size_t i = n; i-- > 0;) {
        uint8_t *o = affine_out + 64 * i;
        if (fe_is_zero(pts[i].z)) {
            memset(o, 0, 64);
            continue;
        }
        Fe zinv = mont_mul(inv, prefix[i], cp);
        inv = mont_mul(inv, pts[i].z, cp);
        Fe zinv2 = mont_mul(zinv, zinv, cp);
        Fe ax = mont_mul(pts[i].x, zinv2, cp);
        Fe ay = mont_mul(mont_mul(pts[i].y, zinv2, cp), zinv, cp);
        fe_store(o, from_mont(ax, cp));
        fe_store(o + 32, from_mont(ay, cp));
    }
}

// Group NTT butterfly network (the inverse NTT over Jacobian points used
// by ParamsIPA g -> g_lagrange, reference arithmetic.rs g_to_lagrange).
// `jacs`: n 96-byte plain Jacobian points, transformed IN PLACE (input in
// standard order; output bit-reversal handled here). `twiddles`: flat
// 32-byte LE scalars - for each stage m = 1,2,4,...,n/2 the m powers
// w_m^0..w_m^{m-1} (total n-1 scalars), computed by the caller in the
// scalar field. `n_inv`: 32-byte LE final scaling scalar.
void h2_g_ntt(int curve, int logn, uint8_t *jacs, const uint8_t *twiddles,
              const uint8_t *n_inv) {
    const CurveParams &cp = g_curves[curve];
    size_t n = (size_t)1 << logn;
    std::vector<Pt> a(n);
    for (size_t i = 0; i < n; ++i) a[i] = pt_load_jac(jacs + 96 * i, cp);
    // bit reversal
    size_t rev = 0;
    for (size_t i = 1; i < n; ++i) {
        size_t bit = n >> 1;
        while (rev & bit) {
            rev ^= bit;
            bit >>= 1;
        }
        rev |= bit;
        if (i < rev) std::swap(a[i], a[rev]);
    }
    auto scalar_mul = [&](const Pt &pt, const uint8_t *k_le) -> Pt {
        Pt acc;
        memset(&acc, 0, sizeof acc);
        acc.y = cp.one_m;
        Pt base = pt;
        Fe k = fe_load(k_le);
        for (int limb = 0; limb < 4; ++limb) {
            u64 kl = k.v[limb];
            // skip trailing all-zero limbs cheaply
            for (int bit = 0; bit < 64; ++bit) {
                if ((kl >> bit) & 1) acc = pt_add(acc, base, cp);
                base = pt_double(base, cp);
            }
        }
        return acc;
    };
    size_t toff = 0;
    for (size_t m = 1; m < n; m <<= 1) {
        for (size_t s = 0; s < n; s += 2 * m) {
            for (size_t j = 0; j < m; ++j) {
                Pt t = scalar_mul(a[s + j + m], twiddles + 32 * (toff + j));
                Pt u = a[s + j];
                a[s + j] = pt_add(u, t, cp);
                Pt tneg = t;
                if (!fe_is_zero(t.y))
                    tneg.y = fe_sub(cp.p, t.y, cp.p);  // -y mod p (mont ok)
                a[s + j + m] = pt_add(u, tneg, cp);
            }
        }
        toff += m;
    }
    for (size_t i = 0; i < n; ++i) a[i] = scalar_mul(a[i], n_inv);
    for (size_t i = 0; i < n; ++i) pt_store_jac(jacs + 96 * i, a[i], cp);
}

// Scalar multiplication [k]P for one point (k 32B LE, point 64B affine).
void h2_mul(int curve, const uint8_t *k_le, const uint8_t *point,
            uint8_t *out) {
    const CurveParams &cp = g_curves[curve];
    Pt base = pt_load_affine(point, cp);
    Pt acc;
    memset(&acc, 0, sizeof acc);
    acc.y = cp.one_m;
    Fe k = fe_load(k_le);
    for (int limb = 0; limb < 4; ++limb) {
        for (int bit = 0; bit < 64; ++bit) {
            if ((k.v[limb] >> bit) & 1) acc = pt_add(acc, base, cp);
            base = pt_double(base, cp);
        }
    }
    pt_store_jac(out, acc, cp);
}

}  // extern "C"
