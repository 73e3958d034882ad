// hehub_tpu native host runtime.
//
// Host-side exact kernels that complement the TPU compute path (role of the
// reference's CPU-side number theory: bigint/CRT compose bigint.cpp:330-405,
// NTT ntt.cpp:145-222, prime tables primelists.cpp — all redesigned, not
// ported: fixed-width 64-bit limb vectors instead of base-10 digit strings,
// Montgomery-free u128 Barrett, programmatic Miller-Rabin primes).
//
// Exposed with a plain C ABI for ctypes. Built by hehub_tpu/native/loader.py.

#include <cstdint>
#include <cstring>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = __uint128_t;

extern "C" {

// ---------------------------------------------------------------------------
// Miller-Rabin (deterministic < 2^64) + NTT prime search
// ---------------------------------------------------------------------------

static u64 mulmod_u64(u64 a, u64 b, u64 m) { return (u128)a * b % m; }

static u64 powmod_u64(u64 a, u64 e, u64 m) {
    u64 r = 1;
    a %= m;
    while (e) {
        if (e & 1) r = mulmod_u64(r, a, m);
        a = mulmod_u64(a, a, m);
        e >>= 1;
    }
    return r;
}

int hh_is_prime_u64(u64 n) {
    if (n < 2) return 0;
    static const u64 bases[] = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37};
    for (u64 p : bases) {
        if (n % p == 0) return n == p;
    }
    u64 d = n - 1;
    int r = 0;
    while ((d & 1) == 0) { d >>= 1; ++r; }
    for (u64 a : bases) {
        u64 x = powmod_u64(a, d, n);
        if (x == 1 || x == n - 1) continue;
        bool composite = true;
        for (int i = 0; i < r - 1; ++i) {
            x = mulmod_u64(x, x, n);
            if (x == n - 1) { composite = false; break; }
        }
        if (composite) return 0;
    }
    return 1;
}

// Signed-int64 residue decomposition: coeffs [count] i64 -> residues
// [L, count] u32 (strict). The hot half of the CKKS encoder's host work.
void hh_decompose_i64(const int64_t* coeffs, long long count,
                      const u64* mods, int L, u32* out) {
    for (int l = 0; l < L; ++l) {
        const int64_t q = (int64_t)mods[l];
        u32* row = out + (size_t)l * count;
        for (long long i = 0; i < count; ++i) {
            int64_t r = coeffs[i] % q;
            if (r < 0) r += q;
            row[i] = (u32)r;
        }
    }
}

// Find `count` NTT primes q ≡ 1 (mod 2n), 2^(bits-1) <= q < 2^bits, searching
// downward. Returns number found.
int hh_gen_ntt_primes(int bits, int count, u64 n, u64* out) {
    u64 step = 2 * n;
    u64 hi = (u64)1 << bits;
    u64 lo = (u64)1 << (bits - 1);
    u64 q = hi - ((hi - 1) % step);
    int found = 0;
    while (found < count && q > lo) {
        if (hh_is_prime_u64(q)) out[found++] = q;
        q -= step;
    }
    return found;
}

// ---------------------------------------------------------------------------
// Exact CRT compose: residues [L, n] u32 -> centered values as i64 when they
// fit, else flagged. Limb-vector big integers for the general path.
// ---------------------------------------------------------------------------

namespace {

// little multiprecision helpers over vector<u64> (little-endian limbs)
static void mp_mul_small(std::vector<u64>& a, u64 m) {
    u128 carry = 0;
    for (auto& x : a) {
        u128 t = (u128)x * m + carry;
        x = (u64)t;
        carry = t >> 64;
    }
    if (carry) a.push_back((u64)carry);
}

static void mp_add_small(std::vector<u64>& a, u64 v) {
    u128 carry = v;
    for (auto& x : a) {
        if (!carry) break;
        u128 t = (u128)x + carry;
        x = (u64)t;
        carry = t >> 64;
    }
    if (carry) a.push_back((u64)carry);
}

static void mp_add(std::vector<u64>& a, const std::vector<u64>& b) {
    if (b.size() > a.size()) a.resize(b.size(), 0);
    u128 carry = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        u128 t = (u128)a[i] + (i < b.size() ? b[i] : 0) + carry;
        a[i] = (u64)t;
        carry = t >> 64;
    }
    if (carry) a.push_back((u64)carry);
}

static int mp_cmp(const std::vector<u64>& a, const std::vector<u64>& b) {
    size_t na = a.size(), nb = b.size();
    while (na && a[na - 1] == 0) --na;
    while (nb && b[nb - 1] == 0) --nb;
    if (na != nb) return na < nb ? -1 : 1;
    for (size_t i = na; i-- > 0;) {
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    }
    return 0;
}

static void mp_sub(std::vector<u64>& a, const std::vector<u64>& b) {  // a >= b
    long long borrow = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        u128 bi = (i < b.size() ? b[i] : 0);
        u128 ai = a[i];
        u128 rhs = bi + (borrow ? 1 : 0);
        if (ai >= rhs) {
            a[i] = (u64)(ai - rhs);
            borrow = 0;
        } else {
            a[i] = (u64)(((u128)1 << 64) + ai - rhs);
            borrow = 1;
        }
    }
}

static u64 mp_mod_u64(const std::vector<u64>& a, u64 m) {
    u128 r = 0;
    for (size_t i = a.size(); i-- > 0;) {
        r = ((r << 32) | (a[i] >> 32)) % m;
        r = ((r << 32) | (a[i] & 0xffffffffULL)) % m;
    }
    return (u64)r;
}

}  // namespace

// CRT-compose residues[k*n + i] (mod moduli[k]) for each coefficient i, then
// reduce the *centered* value mod new_mod into out[i] (in [0, new_mod)).
// This is the exact k->1 signed base conversion used by BGV decryption
// (role of rns_base_transform_to_single, rns_transform.cpp:39-105).
void hh_compose_mod(const u32* residues, const u64* moduli, int L, long long n,
                    u64 new_mod, u32* out) {
    // Garner precompute: punctured products P_k = Q/q_k mod-free via bigints
    std::vector<std::vector<u64>> punctured(L);
    std::vector<u64> Q{1};
    for (int k = 0; k < L; ++k) mp_mul_small(Q, moduli[k]);
    for (int k = 0; k < L; ++k) {
        std::vector<u64> p{1};
        for (int j = 0; j < L; ++j)
            if (j != k) mp_mul_small(p, moduli[j]);
        punctured[k] = std::move(p);
    }
    std::vector<u64> inv(L);
    for (int k = 0; k < L; ++k) {
        u64 pk = mp_mod_u64(punctured[k], moduli[k]);
        inv[k] = powmod_u64(pk, moduli[k] - 2, moduli[k]);  // prime moduli
    }
    std::vector<u64> half_Q = Q;  // floor(Q/2)
    {
        u64 carry = 0;
        for (size_t i = half_Q.size(); i-- > 0;) {
            u64 cur = half_Q[i];
            half_Q[i] = (cur >> 1) | (carry << 63);
            carry = cur & 1;
        }
    }
    u64 q_mod_new = mp_mod_u64(Q, new_mod);

    std::vector<u64> acc;
    for (long long i = 0; i < n; ++i) {
        acc.assign(1, 0);
        for (int k = 0; k < L; ++k) {
            u64 yk = mulmod_u64(residues[(size_t)k * n + i] % moduli[k], inv[k],
                                moduli[k]);
            std::vector<u64> term = punctured[k];
            mp_mul_small(term, yk);
            mp_add(acc, term);
        }
        // acc mod Q (acc < L*Q, subtract Q a few times)
        while (mp_cmp(acc, Q) >= 0) mp_sub(acc, Q);
        u64 r = mp_mod_u64(acc, new_mod);
        if (mp_cmp(acc, half_Q) > 0) {
            // negative representative: value - Q
            r = (r + new_mod - q_mod_new % new_mod) % new_mod;
        }
        out[i] = (u32)r;
    }
}

// Centered CRT compose to double (for CKKS decode): out[i] = double of the
// centered composed value.
void hh_compose_double(const u32* residues, const u64* moduli, int L,
                       long long n, double* out) {
    std::vector<std::vector<u64>> punctured(L);
    std::vector<u64> Q{1};
    for (int k = 0; k < L; ++k) mp_mul_small(Q, moduli[k]);
    for (int k = 0; k < L; ++k) {
        std::vector<u64> p{1};
        for (int j = 0; j < L; ++j)
            if (j != k) mp_mul_small(p, moduli[j]);
        punctured[k] = std::move(p);
    }
    std::vector<u64> inv(L);
    for (int k = 0; k < L; ++k) {
        u64 pk = mp_mod_u64(punctured[k], moduli[k]);
        inv[k] = powmod_u64(pk, moduli[k] - 2, moduli[k]);
    }
    std::vector<u64> half_Q = Q;
    {
        u64 carry = 0;
        for (size_t i = half_Q.size(); i-- > 0;) {
            u64 cur = half_Q[i];
            half_Q[i] = (cur >> 1) | (carry << 63);
            carry = cur & 1;
        }
    }
    auto to_double = [](const std::vector<u64>& a) {
        double r = 0, scale = 1;
        for (size_t i = 0; i < a.size(); ++i) {
            r += (double)a[i] * scale;
            scale *= 18446744073709551616.0;  // 2^64
        }
        return r;
    };
    std::vector<u64> acc;
    for (long long i = 0; i < n; ++i) {
        acc.assign(1, 0);
        for (int k = 0; k < L; ++k) {
            u64 yk = mulmod_u64(residues[(size_t)k * n + i] % moduli[k], inv[k],
                                moduli[k]);
            std::vector<u64> term = punctured[k];
            mp_mul_small(term, yk);
            mp_add(acc, term);
        }
        while (mp_cmp(acc, Q) >= 0) mp_sub(acc, Q);
        if (mp_cmp(acc, half_Q) > 0) {
            std::vector<u64> neg = Q;
            mp_sub(neg, acc);
            out[i] = -to_double(neg);
        } else {
            out[i] = to_double(acc);
        }
    }
}

// ---------------------------------------------------------------------------
// Host negacyclic NTT (oracle / keygen helper); same no-bitreversal layout as
// the TPU kernels: CT forward natural->bitrev, Shoup-free u128 mulmod.
// ---------------------------------------------------------------------------

void hh_ntt_fwd(u32* data, long long n, u64 q, const u32* tw /* psi^bitrev */) {
    for (long long m = 1, t = n >> 1; m < n; m <<= 1, t >>= 1) {
        for (long long b = 0; b < m; ++b) {
            u64 w = tw[m + b];
            u32* lo = data + 2 * b * t;
            u32* hi = lo + t;
            for (long long j = 0; j < t; ++j) {
                u64 wh = mulmod_u64(hi[j], w, q);
                u64 l = lo[j] % q;
                hi[j] = (u32)((l + q - wh) % q);
                lo[j] = (u32)((l + wh) % q);
            }
        }
    }
}

void hh_ntt_inv(u32* data, long long n, u64 q, const u32* tw_inv, u64 n_inv) {
    for (long long t = 1, h = n >> 1; h >= 1; t <<= 1, h >>= 1) {
        for (long long b = 0; b < h; ++b) {
            u64 w = tw_inv[h + b];
            u32* lo = data + 2 * b * t;
            u32* hi = lo + t;
            for (long long j = 0; j < t; ++j) {
                u64 l = lo[j] % q, hgh = hi[j] % q;
                lo[j] = (u32)((l + hgh) % q);
                hi[j] = (u32)mulmod_u64((l + q - hgh) % q, w, q);
            }
        }
    }
    for (long long i = 0; i < n; ++i)
        data[i] = (u32)mulmod_u64(data[i], n_inv, q);
}

}  // extern "C"
