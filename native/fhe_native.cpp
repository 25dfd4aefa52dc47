// Native host-side components for learn-fhe-tpu.
//
// Two roles (both OFF the TPU device path, which is JAX/XLA):
//  1. Exact reference oracles (schoolbook negacyclic products over Z_q and
//     the 2^64 torus, gadget decompositions, a u64 Shoup NTT) used by the
//     test suite in place of Python-object bigint loops -- semantics mirror
//     the Rust reference (`util/src/ring.rs:421-440`, `misc/decompose.rs`,
//     `ring/fft/zq.rs`) so parity checks are fast enough to sweep widely.
//  2. Host runtime pieces with per-element control flow that Python loops
//     poorly: the LMKCDEY blind-rotation schedule transcription
//     (`scheme/fhew/src/bootstrapping.rs:171-231`) over batches of public
//     LWE masks.
//
// Plain C ABI; loaded from Python with ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;
using i64 = int64_t;

extern "C" {

// ---------------------------------------------------------------------------
// Exact negacyclic schoolbook products
// ---------------------------------------------------------------------------

// c = a * b mod (X^n + 1, 2^64); batch polynomials laid out contiguously.
void nega_mul_t64(const u64* a, const u64* b, u64* out, i64 batch, i64 n) {
  for (i64 t = 0; t < batch; ++t) {
    const u64* pa = a + t * n;
    const u64* pb = b + t * n;
    u64* pc = out + t * n;
    std::memset(pc, 0, sizeof(u64) * n);
    for (i64 i = 0; i < n; ++i) {
      const u64 ai = pa[i];
      if (!ai) continue;
      for (i64 j = 0; j < n; ++j) {
        const u64 prod = ai * pb[j];  // wrapping mod 2^64
        const i64 k = i + j;
        if (k < n) pc[k] += prod; else pc[k - n] -= prod;
      }
    }
  }
}

// c = a * b mod (X^n + 1, q) for q < 2^63, inputs reduced.
void nega_mul_zq(const u64* a, const u64* b, u64* out, i64 batch, i64 n, u64 q) {
  std::vector<u128> acc(n);
  const u128 q2 = (u128)q * q;
  for (i64 t = 0; t < batch; ++t) {
    const u64* pa = a + t * n;
    const u64* pb = b + t * n;
    u64* pc = out + t * n;
    for (i64 k = 0; k < n; ++k) acc[k] = 0;
    for (i64 i = 0; i < n; ++i) {
      const u64 ai = pa[i];
      if (!ai) continue;
      for (i64 j = 0; j < n; ++j) {
        const u128 prod = (u128)ai * pb[j];
        const i64 k = i + j;
        if (k < n) {
          acc[k] += prod;
          if (acc[k] >= q2) acc[k] -= q2;  // keep headroom (q2 < 2^126)
        } else {
          // subtract: add q^2 - prod (prod < q^2)
          acc[k - n] += q2 - prod;
          if (acc[k - n] >= q2) acc[k - n] -= q2;
        }
      }
    }
    for (i64 k = 0; k < n; ++k) pc[k] = (u64)(acc[k] % q);
  }
}

// ---------------------------------------------------------------------------
// Gadget decompositions (reference `misc/decompose.rs:91-135` semantics)
// ---------------------------------------------------------------------------

// Zq: digits in (-B/2, B/2] mapped into [0, q); out shape (d, len).
void decompose_zq(const u64* x, u64* out, i64 len, u64 q, int log_b, int d,
                  int rounding_bits) {
  const u64 mask = (log_b < 64) ? ((1ull << log_b) - 1) : ~0ull;
  const u64 b_by_2 = 1ull << (log_b - 1);
  const u64 neg_b = q - (1ull << log_b);
  for (i64 i = 0; i < len; ++i) {
    u64 v = x[i];
    if (rounding_bits) {
      u64 half = (1ull << rounding_bits >> 1) % q;
      v = v + half;
      if (v >= q) v -= q;
      v >>= rounding_bits;
    }
    if (v >= (q >> 1)) v -= q;  // centered two's complement
    for (int l = 0; l < d; ++l) {
      u64 limb = v & mask;
      u64 carry = (limb + (v & 1) > b_by_2) ? 1 : 0;
      v = (v >> log_b) + carry;
      out[(i64)l * len + i] = limb + carry * neg_b;
    }
  }
}

// T64: branch-free carry digits as wrapping u64; out shape (d, len).
void decompose_t64(const u64* x, u64* out, i64 len, int log_b, int d,
                   int rounding_bits) {
  const u64 mask = (1ull << log_b) - 1;
  for (i64 i = 0; i < len; ++i) {
    u64 v = x[i];
    if (rounding_bits) v = (v + (1ull << (rounding_bits - 1))) >> rounding_bits;
    for (int l = 0; l < d; ++l) {
      u64 limb = v & mask;
      v >>= log_b;
      u64 carry = (((limb - 1) | v) & limb) >> (log_b - 1);
      v += carry;
      out[(i64)l * len + i] = limb - (carry << log_b);
    }
  }
}

// ---------------------------------------------------------------------------
// u64 negacyclic NTT (merged twist, eprint 2016/504 Alg 1-2) -- host oracle
// ---------------------------------------------------------------------------

static inline u64 mulmod(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }

// psi_br: (n) bit-reversed powers of psi_2n. In-place, normal->bitrev order.
void ntt_forward(u64* x, const u64* psi_br, i64 batch, i64 n, u64 q) {
  for (i64 t = 0; t < batch; ++t) {
    u64* p = x + t * n;
    for (i64 m = 1, half = n >> 1; half >= 1; m <<= 1, half >>= 1) {
      for (i64 blk = 0; blk < m; ++blk) {
        const u64 w = psi_br[m + blk];
        u64* u = p + blk * 2 * half;
        u64* v = u + half;
        for (i64 j = 0; j < half; ++j) {
          const u64 tv = mulmod(v[j], w, q);
          const u64 uu = u[j];
          u[j] = uu + tv >= q ? uu + tv - q : uu + tv;
          v[j] = uu >= tv ? uu - tv : uu + q - tv;
        }
      }
    }
  }
}

// psi_inv_br: bit-reversed inverse powers; n_inv = n^-1 mod q. bitrev->normal.
void ntt_inverse(u64* x, const u64* psi_inv_br, u64 n_inv, i64 batch, i64 n,
                 u64 q) {
  for (i64 t = 0; t < batch; ++t) {
    u64* p = x + t * n;
    for (i64 m = n >> 1, half = 1; m >= 1; m >>= 1, half <<= 1) {
      for (i64 blk = 0; blk < m; ++blk) {
        const u64 w = psi_inv_br[m + blk];
        u64* u = p + blk * 2 * half;
        u64* v = u + half;
        for (i64 j = 0; j < half; ++j) {
          const u64 uu = u[j], vv = v[j];
          u[j] = uu + vv >= q ? uu + vv - q : uu + vv;
          v[j] = mulmod(uu >= vv ? uu - vv : uu + q - vv, w, q);
        }
      }
    }
    for (i64 j = 0; j < n; ++j) p[j] = mulmod(p[j], n_inv, q);
  }
}

// ---------------------------------------------------------------------------
// LMKCDEY schedule transcription (`fhew/bootstrapping.rs:171-231`)
// ---------------------------------------------------------------------------

// For each of `batch` rows of a (already in Z_2N), emit the padded (op, idx)
// schedule: op 0 = external product (idx = key index j), op 1 = automorphism
// by g^idx (idx 0 encodes t = -g), op 2 = noop padding.
// minus_map/plus_map: (2n) i64, value -> dlog or -1 (params.dlog_tables).
// ops/idxs: (batch, sched_len) i32 outputs. Returns 0 on success, -1 if a
// schedule overflows sched_len or a value appears in both tables.
int build_schedule(const i64* a, i64 batch, i64 n_lwe, i64 two_n,
                   const i64* minus_map, const i64* plus_map, i64 half,
                   int window, int32_t* ops, int32_t* idxs, i64 sched_len) {
  (void)two_n;  // map length, implied by the tables
  std::vector<std::vector<int32_t>> i_minus(half), i_plus(half);
  for (i64 t = 0; t < batch; ++t) {
    for (i64 l = 0; l < half; ++l) { i_minus[l].clear(); i_plus[l].clear(); }
    const i64* row = a + t * n_lwe;
    for (i64 j = 0; j < n_lwe; ++j) {
      const i64 aj = row[j];
      const i64 lm = minus_map[aj], lp = plus_map[aj];
      if (lm >= 0 && lp < 0) i_minus[lm].push_back((int32_t)j);
      else if (lp >= 0 && lm < 0) i_plus[lp].push_back((int32_t)j);
      else if (aj != 0) return -1;
    }
    int32_t* op_row = ops + t * sched_len;
    int32_t* idx_row = idxs + t * sched_len;
    i64 k = 0;
    auto emit = [&](int32_t op, int32_t idx) -> bool {
      if (k >= sched_len) return false;
      op_row[k] = op; idx_row[k] = idx; ++k;
      return true;
    };
    auto walk = [&](std::vector<std::vector<int32_t>>& buckets) -> bool {
      int v = 0;
      for (i64 l = (i64)buckets.size() - 1; l >= 1; --l) {
        for (int32_t j : buckets[l])
          if (!emit(0, j)) return false;
        v += 1;
        if (!buckets[l - 1].empty() || v == window || l == 1) {
          if (!emit(1, v)) return false;
          v = 0;
        }
      }
      return true;
    };
    bool ok = walk(i_minus);
    for (int32_t j : i_minus[0]) ok = ok && emit(0, j);
    ok = ok && emit(1, 0);  // ak[0]: t = -g
    ok = ok && walk(i_plus);
    for (int32_t j : i_plus[0]) ok = ok && emit(0, j);
    if (!ok) return -1;
    for (; k < sched_len; ++k) { op_row[k] = 2; idx_row[k] = 0; }
  }
  return 0;
}

// Fuse each automorphism into the preceding external-product step (the
// batched-walk cost model: steps are the cost, so runs of ext ops carry the
// following auto for free). Mirrors fuse_schedule in
// models/fhew/bootstrapping.py exactly. ops/idxs: (batch, sched_len) i32 as
// emitted by build_schedule (op 0 = ext, 1 = auto, 2 = noop tail padding).
// e_out/a_out: (batch, sched_len) i32, filled with -1 then the fused pairs.
// Returns the maximum fused length across the batch.
i64 fuse_schedule(const int32_t* ops, const int32_t* idxs, i64 batch,
                  i64 sched_len, int32_t* e_out, int32_t* a_out) {
  i64 max_len = 0;
  for (i64 b = 0; b < batch; ++b) {
    const int32_t* op_row = ops + b * sched_len;
    const int32_t* idx_row = idxs + b * sched_len;
    int32_t* e_row = e_out + b * sched_len;
    int32_t* a_row = a_out + b * sched_len;
    for (i64 t = 0; t < sched_len; ++t) { e_row[t] = -1; a_row[t] = -1; }
    i64 k = 0;
    bool open_ext = false;
    for (i64 t = 0; t < sched_len; ++t) {
      const int32_t op = op_row[t];
      if (op == 0) {
        e_row[k] = idx_row[t];
        open_ext = true;
        ++k;
      } else if (op == 1) {
        if (open_ext) {
          a_row[k - 1] = idx_row[t];
          open_ext = false;
        } else {
          a_row[k] = idx_row[t];
          ++k;
        }
      } else {
        break;  // noop padding: schedules pad only at the tail
      }
    }
    if (k > max_len) max_len = k;
  }
  return max_len;
}

}  // extern "C"
