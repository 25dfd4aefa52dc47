"""TFHE PBS transcript from the independent oracle — python mirror of
tools/rust-dump/src/transcripts.rs::dump_tfhe (fixture
`/root/reference/scheme/tfhe/src/bootstrapping.rs:141-152`).

Full protocol transcription from the Rust sources (tlwe/tglwe/tggsw/
bootstrapping), exact wrapping-u64 torus arithmetic, zero learn_fhe_tpu
imports. The JAX pipeline's blind rotation applies monomials in the NTT
domain (ARCHITECTURE §4) and differs from the reference CMux by one
decomposition-rounding term, so tests/test_rust_transcripts.py compares
PBS outputs at the decrypt/phase level (keys and inputs bit-exactly).

Usage: python tools/pydump/tfhe_dump.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from core import (  # noqa: E402
    MASK64,
    SplitMix64,
    negacyclic_mul_small,
    sample_binary,
    sample_tdg,
    write_npy_u64,
)

SEED_TFHE = 0x7F4E_2026_0817  # transcripts.rs:78

# fixture (bootstrapping.rs:141-152)
LOG_P, PADDING = 4, 1
N_LWE, STD_LWE, LOG_B_KS, D_KS = 1024, 1.339775301998614e-7, 4, 5
BIG_N, K, STD_GLWE, LOG_B, D = 2048, 1, 2.845267479601915e-15, 23, 1
P = 1 << LOG_P
LOG_DELTA = 64 - (LOG_P + PADDING)

U64 = np.uint64


def _u(x) -> np.ndarray:
    return np.asarray(x, dtype=U64)


def t64_decompose(x: np.ndarray, log_b: int, d: int) -> list:
    """Vectorized `decompose.rs:114-134` over u64 arrays."""
    bits = max(0, 64 - log_b * d)
    with np.errstate(over="ignore"):
        v = (_u(x) + U64((1 << bits) >> 1)) >> U64(bits)
        mask = U64((1 << log_b) - 1)
        out = []
        for _ in range(d):
            limb = v & mask
            v = v >> U64(log_b)
            carry = (((limb - U64(1)) | v) & limb) >> U64(log_b - 1)
            v = v + carry
            out.append(limb - (carry << U64(log_b)))
    return out


def t64_rounding_shr(x: np.ndarray, bits: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (_u(x) + U64((1 << bits) >> 1)) >> U64(bits)


def centered_i64(x: np.ndarray) -> np.ndarray:
    """u64 two's-complement -> signed i64 (exact view)."""
    return _u(x).view(np.int64)


def uniform_u64(n, rng) -> np.ndarray:
    return _u([rng.next() for _ in range(n)])


def tdg_poly(std, n, rng) -> np.ndarray:
    return _u([sample_tdg(std, rng) for _ in range(n)])


def negacyclic_u64(small_i64: np.ndarray, b_u64: np.ndarray) -> np.ndarray:
    """small signed x u64 negacyclic product mod 2^64 -> u64 array."""
    r = negacyclic_mul_small(
        np.array([int(v) for v in small_i64], dtype=object), b_u64, 1 << 64
    )
    return _u([int(v) for v in r])


def tlwe_sk_gen(rng) -> np.ndarray:
    """`tlwe.rs:96-98`: binary."""
    return np.array([sample_binary(rng) for _ in range(N_LWE)], dtype=np.int64)


def tlwe_encrypt(z, pt_u64, rng):
    """`tlwe.rs:122-132`."""
    with np.errstate(over="ignore"):
        a = uniform_u64(N_LWE, rng)
        e = U64(sample_tdg(STD_LWE, rng))
        b = U64((int(np.sum(a * _u(z))) + int(e) + int(pt_u64)) & MASK64)
    return a, b


def tlwe_decrypt_phase(z, a, b) -> int:
    return (int(b) - int(np.sum(_u(a) * _u(np.asarray(z, dtype=np.int64))))) & MASK64


def tglwe_zero_encrypt(s_rings, rng):
    """`tglwe.rs:91-103` with pt=0: k uniform ring masks, tdg error."""
    with np.errstate(over="ignore"):
        a = [uniform_u64(BIG_N, rng) for _ in range(K)]
        e = tdg_poly(STD_GLWE, BIG_N, rng)
        b = e.copy()
        for aj, sj in zip(a, s_rings):
            b = b + negacyclic_u64(sj, aj)
    return a, b


def key_gen(z, rng):
    """`tfhe/bootstrapping.rs:59-75`: s, brk, ksk in this order."""
    s = np.array([sample_binary(rng) for _ in range(K * BIG_N)], dtype=np.int64)
    s_rings = [s[i * BIG_N : (i + 1) * BIG_N] for i in range(K)]

    # brk: one TGGSW per z_i (`tggsw.rs:73-89`)
    brk = []
    bases = [max(0, 64 - LOG_B * D) + i * LOG_B for i in range(D)]
    for zi in z:
        pt_limbs = [
            _u([(int(zi) << bits) & MASK64] + [0] * (BIG_N - 1)) for bits in bases
        ]
        cts = [tglwe_zero_encrypt(s_rings, rng) for _ in range((K + 1) * D)]
        rows = []
        with np.errstate(over="ignore"):
            for idx, (a, b) in enumerate(cts):
                if idx < K * D:
                    j, i = divmod(idx, D)
                    a = [x.copy() for x in a]
                    a[j] = a[j] + pt_limbs[i]
                else:
                    b = b + pt_limbs[idx - K * D]
                rows.append((a, b))
        brk.append(rows)

    # ksk: power_up(-s) digit-major, each TLWE-encrypted under z
    # (`tlwe.rs:100-111`)
    ksk_bases = [max(0, 64 - LOG_B_KS * D_KS) + i * LOG_B_KS for i in range(D_KS)]
    ksk_a, ksk_b = [], []
    for bits in ksk_bases:
        for si in s:
            pt = ((-int(si)) << bits) & MASK64
            a, b = tlwe_encrypt(z, pt, rng)
            ksk_a.append(a)
            ksk_b.append(b)
    return s, brk, (ksk_a, ksk_b)


def rotate(ct, e):
    """TglweCiphertext.rotate: multiply every component by X^e."""
    a, b = ct
    return [monomial_u64(x, e) for x in a], monomial_u64(b, e)


def monomial_u64(v: np.ndarray, e: int) -> np.ndarray:
    n = len(v)
    e = int(e) % (2 * n)
    idx = (np.arange(n) + e) % (2 * n)
    sign = idx >= n
    idx = np.where(sign, idx - n, idx)
    out = np.zeros(n, dtype=U64)
    with np.errstate(over="ignore"):
        out[idx] = np.where(sign, (~v) + U64(1), v)
    return out


def external_product(brk_rows, ct):
    """`tggsw.rs:99-111`: decompose [a..., b], dot with the (k+1)d rows."""
    a, b = ct
    limbs = []
    for comp in [*a, b]:
        limbs.extend(t64_decompose(comp, LOG_B, D))
    out_a = [np.zeros(BIG_N, dtype=U64) for _ in range(K)]
    out_b = np.zeros(BIG_N, dtype=U64)
    with np.errstate(over="ignore"):
        for (ra, rb), limb in zip(brk_rows, limbs):
            ls = centered_i64(limb)
            for j in range(K):
                out_a[j] = out_a[j] + negacyclic_u64(ls, ra[j])
            out_b = out_b + negacyclic_u64(ls, rb)
    return out_a, out_b


def cmux(brk_rows, ct0, ct1):
    """`tggsw.rs:113-120`: ct0 + ExtProd(brk, ct1 - ct0)."""
    with np.errstate(over="ignore"):
        diff = ([x1 - x0 for x0, x1 in zip(ct0[0], ct1[0])], ct1[1] - ct0[1])
        ea, eb = external_product(brk_rows, diff)
        return [x0 + e for x0, e in zip(ct0[0], ea)], ct0[1] + eb


def bootstrap(keys, v_enc, ct):
    """`tfhe/bootstrapping.rs:79-106`."""
    s, brk, (ksk_a, ksk_b) = keys
    a, b = ct
    # mod_switch to 2N (`bootstrapping.rs:100-106`)
    rb = 64 - (2 * BIG_N).bit_length() + 1  # ilog2(2N)
    a2n = centered_i64(t64_rounding_shr(a, rb))
    b2n = int(t64_rounding_shr(np.array([b], dtype=U64), rb)[0])
    acc = ([np.zeros(BIG_N, dtype=U64) for _ in range(K)], v_enc.copy())
    acc = rotate(acc, -b2n)
    for zi_rows, ai in zip(brk, a2n):
        acc = cmux(zi_rows, acc, rotate(acc, int(ai)))
    # sample_extract(0) (`tglwe.rs:115-127`)
    ea = []
    with np.errstate(over="ignore"):
        for aj in acc[0]:
            ea.append(np.concatenate([aj[:1], (~aj[:0:-1]) + U64(1)]))
    ex_a = np.concatenate(ea)
    ex_b = acc[1][0]
    # key_switch (`tlwe.rs:144-153`)
    limbs = t64_decompose(ex_a, LOG_B_KS, D_KS)  # digit-major (d, kN)
    lvec = np.concatenate(limbs)
    ka = np.stack(ksk_a)  # (d*kN, n_lwe) u64
    kb = _u(ksk_b)
    with np.errstate(over="ignore"):
        out_a = (lvec * ka.T).sum(axis=1)
        out_b = U64((int(np.sum(lvec * kb)) + int(ex_b)) & MASK64)
    return out_a, out_b


def lut_table(f) -> np.ndarray:
    """test-local table helper (`bootstrapping.rs:115-136`)."""
    m = BIG_N >> LOG_P
    vals = [f(v) % P for v in range(P)]
    out = [vals[0]] * (m // 2)
    for v in vals[1:]:
        out.extend([v] * m)
    out.extend([(-vals[0]) % P] * (m // 2))
    return np.array(out, dtype=np.int64)


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    rng = SplitMix64(SEED_TFHE)
    write_npy_u64(
        os.path.join(out_dir, "tfhe_rng_probe.npy"), [rng.next() for _ in range(4)]
    )
    rng = SplitMix64(SEED_TFHE)

    z = tlwe_sk_gen(rng)
    write_npy_u64(os.path.join(out_dir, "tfhe_sk_z.npy"), [int(v) & MASK64 for v in z])

    print("keygen...", flush=True)
    keys = key_gen(z, rng)
    s, brk, (ksk_a, ksk_b) = keys
    write_npy_u64(
        os.path.join(out_dir, "tfhe_sk_s.npy"), [int(v) & MASK64 for v in s], (K, BIG_N)
    )
    brk_flat = []
    for rows in brk:
        for a, b in rows:
            brk_flat.extend(a)
            brk_flat.append(b)
    write_npy_u64(
        os.path.join(out_dir, "tfhe_brk.npy"),
        np.concatenate(brk_flat),
        (N_LWE, (K + 1) * D, K + 1, BIG_N),
    )
    write_npy_u64(
        os.path.join(out_dir, "tfhe_ksk_a.npy"),
        np.stack(ksk_a).ravel(),
        (K * BIG_N * D_KS, N_LWE),
    )
    write_npy_u64(os.path.join(out_dir, "tfhe_ksk_b.npy"), ksk_b)

    # fresh input per message value
    ins = []
    for m in range(P):
        pt = (m << LOG_DELTA) & MASK64
        ins.append(tlwe_encrypt(z, pt, rng))
    write_npy_u64(
        os.path.join(out_dir, "tfhe_pbs_in_a.npy"),
        np.stack([a for a, _ in ins]).ravel(),
        (P, N_LWE),
    )
    write_npy_u64(os.path.join(out_dir, "tfhe_pbs_in_b.npy"), [b for _, b in ins])

    tables = {
        "identity": lambda v: v,
        "double": lambda v: (2 * v) % P,
        "parity": lambda v: v % 2,
    }
    for name, f in tables.items():
        tab = lut_table(f)
        write_npy_u64(
            os.path.join(out_dir, f"tfhe_table_{name}.npy"),
            [f(v) % P for v in range(P)],
        )
        v_enc = _u([(int(t) % P) << LOG_DELTA for t in tab])
        out_a, out_b = [], []
        for m in range(P):
            oa, ob = bootstrap(keys, v_enc, ins[m])
            ph = tlwe_decrypt_phase(z, oa, ob)
            got = (((ph + (1 << (LOG_DELTA - 1))) & MASK64) >> LOG_DELTA) % P
            assert got == f(m) % P, (name, m, got, f(m) % P)
            print(f"tfhe pbs {name} m={m}: ok", flush=True)
            out_a.append(oa)
            out_b.append(ob)
        write_npy_u64(
            os.path.join(out_dir, f"tfhe_pbs_{name}_out_a.npy"),
            np.stack(out_a).ravel(),
            (P, N_LWE),
        )
        write_npy_u64(os.path.join(out_dir, f"tfhe_pbs_{name}_out_b.npy"), out_b)
    print(f"wrote tfhe transcript to {out_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "vectors", "rust_dump"
    )
    main(out)
