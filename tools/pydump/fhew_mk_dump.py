"""Multi-key / threshold FHEW transcript from the independent oracle — the
last reference protocol without independent-lineage verification (VERDICT
r04 item 8): crs_gen -> per-party key_share_gen -> key_share_merge with
RGSW internal products (`/root/reference/scheme/fhew/src/bootstrapping.rs:
251-321`), then a pk-encrypted gate evaluated under the MERGED key and
threshold-decrypted (`boolean.rs:318-386` flow, 2 parties).

Pure-Python schoolbook/exact-FFT transcription from the Rust sources with
zero learn_fhe_tpu imports; reuses the single-key protocol pieces from
fhew_dump.py (they are parameter-generic). The deterministic SplitMix64
sampling order is documented inline and mirrored by
tools/rust-dump/src/transcripts.rs::dump_fhew_mk.

Fixture: the reference's multi-key testing params
(`boolean.rs:321-335`: q ~ 2^54 NTT prime, N = 2^9, B = 2^6, d = 9;
LWE n = 100, q_ks = 2^16, B = 2^4, d = 4; w = 10), 2 parties.

Usage: python tools/pydump/fhew_mk_dump.py [out_dir]   (~15-25 min CPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from core import (  # noqa: E402
    ZqDecomposor,
    dg_poly,
    monomial_mul,
    negacyclic_mul_small,
    sample_dg,
    sample_zo,
    two_adic_primes,
    uniform_poly,
    write_npy_u64,
    zq_from_f64,
    zq_to_i64,
)
from fhew_dump import (  # noqa: E402
    AUTO_G,
    automorphism_signed,
    external_product,
    gate,
    lwe_decrypt,
)

SEED_FHEW_MK = 0xF4E2_2026_0820
P_PARTIES = 2


class FhewMkParams:
    """`boolean.rs:321-335` — attribute names match fhew_dump.FhewParams so
    its protocol functions apply unchanged."""

    def __init__(self):
        self.p = 4
        self.log_q, self.log_n, self.log_b, self.d = 54, 9, 6, 9
        self.q = next(two_adic_primes(self.log_q, self.log_n + 1))
        self.n = 1 << self.log_n
        self.n_s, self.q_s, self.log_b_s, self.d_s = 100, 1 << 16, 4, 4
        self.w = 10
        self.dec = ZqDecomposor(self.q, self.log_b, self.d)
        self.dec_s = ZqDecomposor(self.q_s, self.log_b_s, self.d_s)
        self.two_n = 2 * self.n

    def ak_t(self):
        g = AUTO_G
        ts = [zq_to_i64(self.two_n, (-g) % self.two_n)]
        acc = 1
        for _ in range(self.w):
            acc = (acc * g) % self.two_n
            ts.append(zq_to_i64(self.two_n, acc))
        return ts


def zo_poly(n, rng):
    """zo(0.5) coefficient vector (`distribution.rs:10-21` semantics via
    core.sample_zo)."""
    return np.array([sample_zo(0.5, rng) for _ in range(n)], dtype=object)


def poly_add(x, y, q):
    return np.array([(int(a) + int(b)) % q for a, b in zip(x, y)], dtype=object)


def rlwe_pk_encrypt(par, pk_a, pk_b, pt, rng):
    """`rlwe.rs:158-170`: u <- zo(0.5), e0, e1 <- dg; a = pk.a*u + e0,
    b = pk.b*u + e1 + pt. RNG order: u, e0, e1."""
    q, n = par.q, par.n
    u = zo_poly(n, rng)
    e0 = dg_poly(3.2, 6, n, rng)
    e1 = dg_poly(3.2, 6, n, rng)
    a = poly_add(negacyclic_mul_small(u, pk_a, q), e0, q)
    b = poly_add(poly_add(negacyclic_mul_small(u, pk_b, q), e1, q), pt, q)
    return a, b


def rgsw_pk_encrypt(par, pk_a, pk_b, pt, rng):
    """`rgsw.rs:74-105` with the pk path: 2d zero pk-encrypts, power_up(pt)
    limbs added to the a-part of rows 0..d and b-part of rows d..2d."""
    zero = np.zeros(par.n, dtype=object)
    rows = [rlwe_pk_encrypt(par, pk_a, pk_b, zero, rng) for _ in range(2 * par.d)]
    limbs = par.dec.power_up(pt)
    out = []
    for i, (a, b) in enumerate(rows):
        if i < par.d:
            a = poly_add(a, limbs[i], par.q)
        else:
            b = poly_add(b, limbs[i - par.d], par.q)
        out.append((a, b))
    return out


def rgsw_internal_product(par, ct0_rows, ct1_rows):
    """`rgsw.rs:130-150`: every ct1 row external-multiplied by ct0."""
    return [external_product(par, ct0_rows, a, b) for a, b in ct1_rows]


def sample_extract0(par, a, b):
    q = par.q
    out = [int(a[0])] + [(-int(v)) % q for v in a[:0:-1]]
    return np.array(out, dtype=object), int(b[0])


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    par = FhewMkParams()
    from core import SplitMix64

    rng = SplitMix64(SEED_FHEW_MK)
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_rng_probe.npy"),
        [SplitMix64(SEED_FHEW_MK).next() for _ in range(4)],
    )
    q, n, d, d_s, n_s = par.q, par.n, par.d, par.d_s, par.n_s
    t0 = time.time()

    # -- crs (`bootstrapping.rs:251-269`): pk poly, n*d_ks LWE vectors in
    # digit-major order (power_up(-sk).flatten() pairing), (w+1) x d ak polys
    crs_pk_a = uniform_poly(q, n, rng)
    crs_ksk = [uniform_poly(par.q_s, n_s, rng) for _ in range(n * d_s)]
    ak_ts = par.ak_t()
    crs_ak = [[uniform_poly(q, n, rng) for _ in range(d)] for _ in ak_ts]
    write_npy_u64(os.path.join(out_dir, "fhew_mk_crs_pk_a.npy"), crs_pk_a)
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_crs_ksk_a.npy"),
        np.stack(crs_ksk).ravel(),
        (d_s, n, n_s),
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_crs_ak_a.npy"),
        np.concatenate([np.concatenate(rows) for rows in crs_ak]),
        (len(ak_ts), d, n),
    )

    # -- party secrets (`rlwe.rs:94-96`: dg(3.2, 6)), then pk shares
    # (`rlwe.rs:219-237`: e <- dg, b = a*z + e), merged pk = (a, sum b)
    zs = [dg_poly(3.2, 6, n, rng) for _ in range(P_PARTIES)]
    pk_shares = []
    for z in zs:
        e = dg_poly(3.2, 6, n, rng)
        az = negacyclic_mul_small(z, crs_pk_a, q)
        pk_shares.append(poly_add(az, e, q))
    pk_b = pk_shares[0]
    for s in pk_shares[1:]:
        pk_b = poly_add(pk_b, s, q)
    for p, z in enumerate(zs):
        write_npy_u64(
            os.path.join(out_dir, f"fhew_mk_sk_z{p}.npy"),
            [int(v) & ((1 << 64) - 1) for v in z],
        )
        write_npy_u64(os.path.join(out_dir, f"fhew_mk_pk_share{p}.npy"), pk_shares[p])
    write_npy_u64(os.path.join(out_dir, "fhew_mk_pk_b.npy"), pk_b)
    print(f"crs+pk: {time.time()-t0:.0f}s", flush=True)

    # -- per-party bootstrap key shares (`bootstrapping.rs:271-293`)
    # RNG order per party: s (n_s dg scalars); ksk share (digit-major: per
    # crs row one dg scalar); brk share (per key bit: 2d pk zero-encrypts,
    # each u, e0, e1); ak shares (per t: per digit one dg poly).
    shares = []
    for p, z in enumerate(zs):
        s = np.array([sample_dg(3.2, 6, rng) for _ in range(n_s)], dtype=object)
        ksk_b = []
        for j in range(d_s):
            bits = par.dec_s.log_bases()[j]
            for i in range(n):
                pt = ((-int(z[i])) << bits) % par.q_s
                a_row = crs_ksk[j * n + i]
                e = sample_dg(3.2, 6, rng)
                b = (
                    sum(int(ai) * int(si) for ai, si in zip(a_row, s)) + pt + e
                ) % par.q_s
                ksk_b.append(b)
        brk = []
        for sj in s:
            pt = monomial_mul(
                np.array([1] + [0] * (n - 1), dtype=object), int(sj), q
            )
            brk.append(rgsw_pk_encrypt(par, crs_pk_a, pk_b, pt, rng))
        ak_b = []
        for ti, t in enumerate(ak_ts):
            z_auto = automorphism_signed(z, t, n)
            rows = []
            for j in range(d):
                bits = par.dec.log_bases()[j]
                pt = np.array(
                    [((-int(v)) << bits) % q for v in z_auto], dtype=object
                )
                e = dg_poly(3.2, 6, n, rng)
                b = poly_add(poly_add(negacyclic_mul_small(z, crs_ak[ti][j], q), e, q), pt, q)
                rows.append(b)
            ak_b.append(rows)
        shares.append((s, ksk_b, brk, ak_b))
        write_npy_u64(os.path.join(out_dir, f"fhew_mk_ksk_b_share{p}.npy"),
                      np.array(ksk_b, dtype=object), (d_s, n))
        brk_flat = []
        for rows in brk:
            for a, b in rows:
                brk_flat.append(a)
                brk_flat.append(b)
        write_npy_u64(
            os.path.join(out_dir, f"fhew_mk_brk_share{p}.npy"),
            np.concatenate(brk_flat),
            (n_s, 2 * d, 2, n),
        )
        write_npy_u64(
            os.path.join(out_dir, f"fhew_mk_ak_b_share{p}.npy"),
            np.concatenate([np.concatenate(rows) for rows in ak_b]),
            (len(ak_ts), d, n),
        )
        print(f"party {p} shares: {time.time()-t0:.0f}s", flush=True)

    # -- merge (`bootstrapping.rs:295-321`): ksk/ak shares sum, brk folds
    # through RGSW internal products
    ksk_b = [sum(int(s[1][i]) for s in shares) % par.q_s for i in range(n * d_s)]
    merged_brk = [list(rows) for rows in shares[0][2]]
    for pshare in shares[1:]:
        for j in range(n_s):
            merged_brk[j] = rgsw_internal_product(par, merged_brk[j], pshare[2][j])
            if j % 20 == 0:
                print(f"  merge brk {j}/{n_s}: {time.time()-t0:.0f}s", flush=True)
    merged_ak = []
    for ti in range(len(ak_ts)):
        rows = []
        for j in range(d):
            b = shares[0][3][ti][j]
            for pshare in shares[1:]:
                b = poly_add(b, pshare[3][ti][j], q)
            rows.append((crs_ak[ti][j], b))
        merged_ak.append(rows)
    write_npy_u64(os.path.join(out_dir, "fhew_mk_ksk_b.npy"),
                  np.array(ksk_b, dtype=object), (d_s, n))
    brk_flat = []
    for rows in merged_brk:
        for a, b in rows:
            brk_flat.append(a)
            brk_flat.append(b)
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_brk.npy"),
        np.concatenate(brk_flat),
        (n_s, 2 * d, 2, n),
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_ak_t.npy"),
        [int(t) & ((1 << 64) - 1) for t in ak_ts],
    )
    print(f"merge: {time.time()-t0:.0f}s", flush=True)

    # -- gate transcript under the merged key: FhewBool::pk_encrypt
    # (`boolean.rs:27-35`: RLWE pk-encrypt of the constant poly at scale q/4,
    # then sample_extract(0)), nand under the merged key, threshold decrypt
    # (`boolean.rs:182-200`: per-party share e <- dg)
    z_sum = np.array(
        [sum(int(z[i]) for z in zs) for i in range(n)], dtype=object
    )
    keys = (None, (crs_ksk, ksk_b), merged_brk, merged_ak)
    q4 = zq_from_f64(q, q / 4.0)
    ins, outs, decs = [], [], []
    for m_pair in range(4):
        m0, m1 = m_pair & 1, (m_pair >> 1) & 1
        cts = []
        for m in (m0, m1):
            pt = np.array([q4 * m] + [0] * (n - 1), dtype=object)
            a, b = rlwe_pk_encrypt(par, crs_pk_a, pk_b, pt, rng)
            cts.append(sample_extract0(par, a, b))
        out = gate(par, keys, "nand", cts[0], cts[1])
        # threshold decrypt of the gate output (one dg share per party)
        sh = []
        for z in zs:
            e = sample_dg(3.2, 6, rng)
            sh.append(
                (sum(int(ai) * int(zi) for ai, zi in zip(out[0], z)) + e) % q
            )
        ins.append(cts)
        outs.append(out)
        decs.append(sh)
        print(f"gate combo {m_pair}: {time.time()-t0:.0f}s", flush=True)

    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_gate_in_a.npy"),
        np.concatenate([np.concatenate([a for a, _ in cts]) for cts in ins]),
        (4, 2, n),
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_gate_in_b.npy"),
        [b for cts in ins for _, b in cts],
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_gate_nand_out_a.npy"),
        np.concatenate([a for a, _ in outs]),
        (4, n),
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_gate_nand_out_b.npy"), [b for _, b in outs]
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_mk_gate_dec_shares.npy"),
        [s for sh in decs for s in sh],
        (4, P_PARTIES),
    )

    # sanity inside the oracle: threshold decrypt must give NAND truth
    q8 = zq_from_f64(q, q / 8.0)
    for m_pair, (out, sh) in enumerate(zip(outs, decs)):
        m0, m1 = m_pair & 1, (m_pair >> 1) & 1
        pt = (int(out[1]) - sum(sh)) % q
        # decode: round(pt * p / q) mod p == 1 <=> true (fhew.rs decode)
        v = (pt * par.p + q // 2) // q % par.p
        assert (v == 1) == (not (m0 and m1)), (m_pair, v)
    # plain decrypt with the summed key must agree too
    for m_pair, out in enumerate(outs):
        m0, m1 = m_pair & 1, (m_pair >> 1) & 1
        pt = lwe_decrypt(q, z_sum, out[0], out[1])
        v = (pt * par.p + q // 2) // q % par.p
        assert (v == 1) == (not (m0 and m1)), (m_pair, v)
    print(f"done: {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "vectors", "rust_dump"
        )
    )
