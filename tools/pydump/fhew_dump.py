"""FHEW gate transcript from the independent oracle — the python mirror of
tools/rust-dump/src/transcripts.rs::dump_fhew (fixture
`/root/reference/scheme/fhew/src/fhew/boolean.rs:225-239`).

Implements the FULL reference protocol chain — keygen, encrypt, NAND/AND/
OR/XOR via LMKCDEY bootstrapping (`scheme/fhew/src/bootstrapping.rs`),
decrypt — in exact integer arithmetic transcribed from the Rust sources,
with zero learn_fhe_tpu imports. Consumed by tests/test_rust_transcripts.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from core import (  # noqa: E402
    MASK64,
    SplitMix64,
    ZqDecomposor,
    automorphism,
    dg_poly,
    monomial_mul,
    negacyclic_mul_small,
    sample_dg,
    two_adic_primes,
    uniform_poly,
    write_npy_u64,
    zq_from_f64,
    zq_to_i64,
    mod_switch,
    mod_switch_odd,
)

SEED_FHEW = 0xF4E_2026_0817  # transcripts.rs:77
AUTO_G = 5  # rlwe.rs:92


# -- protocol pieces (all object arrays of ints mod the respective modulus) -----


def lwe_sk_gen(n, rng):
    """`lwe.rs:103-106`: dg(3.2, 6)."""
    return np.array([sample_dg(3.2, 6, rng) for _ in range(n)], dtype=object)


def lwe_encrypt(q, sk, pt, rng):
    """`lwe.rs:130-140`: a uniform, e dg, b = a.s + pt + e."""
    n = len(sk)
    a = uniform_poly(q, n, rng)
    e = sample_dg(3.2, 6, rng)
    b = (sum(int(ai) * int(si) for ai, si in zip(a, sk)) + pt + e) % q
    return a, b


def lwe_decrypt(q, sk, a, b):
    return (int(b) - sum(int(ai) * int(si) for ai, si in zip(a, sk))) % q


def rlwe_zero_encrypt(q, n, z, rng):
    """`rlwe.rs:146-156` with pt = 0: a uniform, e dg, b = a*z + e."""
    a = uniform_poly(q, n, rng)
    e = dg_poly(3.2, 6, n, rng)
    az = negacyclic_mul_small(z, a, q)
    b = np.array([(int(x) + int(y)) % q for x, y in zip(az, e)], dtype=object)
    return a, b


class FhewParams:
    def __init__(self):
        self.p = 4
        self.log_q, self.log_n, self.log_b, self.d = 28, 9, 7, 4
        self.q = next(two_adic_primes(self.log_q, self.log_n + 1))
        self.n = 1 << self.log_n
        self.n_s, self.q_s, self.log_b_s, self.d_s = 100, 1 << 16, 4, 4
        self.w = 10
        self.dec = ZqDecomposor(self.q, self.log_b, self.d)  # rgsw + rlwe
        self.dec_s = ZqDecomposor(self.q_s, self.log_b_s, self.d_s)
        self.two_n = 2 * self.n

    def ak_t(self):
        """`bootstrapping.rs:86-89`: [-g] + centered powers g^1..g^w mod 2n."""
        g = AUTO_G
        ts = [zq_to_i64(self.two_n, (-g) % self.two_n)]
        acc = 1
        for _ in range(self.w):
            acc = (acc * g) % self.two_n
            ts.append(zq_to_i64(self.two_n, acc))
        return ts


def key_gen(par: FhewParams, z, rng):
    """`bootstrapping.rs:121-146`: s, ksk, brk, ak — in this exact order."""
    q, n = par.q, par.n
    s = lwe_sk_gen(par.n_s, rng)

    # ksk under s: pt = power_up(-z) over q_s, digit-major (`lwe.rs:108-119`)
    ksk_a, ksk_b = [], []
    for bits in par.dec_s.log_bases():
        for zi in z:
            pt = ((-int(zi)) << bits) % par.q_s
            a, b = lwe_encrypt(par.q_s, s, pt, rng)
            ksk_a.append(a)
            ksk_b.append(b)

    # brk: one RGSW ct per s_j (`rgsw.rs:84-105`): 2d zero-encrypts, pt
    # limbs into a-part of the first d and b-part of the last d
    brk = []
    for sj in s:
        pt = monomial_mul(np.array([1] + [0] * (n - 1), dtype=object), int(sj), q)
        pt_limbs = par.dec.power_up(pt)
        cts = [rlwe_zero_encrypt(q, n, z, rng) for _ in range(2 * par.d)]
        rows = []
        for i, (a, b) in enumerate(cts):
            if i < par.d:
                a = np.array(
                    [(int(x) + int(y)) % q for x, y in zip(a, pt_limbs[i])],
                    dtype=object,
                )
            else:
                b = np.array(
                    [(int(x) + int(y)) % q for x, y in zip(b, pt_limbs[i - par.d])],
                    dtype=object,
                )
            rows.append((a, b))
        brk.append(rows)

    # ak: ksk_gen(z -> z_auto(t)) per t (`rlwe.rs:109-132`)
    aks = []
    for t in par.ak_t():
        z_auto = automorphism_signed(z, t, n)
        rows = []
        for bits in par.dec.log_bases():
            pt = np.array([((-int(v)) << bits) % q for v in z_auto], dtype=object)
            a, b = rlwe_zero_encrypt(q, n, z, rng)
            b = np.array([(int(x) + int(y)) % q for x, y in zip(b, pt)], dtype=object)
            rows.append((a, b))
        aks.append(rows)
    return s, (ksk_a, ksk_b), brk, aks


def automorphism_signed(v_i64, t, n):
    """avec.rs automorphism over signed i64 coefficients."""
    t = t % (2 * n)
    out = [0] * n
    for i in range(n):
        it = (i * t) % (2 * n)
        if it < n:
            out[it] = int(v_i64[i])
        else:
            out[it - n] = -int(v_i64[i])
    return np.array(out, dtype=object)


def external_product(par, rgsw_rows, a, b):
    """`rgsw.rs:116-128`: decompose (a then b), dot with the 2d rows."""
    q = par.q
    limbs = par.dec.decompose_poly(a) + par.dec.decompose_poly(b)
    out_a = np.zeros(par.n, dtype=object)
    out_b = np.zeros(par.n, dtype=object)
    for (ra, rb), limb in zip(rgsw_rows, limbs):
        ls = np.array([zq_to_i64(q, int(v)) for v in limb], dtype=object)
        out_a = (out_a + negacyclic_mul_small(ls, ra, q)) % q
        out_b = (out_b + negacyclic_mul_small(ls, rb, q)) % q
    return out_a, out_b


def rlwe_automorphism(par, ak_rows, t, a, b):
    """`rlwe.rs:177-191`: map coefficients, then key-switch a."""
    q = par.q
    a_t = automorphism(a, t, q)
    b_t = automorphism(b, t, q)
    limbs = par.dec.decompose_poly(a_t)
    out_a = np.zeros(par.n, dtype=object)
    out_b = b_t
    for (ra, rb), limb in zip(ak_rows, limbs):
        ls = np.array([zq_to_i64(q, int(v)) for v in limb], dtype=object)
        out_a = (out_a + negacyclic_mul_small(ls, ra, q)) % q
        out_b = (out_b + negacyclic_mul_small(ls, rb, q)) % q
    return out_a, out_b


def blind_rotate(par, brk, aks, ak_ts, f, a, b):
    """`bootstrapping.rs:158-209` (Algorithms 3 and 7 of 2022/198)."""
    q, n, two_n, g = par.q, par.n, par.two_n, AUTO_G
    f_prime = monomial_mul(automorphism(f, -g, q), (int(b) * g) % two_n, q)
    acc_a = np.zeros(n, dtype=object)
    acc_b = f_prime

    # i_minus / i_plus (`bootstrapping.rs:212-231`)
    log_minus, log_plus = {}, {}
    acc = 1
    for l in range(n // 2):
        log_plus[acc % two_n] = l
        log_minus[(-acc) % two_n] = l
        acc = (acc * g) % two_n
    i_minus = [[] for _ in range(n // 2)]
    i_plus = [[] for _ in range(n // 2)]
    for i, ai in enumerate(a):
        ai = int(ai)
        in_m, in_p = ai in log_minus, ai in log_plus
        if in_m and not in_p:
            i_minus[log_minus[ai]].append(i)
        elif in_p and not in_m:
            i_plus[log_plus[ai]].append(i)
        elif ai == 0:
            pass
        else:
            raise AssertionError(ai)

    v = 0
    for l in range(len(i_minus) - 1, 0, -1):
        for j in i_minus[l]:
            acc_a, acc_b = external_product(par, brk[j], acc_a, acc_b)
        v += 1
        if i_minus[l - 1] or v == par.w or l == 1:
            acc_a, acc_b = rlwe_automorphism(par, aks[v], ak_ts[v], acc_a, acc_b)
            v = 0
    for j in i_minus[0]:
        acc_a, acc_b = external_product(par, brk[j], acc_a, acc_b)
    acc_a, acc_b = rlwe_automorphism(par, aks[0], ak_ts[0], acc_a, acc_b)
    for l in range(len(i_plus) - 1, 0, -1):
        for j in i_plus[l]:
            acc_a, acc_b = external_product(par, brk[j], acc_a, acc_b)
        v += 1
        if i_plus[l - 1] or v == par.w or l == 1:
            acc_a, acc_b = rlwe_automorphism(par, aks[v], ak_ts[v], acc_a, acc_b)
            v = 0
    for j in i_plus[0]:
        acc_a, acc_b = external_product(par, brk[j], acc_a, acc_b)
    return acc_a, acc_b


def lwe_key_switch(par, ksk_a, ksk_b, a, b):
    """`lwe.rs:151-160` with the lwe_s decomposor (digit-major flatten)."""
    q_s = par.q_s
    limbs = []
    for j in range(par.d_s):
        digits = [par.dec_s.decompose_scalar(int(v) % q_s)[j] for v in a]
        limbs.extend(zq_to_i64(q_s, d) for d in digits)
    out_a = np.zeros(par.n_s, dtype=object)
    out_b = int(b)
    for ka, kb, l in zip(ksk_a, ksk_b, limbs):
        if l == 0:
            continue
        out_a = (out_a + l * np.array([int(v) for v in ka], dtype=object)) % q_s
        out_b = (out_b + l * int(kb)) % q_s
    return out_a, out_b % q_s


def sample_extract0(par, a, b):
    """`rlwe.rs:193-202` at i=0."""
    q = par.q
    out = [int(a[0])] + [(-int(v)) % q for v in a[:0:-1]]
    return np.array(out, dtype=object), int(b[0])


def bootstrap(par, keys, f, a, b):
    """`bootstrapping.rs:149-155`."""
    s, (ksk_a, ksk_b), brk, aks = keys
    q, q_s, two_n = par.q, par.q_s, par.two_n
    a1 = np.array([mod_switch(q, int(v), q_s) for v in a], dtype=object)
    b1 = mod_switch(q, int(b), q_s)
    a2, b2 = lwe_key_switch(par, ksk_a, ksk_b, a1, b1)
    a3 = np.array([mod_switch_odd(q_s, int(v), two_n) for v in a2], dtype=object)
    b3 = mod_switch_odd(q_s, int(b2), two_n)
    acc_a, acc_b = blind_rotate(par, brk, aks, par.ak_t(), f, a3, b3)
    return sample_extract0(par, acc_a, acc_b)


def gate(par, keys, name, ct0, ct1):
    """`fhew.rs:31-67`: linear combo, negacyclic table, bootstrap, +Q/8."""
    q = par.q
    tables = {
        "nand": [1, 1, 1, 0],
        "and": [0, 0, 0, 1],
        "or": [0, 1, 1, 1],
        "xor": [0, 1, 1, 1],
    }
    (a0, b0), (a1, b1) = ct0, ct1
    if name == "xor":
        a = [(2 * (int(x) - int(y))) % q for x, y in zip(a0, a1)]
        b = (2 * (int(b0) - int(b1))) % q
    else:
        a = [(int(x) + int(y)) % q for x, y in zip(a0, a1)]
        b = (int(b0) + int(b1)) % q
    q8 = zq_from_f64(q, q / 8.0)
    mp = [(-q8) % q, q8]
    f = np.array(
        sum([[mp[t]] * (par.two_n // 8) for t in tables[name]], []), dtype=object
    )
    out_a, out_b = bootstrap(par, keys, f, np.array(a, dtype=object), b)
    return out_a, (out_b + q8) % q


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    par = FhewParams()
    q, n = par.q, par.n
    rng = SplitMix64(SEED_FHEW)
    write_npy_u64(
        os.path.join(out_dir, "fhew_rng_probe.npy"), [rng.next() for _ in range(4)]
    )
    rng = SplitMix64(SEED_FHEW)  # probe is from a clone (transcripts.rs:81-85)

    z = lwe_sk_gen(n, rng)
    write_npy_u64(os.path.join(out_dir, "fhew_sk_z.npy"), [int(v) & MASK64 for v in z])

    s, (ksk_a, ksk_b), brk, aks = key_gen(par, z, rng)
    keys = (s, (ksk_a, ksk_b), brk, aks)
    write_npy_u64(os.path.join(out_dir, "fhew_sk_s.npy"), [int(v) & MASK64 for v in s])
    write_npy_u64(
        os.path.join(out_dir, "fhew_ksk_a.npy"),
        np.stack(ksk_a).ravel(),
        (n * par.d_s, par.n_s),
    )
    write_npy_u64(os.path.join(out_dir, "fhew_ksk_b.npy"), ksk_b)
    brk_flat = []
    for rows in brk:
        for a, b in rows:
            brk_flat.extend([a, b])
    write_npy_u64(
        os.path.join(out_dir, "fhew_brk.npy"),
        np.concatenate(brk_flat),
        (par.n_s, 2 * par.d, 2, n),
    )
    ts = par.ak_t()
    write_npy_u64(os.path.join(out_dir, "fhew_ak_t.npy"), [t & MASK64 for t in ts])
    ak_flat = []
    for rows in aks:
        for a, b in rows:
            ak_flat.extend([a, b])
    write_npy_u64(
        os.path.join(out_dir, "fhew_ak.npy"),
        np.concatenate(ak_flat),
        (len(ts), par.d, 2, n),
    )

    # gate inputs over all four combos (`transcripts.rs:196-217`)
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    delta = q / 4.0
    ins = []
    for m0, m1 in combos:
        for m in (m0, m1):
            pt = zq_from_f64(q, m * delta)
            ins.append(lwe_encrypt(q, z, pt, rng))
    write_npy_u64(
        os.path.join(out_dir, "fhew_gate_in_a.npy"),
        np.stack([a for a, _ in ins]).ravel(),
        (4, 2, n),
    )
    write_npy_u64(
        os.path.join(out_dir, "fhew_gate_in_b.npy"), [b for _, b in ins]
    )

    truth = {
        "nand": lambda x, y: not (x and y),
        "and": lambda x, y: x and y,
        "or": lambda x, y: x or y,
        "xor": lambda x, y: x != y,
    }
    for name in ("nand", "and", "or", "xor"):
        outs = []
        for i, (m0, m1) in enumerate(combos):
            out = gate(par, keys, name, ins[2 * i], ins[2 * i + 1])
            # decrypt sanity (transcripts.rs:230-241)
            ph = lwe_decrypt(q, z, out[0], out[1])
            got = zq_from_f64(par.p, ph / delta) % par.p
            want = truth[name](bool(m0), bool(m1))
            assert got == int(want), (name, m0, m1, got)
            outs.append(out)
            print(f"fhew {name} {m0}{m1}: ok", flush=True)
        write_npy_u64(
            os.path.join(out_dir, f"fhew_gate_{name}_out_a.npy"),
            np.stack([a for a, _ in outs]).ravel(),
            (4, n),
        )
        write_npy_u64(
            os.path.join(out_dir, f"fhew_gate_{name}_out_b.npy"),
            [b for _, b in outs],
        )
    print(f"wrote fhew transcript to {out_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "vectors", "rust_dump"
    )
    main(out)
