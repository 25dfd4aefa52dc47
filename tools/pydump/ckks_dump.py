"""CKKS transcript from the independent oracle — python mirror of
tools/rust-dump/src/transcripts.rs::dump_ckks (fixture
`/root/reference/scheme/ckks/src/ckks.rs:303-345` at log_n=9).

Transcribes the reference protocol exactly: RNS arithmetic
(`util/src/ring/rns.rs` — exact CRT reconstruction, the f64-u-corrected
approximate base extension, round/sub/div rescaling) and the F256 special
FFT encode (`scheme/ckks/src/sfft.rs` + `util/src/complex/f256.rs`).

Precision note: the reference's F256 is a 256-bit-mantissa float with
truncating BigInt conversion. This oracle computes the same transform in
340-fractional-bit fixed point (mpmath twiddles at 420 bits) and truncates
toward zero — any implementation accurate past ~2^-200 produces the same
integers except on a ~2^-140-probability boundary event, so the encode
integers are bit-identical to both the Rust reference and the JAX f256
backend. Zero learn_fhe_tpu imports.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from core import (  # noqa: E402
    MASK64,
    SplitMix64,
    automorphism,
    negacyclic_mul_mod,
    sample_dg,
    sample_zo,
    two_adic_primes,
    write_npy_f64,
    write_npy_u64,
)

SEED_CKKS = 0xCC5_2026_0817  # transcripts.rs:79
LOG_N, LOG_QI, BIG_L = 9, 55, 8
N = 1 << LOG_N
L = N // 2

F = 340  # fixed-point fractional bits for the C256-equivalent arithmetic


# -- fixed-point complex (re, im as scaled ints) ---------------------------------


def _twiddle_table(order: int):
    """e^(2*pi*i*k/order) for k in [0, order) at F bits (mpmath, 480-bit)."""
    from mpmath import mp, mpf, cos, sin, pi

    mp.prec = 480
    tab = []
    for k in range(order):
        ang = 2 * pi * k / order
        tab.append(
            (int(mpf(2) ** F * cos(ang)), int(mpf(2) ** F * sin(ang)))
        )
    return tab


_TW_CACHE: dict = {}


def tw(order: int):
    if order not in _TW_CACHE:
        _TW_CACHE[order] = _twiddle_table(order)
    return _TW_CACHE[order]


def cmul(a, b):
    ar, ai = a
    br, bi = b
    return ((ar * br - ai * bi) >> F, (ar * bi + ai * br) >> F)


def cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _bit_reverse(v):
    n = len(v)
    if n <= 2:
        return v
    bits = n.bit_length() - 1
    out = list(v)
    for i in range(n):
        j = int(bin(i)[2:].zfill(bits)[::-1], 2)
        if i < j:
            out[i], out[j] = out[j], out[i]
    return out


def _w_iter(two_m: int, conj: bool):
    """sfft.rs:58-72: twiddles in powers-of-5-mod-4n order; entry j is
    e^(2*pi*i*(+/-5^j mod 8m)/(8m)) for j < m."""
    order = 4 * two_m
    table = tw(order)
    out = []
    p5 = 1
    for _ in range(two_m // 2):
        k = (-p5) % order if conj else p5 % order
        out.append(table[k])
        p5 = (p5 * 5) % (2 * order)  # 5^j mod 8m is what indexes the table
    return out


def sifft(z):
    """sfft.rs:21-35 (DIF, conjugate twiddles, bit-reverse, /n)."""
    z = list(z)
    n = len(z)
    for log_m in range(n.bit_length() - 2, -1, -1):
        m = 1 << log_m
        w = _w_iter(2 * m, conj=True)
        for base in range(0, n, 2 * m):
            for i in range(m):
                a, b = z[base + i], z[base + m + i]
                z[base + i] = cadd(a, b)
                z[base + m + i] = cmul(csub(a, b), w[i])
    z = _bit_reverse(z)
    return [(a[0] // n if a[0] >= 0 else -((-a[0]) // n),
             a[1] // n if a[1] >= 0 else -((-a[1]) // n)) for a in z]


def sfft(z):
    """sfft.rs:7-19 (bit-reverse then DIT)."""
    z = _bit_reverse(list(z))
    n = len(z)
    for log_m in range(0, n.bit_length() - 1):
        m = 1 << log_m
        w = _w_iter(2 * m, conj=False)
        for base in range(0, n, 2 * m):
            for i in range(m):
                a, b = z[base + i], z[base + m + i]
                t = cmul(w[i], b)
                z[base + i] = cadd(a, t)
                z[base + m + i] = csub(a, t)
    return z


def trunc_to_int(x: int) -> int:
    """BigInt::from(F256): truncation toward zero (`f256.rs:213-238`)."""
    return x >> F if x >= 0 else -((-x) >> F)


# -- exact RNS machinery (util/src/ring/rns.rs) ----------------------------------


class Rns:
    def __init__(self, qs):
        self.qs = list(qs)
        self.q = math.prod(self.qs)
        self.q_hats = [self.q // qi for qi in self.qs]
        self.q_hats_inv = [
            pow(h % qi, -1, qi) for h, qi in zip(self.q_hats, self.qs)
        ]
        self.q_fracs = [1.0 / qi for qi in self.qs]

    def reconstruct(self, limb_vals) -> int:
        """rns.rs:326-331 + centering_rem."""
        v = sum(
            h * hi * int(x)
            for h, hi, x in zip(self.q_hats, self.q_hats_inv, limb_vals)
        )
        v %= self.q
        return v if v < self.q >> 1 else v - self.q

    def extend_one(self, limb_vals, ps):
        """rns.rs:330-345: the f64 overflow-count correction, same sum order."""
        vs = [
            (int(x) * hi) % qi
            for x, hi, qi in zip(limb_vals, self.q_hats_inv, self.qs)
        ]
        u = math.floor(
            sum(frac * float(v) for frac, v in zip(self.q_fracs, vs)) + 0.5
        )
        out = []
        for p in ps:
            acc = sum((h % p) * v for h, v in zip(self.q_hats, vs))
            out.append((acc - u * (self.q % p)) % p)
        return out


class RnsPoly:
    """Stacked-limb polynomial: dict q -> object array of ints mod q."""

    def __init__(self, qs, limbs):
        self.qs = list(qs)
        self.limbs = [np.asarray(l, dtype=object) for l in limbs]

    @classmethod
    def zero(cls, qs, n):
        return cls(qs, [np.zeros(n, dtype=object) for _ in qs])

    @classmethod
    def from_i64(cls, qs, v):
        return cls(qs, [np.array([int(x) % q for x in v], dtype=object) for q in qs])

    @classmethod
    def from_bigint(cls, qs, v):
        return cls(qs, [np.array([int(x) % q for x in v], dtype=object) for q in qs])

    @property
    def n(self):
        return len(self.limbs[0])

    def copy(self):
        return RnsPoly(self.qs, [l.copy() for l in self.limbs])

    def into_bigint(self):
        rns = Rns(self.qs)
        return [
            rns.reconstruct([l[i] for l in self.limbs]) for i in range(self.n)
        ]

    def automorphism(self, t):
        return RnsPoly(self.qs, [automorphism(l, t, q) for l, q in zip(self.limbs, self.qs)])

    def __add__(self, o):
        assert self.qs == o.qs
        return RnsPoly(
            self.qs,
            [(a + b) % q for a, b, q in zip(self.limbs, o.limbs, self.qs)],
        )

    def __sub__(self, o):
        assert self.qs == o.qs
        return RnsPoly(
            self.qs,
            [(a - b) % q for a, b, q in zip(self.limbs, o.limbs, self.qs)],
        )

    def __neg__(self):
        return RnsPoly(self.qs, [(-l) % q for l, q in zip(self.limbs, self.qs)])

    def mul(self, o):
        """rns.rs:147-157: limb-intersection pointwise negacyclic products."""
        qs = [q for q in self.qs if q in o.qs]
        out = []
        for q in qs:
            a = self.limbs[self.qs.index(q)]
            b = o.limbs[o.qs.index(q)]
            out.append(negacyclic_mul_mod(a, b, q))
        return RnsPoly(qs, out)

    def mul_int(self, c: int):
        return RnsPoly(
            self.qs, [(l * (c % q)) % q for l, q in zip(self.limbs, self.qs)]
        )

    def extend_bases(self, ps):
        rns = Rns(self.qs)
        new = [np.zeros(self.n, dtype=object) for _ in ps]
        for i in range(self.n):
            vals = rns.extend_one([l[i] for l in self.limbs], ps)
            for j, v in enumerate(vals):
                new[j][i] = v
        return RnsPoly(self.qs + list(ps), self.limbs + new)

    def split_off(self, at):
        lo = RnsPoly(self.qs[:at], self.limbs[:at])
        hi = RnsPoly(self.qs[at:], self.limbs[at:])
        return lo, hi

    def switch_bases(self, ps):
        _, hi = self.extend_bases(ps).split_off(len(self.qs))
        return hi

    def rescale_k(self, k):
        """rns.rs:103-135: round (add p/2), subtract dropped part, div p."""
        qs = self.qs[: len(self.qs) - k]
        dropped = self.qs[len(self.qs) - k :]
        p = math.prod(dropped)
        # round: add p>>1 mod every limb (incl. the dropped ones)
        half = p >> 1
        rounded = RnsPoly(
            self.qs, [(l + (half % q)) % q for l, q in zip(self.limbs, self.qs)]
        )
        lo, rps = rounded.split_off(len(qs))
        if k == 1:
            rp = rps.limbs[0]
            sub = RnsPoly(qs, [rp % q for q in qs])
        else:
            sub = rps.switch_bases(qs)
        out = lo - sub
        return RnsPoly(
            qs,
            [(l * pow(p % q, -1, q)) % q for l, q in zip(out.limbs, qs)],
        )


# -- parameters and protocol (scheme/ckks/src/ckks.rs) ---------------------------


class Params:
    def __init__(self):
        primes = two_adic_primes(LOG_QI, LOG_N + 1)
        self.qs = [next(primes) for _ in range(BIG_L)]
        self.ps = [next(primes) for _ in range(BIG_L)]
        self.qps = self.qs + self.ps
        self.scale = self.qs[-1]
        self.big_p = math.prod(self.ps)

    def pow5(self, j):
        return pow(5, j, 2 * N)


def sample_zo_poly(rng, n):
    return [sample_zo(0.5, rng) for _ in range(n)]


def rns_sample_uniform(qs, n, rng):
    """rns.rs:42-49: limb-major uniform."""
    return RnsPoly(
        qs,
        [np.array([rng.below(q) for _ in range(n)], dtype=object) for q in qs],
    )


def rns_sample_dg(qs, n, rng):
    """rns.rs:52-59: ONE i64 vector reduced into every limb."""
    v = [sample_dg(3.2, 6, rng) for _ in range(n)]
    return RnsPoly.from_i64(qs, v)


def sk_encrypt(sk_i64, pt: RnsPoly, rng):
    """ckks.rs:215-225."""
    qs = pt.qs
    a = rns_sample_uniform(qs, pt.n, rng)
    e = rns_sample_dg(qs, pt.n, rng)
    ask = a.mul(RnsPoly.from_i64(qs, sk_i64))
    b = (-ask) + e + pt
    return b, a


def decrypt(sk_i64, b: RnsPoly, a: RnsPoly):
    return b + a.mul(RnsPoly.from_i64(a.qs, sk_i64))


def ksk_gen(par: Params, sk_i64, sk_prime_i64, rng):
    """ckks.rs:154-162: enc_QP(P * sk')."""
    pt = RnsPoly.from_i64(par.qps, sk_prime_i64).mul_int(par.big_p)
    return sk_encrypt(sk_i64, pt, rng)


def key_switch(par: Params, ksk, b, a):
    """ckks.rs:284-293."""
    ksk_b, ksk_a = ksk
    a_ext = a.extend_bases(par.ps)
    nb = ksk_b.mul(a_ext).rescale_k(len(par.ps)) + b
    na = ksk_a.mul(a_ext).rescale_k(len(par.ps))
    return nb, na


def encode(par: Params, m_fixed):
    """ckks.rs:186-198: sifft, scale, truncate, RNS-reduce."""
    z = sifft(m_fixed)
    scaled = [trunc_to_int(re * par.scale) for re, _ in z] + [
        trunc_to_int(im * par.scale) for _, im in z
    ]
    return RnsPoly.from_bigint(par.qs, scaled)


def decode_f64(par: Params, pt: RnsPoly):
    """ckks.rs:200-213, to f64 pairs."""
    vals = pt.into_bigint()
    z = [
        ((re << F) // par.scale, (im << F) // par.scale)
        for re, im in zip(vals[:L], vals[L:])
    ]
    slots = sfft(z)
    return [(r / 2.0**F, i / 2.0**F) for r, i in slots]


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    par = Params()
    rng = SplitMix64(SEED_CKKS)
    write_npy_u64(
        os.path.join(out_dir, "ckks_rng_probe.npy"), [rng.next() for _ in range(4)]
    )
    rng = SplitMix64(SEED_CKKS)
    write_npy_u64(os.path.join(out_dir, "ckks_qs.npy"), par.qs)
    write_npy_u64(os.path.join(out_dir, "ckks_ps.npy"), par.ps)

    def rns_limbs(tag, x: RnsPoly):
        big = x.into_bigint()
        flat = []
        for q in x.qs:
            flat.extend(((int(c) % q) + q) % q for c in big)
        write_npy_u64(os.path.join(out_dir, f"{tag}_qs.npy"), x.qs)
        write_npy_u64(os.path.join(out_dir, f"{tag}.npy"), flat, (len(x.qs), x.n))

    sk = sample_zo_poly(rng, N)
    write_npy_u64(os.path.join(out_dir, "ckks_sk.npy"), [v & MASK64 for v in sk])

    print("ckks keygen...", flush=True)
    pk_b, pk_a = sk_encrypt(sk, RnsPoly.zero(par.qs, N), rng)
    rns_limbs("ckks_pk_a", pk_a)
    rns_limbs("ckks_pk_b", pk_b)
    # sk^2 over the integers (negacyclic), then rlk
    sk2 = [0] * N
    for i, si in enumerate(sk):
        if si == 0:
            continue
        for j, sj in enumerate(sk):
            k = i + j
            if k < N:
                sk2[k] += si * sj
            else:
                sk2[k - N] -= si * sj
    rlk = ksk_gen(par, sk, sk2, rng)
    rns_limbs("ckks_rlk_a", rlk[1])
    rns_limbs("ckks_rlk_b", rlk[0])
    sk_rot = [int(v) for v in automorphism_i64(sk, par.pow5(1))]
    rtk = ksk_gen(par, sk, sk_rot, rng)
    rns_limbs("ckks_rtk1_a", rtk[1])
    rns_limbs("ckks_rtk1_b", rtk[0])
    sk_conj = [int(v) for v in automorphism_i64(sk, -1)]
    cjk = ksk_gen(par, sk, sk_conj, rng)
    rns_limbs("ckks_cjk_a", cjk[1])
    rns_limbs("ckks_cjk_b", cjk[0])

    # messages (transcripts.rs:475-491)
    def mk_msg():
        fixed, flat = [], []
        for _ in range(L):
            re = (rng.next() >> 11) / (1 << 53) * 2.0 - 1.0
            im = (rng.next() >> 11) / (1 << 53) * 2.0 - 1.0
            flat.extend([re, im])
            fixed.append((f64_to_fixed(re), f64_to_fixed(im)))
        return fixed, flat

    m0, m0_flat = mk_msg()
    m1, m1_flat = mk_msg()
    write_npy_f64(os.path.join(out_dir, "ckks_m0.npy"), m0_flat, (L, 2))
    write_npy_f64(os.path.join(out_dir, "ckks_m1.npy"), m1_flat, (L, 2))

    print("ckks encrypt...", flush=True)
    pt0 = encode(par, m0)
    pt1 = encode(par, m1)
    # replay forks (transcripts.rs:500-515): dump the exact a and e
    fork = SplitMix64(0)
    fork.s = rng.s
    ct0_b, ct0_a = sk_encrypt(sk, pt0, rng)
    a_f = rns_sample_uniform(par.qs, N, fork)
    e_f = rns_sample_dg(par.qs, N, fork)
    rns_limbs("ckks_enc0_a", a_f)
    rns_limbs("ckks_enc0_e", e_f)
    fork = SplitMix64(0)
    fork.s = rng.s
    ct1_b, ct1_a = sk_encrypt(sk, pt1, rng)
    a_f1 = rns_sample_uniform(par.qs, N, fork)
    e_f1 = rns_sample_dg(par.qs, N, fork)
    rns_limbs("ckks_enc1_a", a_f1)
    rns_limbs("ckks_enc1_e", e_f1)
    rns_limbs("ckks_ct0_a", ct0_a)
    rns_limbs("ckks_ct0_b", ct0_b)
    rns_limbs("ckks_ct1_a", ct1_a)
    rns_limbs("ckks_ct1_b", ct1_b)

    print("ckks mul...", flush=True)
    d0 = ct0_b.mul(ct1_b)
    d1 = ct0_b.mul(ct1_a) + ct0_a.mul(ct1_b)
    d2 = ct0_a.mul(ct1_a)
    rel_b, rel_a = key_switch(par, rlk, RnsPoly.zero(d2.qs, N), d2)
    mul_b = (d0 + rel_b).rescale_k(1)
    mul_a = (d1 + rel_a).rescale_k(1)
    rns_limbs("ckks_mul_a", mul_a)
    rns_limbs("ckks_mul_b", mul_b)
    dec = decode_f64(par, decrypt(sk, mul_b, mul_a))
    # sanity: dec ~ m0*m1
    for i in range(L):
        mr = m0_flat[2 * i] * m1_flat[2 * i] - m0_flat[2 * i + 1] * m1_flat[2 * i + 1]
        mi = m0_flat[2 * i] * m1_flat[2 * i + 1] + m0_flat[2 * i + 1] * m1_flat[2 * i]
        assert abs(dec[i][0] - mr) < 2**-25 and abs(dec[i][1] - mi) < 2**-25, i
    write_npy_f64(
        os.path.join(out_dir, "ckks_mul_dec.npy"),
        [v for pair in dec for v in pair],
        (L, 2),
    )

    print("ckks rotate/conjugate...", flush=True)
    t = par.pow5(1)
    rot_b, rot_a = key_switch(par, rtk, ct0_b.automorphism(t), ct0_a.automorphism(t))
    rns_limbs("ckks_rot1_a", rot_a)
    rns_limbs("ckks_rot1_b", rot_b)
    cj_b, cj_a = key_switch(par, cjk, ct0_b.automorphism(-1), ct0_a.automorphism(-1))
    rns_limbs("ckks_conj_a", cj_a)
    rns_limbs("ckks_conj_b", cj_b)
    print(f"wrote ckks transcript to {out_dir}")


def f64_to_fixed(x: float) -> int:
    from fractions import Fraction

    fr = Fraction(x)
    return (fr.numerator << F) // fr.denominator


def automorphism_i64(v, t):
    n = len(v)
    t = t % (2 * n)
    out = [0] * n
    for i in range(n):
        it = (i * t) % (2 * n)
        if it < n:
            out[it] = int(v[i])
        else:
            out[it - n] = -int(v[i])
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "vectors", "rust_dump"
    )
    main(out)
