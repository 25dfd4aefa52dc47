"""Independent-lineage exact-integer oracle core for the Rust reference.

Transcribed DIRECTLY from `/root/reference` sources (cited per function) with
ZERO imports from learn_fhe_tpu — this package exists to generate the parity
dump that `tests/test_rust_dump.py` / `tests/test_rust_transcripts.py` check
the JAX implementation against, from an implementation that shares no code
with it (VERDICT r03 item 4: no cargo toolchain exists in this image, so the
ready-to-run `tools/rust-dump` crate cannot produce the vectors itself).

Scope of exactness:
- Deterministic protocol arithmetic (ring products, decompositions, key
  switching, gates, bootstraps, CKKS evaluation) follows the Rust semantics
  bit-for-bit: every helper cites its source lines.
- RNG-to-sample mappings (uniform ints, discrete gaussians) implement the
  reference's DISTRIBUTION definitions (`util/src/misc/distribution.rs`)
  over the same SplitMix64 streams `tools/rust-dump` seeds, but not the
  rand crate's internal bit-consumption (ziggurat tables etc. are not
  reproducible without the crate source). The parity tests only assert
  key/ciphertext-level protocol identities, which are independent of the
  sampling stream; regenerating with real cargo later overwrites the dump
  and the same tests keep running unchanged.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1


# -- SplitMix64: the shared deterministic input stream --------------------------
# (tools/rust-dump/src/main.rs:27-45; seed constants in main.rs / transcripts.rs)


class SplitMix64:
    def __init__(self, seed: int):
        self.s = seed & MASK64

    def next(self) -> int:
        self.s = (self.s + 0x9E3779B97F4A7C15) & MASK64
        z = self.s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
        return z ^ (z >> 31)

    def below(self, bound: int) -> int:
        return self.next() % bound

    # rand::RngCore bridge used by the transcripts (transcripts.rs:55-75)
    def next_f64(self) -> float:
        # rand's Standard for f64: 53 high bits / 2^53
        return (self.next() >> 11) * (1.0 / (1 << 53))


# -- primes (util/src/zq.rs:325-342) --------------------------------------------


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def two_adic_primes(bits: int, log_n: int):
    """`zq.rs:325-329`: descending (q << log_n) + 1 candidates."""
    assert bits > log_n
    lo, hi = 1 << (bits - log_n - 1), 1 << (bits - log_n)
    for q in range(hi - 1, lo - 1, -1):
        cand = (q << log_n) + 1
        if _is_prime(cand):
            yield cand


# -- exact negacyclic products ---------------------------------------------------
#
# The reference's ring products are mathematically exact: NTT over prime q
# (`ring.rs:256-263` -> `fft/zq.rs`), limbed FFT64 over T64 (`fft/c64.rs`,
# exact for the operand bounds every protocol obeys), Karatsuba otherwise.
# Any exact integer negacyclic convolution is therefore bit-identical; this
# oracle uses a 16-bit-limb real FFT with a proven-exact error margin and a
# schoolbook big-int fallback (tests/test_pydump.py pins FFT == schoolbook).


def negacyclic_schoolbook(a, b, mod: int) -> np.ndarray:
    """O(n^2) exact big-int negacyclic product; the ground truth."""
    n = len(a)
    out = [0] * n
    ai = [int(x) for x in a]
    bi = [int(x) for x in b]
    for i, av in enumerate(ai):
        if av == 0:
            continue
        for j, bv in enumerate(bi):
            k = i + j
            if k < n:
                out[k] += av * bv
            else:
                out[k - n] -= av * bv
    return np.array([v % mod for v in out], dtype=object)


def _fft_conv_exact(a64: np.ndarray, b64: np.ndarray) -> np.ndarray:
    """Exact linear convolution of two int64 arrays via rfft, asserting the
    result is unambiguously integral (all values < 2^52 with < 0.25 drift)."""
    n = len(a64) + len(b64) - 1
    size = 1 << (n - 1).bit_length()
    fa = np.fft.rfft(a64.astype(np.float64), size)
    fb = np.fft.rfft(b64.astype(np.float64), size)
    c = np.fft.irfft(fa * fb, size)[:n]
    r = np.rint(c)
    assert np.max(np.abs(c - r)) < 0.25, "fft conv exactness margin exceeded"
    assert np.max(np.abs(r)) < 2**52, "fft conv magnitude exceeds exact range"
    return r.astype(np.int64)


def _limbs16(x: np.ndarray, n_limbs: int) -> list:
    """Split unsigned ints into 16-bit limbs (python-int array in, int64 out)."""
    out = []
    cur = np.array([int(v) for v in x], dtype=object)
    for _ in range(n_limbs):
        out.append((cur & 0xFFFF).astype(np.int64))
        cur >>= 16
    return out


def negacyclic_mul_mod(a, b, q: int) -> np.ndarray:
    """Exact negacyclic product mod q (q odd prime or any modulus < 2^64),
    via 16-bit limb decomposition of both operands and exact FFT convs.
    Returns object array of python ints in [0, q)."""
    n = len(a)
    if n <= 32:
        return negacyclic_schoolbook(a, b, q)
    nl = max(1, (int(q - 1).bit_length() + 15) // 16)
    la = _limbs16(a, nl)
    lb = _limbs16(b, nl)
    acc = [0] * (2 * n - 1)
    acc = np.zeros(2 * n - 1, dtype=object)
    for i in range(nl):
        for j in range(nl):
            c = _fft_conv_exact(la[i], lb[j])
            acc = acc + (c.astype(object) << (16 * (i + j)))
    lo = acc[:n]
    hi = np.concatenate([acc[n:], np.zeros(1, dtype=object)])
    return np.array([int(l - h) % q for l, h in zip(lo, hi)], dtype=object)


def negacyclic_mul_u64(a, b) -> np.ndarray:
    """Exact negacyclic product mod 2^64 (the T64 torus ring,
    `fft/c64.rs:43-85` semantics)."""
    return negacyclic_mul_mod(a, b, 1 << 64)


def negacyclic_mul_small(a_small: np.ndarray, b, mod: int) -> np.ndarray:
    """Fast path when one operand is small signed ints (secret keys, gadget
    digits): limb-split only b."""
    n = len(b)
    a64 = np.array([int(v) for v in a_small], dtype=np.int64)
    if n <= 32:
        return negacyclic_schoolbook(a64, b, mod)
    nl = max(1, (int(mod - 1).bit_length() + 15) // 16)
    lb = _limbs16(b, nl)
    acc = np.zeros(2 * n - 1, dtype=object)
    for j in range(nl):
        c = _fft_conv_exact(a64, lb[j])
        acc = acc + (c.astype(object) << (16 * j))
    lo = acc[:n]
    hi = np.concatenate([acc[n:], np.zeros(1, dtype=object)])
    return np.array([int(l - h) % mod for l, h in zip(lo, hi)], dtype=object)


def automorphism(v, t: int, mod: int) -> np.ndarray:
    """`avec.rs:35-49`: x_i -> +/- x at index i*t mod 2n."""
    n = len(v)
    t = t % (2 * n)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        it = (i * t) % (2 * n)
        if it < n:
            out[it] = int(v[i]) % mod
        else:
            out[it - n] = (-int(v[i])) % mod
    return out


def monomial_mul(v, e: int, mod: int) -> np.ndarray:
    """v * X^e in the negacyclic ring (X^n = -1)."""
    n = len(v)
    e = e % (2 * n)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        k = i + e
        sign = 1
        if k >= 2 * n:
            k -= 2 * n
        if k >= n:
            k -= n
            sign = -1
        out[k] = (sign * int(v[i])) % mod
    return out


# -- Zq scalar helpers (util/src/zq.rs) ------------------------------------------


def zq_from_i64(q: int, v: int) -> int:
    return v % q


def zq_to_i64(q: int, v: int) -> int:
    """`zq.rs:71-77` centered lift."""
    return v if v < (q >> 1) else v - q


def zq_to_center_u64(q: int, v: int) -> int:
    """`zq.rs:83-89`: centered, then wrapped into u64."""
    return v if v < (q >> 1) else (~(q - v) + 1) & MASK64


def zq_from_f64(q: int, v: float) -> int:
    """`zq.rs:59-61`: round-half-away-from-zero (Rust f64::round), then mod."""
    import math

    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return int(r) % q


def mod_switch(q: int, v: int, q_prime: int) -> int:
    """`zq.rs:128-130`: from_f64(v * q'/q)."""
    return zq_from_f64(q_prime, (float(v) * float(q_prime)) / float(q))


def mod_switch_odd(q: int, v: int, q_prime: int) -> int:
    """`zq.rs:132-140`."""
    x = (float(v) * float(q_prime)) / float(q)
    import math

    u = math.floor(x)
    if u == 0:
        return zq_from_f64(q_prime, x) % q_prime
    return (int(u) | 1) % q_prime


# -- Base2Decomposor (util/src/misc/decompose.rs) --------------------------------


class ZqDecomposor:
    """`decompose.rs:49-63,91-111`."""

    def __init__(self, q: int, log_b: int, d: int):
        self.q = q
        self.log_b = log_b
        self.d = d
        # q.next_power_of_two().ilog2() (`decompose.rs:51`)
        self.log_q = (q - 1).bit_length()
        self.rounding_bits = max(0, self.log_q - log_b * d)

    def log_bases(self):
        return [self.rounding_bits + i * self.log_b for i in range(self.d)]

    def power_up(self, poly) -> list:
        """pt * 2^bits mod q per digit (`decompose.rs:35-40`)."""
        return [
            np.array([(int(v) << bits) % self.q for v in poly], dtype=object)
            for bits in self.log_bases()
        ]

    def decompose_scalar(self, v: int) -> list:
        """`decompose.rs:92-111`: rounding_shr (Zq add + logical shift of the
        plain u64 residue, re-reduced), then the signed-digit expansion over
        the two's-complement centered u64."""
        q, log_b = self.q, self.log_b
        bits = self.rounding_bits
        rounded = (v + ((1 << bits) >> 1)) % q  # Zq + u64 (decompose.rs:93)
        shifted = (rounded >> bits) % q  # from_u64(q, u64 >> bits)
        v = zq_to_center_u64(q, shifted)  # decompose.rs:103
        b_by_2 = 1 << (log_b - 1)
        mask = (1 << log_b) - 1
        neg_b = q - (1 << log_b)
        out = []
        for _ in range(self.d):
            limb = v & mask
            carry = 1 if (limb + (v & 1)) > b_by_2 else 0
            v = (v >> log_b) + carry
            out.append((limb + carry * neg_b) % q)
        return out

    def decompose_poly(self, poly) -> list:
        """Digit-major list of d object arrays."""
        per = [self.decompose_scalar(int(v) % self.q) for v in poly]
        return [
            np.array([p[j] for p in per], dtype=object) for j in range(self.d)
        ]


class T64Decomposor:
    """`decompose.rs:66-81,114-134`."""

    def __init__(self, log_b: int, d: int):
        self.log_b = log_b
        self.d = d
        self.rounding_bits = max(0, 64 - log_b * d)

    def log_bases(self):
        return [self.rounding_bits + i * self.log_b for i in range(self.d)]

    def power_up(self, poly) -> list:
        return [
            np.array([(int(v) << bits) & MASK64 for v in poly], dtype=object)
            for bits in self.log_bases()
        ]

    def decompose_scalar(self, v: int) -> list:
        bits, log_b = self.rounding_bits, self.log_b
        v = (v + ((1 << bits) >> 1)) & MASK64
        v >>= bits
        mask = (1 << log_b) - 1
        out = []
        for _ in range(self.d):
            limb = v & mask
            v >>= log_b
            carry = ((((limb - 1) & MASK64) | v) & limb) >> (log_b - 1)
            v += carry
            out.append((limb - (carry << log_b)) & MASK64)
        return out

    def decompose_poly(self, poly) -> list:
        per = [self.decompose_scalar(int(v)) for v in poly]
        return [
            np.array([p[j] for p in per], dtype=object) for j in range(self.d)
        ]


# -- distributions (util/src/misc/distribution.rs) -------------------------------


def sample_binary(rng: SplitMix64) -> int:
    """`distribution.rs:6-8`."""
    return 0 if rng.next_f64() <= 0.5 else 1


def sample_zo(rho: float, rng: SplitMix64) -> int:
    """`distribution.rs:10-21`."""
    v = rng.next_f64()
    if v <= rho / 2.0:
        return -1
    if v <= rho:
        return 1
    return 0


def _dg_weights(std_dev: float, n: int):
    """`distribution.rs:23-47`: the erf-approximation CDF table."""
    import math

    def erf(x: float) -> float:
        p = 0.3275911
        a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
        t = 1.0 / (1.0 + p * abs(x))
        pos = 1.0 - (
            ((((a[4] * t + a[3]) * t) + a[2]) * t + a[1]) * t + a[0]
        ) * t * math.exp(-x * x)
        return pos if x >= 0 else -pos

    cdf = lambda x: (1.0 + erf(x / (std_dev * math.sqrt(2.0)))) / 2.0
    mx = int(math.floor(n * std_dev))
    w = [cdf(i + 0.5) - cdf(i - 0.5) for i in range(-mx, mx + 1)]
    return w, mx


_DG_CACHE: dict = {}


def sample_dg(std_dev: float, n: int, rng: SplitMix64) -> int:
    """WeightedIndex over the CDF table; the uniform draw is this oracle's
    own (one f64 scaled by the total weight — see module docstring)."""
    key = (std_dev, n)
    if key not in _DG_CACHE:
        w, mx = _dg_weights(std_dev, n)
        c = np.cumsum(w)
        _DG_CACHE[key] = (c, mx)
    c, mx = _DG_CACHE[key]
    u = rng.next_f64() * c[-1]
    idx = int(np.searchsorted(c, u, side="right"))
    return min(idx, 2 * mx) - mx


def sample_tdg(std_dev: float, rng: SplitMix64) -> int:
    """`distribution.rs:49-54` semantics (normal -> fractional part scaled
    to u64); the normal draw is Box-Muller over this oracle's stream."""
    import math

    u1 = max(rng.next_f64(), 2.0**-60)
    u2 = rng.next_f64()
    g = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)
    v = g * std_dev
    frac = v - round(v)
    return int(round(frac * (2.0**64))) & MASK64


def sample_uniform_u64(q: int, rng: SplitMix64) -> int:
    """Uniform in [0, q): rejection-free modulo like the kernel-dump inputs
    (main.rs:39-42); self-consistent within this oracle."""
    return rng.below(q)


def uniform_poly(q: int, n: int, rng: SplitMix64) -> np.ndarray:
    return np.array([rng.below(q) for _ in range(n)], dtype=object)


def dg_poly(std: float, nmax: int, n: int, rng: SplitMix64) -> np.ndarray:
    return np.array([sample_dg(std, nmax, rng) for _ in range(n)], dtype=object)


# -- .npy writer (mirrors rust-dump's writer; np.save is equivalent) -------------


def write_npy_u64(path, arr, shape=None):
    a = np.array([int(v) & MASK64 for v in np.asarray(arr, dtype=object).ravel()],
                 dtype=np.uint64)
    if shape is not None:
        a = a.reshape(shape)
    np.save(path, a)


def write_npy_f64(path, arr, shape=None):
    a = np.asarray(arr, dtype=np.float64)
    if shape is not None:
        a = a.reshape(shape)
    np.save(path, a)
