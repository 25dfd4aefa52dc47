"""Gadget decomposition: bit-exact vs a direct Python-int transcription of the
reference's carry rules (`decompose.rs:91-135`), plus the algebraic identity
sum_i digit_i * B^i * 2^rb == round(x) (mod q)."""

import numpy as np
import pytest

from learn_fhe_tpu.ops.gadget import (
    Gadget,
    decompose_t64,
    decompose_zq,
    power_up_t64,
    power_up_zq,
)
from learn_fhe_tpu.utils.primes import two_adic_primes

M64 = (1 << 64) - 1


def golden_decompose_zq(x: int, g: Gadget) -> list[int]:
    q, log_b = g.q, g.log_b
    mask, b_by_2, neg_b = (1 << log_b) - 1, 1 << (log_b - 1), q - (1 << log_b)
    # rounding_shr
    rounded = (x + (((1 << g.rounding_bits) >> 1) % q)) % q
    v = rounded >> g.rounding_bits
    # to_center_u64
    v = v if v < q >> 1 else (v - q) & M64
    out = []
    for _ in range(g.d):
        limb = v & mask
        carry = 1 if limb + (v & 1) > b_by_2 else 0
        v = (v >> log_b) + carry
        out.append((limb + carry * neg_b) % q)
    return out


def golden_decompose_t64(x: int, g: Gadget) -> list[int]:
    log_b = g.log_b
    mask = (1 << log_b) - 1
    v = x
    if g.rounding_bits:
        v = ((v + ((1 << g.rounding_bits) >> 1)) & M64) >> g.rounding_bits
    out = []
    for _ in range(g.d):
        limb = v & mask
        v >>= log_b
        carry = ((((limb - 1) & M64) | v) & limb) >> (log_b - 1)
        v += carry
        out.append((limb - (carry << log_b)) & M64)
    return out


@pytest.mark.parametrize("log_b,d", [(7, 4), (5, 9), (2, 8), (1, 16)])
def test_decompose_zq_matches_golden(rng, log_b, d):
    q = next(two_adic_primes(28, 10))
    g = Gadget(q, log_b, d)
    x = rng.integers(0, q, size=512, dtype=np.uint64)
    got = np.asarray(decompose_zq(x, g))  # (d, 512)
    for i in (0, 7, 100, 511):
        want = golden_decompose_zq(int(x[i]), g)
        np.testing.assert_array_equal(got[:, i], np.array(want, dtype=np.uint64))


@pytest.mark.parametrize("log_b,d", [(7, 4), (5, 9)])
def test_decompose_zq_reconstructs(rng, log_b, d):
    """Signed digits satisfy sum_i digit_i * B^i == centered(round(x))
    mod 2^log_q (NOT mod q: the top carry out of the d digits is dropped and
    absorbed as gadget noise, worth (2^log_q - q) mod q -- tiny because the
    reference always picks q just below a power of two)."""
    q = next(two_adic_primes(28, 10))
    g = Gadget(q, log_b, d)
    M = 1 << g.log_q
    x = rng.integers(0, q, size=256, dtype=np.uint64)
    digits = np.asarray(decompose_zq(x, g))
    for j in range(x.size):
        recon = 0
        for i in range(g.d):
            v = int(digits[i, j])
            signed = v if v < q // 2 else v - q  # digits are centered
            recon += signed << g.log_bases[i]
        r = (int(x[j]) + (((1 << g.rounding_bits) >> 1) % q)) % q
        want = (r >> g.rounding_bits) << g.rounding_bits
        want = want if want < q // 2 else want - q
        assert recon % M == want % M, (j, recon, want)


@pytest.mark.parametrize("log_b,d", [(23, 1), (4, 5), (16, 4)])
def test_decompose_t64_matches_golden(rng, log_b, d):
    g = Gadget(0, log_b, d)
    x = rng.integers(0, 1 << 63, size=512, dtype=np.uint64) * 2 + 1
    got = np.asarray(decompose_t64(x, g))
    for i in (0, 13, 255, 511):
        want = golden_decompose_t64(int(x[i]), g)
        np.testing.assert_array_equal(got[:, i], np.array(want, dtype=np.uint64))


def test_decompose_t64_reconstructs(rng):
    g = Gadget(0, 4, 5)
    x = rng.integers(0, 1 << 63, size=64, dtype=np.uint64) * 2
    digits = np.asarray(decompose_t64(x, g)).astype(object)
    bases = g.bases.astype(object)
    recon = sum(int(digits[i][j]) * int(bases[i]) for i in range(g.d) for j in [0]) % (
        1 << 64
    )
    # round(x) to rounding_bits precision
    want = (
        (((int(x[0]) + ((1 << g.rounding_bits) >> 1)) & M64) >> g.rounding_bits)
        << g.rounding_bits
    ) & M64
    assert recon == want


def test_power_up(rng):
    q = next(two_adic_primes(28, 10))
    g = Gadget(q, 7, 4)
    x = rng.integers(0, q, size=32, dtype=np.uint64)
    got = np.asarray(power_up_zq(x, g))
    for i, bits in enumerate(g.log_bases):
        want = (x.astype(object) * pow(2, bits, q)) % q
        np.testing.assert_array_equal(got[i], want.astype(np.uint64))
    gt = Gadget(0, 23, 1)
    xt = rng.integers(0, 1 << 64, size=32, dtype=np.uint64)
    gott = np.asarray(power_up_t64(xt, gt))
    want = (xt.astype(object) * (1 << gt.rounding_bits)) % (1 << 64)
    np.testing.assert_array_equal(gott[0], want.astype(np.uint64))
