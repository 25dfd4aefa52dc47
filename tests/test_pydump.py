"""Self-check of the independent parity oracle (tools/pydump): the exact
16-bit-limb FFT negacyclic products MUST be bit-identical to the big-int
schoolbook ground truth — this is the pin `tools/pydump/core.py` cites.
Pure numpy (no JAX, no learn_fhe_tpu imports beyond the test harness), so
the oracle's lineage stays independent of the library under test.

Covers every modulus class the dumps exercise: the FHEW NTT prime
(q ~ 2^28, `boolean.rs:225-239`), the multi-key 54-bit prime
(`boolean.rs:321-335`), the CKKS 55-bit prime stream head (`ckks.rs:306`),
the T64 torus ring 2^64 (`fft/c64.rs`), and the small-operand fast path
(secret keys / gadget digits)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "pydump"))

from core import (  # noqa: E402
    negacyclic_mul_mod,
    negacyclic_mul_small,
    negacyclic_mul_u64,
    negacyclic_schoolbook,
    two_adic_primes,
)

Q28 = next(two_adic_primes(28, 10))
Q54 = next(two_adic_primes(54, 10))
Q55 = next(two_adic_primes(55, 10))


@pytest.mark.parametrize("q", [Q28, Q54, Q55, (1 << 60) - 1])
@pytest.mark.parametrize("n", [64, 256])
def test_mul_mod_matches_schoolbook(q, n):
    # n > 32 so the FFT path (not the schoolbook shortcut) is what runs
    rng = np.random.default_rng(q % 100003 + n)
    a = np.array([int(v) for v in rng.integers(0, q, n, dtype=np.uint64)], dtype=object)
    b = np.array([int(v) for v in rng.integers(0, q, n, dtype=np.uint64)], dtype=object)
    got = negacyclic_mul_mod(a, b, q)
    want = negacyclic_schoolbook(a, b, q)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n", [64, 256])
def test_mul_u64_matches_schoolbook(n):
    rng = np.random.default_rng(n)
    a = np.array([int(v) for v in rng.integers(0, 1 << 64, n, dtype=np.uint64)], dtype=object)
    b = np.array([int(v) for v in rng.integers(0, 1 << 64, n, dtype=np.uint64)], dtype=object)
    got = negacyclic_mul_u64(a, b)
    want = negacyclic_schoolbook(a, b, 1 << 64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("q", [Q28, Q54, 1 << 64])
def test_mul_small_matches_schoolbook(q):
    n = 128
    rng = np.random.default_rng(int(q) % 99991)
    sk = rng.integers(-1, 2, n).astype(np.int64)  # ternary secret
    b = np.array([int(v) for v in rng.integers(0, q, n, dtype=np.uint64)], dtype=object)
    got = negacyclic_mul_small(sk, b, q)
    want = negacyclic_schoolbook(sk.astype(object), b, q)
    assert np.array_equal(got, want)


def test_gadget_digit_operand_range():
    # gadget digits are signed in (-B/2, B/2]: the small-operand path must
    # stay exact there too (B = 2^23, the widest digit base in the fixtures)
    n, q = 64, Q54
    rng = np.random.default_rng(7)
    d = rng.integers(-(1 << 22), (1 << 22) + 1, n).astype(np.int64)
    b = np.array([int(v) for v in rng.integers(0, q, n, dtype=np.uint64)], dtype=object)
    assert np.array_equal(
        negacyclic_mul_small(d, b, q), negacyclic_schoolbook(d.astype(object), b, q)
    )
