"""L2 NTT: round-trip and schoolbook-oracle tests (reference fft/zq.rs:94-116)."""

from itertools import islice

import numpy as np
import pytest

from learn_fhe_tpu.ops.ntt import intt, negacyclic_mul, ntt, ntt_plan
from learn_fhe_tpu.utils.primes import two_adic_primes

from .helpers import schoolbook_negacyclic_mul_mod


@pytest.mark.parametrize("log_n", [0, 1, 2, 4, 6, 8, 10])
def test_round_trip(rng, log_n):
    n = 1 << log_n
    for q in islice(two_adic_primes(45, log_n + 1), 4):
        plan = ntt_plan(q, n)
        a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
        back = np.asarray(intt(ntt(a, plan), plan))
        np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("log_n", [0, 1, 3, 5, 8])
def test_negacyclic_mul_vs_schoolbook(rng, log_n):
    n = 1 << log_n
    for q in islice(two_adic_primes(45, log_n + 1), 3):
        plan = ntt_plan(q, n)
        a = rng.integers(0, q, size=n, dtype=np.uint64)
        b = rng.integers(0, q, size=n, dtype=np.uint64)
        got = np.asarray(negacyclic_mul(a, b, plan))
        want = schoolbook_negacyclic_mul_mod(a, b, q)
        np.testing.assert_array_equal(got, want)


def test_negacyclic_mul_large_prime(rng):
    # 61-bit prime at N=2^10 -- the BASELINE config-1 shape
    n = 1 << 10
    q = next(two_adic_primes(61, 11))
    plan = ntt_plan(q, n)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    got = np.asarray(negacyclic_mul(a, b, plan))
    want = schoolbook_negacyclic_mul_mod(a, b, q)
    np.testing.assert_array_equal(got, want)


def test_batched_matches_single(rng):
    n, q = 64, next(two_adic_primes(30, 7))
    plan = ntt_plan(q, n)
    a = rng.integers(0, q, size=(4, 5, n), dtype=np.uint64)
    batched = np.asarray(ntt(a, plan))
    for i in range(4):
        for j in range(5):
            single = np.asarray(ntt(a[i, j], plan))
            np.testing.assert_array_equal(batched[i, j], single)


def test_linearity(rng):
    n, q = 128, next(two_adic_primes(40, 8))
    plan = ntt_plan(q, n)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    lhs = np.asarray(ntt((a.astype(object) + b.astype(object) % q) % q, plan))
    rhs = (np.asarray(ntt(a, plan)).astype(object) + np.asarray(ntt(b, plan))) % q
    np.testing.assert_array_equal(lhs, rhs.astype(np.uint64))
