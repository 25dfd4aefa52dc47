"""Structure ops: automorphism, monomial multiplication, sample extraction."""

import numpy as np
import pytest

from learn_fhe_tpu.ops.poly import (
    automorphism_t64,
    automorphism_zq,
    monomial_mul_t64,
    monomial_mul_zq,
    sample_extract_a,
)

from .helpers import schoolbook_negacyclic_mul_mod, schoolbook_negacyclic_mul_wrap64


def naive_automorphism(a, t, q):
    """Direct transcription of `avec.rs:34-50`."""
    n = len(a)
    t = t % (2 * n)
    v = [0] * n
    for i in range(n):
        it = (i * t) % (2 * n)
        if it < n:
            v[it] = int(a[i])
        else:
            v[it - n] = (-int(a[i])) % q
    return np.array(v, dtype=np.uint64)


@pytest.mark.parametrize("t", [5, -5, 25, 3, 2 * 64 - 1])
def test_automorphism(rng, t):
    n, q = 64, 97
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    got = np.asarray(automorphism_zq(a, t, q))
    np.testing.assert_array_equal(got, naive_automorphism(a, t, q))


def test_automorphism_t64(rng):
    n = 32
    a = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    got = np.asarray(automorphism_t64(a, 5))
    want = naive_automorphism(a.astype(object), 5, 1 << 64).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("i", [0, 1, 5, 63, 64, 100, 127, 128])
def test_monomial_mul(rng, i):
    n, q = 64, 97
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    mono = np.zeros(n, dtype=np.uint64)
    j = i % (2 * n)
    if j < n:
        mono[j] = 1
    else:
        mono[j - n] = q - 1
    want = schoolbook_negacyclic_mul_mod(a, mono, q)
    got = np.asarray(monomial_mul_zq(a, i, q))
    np.testing.assert_array_equal(got, want)
    # torus variant
    at = rng.integers(0, 1 << 60, size=n, dtype=np.uint64)
    monot = np.zeros(n, dtype=np.uint64)
    if j < n:
        monot[j] = 1
    else:
        monot[j - n] = (1 << 64) - 1
    wantt = schoolbook_negacyclic_mul_wrap64(at, monot)
    gott = np.asarray(monomial_mul_t64(at, i))
    np.testing.assert_array_equal(gott, wantt)


@pytest.mark.parametrize("i", [0, 3, 63])
def test_sample_extract(rng, i):
    """<extract_a(a, i), s> == coefficient i of a(X)*s(X) (`rlwe.rs:193-202`)."""
    n, q = 64, 12289
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    s = rng.integers(0, q, size=n, dtype=np.uint64)
    ext = np.asarray(sample_extract_a(a, i, q)).astype(object)
    dot = int(sum(ext * s.astype(object)) % q)
    prod = schoolbook_negacyclic_mul_mod(a, s, q)
    assert dot == int(prod[i])
