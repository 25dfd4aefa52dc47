"""L0 modular arithmetic: exactness of every reduction path vs Python ints."""

import numpy as np
import pytest

from learn_fhe_tpu.ops.modular import (
    ZqParams,
    add_mod,
    barrett_reduce_u64,
    mod_switch,
    mod_switch_odd,
    mul_mod,
    mul_shoup,
    mulhi64,
    neg_mod,
    shoup_precompute,
    sub_mod,
    to_center_i64,
    to_center_u64,
    to_montgomery,
    mont_mul,
)
from learn_fhe_tpu.utils.primes import two_adic_primes

PRIMES = [
    next(two_adic_primes(28, 10)),
    next(two_adic_primes(45, 10)),
    next(two_adic_primes(55, 11)),
    next(two_adic_primes(62, 12)),
]


def rand_u64(rng, n, hi):
    return rng.integers(0, hi, size=n, dtype=np.uint64)


def test_mulhi64(rng):
    a = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + 1
    got = np.asarray(mulhi64(a, b))
    want = np.array([(int(x) * int(y)) >> 64 for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", PRIMES)
def test_add_sub_neg(rng, q):
    a = rand_u64(rng, 1000, q)
    b = rand_u64(rng, 1000, q)
    np.testing.assert_array_equal(
        np.asarray(add_mod(a, b, q)), (a.astype(object) + b.astype(object)) % q
    )
    np.testing.assert_array_equal(
        np.asarray(sub_mod(a, b, q)),
        np.array([(int(x) - int(y)) % q for x, y in zip(a, b)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        np.asarray(neg_mod(a, q)),
        np.array([(-int(x)) % q for x in a], dtype=np.uint64),
    )


@pytest.mark.parametrize("q", PRIMES)
def test_mul_mod_montgomery(rng, q):
    zq = ZqParams(q)
    a = rand_u64(rng, 1000, q)
    b = rand_u64(rng, 1000, q)
    want = np.array([int(x) * int(y) % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(mul_mod(a, b, zq)), want)
    # montgomery domain round trip
    am = to_montgomery(a, zq)
    np.testing.assert_array_equal(np.asarray(mont_mul(am, b, zq)), want)


@pytest.mark.parametrize("q", PRIMES)
def test_mul_shoup(rng, q):
    a = rand_u64(rng, 1000, q)
    w = int(rng.integers(0, q))
    ws = shoup_precompute(w, q)
    want = np.array([int(x) * w % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(mul_shoup(a, w, ws, q)), want)


@pytest.mark.parametrize("q", PRIMES)
def test_barrett_reduce(rng, q):
    a = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + 1
    want = np.array([int(x) % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(barrett_reduce_u64(a, q)), want)


def test_center_lifts():
    q = 97
    a = np.arange(q, dtype=np.uint64)
    got_i = np.asarray(to_center_i64(a, q))
    want_i = np.array([v if v < q // 2 else v - q for v in range(q)], dtype=np.int64)
    np.testing.assert_array_equal(got_i, want_i)
    got_u = np.asarray(to_center_u64(a, q))
    np.testing.assert_array_equal(got_u, want_i.astype(np.uint64))


def test_mod_switch_matches_reference_semantics(rng):
    # reference zq.rs:128-130 -- f64 round half away from zero, rem_euclid
    q, qp = 2**16, 1024
    a = rng.integers(0, q, size=4096, dtype=np.uint64)
    got = np.asarray(mod_switch(a, q, qp))
    want = []
    for v in a:
        x = (float(v) * float(qp)) / float(q)
        r = np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)  # half away
        want.append(int(r) % qp)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_mod_switch_odd_semantics(rng):
    q, qp = 2**16, 1024
    a = rng.integers(0, q, size=4096, dtype=np.uint64)
    got = np.asarray(mod_switch_odd(a, q, qp))
    want = []
    for v in a:
        x = (float(v) * float(qp)) / float(q)
        u = np.floor(x)
        if u == 0.0:
            want.append(int(np.floor(x + 0.5)) % qp)
        else:
            want.append((int(u) | 1) % qp)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))
    # every nonzero output is odd
    nz = got[got > 1]
    assert np.all(nz % 2 == 1)
