"""RNS limb-stacked kernels: NTT round-trip, mul oracle, base extension,
rescale (reference `util/src/ring/rns.rs` tests + semantics)."""

from itertools import islice

import numpy as np

from learn_fhe_tpu.ops.rns import (
    extend_bases,
    rescale_k,
    rns_intt,
    rns_mul,
    rns_ntt,
    rns_plan,
)
from learn_fhe_tpu.utils.crt import bigints_to_rns, rns_to_bigints
from learn_fhe_tpu.utils.primes import two_adic_primes

from .helpers import schoolbook_negacyclic_mul_mod


def _basis(bits=55, log_n=10, count=16):
    return list(islice(two_adic_primes(bits, log_n), count))


def test_rns_ntt_roundtrip(rng):
    primes = _basis()
    qs = tuple(primes[:8])
    for n in (1, 4, 64):
        plan = rns_plan(qs, n)
        x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
        rt = np.asarray(rns_intt(rns_ntt(x, plan), plan))
        np.testing.assert_array_equal(rt, x)


def test_rns_mul_oracle(rng):
    qs = tuple(_basis()[:4])
    n = 32
    plan = rns_plan(qs, n)
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
    y = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
    prod = np.asarray(rns_mul(x, y, plan))
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(prod[i], schoolbook_negacyclic_mul_mod(x[i], y[i], q))


def test_extend_bases_bigint_exact(rng):
    """`rns.rs:373-386`: extension preserves the reconstructed integer."""
    primes = _basis()
    qs, ps = tuple(primes[:8]), tuple(primes[8:])
    for n in (1, 16, 64):
        x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
        ext = np.asarray(extend_bases(x, qs, ps))
        v0 = rns_to_bigints(x, qs)
        v1 = rns_to_bigints(np.concatenate([x, ext], axis=0), qs + ps)
        assert v0 == v1


def test_rescale_rounds(rng):
    primes = _basis()
    qs = tuple(primes[:8])
    n = 16
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
    vals = rns_to_bigints(x, qs)
    # k=1 is exact divide-and-round
    got = rns_to_bigints(np.asarray(rescale_k(x, qs, 1)), qs[:-1])
    want = [(v + qs[-1] // 2) // qs[-1] for v in vals]
    assert got == want
    # k=3 uses approximate base conversion: off by at most 1
    p3 = qs[-1] * qs[-2] * qs[-3]
    got = rns_to_bigints(np.asarray(rescale_k(x, qs, 3)), qs[:-3])
    want = [(v + p3 // 2) // p3 for v in vals]
    assert max(abs(g - w) for g, w in zip(got, want)) <= 1


def test_crt_roundtrip(rng):
    qs = tuple(_basis()[:5])
    big_q = 1
    for q in qs:
        big_q *= q
    vals = [int(rng.integers(-(2**60), 2**60)) for _ in range(16)]
    back = rns_to_bigints(bigints_to_rns(vals, qs), qs)
    assert back == vals
