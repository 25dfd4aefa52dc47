"""Oracle tests for the u32 fast-path modules: modular32, ntt32, torus_crt,
and the u32 gadget-decomposition variants.

Every fast path is checked against either exact Python-integer arithmetic or
the already-oracle-tested u64 implementation (same schoolbook-oracle strategy
as the reference, `util/src/ring.rs:421-452`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from learn_fhe_tpu.ops import gadget as gad
from learn_fhe_tpu.ops.modular32 import (
    Zq32Params,
    add_mod32,
    barrett_reduce_u32,
    i64_to_mod32,
    mul_mod32,
    mul_shoup32,
    mulhi32,
    shoup32,
    shoup32_device,
    small_i64_to_mod32,
    sub_mod32,
)
from learn_fhe_tpu.ops.ntt32 import intt32, negacyclic_mul32, ntt32, ntt32_plan
from learn_fhe_tpu.ops.torus_crt import (
    garner_to_u64,
    monomial_eval_table,
    negacyclic_mul_t64_crt,
    required_bound_bits,
    small_to_eval,
    torus_crt_plan,
    torus_to_eval,
)
from learn_fhe_tpu.utils.primes import two_adic_primes

Q31 = next(two_adic_primes(31, 12))


def test_mulhi32_and_shoup(rng):
    a = rng.integers(0, 1 << 32, size=1024, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=1024, dtype=np.uint32)
    got = np.asarray(mulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    assert np.array_equal(got, want)

    w = int(rng.integers(1, Q31))
    ws = int(shoup32(w, Q31)[()])
    x = rng.integers(0, 1 << 32, size=1024, dtype=np.uint32)  # any u32 input
    got = np.asarray(mul_shoup32(jnp.asarray(x), np.uint32(w), np.uint32(ws), Q31))
    want = (x.astype(np.uint64) * w % Q31).astype(np.uint32)
    assert np.array_equal(got, want)


def test_mul_mod32_and_barrett(rng):
    zq = Zq32Params(Q31)
    a = rng.integers(0, Q31, size=2048, dtype=np.uint32)
    b = rng.integers(0, Q31, size=2048, dtype=np.uint32)
    got = np.asarray(mul_mod32(jnp.asarray(a), jnp.asarray(b), zq))
    want = (a.astype(np.uint64) * b % Q31).astype(np.uint32)
    assert np.array_equal(got, want)

    x = rng.integers(0, 1 << 32, size=2048, dtype=np.uint32)
    got = np.asarray(barrett_reduce_u32(jnp.asarray(x), Q31))
    assert np.array_equal(got, (x % Q31).astype(np.uint32))


def test_add_sub_mod32(rng):
    a = rng.integers(0, Q31, size=512, dtype=np.uint32)
    b = rng.integers(0, Q31, size=512, dtype=np.uint32)
    assert np.array_equal(
        np.asarray(add_mod32(jnp.asarray(a), jnp.asarray(b), Q31)),
        ((a.astype(np.uint64) + b) % Q31).astype(np.uint32),
    )
    assert np.array_equal(
        np.asarray(sub_mod32(jnp.asarray(a), jnp.asarray(b), Q31)),
        ((a.astype(np.int64) - b) % Q31).astype(np.uint32),
    )


def test_residue_conversions(rng):
    x = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    got = np.asarray(i64_to_mod32(jnp.asarray(x), Q31))
    want = (x.astype(np.int64) % Q31).astype(np.uint32)  # signed centered rep
    assert np.array_equal(got, want)

    small = rng.integers(-(1 << 22), 1 << 22, size=512).astype(np.int64)
    got = np.asarray(
        small_i64_to_mod32(jnp.asarray(small.astype(np.uint64)), Q31, 23)
    )
    assert np.array_equal(got, (small % Q31).astype(np.uint32))


def test_shoup32_device_matches_host(rng):
    w = rng.integers(0, Q31, size=4096, dtype=np.uint32)
    got = np.asarray(shoup32_device(jnp.asarray(w), Q31))
    assert np.array_equal(got, shoup32(w, Q31))


@pytest.mark.parametrize("log_n", [0, 1, 4, 9])
def test_ntt32_roundtrip_and_schoolbook(rng, log_n):
    n = 1 << log_n
    q = next(two_adic_primes(29, max(log_n + 1, 4)))
    plan = ntt32_plan(q, n)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    # roundtrip
    rt = np.asarray(intt32(ntt32(jnp.asarray(a), plan), plan))
    assert np.array_equal(rt, a)
    # negacyclic schoolbook oracle
    got = np.asarray(negacyclic_mul32(jnp.asarray(a), jnp.asarray(b), plan))
    for t in range(3):
        c = np.zeros(n, dtype=object)
        for i in range(n):
            for j in range(n):
                k, s = (i + j, 1) if i + j < n else (i + j - n, -1)
                c[k] += s * int(a[t, i]) * int(b[t, j])
        assert np.array_equal(got[t].astype(object), np.array([x % q for x in c]))


def test_ntt32_matches_u64_ntt(rng):
    """Same prime, same twiddle derivation: evaluation values must agree."""
    from learn_fhe_tpu.ops.ntt import ntt, ntt_plan

    n = 64
    q = next(two_adic_primes(28, 8))
    a = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    e64 = np.asarray(ntt(jnp.asarray(a), ntt_plan(q, n)))
    e32 = np.asarray(ntt32(jnp.asarray(a.astype(np.uint32)), ntt32_plan(q, n)))
    assert np.array_equal(e64.astype(np.uint32), e32)


def test_torus_crt_vs_torus_ntt(rng):
    from learn_fhe_tpu.ops.torus_ntt import negacyclic_mul_t64

    for n, log_b in [(16, 7), (128, 23)]:
        half = 1 << (log_b - 1)
        a = rng.integers(-half, half + 1, size=(2, n)).astype(np.int64).astype(np.uint64)
        b = rng.integers(0, 1 << 64, size=(2, n), dtype=np.uint64)
        got = np.asarray(negacyclic_mul_t64_crt(jnp.asarray(a), jnp.asarray(b), log_b))
        want = np.asarray(negacyclic_mul_t64(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(got, want)


def test_garner_roundtrip(rng):
    n = 32
    plan = torus_crt_plan(n, required_bound_bits(n, 8, 2))
    x = rng.integers(0, 1 << 64, size=(4, n), dtype=np.uint64)
    res = torus_to_eval(jnp.asarray(x), plan)
    back = np.asarray(garner_to_u64(res, plan))
    assert np.array_equal(back, x)


def test_monomial_eval_table_matches_ntt(rng):
    n = 32
    bound = required_bound_bits(n, 8, 2)
    plan = torus_crt_plan(n, bound)
    vals, duals = monomial_eval_table(n, bound)
    for s in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
        mono = np.zeros(n, dtype=np.uint64)
        if s < n:
            mono[s] = 1
        else:
            mono[s - n] = np.uint64(0xFFFFFFFFFFFFFFFF)  # -X^{s-n} on the torus
        ev = torus_to_eval(jnp.asarray(mono), plan)
        for i in range(plan.k):
            assert np.array_equal(np.asarray(ev[i]), vals[i, s]), (s, i)
            assert np.array_equal(duals[i, s], shoup32(vals[i, s], plan.primes[i]))


def test_decompose_zq32_matches_u64(rng):
    q = next(two_adic_primes(28, 8))
    g = gad.Gadget(q, 7, 4)
    assert gad.decompose_zq_supports_u32(g)
    x = rng.integers(0, q, size=1024, dtype=np.uint64)
    d64 = np.asarray(gad.decompose_zq(jnp.asarray(x), g))
    d32 = np.asarray(gad.decompose_zq32(jnp.asarray(x.astype(np.uint32)), g))
    assert np.array_equal(d64.astype(np.uint32), d32)


def test_decompose_t64_u32_matches_u64(rng):
    for log_b, d in [(23, 1), (4, 5)]:
        g = gad.Gadget(0, log_b, d)
        assert gad.decompose_t64_supports_u32(g)
        x = rng.integers(0, 1 << 64, size=1024, dtype=np.uint64)
        d64 = np.asarray(gad.decompose_t64(jnp.asarray(x), g))
        hi = (x >> 32).astype(np.uint32)
        d32 = np.asarray(gad.decompose_t64_u32(jnp.asarray(hi), g))
        assert np.array_equal(d64.astype(np.uint32), d32)
