"""Exact negacyclic ring mul for non-NTT moduli (ops/ring_mul.py) vs the
schoolbook oracle — the reference checks its Karatsuba path the same way
(`util/src/ring/karatsuba.rs:100-111`, sweeps against schoolbook)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

from learn_fhe_tpu.ops.ring_mul import negacyclic_mul_i64, negacyclic_mul_pow2

from .helpers import schoolbook_negacyclic_mul_wrap64


def _schoolbook_z(a, b):
    """Exact negacyclic product over the integers, Python ints."""
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    n = len(a)
    c = [0] * n
    for i in range(n):
        if a[i] == 0:
            continue
        for j in range(n):
            k = i + j
            p = a[i] * b[j]
            if k < n:
                c[k] += p
            else:
                c[k - n] -= p
    return c


@pytest.mark.parametrize("log_n", [0, 1, 4, 8])
def test_negacyclic_mul_i64_exact(log_n):
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
    a = rng.integers(-(1 << 20), 1 << 20, n)
    b = rng.integers(-(1 << 20), 1 << 20, n)
    got = np.asarray(
        jax.jit(lambda x, y: negacyclic_mul_i64(x, y, 20, 20))(a, b)
    )
    assert got.tolist() == _schoolbook_z(a, b)


def test_negacyclic_mul_i64_sk_square():
    """The CKKS keygen use: sk ~ zo(0.5) squared over Z (`ckks.rs:78-80`)."""
    n = 256
    rng = np.random.default_rng(9)
    sk = rng.integers(-1, 2, n)
    got = np.asarray(jax.jit(lambda x: negacyclic_mul_i64(x, x, 1, 1))(sk))
    assert got.tolist() == _schoolbook_z(sk, sk)


@pytest.mark.parametrize("log_q", [8, 16, 30, 47, 64])
def test_negacyclic_mul_pow2_exact(log_q):
    n = 128
    rng = np.random.default_rng(log_q)
    mask = (1 << log_q) - 1
    a = rng.integers(0, 1 << 63, n, dtype=np.uint64) & np.uint64(mask)
    b = rng.integers(0, 1 << 63, n, dtype=np.uint64) & np.uint64(mask)
    got = np.asarray(jax.jit(lambda x, y: negacyclic_mul_pow2(x, y, log_q))(a, b))
    want = schoolbook_negacyclic_mul_wrap64(a, b) & np.uint64(mask)
    assert (got == want).all()


def test_negacyclic_mul_pow2_batched():
    n, batch = 64, 5
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 63, (batch, n), dtype=np.uint64)
    b = rng.integers(0, 1 << 63, (batch, n), dtype=np.uint64)
    got = np.asarray(jax.jit(lambda x, y: negacyclic_mul_pow2(x, y, 64))(a, b))
    for i in range(batch):
        assert (got[i] == schoolbook_negacyclic_mul_wrap64(a[i], b[i])).all()
