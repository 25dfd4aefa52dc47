"""Shared test oracles, mirroring the reference's test strategy (SURVEY.md §4).

The schoolbook negacyclic multiply is the ground-truth oracle for every fast
polynomial product (cf. reference `util/src/ring.rs:421-440`), computed here
in exact Python integers.
"""

from __future__ import annotations

import numpy as np


def schoolbook_negacyclic_mul_mod(a, b, q: int) -> np.ndarray:
    """Exact negacyclic product of integer coefficient vectors mod q."""
    if q < (1 << 63):
        from learn_fhe_tpu.utils import native

        out = native.nega_mul_zq(
            np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64), q
        )
        if out is not None:
            return out
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    n = len(a)
    c = [0] * n
    for i in range(n):
        ai = a[i]
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            p = ai * b[j]
            if k < n:
                c[k] += p
            else:
                c[k - n] -= p
    return np.array([x % q for x in c], dtype=np.uint64)


def schoolbook_negacyclic_mul_wrap64(a, b) -> np.ndarray:
    """Exact negacyclic product of u64 torus vectors, wrapping mod 2^64."""
    from learn_fhe_tpu.utils import native

    out = native.nega_mul_t64(
        np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64)
    )
    if out is not None:
        return out
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    n = len(a)
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            p = a[i] * b[j]
            if k < n:
                c[k] += p
            else:
                c[k - n] -= p
    return np.array([x % (1 << 64) for x in c], dtype=np.uint64)
