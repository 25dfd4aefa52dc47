"""FFT64 parity path: round-trip, schoolbook oracle, quantified precision
bound (reference `fft/c64.rs:150-208`)."""

import numpy as np
import pytest

from learn_fhe_tpu.ops.fft64 import f64_mod_u64, negacyclic_fft64_mul

from .helpers import schoolbook_negacyclic_mul_wrap64


def golden_f64_mod_u64(v: float) -> int:
    """Direct transcription of `c64.rs:69-85`."""
    import struct

    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    sign = bits >> 63
    exponent = (bits >> 52) & 0x7FF
    mantissa = ((bits << 11) | 0x8000000000000000) & ((1 << 64) - 1)
    shift = 1086 - exponent
    if -63 <= shift <= 0:
        value = (mantissa << -shift) & ((1 << 64) - 1)
    elif 1 <= shift <= 64:
        value = ((mantissa >> (shift - 1)) + 1) >> 1
    else:
        value = 0
    return value if sign == 0 else (-value) & ((1 << 64) - 1)


def test_f64_mod_u64_matches_golden(rng):
    vals = np.concatenate(
        [
            rng.uniform(-1e25, 1e25, 200),
            rng.uniform(-1e5, 1e5, 200),
            np.array([0.0, 0.5, -0.5, 1.5, 2.5, -2.5, 2.0**63, -(2.0**63), 2.0**70]),
        ]
    )
    got = np.asarray(f64_mod_u64(vals))
    want = np.array([golden_f64_mod_u64(float(v)) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("log_n", [1, 3, 5, 8])
def test_fft64_mul_exact_small(rng, log_n):
    """`c64.rs:169-184`: products with operands < 2^((53-3-log_n)/2) are
    exact vs schoolbook."""
    n = 1 << log_n
    bound = 1 << ((53 - 3 - log_n) // 2)
    for _ in range(20):
        a = rng.integers(0, bound, size=n, dtype=np.uint64)
        b = rng.integers(0, bound, size=n, dtype=np.uint64)
        got = np.asarray(negacyclic_fft64_mul(a, b))
        np.testing.assert_array_equal(got, schoolbook_negacyclic_mul_wrap64(a, b))


def test_fft64_precision_bound(rng):
    """`c64.rs:187-208`: |error| <= 2^(64 + log_b + log_n - 53)."""
    for log_n, log_b in [(8, 12), (9, 14)]:
        n, b = 1 << log_n, 1 << log_b
        loss = 64 + log_b + log_n - 53
        worst = 0
        for _ in range(10):
            a = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2
            bb = rng.integers(0, b, size=n, dtype=np.uint64)
            got = np.asarray(negacyclic_fft64_mul(bb, a)).astype(np.int64)
            want = schoolbook_negacyclic_mul_wrap64(bb, a).astype(np.int64)
            diff = np.abs((got - want)).max()
            worst = max(worst, int(diff))
        assert worst.bit_length() - 1 <= loss if worst else True
