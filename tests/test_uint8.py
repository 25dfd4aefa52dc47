"""FhewU8 arithmetic vs native u8 semantics (`uint8.rs:255-338`).

Each u8 op costs tens-to-hundreds of bootstraps, so we check one or two value
pairs per op rather than the reference's random sweeps; the underlying gates
are already exhaustively tested in test_fhew.py.
"""

import numpy as np
import pytest

from learn_fhe_tpu.models.fhew import FhewU8, key_gen, rlwe

from .test_fhew import small_boot_params


@pytest.fixture(scope="module")
def u8_env():
    rng = np.random.default_rng(3)
    params = small_boot_params()
    z = rlwe.sk_gen(params.rlwe, rng)
    bk = key_gen(params, z, rng)

    def enc(v):
        return FhewU8.sk_encrypt(params, bk, z, v, rng)

    return params, z, bk, enc


def test_u8_roundtrip(u8_env):
    params, z, bk, enc = u8_env
    for v in (0, 1, 0x5A, 0xFF):
        assert enc(v).decrypt(z) == v


def test_u8_add_sub_neg(u8_env):
    params, z, bk, enc = u8_env
    a, b = 177, 103
    assert enc(a).wrapping_add(enc(b)).decrypt(z) == (a + b) % 256
    assert enc(a).wrapping_sub(enc(b)).decrypt(z) == (a - b) % 256
    assert enc(b).wrapping_sub(enc(a)).decrypt(z) == (b - a) % 256
    assert enc(a).wrapping_neg().decrypt(z) == (-a) % 256
    s, c = enc(200).overflowing_add(enc(100))
    assert (s.decrypt(z), c.decrypt(z)) == ((300) % 256, True)


def test_u8_mul(u8_env):
    params, z, bk, enc = u8_env
    a, b = 23, 11
    assert enc(a).wrapping_mul(enc(b)).decrypt(z) == (a * b) % 256


@pytest.mark.slow
def test_u8_div_rem(u8_env):
    params, z, bk, enc = u8_env
    a, b = 180, 7
    q, r = enc(a).div_rem(enc(b))
    assert (q.decrypt(z), r.decrypt(z)) == (a // b, a % b)


def test_vectorized_u8(u8_env):
    """One FhewU8 can hold a VECTOR of values: every gate of add/mul runs
    lane-parallel across the vector in a single batched bootstrap."""
    params, z, bk, enc = u8_env
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, size=5).astype(np.uint8)
    b = rng.integers(1, 256, size=5).astype(np.uint8)
    ca = FhewU8.sk_encrypt(params, bk, np.asarray(z), a, rng)
    cb = FhewU8.sk_encrypt(params, bk, np.asarray(z), b, rng)
    np.testing.assert_array_equal((ca + cb).decrypt(np.asarray(z)), a + b)
    np.testing.assert_array_equal((ca * cb).decrypt(np.asarray(z)), a * b)
