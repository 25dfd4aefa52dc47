"""FhewU8 arithmetic vs native u8 semantics (`uint8.rs:255-338`).

The reference sweeps random pairs against native u8; the vectorized value
lanes make that nearly free here — every op runs a 64-lane random sweep
(div/rem includes the b=1, a<b, a=0 edge lanes) in ONE sequence of batched
bootstraps. Scalar spot-checks remain for the scalar API path.
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


@pytest.fixture(scope="module")
def u8_lanes(u8_env):
    """64 random value-pairs as ONE vectorized FhewU8 pair, with the div/rem
    edge cases (a=0, a<b, b=1, a=b=255) pinned into the first lanes."""
    params, z, bk, enc = u8_env
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=64).astype(np.uint8)
    b = rng.integers(1, 256, size=64).astype(np.uint8)  # div-safe divisors
    a[0], b[0] = 0, 7
    a[1], b[1] = 5, 200
    a[2], b[2] = 123, 1
    a[3], b[3] = 255, 255
    ca = FhewU8.sk_encrypt(params, bk, np.asarray(z), a, rng)
    cb = FhewU8.sk_encrypt(params, bk, np.asarray(z), b, rng)
    return z, a, b, ca, cb


def test_u8_sweep_add_sub_neg(u8_lanes):
    z, a, b, ca, cb = u8_lanes
    ai, bi = a.astype(int), b.astype(int)
    sk = np.asarray(z)
    np.testing.assert_array_equal((ca + cb).decrypt(sk), (ai + bi) % 256)
    np.testing.assert_array_equal((ca - cb).decrypt(sk), (ai - bi) % 256)
    np.testing.assert_array_equal(ca.wrapping_neg().decrypt(sk), (-ai) % 256)
    s, c = ca.overflowing_add(cb)
    np.testing.assert_array_equal(s.decrypt(sk), (ai + bi) % 256)
    np.testing.assert_array_equal(np.asarray(c.decrypt(sk)), ai + bi > 255)


def test_u8_sweep_mul(u8_lanes):
    z, a, b, ca, cb = u8_lanes
    got = (ca * cb).decrypt(np.asarray(z))
    np.testing.assert_array_equal(got, (a.astype(int) * b.astype(int)) % 256)


def test_u8_sweep_div_rem(u8_lanes):
    z, a, b, ca, cb = u8_lanes
    q, r = ca.div_rem(cb)
    sk = np.asarray(z)
    np.testing.assert_array_equal(q.decrypt(sk), a.astype(int) // b.astype(int))
    np.testing.assert_array_equal(r.decrypt(sk), a.astype(int) % b.astype(int))


def test_u8_coarse_gate_pad():
    """gate_pad buckets collapse every circuit round onto 1-2 batch shapes
    (ARCHITECTURE §10) without changing results."""
    from dataclasses import replace

    from learn_fhe_tpu.models.fhew import key_gen, rlwe

    rng = np.random.default_rng(5)
    params = replace(small_boot_params(), gate_pad=(16, 64))
    z = rlwe.sk_gen(params.rlwe, rng)
    bk = key_gen(params, z, rng)
    a, b = 201, 13
    ca = FhewU8.sk_encrypt(params, bk, z, a, rng)
    cb = FhewU8.sk_encrypt(params, bk, z, b, rng)
    assert (ca + cb).decrypt(z) == (a + b) % 256
    assert ca.div_rem(cb)[1].decrypt(z) == a % b
