"""Production CKKS extension: prime-bit ladders and multi-digit hybrid key
switching (Han-Ki, eprint 2019/688).

The reference (`ckks.rs:20-35,154-162`) only supports uniform prime sizes
with |P| = |Q| single-digit key switching; these tests pin the generalized
machinery: digit-decomposed key_switch/rotate/conjugate/mul must stay
correct at every level (including levels that cut a digit group partially),
hoisted rotations must match the per-rotation path, and the default params
must remain bit-identical to the single-digit layout.
"""

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import ckks as C


def assert_bits(a, b, bits):
    d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    got = 200 if d == 0 else -np.log2(d)
    assert got > bits, f"precision {got:.1f} < {bits}"


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(41)
    # ladder: 55-bit q0, mixed 45/55 levels, two 55-bit aux primes, 3 digits
    params = C.CkksParams(
        log_n=5,
        log_qi=55,
        big_l=6,
        log_qis=(55, 45, 45, 55, 45, 45),
        log_ps=(55, 55),
        dnum=3,
    )
    sk = C.sk_gen(params, rng)
    return params, sk, rng


def _sample(params, rng):
    return rng.random(params.l) + 1j * rng.random(params.l)


def test_ladder_prime_layout(env):
    params, _, _ = env
    assert [q.bit_length() for q in params.qs] == [55, 45, 45, 55, 45, 45]
    assert [p.bit_length() for p in params.ps] == [55, 55]
    assert len(set(params.qps)) == len(params.qps)  # no collisions
    assert params.alpha == 2
    assert params.digit_slices(6) == ((0, 2), (2, 4), (4, 6))
    assert params.digit_slices(5) == ((0, 2), (2, 4), (4, 5))  # partial digit
    assert params.digit_slices(3) == ((0, 2), (2, 3))


def test_digit_factors_are_crt_basis(env):
    """P*B_d must be P mod primes of digit d and 0 mod the other q primes."""
    params, _, _ = env
    for d, (s, e) in enumerate(params.digit_slices(params.big_l)):
        f = params.digit_factor(d)
        for i, q in enumerate(params.qs):
            want = params.big_p % q if s <= i < e else 0
            assert f % q == want, (d, i)


def test_mul_rotate_conjugate_with_digits(env):
    params, sk, rng = env
    rlk = C.rlk_gen(params, sk, rng)
    rtk = C.rtk_gen(params, sk, 1, rng)
    cjk = C.cjk_gen(params, sk, rng)
    assert rlk.b.ndim == 3 and rlk.b.shape[0] == 3  # per-digit keys

    m0, m1 = _sample(params, rng), _sample(params, rng)
    ct0 = C.sk_encrypt(params, sk, C.encode(params, m0), params.qs, rng)
    ct1 = C.sk_encrypt(params, sk, C.encode(params, m1), params.qs, rng)

    ct_mul = C.mul(params, rlk, ct0, ct1)
    got = C.decode(params, C.decrypt(params, sk, ct_mul), ct_mul.qs)
    assert_bits(got, m0 * m1, 30)

    ct_rot = C.rotate(params, rtk, ct0)
    got = C.decode(params, C.decrypt(params, sk, ct_rot), ct_rot.qs)
    assert_bits(got, np.roll(m0, -1), 30)

    ct_conj = C.conjugate(params, cjk, ct0)
    got = C.decode(params, C.decrypt(params, sk, ct_conj), ct_conj.qs)
    assert_bits(got, np.conj(m0), 30)


def test_key_switch_at_partial_digit_levels(env):
    """Dropping to levels that cut a digit group partially must stay correct:
    the full-basis ksk digits serve every prefix basis (B_d = 1 mod active
    primes of group d, 0 mod the rest)."""
    params, sk, rng = env
    rtk = C.rtk_gen(params, sk, 1, rng)
    m = _sample(params, rng)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    for level in (5, 3, 2):  # 5 and 3 cut the alpha=2 groups mid-digit
        ct_l = C.to_level(ct, ct.qs[:level])
        out = C.rotate(params, rtk, ct_l)
        assert len(out.qs) == level
        got = C.decode(params, C.decrypt(params, sk, out), out.qs)
        assert_bits(got, np.roll(m, -1), 28)


def test_hoisted_rotations_match_rotate(env):
    params, sk, rng = env
    js = [1, 3, 7]
    rtks = C.rtk_gen_many(params, sk, js, rng)
    m = _sample(params, rng)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    outs = C.hoisted_rotations(
        params, tuple(rtks[j] for j in js), ct, tuple(js)
    )
    for j, out in zip(js, outs):
        # same keys, same math: hoisting only reorders the shared transform
        want = C.rotate(params, rtks[j], ct)
        np.testing.assert_array_equal(np.asarray(out.a), np.asarray(want.a))
        np.testing.assert_array_equal(np.asarray(out.b), np.asarray(want.b))


def test_default_params_unchanged():
    """No ladder/dnum -> exact legacy layout: 2-D ksk arrays and the same
    prime stream as the reference fixture."""
    rng = np.random.default_rng(7)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=4)
    legacy = C.CkksParams(log_n=5, log_qi=55, big_l=4, dnum=None)
    assert params.qs == legacy.qs and params.ps == legacy.ps
    assert params.num_digits == 1
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    assert rlk.b.ndim == 2  # reference single-digit layout preserved
    m = np.linspace(-1, 1, params.l) + 0j
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    out = C.mul(params, rlk, ct, ct)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    assert_bits(got, m * m, 30)
