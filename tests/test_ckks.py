"""CKKS: round-trips, homomorphic ops, linear transforms.

Mirrors the reference test strategy (`ckks.rs:296-416`,
`ckks/bootstrapping.rs:121-141`): approximate-equality with explicit
bit-precision budgets -- 40 bits after enc/dec and rotations, 32 after deep
mul chains, 30 after homomorphic FFT.
"""

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import bootstrapping as B
from learn_fhe_tpu.models.ckks import ckks as C
from learn_fhe_tpu.models.ckks.sfft import sfft, sifft, sfft_fmats
from learn_fhe_tpu.ops.ntt import bit_reverse_indices
from learn_fhe_tpu.utils.dd import DDC
from learn_fhe_tpu.utils.matrix import mat_product, mat_to_dense


def assert_bits(a, b, bits):
    d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    got = 200 if d == 0 else -np.log2(d)
    assert got > bits, f"precision {got:.1f} < {bits}"


def test_sfft_roundtrip_and_evaluation(rng):
    """`sfft.rs:110-121`: sifft then sfft is identity; coefficients evaluate
    to the slot values at zeta^{5^j}."""
    from learn_fhe_tpu.models.ckks.sfft import w_dd

    for log_l in (1, 3, 6):
        l = 1 << log_l
        m = rng.random(l) + 1j * rng.random(l)
        coeffs = sifft(DDC.from_complex(m))
        assert_bits(sfft(coeffs).to_complex128(), m, 80)
        w = w_dd(l).to_complex128()
        c = coeffs.to_complex128()
        for j in (0, l // 2 - 1):
            val = sum(c[i] * w[j] ** i for i in range(l))
            assert abs(val - m[j]) < 1e-8


def test_sfft_mat_factorization(rng):
    """`sfft.rs:124-133`: the first l/2 rows of the factor product equal the
    bit-reversed power rows of the pow-5 twiddles (the reference's izip stops
    at the shorter rhs)."""
    from learn_fhe_tpu.models.ckks.sfft import w_dd

    for log_l in (1, 2, 4):
        l = 1 << log_l
        dense = mat_to_dense(mat_product(sfft_fmats(l), l), l)
        w = w_dd(l).to_complex128()
        rev = bit_reverse_indices(l)
        for r, t in enumerate(w):
            row = np.array([t**k for k in range(l)])[rev]
            assert_bits(dense[r], row, 45)  # oracle is f64 powers


@pytest.fixture(scope="module")
def ckks_env():
    rng = np.random.default_rng(9)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=8)
    sk = C.sk_gen(params, rng)
    pk = C.pk_gen(params, sk, rng)
    return params, sk, pk, rng


def _sample(params, rng):
    return rng.random(params.l) + 1j * rng.random(params.l)


def test_encrypt_decrypt(ckks_env):
    params, sk, pk, rng = ckks_env
    m = _sample(params, rng)
    pt = C.encode(params, m)
    for ct in (
        C.sk_encrypt(params, sk, pt, params.qs, rng),
        C.pk_encrypt(params, pk, pt, rng),
    ):
        got = C.decode(params, C.decrypt(params, sk, ct), ct.qs)
        assert_bits(m, got, 40)


def test_add_sub(ckks_env):
    params, sk, pk, rng = ckks_env
    m0, m1 = _sample(params, rng), _sample(params, rng)
    ct0 = C.pk_encrypt(params, pk, C.encode(params, m0), rng)
    ct1 = C.pk_encrypt(params, pk, C.encode(params, m1), rng)
    assert_bits(m0 + m1, C.decode(params, C.decrypt(params, sk, C.add(ct0, ct1)), params.qs), 40)
    assert_bits(m0 - m1, C.decode(params, C.decrypt(params, sk, C.sub(ct0, ct1)), params.qs), 40)


def test_mul_chain(ckks_env):
    """`ckks.rs:359-377`: big_l - 1 = 7 deep multiplication chain, 32 bits."""
    params, sk, pk, rng = ckks_env
    rlk = C.rlk_gen(params, sk, rng)
    ms = [_sample(params, rng) for _ in range(params.big_l - 1)]
    cts = [C.pk_encrypt(params, pk, C.encode(params, m), rng) for m in ms]
    acc_m, acc = ms[0], cts[0]
    for m, ct in zip(ms[1:], cts[1:]):
        acc = C.mul(params, rlk, acc, ct)
        acc_m = acc_m * m
    assert_bits(acc_m, C.decode(params, C.decrypt(params, sk, acc), acc.qs), 32)


def test_mul_constant_chain(ckks_env):
    params, sk, pk, rng = ckks_env
    ms = [_sample(params, rng) for _ in range(params.big_l - 1)]
    ct = C.pk_encrypt(params, pk, C.encode(params, ms[0]), rng)
    acc_m = ms[0]
    for m in ms[1:]:
        ct = C.mul_constant(params, m, ct)
        acc_m = acc_m * m
    assert_bits(acc_m, C.decode(params, C.decrypt(params, sk, ct), ct.qs), 32)


def test_add_constant(ckks_env):
    """ct + encode(m): no level consumed, and correct both at the top level
    and mid-chain (after a mul_constant rescale)."""
    params, sk, pk, rng = ckks_env
    m0, m1, m2 = (_sample(params, rng) for _ in range(3))
    ct = C.pk_encrypt(params, pk, C.encode(params, m0), rng)
    out = C.add_constant(params, m1, ct)
    assert out.qs == ct.qs
    assert_bits(m0 + m1, C.decode(params, C.decrypt(params, sk, out), out.qs), 40)
    mid = C.mul_constant(params, m2, ct)  # one rescale down
    out = C.add_constant(params, m1, mid)
    assert_bits(
        m0 * m2 + m1, C.decode(params, C.decrypt(params, sk, out), out.qs), 36
    )


def test_rotate_conjugate(ckks_env):
    params, sk, pk, rng = ckks_env
    m = _sample(params, rng)
    ct = C.pk_encrypt(params, pk, C.encode(params, m), rng)
    cjk = C.cjk_gen(params, sk, rng)
    assert_bits(
        np.conj(m), C.decode(params, C.decrypt(params, sk, C.conjugate(params, cjk, ct)), params.qs), 40
    )
    for j in (1, 5, params.l - 1):
        rtk = C.rtk_gen(params, sk, j, rng)
        got = C.decode(params, C.decrypt(params, sk, C.rotate(params, rtk, ct)), params.qs)
        assert_bits(np.roll(m, -j), got, 40)


def test_hoisted_rotations(ckks_env):
    """Hoisted multi-rotation (one shared extension+NTT, eval-basis slot
    permutation per index) is bit-identical to the per-rotation key_switch
    chain and decrypts to the rolled slots."""
    params, sk, pk, rng = ckks_env
    m = _sample(params, rng)
    ct = C.pk_encrypt(params, pk, C.encode(params, m), rng)
    js = (1, 5, params.l - 1)
    rtks = tuple(C.rtk_gen(params, sk, j, rng) for j in js)
    outs = C.hoisted_rotations(params, rtks, ct, js)
    for j, rtk, out in zip(js, rtks, outs):
        ref = C.rotate(params, rtk, ct)
        assert (np.asarray(out.b) == np.asarray(ref.b)).all()
        assert (np.asarray(out.a) == np.asarray(ref.a)).all()
        got = C.decode(params, C.decrypt(params, sk, out), out.qs)
        assert_bits(np.roll(m, -j), got, 40)


def test_homomorphic_sfft(ckks_env):
    """`ckks/bootstrapping.rs:121-141`: slot_to_coeff then coeff_to_slot,
    30-bit budget."""
    params, sk, pk, rng = ckks_env
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    rev = bit_reverse_indices(params.l)
    m0 = _sample(params, rng)
    m1 = sfft(DDC.from_complex(m0[rev])).to_complex128()
    ct0 = C.pk_encrypt(params, pk, C.encode(params, m0), rng)
    ct1 = B.slot_to_coeff(bk, ct0)
    assert_bits(m1, C.decode(params, C.decrypt(params, sk, ct1), ct1.qs), 30)
    ct2 = B.coeff_to_slot(bk, ct1)
    m2 = sifft(DDC.from_complex(m1)).to_complex128()[rev]
    assert_bits(m2, C.decode(params, C.decrypt(params, sk, ct2), ct2.qs), 30)


def test_homomorphic_horner(rng):
    """Evaluate p(x) = 1 + 2x + x^2 homomorphically via the generic horner
    helper (the reference exercises horner/powers over ciphertexts in its
    CKKS tests; `util/src/misc.rs:19-27`)."""
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.utils.misc import horner, powers

    params = C.CkksParams(log_n=5, log_qi=45, big_l=5)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.5
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)

    coeffs = [1.0, 2.0, 1.0]
    out = horner(
        coeffs,
        ct,
        mul=lambda x, acc: C.mul(params, rlk, x, acc) if isinstance(acc, C.CkksCiphertext) else C.mul_constant(params, np.full(params.l, acc), x),
        add=lambda acc, c: C.add(acc, C.sk_encrypt(params, sk, C.encode(params, np.full(params.l, complex(c)), acc.qs), acc.qs, rng)) if not isinstance(c, C.CkksCiphertext) else C.add(acc, c),
    )
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    want = 1 + 2 * m + m * m
    assert np.max(np.abs(got - want)) < 1e-6

    # powers stream: ct, ct^2, ct^3 decrypt to m, m^2, m^3
    from itertools import islice

    pws = list(islice(powers(ct, lambda a, b: C.mul(params, rlk, a, b)), 3))
    for k, p in enumerate(pws, start=1):
        gotk = C.decode(params, C.decrypt(params, sk, p), p.qs)
        assert np.max(np.abs(gotk - m**k)) < 1e-5, k


def test_rtk_gen_many(ckks_env):
    """Batched rotation-key generation (one jitted dispatch for all BSGS
    keys) produces keys that rotate correctly."""
    params, sk, pk, rng = ckks_env
    m = _sample(params, rng)
    ct = C.pk_encrypt(params, pk, C.encode(params, m), rng)
    rtks = C.rtk_gen_many(params, sk, [1, 3, 7], rng)
    for j, rtk in rtks.items():
        got = C.decode(params, C.decrypt(params, sk, C.rotate(params, rtk, ct)), params.qs)
        assert_bits(np.roll(m, -j), got, 40)
