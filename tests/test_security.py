"""Security-estimation subsystem (utils/security.py).

The reference has no security accounting (SURVEY.md §5); these tests pin the
HES-standard table rows and the conservative interpolation behavior."""

import math

from learn_fhe_tpu.utils import security as S


def test_table_rows_exact():
    # at a table row, log_q exactly at the bound meets the level
    assert S.estimate(4096, 109).level == 128
    assert S.estimate(4096, 75).level == 192
    assert S.estimate(4096, 58).level == 256
    assert S.estimate(32768, 881).level == 128


def test_over_bound_fails_level():
    e = S.estimate(4096, 110)
    assert e.level is None and e.security_bits < 128
    assert not e.meets(128)


def test_monotonic_in_log_q():
    bits = [S.estimate(8192, lq).security_bits for lq in (60, 118, 152, 218, 300)]
    assert all(a >= b for a, b in zip(bits, bits[1:])), bits


def test_monotonic_in_n():
    # same modulus, bigger ring -> at least as secure
    bits = [S.estimate(n, 100).security_bits for n in (2048, 4096, 8192, 16384)]
    assert all(b >= a for a, b in zip(bits, bits[1:])), bits


def test_interpolation_between_rows():
    # n=6144 sits between 4096 and 8192: admissible 128-bit modulus between
    # 109 and 218, and the estimate at log_q=160 should meet 128-bit
    assert S.estimate(6144, 160).meets(128)
    assert not S.estimate(6144, 170).meets(128)


def test_sparse_flag_is_honest():
    e = S.estimate(8192, 200, h=64)
    assert e.sparse_h == 64
    assert e.warning and "UPPER bound" in e.warning
    # sparse estimates never *certify* a target
    assert not e.meets(128)


def test_ckks_params_estimate():
    from learn_fhe_tpu.models.ckks import ckks as C

    # the repo's production mul shape: N=2^13, 8+8 55-bit primes -> QP ~ 880
    # bits at N=8192, way past the 218-bit 128-bit-security bound: the
    # estimator must say so (these are the reference's PEDAGOGICAL fixtures,
    # `ckks.rs:306`, not deployment parameters)
    params = C.CkksParams(log_n=13, log_qi=55, big_l=8)
    e = S.ckks_estimate(params)
    assert e.log_q > 800
    assert not e.meets(128)
    # a deployment-shaped instance: N=2^15 with ~16 x 55-bit primes IS fine
    ok = S.estimate(32768, 16 * 55)
    assert ok.meets(128)


def test_fhew_params_estimate():
    from learn_fhe_tpu.models.fhew.params import RlweParams
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(28, 10))
    p = RlweParams(q=q, p=4, log_n=9, log_b=7, d=4)
    e = S.rlwe_estimate(p)
    assert e.n == 512 and abs(e.log_q - math.log2(q)) < 1e-9
    # N=2^9 with a 28-bit modulus is a toy fixture; the linear-in-n
    # extrapolation below the first table row must flag it insecure
    assert not e.meets(128)


def test_lwe_estimate_smoke():
    assert S.lwe_estimate(1024, 27).meets(128)
    assert not S.lwe_estimate(1024, 54).meets(128)
