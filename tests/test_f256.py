"""256-bit fixed-point encode backend (utils/f256.py) vs the double-double
default — the capability the reference gets from F256 (`util/src/complex/
f256.rs`): encode/decode precision far beyond double precision.

Mirrors the reference's precision-budget test style (`f256.rs:291-327`
assert_eq_float with 2^-precision tolerances)."""

from __future__ import annotations

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import sfft as sfft_mod
from learn_fhe_tpu.models.ckks.sfft import sfft, sifft
from learn_fhe_tpu.utils.dd import DDC
from learn_fhe_tpu.utils.f256 import F_BITS, FPC, _vec_f2fp


def _fp_from_dd(z: DDC) -> FPC:
    """Exact lift of a double-double vector into the 256-bit backend."""
    return FPC(
        _vec_f2fp(z.re_h) + _vec_f2fp(z.re_l), _vec_f2fp(z.im_h) + _vec_f2fp(z.im_l)
    )


def test_fpc_arithmetic_matches_complex128():
    rng = np.random.default_rng(0)
    a = rng.normal(size=16) + 1j * rng.normal(size=16)
    b = rng.normal(size=16) + 1j * rng.normal(size=16)
    fa, fb = FPC.from_complex(a), FPC.from_complex(b)
    for got, want in [
        ((fa + fb).to_complex128(), a + b),
        ((fa - fb).to_complex128(), a - b),
        ((fa * fb).to_complex128(), a * b),
        (fa.conj().to_complex128(), a.conj()),
        (fa.scale_pow2(-3).to_complex128(), a / 8),
    ]:
        assert np.max(np.abs(got - want)) < 1e-13


def test_fpc_exact_embed_roundtrip():
    vals = [0, 1, -1, (1 << 200) + 12345, -(1 << 180) - 7]
    z = FPC.from_ints(vals, [0] * len(vals))
    re, im = z.round_to_ints()
    assert re == vals and im == [0] * len(vals)


@pytest.mark.parametrize("log_n", [1, 3, 5, 7])
def test_sfft_sifft_identity_256bit(log_n):
    """sfft(sifft(z)) == z to ~250 bits — double-double cannot get past ~106."""
    n = 1 << log_n
    rng = np.random.default_rng(log_n)
    z = FPC.from_complex(rng.normal(size=n) + 1j * rng.normal(size=n))
    back = sfft(sifft(z))
    assert z.max_error_bits(back) <= -(F_BITS - 16)


def test_sfft_f256_agrees_with_dd_to_dd_precision():
    n = 64
    rng = np.random.default_rng(7)
    m = rng.normal(size=n) + 1j * rng.normal(size=n)
    out_dd = _fp_from_dd(sfft(DDC.from_complex(m)))
    out_fp = sfft(FPC.from_complex(m))
    # dd carries ~106 significand bits; values are O(sqrt n)
    assert out_fp.max_error_bits(out_dd) <= -95


def _pipeline(cls, m, scale_bits: int):
    """sifft -> x 2^scale -> round-to-int -> / 2^scale -> sfft (the encode/
    decode pipeline of `ckks.rs:186-213` without the RNS hop)."""
    z = cls.from_complex(m)
    c = sifft(z).mul_int(1 << scale_bits)
    re, im = c.round_to_ints()
    return sfft(cls.from_ints(re, im).div_int(1 << scale_bits))


def test_encode_pipeline_precision_beyond_dd():
    """At a 200-bit scale the f256 backend round-trips to ~196 bits while
    double-double floors at its ~106-bit significand — the capability gap
    F256 exists for."""
    n = 32
    rng = np.random.default_rng(11)
    m = rng.normal(size=n) + 1j * rng.normal(size=n)
    exact = FPC.from_complex(m)

    fp_bits = -exact.max_error_bits(_pipeline(FPC, m, 200))
    assert fp_bits >= 190

    dd_out = _pipeline(DDC, m, 200)
    dd_bits = -exact.max_error_bits(_fp_from_dd(dd_out))
    assert dd_bits <= 120  # dd floors near its significand width
    assert fp_bits > dd_bits + 60


def test_ckks_encode_f256_matches_dd_at_reference_scale():
    """At the reference's 55-bit scale both backends produce the same RNS
    plaintext (dd's 106 bits leave ~50 bits of headroom below the integer
    grid), so "f256" is a drop-in."""
    from learn_fhe_tpu.models.ckks import ckks

    params = ckks.CkksParams(log_n=5, log_qi=55, big_l=3)
    rng = np.random.default_rng(3)
    m = rng.normal(size=params.l) + 1j * rng.normal(size=params.l)
    pt_dd = np.asarray(ckks.encode(params, m))
    pt_fp = np.asarray(ckks.encode(params, m, precision="f256"))
    assert (pt_dd == pt_fp).all()
    # and the f256 decode agrees with the dd decode to f64 resolution
    out_fp = ckks.decode(params, pt_fp, params.qs, precision="f256")
    out_dd = ckks.decode(params, pt_dd, params.qs)
    assert np.max(np.abs(out_fp.to_complex128() - out_dd)) < 1e-12
