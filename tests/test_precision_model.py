"""The empirical precision model (models/ckks/precision.py) — VERDICT r04
item 1(a): the model must validate within ~1 bit against every measured
calibration run before any config is trusted, and its knob responses must
match the committed sweep measurements (ARCHITECTURE §20/§22)."""

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import precision as P


def test_family_fit_validates():
    m = P.fit()
    assert m.validated(), m.residuals()
    for name, d in m.residuals():
        assert abs(d) <= P.VALIDATION_TOL, (name, d)


def test_family_slope_matches_measurement():
    # the measured 2^10..2^13 user40 family loses ~1.7 bits per log_n step
    m = P.fit()
    assert 1.3 <= m.s_ring <= 2.1, m.s_ring


def test_r_family_matches_production_derivation():
    # production.py: K = 6*sqrt(h/12), r = ceil(log2((K+1)/2))
    assert P.r_family(10) == 5
    assert P.r_family(12) == 6
    assert P.r_family(13) == 6
    assert P.r_family(16) == 8


def test_knob_responses_match_sweep():
    m = P.fit()
    base = m.predict(10)
    # user52 relief: +6.09 measured at the N=2^10 sweep
    up = m.predict(10, log_q0=57, log_user=52) - base
    assert abs(up - P.SWEEP_DELTAS["user52"]) < 0.2, up
    # em60 LOSES (measured -3.66): bigger EvalMod primes raise the wall
    down = m.predict(10, log_em=60) - base
    assert down < -2.0, down
    # ...but the response is a kink: em56 is nearly flat (measured +0.31)
    dn = m.predict(10, log_em=56) - base
    assert abs(dn - P.SWEEP_DELTAS["em56"]) < 0.1, dn
    # gap bits are ~1:1 precision (production.py mini measurement)
    g = m.predict(10, log_q0=43) - base
    assert 1.0 <= g <= 3.0, g


def test_prediction_refuses_nothing_but_predicts_family():
    m = P.fit()
    for log_n, r, _k, em, gap, lu, bits in P.FAMILY_RUNS:
        pred = m.predict(log_n, r=r, log_em=em, log_q0=lu + gap, log_user=lu)
        assert abs(pred - bits) <= P.VALIDATION_TOL, (log_n, pred, bits)


def test_extra_double_angles_cost_bits():
    m = P.fit()
    assert m.predict(10, r=P.r_family(10) + 1) < m.predict(10)


def test_retuned_family_records_the_two_regimes():
    # the retuned (user52+gap3+em56) family is MEASURED at 10/12/14/16;
    # flat (0.5/step) below 2^12 where the landing noise binds, steep
    # (2.1-2.35/step) above where EvalMod's 4^r-amplified rescale noise
    # takes over (ARCHITECTURE §22). The model refuses to extrapolate.
    assert P.retuned_bits(10) == 25.6
    assert P.retuned_bits(16) == 15.7
    flat = (P.retuned_bits(10) - P.retuned_bits(12)) / 2
    steep = (P.retuned_bits(14) - P.retuned_bits(16)) / 2
    assert flat < 1.0 < steep, (flat, steep)
    with pytest.raises(ValueError):
        P.retuned_bits(17)
    # em response in the EvalMod-bound regime: ~+0.95/bit (measured 2^14)
    assert abs(P.em_gain_evalmod_regime(2.0) - 1.94) < 0.2
    # and the retuned family still sits ABOVE the base model where the
    # landing relief holds (the relief shrinks at large rings)
    m = P.fit()
    for log_n, bits in P.RETUNED_RUNS[:3]:
        assert bits > m.predict(log_n), (log_n, bits)
