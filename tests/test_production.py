"""Production bootstrap configuration (models/ckks/production.py): the
secure+deep+fast deployment config the reference never defines.

Covers: the HES-certification of the N=2^16 flagship config, the
level-consumption simulator against a REAL bootstrap run, and a mini
end-to-end ladder bootstrap (prime-bit ladder + dnum key switching + dense
keys + user-band landing scale) at a CPU-friendly ring.
"""

import os

import numpy as np
import pytest
from fractions import Fraction

from learn_fhe_tpu.models.ckks import bootstrapping as B
from learn_fhe_tpu.models.ckks import ckks as C
from learn_fhe_tpu.models.ckks import evalmod as E
from learn_fhe_tpu.models.ckks.production import (
    ProductionConfig,
    eval_mod_levels,
    production_config,
    wrap_bound,
)


def test_flagship_config_is_certified():
    """The N=2^16 deployment config: inside the HES 128-bit bound with a
    dense (certifiable) key, >= 4 user levels, EvalMod band at 58 bits."""
    cfg = production_config(log_n=16)
    s = cfg.summary()
    assert s["meets_128"] and s["security_bits"] >= 128
    assert s["user_levels"] >= 4
    assert s["log_qp"] <= 1762  # the standard's N=2^16 row (extrapolated)
    assert cfg.params.dnum > 1 and cfg.params.num_digits == cfg.params.dnum
    # ladder places the EvalMod band primes exactly under the CtS band
    lad = cfg.ladder
    n_t = cfg.n_transform
    assert set(lad[-n_t:]) == {cfg.log_mid}
    assert set(lad[-n_t - s["eval_mod_levels"] : -n_t]) == {cfg.log_em}


def test_wrap_bound_dense():
    # dense zo(0.5) at N=2^16: h_eff = 32768 -> K = 6*sqrt(h/12) ~ 314
    assert wrap_bound(32768) == 314
    assert wrap_bound(64) == 14


@pytest.fixture(scope="module")
def mini():
    """A CPU-sized production-style config: same machinery (ladder, dnum,
    dense key, user-band landing), tiny ring. Knobs are PINNED to the r04
    values: tiny rings are a different precision regime (ARCHITECTURE
    §20/§22 — the arcsin model floor binds, not the noise wall), and the
    r05 flagship knobs (user52/gap3/em56) measured 18.0 bits here while
    GAINING ~6 bits at the production family rings. This fixture tests the
    machinery; the flagship knobs are validated by the N=2^10/2^12 retuned
    probes and the N=2^16 heavy run."""
    cfg = ProductionConfig(
        log_n=6, user_levels=2, chunk_r=5, log_q0=45, log_em=58, log_user=40
    )
    rng = np.random.default_rng(77)
    params = cfg.params
    sk = C.sk_gen(params, rng)  # DENSE ternary (the certifiable key)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bk = B.key_gen(cfg.bootstrap_params, sk, rng)
    return cfg, params, sk, rlk, cjk, bk, rng


@pytest.mark.slow
def test_mini_ladder_bootstrap_end_to_end(mini):
    """Full bootstrap on the ladder: an exhausted user-band ciphertext comes
    back at 1 + user_levels limbs, lands exactly on the user scale, and the
    level simulator's consumption prediction matches reality."""
    cfg, params, sk, rlk, cjk, bk, rng = mini
    S_user = Fraction(1 << cfg.log_user)

    # amplitude ~1: the ladder's q0/user gap (c = 2^5) gives the slot
    # headroom uniform configs lack (their c ~ 1 forces tiny messages);
    # EvalMod's error is ABSOLUTE (~ c*(K+1) * poly error), so this is
    # also where the relative-precision spec is meaningful.
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.3
    pt = C.encode(params, m, (params.qs[0],), scale_int=int(S_user))
    low = C.sk_encrypt(params, sk, pt, (params.qs[0],), rng)

    out = E.bootstrap(params, bk, rlk, cjk, low, cfg.em, S_in=S_user, S_out=S_user)

    # level accounting: simulator == reality
    consumed = len(params.qs) - len(out.qs)
    predicted = 2 * cfg.n_transform + eval_mod_levels(cfg.em, cfg.baby)
    assert consumed == predicted, (consumed, predicted)
    assert len(out.qs) == 1 + cfg.user_levels

    got = C.decode(params, C.decrypt(params, sk, out), out.qs, scale_int=int(S_user))
    rel_bits = -np.log2(np.max(np.abs(got - m)) / np.max(np.abs(m)))
    print(f"mini ladder bootstrap: {len(out.qs)} levels left, {rel_bits:.1f} bits")
    assert rel_bits > 20.0, rel_bits


@pytest.mark.slow
def test_mini_ladder_user_levels_usable(mini):
    """The levels the bootstrap leaves are genuinely usable: two ct x ct
    muls on the user band after a bootstrap, decoded against the exact
    host product with exact Fraction scale tracking."""
    cfg, params, sk, rlk, cjk, bk, rng = mini
    S_user = Fraction(1 << cfg.log_user)

    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.25
    pt = C.encode(params, m, (params.qs[0],), scale_int=int(S_user))
    low = C.sk_encrypt(params, sk, pt, (params.qs[0],), rng)
    ct = E.bootstrap(params, bk, rlk, cjk, low, cfg.em, S_in=S_user, S_out=S_user)

    S = S_user
    want = m.copy()
    for _ in range(cfg.user_levels // 2 * 2 // 2):  # user_levels=2 -> 1 mul
        S = S * S / ct.qs[-1]
        ct = C.mul(params, rlk, ct, ct)
        want = want * want
    # square once more only if a level remains above q0
    while len(ct.qs) >= 2:
        S = S * S / ct.qs[-1]
        ct = C.mul(params, rlk, ct, ct)
        want = want * want
    raw = C.decode(params, C.decrypt(params, sk, ct), ct.qs, scale_int=1)
    got = np.asarray(raw) / float(S)
    err = np.max(np.abs(got - want))
    rel_bits = -np.log2(err / max(np.max(np.abs(want)), 1e-30))
    print(f"post-bootstrap muls: exhausted to {len(ct.qs)} limbs, {rel_bits:.1f} bits")
    assert len(ct.qs) == 1  # burned every user level, ended exactly at q0
    assert rel_bits > 12.0, rel_bits


@pytest.mark.skipif(
    not os.environ.get("FHE_TPU_HEAVY"),
    reason="hours-scale: the full certified N=2^16 bootstrap (set FHE_TPU_HEAVY=1; "
    "bench/production_bootstrap_probe.py is the same path with progress marks)",
)
def test_flagship_bootstrap_end_to_end():
    """The flagship heavy run: N=2^16 @ 128-bit HES (dense keys),
    bootstrap -> >=20 bits relative precision with 1+4 levels left -> 4
    user squarings still decode. The config is HES-certified on paper; this
    test is what makes the precision claim TRUE (the N=2^13 scaled probe of
    2026-08-20 FAILED at 17.9 bits before the round-5 retune — ARCHITECTURE
    §20). ~19GB of keys (intrinsic to certified-dense bootstrapping) means
    host-RAM execution on this box; the multi-chip sharded path is validated
    by dryrun_multichip."""
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(__file__), "..", "bench", "production_bootstrap_probe.py"
            ),
            "--log-n",
            "16",
            "--user-levels",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=8 * 3600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PRODUCTION FLAGSHIP PASS" in r.stdout, r.stdout[-2000:]
