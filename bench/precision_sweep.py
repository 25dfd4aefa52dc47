"""Empirical knob-sensitivity sweep for the production bootstrap precision
model (ARCHITECTURE §20): run the REAL ladder bootstrap at a small ring over
one-knob-at-a-time variants of the production config and record the measured
relative precision. The results calibrate models/ckks/precision.py.

Usage: python bench/precision_sweep.py [--log-n 6] [--amp 0.3] [--variants a,b,...]
Prints one JSON line per variant; full sweep ~15 min at N=2^6 on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FHE_TPU_PROBE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_variant(name: str, log_n: int, amp: float, seed: int, **kw) -> dict:
    from learn_fhe_tpu.models.ckks import bootstrapping as B
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.models.ckks import evalmod as E
    from learn_fhe_tpu.models.ckks.production import ProductionConfig, eval_mod_levels

    # the sweep's base is pinned to the r04 knobs the committed calibration
    # data (precision.py SWEEP_RUNS) was measured against — NOT the current
    # production defaults (which the r05 retune moved to the user52 side)
    cfg = ProductionConfig(
        log_n=log_n, user_levels=2, chunk_r=5, **{**LEGACY_BASE, **kw}
    )
    params = cfg.params
    rng = np.random.default_rng(seed)
    t0 = time.time()
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bk = B.key_gen(cfg.bootstrap_params, sk, rng)
    keygen_s = time.time() - t0

    S_user = Fraction(1 << cfg.log_user)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * amp
    pt = C.encode(params, m, (params.qs[0],), scale_int=int(S_user))
    low = C.sk_encrypt(params, sk, pt, (params.qs[0],), rng)

    t0 = time.time()
    out = E.bootstrap(params, bk, rlk, cjk, low, cfg.em, S_in=S_user, S_out=S_user)
    boot_s = time.time() - t0
    got = C.decode(params, C.decrypt(params, sk, out), out.qs, scale_int=int(S_user))
    rel = -np.log2(np.max(np.abs(got - m)) / np.max(np.abs(m)))
    rec = {
        "variant": name,
        "log_n": log_n,
        "amp": amp,
        "seed": seed,
        "k": cfg.em.k,
        "r": cfg.em.r,
        "degree": cfg.em.degree,
        "log_em": cfg.log_em,
        "log_q0": cfg.log_q0,
        "log_user": cfg.log_user,
        "h": cfg.h,
        "eval_mod_levels": eval_mod_levels(cfg.em, cfg.baby),
        "levels_left": len(out.qs),
        "bits": round(float(rel), 2),
        "keygen_s": round(keygen_s, 1),
        "bootstrap_s": round(boot_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


LEGACY_BASE = {"log_q0": 45, "log_em": 58, "log_user": 40}

VARIANTS = {
    "base": {},
    "em60": {"log_em": 60},
    "em56": {"log_em": 56},
    "em54": {"log_em": 54},
    "em52": {"log_em": 52},
    "gap3": {"log_q0": 43},
    "gap7": {"log_q0": 47},
    # combined candidates for the flagship retune (ARCHITECTURE §22)
    "user52em56": {"log_user": 52, "log_q0": 57, "log_em": 56},
    "user52em54": {"log_user": 52, "log_q0": 57, "log_em": 54},
    "user52em54gap3": {"log_user": 52, "log_q0": 55, "log_em": 54},
    "r+1": {"force_r": None},  # filled per-ring below
    "r+2": {"force_r": None},
    "deg60": {"cheb_degree": 60},
    "h8": {"dense_h": 8},
    "k2x": {"force_k": None},  # 2x the derived K at same r (filled below)
    # user band raised to the mid band (gap unchanged): if the noise wall is
    # the key-switch/rescale ops running at the LOW user scale (conjugation,
    # final landing, StC rotations), this gains ~12 bits; if the wall lives
    # in the 58-bit EvalMod chain, it gains nothing.
    "user52": {"log_user": 52, "log_q0": 57},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=6)
    ap.add_argument("--amp", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    from learn_fhe_tpu.models.ckks.production import ProductionConfig

    base = ProductionConfig(
        log_n=args.log_n, user_levels=2, chunk_r=5, **LEGACY_BASE
    )
    r0, k0 = base.em.r, base.em.k
    VARIANTS["r+1"] = {"force_r": r0 + 1}
    VARIANTS["r+2"] = {"force_r": r0 + 2}
    # K doubled / halved at PINNED r: isolates K's direct effect (the band
    # changes to ~2x / ~0.5x periods — still interpolable at degree 30; the
    # host model floor stays far above the noise wall at these rings)
    VARIANTS["k2x"] = {"force_k": 2 * k0, "force_r": r0}
    VARIANTS["khalf"] = {"force_k": max(4, k0 // 2), "force_r": r0}

    names = [v for v in args.variants.split(",") if v] or list(VARIANTS)
    for name in names:
        try:
            run_variant(name, args.log_n, args.amp, args.seed, **VARIANTS[name])
        except Exception as e:  # keep sweeping; record the failure
            print(json.dumps({"variant": name, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
