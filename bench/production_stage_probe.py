"""Per-stage precision attribution of the PRODUCTION ladder bootstrap
(production.py: prime-bit ladder + dnum + dense keys + user-band landing) —
the ladder sibling of bench/bootstrap_stage_probe.py, built to find where
the flagship's bits go (ARCHITECTURE §20: the N=2^13 probe FAILED at 17.9
bits and no stage attribution existed at the ladder config).

Each stage's OWN error is measured against an exact host oracle applied to
the stage's decrypted input. Scales differ per stage on the ladder:
CtS preserves S_user; EvalMod lands on S_user by construction.

Usage: python bench/production_stage_probe.py [--log-n 12] [--amp 0.3]
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


def bits(err, ref):
    return -np.log2(max(float(err), 1e-300) / ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=12)
    ap.add_argument("--amp", type=float, default=0.3)
    ap.add_argument("--user-levels", type=int, default=2)
    ap.add_argument("--log-q0", type=int, default=None)
    ap.add_argument("--log-em", type=int, default=None)
    ap.add_argument("--log-user", type=int, default=None)
    # the approximation-floor lever (ARCHITECTURE §22 addendum): at em>=60
    # EvalMod sits on the degree-30 arcsin Chebyshev truncation floor, so
    # the remaining knob is the interpolation degree itself
    ap.add_argument("--cheb-degree", type=int, default=None)
    args = ap.parse_args()
    kw = {}
    for name in ("log_q0", "log_em", "log_user", "cheb_degree"):
        v = getattr(args, name)
        if v is not None:
            kw[name] = v

    import learn_fhe_tpu.models.ckks.bootstrapping as B
    import learn_fhe_tpu.models.ckks.ckks as C
    import learn_fhe_tpu.models.ckks.evalmod as E
    from learn_fhe_tpu.models.ckks.production import ProductionConfig
    from learn_fhe_tpu.models.ckks.sfft import sfft, sifft
    from learn_fhe_tpu.ops.ntt import bit_reverse_indices
    from learn_fhe_tpu.utils.dd import DDC

    cfg = ProductionConfig(
        log_n=args.log_n, user_levels=args.user_levels, chunk_r=5, **kw
    )
    params = cfg.params
    em = cfg.em
    print(f"config: {cfg.summary()}", flush=True)
    rng = np.random.default_rng(2026)
    t0 = time.time()
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bk = B.key_gen(cfg.bootstrap_params, sk, rng)
    print(f"keygen: {time.time()-t0:.0f}s", flush=True)

    S_user = Fraction(1 << cfg.log_user)
    m = (
        rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ) * args.amp
    pt = C.encode(params, m, (params.qs[0],), scale_int=int(S_user))
    low = C.sk_encrypt(params, sk, pt, (params.qs[0],), rng)
    rev = bit_reverse_indices(params.l)
    q0 = low.qs[0]
    c = float(q0 / S_user)

    def dec(ct_):
        return C.decode(
            params, C.decrypt(params, sk, ct_), ct_.qs, scale_int=int(S_user)
        )

    rec = {"log_n": args.log_n, "amp": args.amp, **{k: getattr(cfg, k) for k in ("log_q0", "log_em", "log_user")}}

    # stage 0: fresh encrypt noise floor (before any homomorphic op)
    v_low = dec(low)
    e0 = np.max(np.abs(v_low - m))
    print(f"fresh-enc floor: {e0:.2e} -> {bits(e0, np.max(np.abs(m))):.1f} bits vs |m|max", flush=True)
    rec["fresh_bits"] = round(bits(e0, np.max(np.abs(m))), 2)

    raised = E.mod_raise(params, low)
    t0 = time.time()
    slots = B.coeff_to_slot(bk, raised)
    v_cts = dec(slots)
    # CtS oracle must INCLUDE the mod-raise wraps (the I*q0 terms EvalMod
    # later removes): compare against sifft of the RAISED ciphertext's
    # slot values, not the low ciphertext's — against the latter the wraps
    # (magnitude ~K*q0/S_user) swamp the transform's own error and the row
    # reads ~-14 "bits" on a pipeline whose end-to-end is 24+.
    v_raised = dec(raised)
    want_cts = sifft(DDC.from_complex(v_raised)).to_complex128()[rev]
    ref = np.max(np.abs(want_cts))
    e2 = np.max(np.abs(v_cts - want_cts))
    # CtS own-error relative to the MESSAGE amplitude in slot units: the
    # coefficient-domain error spreads back by ~sqrt(l) in StC, so quote both
    print(
        f"CoeffToSlot ({time.time()-t0:.0f}s): own err {e2:.2e} -> "
        f"{bits(e2, ref):.1f} bits vs its input mag {ref:.2e}",
        flush=True,
    )
    rec["cts_bits_vs_input"] = round(bits(e2, ref), 2)

    t0 = time.time()
    cleaned = E.eval_mod(
        params, rlk, cjk, slots, em, c, S_in=S_user, S_out=S_user
    )
    v_em = dec(cleaned)

    def host_model(x):
        s = x / (c * (em.k + 1))
        u = E.cheb_eval_host(em.cheb_coeffs, s)
        for _ in range(em.r):
            u = 2 * u * u - 1
        A = c / (2 * np.pi)
        return u * (A + (A / 6.0) * u * u) if em.arcsin else u * A

    want_em = host_model(np.real(v_cts)) + 1j * host_model(np.imag(v_cts))
    e3 = np.max(np.abs(v_em - want_em))
    # vs the coefficient amplitude (what EvalMod actually sees)
    coef_amp = np.max(np.abs(want_em))
    print(
        f"EvalMod ({time.time()-t0:.0f}s): own err {e3:.2e} -> "
        f"{bits(e3, coef_amp):.1f} bits vs coef amp {coef_amp:.2e} "
        f"(model floor {np.max(np.abs(want_em - sifft(DDC.from_complex(v_low)).to_complex128()[rev])):.2e})",
        flush=True,
    )
    rec["evalmod_bits_vs_coef"] = round(bits(e3, coef_amp), 2)
    rec["evalmod_abs"] = float(e3)

    t0 = time.time()
    out = B.slot_to_coeff(bk, cleaned)
    v_out = dec(out)
    want_out = sfft(DDC.from_complex(v_em[rev])).to_complex128()
    e4 = np.max(np.abs(v_out - want_out))
    print(
        f"SlotToCoeff ({time.time()-t0:.0f}s): own err {e4:.2e} -> "
        f"{bits(e4, np.max(np.abs(want_out))):.1f} bits vs its input mag",
        flush=True,
    )
    rec["stc_bits_vs_input"] = round(bits(e4, np.max(np.abs(want_out))), 2)

    ee = np.max(np.abs(v_out - m))
    rec["end_to_end_bits"] = round(bits(ee, np.max(np.abs(m))), 2)
    # upstream stage errors propagated to the end (sqrt(l) spread for the
    # coefficient-domain EvalMod error):
    print(
        f"END-TO-END: {rec['end_to_end_bits']} bits "
        f"(EvalMod err x sqrt(l) = {e3 * np.sqrt(params.l):.2e} vs measured {ee:.2e})",
        flush=True,
    )
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
