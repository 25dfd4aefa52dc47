"""Per-stage precision breakdown of the full CKKS bootstrap.

Isolates each stage's OWN error by comparing its decrypted output against an
exact host oracle (DD precision) applied to the decrypted input of the same
stage, so a stage does not inherit upstream error:

    mod_raise -> CoeffToSlot -> EvalMod -> SlotToCoeff

Oracle maps (the conventions `tests/test_ckks_large.py` pins):
    StC(v) = sfft(v[rev]);  CtS(v) = sifft(v)[rev]
    EvalMod(v) = model(Re v) + i model(Im v), the host Chebyshev+doubling
    (+ optional arcsin) chain from `models/ckks/evalmod.py`.

The CtS output carries the deterministic rescale-drift scale history that
EvalMod's first constant multiply corrects; the probe decodes it at the
TRUE scale (`_cts_scale`) so the drift is not misattributed as CtS error.

Run (CPU): python bench/bootstrap_stage_probe.py --cpu [--log-n 5]
Run (TPU): python bench/bootstrap_stage_probe.py --log-n 10 --h 64
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import learn_fhe_tpu.models.ckks.bootstrapping as B
import learn_fhe_tpu.models.ckks.ckks as C
import learn_fhe_tpu.models.ckks.evalmod as E
from learn_fhe_tpu.models.ckks.sfft import sfft, sifft
from learn_fhe_tpu.ops.ntt import bit_reverse_indices
from learn_fhe_tpu.utils.dd import DDC


def bits(err, ref):
    err = max(float(err), 1e-300)
    return -np.log2(err / ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log-n", type=int, default=5)
    ap.add_argument("--big-l", type=int, default=21)
    ap.add_argument("--log-qi", type=int, default=55)
    ap.add_argument("--h", type=int, default=0, help="sparse secret weight (0 = dense)")
    ap.add_argument("--r", type=int, default=3, help="fmat chunk size")
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--dbl", type=int, default=4, help="double-angle count")
    ap.add_argument("--degree", type=int, default=34)
    ap.add_argument("--arcsin", action="store_true")
    ap.add_argument("--amp", type=float, default=1e-4)
    args = ap.parse_args()

    rng = np.random.default_rng(17)
    params = C.CkksParams(log_n=args.log_n, log_qi=args.log_qi, big_l=args.big_l)
    sk = (
        C.sk_gen_sparse(params, args.h, rng) if args.h else C.sk_gen(params, rng)
    )
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=args.r)
    bk = B.key_gen(bp, sk, rng)
    em = E.EvalModParams(k=args.k, r=args.dbl, degree=args.degree, arcsin=args.arcsin)

    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * args.amp
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))
    rev = bit_reverse_indices(params.l)
    q0 = low.qs[0]
    c = q0 / params.scale

    def dec(ct_, scale_corr=1.0):
        v = C.decode(params, C.decrypt(params, sk, ct_), ct_.qs)
        return v * scale_corr

    # --- stage 1: mod_raise (exact embed: raised phase == low phase mod q0,
    # as INTEGERS in the coefficient domain) --------------------------------
    from learn_fhe_tpu.utils.crt import rns_to_bigints

    raised = E.mod_raise(params, low)
    v_low = dec(low)
    v_raised = dec(raised)
    p_low = np.asarray(C.decrypt(params, sk, low))[..., 0, :].astype(np.uint64)
    p_raised = np.asarray(C.decrypt(params, sk, raised)).astype(np.uint64)
    big = rns_to_bigints(p_raised, raised.qs)
    ok = all((x - int(w)) % q0 == 0 for x, w in zip(big, p_low))
    print(f"mod_raise: exact (phase mod q0 preserved): {ok}")
    assert ok

    # --- stage 2: CoeffToSlot ----------------------------------------------
    slots = B.coeff_to_slot(bk, raised)
    S_true = E._cts_scale(params, slots)
    corr = float(S_true / __import__("fractions").Fraction(params.scale))
    v_cts = dec(slots, 1.0 / corr)
    want_cts = sifft(DDC.from_complex(v_raised)).to_complex128()[rev]
    ref = np.max(np.abs(want_cts))
    e2 = np.max(np.abs(v_cts - want_cts))
    print(f"CoeffToSlot: abs err {e2:.2e} -> {bits(e2, ref):.1f} bits "
          f"(vs its input magnitude {ref:.2e})")

    # --- stage 3: EvalMod ----------------------------------------------------
    cleaned = E.eval_mod(params, rlk, cjk, slots, em, c)
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
    print(f"EvalMod: abs err {e3:.2e} -> {bits(e3, args.amp):.1f} bits vs amp")
    # the model's own distance from the true message (sine floor etc.)
    e3m = np.max(np.abs(want_em - sifft(DDC.from_complex(v_low)).to_complex128()[rev]))
    print(f"  (model floor vs exact mod: {e3m:.2e} -> {bits(e3m, args.amp):.1f} bits)")

    # --- stage 4: SlotToCoeff -------------------------------------------------
    out = B.slot_to_coeff(bk, cleaned)
    v_out = dec(out)
    want_out = sfft(DDC.from_complex(v_em[rev])).to_complex128()
    e4 = np.max(np.abs(v_out - want_out))
    print(f"SlotToCoeff: abs err {e4:.2e} -> {bits(e4, np.max(np.abs(want_out))):.1f} "
          f"bits (vs its input magnitude)")

    # --- end to end -----------------------------------------------------------
    ee = np.max(np.abs(v_out - m))
    print(f"END-TO-END: {len(out.qs)} levels left, abs err {ee:.2e}, "
          f"{bits(ee, np.max(np.abs(m))):.1f} relative bits")


if __name__ == "__main__":
    main()
