"""Execute the FULL certified production bootstrap (production.py flagship,
N=2^16, 128-bit HES dense keys, ladder + dnum hybrid key switching):
keygen -> exhaust -> bootstrap -> 4 user muls -> decode, with per-stage wall
times and the end-to-end precision.

The key material is ~19 GB (38 BSGS rotation keys x dnum=15 digits x 32
limb rows x N=2^16 — the intrinsic cost of certified-dense bootstrapping;
public libraries cite the same order), which exceeds a single v5e chip's
16 GB HBM: single-chip execution is host-RAM CPU only, and the on-chip
deployment story is the limb/digit-sharded multi-chip path the dryrun
validates. This probe is the precision/level record for the BENCH row.

Usage: python bench/production_bootstrap_probe.py [--log-n 16] [--amp 0.3]
(hours on this 1-core box; prints stage marks as it goes)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FHE_TPU_PROBE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--amp", type=float, default=0.3)
    ap.add_argument("--user-levels", type=int, default=4)
    ap.add_argument("--keygroup", type=int, default=4)
    ap.add_argument("--log-q0", type=int, default=None)
    ap.add_argument("--log-user", type=int, default=None)
    ap.add_argument("--log-em", type=int, default=None)
    ap.add_argument("--chunk-r", type=int, default=None)
    ap.add_argument("--alpha", type=int, default=None)
    ap.add_argument("--log-p", type=int, default=None)
    args = ap.parse_args()
    extra = {}
    for name in ("log_q0", "log_user", "log_em", "chunk_r", "alpha", "log_p"):
        v = getattr(args, name)
        if v is not None:
            extra[name] = v

    from learn_fhe_tpu.models.ckks import bootstrapping as B
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.models.ckks import evalmod as E
    from learn_fhe_tpu.models.ckks.production import (
        ProductionConfig,
        eval_mod_levels,
        production_config,
    )
    from learn_fhe_tpu.utils.matrix import bsgs_plan

    if args.log_n >= 16:
        cfg = production_config(log_n=args.log_n, user_levels=args.user_levels, **extra)
    else:  # smoke rings: same machinery, certification assert not applicable
        cfg = ProductionConfig(log_n=args.log_n, user_levels=args.user_levels, **extra)
    params = cfg.params
    print(f"config: {cfg.summary()}", flush=True)
    rng = np.random.default_rng(2026)

    t0 = time.time()
    sk = C.sk_gen(params, rng)  # dense ternary — the certified key
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    print(f"sk/rlk/cjk: {time.time()-t0:.0f}s", flush=True)

    # rotation keys in small groups (one giant batched jit would need ~100GB
    # of temporaries at these shapes)
    bp = cfg.bootstrap_params
    needed = set()
    for mat in [*bp.sfft_mats, *bp.sifft_mats]:
        plan = bsgs_plan(list(mat.keys()))
        needed.update(plan.keys())
        for js in plan.values():
            needed.update(js)
    needed.discard(0)
    needed = sorted(needed)
    rtk = {}
    t0 = time.time()
    for s in range(0, len(needed), args.keygroup):
        group = needed[s : s + args.keygroup]
        rtk.update(C.rtk_gen_many(params, sk, group, rng))
        print(f"  rtk {s + len(group)}/{len(needed)}: {time.time()-t0:.0f}s", flush=True)
    bk = B.BootstrapKey(bp, rtk)
    keygen_s = time.time() - t0
    print(f"rotation keys: {keygen_s:.0f}s", flush=True)

    S_user = Fraction(1 << cfg.log_user)
    m = (
        rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ) * args.amp
    pt = C.encode(params, m, (params.qs[0],), scale_int=int(S_user))
    low = C.sk_encrypt(params, sk, pt, (params.qs[0],), rng)
    print("encrypted at q0; starting bootstrap", flush=True)

    stages = {}
    t0 = time.time()
    raised = E.mod_raise(params, low)
    jax.block_until_ready(raised.b)
    stages["mod_raise"] = time.time() - t0

    t0 = time.time()
    slots = B.coeff_to_slot(bk, raised)
    jax.block_until_ready(slots.b)
    stages["coeff_to_slot"] = time.time() - t0
    print(f"CtS: {stages['coeff_to_slot']:.0f}s (level {len(slots.qs)})", flush=True)

    t0 = time.time()
    c = float(params.qs[0] / S_user)
    cleaned = E.eval_mod(
        params, rlk, cjk, slots, cfg.em, c, S_in=S_user, S_out=S_user
    )
    jax.block_until_ready(cleaned.b)
    stages["eval_mod"] = time.time() - t0
    print(f"EvalMod: {stages['eval_mod']:.0f}s (level {len(cleaned.qs)})", flush=True)

    t0 = time.time()
    out = B.slot_to_coeff(bk, cleaned)
    jax.block_until_ready(out.b)
    stages["slot_to_coeff"] = time.time() - t0
    print(f"StC: {stages['slot_to_coeff']:.0f}s (level {len(out.qs)})", flush=True)

    consumed = len(params.qs) - len(out.qs)
    predicted = 2 * cfg.n_transform + eval_mod_levels(cfg.em, cfg.baby)
    assert consumed == predicted, (consumed, predicted)
    assert len(out.qs) == 1 + cfg.user_levels, len(out.qs)

    got = C.decode(params, C.decrypt(params, sk, out), out.qs, scale_int=int(S_user))
    rel = -np.log2(np.max(np.abs(got - m)) / np.max(np.abs(m)))
    print(
        f"BOOTSTRAP: {sum(stages.values()):.0f}s total, {len(out.qs)} levels left, "
        f"{rel:.1f} bits relative precision",
        flush=True,
    )

    # burn the user levels: 4 sequential squarings with exact scale tracking
    S = S_user
    want = m.copy()
    ct = out
    t0 = time.time()
    while len(ct.qs) >= 2:
        S = S * S / ct.qs[-1]
        ct = C.mul(params, rlk, ct, ct)
        want = want * want
    jax.block_until_ready(ct.b)
    mul_s = time.time() - t0
    raw = C.decode(params, C.decrypt(params, sk, ct), ct.qs, scale_int=1)
    got2 = np.asarray(raw) / float(S)
    rel2 = -np.log2(
        np.max(np.abs(got2 - want)) / max(np.max(np.abs(want)), 1e-300)
    )
    print(
        f"user levels: {cfg.user_levels} squarings in {mul_s:.0f}s, "
        f"{rel2:.1f} bits at q0 — PRODUCTION FLAGSHIP "
        f"{'PASS' if rel >= 20 and rel2 >= 10 else 'FAIL'}",
        flush=True,
    )
    import json

    print(
        json.dumps(
            {
                "config": "production_n2e16_hes128_dense",
                "levels_left": len(out.qs),
                "bootstrap_bits": round(float(rel), 1),
                "after_user_muls_bits": round(float(rel2), 1),
                "stage_seconds": {k: round(v, 1) for k, v in stages.items()},
                "keygen_seconds": round(keygen_s, 1),
                "platform": jax.devices()[0].platform,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
