"""Valid CKKS cost model: device-trace attribution of one warm mul and one
warm CoeffToSlot (VERDICT r04 item 5 — replaces the self-contradictory
prefix-differencing breakdown bench/ckks_mul_breakdown.py, whose
"transform-only ceiling 280 muls/s" sat 2.9x BELOW its own measured 818:
prefix differencing changes XLA's fusion structure, the same failure mode
ARCHITECTURE §19 documents for the PBS).

Method (the one that worked for the PBS, bench/pbs_profile.py):
1. warm the full op, time it under the §17 sync harness;
2. trace ONE warm call, aggregate device events by fusion kind;
3. anchor a transform-row model on the STANDALONE u64 NTT bench rate
   (`bench.py --metric ntt`: 40.5k N=2^14 polymuls/s = 3 transforms each),
   not on prefix differences.

Transform-row count for mul+relin+rescale at (L, P, dnum=1)
(`models/ckks/ckks.py:577-745`, reference `ckks.rs:255-293`):
  4L fwd (a0,b0,a1,b1) + 3L inv (d0,d1,d2) + (L+P) fwd (extended d2 digit)
  + 2(L+P) inv (ks dot pair) = 7L + 3(L+P)   [L=8, P=8: 104 rows]

Run on the real chip: python bench/ckks_profile.py [--what mul|cts|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch_sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.jit(lambda v: v.reshape(-1)[:8])(leaf))


# measured standalone u64 engine rate (bench.py --metric ntt, §17 harness):
# 40.5k N=2^14 polymuls/s at batch 256 = 121.5k N=2^14 transforms/s.
U64_N14_TRANSFORMS_PER_S = 121.5e3


def row_rate(log_n: int) -> float:
    """Single-limb N=2^log_n transforms/s scaled by N log N from the
    benched N=2^14 anchor."""
    work = (1 << log_n) * log_n
    anchor = (1 << 14) * 14
    return U64_N14_TRANSFORMS_PER_S * anchor / work


def profile_mul(args, out):
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.utils import profiling

    rng = np.random.default_rng(0)
    params = C.CkksParams(log_n=13, log_qi=55, big_l=8)
    L, P = len(params.qs), len(params.ps)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    B = args.batch
    m0 = rng.standard_normal((B, params.l)) + 1j * rng.standard_normal((B, params.l))
    m1 = rng.standard_normal((B, params.l)) + 1j * rng.standard_normal((B, params.l))
    enc = lambda m: C.sk_encrypt(
        params,
        sk,
        jnp.stack([C.encode(params, v) for v in m]),
        params.qs,
        rng,
    )
    ct0, ct1 = enc(m0), enc(m1)

    r = C.mul(params, rlk, ct0, ct1)
    fetch_sync(r.b)
    t0 = time.time()
    for _ in range(args.iters):
        r = C.mul(params, rlk, ct0, ct1)
    fetch_sync(r.b)
    per_ct = (time.time() - t0) / args.iters / B
    print(f"warm mul: {per_ct*1e3:.3f} ms/ct ({1/per_ct:.0f} muls/s, batch {B})", flush=True)

    with profiling.trace(args.dir + "_mul"):
        r = C.mul(params, rlk, ct0, ct1)
        fetch_sync(r.b)
    stats = profiling.summarize(args.dir + "_mul")
    dev_total = sum(s.total_ms for s in stats)
    print(f"device total {dev_total:.2f} ms for one batch-{B} mul call:")
    for s in stats[:14]:
        print(f"  {s.total_ms:8.2f} ms x{s.count:5d} {100*s.total_ms/dev_total:5.1f}%  {s.kind}", flush=True)

    rows = 7 * L + 3 * (L + P)
    ceil_s = rows * B / row_rate(13)
    model_muls_s = B / ceil_s * B  # = row_rate/rows, per ct
    out["mul"] = {
        "batch": B,
        "ms_per_ct": round(per_ct * 1e3, 3),
        "muls_per_s": round(1 / per_ct, 1),
        "transform_rows": rows,
        "row_rate_n13_per_s": round(row_rate(13), 1),
        "transform_ceiling_muls_s": round(row_rate(13) / rows, 1),
        "pct_of_ceiling": round(100 * (1 / per_ct) / (row_rate(13) / rows), 1),
        "device_ms_per_call": round(dev_total, 2),
        "top_kinds": [
            {"kind": s.kind, "ms": round(s.total_ms, 2), "count": s.count}
            for s in stats[:10]
        ],
    }


def profile_cts(args, out):
    import learn_fhe_tpu.models.ckks.bootstrapping as B_
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.models.ckks import evalmod as E
    from learn_fhe_tpu.utils import profiling
    from learn_fhe_tpu.utils.matrix import bsgs_plan

    rng = np.random.default_rng(1)
    params = C.CkksParams(log_n=10, log_qi=55, big_l=8)
    L, P = len(params.qs), len(params.ps)
    sk = C.sk_gen_sparse(params, 64, rng)
    bp = B_.BootstrapParams(params, r=3)
    bk = B_.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.1
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))
    raised = E.mod_raise(params, low)

    r = B_.coeff_to_slot(bk, raised)
    fetch_sync(r.b)
    t0 = time.time()
    for _ in range(args.iters):
        r = B_.coeff_to_slot(bk, raised)
    fetch_sync(r.b)
    per = (time.time() - t0) / args.iters
    print(f"warm CtS: {per*1e3:.1f} ms", flush=True)

    with profiling.trace(args.dir + "_cts"):
        r = B_.coeff_to_slot(bk, raised)
        fetch_sync(r.b)
    stats = profiling.summarize(args.dir + "_cts")
    dev_total = sum(s.total_ms for s in stats)
    print(f"device total {dev_total:.2f} ms for one CtS:")
    for s in stats[:14]:
        print(f"  {s.total_ms:8.2f} ms x{s.count:5d} {100*s.total_ms/dev_total:5.1f}%  {s.kind}", flush=True)

    # row model: per chunk c (levels L..L-n_chunks+1): hoisted-rotation BSGS
    # (ARCHITECTURE §13): ONE decompose+extend of the input (Lc+P fwd rows),
    # then per baby rotation j a ksk dot (2 inv rows at Lc+P), per output
    # a pt multiply in eval basis (no transform), giant rotations as ksk
    # switches (2 inv rows each), one rescale per chunk.
    rows = 0
    lc = L
    for mat in bp.sfft_mats:
        plan = bsgs_plan(list(mat.keys()))
        babies = set()
        for js in plan.values():
            babies.update(js)
        babies.discard(0)
        giants = [i for i in plan.keys() if i != 0]
        rows += (lc + P)  # hoisted digit fwd
        rows += 2 * (lc + P) * len(babies)  # baby ksk dots (inv pairs)
        rows += (2 * (lc + P) + (lc + P)) * len(giants)  # giant: fwd+dot pair
        rows += lc  # recombine inv at level basis
        lc -= 1
    ceil_s = rows / row_rate(10)
    out["cts"] = {
        "log_n": 10,
        "ms": round(per * 1e3, 2),
        "transform_rows_model": rows,
        "row_rate_n10_per_s": round(row_rate(10), 1),
        "transform_ceiling_ms": round(ceil_s * 1e3, 2),
        "pct_of_ceiling": round(100 * ceil_s / per, 1),
        "device_ms_per_call": round(dev_total, 2),
        "top_kinds": [
            {"kind": s.kind, "ms": round(s.total_ms, 2), "count": s.count}
            for s in stats[:10]
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["mul", "cts", "both"], default="both")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/fhe_ckks_trace")
    args = ap.parse_args()
    out = {"metric": "ckks_cost_model"}
    if args.what in ("mul", "both"):
        profile_mul(args, out)
    if args.what in ("cts", "both"):
        profile_cts(args, out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
