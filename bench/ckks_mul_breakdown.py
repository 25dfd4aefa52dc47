"""Per-stage decomposition of one CKKS mul+relin+rescale (VERDICT r03 weak
item 5: the CKKS hot path had no roofline model, so "is it fast?" was
unanswerable). Where does the N=2^13, L=8 (+8 P-limb) homomorphic multiply
spend its time, and what does the u64 NTT engine's own measured rate say
the ceiling is?

Method (ARCHITECTURE §17 sync-harness rules): seven PREFIX pipelines of the
mul body — 4 forward NTTs | +tensor products | +3 inverse NTTs | +digit
hoist (base-extend + fwd NTT at L+P limbs) | +ksk dot | +2 inverse NTTs at
L+P | full mul (rescales + adds) — each chained `--chain` times inside ONE
jit via lax.scan with the previous rep's checksum folded into the inputs
(XLA cannot dead-code or overlap reps), timed whole, differenced to
per-stage shares.

Also measures C.mul at batch 1 vs batch B: single-ct muls/s is a LATENCY
number at (8, 8192) shapes — the batch axis is where the chip's throughput
actually lives, exactly like the TFHE PBS row.

Run on the real chip: python bench/ckks_mul_breakdown.py [--batch 16]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--log-n", type=int, default=13)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.log_n = min(args.log_n, 6)

    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.models.ckks.ckks import _ks_dot, _ks_hoist, _ksk_digits
    from learn_fhe_tpu.ops.rns import (
        rescale_k,
        rns_add,
        rns_intt,
        rns_mul_eval,
        rns_ntt,
    )

    rng = np.random.default_rng(0)
    params = C.CkksParams(log_n=args.log_n, log_qi=55, big_l=8)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)

    qs = params.qs
    ps = params.ps
    qps = qs + ps
    plan = params.plan(qs)
    plan_qp = params.plan(qps)
    idx = [params.qps.index(q) for q in qps]
    ksk_b = _ksk_digits(params, rlk.b, len(qs), idx)
    ksk_a = _ksk_digits(params, rlk.a, len(qs), idx)

    B = args.batch
    L, n = len(qs), params.n
    q_arr = np.array(qs, dtype=np.uint64)[:, None]
    mk = lambda: jnp.asarray(
        rng.integers(0, 1 << 55, size=(B, L, n)).astype(np.uint64) % q_arr
    )
    a0_, b0_, a1_, b1_ = mk(), mk(), mk(), mk()

    def prefix_body(stage, a0, b0, a1, b1):
        """The mul body up to `stage`; returns intermediates to checksum."""
        ea0, eb0 = rns_ntt(a0, plan), rns_ntt(b0, plan)
        ea1, eb1 = rns_ntt(a1, plan), rns_ntt(b1, plan)
        if stage == "fwd4":
            return [ea0, eb0, ea1, eb1]
        d0e = rns_mul_eval(eb0, eb1, plan)
        d1e = rns_add(rns_mul_eval(eb0, ea1, plan), rns_mul_eval(ea0, eb1, plan), plan)
        d2e = rns_mul_eval(ea0, ea1, plan)
        if stage == "tensor":
            return [d0e, d1e, d2e]
        d0, d1, d2 = rns_intt(d0e, plan), rns_intt(d1e, plan), rns_intt(d2e, plan)
        if stage == "intt3":
            return [d0, d1, d2]
        ae = _ks_hoist(params, d2, qs)
        if stage == "hoist":
            return [d0, d1, ae]
        eb = _ks_dot(ksk_b, ae, plan_qp)
        ea = _ks_dot(ksk_a, ae, plan_qp)
        if stage == "ksdot":
            return [d0, d1, eb, ea]
        rb, ra = rns_intt(eb, plan_qp), rns_intt(ea, plan_qp)
        if stage == "ksinv":
            return [d0, d1, rb, ra]
        b = rns_add(rescale_k(rb, qps, len(ps)), d0, plan)
        a = rns_add(rescale_k(ra, qps, len(ps)), d1, plan)
        # final rescale (drop one q limb), as mul's rescale_ct does
        return [rescale_k(b, qs, 1), rescale_k(a, qs, 1)]

    def make_prefix(stage):
        @jax.jit
        def run(a0, b0, a1, b1):
            def step(carry, _):
                a0, b0, a1, b1 = carry
                outs = prefix_body(stage, a0, b0, a1, b1)
                s = sum(jnp.sum(o) for o in outs)
                # fold the checksum into every input: reps are data-chained
                carry = tuple(x + s for x in (a0, b0, a1, b1))
                return carry, None

            carry, _ = jax.lax.scan(step, (a0, b0, a1, b1), None, length=args.chain)
            return carry[0]

        return run

    stages = ["fwd4", "tensor", "intt3", "hoist", "ksdot", "ksinv", "full"]
    times = {}
    for st in stages:
        run = make_prefix(st)
        t0 = time.time()
        out = run(a0_, b0_, a1_, b1_)
        fetch_sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = run(a0_, b0_, a1_, b1_)
        fetch_sync(out)
        times[st] = (time.time() - t0) / args.iters / args.chain / B
        print(
            f"  prefix {st:7s}: {times[st]*1e3:8.3f} ms/ct "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )

    d = {
        "ntt_fwd4_L8": times["fwd4"],
        "tensor_pointwise": times["tensor"] - times["fwd4"],
        "ntt_inv3_L8": times["intt3"] - times["tensor"],
        "hoist_extend+fwd_L16": times["hoist"] - times["intt3"],
        "ksk_dot": times["ksdot"] - times["hoist"],
        "ntt_inv2_L16": times["ksinv"] - times["ksdot"],
        "rescales+adds": times["full"] - times["ksinv"],
    }
    total = times["full"]
    print("\nper-stage shares (batch-amortized, one mul+relin+rescale):")
    for k, v in d.items():
        print(f"  {k:22s}: {v*1e3:8.3f} ms  {100*v/total:5.1f}%")
    # transform work in limb-row-transforms of N=2^{log_n}:
    # 4 fwd x8 + 3 inv x8 + 1 fwd x16 + 2 inv x16 = 104 rows
    rows = 4 * L + 3 * L + (L + len(ps)) + 2 * (L + len(ps))
    t_rows = times["fwd4"] / (4 * L) * rows
    print(
        f"\ntransform rows/mul = {rows}; at the measured fwd-NTT row rate "
        f"that is {t_rows*1e3:.3f} ms -> transform-only ceiling "
        f"{1.0/t_rows:.0f} muls/s; full mul measured {1.0/total:.0f}/s "
        f"(batch {B})",
        flush=True,
    )

    # end-to-end C.mul: batch 1 (latency) vs batch B (throughput)
    m0 = rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ct0 = C.sk_encrypt(params, sk, C.encode(params, m0), qs, rng)
    ct1 = C.sk_encrypt(params, sk, C.encode(params, m0), qs, rng)
    bat = lambda ct: C.CkksCiphertext(
        jnp.broadcast_to(ct.b, (B, L, n)), jnp.broadcast_to(ct.a, (B, L, n)), qs
    )
    res = {}
    for label, c0, c1, width in [
        ("mul_b1", ct0, ct1, 1),
        (f"mul_b{B}", bat(ct0), bat(ct1), B),
    ]:
        out = C.mul(params, rlk, c0, c1)
        fetch_sync(out.b)
        it = max(args.iters * 4, 12)
        t0 = time.time()
        for _ in range(it):
            out = C.mul(params, rlk, c0, c1)
        fetch_sync(out.b)
        res[label] = it * width / (time.time() - t0)
        print(f"  {label:8s}: {res[label]:8.1f} muls/s", flush=True)

    print(
        json.dumps(
            {
                "metric": "ckks_mul_breakdown",
                "log_n": args.log_n,
                "batch": B,
                "stage_ms_per_ct": {k: round(v * 1e3, 4) for k, v in d.items()},
                "transform_rows": rows,
                "transform_ceiling_muls_s": round(1.0 / t_rows, 1),
                "full_muls_s": {k: round(v, 1) for k, v in res.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
