"""Per-stage roofline decomposition of one TFHE PBS step (VERDICT r03 item
3): where does a steady-state batch-128 blind-rotation step spend its time?

Method (the §17 sync harness rules): five PREFIX pipelines of the
cmux_rotate step — decompose | +forward NTTs | +key contraction | +monomial
| full step — each chained over the scan axis with a data dependency (the
prefix's intermediates are checksummed into the accumulator so XLA cannot
dead-code any stage), timed as whole n=1024-step programs, differenced to
per-stage shares. The final key-switch/extract/mod-switch shares come from
timing the full bootstrap against the blind rotation alone.

Run on the real chip: python bench/pbs_breakdown.py [--batch 128 --iters 3]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from learn_fhe_tpu.models.tfhe import (
        BootstrapParams,
        TggswParams,
        TglweParams,
        TlweParams,
        key_gen,
        lut_table,
        tglwe,
        tlwe,
    )
    from learn_fhe_tpu.models.tfhe import tggsw
    from learn_fhe_tpu.models.tfhe.bootstrapping import blind_rotate, mod_switch_2n
    from learn_fhe_tpu.models.tfhe.tggsw import _crt_plan, _decompose_rows
    from learn_fhe_tpu.models.tfhe.tglwe import TglweCiphertext
    from learn_fhe_tpu.ops.modular32 import mul_shoup32, sub_mod32, sum_mod32
    from learn_fhe_tpu.ops.torus_crt import garner_to_u64, small_to_eval
    from learn_fhe_tpu.parallel.batch import tfhe_pbs_batch_device

    rng = np.random.default_rng(0)
    if args.smoke:
        params = BootstrapParams(
            TlweParams(log_p=2, padding=1, n=16, std_dev=1.34e-7, log_b=4, d=5),
            TggswParams(
                TglweParams(log_p=2, padding=1, big_n=64, k=1, std_dev=2.85e-15),
                log_b=23,
                d=1,
            ),
        )
    else:
        params = BootstrapParams(
            TlweParams(
                log_p=4, padding=1, n=1024, std_dev=1.339775301998614e-7, log_b=4, d=5
            ),
            TggswParams(
                TglweParams(
                    log_p=4, padding=1, big_n=2048, k=1, std_dev=2.845267479601915e-15
                ),
                log_b=23,
                d=1,
            ),
        )
    B = args.batch
    n, big_n, k = params.tlwe.n, params.big_n, params.tglwe.k
    n2 = 2 * big_n
    z = tlwe.sk_gen(params.tlwe, rng)
    key = key_gen(params, z, rng)
    tab = lut_table(params.tlwe.log_p, big_n, lambda v: v)
    v_enc = tglwe.encode(params.tglwe, jnp.asarray(tab))
    ms = rng.integers(0, params.tlwe.p, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    a2n, b2n = mod_switch_2n(cts, big_n)

    plan = _crt_plan(params.tggsw)
    tg = params.tggsw

    def checksum_into(acc_a, acc_b, pieces):
        """Fold arbitrary intermediates into the carry (cheap, un-eliminable)."""
        s = None
        for p in pieces:
            v = jnp.sum(p.astype(jnp.uint64) if p.dtype != jnp.uint64 else p)
            s = v if s is None else s + v
        return acc_a + s, acc_b + s

    def make_prefix(stage: str):
        """A scan whose step runs the cmux_rotate PREFIX up to `stage`."""

        def step(carry, inp, mon_v, mon_d):
            acc_a, acc_b = carry
            a_i, key_i = inp
            acc = TglweCiphertext(acc_a, acc_b)
            limbs = _decompose_rows(tg, acc)
            if stage == "decompose":
                return checksum_into(acc_a, acc_b, [limbs]), None
            l_ev = small_to_eval(limbs, plan, bound_bits=min(tg.gadget.log_b, 31))
            if stage == "ntt_fwd":
                return checksum_into(acc_a, acc_b, list(l_ev)), None
            s = a_i % n2
            e_all = []
            for i, q in enumerate(plan.primes):
                le = l_ev[i]
                e_a = sum_mod32(
                    mul_shoup32(le[..., :, None, :], key_i.av[i], key_i.ad[i], q),
                    q,
                    axis=-3,
                )
                e_b = sum_mod32(
                    mul_shoup32(le, key_i.bv[i], key_i.bd[i], q), q, axis=-2
                )
                e_all.append((e_a, e_b))
            if stage == "contract":
                return checksum_into(
                    acc_a, acc_b, [x for ab in e_all for x in ab]
                ), None
            m_all = []
            for i, q in enumerate(plan.primes):
                mv = jnp.take(mon_v[i], s, axis=0)
                md = jnp.take(mon_d[i], s, axis=0)
                e_a, e_b = e_all[i]
                da = sub_mod32(
                    mul_shoup32(e_a, mv[..., None, :], md[..., None, :], q), e_a, q
                )
                db = sub_mod32(mul_shoup32(e_b, mv, md, q), e_b, q)
                m_all.append((da, db))
            if stage == "monomial":
                return checksum_into(
                    acc_a, acc_b, [x for ab in m_all for x in ab]
                ), None
            da = garner_to_u64(tuple(ab[0] for ab in m_all), plan)
            db = garner_to_u64(tuple(ab[1] for ab in m_all), plan)
            return (acc_a + da, acc_b + db), None  # full step

        # key material travels as ARGUMENTS (closing over it would bake
        # ~100MB of constants into the HLO and overflow the remote compile
        # helper's request limit — observed HTTP 413)
        @jax.jit
        def run(a2n, b2n, v_enc, brk, mon_v, mon_d):
            def step_k(carry, inp):
                return step(carry, inp, mon_v, mon_d)

            acc_a = jnp.zeros((B, k, big_n), dtype=jnp.uint64)
            acc_b = jnp.broadcast_to(v_enc, (B, big_n))
            a_scan = jnp.moveaxis(a2n, -1, 0)
            (oa, ob), _ = jax.lax.scan(step_k, (acc_a, acc_b), (a_scan, brk))
            return oa, ob

        return lambda a, b, v: run(a, b, v, key.brk, key.mon_v, key.mon_d)

    stages = ["decompose", "ntt_fwd", "contract", "monomial", "full"]
    times = {}
    for st in stages:
        run = make_prefix(st)
        out = run(a2n, b2n, v_enc)
        fetch_sync(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = run(a2n, b2n, v_enc)
        fetch_sync(out)
        times[st] = (time.time() - t0) / args.iters
        print(f"  prefix {st:10s}: {times[st]*1e3:8.1f} ms / rotation-scan", flush=True)

    # full bootstrap (adds initial rotate + extract + key-switch + concat)
    out = tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
    fetch_sync(out.b)
    t0 = time.time()
    for _ in range(args.iters):
        out = tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
    fetch_sync(out.b)
    t_boot = (time.time() - t0) / args.iters
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    assert np.array_equal(got, ms), "bootstrap output failed decrypt check"

    d = {
        "decompose": times["decompose"],
        "ntt_fwd": times["ntt_fwd"] - times["decompose"],
        "contract": times["contract"] - times["ntt_fwd"],
        "monomial": times["monomial"] - times["contract"],
        "garner+acc": times["full"] - times["monomial"],
        "extract+keyswitch+misc": t_boot - times["full"],
    }
    print(f"\nPBS breakdown (batch={B}, device={jax.devices()[0].platform}, "
          f"{B*1.0/t_boot:.1f} PBS/s):")
    for k_, v in d.items():
        print(f"  {k_:22s}: {v*1e3:8.1f} ms  ({100*v/t_boot:5.1f}%)")
    print(f"  {'TOTAL bootstrap':22s}: {t_boot*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
