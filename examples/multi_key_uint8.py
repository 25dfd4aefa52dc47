"""End-to-end 2-party multi-key FHEW demo
(reference `scheme/fhew/examples/multi_key_uint8.rs`):

crs_gen -> per-party sk + pk/bk shares -> merge -> pk-encrypt two u8 ->
compute ((a+b)*(a-b)/a)%b homomorphically -> threshold-decrypt.

Parameters follow the reference example's shape (`multi_key_uint8.rs:15-29`)
scaled down in ring dimension so the demo finishes in minutes on CPU; pass
--full for the reference sizes (q~2^55, N=2^11, B=2^11, d=5, n=600).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--a", type=int, default=177)
    ap.add_argument("--b", type=int, default=7)
    args = ap.parse_args()

    import jax

    if not args.full:
        jax.config.update("jax_platforms", "cpu")

    from learn_fhe_tpu.models.fhew import (
        BootstrapParams,
        FhewU8,
        LweParams,
        RgswParams,
        RlweParams,
        crs_gen,
        key_share_gen,
        key_share_merge,
        rlwe,
    )
    from learn_fhe_tpu.utils.primes import two_adic_primes

    rng = np.random.default_rng(0)
    # coarse gate-batch padding: every bootstrap round of the u8 circuits
    # lands on ONE of two compiled batch shapes (16 or 64), so the warm set
    # stays tiny and the remote compile helper is off the critical path
    if args.full:
        q = next(two_adic_primes(55, 12))
        params = BootstrapParams(
            RgswParams(RlweParams(q=q, p=4, log_n=11, log_b=11, d=5), log_b=11, d=5),
            LweParams(q=1 << 20, p=4, n=600, log_b=5, d=4),
            w=10,
            gate_pad=(16, 64),
        )
    else:
        q = next(two_adic_primes(54, 8))
        params = BootstrapParams(
            RgswParams(RlweParams(q=q, p=4, log_n=7, log_b=6, d=9), log_b=6, d=9),
            LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4),
            w=5,
            gate_pad=(16, 64),
        )

    n_parties = 2
    t0 = time.time()
    stamp = lambda msg: print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    # fire the setup + gate-pipeline compiles NOW on background threads: the
    # remote compile helper overlaps requests and caches externally, so by
    # the time each phase needs its program it's a cache hit (utils/warmup.py)
    from learn_fhe_tpu.models.fhew.warmup import (
        prewarm_gate_pipelines,
        prewarm_multikey_setup,
    )

    warm_futs = prewarm_multikey_setup(params) + prewarm_gate_pipelines(
        params, batches=params.gate_pad
    )
    crs = crs_gen(params, rng)
    sks = [rlwe.sk_gen(params.rlwe, rng) for _ in range(n_parties)]
    pk_shares = [rlwe.pk_share_gen(params.rlwe, crs.pk_a, sk, rng) for sk in sks]
    pk = rlwe.pk_share_merge(params.rlwe, crs.pk_a, pk_shares)
    stamp("crs + pk shares merged")
    key_shares = [key_share_gen(params, crs, sk, pk, rng) for sk in sks]
    stamp("per-party key shares generated")
    bk = key_share_merge(params, crs, key_shares)
    stamp("2-party key setup merged")
    from learn_fhe_tpu.utils.warmup import wait_all

    errs = wait_all(warm_futs)
    stamp(f"gate pipelines warm ({len(warm_futs)} programs, {len(errs)} errors)")

    a, b = args.a % 256, args.b % 256
    ct_a = FhewU8.pk_encrypt(params, bk, pk, a, rng)
    ct_b = FhewU8.pk_encrypt(params, bk, pk, b, rng)
    print(f"[{time.time()-t0:7.1f}s] encrypted a={a}, b={b}")

    # ((a + b) * (a - b) / a) % b, all wrapping u8 (`multi_key_uint8.rs:59-67`)
    s = ct_a.wrapping_add(ct_b)
    print(f"[{time.time()-t0:7.1f}s] a+b done")
    d = ct_a.wrapping_sub(ct_b)
    print(f"[{time.time()-t0:7.1f}s] a-b done")
    p = s.wrapping_mul(d)
    print(f"[{time.time()-t0:7.1f}s] (a+b)*(a-b) done")
    qt = p.wrapping_div(ct_a)
    print(f"[{time.time()-t0:7.1f}s] /a done")
    r = qt.wrapping_rem(ct_b)
    print(f"[{time.time()-t0:7.1f}s] %b done")

    shares = [r.share_decrypt(sk, rng) for sk in sks]
    got = r.decryption_share_merge(shares)
    want = ((((a + b) % 256) * ((a - b) % 256) % 256) // a) % b
    print(f"threshold-decrypted: {got}, expected: {want}")
    assert got == want
    print("OK")


if __name__ == "__main__":
    main()
