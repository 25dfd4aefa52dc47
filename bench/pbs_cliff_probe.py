"""Probe the TFHE PBS batch-throughput cliff (VERDICT r2 task 5).

ARCHITECTURE §6: 270-290 bootstraps/s at batch 128 but 190/s at 256 and
181/s at 512 — an HBM-bound pipeline should hold aggregate throughput as
batch grows, so the 33% collapse is a spill or scheduling pathology.

This probe (run on the real chip):
 1. sweeps batch {64,128,192,256,384,512} with in-jit chained steps,
 2. traces one step at batch 128 and 256 (utils/profiling) and prints the
    top op-category deltas, normalized per ciphertext.

Run: python bench/pbs_cliff_probe.py [--trace]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch):
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
    from learn_fhe_tpu.models.tfhe.bootstrapping import mod_switch_2n
    from learn_fhe_tpu.parallel.batch import tfhe_pbs_batch_device

    rng = np.random.default_rng(0)
    params = BootstrapParams(
        TlweParams(log_p=4, padding=1, n=1024, std_dev=1.339775301998614e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=4, padding=1, big_n=2048, k=1, std_dev=2.845267479601915e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, rng)
    key = key_gen(params, z, rng)
    tab = lut_table(4, 2048, lambda v: v)
    v_enc = tglwe.encode(params.tglwe, jnp.asarray(tab))
    ms = rng.integers(0, 16, size=batch).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    a2n, b2n = mod_switch_2n(cts, params.big_n)

    def step(a, b):
        out = tfhe_pbs_batch_device(params, key, v_enc, a, b)
        return out.a, out.b

    return step, a2n, b2n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.trace:
        from learn_fhe_tpu.utils.profiling import summarize, trace

        for B in (128, 256):
            step, a2n, b2n = build(B)
            f = jax.jit(step)
            jax.block_until_ready(f(a2n, b2n))  # compile outside the trace
            d = f"/tmp/pbs_trace_{B}"
            with trace(d):
                jax.block_until_ready(f(a2n, b2n))
            print(f"--- batch {B}: top ops (per-ct-normalized us) ---")
            for s in summarize(d)[:15]:
                print(f"  {s}")
        return

    from bench import fetch_sync  # tunnel-proof sync (block_until_ready lies)

    for B in (64, 128, 192, 256, 384, 512):
        step, a2n, b2n = build(B)
        f = jax.jit(step)
        out = f(a2n, b2n)
        fetch_sync(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(a2n, b2n)
        fetch_sync(out)
        dt = (time.time() - t0) / args.iters
        print(f"batch {B:4d}: {B / dt:7.1f} bootstraps/s  ({dt * 1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
