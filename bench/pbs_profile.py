"""Per-op device-time profile of one steady-state batch-128 TFHE PBS
(VERDICT r03 item 3, after the prefix-differencing approach proved
unusable: a decompose-only prefix times 8x SLOWER than the full pipeline —
removing later stages changes XLA's fusion structure so radically that
prefix differences are meaningless; recorded in ARCHITECTURE §19).

This uses the XLA device trace instead: warm the full bootstrap, trace one
call, aggregate device events by fusion kind (utils/profiling.summarize).

Run on the real chip: python bench/pbs_profile.py
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
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dir", default="/tmp/fhe_pbs_trace")
    args = ap.parse_args()

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
    from learn_fhe_tpu.utils import profiling

    rng = np.random.default_rng(0)
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
    z = tlwe.sk_gen(params.tlwe, rng)
    key = key_gen(params, z, rng)
    tab = lut_table(params.tlwe.log_p, params.big_n, lambda v: v)
    v_enc = tglwe.encode(params.tglwe, jnp.asarray(tab))
    ms = rng.integers(0, params.tlwe.p, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    a2n, b2n = mod_switch_2n(cts, params.big_n)

    out = tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
    fetch_sync(out.b)
    t0 = time.time()
    out = tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
    fetch_sync(out.b)
    warm_s = time.time() - t0
    print(f"warm full bootstrap: {warm_s*1e3:.1f} ms ({B/warm_s:.1f} PBS/s)", flush=True)

    with profiling.trace(args.dir):
        out = tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
        fetch_sync(out.b)

    stats = profiling.summarize(args.dir)
    dev_total = sum(s.total_ms for s in stats)
    print(f"\ndevice time total {dev_total:.1f} ms; top op kinds:")
    for s in stats[: args.top]:
        print(f"  {s.total_ms:9.2f} ms  x{s.count:6d}  {100*s.total_ms/dev_total:5.1f}%  {s.kind}")


if __name__ == "__main__":
    main()
