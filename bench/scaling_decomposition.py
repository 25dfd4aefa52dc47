"""Decompose the sharded-workload aggregate-throughput collapse (VERDICT r04
item 4: CKKS limb-sharded mul and coef-sharded NTT lose 3.5-9x AGGREGATE
throughput at D>=2 on the virtual CPU mesh — 1/D per-device efficiency is
expected there, aggregate < 1 is not).

Separates, per workload and device count:
  1. the code-path delta (sharded algorithm / shard_map wrapper at D=1 vs
     the plain path — no collectives execute at D=1);
  2. the collective count/bytes (parsed from the compiled HLO);
  3. the residual per-step overhead (dispatch of many small programs on one
     physical core).

Runs on the virtual CPU mesh: JAX_PLATFORMS=cpu, 8 host devices.
Usage: python bench/scaling_decomposition.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# match the OPERATION on the right of '=', not the instruction name: XLA
# CPU renames some collective instructions (e.g. the shard_map NTT's
# ppermutes become '%name = u32[..] collective-permute(..)'), so keying on
# the auto-name '%collective-permute.N' undercounts (measured: the coef32
# NTT showed 0 collectives under the old regex, 3 under this one).
COLLECTIVE_RE = re.compile(
    r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\][^\n]*?"
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\("
)
DTYPE_BYTES = {"u8": 1, "u16": 2, "u32": 4, "u64": 8, "s32": 4, "s64": 8,
               "f32": 4, "f64": 8, "pred": 1, "c64": 8, "c128": 16}


def collective_stats(hlo_text: str) -> dict:
    counts: dict = {}
    bytes_total = 0
    for m in COLLECTIVE_RE.finditer(hlo_text):
        dtype, shape, kind = m.groups()
        counts[kind] = counts.get(kind, 0) + 1
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        bytes_total += n * DTYPE_BYTES.get(dtype, 8)
    return {"counts": counts, "bytes": bytes_total}


def timeit(fn, iters):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    out = {"metric": "scaling_decomposition", "devices": jax.device_count()}

    # ---- u32 NTT polymul, coefficient-sharded --------------------------------
    from learn_fhe_tpu.ops.ntt32 import negacyclic_mul32, ntt32_plan
    from learn_fhe_tpu.parallel.coef import coef_mesh, shard_coef
    from learn_fhe_tpu.parallel.coef32 import coef32_sharded_mul
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q32 = next(two_adic_primes(28, 15))
    n32 = 1 << 14
    na = rng.integers(0, q32, size=(4, n32)).astype(np.uint32)
    nb = rng.integers(0, q32, size=(4, n32)).astype(np.uint32)
    plan32 = ntt32_plan(q32, n32)
    t_plain = timeit(
        lambda: negacyclic_mul32(jnp.asarray(na), jnp.asarray(nb), plan32), args.iters
    )
    ntt = {"plain_1dev_ms": round(t_plain * 1e3, 3)}
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        try:
            cm = coef_mesh(n_dev, devices=jax.devices()[:n_dev])
            sa = shard_coef(cm, jnp.asarray(na))
            sb = shard_coef(cm, jnp.asarray(nb))
        except Exception as e:
            ntt[f"sharded_{n_dev}dev"] = {"error": repr(e)}
            continue
        t = timeit(lambda: coef32_sharded_mul(cm, sa, sb, q32), args.iters)
        f = jax.jit(lambda a, b: coef32_sharded_mul(cm, a, b, q32))
        try:
            hlo = f.lower(sa, sb).compile().as_text()
            cs = collective_stats(hlo)
        except Exception as e:
            cs = {"error": repr(e)}
        ntt[f"sharded_{n_dev}dev"] = {
            "ms": round(t * 1e3, 3),
            "aggregate_vs_plain": round(t_plain / t, 4),
            "collectives": cs,
        }
    out["ntt32_coef_sharded_n2e14"] = ntt
    print(json.dumps({"ntt": ntt}), flush=True)

    # ---- CKKS mul, limb-sharded ---------------------------------------------
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from learn_fhe_tpu.models.ckks import ckks as Ck
    from learn_fhe_tpu.parallel.mesh import make_mesh

    cparams = Ck.CkksParams(log_n=7, log_qi=45, big_l=8)
    csk = Ck.sk_gen(cparams, rng)
    crlk = Ck.rlk_gen(cparams, csk, rng)
    mm = (rng.standard_normal(cparams.l) + 1j * rng.standard_normal(cparams.l)) * 0.5
    cct = Ck.sk_encrypt(cparams, csk, Ck.encode(cparams, mm), cparams.qs, rng)

    # plain path: no sharding annotations at all
    t_plain = timeit(lambda: Ck.mul(cparams, crlk, cct, cct), args.iters)
    ck = {"plain_1dev_ms": round(t_plain * 1e3, 3)}
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        lmesh = make_mesh(n_batch=1, n_limb=n_dev, devices=jax.devices()[:n_dev])
        sl = lambda x: jax.device_put(x, NamedSharding(lmesh, P("limb", None)))
        ct_s = Ck.CkksCiphertext(sl(cct.b), sl(cct.a), cct.qs)
        rlk_s = Ck.CkksKeySwitchingKey(sl(crlk.b), sl(crlk.a), crlk.qs)
        t = timeit(lambda: Ck.mul(cparams, rlk_s, ct_s, ct_s), args.iters)
        f = jax.jit(lambda rlk, ct: Ck.mul(cparams, rlk, ct, ct))
        try:
            hlo = f.lower(rlk_s, ct_s).compile().as_text()
            cs = collective_stats(hlo)
        except Exception as e:
            cs = {"error": repr(e)}
        ck[f"sharded_{n_dev}dev"] = {
            "ms": round(t * 1e3, 3),
            "aggregate_vs_plain": round(t_plain / t, 4),
            "collectives": cs,
        }
    out["ckks_mul_limb_sharded"] = ck
    print(json.dumps({"ckks": ck}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
