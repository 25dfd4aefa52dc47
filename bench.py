"""Headline benchmark: TFHE programmable bootstraps/sec/chip.

Runs the batched PBS pipeline at the reference parameter set
(`tfhe/bootstrapping.rs:141-152`: p=2^4, TLWE n=1024 B=2^4 d=5,
TGGSW N=2048 k=1 B=2^23 d=1) on whatever device JAX resolves (the real TPU
chip under the driver), and prints ONE JSON line.

Baseline: BASELINE.json's north star is >= 1000 PBS/sec on a v5e-8,
i.e. 125 PBS/sec/chip.

Usage: python bench.py [--batch B] [--iters K] [--smoke] [--metric tfhe|fhew]
(the driver contract line is the TFHE PBS metric; --metric fhew benches the
FHEW NAND gate bootstrap at its reference fixture instead)
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

PER_CHIP_BASELINE = 125.0  # 1000 PBS/sec / 8 chips (BASELINE.json north star)

_SYNC_PROBES: dict = {}

# Compile observability: BENCH_r03 showed a 12x compile-time swing caused by
# external-cache eviction, indistinguishable in the artifact from a real
# compile regression. Every metric's JSON line now carries a `compiles`
# breakdown (program count + per-program seconds) so cold-cache runs are
# machine-identifiable: many ~10s programs = cold helper cache, one huge
# outlier = new compile regression, near-zero = warm.
_COMPILES = {"count": 0, "total_s": 0.0, "per_program_s": []}


def _track_compiles():
    from jax import monitoring

    def _listener(name, dur, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            _COMPILES["count"] += 1
            _COMPILES["total_s"] += dur
            _COMPILES["per_program_s"].append(round(dur, 2))

    monitoring.register_event_duration_secs_listener(_listener)


def _compile_info():
    return {
        "count": _COMPILES["count"],
        "total_s": round(_COMPILES["total_s"], 1),
        "per_program_s": _COMPILES["per_program_s"][:64],
    }


def _compile_keys(compile_wall_s=None):
    """The unified compile pair (VERDICT r04 item 6). BENCH_r04's footer said
    compile=801.6s while the `compiles` field summed 70.6s — two different
    clocks with no labels. The names fix that:

    - compile_wall_s: wall-clock of the timed compile+warm region — includes
      remote-helper queueing, cold starts, and external-cache eviction.
    - compile_helper_s: sum of helper-reported backend_compile durations
      (the `compiles.per_program_s` entries).

    compile_wall_s >> compile_helper_s means queue/eviction overhead, not a
    compile regression; a per_program_s outlier means a regression. Footers
    quote the same two numbers by construction (same variables)."""
    info = _compile_info()
    d = {"compiles": info, "compile_helper_s": info["total_s"]}
    if compile_wall_s is not None:
        d["compile_wall_s"] = round(compile_wall_s, 1)
    return d


def fetch_sync(x):
    """Completion barrier that cannot lie: fetch a tiny jitted checksum of x.

    `jax.block_until_ready` through the axon tunnel has been observed to
    return before execution completes (2026-08-18: 7,680 chained N=2^14
    polymuls "done" in 168 us — both integer engines reading byte-identical
    dispatch-floor timings at 18x the HBM roofline). A host transfer of bytes
    computed FROM the result cannot complete early, so every timed region
    must end with this instead. The checksum runs as its own tiny jitted
    program (8 lanes fetched) so the transfer itself stays off the clock —
    call once on the warm pass too, so the probe's compile is pre-paid.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    key = (tuple(leaf.shape), str(leaf.dtype))
    fn = _SYNC_PROBES.get(key)
    if fn is None:
        fn = _SYNC_PROBES[key] = jax.jit(lambda v: v.reshape(-1)[:8])
    return np.asarray(fn(leaf))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)  # per-metric defaults
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--log-n",
        type=int,
        default=None,
        help="ring size override (ckks_bootstrap: 10 default, 13 = production ring)",
    )
    ap.add_argument(
        "--smoke", action="store_true", help="tiny params on CPU for a fast check"
    )
    ap.add_argument(
        "--metric",
        choices=["tfhe", "fhew", "ckks", "ntt", "scaling", "ckks_bootstrap"],
        default="tfhe",
    )
    ap.add_argument(
        "--hi-prec",
        action="store_true",
        help="ckks_bootstrap metric only: 60-bit primes + arcsine "
        "correction (26.4 bits at N=2^10 vs 21.7 default; 2 more levels)",
    )
    ap.add_argument(
        "--fourstep",
        action="store_true",
        help="ntt metric only: run the u32 engine through the four-step "
        "MXU matmul path (ntt32_plan(fourstep=True)) instead of the "
        "radix-4 stage path",
    )
    ap.add_argument(
        "--platform",
        choices=["cpu-mesh", "native"],
        default="cpu-mesh",
        help="scaling metric only: cpu-mesh = virtual 8-device CPU mesh "
        "(default in this image, where one TPU chip is reachable); native = "
        "use whatever devices the ambient backend exposes (real ICI scaling "
        "on a pod slice)",
    )
    args = ap.parse_args()
    _track_compiles()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.metric == "fhew":
        return bench_fhew(args)
    if args.metric == "ckks":
        return bench_ckks(args)
    if args.metric == "ntt":
        return bench_ntt(args)
    if args.metric == "scaling":
        return bench_scaling(args)
    if args.metric == "ckks_bootstrap":
        return bench_ckks_bootstrap(args)

    import jax

    import jax.numpy as jnp

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
    if args.smoke:
        params = BootstrapParams(
            TlweParams(log_p=2, padding=1, n=32, std_dev=1.34e-7, log_b=4, d=5),
            TggswParams(
                TglweParams(log_p=2, padding=1, big_n=128, k=1, std_dev=2.85e-15),
                log_b=23,
                d=1,
            ),
        )
    else:
        # reference PBS fixture
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

    z = tlwe.sk_gen(params.tlwe, rng)
    t0 = time.time()
    key = key_gen(params, z, rng)
    keygen_s = time.time() - t0

    tab = lut_table(params.tlwe.log_p, params.big_n, lambda v: v)
    v_enc = tglwe.encode(params.tglwe, jnp.asarray(tab))
    B = args.batch or 128
    ms = rng.integers(0, params.tlwe.p, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    a2n, b2n = mod_switch_2n(cts, params.big_n)

    from learn_fhe_tpu.parallel.batch import PBS_CHUNK

    def run_pipeline():
        if B <= PBS_CHUNK:
            return tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
        outs = [
            tfhe_pbs_batch_device(
                params, key, v_enc, a2n[s : s + PBS_CHUNK], b2n[s : s + PBS_CHUNK]
            )
            for s in range(0, B, PBS_CHUNK)
        ]
        from learn_fhe_tpu.models.tfhe.tlwe import TlweCiphertext

        return TlweCiphertext(
            jnp.concatenate([o.a for o in outs]), jnp.concatenate([o.b for o in outs])
        )

    # compile (excluded from timing)
    t0 = time.time()
    out = run_pipeline()
    fetch_sync(out.b)
    compile_s = time.time() - t0

    # verify correctness of the benched computation
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    assert np.array_equal(got, ms), "benchmark output failed decryption check"

    t0 = time.time()
    for _ in range(args.iters):
        out = run_pipeline()
    fetch_sync(out.b)
    dt = time.time() - t0

    pbs_per_sec = B * args.iters / dt
    print(
        json.dumps(
            {
                "metric": "tfhe_pbs_per_sec_per_chip",
                "value": round(pbs_per_sec, 3),
                "unit": "bootstraps/s",
                "vs_baseline": round(pbs_per_sec / PER_CHIP_BASELINE, 4),
                **_compile_keys(compile_s),
            }
        )
    )
    # secondary details on stderr-ish (not the contract line)
    import sys

    print(
        f"# params N={params.big_n} n={params.tlwe.n} batch={B} iters={args.iters} "
        f"keygen={keygen_s:.1f}s compile_wall={compile_s:.1f}s "
        f"compile_helper={_COMPILES['total_s']:.1f}s steady={dt:.2f}s "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_fhew(args):
    """FHEW NAND gate bootstraps/sec at the reference fixture
    (`boolean.rs:225-239` shape: q~2^28 NTT prime, N=2^9, B=2^7, d=4,
    LWE n=100 q=2^16, window w=10)."""
    import jax
    import jax.numpy as jnp

    from learn_fhe_tpu.models.fhew import (
        BootstrapParams,
        LweParams,
        RgswParams,
        RlweParams,
        bootstrapping as boot,
        lwe,
        rlwe,
    )
    from learn_fhe_tpu.parallel.batch import fhew_gate_batch
    from learn_fhe_tpu.utils.primes import two_adic_primes

    rng = np.random.default_rng(0)
    q = next(two_adic_primes(28, 10))
    params = BootstrapParams(
        RgswParams(RlweParams(q=q, p=4, log_n=9, log_b=7, d=4), log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=100, log_b=4, d=4),
        w=10,
    )
    zsk = rlwe.sk_gen(params.rlwe, rng)
    t0 = time.time()
    key = boot.key_gen(params, zsk, rng)
    jax.block_until_ready(key.brk_a)
    keygen_s = time.time() - t0

    B = args.batch or 128
    m0 = rng.integers(0, 2, size=B)
    m1 = rng.integers(0, 2, size=B)
    lz = params.lwe_z
    c0 = lwe.sk_encrypt(lz, np.asarray(zsk), lwe.encode(lz, jnp.asarray(m0.astype(np.uint64))), rng)
    c1 = lwe.sk_encrypt(lz, np.asarray(zsk), lwe.encode(lz, jnp.asarray(m1.astype(np.uint64))), rng)

    t0 = time.time()
    out = fhew_gate_batch(params, key, "nand", c0, c1)
    fetch_sync(out.b)
    compile_s = time.time() - t0
    got = np.asarray(lwe.decode(lz, lwe.decrypt(lz, np.asarray(zsk), out)))
    want = (~(m0.astype(bool) & m1.astype(bool))).astype(int)
    assert np.array_equal((got == 1).astype(int), want), "gate output wrong"

    t0 = time.time()
    for _ in range(args.iters):
        out = fhew_gate_batch(params, key, "nand", c0, c1)
    fetch_sync(out.b)
    dt = time.time() - t0
    gps = B * args.iters / dt
    print(
        json.dumps(
            {
                "metric": "fhew_nand_gates_per_sec_per_chip",
                "value": round(gps, 3),
                "unit": "gates/s",
                "vs_baseline": round(gps / PER_CHIP_BASELINE, 4),
                **_compile_keys(compile_s),
            }
        )
    )
    import sys

    print(
        f"# fhew q={q} N=512 n=100 batch={B} keygen={keygen_s:.1f}s "
        f"compile_wall={compile_s:.1f}s compile_helper={_COMPILES['total_s']:.1f}s "
        f"steady={dt:.2f}s device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_ntt(args):
    """Negacyclic polymuls/sec/chip at N=2^14 (BASELINE.json's kernel-level
    metric), u64 and u32 engines, with the %-of-HBM-roofline each achieves.

    Roofline model: the transform is HBM-bandwidth bound (ARCHITECTURE §5) —
    radix-4 fused passes touch the whole (B, N) array ceil(log2(N)/2) times
    (read+write); one polymul = 3 transforms + a pointwise pass + the chain's
    mixing add. v5e HBM ~819 GB/s. Iterations are chained inside one jit with
    data dependencies (per-call tunnel timings are unreliable, CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    from learn_fhe_tpu.ops.ntt import negacyclic_mul, ntt_plan
    from learn_fhe_tpu.ops.ntt32 import negacyclic_mul32, ntt32_plan
    from learn_fhe_tpu.ops.modular import add_mod
    from learn_fhe_tpu.ops.modular32 import add_mod32
    from learn_fhe_tpu.utils.primes import two_adic_primes

    rng = np.random.default_rng(0)
    log_n, n = 14, 1 << 14
    B = (args.batch or 256) if not args.smoke else 4
    K = 10 if not args.smoke else 2
    reps = max(args.iters, 8)  # keep the timed region well above sync overhead
    hbm_bw = 819e9  # v5e HBM GB/s (public spec)

    import os as _os

    u32_fused = _os.environ.get("FHE_TPU_NTT32_FUSE", "0") == "1"

    def roofline(itemsize, passes, fused):
        # each fused pass reads+writes the whole array. Unfused: 3 transforms
        # + pointwise + the chain's mixing add = 6*passes + 6 touches. With
        # the pointwise product fused into the last-forward/first-inverse
        # pass (FHE_TPU_NTT32_FUSE=1; measured slower, see ntt32.py), the
        # NTT-domain operands and product never round-trip: 4(p-1) pre-fwd
        # + 3 fused middle + 2(p-1) post-inv + 3 mix = 6*passes touches.
        touches = 6 * passes if fused else 6 * passes + 6
        return hbm_bw / (itemsize * n * touches)

    # passes follow each engine's ACTIVE schedule (u64 is fixed radix-4;
    # u32 honors FHE_TPU_NTT32_PASS_WIDTH), so the printed %-of-roofline is
    # judged against the bytes the measured kernel actually moves
    from learn_fhe_tpu.ops import ntt32 as _n32

    passes_by = {"u64": (log_n + 1) // 2, "u32": len(_n32._fwd_schedule(log_n))}

    results = {}
    for name, log_q, plan_fn, mul_fn, add_fn, dtype in (
        ("u64", 55, ntt_plan, negacyclic_mul, add_mod, np.uint64),
        ("u32", 31, ntt32_plan, negacyclic_mul32, add_mod32, np.uint32),
    ):
        q = next(two_adic_primes(log_q, log_n + 1))
        if name == "u32" and getattr(args, "fourstep", False):
            plan = plan_fn(q, n, fourstep=True)
        else:
            plan = plan_fn(q, n)
        a = jnp.asarray(rng.integers(0, q, size=(B, n), dtype=dtype))
        b = jnp.asarray(rng.integers(0, q, size=(B, n), dtype=dtype))

        def body(i, ab, mul_fn=mul_fn, add_fn=add_fn, plan=plan, q=q):
            x, y = ab
            c = mul_fn(x, y, plan)
            return (c, add_fn(y, c, dtype(q)))

        f = jax.jit(lambda a, b: jax.lax.fori_loop(0, K, body, (a, b)))
        out = f(a, b)
        fetch_sync(out[0])  # compile + warm (incl. the sync probe's program)
        t0 = time.time()
        for _ in range(reps):
            out = f(*out)
        fetch_sync(out[0])
        dt = time.time() - t0
        pps = B * K * reps / dt
        if name == "u32" and getattr(args, "fourstep", False):
            # The four-step MXU path doesn't move the stage-schedule's bytes,
            # so the stage-plan roofline doesn't apply; report no fraction
            # rather than a misleading one (ADVICE r03).
            results[name] = (pps, float("nan"))
            continue
        frac = pps / roofline(np.dtype(dtype).itemsize, passes_by[name], name == "u32" and u32_fused)
        if frac > 1.0:
            import sys

            print(
                f"# WARNING {name}: measured {frac:.1%} of the HBM roofline "
                "— above the physical floor, timing/sync is suspect",
                file=sys.stderr,
            )
        results[name] = (pps, frac)

    pps64, frac64 = results["u64"]
    pps32, frac32 = results["u32"]
    print(
        json.dumps(
            {
                "metric": "ntt_2e14_polymuls_per_sec_per_chip",
                "value": round(pps64, 1),
                "unit": "polymuls/s",
                "vs_baseline": round(frac64, 4),  # 1.0 == HBM roofline
                **_compile_keys(),
            }
        )
    )
    import sys

    print(
        f"# ntt N=2^14 batch={B} chain={K} reps={reps}: u64 {pps64:.0f}/s "
        f"({100*frac64:.0f}% of HBM roofline {roofline(8, passes_by['u64'], False):.0f}/s, "
        f"{passes_by['u64']} passes), "
        f"u32 {pps32:.0f}/s ("
        + (
            "four-step MXU path: stage-plan roofline inapplicable"
            if math.isnan(frac32)
            else f"{100*frac32:.0f}% of roofline "
            f"{roofline(4, passes_by['u32'], u32_fused):.0f}/s, {passes_by['u32']}"
            f"{' fused-pw' if u32_fused else ''} passes"
        )
        + "), "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_scaling(args):
    """Ops/s scaling-efficiency harness (BASELINE metric "scaling eff at
    1 chip / 1 host / >=2 hosts"): batched TFHE PBS throughput at 1/2/4/8
    mesh devices, batch sharded over 'batch'.

    On real multi-chip hardware this measures ICI scaling (run with
    `--platform native` when a pod slice exists); in this image only one TPU
    chip is reachable, so the default `--platform cpu-mesh` runs on a virtual
    8-device CPU mesh. The printed efficiency is
    throughput(D) / (D * throughput(1)); the result is also persisted to
    SCALING.json next to this script.
    """
    import os

    if args.platform == "cpu-mesh":
        # must win before any backend init: force a CPU mesh with 8 devices
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:  # --platform native: measure real multi-device scaling over ICI
        import jax
    import jax.numpy as jnp

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
    from learn_fhe_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    rng = np.random.default_rng(0)
    params = BootstrapParams(
        TlweParams(log_p=2, padding=1, n=64, std_dev=1.34e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=256, k=1, std_dev=2.85e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, rng)
    key = key_gen(params, z, rng)
    tab = lut_table(2, 256, lambda v: v)
    v_enc = tglwe.encode(params.tglwe, jnp.asarray(tab))
    B = args.batch or 64
    ms = rng.integers(0, 4, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    a2n, b2n = mod_switch_2n(cts, params.big_n)

    results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        mesh = make_mesh(n_batch=n_dev, n_limb=1, devices=jax.devices()[:n_dev])
        key_r = jax.tree.map(lambda x: replicate(mesh, x), key)
        v_r = replicate(mesh, v_enc)
        a_s, b_s = shard_batch(mesh, a2n), shard_batch(mesh, b2n)
        out = tfhe_pbs_batch_device(params, key_r, v_r, a_s, b_s)  # compile+warm
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = tfhe_pbs_batch_device(params, key_r, v_r, a_s, b_s)
        jax.block_until_ready(out)
        results[n_dev] = B * args.iters / (time.time() - t0)
    base = results[1]

    # -- CKKS mul, LIMB axis sharded (tp-like: the chatty axis) ----------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learn_fhe_tpu.models.ckks import ckks as Ck

    cparams = Ck.CkksParams(log_n=7, log_qi=45, big_l=8)
    csk = Ck.sk_gen(cparams, rng)
    crlk = Ck.rlk_gen(cparams, csk, rng)
    mm = (rng.standard_normal(cparams.l) + 1j * rng.standard_normal(cparams.l)) * 0.5
    cct = Ck.sk_encrypt(cparams, csk, Ck.encode(cparams, mm), cparams.qs, rng)
    ckks_results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        lmesh = make_mesh(n_batch=1, n_limb=n_dev, devices=jax.devices()[:n_dev])
        sl = lambda x: jax.device_put(x, NamedSharding(lmesh, P("limb", None)))
        ct_s = Ck.CkksCiphertext(sl(cct.b), sl(cct.a), cct.qs)
        rlk_s = Ck.CkksKeySwitchingKey(sl(crlk.b), sl(crlk.a), crlk.qs)
        out = Ck.mul(cparams, rlk_s, ct_s, ct_s)
        jax.block_until_ready((out.b, out.a))
        t0 = time.time()
        for _ in range(args.iters):
            out = Ck.mul(cparams, rlk_s, ct_s, ct_s)
        jax.block_until_ready((out.b, out.a))
        ckks_results[n_dev] = args.iters / (time.time() - t0)

    # -- u32 NTT polymul, COEFFICIENT axis sharded over the whole mesh --------
    from learn_fhe_tpu.ops.ntt32 import negacyclic_mul32, ntt32_plan
    from learn_fhe_tpu.parallel.coef import coef_mesh, shard_coef
    from learn_fhe_tpu.parallel.coef32 import coef32_sharded_mul
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q32 = next(two_adic_primes(28, 15))
    n32 = 1 << 14
    na = rng.integers(0, q32, size=(4, n32)).astype(np.uint32)
    nb = rng.integers(0, q32, size=(4, n32)).astype(np.uint32)
    ntt_results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > jax.device_count():
            break
        if n_dev == 1:
            plan32 = ntt32_plan(q32, n32)
            run = lambda: negacyclic_mul32(jnp.asarray(na), jnp.asarray(nb), plan32)
        else:
            cm = coef_mesh(n_dev, devices=jax.devices()[:n_dev])
            sa = shard_coef(cm, jnp.asarray(na))
            sb = shard_coef(cm, jnp.asarray(nb))
            run = lambda: coef32_sharded_mul(cm, sa, sb, q32)
        out = run()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
        ntt_results[n_dev] = 4 * args.iters / (time.time() - t0)
    eff8 = results.get(8, results[max(results)]) / (max(results) * base)
    row = {
        "metric": "tfhe_pbs_scaling_efficiency_8dev",
        "value": round(eff8, 4),
        "unit": "throughput(D)/(D*throughput(1))",
        "vs_baseline": round(eff8, 4),
        **_compile_keys(),
    }
    print(json.dumps(row))
    import pathlib
    import sys

    def curve(res):
        b1 = res[1]
        return {
            "throughput": {str(d): round(v, 2) for d, v in res.items()},
            "efficiency": {str(d): round(v / (d * b1), 4) for d, v in res.items()},
            "aggregate_vs_1dev": {str(d): round(v / b1, 4) for d, v in res.items()},
        }

    artifact = dict(
        row,
        platform=jax.devices()[0].platform,
        batch=B,
        per_device_throughput={str(d): round(v, 1) for d, v in results.items()},
        efficiency={
            str(d): round(v / (d * base), 4) for d, v in results.items()
        },
        workloads={
            "tfhe_pbs_batch64": curve(results),
            "ckks_mul_limb_sharded_l8p8_n128": curve(ckks_results),
            "ntt32_polymul_coef_sharded_n2e14": curve(ntt_results),
        },
        # On the virtual CPU mesh all D "devices" share this host's single
        # core, so per-device efficiency is bounded by ~1/D by construction
        # and measures nothing about ICI. The meaningful single-host signal
        # is aggregate throughput vs 1 device: >= 1.0 means the sharded
        # program adds no overhead over the unsharded one (collectives and
        # resharding are free at this batch); real ICI efficiency needs
        # --platform native on a pod slice.
        aggregate_vs_1dev={
            str(d): round(v / base, 4) for d, v in results.items()
        },
    )
    pathlib.Path(__file__).with_name("SCALING.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )

    print(
        "# scaling "
        + ", ".join(
            f"{d}dev {v:.0f}/s (eff {v / (d * base):.2f})" for d, v in results.items()
        )
        + f" batch={B} platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_ckks(args):
    """CKKS homomorphic multiplies (tensor + hybrid relinearize + rescale)
    per second at a production shape: N=2^13, L=8 55-bit q-primes + 8
    p-primes (the reference fixture's prime sizes, `ckks.rs:306`)."""
    import jax
    import numpy as np_  # noqa: F401

    from learn_fhe_tpu.models.ckks import ckks as C

    rng = np.random.default_rng(0)
    params = C.CkksParams(log_n=13, log_qi=55, big_l=8)
    t0 = time.time()
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    keygen_s = time.time() - t0

    m0 = rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    m1 = rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ct0 = C.sk_encrypt(params, sk, C.encode(params, m0), params.qs, rng)
    ct1 = C.sk_encrypt(params, sk, C.encode(params, m1), params.qs, rng)

    t0 = time.time()
    out = C.mul(params, rlk, ct0, ct1)
    fetch_sync(out.b)
    compile_s = time.time() - t0
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = float(np.max(np.abs(got - m0 * m1)))
    assert err < 1e-6, err

    iters = max(args.iters * 10, 30)
    t0 = time.time()
    for _ in range(iters):
        out = C.mul(params, rlk, ct0, ct1)
    fetch_sync(out.b)
    dt = time.time() - t0
    mps = iters / dt
    print(
        json.dumps(
            {
                "metric": "ckks_mul_relin_rescale_per_sec_per_chip",
                "value": round(mps, 3),
                "unit": "muls/s",
                "vs_baseline": round(mps / PER_CHIP_BASELINE, 4),
                **_compile_keys(compile_s),
            }
        )
    )
    import sys

    print(
        f"# ckks N=8192 L=8 log_qi=55 keygen={keygen_s:.1f}s "
        f"compile_wall={compile_s:.1f}s compile_helper={_COMPILES['total_s']:.1f}s "
        f"steady={dt:.2f}s err={err:.2e} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_ckks_bootstrap(args):
    """Full CKKS bootstrap (mod_raise -> CoeffToSlot -> EvalMod sine ->
    SlotToCoeff) wall time at N=2^10 with a sparse ternary secret (h=64) —
    a capability BEYOND the reference (its bootstrapping.rs stops at the
    linear transforms). Reports warm seconds per bootstrap + the recovered
    precision."""
    import jax

    from learn_fhe_tpu.models.ckks import bootstrapping as B
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.models.ckks import evalmod as E

    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    log_n = 5 if args.smoke else (args.log_n or 10)
    # N=2^13 spends two more levels in the 4-chunk CtS/StC at l=4096
    # (tests/test_ckks_bootstrap.py::test_full_bootstrap_n8192); the
    # high-precision config (--hi-prec: 60-bit primes + arcsine correction,
    # ARCHITECTURE 16) spends two more in EvalMod
    big_l = 20 if args.smoke else (23 if log_n >= 13 else 21)
    log_qi = 55
    if getattr(args, "hi_prec", False):
        big_l += 2
        log_qi = 60
    batch = args.batch or (1 if args.smoke else (2 if log_n >= 13 else 8))
    params = C.CkksParams(log_n=log_n, log_qi=log_qi, big_l=big_l)
    if not args.smoke:
        # overlap the per-level mul/rotate compiles with keygen (the remote
        # compile helper serves concurrent requests, ARCHITECTURE §10)
        from learn_fhe_tpu.models.ckks.warmup import prewarm_ckks_pipelines

        prewarm_ckks_pipelines(params)
    t0 = time.time()
    sk = C.sk_gen_sparse(params, min(64, params.n // 2), rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    keygen_s = time.time() - t0

    ms = [
        (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
        for _ in range(batch)
    ]
    lows = [
        C.to_level(
            C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng),
            (params.qs[0],),
        )
        for m in ms
    ]
    low = (
        lows[0]
        if batch == 1
        else C.CkksCiphertext(
            jnp.stack([c.b for c in lows]),
            jnp.stack([c.a for c in lows]),
            (params.qs[0],),
        )
    )
    em = E.EvalModParams(k=24, r=4, degree=34, arcsin=getattr(args, "hi_prec", False))

    t0 = time.time()
    out = E.bootstrap(params, bk, rlk, cjk, low, em)
    fetch_sync(out.b)
    cold_s = time.time() - t0

    iters = max(1, args.iters)
    t0 = time.time()
    for _ in range(iters):
        out = E.bootstrap(params, bk, rlk, cjk, low, em)
    fetch_sync(out.b)
    warm_s = (time.time() - t0) / iters / batch  # per ciphertext

    rel_bits = float("inf")
    for i, m in enumerate(ms):
        one = out if batch == 1 else C.CkksCiphertext(out.b[i], out.a[i], out.qs)
        got = C.decode(params, C.decrypt(params, sk, one), out.qs)
        err = float(np.max(np.abs(got - m)))
        assert err < float(np.max(np.abs(m))) * 0.05, (i, err)
        rel_bits = min(rel_bits, -np.log2(err / float(np.max(np.abs(m)))))
    print(
        json.dumps(
            {
                "metric": "ckks_bootstrap_seconds_per_ct",
                "value": round(warm_s, 3),
                "unit": f"s/bootstrap (N=2^{log_n}, batch {batch}, "
                f"{len(out.qs)} levels left, {rel_bits:.1f} rel bits)",
                "vs_baseline": 0.0,
                **_compile_keys(cold_s),
            }
        )
    )
    import sys

    print(
        f"# ckks_bootstrap N=2^{log_n} batch={batch} keygen={keygen_s:.1f}s "
        f"compile_wall={cold_s:.1f}s compile_helper={_COMPILES['total_s']:.1f}s "
        f"warm={warm_s:.3f}s/ct levels_left={len(out.qs)} "
        f"bits={rel_bits:.1f} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
