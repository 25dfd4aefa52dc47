"""Experiment: batch-tiled whole-transform-in-VMEM Pallas NTT at N=2^14.

VERDICT r2 task 1 route (b): the XLA radix-4 stage path sweeps HBM
ceil(14/2) = 7 times per transform (49% of roofline); a Pallas kernel that
loads a (TB, N) batch tile once and runs all 14 stages in VMEM reduces the
HBM traffic per polymul to its inputs+output — the true floor.

Construct constraints (bisected in round 2, ARCHITECTURE section 5):
- NO unsigned jnp.minimum (crashes Mosaic) -> where-based conditional adds.
- NO (m, 1, 1)-shaped twiddle broadcasts for m >= 2 -> this kernel uses a
  DENSE per-position twiddle vector (LOGN, N) and a roll-based butterfly:
    lower i: u + w*b = x[i] + tv[i+half]
    upper i: u - w*b = x[i-half] - tv[i]
  where tv = shoup_mul(x, W_dense) and the rolls are static slice+concat.
- Scoped-VMEM blowup ~2.7 arrays/stage for unrolled stages (measured): a
  (8, 16384) u32 tile (512 KB) keeps the whole 14-stage unroll ~20 MB.

Run (CPU check, interpret mode): JAX_PLATFORMS=cpu python bench/pallas_ntt14_experiment.py --check
Run (TPU bench):                 python bench/pallas_ntt14_experiment.py
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# --check runs on CPU in interpret mode; force the platform BEFORE any
# backend touch (the ambient axon plugin hangs when the tunnel is down)
if "--check" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learn_fhe_tpu.ops.modular32 import mul_mod32, shoup32
from learn_fhe_tpu.ops.ntt32 import intt32, ntt32, ntt32_plan
from learn_fhe_tpu.utils.primes import two_adic_primes

M16 = np.uint32(0xFFFF)
S16 = np.uint32(16)


def mulhi32(a, b):
    a0, a1 = a & M16, a >> S16
    b0, b1 = b & M16, b >> S16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    mid = (ll >> S16) + (lh & M16) + (hl & M16)
    return (a1 * b1) + (lh >> S16) + (hl >> S16) + (mid >> S16)


def sh(a, w, ws, q):
    """Shoup modmul against a precomputed dual; fully reduced."""
    r = a * w - mulhi32(a, ws) * np.uint32(q)
    return jnp.where(r >= np.uint32(q), r - np.uint32(q), r)


def addm(a, b, q):
    s = a + b
    return jnp.where(s >= np.uint32(q), s - np.uint32(q), s)


def subm(a, b, q):
    return jnp.where(a >= b, a - b, a - b + np.uint32(q))


def roll_n(v, k):
    """roll(v, k) along the last axis with STATIC k (slice+concat lowering)."""
    k %= v.shape[-1]
    if k == 0:
        return v
    return jnp.concatenate([v[..., -k:], v[..., :-k]], axis=-1)


def dense_tables(plan):
    """Per-stage dense (N,) twiddle vectors + lower-half masks.

    Stage L of the merged-twist DIT forward (ntt32 convention): m = 2^L
    groups of size 2*half, half = N >> (L+1); group g uses psi_br[m+g] at
    every position of the group. Inverse (GS) mirrors with psi_inv_br.
    """
    n, log_n = plan.n, plan.log_n
    idx = np.arange(n)
    W = np.zeros((log_n, n), dtype=np.uint32)
    WI = np.zeros((log_n, n), dtype=np.uint32)
    MASK = np.zeros((log_n, n), dtype=np.uint32)
    for L in range(log_n):
        m = 1 << L
        half = n >> (L + 1)
        g = idx // (2 * half)
        W[L] = np.asarray(plan.psi_br)[m + g]
        WI[L] = np.asarray(plan.psi_inv_br)[m + g]
        MASK[L] = ((idx // half) % 2 == 0).astype(np.uint32)
    q = plan.zq.q
    WS = np.asarray(shoup32(W, q), dtype=np.uint32)
    WIS = np.asarray(shoup32(WI, q), dtype=np.uint32)
    return (
        jnp.asarray(W),
        jnp.asarray(WS),
        jnp.asarray(WI),
        jnp.asarray(WIS),
        jnp.asarray(MASK),
    )


def _fwd_stages(x, w_ref, ws_ref, mask_ref, log_n, n, q):
    for L in range(log_n):
        half = n >> (L + 1)
        w = w_ref[L][None, :]
        ws = ws_ref[L][None, :]
        low = mask_ref[L][None, :] != 0
        tv = sh(x, w, ws, q)
        x = jnp.where(
            low, addm(x, roll_n(tv, -half), q), subm(roll_n(x, half), tv, q)
        )
    return x


def _inv_stages(x, wi_ref, wis_ref, mask_ref, log_n, n, q, n_inv, n_inv_s):
    for L in reversed(range(log_n)):
        half = n >> (L + 1)
        wi = wi_ref[L][None, :]
        wis = wis_ref[L][None, :]
        low = mask_ref[L][None, :] != 0
        # lower: u+v = x[i] + x[i+half]; upper: (u-v)*wi = (x[i-half]-x[i])*wi
        x = jnp.where(
            low,
            addm(x, roll_n(x, -half), q),
            sh(subm(roll_n(x, half), x, q), wi, wis, q),
        )
    return sh(x, np.uint32(n_inv), np.uint32(n_inv_s), q)


def make_kernels(q, n, log_n, tb, n_inv, n_inv_s, interpret):
    def fwd_kernel(x_ref, w_ref, ws_ref, mask_ref, o_ref):
        o_ref[...] = _fwd_stages(x_ref[...], w_ref, ws_ref, mask_ref, log_n, n, q)

    def polymul_kernel(a_ref, b_ref, w_ref, ws_ref, wi_ref, wis_ref, mask_ref, o_ref):
        ea = _fwd_stages(a_ref[...], w_ref, ws_ref, mask_ref, log_n, n, q)
        eb = _fwd_stages(b_ref[...], w_ref, ws_ref, mask_ref, log_n, n, q)
        # pointwise Barrett-free: (ea*eb) mod q via 16-bit split against q
        lo = ea * eb
        hi = mulhi32(ea, eb)
        # fold 2^32 mod q: r = (hi * (2^32 mod q) + lo) mod q, both via shoup
        r = addm(sh(hi, R32, R32S, q), _red(lo, q), q)
        o_ref[...] = _inv_stages(r, wi_ref, wis_ref, mask_ref, log_n, n, q, n_inv, n_inv_s)

    def _red(v, q):
        # reduce a full u32 (< 2^32) mod q (q < 2^31): at most a few subtracts
        v = jnp.where(v >= np.uint32(2 * q), v - np.uint32(2 * q), v)
        return jnp.where(v >= np.uint32(q), v - np.uint32(q), v)

    # constants for the pointwise product: 2^32 mod q and its shoup dual
    R32 = np.uint32((1 << 32) % q)
    R32S = np.uint32(int(shoup32(np.uint32((1 << 32) % q), q)[()]))

    def call_fwd(x, W, WS, MASK):
        B = x.shape[0]
        return pl.pallas_call(
            fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda i: (i, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(x, W, WS, MASK)

    def call_polymul(a, b, W, WS, WI, WIS, MASK):
        B = a.shape[0]
        return pl.pallas_call(
            polymul_kernel,
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
            grid=(B // tb,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda i: (i, 0)),
                pl.BlockSpec((tb, n), lambda i: (i, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
                pl.BlockSpec((log_n, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(a, b, W, WS, WI, WIS, MASK)

    return call_fwd, call_polymul


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--log-n", type=int, default=14)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tb", type=int, default=8, help="batch tile rows per grid step")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    interpret = jax.default_backend() == "cpu"
    n = 1 << args.log_n
    q = next(two_adic_primes(31, args.log_n + 1))
    plan = ntt32_plan(q, n)
    W, WS, WI, WIS, MASK = dense_tables(plan)
    B = args.tb * 2 if args.check else args.batch
    call_fwd, call_polymul = make_kernels(
        q, n, args.log_n, args.tb, int(plan.n_inv), int(plan.n_inv_shoup), interpret
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, q, size=(B, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, q, size=(B, n), dtype=np.uint32))

    got = np.asarray(jax.jit(lambda v: call_fwd(v, W, WS, MASK))(a))
    want = np.asarray(jax.jit(lambda v: ntt32(v, plan))(a))
    print("pallas fwd == ntt32:", np.array_equal(got, want))

    pm = jax.jit(lambda x, y: call_polymul(x, y, W, WS, WI, WIS, MASK))
    got_pm = np.asarray(pm(a, b))
    want_pm = np.asarray(
        jax.jit(
            lambda x, y: intt32(mul_mod32(ntt32(x, plan), ntt32(y, plan), plan.zq), plan)
        )(a, b)
    )
    print("pallas polymul == stages:", np.array_equal(got_pm, want_pm))
    if args.check:
        assert np.array_equal(got, want) and np.array_equal(got_pm, want_pm)
        return
    assert np.array_equal(got_pm, want_pm)

    K = args.chain

    def chained(f):
        @jax.jit
        def run(x, y):
            def body(i, xy):
                x, y = xy
                return f(x, y), x

            return jax.lax.fori_loop(0, K, body, (x, y))

        return run

    def polymul_std(x, y):
        return intt32(mul_mod32(ntt32(x, plan), ntt32(y, plan), plan.zq), plan)

    for name, f in [("pallas", pm), ("stages", polymul_std)] * 2:
        run = chained(f)
        out = jax.block_until_ready(run(a, b))
        t0 = time.time()
        for _ in range(args.iters):
            out = run(a, b)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters / K
        print(f"{name:7s}: {B / dt:10.0f} polymuls/s  ({dt * 1e3:.2f} ms per {B}-batch)")


if __name__ == "__main__":
    main()
