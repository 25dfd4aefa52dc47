"""Microbenchmark probes behind ARCHITECTURE.md's numbers.

Run on the target chip:  python bench/microbench.py [--quick]

NOTE: per-call dispatch timings through the tunneled TPU vary wildly with
queue/thermal state; the NTT section chains its iterations inside one jit,
and end-to-end pipeline benchmarks (bench.py) are the authoritative numbers.

Sections:
  1. VPU ceilings: u32 add / mul / fused chains.
  2. Shoup modmul chains: u64 lanes vs u32 lanes.
  3. Batched negacyclic NTT N=2048: u64 (51-bit prime) vs u32 (31-bit prime),
     reshape vs roll formulations, and the Pallas roll kernel.
  4. MXU probes: int8 and bf16 2048^3 matmuls (the four-step NTT budget).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from learn_fhe_tpu.ops.modular import mulhi64
from learn_fhe_tpu.ops.modular32 import mulhi32
from learn_fhe_tpu.ops.ntt import ntt, ntt_plan
from learn_fhe_tpu.ops.ntt32 import ntt32, ntt32_plan
from learn_fhe_tpu.utils.primes import two_adic_primes

SH = (64, 2048)


def timeit(name, fn, *args, iters=100, work=None):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    extra = f" -> {work / dt / 1e9:8.1f} G/s" if work else ""
    print(f"{name:36s}: {dt*1e6:9.1f} us{extra}")
    return out


def section_vpu(chain):
    def add_chain(x):
        for i in range(chain):
            x = x + np.uint32(i | 1)
        return x

    def mul_chain(x):
        for i in range(chain):
            x = x * np.uint32(i | 1)
        return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=SH, dtype=np.uint32))
    n = np.prod(SH) * chain
    timeit("u32 add chain (VPU ceiling)", add_chain, x, work=n)
    timeit("u32 mul chain", mul_chain, x, work=n)


def section_shoup(chain):
    rng = np.random.default_rng(0)
    q64 = next(two_adic_primes(51, 14))
    q32 = next(two_adic_primes(31, 14))

    def chain64(a):
        for i in range(chain):
            w = (i * 1234567 + 7) % q64
            ws = (w << 64) // q64
            hi = mulhi64(a, np.uint64(ws))
            r = a * np.uint64(w) - hi * np.uint64(q64)
            a = jnp.where(r >= np.uint64(q64), r - np.uint64(q64), r)
        return a

    def chain32(a):
        for i in range(chain):
            w = (i * 12347 + 7) % q32
            ws = (w << 32) // q32
            hi = mulhi32(a, np.uint32(ws))
            r = a * np.uint32(w) - hi * np.uint32(q32)
            a = jnp.where(r >= np.uint32(q32), r - np.uint32(q32), r)
        return a

    a64 = jnp.asarray(rng.integers(0, q64, size=SH, dtype=np.uint64))
    a32 = jnp.asarray(rng.integers(0, q32, size=SH, dtype=np.uint32))
    n = np.prod(SH) * chain
    timeit("shoup modmul chain, u64 lanes", chain64, a64, work=n)
    timeit("shoup modmul chain, u32 lanes", chain32, a32, work=n)


def section_ntt():
    """Chained inside one jit: per-call dispatch on the tunneled TPU is
    unreliable (idle-burst readings vary 10-40x), so K dependent round-trips
    run per dispatch and the reported time is per single transform."""
    from learn_fhe_tpu.ops.ntt import intt
    from learn_fhe_tpu.ops.ntt32 import intt32

    rng = np.random.default_rng(0)
    n = 2048
    K = 50
    q64 = next(two_adic_primes(51, 14))
    q32 = next(two_adic_primes(31, 14))
    x64 = jnp.asarray(rng.integers(0, q64, size=SH, dtype=np.uint64))
    x32 = jnp.asarray(rng.integers(0, q32, size=SH, dtype=np.uint32))
    p64 = ntt_plan(q64, n)
    p32 = ntt32_plan(q32, n)

    def loop64(v):
        return jax.lax.fori_loop(0, K, lambda i, a: intt(ntt(a, p64), p64), v)

    def loop32(v):
        return jax.lax.fori_loop(0, K, lambda i, a: intt32(ntt32(a, p32), p32), v)

    f64, f32 = jax.jit(loop64), jax.jit(loop32)
    for name, f, x in [("u64", f64, x64), ("u32", f32, x32)]:
        jax.block_until_ready(f(x))
        t0 = time.time()
        for _ in range(5):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 5 / K / 2
        print(f"NTT N=2048 x64 polys, {name} lanes  : {dt*1e6:9.1f} us/transform (in-jit chained)")


def section_mxu():
    rng = np.random.default_rng(0)
    m = 2048
    a8 = jnp.asarray(rng.integers(-128, 127, size=(m, m), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-128, 127, size=(m, m), dtype=np.int8))
    abf = jnp.asarray(rng.random((m, m), dtype=np.float32)).astype(jnp.bfloat16)
    flops = 2 * m**3

    timeit(
        "MXU int8 matmul 2048^3",
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        a8,
        b8,
        work=flops,
    )
    timeit(
        "MXU bf16 matmul 2048^3",
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
        abf,
        abf,
        work=flops,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    chain = 64 if args.quick else 256
    print(f"device: {jax.devices()[0]}")
    section_vpu(chain)
    section_shoup(chain)
    section_ntt()
    section_mxu()
