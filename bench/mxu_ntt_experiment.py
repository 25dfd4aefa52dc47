"""Experiment: four-step negacyclic NTT on the MXU with 8-bit limb matmuls.

N = N1 x N2 (16 x 128): stage-1 = (N1 x N1) twiddle matmul, elementwise
twiddle, stage-2 = (N2 x N2) cyclic-DFT matmul, with the ntt32 bit-reversed
output permutation folded into the matrix rows/columns. Exact arithmetic via
4 balanced base-256 limbs per operand (16 int8 matmuls per stage, bucketed
by limb-degree, i32 accumulation, signed-Shoup recombination mod q).

MEASURED (v5e, in-jit chained, 128 polys N=2048): bit-exact vs ntt32, and
~13% faster than the radix-4 XLA path (246 vs 278 us) — NOT integrated:
the limb-extraction and bucket-combine passes move more HBM bytes than the
butterflies they replace, and the pipeline is HBM-bound (ARCHITECTURE.md
section 6). The experiment stays here as the starting point for a future
Pallas kernel that fuses the limb/combine math around the MXU matmuls.

Run: python bench/mxu_ntt_experiment.py
"""
import time
import jax; jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from learn_fhe_tpu.ops.ntt32 import ntt32, intt32, ntt32_plan
from learn_fhe_tpu.ops.modular32 import mul_shoup32, shoup32
from learn_fhe_tpu.utils.primes import two_adic_primes, two_adic_generator

N, B = 2048, 128
N1, N2 = 16, 128
q = next(two_adic_primes(31, 14))
plan = ntt32_plan(q, N)

def bitrev(x, bits):
    r = 0
    for t in range(bits):
        r |= ((x >> t) & 1) << (bits - 1 - t)
    return r

psi = two_adic_generator(q, 12)  # order 2N = 4096
w = pow(psi, 2, q)               # order N
# Stage-1 matrix: V1[k1, i1] = psi^(N2*(2*rev4(k1)+1)*i1 mod 2N)
V1 = np.zeros((N1, N1), dtype=np.uint64)
for k1 in range(N1):
    kk = bitrev(k1, 4)
    for i1 in range(N1):
        V1[k1, i1] = pow(psi, (N2 * (2 * kk + 1) * i1) % (2 * N), q)
# Twiddle: T[k1, i2] = psi^((2*rev4(k1)+1)*i2)
T = np.zeros((N1, N2), dtype=np.uint64)
for k1 in range(N1):
    kk = bitrev(k1, 4)
    for i2 in range(N2):
        T[k1, i2] = pow(psi, ((2 * kk + 1) * i2) % (2 * N), q)
# Stage-2 matrix: W2[i2, k2] = w^(N1 * i2 * rev7(k2) mod N)
W2 = np.zeros((N2, N2), dtype=np.uint64)
for i2 in range(N2):
    for k2 in range(N2):
        W2[i2, k2] = pow(w, (N1 * i2 * bitrev(k2, 7)) % N, q)

def balanced_limbs_np(M):
    """4 balanced base-256 limbs of the CENTERED representative mod q."""
    t = M.astype(np.int64)
    t = np.where(t > q // 2, t - q, t)
    limbs = []
    for _ in range(4):
        d = ((t + 128) & 255) - 128
        limbs.append(d.astype(np.int8))
        t = (t - d) >> 8
    assert (t == 0).all()
    return limbs

V1_l = balanced_limbs_np(V1)
W2_l = balanced_limbs_np(W2)
T_j = jnp.asarray(T.astype(np.uint32))
T_s = jnp.asarray(shoup32(T.astype(np.uint32), q))
P32 = [np.uint32((1 << (8 * s)) % q) for s in range(7)]
P32_s = [np.uint32(int(shoup32((1 << (8 * s)) % q, q)[()])) for s in range(7)]
K32 = [np.uint32(((1 << 32) * ((1 << (8 * s)) % q)) % q) for s in range(7)]

def balanced_limbs_dev(x):
    """x: u32 [0, q) -> centered -> 4 s8 limb planes."""
    t = x.astype(jnp.int32)
    t = jnp.where(t > q // 2, t - np.int32(q), t)
    outs = []
    for _ in range(4):
        d = ((t + 128) & 255) - 128
        outs.append(d.astype(jnp.int8))
        t = (t - d) >> 8
    return outs

def combine(P, q):
    """P: list of 7 i32 bucket sums -> mod q via signed shoup."""
    acc = None
    for s in range(7):
        a = P[s].astype(jnp.uint32)      # two's complement
        neg = (P[s] < 0).astype(jnp.uint32)
        r = mul_shoup32(a, P32[s], P32_s[s], q)
        r = r - neg * K32[s]             # subtract 2^32*c_s for negatives
        r = jnp.minimum(r, r + np.uint32(q))  # wrap fix: r may be "negative"
        acc = r if acc is None else acc + r
        acc = jnp.minimum(acc, acc - np.uint32(q))
    return acc

def limb_matmul(X_l, M_l, dims):
    """sum_{i,j} (X_i @ M_j) * 2^{8(i+j)} bucketed: returns list of 7 i32."""
    buckets = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jax.lax.dot_general(X_l[i], M_l[j], dims, preferred_element_type=jnp.int32)
            s = i + j
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return buckets

V1_lj = [jnp.asarray(v) for v in V1_l]
W2_lj = [jnp.asarray(v) for v in W2_l]

def ntt_mxu(x):  # x: (B, N) u32
    M = x.reshape(B, N1, N2)
    Xl = balanced_limbs_dev(M)
    # stage 1: y[b, k1, i2] = sum_i1 V1[k1,i1] * M[b,i1,i2]
    dims = (((1,), (1,)), ((), ()))  # V1 (N1,N1) x M... use dot_general per limb with batch
    # easier: einsum 'ki,bin->bkn'
    buckets = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jnp.einsum('ki,bin->bkn', V1_lj[j].astype(jnp.int8), Xl[i],
                           preferred_element_type=jnp.int32)
            s = i + j
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    y = combine(buckets, q)                      # (B, N1, N2) u32
    y = mul_shoup32(y, T_j[None], T_s[None], q)  # twiddle
    # stage 2: z[b, k1, k2] = sum_i2 y[b,k1,i2] * W2[i2,k2]
    Yl = balanced_limbs_dev(y)
    buckets = [None] * 7
    for i in range(4):
        for j in range(4):
            p = jnp.einsum('bki,in->bkn', Yl[i], W2_lj[j].astype(jnp.int8),
                           preferred_element_type=jnp.int32)
            s = i + j
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    z = combine(buckets, q)
    return z.reshape(B, N)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, q, size=(B, N), dtype=np.uint32))
f_mxu = jax.jit(ntt_mxu)
f_std = jax.jit(lambda v: ntt32(v, plan))
r_mxu = np.asarray(f_mxu(x))
r_std = np.asarray(f_std(x))
print("mxu == std:", np.array_equal(r_mxu, r_std))
if not np.array_equal(r_mxu, r_std):
    print("first mismatch:", np.argwhere(r_mxu != r_std)[:3], r_mxu[0,:4], r_std[0,:4])

# in-jit chained timing
K = 30
@jax.jit
def loop_mxu(v):
    return jax.lax.fori_loop(0, K, lambda i, a: ntt_mxu(a), v)
@jax.jit
def loop_std(v):
    return jax.lax.fori_loop(0, K, lambda i, a: ntt32(a, plan), v)
for name, f in [("mxu", loop_mxu), ("radix4-xla", loop_std)]*2:
    out = jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(5): out = f(x)
    jax.block_until_ready(out)
    print(f"{name:10s}: {(time.time()-t0)/5/K*1e6:7.1f} us per (128-poly, N=2048) fwd")
