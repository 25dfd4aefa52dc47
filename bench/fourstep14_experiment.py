"""Experiment: four-step negacyclic NTT polymul at N=2^14 = 128 x 128.

VERDICT r2 task 1: the N=2^14 u32 polymul runs at 49% of the HBM roofline
on the radix-4 stage path (7 read+write sweeps per transform). A four-step
formulation does the same transform as TWO (128,128) modular matmuls plus
one elementwise twiddle — the matmuls ride the MXU as int8 limb products
(exact: 4 balanced base-256 limbs, i32 accumulation, Shoup recombination),
and XLA fuses the limb extract/combine elementwise math into the dot
producers/consumers, which is what the parked N=2048 experiment
(mxu_ntt_experiment.py) could not get from separate passes.

Forward output order matches ntt32's bit-reversed convention (asserted),
inverse consumes it, so fourstep and stage paths interoperate freely.

Run (CPU check): JAX_PLATFORMS=cpu python bench/fourstep14_experiment.py --check
Run (TPU bench): python bench/fourstep14_experiment.py
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from learn_fhe_tpu.ops.modular32 import mul_mod32, mul_shoup32, shoup32
from learn_fhe_tpu.ops.ntt32 import intt32, ntt32, ntt32_plan
from learn_fhe_tpu.utils.primes import mod_inverse, two_adic_generator, two_adic_primes


def bitrev(x, bits):
    r = 0
    for t in range(bits):
        r |= ((x >> t) & 1) << (bits - 1 - t)
    return r


def build_mats(q, N, N1, N2):
    """Forward/inverse four-step matrices with ntt32's bit-reversed output
    order folded in.

    ntt32 computes X[k] = sum_i x[i] psi^((2*rev(k)+1) i) (negacyclic DIT,
    bit-reversed output). With i = i1*N2 + i2, k = k1*N2 + k2 (and rev(k) =
    rev_l2(k2)*N1 + rev_l1(k1) for the mixed-radix reversal):
      X[k1,k2] = sum_i2 [ (sum_i1 V1[k1,i1] x[i1,i2]) * T[k1,i2] ] W2[i2,k2]
    """
    log1, log2 = N1.bit_length() - 1, N2.bit_length() - 1
    psi = two_adic_generator(q, (N1 * N2).bit_length())  # order 2N
    w = pow(psi, 2, q)  # order N
    V1 = np.zeros((N1, N1), dtype=np.uint64)
    T = np.zeros((N1, N2), dtype=np.uint64)
    W2 = np.zeros((N2, N2), dtype=np.uint64)
    for k1 in range(N1):
        kk = bitrev(k1, log1)
        for i1 in range(N1):
            V1[k1, i1] = pow(psi, (N2 * (2 * kk + 1) * i1) % (2 * N1 * N2), q)
        for i2 in range(N2):
            T[k1, i2] = pow(psi, ((2 * kk + 1) * i2) % (2 * N1 * N2), q)
    for i2 in range(N2):
        for k2 in range(N2):
            W2[i2, k2] = pow(w, (N1 * i2 * bitrev(k2, log2)) % (N1 * N2), q)

    def inv_mod_matrix(M):
        """Inverse of M mod q by Gauss-Jordan over Z_q (exact python ints)."""
        n = M.shape[0]
        A = [[int(M[i, j]) for j in range(n)] + [int(i == j) for j in range(n)] for i in range(n)]
        for col in range(n):
            piv = next(r for r in range(col, n) if A[r][col] % q)
            A[col], A[piv] = A[piv], A[col]
            inv = mod_inverse(A[col][col] % q, q)
            A[col] = [v * inv % q for v in A[col]]
            for r in range(n):
                if r != col and A[r][col] % q:
                    f = A[r][col] % q
                    A[r] = [(a - f * b) % q for a, b in zip(A[r], A[col])]
        return np.array([[A[i][n + j] for j in range(n)] for i in range(n)], dtype=np.uint64)

    V1i = inv_mod_matrix(V1)
    W2i = inv_mod_matrix(W2)
    Ti = np.vectorize(lambda v: mod_inverse(int(v), q))(T).astype(np.uint64)
    return V1, T, W2, V1i, Ti, W2i


def balanced_limbs_dev(x, q):
    """u32 [0, q) -> centered -> 4 int8 limb planes (base 256, balanced)."""
    t = x.astype(jnp.int32)
    t = jnp.where(t > q // 2, t - np.int32(q), t)
    outs = []
    for _ in range(4):
        d = ((t + 128) & 255) - 128
        outs.append(d.astype(jnp.int8))
        t = (t - d) >> 8
    return outs


def make_fourstep(q, N, N1, N2, B):
    V1, T, W2, V1i, Ti, W2i = build_mats(q, N, N1, N2)

    def host_limbs(M):
        t = M.astype(np.int64)
        t = np.where(t > q // 2, t - q, t)
        limbs = []
        for _ in range(4):
            d = ((t + 128) & 255) - 128
            limbs.append(d.astype(np.int8))
            t = (t - d) >> 8
        assert (t == 0).all()
        return [jnp.asarray(v) for v in limbs]

    V1_l, W2_l = host_limbs(V1), host_limbs(W2)
    V1i_l, W2i_l = host_limbs(V1i), host_limbs(W2i)
    T_j = jnp.asarray(T.astype(np.uint32))
    T_s = jnp.asarray(shoup32(T.astype(np.uint32), q))
    Ti_j = jnp.asarray(Ti.astype(np.uint32))
    Ti_s = jnp.asarray(shoup32(Ti.astype(np.uint32), q))
    n_inv = mod_inverse(N % q, q)
    n_inv_s = int(shoup32(n_inv, q)[()])
    # per-limb-sum recombination constants: 2^{8s} mod q, Shoup duals, and
    # the 2^32 * 2^{8s} correction for negative i32 bucket sums
    P32 = [np.uint32((1 << (8 * s)) % q) for s in range(7)]
    P32_s = [np.uint32(int(shoup32((1 << (8 * s)) % q, q)[()])) for s in range(7)]
    K32 = [np.uint32(((1 << 32) * ((1 << (8 * s)) % q)) % q) for s in range(7)]

    def combine(buckets):
        acc = None
        for s in range(7):
            a = buckets[s].astype(jnp.uint32)
            neg = (buckets[s] < 0).astype(jnp.uint32)
            r = mul_shoup32(a, P32[s], P32_s[s], q)
            r = r - neg * K32[s]
            r = jnp.minimum(r, r + np.uint32(q))
            acc = r if acc is None else acc + r
            acc = jnp.minimum(acc, acc - np.uint32(q))
        return acc

    def mm_left(M_l, x):
        """(N1,N1) mod-q matmul over axis -2 of x: out[..,k,n] = sum_i M[k,i] x[..,i,n]."""
        Xl = balanced_limbs_dev(x, q)
        buckets = [None] * 7
        for i in range(4):
            for j in range(4):
                p = jnp.einsum(
                    "ki,...in->...kn", M_l[j], Xl[i], preferred_element_type=jnp.int32
                )
                s = i + j
                buckets[s] = p if buckets[s] is None else buckets[s] + p
        return combine(buckets)

    def mm_right(x, M_l):
        """(N2,N2) mod-q matmul over axis -1: out[..,k,n] = sum_i x[..,k,i] M[i,n]."""
        Xl = balanced_limbs_dev(x, q)
        buckets = [None] * 7
        for i in range(4):
            for j in range(4):
                p = jnp.einsum(
                    "...ki,in->...kn", Xl[i], M_l[j], preferred_element_type=jnp.int32
                )
                s = i + j
                buckets[s] = p if buckets[s] is None else buckets[s] + p
        return combine(buckets)

    def fwd(x):  # (B, N) u32 -> (B, N) u32, ntt32 bit-reversed order
        M = x.reshape(*x.shape[:-1], N1, N2)
        y = mm_left(V1_l, M)
        y = mul_shoup32(y, T_j, T_s, q)
        z = mm_right(y, W2_l)
        return z.reshape(*x.shape[:-1], N)

    def inv(z):  # exact inverse of fwd (the matrix inverses already carry
        # the 1/N normalization, so no extra n_inv factor)
        M = z.reshape(*z.shape[:-1], N1, N2)
        y = mm_right(M, W2i_l)
        y = mul_shoup32(y, Ti_j, Ti_s, q)
        x = mm_left(V1i_l, y)
        return x.reshape(*z.shape[:-1], N)

    return fwd, inv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="correctness only (small batch)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    N, N1, N2 = 1 << 14, 128, 128
    q = next(two_adic_primes(31, 15))
    plan = ntt32_plan(q, N)
    B = 4 if args.check else args.batch
    fwd, inv = make_fourstep(q, N, N1, N2, B)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, q, size=(B, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, q, size=(B, N), dtype=np.uint32))

    r_f = np.asarray(jax.jit(fwd)(a))
    r_s = np.asarray(jax.jit(lambda v: ntt32(v, plan))(a))
    print("fwd == ntt32:", np.array_equal(r_f, r_s))
    r_i = np.asarray(jax.jit(inv)(jnp.asarray(r_f)))
    print("inv(fwd) == id:", np.array_equal(r_i, np.asarray(a)))
    zq = plan.zq

    def polymul_fs(x, y):
        return inv(mul_mod32(fwd(x), fwd(y), zq))

    def polymul_std(x, y):
        return intt32(mul_mod32(ntt32(x, plan), ntt32(y, plan), zq), plan)

    p_f = np.asarray(jax.jit(polymul_fs)(a, b))
    p_s = np.asarray(jax.jit(polymul_std)(a, b))
    print("polymul fourstep == stages:", np.array_equal(p_f, p_s))
    if args.check:
        return
    assert np.array_equal(p_f, p_s)

    K = args.chain

    def chained(f):
        @jax.jit
        def run(x, y):
            def body(i, xy):
                x, y = xy
                return f(x, y), x
            return jax.lax.fori_loop(0, K, body, (x, y))
        return run

    from bench import fetch_sync  # tunnel-proof sync (block_until_ready lies)

    for name, f in [("fourstep", polymul_fs), ("stages", polymul_std)] * 2:
        run = chained(f)
        out = run(a, b)
        fetch_sync(out[0])
        t0 = time.time()
        for _ in range(args.iters):
            out = run(*out)  # data-dependent chain across reps too
        fetch_sync(out[0])
        dt = (time.time() - t0) / args.iters / K
        print(f"{name:9s}: {B / dt:10.0f} polymuls/s  ({dt * 1e3:.2f} ms per {B}-batch)")


if __name__ == "__main__":
    main()
