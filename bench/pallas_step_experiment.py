"""Experiment: the ENTIRE TFHE cmux_rotate step as one fused Pallas kernel
(k=1, d=1 specialization): transposed (N, B) layout, accumulator as u32
hi/lo planes, 4-prime CRT NTTs, key/monomial pointwise products, Garner
reconstruction, and the u64 accumulator update all inside VMEM.

OUTCOME (v5e, 2026-08): does not compile — the fully unrolled pipeline
needs 354 MB of scoped VMEM against the chip's 128 MB because Mosaic keeps
every unrolled stage intermediate live (a standalone 11-stage NTT on a 1 MB
array already allocates 29.5 MB scoped). Splitting per prime would fit but
reintroduces the HBM round-trips the kernel exists to remove, and Mosaic's
stage codegen measured ~27% slower than XLA's to begin with
(bench/microbench.py methodology). Kept as the starting point if a Mosaic
with in-kernel buffer reuse (or pl.run_scoped stage scoping) lands.
ARCHITECTURE.md section 5 has the full decision log.
"""
import os, time
import jax; jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys; sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
from learn_fhe_tpu.ops.torus_crt import torus_crt_plan, required_bound_bits, monomial_eval_table
from learn_fhe_tpu.ops.ntt32 import ntt32_plan
from learn_fhe_tpu.models.tfhe import tggsw
from learn_fhe_tpu.models.tfhe.params import TggswParams, TglweParams
from learn_fhe_tpu.models.tfhe.tglwe import TglweCiphertext

N, B = 2048, 128
LOG_B_GADGET = 23
RB = 64 - LOG_B_GADGET  # rounding bits = 41
plan = torus_crt_plan(N, required_bound_bits(N, LOG_B_GADGET, 2))
K = plan.k
PRIMES = plan.primes
M16 = np.uint32(0xFFFF); S16 = np.uint32(16)

def mulhi32(a, b):
    a0, a1 = a & M16, a >> S16
    b0, b1 = b & M16, b >> S16
    ll = a0*b0; lh = a0*b1; hl = a1*b0; hh = a1*b1
    mid = (ll >> S16) + (lh & M16) + (hl & M16)
    return hh + (lh >> S16) + (hl >> S16) + (mid >> S16)

def sh(a, w, ws, q):  # shoup, reduced
    r = a * w - mulhi32(a, ws) * np.uint32(q)
    return jnp.where(r >= np.uint32(q), r - np.uint32(q), r)

def addm(a, b, q):
    s = a + b
    return jnp.where(s >= np.uint32(q), s - np.uint32(q), s)

def subm(a, b, q):
    return jnp.where(a >= b, a - b, a - b + np.uint32(q))

# host tables
def stage_tables(p):
    wd = np.zeros((p.log_n, p.n // 2), dtype=np.uint32)
    wsd = np.zeros_like(wd)
    wid = np.zeros_like(wd)
    wisd = np.zeros_like(wd)
    for L in range(p.log_n):
        m = 1 << L
        half = p.n >> (L + 1)
        wd[L] = np.repeat(p.psi_br[m:2*m], half)
        wsd[L] = np.repeat(p.psi_br_shoup[m:2*m], half)
        wid[L] = np.repeat(p.psi_inv_br[m:2*m], half)
        wisd[L] = np.repeat(p.psi_inv_br_shoup[m:2*m], half)
    return wd, wsd, wid, wisd

NTTP = [ntt32_plan(q, N) for q in PRIMES]
TBL = [stage_tables(p) for p in NTTP]
# stacked (K, LOGN, N/2, 1)
WD = jnp.asarray(np.stack([t[0] for t in TBL]))[:, :, :, None]
WSD = jnp.asarray(np.stack([t[1] for t in TBL]))[:, :, :, None]
WID = jnp.asarray(np.stack([t[2] for t in TBL]))[:, :, :, None]
WISD = jnp.asarray(np.stack([t[3] for t in TBL]))[:, :, :, None]
NINV = np.asarray([p.n_inv for p in NTTP], dtype=np.uint32)
NINVS = np.asarray([p.n_inv_shoup for p in NTTP], dtype=np.uint32)
LOGN = NTTP[0].log_n

# garner constants
GINV = plan.garner_inv
HALF_DIG = plan.half_digits
QPREF = plan.q_prefix_mod_2_64
QMOD = plan.q_mod_2_64

def ntt_fwd(x, i, q):  # x (..., N, B) over axis -2
    lead = x.shape[:-2]
    out = x
    for layer in range(LOGN):
        m = 1 << layer
        half = N >> (layer + 1)
        v4 = out.reshape(*lead, m, 2, half, B)
        u, v = v4[..., 0, :, :], v4[..., 1, :, :]
        t = WD_ref[i, layer].reshape(m, half, 1)
        ts = WSD_ref[i, layer].reshape(m, half, 1)
        tv = sh(v, t, ts, q)
        out = jnp.stack([addm(u, tv, q), subm(u, tv, q)], axis=-3).reshape(*lead, N, B)
    return out

def ntt_inv(x, i, q):
    lead = x.shape[:-2]
    out = x
    for layer in reversed(range(LOGN)):
        m = 1 << layer
        half = N >> (layer + 1)
        v4 = out.reshape(*lead, m, 2, half, B)
        u, v = v4[..., 0, :, :], v4[..., 1, :, :]
        t = WID_ref[i, layer].reshape(m, half, 1)
        ts = WISD_ref[i, layer].reshape(m, half, 1)
        s = addm(u, v, q)
        d = sh(subm(u, v, q), t, ts, q)
        out = jnp.stack([s, d], axis=-3).reshape(*lead, N, B)
    return sh(out, np.uint32(NTTP[i].n_inv), np.uint32(NTTP[i].n_inv_shoup), q)

WD_ref = WSD_ref = WID_ref = WISD_ref = None  # bound inside kernel

def step_kernel(a_hi_ref, a_lo_ref, b_hi_ref, b_lo_ref,
                kv_a_ref, kd_a_ref, kv_b_ref, kd_b_ref,
                mv_ref, md_ref,
                wd_ref, wsd_ref, wid_ref, wisd_ref,
                oa_hi_ref, oa_lo_ref, ob_hi_ref, ob_lo_ref):
    global WD_ref, WSD_ref, WID_ref, WISD_ref
    WD_ref, WSD_ref, WID_ref, WISD_ref = wd_ref, wsd_ref, wid_ref, wisd_ref
    a_hi = a_hi_ref[:]; a_lo = a_lo_ref[:]
    b_hi = b_hi_ref[:]; b_lo = b_lo_ref[:]

    # decompose (d=1, rb=41): digit from hi plane only; two's complement u32
    def digit(hi):
        v = (hi + np.uint32(1 << (RB - 33))) >> np.uint32(RB - 32)
        mask = np.uint32((1 << LOG_B_GADGET) - 1)
        limb = v & mask
        v2 = v >> np.uint32(LOG_B_GADGET)
        carry = (((limb - np.uint32(1)) | v2) & limb) >> np.uint32(LOG_B_GADGET - 1)
        return limb - (carry << np.uint32(LOG_B_GADGET))
    dig = jnp.stack([digit(a_hi), digit(b_hi)], axis=0)  # (2, N, B)

    # per-prime pipeline; collect coefficient residues for garner
    coeff_a = []
    coeff_b = []
    for i, q in enumerate(PRIMES):
        neg = dig >> np.uint32(31)
        res = jnp.where(neg.astype(bool), dig + np.uint32(q), dig)  # (2,N,B)
        ev = ntt_fwd(res, i, q)
        # pointwise key: e_a = sum_r ev[r]*kv_a[i,r]; e_b likewise
        e_a = addm(sh(ev[0], kv_a_ref[i, 0].reshape(N, 1), kd_a_ref[i, 0].reshape(N, 1), q),
                   sh(ev[1], kv_a_ref[i, 1].reshape(N, 1), kd_a_ref[i, 1].reshape(N, 1), q), q)
        e_b = addm(sh(ev[0], kv_b_ref[i, 0].reshape(N, 1), kd_b_ref[i, 0].reshape(N, 1), q),
                   sh(ev[1], kv_b_ref[i, 1].reshape(N, 1), kd_b_ref[i, 1].reshape(N, 1), q), q)
        # monomial: c = mon*e - e
        mv = mv_ref[i]; md = md_ref[i]  # (N, B)
        c_a = subm(sh(e_a, mv, md, q), e_a, q)
        c_b = subm(sh(e_b, mv, md, q), e_b, q)
        cc = ntt_inv(jnp.stack([c_a, c_b], axis=0), i, q)
        coeff_a.append(cc[0])
        coeff_b.append(cc[1])

    def garner(coeffs):
        v = []
        for i in range(K):
            qi = PRIMES[i]
            t = coeffs[i]
            for j in range(i):
                vj = v[j]
                vj = jnp.where(vj >= np.uint32(qi), vj - np.uint32(qi), vj)
                inv, invs = GINV[i][j]
                t = sh(subm(t, vj, qi), np.uint32(inv), np.uint32(invs), qi)
            v.append(t)
        lo = v[0]
        hi = jnp.zeros_like(lo)
        for i in range(1, K):
            c = QPREF[i]
            c_lo, c_hi = np.uint32(c & 0xFFFFFFFF), np.uint32(c >> 32)
            p_lo = v[i] * c_lo
            p_hi = mulhi32(v[i], c_lo) + v[i] * c_hi
            lo_new = lo + p_lo
            hi = hi + p_hi + (lo_new < lo).astype(jnp.uint32)
            lo = lo_new
        over = jnp.zeros(lo.shape, dtype=jnp.bool_)
        for i in range(K):
            h = np.uint32(HALF_DIG[i])
            over = (v[i] > h) | ((v[i] == h) & over)
        q_lo = np.uint32(QMOD & 0xFFFFFFFF)
        q_hi = np.uint32(QMOD >> 32)
        o32 = over.astype(jnp.uint32)
        lo_new = lo - o32 * q_lo
        hi = hi - o32 * q_hi - (lo_new > lo).astype(jnp.uint32)
        return lo_new, hi

    da_lo, da_hi = garner(coeff_a)
    db_lo, db_hi = garner(coeff_b)
    # acc += delta (u64 via planes)
    na_lo = a_lo + da_lo
    oa_lo_ref[:] = na_lo
    oa_hi_ref[:] = a_hi + da_hi + (na_lo < a_lo).astype(jnp.uint32)
    nb_lo = b_lo + db_lo
    ob_lo_ref[:] = nb_lo
    ob_hi_ref[:] = b_hi + db_hi + (nb_lo < b_lo).astype(jnp.uint32)

def pallas_step(a_hi, a_lo, b_hi, b_lo, kv_a, kd_a, kv_b, kd_b, mv, md):
    shp = jax.ShapeDtypeStruct((N, B), jnp.uint32)
    return pl.pallas_call(
        step_kernel,
        out_shape=(shp, shp, shp, shp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(a_hi, a_lo, b_hi, b_lo, kv_a, kd_a, kv_b, kd_b, mv, md, WD, WSD, WID, WISD)

# ---- reference: the existing XLA step ------------------------------------
params = TggswParams(TglweParams(log_p=4, padding=1, big_n=N, k=1, std_dev=2.85e-15), log_b=23, d=1)
rng = np.random.default_rng(0)
acc_a = rng.integers(0, 1 << 64, size=(B, 1, N), dtype=np.uint64)
acc_b = rng.integers(0, 1 << 64, size=(B, N), dtype=np.uint64)
kv = lambda *s: tuple(jnp.asarray(rng.integers(0, q, size=s, dtype=np.uint32)) for q in PRIMES)
key = tggsw.TggswEval(kv(2, 1, N), kv(2, 1, N), kv(2, N), kv(2, N))
# valid shoup duals for correctness: recompute duals from values
from learn_fhe_tpu.ops.modular32 import shoup32
def duals(vals):
    return tuple(jnp.asarray(shoup32(np.asarray(v), q)) for v, q in zip(vals, PRIMES))
key = tggsw.TggswEval(key.av, duals(key.av), key.bv, duals(key.bv))
bound = required_bound_bits(N, 23, 2)
mvals, mduals = monomial_eval_table(N, bound)
s_idx = rng.integers(0, 2 * N, size=B)
mon_v = tuple(jnp.asarray(mvals[i][s_idx]) for i in range(K))   # (B, N)
mon_d = tuple(jnp.asarray(mduals[i][s_idx]) for i in range(K))

xla_step = jax.jit(lambda aa, bb: tggsw.cmux_rotate(
    params, key, TglweCiphertext(aa, bb), mon_v, mon_d))
ref = xla_step(jnp.asarray(acc_a), jnp.asarray(acc_b))
ref_a, ref_b = np.asarray(ref.a), np.asarray(ref.b)

# pallas inputs (transposed, planes)
T = lambda x: jnp.asarray(np.ascontiguousarray(x.T))
a64 = acc_a[:, 0, :]
a_hi = T((a64 >> 32).astype(np.uint32)); a_lo = T(a64.astype(np.uint32))
b_hi = T((acc_b >> 32).astype(np.uint32)); b_lo = T(acc_b.astype(np.uint32))
kv_a = jnp.stack([key.av[i][:, 0, :] for i in range(K)])  # (K, 2, N)
kd_a = jnp.stack([key.ad[i][:, 0, :] for i in range(K)])
kv_b = jnp.stack([key.bv[i] for i in range(K)])
kd_b = jnp.stack([key.bd[i] for i in range(K)])
mv = jnp.stack([jnp.asarray(np.ascontiguousarray(np.asarray(mon_v[i]).T)) for i in range(K)])  # (K, N, B)
md = jnp.stack([jnp.asarray(np.ascontiguousarray(np.asarray(mon_d[i]).T)) for i in range(K)])

f = jax.jit(pallas_step)
t0 = time.time()
oa_hi, oa_lo, ob_hi, ob_lo = f(a_hi, a_lo, b_hi, b_lo, kv_a, kd_a, kv_b, kd_b, mv, md)
jax.block_until_ready(oa_hi)
print(f"pallas step compile+run {time.time()-t0:.1f}s")
got_a = (np.asarray(oa_hi).astype(np.uint64) << 32 | np.asarray(oa_lo).astype(np.uint64)).T
got_b = (np.asarray(ob_hi).astype(np.uint64) << 32 | np.asarray(ob_lo).astype(np.uint64)).T
print("a match:", np.array_equal(got_a, ref_a[:, 0, :]), " b match:", np.array_equal(got_b, ref_b))

# chained timing: pallas step vs xla step
KCH = 20
@jax.jit
def chain_pallas(ah, al, bh, bl):
    def body(i, c):
        return pallas_step(c[0], c[1], c[2], c[3], kv_a, kd_a, kv_b, kd_b, mv, md)
    return jax.lax.fori_loop(0, KCH, body, (ah, al, bh, bl))
@jax.jit
def chain_xla(aa, bb):
    def body(i, c):
        out = tggsw.cmux_rotate(params, key, TglweCiphertext(c[0], c[1]), mon_v, mon_d)
        return (out.a, out.b)
    return jax.lax.fori_loop(0, KCH, body, (aa, bb))
for name, fn, args in [("pallas step", chain_pallas, (a_hi, a_lo, b_hi, b_lo)),
                       ("xla step", chain_xla, (jnp.asarray(acc_a), jnp.asarray(acc_b)))]*2:
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(3): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:12s}: {(time.time()-t0)/3/KCH*1e6:8.1f} us/step (batch {B})")
