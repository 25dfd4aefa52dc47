"""Generate the frozen golden vectors (tests/vectors/golden.npz).

SURVEY.md §7.2 step 1 calls for a seeded vector dump around the Rust
reference; this environment has no Rust toolchain, so the vectors pin THIS
implementation's bit-exact behavior instead (every integer path is already
oracle-tested against exact schoolbook arithmetic). The schema is flat
"<name>/<field>" arrays so a Rust-side dump can later target the same file
format for true cross-implementation parity.

Regenerate (only after an intentional semantic change):
    python tests/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def build() -> dict[str, np.ndarray]:
    from learn_fhe_tpu.ops import gadget as gad
    from learn_fhe_tpu.ops.ntt import ntt, ntt_plan
    from learn_fhe_tpu.ops.ntt32 import ntt32, ntt32_plan
    from learn_fhe_tpu.ops.torus_crt import negacyclic_mul_t64_crt
    from learn_fhe_tpu.utils.primes import two_adic_primes

    out: dict[str, np.ndarray] = {}
    rng = np.random.default_rng(20260816)

    # 1. u32 NTT, q ~ 2^28, N = 64
    q28 = next(two_adic_primes(28, 8))
    x = rng.integers(0, q28, size=(2, 64), dtype=np.uint32)
    out["ntt32/q"] = np.array([q28], dtype=np.uint64)
    out["ntt32/x"] = x
    out["ntt32/y"] = np.asarray(ntt32(jnp.asarray(x), ntt32_plan(q28, 64)))

    # 2. u64 NTT, q ~ 2^55, N = 32
    q55 = next(two_adic_primes(55, 6))
    x64 = rng.integers(0, q55, size=(2, 32), dtype=np.uint64)
    out["ntt64/q"] = np.array([q55], dtype=np.uint64)
    out["ntt64/x"] = x64
    out["ntt64/y"] = np.asarray(ntt(jnp.asarray(x64), ntt_plan(q55, 32)))

    # 3. gadget decompositions (reference carry semantics)
    g_zq = gad.Gadget(q28, 7, 4)
    xz = rng.integers(0, q28, size=128, dtype=np.uint64)
    out["decomp_zq/x"] = xz
    out["decomp_zq/digits"] = np.asarray(gad.decompose_zq(jnp.asarray(xz), g_zq))
    g_t = gad.Gadget(0, 23, 2)
    xt = rng.integers(0, 1 << 64, size=128, dtype=np.uint64)
    out["decomp_t64/x"] = xt
    out["decomp_t64/digits"] = np.asarray(gad.decompose_t64(jnp.asarray(xt), g_t))

    # 4. exact torus product
    half = 1 << 22
    a = rng.integers(-half, half + 1, size=(2, 64)).astype(np.int64).astype(np.uint64)
    b = rng.integers(0, 1 << 64, size=(2, 64), dtype=np.uint64)
    out["torus_mul/a"] = a
    out["torus_mul/b"] = b
    out["torus_mul/c"] = np.asarray(
        negacyclic_mul_t64_crt(jnp.asarray(a), jnp.asarray(b), 23)
    )

    # 5. TFHE PBS end-to-end at tiny params (deterministic keygen via seed)
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

    prng = np.random.default_rng(7)
    params = BootstrapParams(
        TlweParams(log_p=2, padding=1, n=16, std_dev=1.34e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=64, k=1, std_dev=2.85e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, prng)
    key = key_gen(params, z, prng)
    ms = np.arange(8, dtype=np.uint64) % 4
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), prng)
    tab = lut_table(2, 64, lambda v: (3 * v) % 4)
    a2n, b2n = mod_switch_2n(cts, params.big_n)
    pbs = tfhe_pbs_batch_device(
        params, key, tglwe.encode(params.tglwe, jnp.asarray(tab)), a2n, b2n
    )
    out["tfhe_pbs/m"] = ms
    out["tfhe_pbs/out_a"] = np.asarray(pbs.a)
    out["tfhe_pbs/out_b"] = np.asarray(pbs.b)
    out["tfhe_pbs/sk"] = np.asarray(z).astype(np.int64)

    return out


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    vecs = build()
    path = os.path.join(os.path.dirname(__file__), "vectors", "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **vecs)
    print(f"wrote {path}: {len(vecs)} arrays")
