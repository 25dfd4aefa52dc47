"""Batched bootstrap pipelines -- the throughput surface of the framework.

One bootstrap is a sequential accumulator walk (SURVEY.md §7.3 hard part 6),
so per-chip throughput comes from vmapping the walk over a ciphertext batch
and sharding that batch over the mesh; keys are replicated, and every step's
work is elementwise over the batch so no cross-device traffic occurs inside
the scan. These are the kernels `bench.py` measures and `__graft_entry__`
compiles for the multi-chip dry run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tfhe
from ..models.fhew import bootstrapping as fhew_boot
from ..models.fhew import gates as fhew_gates
from ..models.fhew import lwe as fhew_lwe
from ..models.fhew.bootstrapping import BootstrapKey as FhewKey, BootstrapParams as FhewParams
from ..models.fhew.lwe import LweCiphertext as FhewLwe, LweKeySwitchingKey
from ..models.tfhe.bootstrapping import BootstrapKey as TfheKey, BootstrapParams as TfheParams
from ..models.tfhe.tlwe import TlweCiphertext
from ..ops.modular import add_mod, u64
from ..ops.poly import automorphism_zq, monomial_mul_zq


# -- TFHE batched programmable bootstrap ---------------------------------------


@partial(jax.jit, static_argnums=(0,))
def tfhe_pbs_batch_device(
    params: TfheParams,
    key: TfheKey,
    v_encoded: jnp.ndarray,  # (N,) torus LUT
    a2n: jnp.ndarray,  # (B, n) signed exponents
    b2n: jnp.ndarray,  # (B,)
) -> TlweCiphertext:
    """Natively batched CMux-chain blind rotation fused with sample-extract
    and key-switch. This is the flagship device step."""
    acc = tfhe.blind_rotate(params, key, v_encoded, a2n, b2n)
    from ..models.tfhe import tglwe, tlwe

    ext = tglwe.sample_extract(params.tglwe, acc, 0)
    return tlwe.key_switch(params.tlwe, key.ksk, ext)


# Throughput saturates at this chunk size on v5e (ARCHITECTURE.md §6);
# larger batches degrade (VMEM/scheduling pressure), so big batches stream
# through fixed-size chunks that reuse one compiled pipeline.
PBS_CHUNK = 128


def tfhe_pbs_batch(
    params: TfheParams, key: TfheKey, v: jnp.ndarray, cts: TlweCiphertext
) -> TlweCiphertext:
    """Full batched PBS: cts carries a leading batch axis of any size;
    batches beyond PBS_CHUNK stream through equal chunks (padding the tail)
    so the 4096-ciphertext configuration runs at peak per-chunk throughput."""
    v_enc = tfhe.tglwe.encode(params.tglwe, v)
    a2n, b2n = tfhe.mod_switch_2n(cts, params.big_n)
    B = a2n.shape[0]
    if B <= PBS_CHUNK:
        return tfhe_pbs_batch_device(params, key, v_enc, a2n, b2n)
    pad = (-B) % PBS_CHUNK
    if pad:
        a2n = jnp.concatenate([a2n, a2n[:pad]], axis=0)
        b2n = jnp.concatenate([b2n, b2n[:pad]], axis=0)
    outs = []
    for s in range(0, a2n.shape[0], PBS_CHUNK):
        outs.append(
            tfhe_pbs_batch_device(
                params, key, v_enc, a2n[s : s + PBS_CHUNK], b2n[s : s + PBS_CHUNK]
            )
        )
    a = jnp.concatenate([o.a for o in outs], axis=0)[:B]
    b = jnp.concatenate([o.b for o in outs], axis=0)[:B]
    return TlweCiphertext(a, b)


# -- FHEW batched gate bootstrap -------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def fhew_blind_rotate_batch_device(
    params: FhewParams,
    key: FhewKey,
    f_prime: jnp.ndarray,  # (B, N) prepared LUT (already twisted by X^{gb})
    ext_idx: jnp.ndarray,  # (B, L) fused schedule: ext key index or -1
    auto_idx: jnp.ndarray,  # (B, L) fused schedule: auto key index or -1
) -> FhewLwe:
    """vmap of the fused LMKCDEY walk (`fuse_schedule`) over a batch; each
    step runs a masked external product then a masked automorphism, which
    under vmap costs the same per step as the old 3-way switch but needs
    ~40% fewer steps."""

    def one(fp, e_row, a_row):
        acc = fhew_boot.RlweCiphertext(jnp.zeros_like(fp), fp)
        out = fhew_boot.blind_rotate_core_fused(params, key, e_row, a_row, acc)
        return out.a, out.b

    acc_a, acc_b = jax.vmap(one)(f_prime, ext_idx, auto_idx)
    from ..models.fhew import rlwe

    ext = rlwe.sample_extract(
        params.rlwe, fhew_boot.RlweCiphertext(acc_a, acc_b), 0
    )
    return ext


@partial(jax.jit, static_argnums=(0,))
def _fhew_preamble(params: FhewParams, key: FhewKey, f: jnp.ndarray, cts: FhewLwe):
    """Device half of the bootstrap preamble: mod-switch -> LWE key-switch ->
    odd mod-switch -> per-ct rotated LUT. Returns the Z_2N mask (host reads it
    to build the public schedule) and the prepared accumulators.

    f may be a single LUT poly (N,) shared by the batch, or per-ciphertext
    LUTs (B, N) — mixed-gate batching uses the latter."""
    g = fhew_boot.AUTO_G
    ct = fhew_lwe.ct_mod_switch(cts, params.big_q, params.big_q_ks)
    ct = fhew_lwe.key_switch(
        params.lwe_s, LweKeySwitchingKey(key.ksk_a, key.ksk_b), ct
    )
    ct = fhew_lwe.ct_mod_switch_odd(ct, params.big_q_ks, params.q)
    f_auto = automorphism_zq(u64(f), -g, params.big_q)  # (N,) or (B, N)
    b_g = (jnp.asarray(ct.b, dtype=jnp.int64) * g) % (2 * params.n)  # (B,)
    if f_auto.ndim == 1:
        f_prime = jax.vmap(lambda s: monomial_mul_zq(f_auto, s, params.big_q))(b_g)
    else:
        f_prime = jax.vmap(
            lambda row, s: monomial_mul_zq(row, s, params.big_q)
        )(f_auto, b_g)
    return ct.a, f_prime


def fhew_bootstrap_batch(
    params: FhewParams, key: FhewKey, f: jnp.ndarray, cts: FhewLwe
) -> FhewLwe:
    """Batched Figure-2 pipeline (`fhew/bootstrapping.rs:148-155`)."""
    ct_a, f_prime = _fhew_preamble(params, key, f, cts)
    # schedule from the PUBLIC mask (host control flow, SURVEY.md §7.3 item 4),
    # then fused: autos ride with their preceding ext run, trimmed to the
    # batch maximum (the static length is a ~40%-padded worst case)
    ops, idxs = fhew_boot.build_schedule(params, np.asarray(ct_a))
    e_idx, a_idx = fhew_boot.fuse_schedule(ops, idxs)
    return fhew_blind_rotate_batch_device(
        params, key, f_prime, jnp.asarray(e_idx), jnp.asarray(a_idx)
    )


def fhew_gate_batch(
    params: FhewParams, key: FhewKey, name: str, ct0s: FhewLwe, ct1s: FhewLwe
) -> FhewLwe:
    """Batched 2-input gate: linear combine + one batched LUT bootstrap."""
    lin = fhew_gates._lin2(params, name, ct0s, ct1s)
    f = fhew_gates.lut_poly(params, fhew_gates.GATE_TABLES[name])
    out = fhew_bootstrap_batch(params, key, f, lin)
    return FhewLwe(
        out.a, add_mod(out.b, u64(params.big_q_by_8), params.big_q)
    )
