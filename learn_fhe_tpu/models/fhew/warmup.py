"""FHEW pipeline prewarming: compile the gate-bootstrap programs for a
parameter set CONCURRENTLY, before (or while) key material exists.

Rationale (measured, utils/warmup.py): each distinct program costs ~10 s in
the remote compile helper but requests overlap, and the compile cache is
process-external — so lowering every (batch, schedule-bucket) pipeline shape
from abstract ShapeDtypeStructs on background threads turns a circuit's cold
compiles into cache hits. A u8 expression at production params spent more
wall-clock in serial cold compiles than in compute before this existed.
"""

from __future__ import annotations

import numpy as np

from ...utils.warmup import prewarm
from .bootstrapping import BootstrapKey, BootstrapParams, build_schedule, fuse_schedule
from .lwe import LweCiphertext


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def abstract_key(params: BootstrapParams) -> BootstrapKey:
    """The BootstrapKey's array shapes/dtypes as ShapeDtypeStructs."""
    import jax.numpy as jnp

    n_ring = params.n
    n_lwe = params.lwe_s.n
    d_ks = params.lwe_s.gadget.d
    d = params.rgsw.d
    d_r = params.rlwe.d
    w1 = len(params.ak_t)
    u32 = params.rgsw.use_u32
    val = jnp.uint32 if u32 else jnp.uint64
    dual = (lambda s: _sds(s, jnp.uint32)) if u32 else (lambda s: None)
    return BootstrapKey(
        ksk_a=_sds((d_ks, n_ring, n_lwe), jnp.uint64),
        ksk_b=_sds((d_ks, n_ring), jnp.uint64),
        brk_a=_sds((n_lwe, 2 * d, n_ring), val),
        brk_b=_sds((n_lwe, 2 * d, n_ring), val),
        ak_a=_sds((w1, d_r, n_ring), val),
        ak_b=_sds((w1, d_r, n_ring), val),
        auto_src=_sds((w1, n_ring), jnp.int64),
        auto_sign=_sds((w1, n_ring), jnp.bool_),
        brk_ad=dual((n_lwe, 2 * d, n_ring)),
        brk_bd=dual((n_lwe, 2 * d, n_ring)),
        ak_ad=dual((w1, d_r, n_ring)),
        ak_bd=dual((w1, d_r, n_ring)),
    )


def likely_fused_lens(
    params: BootstrapParams, batches, trials: int = 16, seed: int = 0
) -> list[int]:
    """Predict which schedule-length buckets real batches will land in by
    fusing schedules for random post-mod-switch masks (odd values of Z_2N —
    exactly the image of mod_switch_odd, all of which have discrete logs).

    Keep this set TIGHT: warm programs queue in the same remote compile
    helper as the real path's, and over-warming starves it (measured: a
    49-program warm set made key setup 4x slower than an 18-program one)."""
    rng = np.random.default_rng(seed)
    two_n = params.q
    lens: set[int] = set()
    # sample at the REAL batch sizes (the fused-length bucket grows with the
    # batch max, so sampling a stand-in size can miss a bucket), but cap the
    # sweep at 3 sizes to keep host-side schedule building cheap
    sizes = sorted(set(batches))
    if len(sizes) > 3:
        sizes = [sizes[0], sizes[len(sizes) // 2], sizes[-1]]
    for b in sizes:
        for _ in range(trials):
            a = rng.integers(0, two_n // 2, size=(b, params.lwe_s.n)) * 2 + 1
            zero = rng.random(a.shape) < 0.01
            a[zero] = 0
            ops, idxs = build_schedule(params, a.astype(np.int64))
            e_idx, _ = fuse_schedule(ops, idxs)
            lens.add(e_idx.shape[-1])
    return sorted(lens)


def prewarm_multikey_setup(params: BootstrapParams):
    """Fire background compiles of the multi-key SETUP programs (share
    encryption cores, the RGSW pk-encrypt core at the full brk shape, the
    merge chunk, eval residency) so they overlap the host-side sampling and
    each other instead of compiling serially on first use. Submit BEFORE
    prewarm_gate_pipelines — these are needed first."""
    import jax.numpy as jnp

    from . import rgsw
    from .bootstrapping import _merge_chunk, merge_chunk_size
    from .rlwe import _pk_encrypt_core, _share_encrypt_core, _to_eval_mont

    rp = params.rlwe
    n_ring = params.n
    n_lwe = params.lwe_s.n
    two_d = 2 * params.rgsw.d
    d_r = rp.d
    u64_ = jnp.uint64
    i64_ = jnp.int64
    chunk = merge_chunk_size(n_lwe)
    big = (n_lwe, two_d, n_ring)

    thunks = [
        # pk / ak / ksk share encryption cores
        lambda: _share_encrypt_core.lower(
            rp, _sds((n_ring,), u64_), _sds((n_ring,), i64_),
            _sds((n_ring,), i64_), _sds((n_ring,), u64_),
        ).compile(),
        lambda: _share_encrypt_core.lower(
            rp, _sds((d_r, n_ring), u64_), _sds((n_ring,), i64_),
            _sds((d_r, n_ring), i64_), _sds((d_r, n_ring), u64_),
        ).compile(),
        # brk pk-encryption at the full (n_lwe, 2d, N) shape
        lambda: _pk_encrypt_core.lower(
            rp, _sds((n_ring,), u64_), _sds((n_ring,), u64_),
            _sds(big, u64_), _sds(big, u64_), _sds(big, u64_), _sds(big, u64_),
        ).compile(),
        # RGSW internal-product merge chunk + final eval residency
        lambda: _merge_chunk.lower(
            params.rgsw, *(_sds((chunk, two_d, n_ring), u64_),) * 4
        ).compile(),
        lambda: rgsw.to_eval.lower(
            params.rgsw, rgsw.RgswCiphertext(_sds(big, u64_), _sds(big, u64_))
        ).compile(),
        lambda: _to_eval_mont.lower(rp, _sds((d_r, n_ring), u64_)).compile(),
        # FhewU8.pk_encrypt's batched (8, N) bit-plane encryption
        lambda: _pk_encrypt_core.lower(
            rp, _sds((n_ring,), u64_), _sds((n_ring,), u64_),
            _sds((8, n_ring), u64_), _sds((8, n_ring), u64_),
            _sds((8, n_ring), u64_), _sds((8, n_ring), u64_),
        ).compile(),
    ]
    return prewarm(thunks)


def prewarm_gate_pipelines(
    params: BootstrapParams, batches=(1, 2, 4, 8, 16, 64), lens=None
):
    """Fire background compiles of the gate-bootstrap pipelines for every
    (batch, fused-schedule-bucket) shape a circuit at `params` will hit.
    Returns the futures (fire-and-forget is fine; utils.warmup.wait_all to
    sync). Call right after constructing params — compiles overlap keygen."""
    import jax.numpy as jnp

    from ...parallel.batch import _fhew_preamble, fhew_blind_rotate_batch_device

    key_abs = abstract_key(params)
    lens = likely_fused_lens(params, batches) if lens is None else lens
    n_ring = params.n
    thunks = []
    for b in batches:
        thunks.append(
            lambda b=b: _fhew_preamble.lower(
                params,
                key_abs,
                _sds((b, n_ring), jnp.uint64),
                LweCiphertext(_sds((b, n_ring), jnp.uint64), _sds((b,), jnp.uint64)),
            ).compile()
        )
        for L2 in lens:
            thunks.append(
                lambda b=b, L2=L2: fhew_blind_rotate_batch_device.lower(
                    params,
                    key_abs,
                    _sds((b, n_ring), jnp.uint64),
                    _sds((b, L2), jnp.int32),
                    _sds((b, L2), jnp.int32),
                ).compile()
            )
    return prewarm(thunks)
