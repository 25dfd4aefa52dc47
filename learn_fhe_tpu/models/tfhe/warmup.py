"""TFHE pipeline prewarming: compile the batched PBS programs for a
parameter set concurrently, before key material exists (see
utils/warmup.py for the measured compile-helper behavior)."""

from __future__ import annotations

from ...utils.warmup import prewarm
from .bootstrapping import BootstrapKey, BootstrapParams


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def abstract_key(params: BootstrapParams) -> BootstrapKey:
    """BootstrapKey array shapes/dtypes as ShapeDtypeStructs."""
    import jax.numpy as jnp

    from ...ops.torus_crt import required_bound_bits, torus_crt_plan
    from .tggsw import TggswEval
    from .tlwe import TlweKeySwitchingKey

    big_n = params.big_n
    k = params.tglwe.k
    d = params.tggsw.d
    rows = (k + 1) * d
    n_lwe = params.tlwe.n
    bound = required_bound_bits(big_n, params.tggsw.log_b, rows)
    kp = torus_crt_plan(big_n, bound).k
    u32 = jnp.uint32
    av = tuple(_sds((n_lwe, rows, k, big_n), u32) for _ in range(kp))
    bv = tuple(_sds((n_lwe, rows, big_n), u32) for _ in range(kp))
    mon = tuple(_sds((2 * big_n, big_n), u32) for _ in range(kp))
    ksk_a = _sds((params.tlwe.d, big_n * k, params.tlwe.n), jnp.uint64)
    ksk_b = _sds((params.tlwe.d, big_n * k), jnp.uint64)
    return BootstrapKey(
        brk=TggswEval(av=av, ad=av, bv=bv, bd=bv),
        ksk=TlweKeySwitchingKey(ksk_a, ksk_b),
        mon_v=mon,
        mon_d=mon,
    )


def prewarm_pbs_pipelines(params: BootstrapParams, batches=(128,)):
    """Fire background compiles of tfhe_pbs_batch_device for each batch."""
    import jax.numpy as jnp

    from ...parallel.batch import tfhe_pbs_batch_device

    key_abs = abstract_key(params)
    big_n = params.big_n
    n = params.tlwe.n
    thunks = [
        lambda b=b: tfhe_pbs_batch_device.lower(
            params,
            key_abs,
            _sds((big_n,), jnp.uint64),
            _sds((b, n), jnp.int64),
            _sds((b,), jnp.int64),
        ).compile()
        for b in batches
    ]
    return prewarm(thunks)
