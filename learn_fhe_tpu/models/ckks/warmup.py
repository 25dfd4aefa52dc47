"""CKKS pipeline prewarming: compile the level-specialized mul/rotate
programs concurrently before keys exist (utils/warmup.py)."""

from __future__ import annotations

from ...utils.warmup import prewarm
from .ckks import CkksCiphertext, CkksKeySwitchingKey, CkksParams, CkksRotKey


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def _abs_ct(params: CkksParams, qs) -> CkksCiphertext:
    import jax.numpy as jnp

    s = _sds((len(qs), params.n), jnp.uint64)
    return CkksCiphertext(s, s, qs)


def _abs_ksk(params: CkksParams) -> CkksKeySwitchingKey:
    import jax.numpy as jnp

    s = _sds((2 * params.big_l, params.n), jnp.uint64)
    return CkksKeySwitchingKey(s, s, params.qps)


def prewarm_ckks_pipelines(params: CkksParams, levels=None, rotate_js=(1,)):
    """Fire background compiles of mul (tensor+relin+rescale) and rotate at
    the given levels (default: every level from full depth down to 2)."""
    from . import ckks as C

    levels = range(params.big_l, 1, -1) if levels is None else levels
    ksk = _abs_ksk(params)
    thunks = []
    for lv in levels:
        qs = params.qs[:lv]
        thunks.append(
            lambda qs=qs: C.mul.lower(
                params, ksk, _abs_ct(params, qs), _abs_ct(params, qs)
            ).compile()
        )
        for j in rotate_js:
            thunks.append(
                lambda qs=qs, j=j: C.rotate.lower(
                    params, CkksRotKey(ksk, j), _abs_ct(params, qs)
                ).compile()
            )
    return prewarm(thunks)
