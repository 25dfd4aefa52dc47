"""Cross-checks for the native host library: every native entry point must
agree exactly with its pure-Python reference implementation."""

import numpy as np
import pytest

from learn_fhe_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _py_nega_mul(a, b, mod):
    n = len(a)
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k, s = (i + j, 1) if i + j < n else (i + j - n, -1)
            c[k] += s * int(a[i]) * int(b[j])
    return np.array([x % mod for x in c], dtype=np.uint64)


def test_nega_mul_t64(rng):
    a = rng.integers(0, 1 << 64, size=(2, 32), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=(2, 32), dtype=np.uint64)
    got = native.nega_mul_t64(a, b)
    for t in range(2):
        assert np.array_equal(got[t], _py_nega_mul(a[t], b[t], 1 << 64))


def test_nega_mul_zq(rng):
    q = (1 << 62) + 1235  # large q stresses the u128 accumulator
    a = rng.integers(0, q, size=(2, 32), dtype=np.uint64)
    b = rng.integers(0, q, size=(2, 32), dtype=np.uint64)
    got = native.nega_mul_zq(a, b, q)
    for t in range(2):
        assert np.array_equal(got[t], _py_nega_mul(a[t], b[t], q))


def test_decompose_matches_device(rng):
    import jax.numpy as jnp

    from learn_fhe_tpu.ops import gadget as gad

    q = 268409857
    g = gad.Gadget(q, 7, 4)
    x = rng.integers(0, q, size=256, dtype=np.uint64)
    want = np.asarray(gad.decompose_zq(jnp.asarray(x), g))
    got = native.decompose_zq(x, q, g.log_b, g.d, g.rounding_bits)
    assert np.array_equal(got, want)

    gt = gad.Gadget(0, 23, 2)
    xt = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    want = np.asarray(gad.decompose_t64(jnp.asarray(xt), gt))
    got = native.decompose_t64(xt, gt.log_b, gt.d, gt.rounding_bits)
    assert np.array_equal(got, want)


def test_ntt_matches_device(rng):
    import jax.numpy as jnp

    from learn_fhe_tpu.ops.ntt import intt, ntt, ntt_plan
    from learn_fhe_tpu.utils.primes import two_adic_primes

    n = 64
    q = next(two_adic_primes(50, 8))
    plan = ntt_plan(q, n)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    want = np.asarray(ntt(jnp.asarray(x), plan))
    got = native.ntt_forward(x, plan.psi_br, q)
    assert np.array_equal(got, want)
    back = native.ntt_inverse(got, plan.psi_inv_br, plan.n_inv, q)
    assert np.array_equal(back, x)
    assert np.array_equal(np.asarray(intt(jnp.asarray(want), plan)), back)


def test_build_schedule_matches_python(rng):
    from learn_fhe_tpu.models.fhew import BootstrapParams, LweParams, RgswParams, RlweParams
    from learn_fhe_tpu.models.fhew import bootstrapping as boot
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(28, 8))
    params = BootstrapParams(
        RgswParams(RlweParams(q=q, p=4, log_n=7, log_b=7, d=4), log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4),
        w=5,
    )
    two_n = 2 * params.n
    # odd values (as mod_switch_odd produces) or zero
    a = (rng.integers(0, params.n, size=(5, 16)) * 2 + 1) % two_n
    a[0, :3] = 0
    minus_map, plus_map = params.dlog_tables
    got = native.build_schedule(
        a.astype(np.int64), minus_map, plus_map, params.n // 2, params.w,
        params.schedule_len,
    )
    assert got is not None
    # python transcription (bypass the native fast path by calling per-row)
    for t in range(5):
        ops, idxs = boot.build_schedule.__wrapped__(params, a[t]) if hasattr(
            boot.build_schedule, "__wrapped__"
        ) else _python_schedule(boot, params, a[t])
        assert np.array_equal(got[0][t], ops), t
        assert np.array_equal(got[1][t], idxs), t


def _python_schedule(boot, params, row):
    """Reproduce the module's Python transcription for one row (the module
    function now prefers the native path, so re-derive here)."""
    minus_map, plus_map = params.dlog_tables
    half = params.n // 2
    i_minus = [[] for _ in range(half)]
    i_plus = [[] for _ in range(half)]
    for j, aj in enumerate(row):
        lm, lp = minus_map[aj], plus_map[aj]
        if lm >= 0 and lp < 0:
            i_minus[lm].append(j)
        elif lp >= 0 and lm < 0:
            i_plus[lp].append(j)

    steps = []

    def walk(buckets):
        v = 0
        for l in range(len(buckets) - 1, 0, -1):
            for j in buckets[l]:
                steps.append((boot.OP_EXT, j))
            v += 1
            if buckets[l - 1] or v == params.w or l == 1:
                steps.append((boot.OP_AUTO, v))
                v = 0

    walk(i_minus)
    for j in i_minus[0]:
        steps.append((boot.OP_EXT, j))
    steps.append((boot.OP_AUTO, 0))
    walk(i_plus)
    for j in i_plus[0]:
        steps.append((boot.OP_EXT, j))

    L = params.schedule_len
    ops = np.full(L, boot.OP_NOOP, dtype=np.int32)
    idxs = np.zeros(L, dtype=np.int32)
    for k, (op, idx) in enumerate(steps):
        ops[k] = op
        idxs[k] = idx
    return ops, idxs
