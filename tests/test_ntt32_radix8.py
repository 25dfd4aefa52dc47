"""Pass-width schedules of the u32 stage NTT are interchangeable bit-exactly.

The fused radix-2/4/8 passes (`ops/ntt32.py:_r{2,4,8}_{fwd,inv}`) are pure
memory-traffic reshapings of the same butterfly/twiddle math (reference
transform semantics: `util/src/ring/fft.rs:40-77`), so every schedule must
produce element-identical transforms and polymuls. Pins the
FHE_TPU_NTT32_PASS_WIDTH=3 (radix-8) A/B path against the radix-4 default.
"""

import jax
import numpy as np
import pytest

from learn_fhe_tpu.ops import ntt32
from learn_fhe_tpu.utils.primes import two_adic_primes


@pytest.mark.parametrize("width", [1, 3, 4, 5])
@pytest.mark.parametrize("log_n", [5, 9, 12])
def test_pass_width_matches_default(monkeypatch, width, log_n):
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(width * 100 + log_n)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)

    # Compute `want` under an explicit radix-4 pin rather than the ambient
    # default: at log_n >= 11 the default schedule is already radix-8, which
    # would make the width=3 parametrization vacuous (identical schedules on
    # both sides), and an FHE_TPU_NTT32_PASS_WIDTH in the environment would
    # skew it either way.
    monkeypatch.setattr(ntt32, "_PASS_WIDTH", 2)
    want_f = np.asarray(jax.jit(lambda v: ntt32.ntt32(v, plan))(a))
    want_m = np.asarray(jax.jit(lambda x, y: ntt32.negacyclic_mul32(x, y, plan))(a, b))

    monkeypatch.setattr(ntt32, "_PASS_WIDTH", width)
    # fresh jit wrappers: the schedule is baked at trace time, not in the
    # plan hash, so reuse of a cached trace would mask the switch
    got_f = np.asarray(jax.jit(lambda v: ntt32.ntt32(v, plan))(a))
    got_m = np.asarray(jax.jit(lambda x, y: ntt32.negacyclic_mul32(x, y, plan))(a, b))
    rt = np.asarray(jax.jit(lambda v: ntt32.intt32(ntt32.ntt32(v, plan), plan))(a))

    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_array_equal(rt, a)


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("log_n", [4, 7, 11])
def test_interleaved_pass_matches_stack(width, log_n):
    """The interleaved flip/select pass formulation (`_rk_fwd_i`/`_rk_inv_i`,
    the FHE_TPU_NTT32_INTERLEAVE default — it removes the jnp.stack DUS
    chain, ARCHITECTURE §19) is element-identical to the slice+stack passes
    at every (layer, width)."""
    if width > log_n:
        pytest.skip("pass wider than the transform")
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(width * 10 + log_n)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    for layer in range(0, log_n - width + 1, max(1, width)):
        args = (x, (3,), n, q, plan, layer, width)
        np.testing.assert_array_equal(
            np.asarray(ntt32._rk_fwd_i(*args)), np.asarray(ntt32._rk_fwd(*args))
        )
        np.testing.assert_array_equal(
            np.asarray(ntt32._rk_inv_i(*args)), np.asarray(ntt32._rk_inv(*args))
        )


@pytest.mark.parametrize("log_n", [1, 5, 12])
def test_fused_polymul_matches_unfused(log_n):
    """`negacyclic_mul32` fuses the pointwise product into the last forward /
    first inverse pass; the fusion is a pure traffic reshaping and must be
    element-identical to the explicit NTT -> pointwise -> INTT composition."""
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(log_n)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    want = np.asarray(
        jax.jit(
            lambda x, y: ntt32.intt32(
                ntt32.pointwise_mul32(ntt32.ntt32(x, plan), ntt32.ntt32(y, plan), plan),
                plan,
            )
        )(a, b)
    )
    got = np.asarray(jax.jit(lambda x, y: ntt32.negacyclic_mul32(x, y, plan))(a, b))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("log_n", [4, 7, 11])
def test_barrier_pass_matches_default(monkeypatch, width, log_n):
    """The FHE_TPU_NTT32_BARRIER=1 formulation (`lax.optimization_barrier`
    materializing the butterfly slices before the jnp.stack, ARCHITECTURE
    §19) is value-neutral: barriers only pin graph structure. Pins the env
    path's math, which until round 5 was only verified manually (ADVICE r04).
    The flag's pass-table remap routes hand radix widths through the generic
    `_rk_fwd`/`_rk_inv` — whose equivalence to the hand paths is pinned by
    test_pass_width_matches_default — so barrier-on generic passes vs
    barrier-off generic passes is exactly the remaining delta."""
    if width > log_n:
        pytest.skip("pass wider than the transform")
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(width * 17 + log_n)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    for layer in range(0, log_n - width + 1, max(1, width)):
        args = (x, (3,), n, q, plan, layer, width)
        monkeypatch.setattr(ntt32, "_BARRIER", False)
        want_f = np.asarray(ntt32._rk_fwd(*args))
        want_i = np.asarray(ntt32._rk_inv(*args))
        monkeypatch.setattr(ntt32, "_BARRIER", True)
        np.testing.assert_array_equal(np.asarray(ntt32._rk_fwd(*args)), want_f)
        np.testing.assert_array_equal(np.asarray(ntt32._rk_inv(*args)), want_i)


def test_barrier_polymul_matches_default(monkeypatch):
    """Full negacyclic polymul under the barrier remap (generic pass tables +
    _BARRIER=True, mirroring FHE_TPU_NTT32_BARRIER=1 at import) is
    bit-identical to the ambient default."""
    log_n = 11
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(1131)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    want = np.asarray(jax.jit(lambda x, y: ntt32.negacyclic_mul32(x, y, plan))(a, b))

    monkeypatch.setattr(ntt32, "_BARRIER", True)
    monkeypatch.setattr(
        ntt32,
        "_FWD_PASS",
        {w: (lambda *ar, _w=w: ntt32._rk_fwd(*ar, _w)) for w in (1, 2, 3, 4, 5)},
    )
    monkeypatch.setattr(
        ntt32,
        "_INV_PASS",
        {w: (lambda *ar, _w=w: ntt32._rk_inv(*ar, _w)) for w in (1, 2, 3, 4, 5)},
    )
    got = np.asarray(jax.jit(lambda x, y: ntt32.negacyclic_mul32(x, y, plan))(a, b))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("log_n", [4, 7, 11])
def test_pairstack_pass_matches_default(width, log_n):
    """The pair-stack formulation (`_rk_fwd_p`/`_rk_inv_p`,
    FHE_TPU_NTT32_PAIRSTACK — one array throughout, a 2-wide stack per
    sub-layer instead of one R-piece stack per pass; VERDICT r04 item 7) is
    element-identical to the slice+stack passes."""
    if width > log_n:
        pytest.skip("pass wider than the transform")
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(width * 31 + log_n)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    for layer in range(0, log_n - width + 1, max(1, width)):
        args = (x, (3,), n, q, plan, layer, width)
        np.testing.assert_array_equal(
            np.asarray(ntt32._rk_fwd_p(*args)), np.asarray(ntt32._rk_fwd(*args))
        )
        np.testing.assert_array_equal(
            np.asarray(ntt32._rk_inv_p(*args)), np.asarray(ntt32._rk_inv(*args))
        )


def test_concat_recombine_matches_stack(monkeypatch):
    """FHE_TPU_NTT32_CONCAT replaces the final jnp.stack recombine with an
    explicit concatenate of the slices — value-identical by construction."""
    log_n, width = 9, 3
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    plan = ntt32.ntt32_plan(q, n)
    rng = np.random.default_rng(93)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    for layer in (0, 3, 6):
        args = (x, (3,), n, q, plan, layer, width)
        want_f = np.asarray(ntt32._rk_fwd(*args))
        want_i = np.asarray(ntt32._rk_inv(*args))
        monkeypatch.setattr(ntt32, "_CONCAT", True)
        np.testing.assert_array_equal(np.asarray(ntt32._rk_fwd(*args)), want_f)
        np.testing.assert_array_equal(np.asarray(ntt32._rk_inv(*args)), want_i)
        monkeypatch.setattr(ntt32, "_CONCAT", False)
