"""Four-step (MXU matmul) u32 NTT path: bit-exact vs the stage path.

The four-step formulation (`ops/ntt32.py: Fourstep32`) folds ntt32's
bit-reversed output convention into its matrices, so forward outputs are
element-identical to the stage path and the two interoperate freely
(reference transform semantics: `util/src/ring/fft.rs:40-77`, `fft/zq.rs`).
"""

import jax
import numpy as np
import pytest

from learn_fhe_tpu.ops.modular32 import mul_mod32
from learn_fhe_tpu.ops.ntt32 import intt32, negacyclic_mul32, ntt32, ntt32_plan
from learn_fhe_tpu.utils.primes import two_adic_primes


@pytest.mark.parametrize(
    "log_n,n1",
    [
        (10, None),  # square split 32 x 32
        (11, None),  # non-square split 64 x 32
        (9, 128),  # explicit wide-left split 128 x 4
        (14, None),  # the benchmark shape 128 x 128
    ],
)
def test_fourstep_matches_stage_path(log_n, n1):
    n = 1 << log_n
    q = next(two_adic_primes(31, log_n + 1))
    plan = ntt32_plan(q, n)
    plan_fs = ntt32_plan(q, n, fourstep=True, n1=n1)

    rng = np.random.default_rng(7)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(3, n), dtype=np.uint32)

    f_fs = np.asarray(jax.jit(lambda v: ntt32(v, plan_fs))(a))
    f_st = np.asarray(jax.jit(lambda v: ntt32(v, plan))(a))
    np.testing.assert_array_equal(f_fs, f_st)

    # inverse round-trip and cross-path interop (fourstep fwd -> stage inv)
    r_fs = np.asarray(jax.jit(lambda v: intt32(v, plan_fs))(f_fs))
    np.testing.assert_array_equal(r_fs, a)
    r_cross = np.asarray(jax.jit(lambda v: intt32(v, plan))(f_fs))
    np.testing.assert_array_equal(r_cross, a)

    p_fs = np.asarray(jax.jit(lambda x, y: negacyclic_mul32(x, y, plan_fs))(a, b))
    p_st = np.asarray(jax.jit(lambda x, y: negacyclic_mul32(x, y, plan))(a, b))
    np.testing.assert_array_equal(p_fs, p_st)


def test_fourstep_pointwise_interop():
    """Evaluation-basis values agree, so key material NTT'd by one path is
    usable by the other: mixed-path polymul still exact."""
    n = 1 << 12
    q = next(two_adic_primes(31, 13))
    plan = ntt32_plan(q, n)
    plan_fs = ntt32_plan(q, n, fourstep=True)

    rng = np.random.default_rng(11)
    a = rng.integers(0, q, size=(2, n), dtype=np.uint32)
    b = rng.integers(0, q, size=(2, n), dtype=np.uint32)

    @jax.jit
    def mixed(x, y):
        return intt32(mul_mod32(ntt32(x, plan_fs), ntt32(y, plan), plan.zq), plan_fs)

    @jax.jit
    def pure(x, y):
        return negacyclic_mul32(x, y, plan)

    np.testing.assert_array_equal(np.asarray(mixed(a, b)), np.asarray(pure(a, b)))
