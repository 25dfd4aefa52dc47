"""Cross-implementation parity against the Rust reference dump.

tools/rust-dump is a ready-to-`cargo run` crate around `/root/reference`
(SURVEY.md §7.2 step 1). When a Rust toolchain exists:

    cd tools/rust-dump && cargo run --release -- ../../tests/vectors/rust_dump

and this module then asserts BIT-EXACT equality between the reference's
outputs and ours on identical splitmix64-generated inputs (ring products over
NTT primes, the exact FFT64 torus product, gadget decompositions). Without
the dump directory the tests verify the shared input stream and skip.
"""

import os

import numpy as np
import pytest

DUMP_DIR = os.path.join(os.path.dirname(__file__), "vectors", "rust_dump")

MASK = (1 << 64) - 1
SEED = 0x1FE20260817  # 0x1FE2026_08_17 in tools/rust-dump/src/main.rs


class SplitMix64:
    """Identical to the Rust harness's input stream."""

    def __init__(self, seed=SEED):
        self.s = seed & MASK

    def next(self) -> int:
        self.s = (self.s + 0x9E3779B97F4A7C15) & MASK
        z = self.s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        return z ^ (z >> 31)

    def below(self, bound: int) -> int:
        return self.next() % bound

    def fill(self, k: int, bound: int | None = None) -> np.ndarray:
        f = (lambda: self.below(bound)) if bound else self.next
        return np.array([f() for _ in range(k)], dtype=np.uint64)


def _expected_inputs():
    """Regenerate every input the Rust harness derives from the stream, in
    the exact same order."""
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q28 = next(two_adic_primes(28, 8))
    q55 = next(two_adic_primes(55, 6))
    rng = SplitMix64()
    out = {"q28": q28, "q55": q55}
    out["zq_mul_q28_a"] = rng.fill(64, q28)
    out["zq_mul_q28_b"] = rng.fill(64, q28)
    out["zq_mul_q55_a"] = rng.fill(32, q55)
    out["zq_mul_q55_b"] = rng.fill(32, q55)
    span = 1 << 23
    out["t64_mul_a"] = np.array(
        [(rng.below(span) - (1 << 22)) & MASK for _ in range(64)], dtype=np.uint64
    )
    out["t64_mul_b"] = rng.fill(64)
    out["decomp_zq_x"] = rng.fill(128, q28)
    out["decomp_t64_x"] = rng.fill(128)
    return out


def test_splitmix_stream_selfcheck():
    """Pin the stream itself (first values from the documented seed) so a
    drift on either side is caught even before a dump exists."""
    rng = SplitMix64()
    first = [rng.next() for _ in range(3)]
    assert first == [
        0xAA4A32DB569035BA,
        0xE48AE9141718D703,
        0x0B80BB5F838BD3C4,
    ], [hex(v) for v in first]


needs_dump = pytest.mark.skipif(
    not os.path.isdir(DUMP_DIR),
    reason="no rust dump present (run tools/rust-dump with a cargo toolchain)",
)


def _load(name):
    return np.load(os.path.join(DUMP_DIR, name + ".npy"))


@needs_dump
def test_zq_mul_parity():
    import jax.numpy as jnp

    from learn_fhe_tpu.ops.ntt import negacyclic_mul, ntt_plan

    exp = _expected_inputs()
    for tag, q, n in (("zq_mul_q28", exp["q28"], 64), ("zq_mul_q55", exp["q55"], 32)):
        assert int(_load(tag + "_q")[0]) == q
        a, b, c = _load(tag + "_a"), _load(tag + "_b"), _load(tag + "_c")
        np.testing.assert_array_equal(a, exp[tag + "_a"])
        np.testing.assert_array_equal(b, exp[tag + "_b"])
        got = np.asarray(negacyclic_mul(jnp.asarray(a), jnp.asarray(b), ntt_plan(q, n)))
        np.testing.assert_array_equal(got, c)


@needs_dump
def test_t64_mul_parity():
    import jax.numpy as jnp

    from learn_fhe_tpu.ops.torus_crt import negacyclic_mul_t64_crt

    exp = _expected_inputs()
    a, b, c = _load("t64_mul_a"), _load("t64_mul_b"), _load("t64_mul_c")
    np.testing.assert_array_equal(a, exp["t64_mul_a"])
    np.testing.assert_array_equal(b, exp["t64_mul_b"])
    got = np.asarray(negacyclic_mul_t64_crt(jnp.asarray(a), jnp.asarray(b), 23))
    np.testing.assert_array_equal(got, c)


@needs_dump
def test_decompose_parity():
    import jax.numpy as jnp

    from learn_fhe_tpu.ops import gadget as gad

    exp = _expected_inputs()
    x = _load("decomp_zq_x")
    np.testing.assert_array_equal(x, exp["decomp_zq_x"])
    got = np.asarray(gad.decompose_zq(jnp.asarray(x), gad.Gadget(exp["q28"], 7, 4)))
    np.testing.assert_array_equal(got, _load("decomp_zq_digits"))

    xt = _load("decomp_t64_x")
    np.testing.assert_array_equal(xt, exp["decomp_t64_x"])
    got_t = np.asarray(gad.decompose_t64(jnp.asarray(xt), gad.Gadget(0, 23, 2)))
    np.testing.assert_array_equal(got_t, _load("decomp_t64_digits"))
