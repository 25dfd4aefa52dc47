"""Full CKKS bootstrapping (EvalMod) — beyond the reference's scope (its
bootstrapping.rs stops at the linear transforms). An exhausted ciphertext
comes back at a usable level carrying the same (small) message.
"""

import os

import numpy as np
import pytest

from learn_fhe_tpu.models.ckks import bootstrapping as B
from learn_fhe_tpu.models.ckks import ckks as C
from learn_fhe_tpu.models.ckks import evalmod as E


def test_mod_raise_phase():
    """mod_raise embeds the centered bottom-level phase exactly: decrypting
    the raised ciphertext over Q equals the centered residues mod q0 up to
    exact q0 multiples (the integer polynomial I the sine removes)."""
    rng = np.random.default_rng(3)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=4)
    sk = C.sk_gen(params, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.1
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))
    raised = E.mod_raise(params, low)
    assert raised.qs == params.qs
    from learn_fhe_tpu.utils.crt import rns_to_bigints

    q0 = params.qs[0]
    pt_low = np.asarray(C.decrypt(params, sk, low))
    vals_low = rns_to_bigints(pt_low, (q0,))  # centered mod q0
    pt_hi = np.asarray(C.decrypt(params, sk, raised))
    vals_hi = rns_to_bigints(pt_hi, params.qs)  # centered mod Q
    diff = (np.array(vals_hi, dtype=object) - np.array(vals_low, dtype=object))
    I = diff / q0
    assert all(d % q0 == 0 for d in diff), "phase differs by non-q0 multiple"
    assert max(abs(int(i)) for i in I) < 20, "wrap count implausibly large"


def test_eval_chebyshev_matches_host():
    """Homomorphic Chebyshev evaluation equals numpy chebval."""
    rng = np.random.default_rng(5)
    params = C.CkksParams(log_n=4, log_qi=55, big_l=10)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    t = (rng.random(params.l) - 0.5) * 2  # [-1, 1], real slots
    ct = C.sk_encrypt(params, sk, C.encode(params, t.astype(np.complex128)), params.qs, rng)
    coeffs = rng.standard_normal(21) * (0.5 ** np.arange(21))
    out = E.eval_chebyshev(params, rlk, ct, coeffs)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    want = np.polynomial.chebyshev.chebval(t, coeffs)
    err = np.max(np.abs(got - want))
    assert err < 1e-6, err


@pytest.mark.slow
def test_full_bootstrap_arcsin_correction():
    """The cubic arcsine correction (EvalModParams.arcsin) lifts the sine
    model's cubic-error floor for 2 extra levels; at N=2^5 the bootstrap is
    then transform/noise-bound, measured 26.9 bits vs 26.2 plain on the
    same keys (host model of the pure-function floor: 23.9 -> 46.3 bits)."""
    rng = np.random.default_rng(11)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=22)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))
    em = E.EvalModParams(k=24, r=4, degree=34, arcsin=True)
    out = E.bootstrap(params, bk, rlk, cjk, low, em)
    assert len(out.qs) >= 3, f"levels left: {len(out.qs)}"
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap arcsin: {len(out.qs)} levels left, {rel_bits:.1f} bits")
    assert rel_bits > 25.0, rel_bits


@pytest.mark.slow
def test_full_bootstrap_batch_sharded():
    """The batched bootstrap's leading ciphertext axis shards over the
    device mesh (dp): same pipeline, batch split 4-ways x limb 2 — output
    bit-identical to the unsharded run (every op is batch-elementwise, so
    XLA keeps the sharding end to end with no resharding collectives)."""
    import jax.numpy as jnp

    from learn_fhe_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.default_rng(23)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=20)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    ms = [(rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
          for _ in range(8)]
    lows = [C.to_level(
        C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng),
        (params.qs[0],)) for m in ms]
    bct = C.CkksCiphertext(
        jnp.stack([c.b for c in lows]), jnp.stack([c.a for c in lows]),
        (params.qs[0],))
    out = E.bootstrap(params, bk, rlk, cjk, bct)

    mesh = make_mesh(n_batch=4, n_limb=2)
    bct_sh = C.CkksCiphertext(
        shard_batch(mesh, bct.b), shard_batch(mesh, bct.a), bct.qs)
    out_sh = E.bootstrap(params, bk, rlk, cjk, bct_sh)
    assert out_sh.qs == out.qs
    np.testing.assert_array_equal(np.asarray(out_sh.b), np.asarray(out.b))
    np.testing.assert_array_equal(np.asarray(out_sh.a), np.asarray(out.a))
    one = C.CkksCiphertext(out_sh.b[0], out_sh.a[0], out_sh.qs)
    got = C.decode(params, C.decrypt(params, sk, one), out_sh.qs)
    assert np.max(np.abs(got - ms[0])) < np.max(np.abs(ms[0])) * 0.05


@pytest.mark.slow
def test_full_bootstrap_high_precision():
    """High-precision configuration: 60-bit primes lift the Delta=2^55
    rescale/ksk noise floor (+4.5 bits, stage probe) and the arcsine
    correction lifts the sine-model floor; together the end-to-end
    bootstrap reaches ~29.8 relative bits at N=2^5 (was 25.3 at the
    55-bit plain config)."""
    rng = np.random.default_rng(11)
    params = C.CkksParams(log_n=5, log_qi=60, big_l=22)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))
    em = E.EvalModParams(k=24, r=4, degree=34, arcsin=True)
    out = E.bootstrap(params, bk, rlk, cjk, low, em)
    assert len(out.qs) >= 2, f"levels left: {len(out.qs)}"
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap hi-prec: {len(out.qs)} levels left, {rel_bits:.1f} bits")
    assert rel_bits > 27.0, rel_bits


@pytest.mark.slow
def test_full_bootstrap_roundtrip():
    """encrypt -> drop to the last limb -> bootstrap -> decrypt ~ m, with
    usable levels remaining."""
    rng = np.random.default_rng(11)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=20)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)

    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    low = C.to_level(ct, (params.qs[0],))

    out = E.bootstrap(params, bk, rlk, cjk, low)
    assert len(out.qs) >= 2, f"no levels left: {len(out.qs)}"
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap: {len(out.qs)} levels left, abs err {err:.2e}, "
          f"{rel_bits:.1f} relative bits")
    # 26.3 bits measured with exact scale tracking (evalmod.py); was 22.6
    # under the fixed-scale drift. 2-bit margin for rng variation.
    assert rel_bits > 24.0, rel_bits


@pytest.mark.slow
def test_full_bootstrap_larger_ring():
    """N=128: the wrap count K grows with the secret's hamming weight
    (~3*sqrt(h)/2 typical); k=24 with one extra double-angle covers it at
    the same depth+1 (host model: 37.1 bits)."""
    rng = np.random.default_rng(2)
    params = C.CkksParams(log_n=7, log_qi=55, big_l=21)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    em = E.EvalModParams(k=24, r=4, degree=34)
    out = E.bootstrap(params, bk, rlk, cjk, C.to_level(ct, (params.qs[0],)), em)
    assert len(out.qs) >= 2, len(out.qs)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap N=128: {len(out.qs)} levels left, {rel_bits:.1f} relative bits")
    # 24.5 bits measured with exact scale tracking; was 16.3 before
    assert rel_bits > 22.0, rel_bits


@pytest.mark.slow
def test_full_bootstrap_production_ring():
    """N=1024 — the reference's largest CKKS test ring (`ckks.rs:306` sweeps
    log_n 1..10) — with a sparse ternary secret (h=64, HEAAN practice): the
    wrap count matches the N=128 dense case, so the same EvalMod depth
    carries to the production ring."""
    rng = np.random.default_rng(17)
    params = C.CkksParams(log_n=10, log_qi=55, big_l=21)
    sk = C.sk_gen_sparse(params, 64, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    em = E.EvalModParams(k=24, r=4, degree=34)
    out = E.bootstrap(params, bk, rlk, cjk, C.to_level(ct, (params.qs[0],)), em)
    assert len(out.qs) >= 2, len(out.qs)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap N=1024 (h=64): {len(out.qs)} levels left, "
          f"{rel_bits:.1f} relative bits")
    # 21.7 bits measured with exact scale tracking; was 11.3 before (the
    # compounded rescale drift dominated; ARCHITECTURE §14)
    assert rel_bits > 19.0, rel_bits


@pytest.mark.slow
def test_full_bootstrap_batched():
    """A leading ciphertext batch axis broadcasts through the WHOLE bootstrap
    (mod_raise, fused BSGS transforms, EvalMod) with shared keys — the
    throughput axis (ARCHITECTURE §6) applied to CKKS bootstrapping."""
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    params = C.CkksParams(log_n=5, log_qi=55, big_l=20)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    ms = [(rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
          for _ in range(3)]
    lows = [C.to_level(
        C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng),
        (params.qs[0],)) for m in ms]
    bct = C.CkksCiphertext(
        jnp.stack([c.b for c in lows]), jnp.stack([c.a for c in lows]),
        (params.qs[0],))
    out = E.bootstrap(params, bk, rlk, cjk, bct)
    assert len(out.qs) >= 2
    for i, m in enumerate(ms):
        one = C.CkksCiphertext(out.b[i], out.a[i], out.qs)
        got = C.decode(params, C.decrypt(params, sk, one), out.qs)
        err = np.max(np.abs(got - m))
        assert err < np.max(np.abs(m)) * 0.05, (i, err)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("FHE_TPU_HEAVY"),
    reason="~10 min single-run test; set FHE_TPU_HEAVY=1 to include",
)
def test_full_bootstrap_n8192():
    """N=2^13 — the repo's CKKS *production* ring (the mul benchmark shape).
    Four CtS + four StC chunks at l=4096 consume two more levels than
    N=2^10, so big_l=23 leaves the same 2 levels. Measured 2026-08-17 on
    CPU: 18.6 relative bits, 594 s eval (exact scale tracking; the sine
    model still gives 28 bits, the gap is transform precision at l=4096)."""
    rng = np.random.default_rng(29)
    params = C.CkksParams(log_n=13, log_qi=55, big_l=23)
    sk = C.sk_gen_sparse(params, 64, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    em = E.EvalModParams(k=24, r=4, degree=34)
    out = E.bootstrap(params, bk, rlk, cjk, C.to_level(ct, (params.qs[0],)), em)
    assert len(out.qs) >= 2, len(out.qs)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap N=8192 (h=64): {len(out.qs)} levels left, {rel_bits:.1f} relative bits")
    assert rel_bits > 16.0, rel_bits


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("FHE_TPU_HEAVY"),
    reason="~12 min single-run test; set FHE_TPU_HEAVY=1 to include",
)
def test_full_bootstrap_n8192_high_precision():
    """N=2^13 with the high-precision config (60-bit primes + arcsine,
    ARCHITECTURE 16): the staged probe measured 23.7 relative bits
    end-to-end with 2 levels left on 2026-08-18 (vs 18.9 at the 55-bit
    plain config) — EvalMod's sqrt(N)-scaled noise wall binds, the l=4096
    transforms sit ~5 bits above it."""
    rng = np.random.default_rng(31)
    params = C.CkksParams(log_n=13, log_qi=60, big_l=25)
    sk = C.sk_gen_sparse(params, 64, rng)
    rlk = C.rlk_gen(params, sk, rng)
    cjk = C.cjk_gen(params, sk, rng)
    bp = B.BootstrapParams(params, r=3)
    bk = B.key_gen(bp, sk, rng)
    m = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 1e-4
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    em = E.EvalModParams(k=24, r=4, degree=34, arcsin=True)
    out = E.bootstrap(params, bk, rlk, cjk, C.to_level(ct, (params.qs[0],)), em)
    assert len(out.qs) >= 2, len(out.qs)
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    err = np.max(np.abs(got - m))
    rel_bits = -np.log2(err / np.max(np.abs(m)))
    print(f"bootstrap N=8192 hi-prec: {len(out.qs)} levels left, {rel_bits:.1f} bits")
    assert rel_bits > 21.0, rel_bits
