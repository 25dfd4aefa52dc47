"""FHEW scheme: layer round-trips, gate truth tables, multi-key e2e.

Mirrors the reference's test strategy (`lwe.rs`, `rlwe.rs`, `rgsw.rs`,
`boolean.rs` tests): enc/dec round-trips, homomorphic identities vs
schoolbook oracles, exhaustive truth tables.

Most tests use a scaled-down parameter set (N=2^7, n=16) to keep CPU time
sane; test_gates_reference_params runs one NAND at the reference's
single_key_testing_param fixture (`boolean.rs:225-239`).
"""

import numpy as np
import pytest

from learn_fhe_tpu.models.fhew import (
    BootstrapParams,
    FhewBool,
    FhewU8,
    LweParams,
    RgswParams,
    RlweParams,
    crs_gen,
    gates,
    key_gen,
    key_share_gen,
    key_share_merge,
    lwe,
    rgsw,
    rlwe,
)
from learn_fhe_tpu.utils.primes import two_adic_primes

from .helpers import schoolbook_negacyclic_mul_mod


def small_boot_params() -> BootstrapParams:
    q = next(two_adic_primes(28, 8))
    rlwe_p = RlweParams(q=q, p=4, log_n=7, log_b=7, d=4)
    rgsw_p = RgswParams(rlwe_p, log_b=7, d=4)
    lwe_s = LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4)
    return BootstrapParams(rgsw_p, lwe_s, w=5)


def reference_boot_params() -> BootstrapParams:
    q = next(two_adic_primes(28, 10))
    rlwe_p = RlweParams(q=q, p=4, log_n=9, log_b=7, d=4)
    rgsw_p = RgswParams(rlwe_p, log_b=7, d=4)
    lwe_s = LweParams(q=1 << 16, p=4, n=100, log_b=4, d=4)
    return BootstrapParams(rgsw_p, lwe_s, w=10)


# -- LWE (`lwe.rs:247-294`) ----------------------------------------------------


def test_lwe_encrypt_decrypt_add_sub(rng):
    params = LweParams(q=1 << 16, p=1 << 4, n=64)
    sk = lwe.sk_gen(params, rng)
    m = np.arange(16, dtype=np.uint64)
    ct = lwe.sk_encrypt(params, sk, lwe.encode(params, m), rng)
    got = np.asarray(lwe.decode(params, lwe.decrypt(params, sk, ct)))
    np.testing.assert_array_equal(got, m)
    m0 = rng.integers(0, 16, size=8, dtype=np.uint64)
    m1 = rng.integers(0, 16, size=8, dtype=np.uint64)
    ct0 = lwe.sk_encrypt(params, sk, lwe.encode(params, m0), rng)
    ct1 = lwe.sk_encrypt(params, sk, lwe.encode(params, m1), rng)
    add = np.asarray(lwe.decode(params, lwe.decrypt(params, sk, lwe.add(params, ct0, ct1))))
    sub = np.asarray(lwe.decode(params, lwe.decrypt(params, sk, lwe.sub(params, ct0, ct1))))
    np.testing.assert_array_equal(add, (m0 + m1) % 16)
    np.testing.assert_array_equal(sub, (m0 - m1) % 16)


def test_lwe_key_switch(rng):
    p0 = LweParams(q=1 << 16, p=1 << 4, n=64)
    p1 = LweParams(q=1 << 16, p=1 << 4, n=48, log_b=2, d=8)
    sk0, sk1 = lwe.sk_gen(p0, rng), lwe.sk_gen(p1, rng)
    ksk = lwe.ksk_gen(p1, sk1, sk0, rng)
    for m in range(16):
        m = np.uint64(m)
        ct = lwe.sk_encrypt(p0, sk0, lwe.encode(p0, m), rng)
        ct1 = lwe.key_switch(p1, ksk, ct)
        assert np.asarray(lwe.decode(p1, lwe.decrypt(p1, sk1, ct1))) == m


# -- RLWE (`rlwe.rs:326-460`) ---------------------------------------------------


def test_rlwe_roundtrip_automorphism_extract(rng):
    q = next(two_adic_primes(45, 8))
    params = RlweParams(q=q, p=16, log_n=6, log_b=5, d=9)
    z = rlwe.sk_gen(params, rng)
    pk = rlwe.pk_gen(params, z, rng)
    m = rng.integers(0, 16, size=64, dtype=np.uint64)
    for enc in (
        lambda pt: rlwe.sk_encrypt(params, z, pt, rng),
        lambda pt: rlwe.pk_encrypt(params, pk, pt, rng),
    ):
        ct = enc(rlwe.encode(params, m))
        got = np.asarray(rlwe.decode(params, rlwe.decrypt(params, z, ct)))
        np.testing.assert_array_equal(got, m)
    # automorphism: dec(auto(ct)) == auto(m) (`rlwe.rs:396-415`)
    from learn_fhe_tpu.ops.poly import automorphism_zq

    ct = rlwe.sk_encrypt(params, z, rlwe.encode(params, m), rng)
    for t in (5, -5, 25):
        ak = rlwe.ak_gen(params, t, z, rng)
        got = np.asarray(
            rlwe.decode(params, rlwe.decrypt(params, z, rlwe.automorphism(params, ak, ct)))
        )
        want = np.asarray(automorphism_zq(m, t, 16))
        np.testing.assert_array_equal(got, want)
    # sample extract
    lct = rlwe.sample_extract(params, ct, 5)
    lp = LweParams(q=q, p=16, n=64)
    assert np.asarray(lwe.decode(lp, lwe.decrypt(lp, z, lct))) == m[5]


# -- RGSW (`rgsw.rs:153-228`) ----------------------------------------------------


def test_rgsw_products(rng):
    q = next(two_adic_primes(45, 8))
    rp = RlweParams(q=q, p=16, log_n=6, log_b=5, d=9)
    gp = RgswParams(rp, log_b=5, d=9)
    z = rlwe.sk_gen(rp, rng)
    pk = rlwe.pk_gen(rp, z, rng)
    m0 = rng.integers(0, 16, size=64, dtype=np.uint64)
    m1 = rng.integers(0, 16, size=64, dtype=np.uint64)
    want = schoolbook_negacyclic_mul_mod(m0, m1, 16)
    ct0 = rgsw.pk_encrypt_rgsw(gp, pk, rgsw.encode(gp, m0), rng)
    # external: RGSW x RLWE
    ct1 = rlwe.pk_encrypt(rp, pk, rlwe.encode(rp, m1), rng)
    got = np.asarray(
        rlwe.decode(
            rp,
            rlwe.decrypt(rp, z, rgsw.external_product(gp, rgsw.to_eval(gp, ct0), ct1)),
        )
    )
    np.testing.assert_array_equal(got, want)
    # internal: RGSW x RGSW
    ct1g = rgsw.pk_encrypt_rgsw(gp, pk, rgsw.encode(gp, m1), rng)
    prod = rgsw.internal_product(gp, rgsw.to_eval(gp, ct0), ct1g)
    got = np.asarray(rgsw.decode(gp, rgsw.decrypt_rgsw(gp, z, prod)))
    np.testing.assert_array_equal(got, want)


# -- gates (`boolean.rs:256-318`) -------------------------------------------------

TRUTH = {
    "and": lambda a, b: a and b,
    "nand": lambda a, b: not (a and b),
    "or": lambda a, b: a or b,
    "nor": lambda a, b: not (a or b),
    "xor": lambda a, b: a != b,
    "xnor": lambda a, b: a == b,
}


@pytest.fixture(scope="module")
def small_bk():
    rng = np.random.default_rng(11)
    params = small_boot_params()
    z = rlwe.sk_gen(params.rlwe, rng)
    bk = key_gen(params, z, rng)
    return params, z, bk, rng


def test_gates_exhaustive(small_bk):
    params, z, bk, rng = small_bk

    def enc(m):
        return lwe.sk_encrypt(params.lwe_z, z, gates.encode_bool(params, m), rng)

    def dec(ct):
        return bool(np.asarray(gates.decode_bool(params, lwe.decrypt(params.lwe_z, z, ct))))

    for name, fn in TRUTH.items():
        for m0 in (False, True):
            for m1 in (False, True):
                got = dec(gates.gate(params, bk, name, enc(m0), enc(m1)))
                assert got == fn(m0, m1), (name, m0, m1, got)
    for m0 in (False, True):
        for m1 in (False, True):
            for m2 in (False, True):
                got = dec(gates.majority(params, bk, enc(m0), enc(m1), enc(m2)))
                assert got == (int(m0) + int(m1) + int(m2) >= 2)
    for m in (False, True):
        assert dec(gates.not_(params, enc(m))) == (not m)


def test_gates_reference_params(rng):
    """One NAND sweep at the reference fixture (`boolean.rs:225-239`)."""
    params = reference_boot_params()
    z = rlwe.sk_gen(params.rlwe, rng)
    bk = key_gen(params, z, rng)

    def enc(m):
        return lwe.sk_encrypt(params.lwe_z, z, gates.encode_bool(params, m), rng)

    def dec(ct):
        return bool(np.asarray(gates.decode_bool(params, lwe.decrypt(params.lwe_z, z, ct))))

    for m0 in (False, True):
        for m1 in (False, True):
            assert dec(gates.nand(params, bk, enc(m0), enc(m1))) == (not (m0 and m1))


# -- FhewBool derived circuits (`boolean.rs:139-176`) ------------------------------


def test_boolean_adders(small_bk):
    params, z, bk, rng = small_bk

    def enc(m):
        return FhewBool.sk_encrypt(params, bk, z, m, rng)

    for a in (False, True):
        for b in (False, True):
            s, c = enc(a).overflowing_add(enc(b))
            assert (s.decrypt(z), c.decrypt(z)) == ((a != b), (a and b))
            d, brw = enc(a).overflowing_sub(enc(b))
            assert (d.decrypt(z), brw.decrypt(z)) == ((a != b), ((not a) and b))
    # full adder + full subtractor (the 2-round majority forms), all combos
    for a in (False, True):
        for b in (False, True):
            for cin in (False, True):
                s, c = enc(a).carrying_add(enc(b), enc(cin))
                total = int(a) + int(b) + int(cin)
                assert (s.decrypt(z), c.decrypt(z)) == (total % 2 == 1, total >= 2)
                d, brw = enc(a).borrowing_sub(enc(b), enc(cin))
                diff = int(a) - int(b) - int(cin)
                assert (d.decrypt(z), brw.decrypt(z)) == (diff % 2 == 1, diff < 0)
    # select
    for sel in (False, True):
        got = enc(sel).select(enc(False), enc(True)).decrypt(z)
        assert got == sel


# -- multi-key (`boolean.rs:337-386`) ----------------------------------------------


def multi_key_boot_params() -> BootstrapParams:
    """Reference multi-key fixture (`boolean.rs:321-335`: q~2^54, B=2^6, d=9)
    scaled down in N and n -- internal products amplify noise, so the
    small-q single-key fixture does NOT have the budget for key merging."""
    q = next(two_adic_primes(54, 8))
    rlwe_p = RlweParams(q=q, p=4, log_n=7, log_b=6, d=9)
    rgsw_p = RgswParams(rlwe_p, log_b=6, d=9)
    lwe_s = LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4)
    return BootstrapParams(rgsw_p, lwe_s, w=5)


def test_multi_key_gates():
    rng = np.random.default_rng(5)
    params = multi_key_boot_params()
    n_parties = 2
    crs = crs_gen(params, rng)
    sks = [rlwe.sk_gen(params.rlwe, rng) for _ in range(n_parties)]
    pk_shares = [rlwe.pk_share_gen(params.rlwe, crs.pk_a, sk, rng) for sk in sks]
    pk = rlwe.pk_share_merge(params.rlwe, crs.pk_a, pk_shares)
    key_shares = [key_share_gen(params, crs, sk, pk, rng) for sk in sks]
    bk = key_share_merge(params, crs, key_shares)

    def enc(m):
        return FhewBool.pk_encrypt(params, bk, pk, m, rng)

    def dec(ct: FhewBool):
        shares = [ct.share_decrypt(sk, rng) for sk in sks]
        return ct.decryption_share_merge(shares)

    for m0 in (False, True):
        for m1 in (False, True):
            assert dec(enc(m0) & enc(m1)) == (m0 and m1), (m0, m1)
            assert dec(enc(m0) ^ enc(m1)) == (m0 != m1), (m0, m1)
    assert dec(enc(True)) is True and dec(enc(False)) is False


def test_external_product_u32_matches_u64(rng):
    """The u32 engine's external product is bit-identical to the u64 path:
    both compute exact mod-q values from the same key and ciphertext."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.fhew import rgsw as rgsw_mod
    from learn_fhe_tpu.models.fhew.rlwe import RlweCiphertext
    from learn_fhe_tpu.ops.modular import to_montgomery, u64
    from learn_fhe_tpu.ops.ntt import ntt

    q = next(two_adic_primes(28, 8))
    rlwe_p = RlweParams(q=q, p=4, log_n=6, log_b=7, d=4)
    params = RgswParams(rlwe_p, log_b=7, d=4)
    assert params.use_u32
    d2, n = 2 * params.gadget.d, params.n
    key_coeff = rgsw_mod.RgswCiphertext(
        jnp.asarray(rng.integers(0, q, size=(d2, n), dtype=np.uint64)),
        jnp.asarray(rng.integers(0, q, size=(d2, n), dtype=np.uint64)),
    )
    ct = RlweCiphertext(
        jnp.asarray(rng.integers(0, q, size=n, dtype=np.uint64)),
        jnp.asarray(rng.integers(0, q, size=n, dtype=np.uint64)),
    )
    # u32 engine (params.use_u32 -> Shoup-dual key)
    key32 = rgsw_mod.to_eval(params, key_coeff)
    out32 = rgsw_mod.external_product(params, key32, ct)
    # u64 Montgomery path on the same inputs
    zq = params.plan.zq
    key64 = rgsw_mod.RgswEval(
        to_montgomery(ntt(key_coeff.a, params.plan), zq),
        to_montgomery(ntt(key_coeff.b, params.plan), zq),
    )
    assert key64.a_dual is None  # forces the u64 branch
    out64 = rgsw_mod.external_product(params, key64, ct)
    assert np.array_equal(np.asarray(u64(out32.a)), np.asarray(out64.a))
    assert np.array_equal(np.asarray(u64(out32.b)), np.asarray(out64.b))


def test_fused_schedule_matches_switch_core(small_bk):
    """The fused (masked two-phase) walk must produce bit-identical
    accumulators to the original 3-way-switch walk for the same schedule."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.fhew import bootstrapping as boot
    from learn_fhe_tpu.models.fhew import gates, lwe

    params, z, bk, rng = small_bk
    m = np.array([1, 0, 1, 1], dtype=np.uint64)
    ct = lwe.sk_encrypt(params.lwe_z, np.asarray(z), gates.encode_bool(params, m), rng)
    ct = lwe.ct_mod_switch(ct, params.big_q, params.big_q_ks)
    ct = lwe.key_switch(params.lwe_s, lwe.LweKeySwitchingKey(bk.ksk_a, bk.ksk_b), ct)
    ct = lwe.ct_mod_switch_odd(ct, params.big_q_ks, params.q)
    f = gates.lut_poly(params, gates.GATE_TABLES["nand"])
    from learn_fhe_tpu.ops.poly import automorphism_zq, monomial_mul_zq
    from learn_fhe_tpu.ops.modular import u64

    g = boot.AUTO_G
    f_auto = automorphism_zq(u64(f), -g, params.big_q)
    for row in range(4):
        b_g = int((int(np.asarray(ct.b)[row]) * g) % (2 * params.n))
        fp = monomial_mul_zq(f_auto, b_g, params.big_q)
        acc = boot.RlweCiphertext(jnp.zeros_like(fp), fp)
        ops, idxs = boot.build_schedule(params, np.asarray(ct.a)[row])
        old = boot.blind_rotate_core(
            params, bk, jnp.asarray(ops), jnp.asarray(idxs), acc
        )
        e_idx, a_idx = boot.fuse_schedule(ops[None], idxs[None])
        new = boot.blind_rotate_core_fused(
            params, bk, jnp.asarray(e_idx[0]), jnp.asarray(a_idx[0]), acc
        )
        assert np.array_equal(np.asarray(old.a), np.asarray(new.a)), row
        assert np.array_equal(np.asarray(old.b), np.asarray(new.b)), row
