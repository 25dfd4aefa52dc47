"""TFHE: torus layer round-trips, external products, programmable bootstrap.

Mirrors the reference tests (`tlwe.rs:162-192`, `tglwe.rs:139-166`,
`tgsw.rs/tggsw.rs` product tests, `bootstrapping.rs:138-164`). Noise levels
follow the reference fixtures -- the d=1/log_b=23 gadget needs the tiny
2.85e-15 TGGSW sigma or digit-convolved noise swamps the message.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from learn_fhe_tpu.models.tfhe import (
    BootstrapParams,
    TggswParams,
    TglweParams,
    TgswParams,
    TlweParams,
    bootstrap,
    key_gen,
    lut_table,
    tggsw,
    tglwe,
    tgsw,
    tlwe,
)

from .helpers import schoolbook_negacyclic_mul_wrap64


def test_torus_mul_vs_schoolbook(rng):
    from learn_fhe_tpu.ops.torus_ntt import negacyclic_mul_t64

    for n, small_bits in [(8, 23), (64, 23), (256, 23), (64, 1)]:
        a = rng.integers(-(1 << small_bits) + 1, 1 << small_bits, size=n).astype(
            np.int64
        ).astype(np.uint64)
        b = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2 + rng.integers(
            0, 2, size=n, dtype=np.uint64
        )
        got = np.asarray(negacyclic_mul_t64(a, b))
        np.testing.assert_array_equal(got, schoolbook_negacyclic_mul_wrap64(a, b))


def test_tlwe_roundtrip_keyswitch(rng):
    p0 = TlweParams(log_p=8, padding=1, n=64, std_dev=1e-8)
    sk = tlwe.sk_gen(p0, rng)
    m = np.arange(256, dtype=np.uint64)
    ct = tlwe.sk_encrypt(p0, sk, tlwe.encode(p0, m), rng)
    got = np.asarray(tlwe.decode(p0, tlwe.decrypt(p0, sk, ct)))
    np.testing.assert_array_equal(got, m)
    p1 = TlweParams(log_p=8, padding=1, n=48, std_dev=1e-8, log_b=8, d=8)
    sk1 = tlwe.sk_gen(p1, rng)
    ksk = tlwe.ksk_gen(p1, sk1, sk, rng)
    got = np.asarray(
        tlwe.decode(p1, tlwe.decrypt(p1, sk1, tlwe.key_switch(p1, ksk, ct)))
    )
    np.testing.assert_array_equal(got, m)


def test_tglwe_roundtrip_extract(rng):
    gp = TglweParams(log_p=8, padding=1, big_n=64, k=2, std_dev=1e-8)
    sk = tglwe.sk_gen(gp, rng)
    m = rng.integers(0, 256, size=64, dtype=np.uint64)
    ct = tglwe.sk_encrypt(gp, sk, tglwe.encode(gp, m), rng)
    got = np.asarray(tglwe.decode(gp, tglwe.decrypt(gp, sk, ct)))
    np.testing.assert_array_equal(got, m)
    lv = gp.tlwe_view()
    for i in (0, 3, 63):
        ext = tglwe.sample_extract(gp, ct, i)
        got = np.asarray(tlwe.decode(lv, tlwe.decrypt(lv, sk.reshape(-1), ext)))
        assert got == m[i]
    # rotate: X^5 shifts/negates coefficients
    rot = tglwe.rotate(ct, 5)
    got = np.asarray(tglwe.decode(gp, tglwe.decrypt(gp, sk, rot)))
    mono = np.zeros(64, dtype=np.uint64)
    mono[5] = 1
    want = schoolbook_negacyclic_mul_wrap64(m << np.uint64(55), mono) >> np.uint64(55)
    np.testing.assert_array_equal(got, want % 256)


def test_tgsw_product_cmux(rng):
    tp = TgswParams(TlweParams(log_p=8, padding=1, n=32, std_dev=1e-9), log_b=8, d=7)
    sk = tlwe.sk_gen(tp.tlwe, rng)
    ct0 = tgsw.sk_encrypt(tp, sk, jnp.uint64(7), rng)
    ct1 = tlwe.sk_encrypt(tp.tlwe, sk, tlwe.encode(tp.tlwe, np.uint64(13)), rng)
    prod = tgsw.external_product(tp, ct0, ct1)
    assert np.asarray(tlwe.decode(tp.tlwe, tlwe.decrypt(tp.tlwe, sk, prod))) == (7 * 13) % 256
    ctf = tlwe.sk_encrypt(tp.tlwe, sk, tlwe.encode(tp.tlwe, np.uint64(11)), rng)
    ctt = tlwe.sk_encrypt(tp.tlwe, sk, tlwe.encode(tp.tlwe, np.uint64(22)), rng)
    for bit, want in [(0, 11), (1, 22)]:
        cb = tgsw.sk_encrypt(tp, sk, jnp.uint64(bit), rng)
        out = tgsw.cmux(tp, cb, ctf, ctt)
        assert np.asarray(tlwe.decode(tp.tlwe, tlwe.decrypt(tp.tlwe, sk, out))) == want


def test_tggsw_product(rng):
    gg = TggswParams(
        TglweParams(log_p=8, padding=1, big_n=64, k=1, std_dev=2.85e-15), log_b=23, d=1
    )
    sk = tglwe.sk_gen(gg.tglwe, rng)
    m = rng.integers(0, 256, size=64, dtype=np.uint64)
    scalar = np.zeros(64, dtype=np.uint64)
    scalar[0] = 3
    ct0 = tggsw.sk_encrypt(gg, sk, jnp.asarray(scalar), rng)
    ct1 = tglwe.sk_encrypt(gg.tglwe, sk, tglwe.encode(gg.tglwe, m), rng)
    prod = tggsw.external_product(gg, tggsw.to_eval(gg, ct0), ct1)
    got = np.asarray(tglwe.decode(gg.tglwe, tglwe.decrypt(gg.tglwe, sk, prod)))
    np.testing.assert_array_equal(got, (m * 3) % 256)


@pytest.fixture(scope="module")
def pbs_env():
    rng = np.random.default_rng(17)
    params = BootstrapParams(
        TlweParams(log_p=2, padding=1, n=64, std_dev=1.34e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=256, k=1, std_dev=2.85e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, rng)
    bk = key_gen(params, z, rng)
    return params, z, bk, rng


def test_pbs_luts(pbs_env):
    """Identity / double / parity LUTs over all messages
    (`bootstrapping.rs:138-164`)."""
    params, z, bk, rng = pbs_env
    p = params.tlwe.p
    for f in [lambda v: v, lambda v: (2 * v) % p, lambda v: v % 2]:
        tab = jnp.asarray(lut_table(params.tlwe.log_p, params.big_n, f))
        for m in range(p):
            ct = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, np.uint64(m)), rng)
            out = bootstrap(params, bk, tab, ct)
            got = int(np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out))))
            assert got == f(m), (m, got, f(m))


@pytest.mark.slow
def test_pbs_reference_params():
    """The reference fixture (`bootstrapping.rs:141-152`): p=2^4, TLWE n=1024,
    TGGSW N=2048, k=1, B=2^23, d=1 -- identity LUT over all 16 messages."""
    rng = np.random.default_rng(23)
    params = BootstrapParams(
        TlweParams(log_p=4, padding=1, n=1024, std_dev=1.339775301998614e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=4, padding=1, big_n=2048, k=1, std_dev=2.845267479601915e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, rng)
    bk = key_gen(params, z, rng)
    tab = jnp.asarray(lut_table(4, 2048, lambda v: v))
    for m in (0, 5, 15):
        ct = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, np.uint64(m)), rng)
        out = bootstrap(params, bk, tab, ct)
        got = int(np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out))))
        assert got == m


def test_key_switch_mxu_matches_u64(rng):
    """The MXU i8-limb wrapping dot is bit-identical to the u64 dot, and the
    log_b=8 parameter set (digits can hit +128 > i8 max) stays on the u64
    path (regression: an i8 overflow flipped +128 to -128)."""
    from learn_fhe_tpu.ops.gadget import decompose_t64

    def ref_ks(params, ksk, ct):
        limbs = jnp.moveaxis(decompose_t64(ct.a, params.gadget), 0, -2)
        flat = np.asarray(limbs.reshape(*limbs.shape[:-2], -1))
        d, n_from, n_to = ksk.a.shape
        ka = np.asarray(ksk.a).reshape(d * n_from, n_to)
        kb = np.asarray(ksk.b).reshape(d * n_from)
        a = np.einsum("bk,kn->bn", flat, ka, dtype=np.uint64, casting="unsafe")
        b = (flat * kb[None]).sum(axis=1, dtype=np.uint64) + np.asarray(ct.b)
        return a, b

    for log_b, d in [(4, 5), (7, 4), (8, 8)]:  # 8 exercises the u64 fallback
        params = TlweParams(log_p=4, padding=1, n=32, std_dev=1e-8, log_b=log_b, d=d)
        n_from = 64
        ksk = tlwe.TlweKeySwitchingKey(
            jnp.asarray(rng.integers(0, 1 << 64, size=(d, n_from, 32), dtype=np.uint64)),
            jnp.asarray(rng.integers(0, 1 << 64, size=(d, n_from), dtype=np.uint64)),
        )
        ct = tlwe.TlweCiphertext(
            jnp.asarray(rng.integers(0, 1 << 64, size=(6, n_from), dtype=np.uint64)),
            jnp.asarray(rng.integers(0, 1 << 64, size=(6,), dtype=np.uint64)),
        )
        out = tlwe.key_switch(params, ksk, ct)
        ref_a, ref_b = ref_ks(params, ksk, ct)
        assert np.array_equal(np.asarray(out.a), ref_a), log_b
        assert np.array_equal(np.asarray(out.b), ref_b), log_b


def test_pbs_k2_d2(rng):
    """PBS correctness at k=2 ring components and d=2 gadget digits — shapes
    the reference fixtures never exercise (`tggsw.rs` supports general k,d)."""
    from learn_fhe_tpu.models.tfhe import (
        BootstrapParams,
        TggswParams,
        TglweParams,
        key_gen,
        lut_table,
        tglwe,
    )
    from learn_fhe_tpu.parallel.batch import tfhe_pbs_batch

    params = BootstrapParams(
        TlweParams(log_p=2, padding=1, n=16, std_dev=1e-9, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=64, k=2, std_dev=1e-11),
            log_b=12,
            d=2,
        ),
    )
    z = tlwe.sk_gen(params.tlwe, rng)
    key = key_gen(params, z, rng)
    tab = jnp.asarray(lut_table(2, 64, lambda v: (3 * v + 1) % 4))
    ms = np.arange(8, dtype=np.uint64) % 4
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    out = tfhe_pbs_batch(params, key, tab, cts)
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    np.testing.assert_array_equal(got, (3 * ms + 1) % 4)

def test_pbs_2d_batch(pbs_env):
    """blind_rotate with a 2-D leading batch shape: the documented `(...,)`
    batch signature beyond the 1-D case tfhe_pbs_batch flattens to."""
    params, z, bk, rng = pbs_env
    p = params.tlwe.p
    tab = jnp.asarray(lut_table(params.tlwe.log_p, params.big_n, lambda v: v))
    ms = (np.arange(6, dtype=np.uint64) % p).reshape(2, 3)
    ct = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    out = bootstrap(params, bk, tab, ct)
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    assert got.shape == (2, 3)
    np.testing.assert_array_equal(got, ms)
