"""Scheme-level protocol parity against the Rust reference transcripts.

tools/rust-dump's `transcripts.rs` drives the reference's full protocols —
keygen -> encrypt -> gate/bootstrap/mul -> decrypt — through a deterministic
SplitMix64-backed RngCore and dumps every secret key, evaluation key,
ciphertext, and plaintext. When a cargo toolchain exists:

    cd tools/rust-dump && cargo run --release -- ../../tests/vectors/rust_dump

and this module then asserts, using the DUMPED reference keys inside OUR
pipelines:

  - FHEW (`scheme/fhew`, single-key fixture `boolean.rs:225-239`):
    nand/and/or/xor outputs BIT-EXACT (our LMKCDEY walk reproduces the
    reference op-for-op over exact integer arithmetic).
  - TFHE (`scheme/tfhe`, fixture `bootstrapping.rs:141-152`): PBS outputs at
    the decrypt/phase level (our NTT-domain monomial rotation differs from
    the reference CMux by one decomposition-rounding term, ARCHITECTURE §4,
    so ciphertext bits legitimately differ).
  - CKKS (`scheme/ckks`, `ckks.rs:303-345` at log_n=9): encode parity and
    the deterministic mul/relin/rescale + rotate + conjugate paths BIT-EXACT.

Without the transcript files the tests skip (the kernel-level dump parity
lives in tests/test_rust_dump.py).
"""

import os

import numpy as np
import pytest

DUMP_DIR = os.path.join(os.path.dirname(__file__), "vectors", "rust_dump")

needs_transcripts = pytest.mark.skipif(
    not os.path.isfile(os.path.join(DUMP_DIR, "fhew_rng_probe.npy")),
    reason="no rust transcript dump present (run tools/rust-dump with cargo, "
    "or the independent oracle: python tools/pydump/*_dump.py)",
)

# the TFHE key material (151MB) is regenerable and kept out of git:
# `make parity` (= python tools/pydump/tfhe_dump.py, ~40 min CPU, one-time)
needs_tfhe_keys = pytest.mark.skipif(
    not os.path.isfile(os.path.join(DUMP_DIR, "tfhe_brk.npy")),
    reason="TFHE transcript key material absent — regenerate with `make parity` "
    "(~40 min, one-time per checkout)",
)


def _load(name):
    return np.load(os.path.join(DUMP_DIR, name + ".npy"))


def _i64(name):
    return _load(name).view(np.int64)


# -- FHEW --------------------------------------------------------------------


@pytest.fixture(scope="module")
def fhew_setup():
    from learn_fhe_tpu.models.fhew import (
        BootstrapParams,
        LweParams,
        RgswParams,
        RlweParams,
    )
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(28, 10))
    rlwe_p = RlweParams(q=q, p=4, log_n=9, log_b=7, d=4)
    return BootstrapParams(
        RgswParams(rlwe_p, log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=100, log_b=4, d=4),
        w=10,
    )


@needs_transcripts
def test_fhew_gate_transcript_parity(fhew_setup):
    """Reference keys + reference inputs -> our gate pipeline must reproduce
    the reference's output ciphertexts bit-for-bit."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.fhew import gates, lwe, rgsw
    from learn_fhe_tpu.models.fhew.bootstrapping import _pack_key
    from learn_fhe_tpu.models.fhew.lwe import LweCiphertext, LweKeySwitchingKey
    from learn_fhe_tpu.models.fhew.rgsw import RgswCiphertext
    from learn_fhe_tpu.models.fhew.rlwe import RlweCiphertext, make_ksk

    params = fhew_setup
    n, d, d_s, n_s = params.n, params.rgsw.gadget.d, 4, 100

    # keys from the dump, moved into our evaluation-basis residency
    ksk_a = _load("fhew_ksk_a").reshape(d_s, n, n_s)
    ksk_b = _load("fhew_ksk_b").reshape(d_s, n)
    ksk = LweKeySwitchingKey(jnp.asarray(ksk_a), jnp.asarray(ksk_b))
    brk_raw = _load("fhew_brk")  # (n_s, 2d, 2, n)
    brk = RgswCiphertext(jnp.asarray(brk_raw[:, :, 0]), jnp.asarray(brk_raw[:, :, 1]))
    brk_eval = rgsw.to_eval(params.rgsw, brk)
    ak_raw = _load("fhew_ak")  # (w+1, d, 2, n)
    ak_t = _i64("fhew_ak_t")
    np.testing.assert_array_equal(ak_t, np.asarray(params.ak_t))
    ak_ksks = [
        make_ksk(
            params.rlwe,
            RlweCiphertext(jnp.asarray(ak_raw[v, :, 0]), jnp.asarray(ak_raw[v, :, 1])),
        )
        for v in range(ak_raw.shape[0])
    ]
    bk = _pack_key(params, ksk, brk_eval, ak_ksks)

    # decrypt sanity on the dumped inputs with the dumped secret key
    z = _i64("fhew_sk_z")
    in_a = _load("fhew_gate_in_a")  # (4, 2, n)
    in_b = _load("fhew_gate_in_b").reshape(4, 2)
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    for i, (m0, m1) in enumerate(combos):
        for j, m in enumerate((m0, m1)):
            ct = LweCiphertext(jnp.asarray(in_a[i, j]), jnp.asarray(in_b[i, j]))
            got = np.asarray(
                gates.decode_bool(params, lwe.decrypt(params.lwe_z, z, ct))
            )
            assert bool(got) == bool(m), (i, j)

    truth = {
        "nand": lambda a, b: not (a and b),
        "and": lambda a, b: a and b,
        "or": lambda a, b: a or b,
        "xor": lambda a, b: a != b,
    }
    for name, fn in truth.items():
        out_a = _load(f"fhew_gate_{name}_out_a")  # (4, n)
        out_b = _load(f"fhew_gate_{name}_out_b")
        for i, (m0, m1) in enumerate(combos):
            ct0 = LweCiphertext(jnp.asarray(in_a[i, 0]), jnp.asarray(in_b[i, 0]))
            ct1 = LweCiphertext(jnp.asarray(in_a[i, 1]), jnp.asarray(in_b[i, 1]))
            out = gates.gate(params, bk, name, ct0, ct1)
            np.testing.assert_array_equal(np.asarray(out.a), out_a[i]), (name, i)
            assert int(np.asarray(out.b)) == int(out_b[i]), (name, i)
            dec = np.asarray(
                gates.decode_bool(params, lwe.decrypt(params.lwe_z, z, out))
            )
            assert bool(dec) == fn(bool(m0), bool(m1)), (name, i)


# -- FHEW multi-key ----------------------------------------------------------

# the brk transcripts (3 x 14.7 MB) are regenerable and kept out of git:
# `make parity` (= python tools/pydump/fhew_mk_dump.py, ~8 min, one-time)
needs_mk_transcripts = pytest.mark.skipif(
    not os.path.isfile(os.path.join(DUMP_DIR, "fhew_mk_brk.npy")),
    reason="multi-key transcript brk material absent — regenerate with "
    "`make parity` (~8 min, one-time per checkout)",
)


@pytest.fixture(scope="module")
def fhew_mk_setup():
    """The reference's multi-key fixture (`boolean.rs:321-335`): q ~ 2^54 NTT
    prime, N = 2^9, B = 2^6, d = 9; LWE n = 100, q_ks = 2^16, B = 2^4,
    d = 4; w = 10; 2 parties."""
    from learn_fhe_tpu.models.fhew import (
        BootstrapParams,
        LweParams,
        RgswParams,
        RlweParams,
    )
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(54, 10))
    rlwe_p = RlweParams(q=q, p=4, log_n=9, log_b=6, d=9)
    return BootstrapParams(
        RgswParams(rlwe_p, log_b=6, d=9),
        LweParams(q=1 << 16, p=4, n=100, log_b=4, d=4),
        w=10,
    )


@needs_mk_transcripts
def test_fhew_mk_merge_transcript_parity(fhew_mk_setup):
    """The last reference protocol without independent-lineage verification
    (`scheme/fhew/src/bootstrapping.rs:251-321`): dumped crs + per-party key
    shares -> OUR key_share_merge must reproduce the oracle's merged
    bootstrap key (brk via RGSW internal products, ksk/ak share sums)
    bit-for-bit, and a NAND gate evaluated under OUR merged key must
    reproduce the oracle's output ciphertexts bit-for-bit, closing with a
    threshold decrypt through OUR decryption_share_merge."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.fhew import gates, lwe, rgsw
    from learn_fhe_tpu.models.fhew.bootstrapping import (
        BootstrapCrs,
        BootstrapKeyShare,
        key_share_merge,
    )
    from learn_fhe_tpu.models.fhew.lwe import LweCiphertext
    from learn_fhe_tpu.models.fhew.rgsw import RgswCiphertext

    params = fhew_mk_setup
    n, d = params.n, params.rgsw.gadget.d  # 512, 9
    d_s, n_s, n_parties = 4, 100, 2
    np.testing.assert_array_equal(_i64("fhew_mk_ak_t"), np.asarray(params.ak_t))

    crs = BootstrapCrs(
        jnp.asarray(_load("fhew_mk_crs_pk_a")),
        jnp.asarray(_load("fhew_mk_crs_ksk_a").reshape(d_s, n, n_s)),
        jnp.asarray(_load("fhew_mk_crs_ak_a").reshape(params.w + 1, d, n)),
    )
    shares = []
    for p in range(n_parties):
        brk_raw = _load(f"fhew_mk_brk_share{p}").reshape(n_s, 2 * d, 2, n)
        shares.append(
            BootstrapKeyShare(
                jnp.asarray(_load(f"fhew_mk_ksk_b_share{p}").reshape(d_s, n)),
                RgswCiphertext(
                    jnp.asarray(brk_raw[:, :, 0]), jnp.asarray(brk_raw[:, :, 1])
                ),
                jnp.asarray(_load(f"fhew_mk_ak_b_share{p}").reshape(params.w + 1, d, n)),
            )
        )

    # the brk fold at the coefficient level, through the library's own
    # internal product (`rgsw.rs:130-150` semantics), vs the oracle's merge
    key_ev = rgsw.to_eval(params.rgsw, shares[0].brk)
    merged = rgsw.internal_product(params.rgsw, key_ev, shares[1].brk)
    ref_brk = _load("fhew_mk_brk").reshape(n_s, 2 * d, 2, n)
    np.testing.assert_array_equal(np.asarray(merged.a), ref_brk[:, :, 0])
    np.testing.assert_array_equal(np.asarray(merged.b), ref_brk[:, :, 1])

    # merged LWE ksk b-rows are share sums over q_ks
    ksk = lwe.ksk_share_merge(
        params.lwe_s, crs.ksk_a, (s.ksk_b for s in shares)
    )
    np.testing.assert_array_equal(
        np.asarray(ksk.b), _load("fhew_mk_ksk_b").reshape(d_s, n)
    )

    # the REAL merge entry point, end to end: gate outputs under our merged
    # key must be the oracle's ciphertexts bit-for-bit
    bk = key_share_merge(params, crs, shares)
    z_sum = sum(_i64(f"fhew_mk_sk_z{p}") for p in range(n_parties))
    in_a = _load("fhew_mk_gate_in_a").reshape(4, 2, n)
    in_b = _load("fhew_mk_gate_in_b").reshape(4, 2)
    out_a = _load("fhew_mk_gate_nand_out_a").reshape(4, n)
    out_b = _load("fhew_mk_gate_nand_out_b")
    dec_sh = _load("fhew_mk_gate_dec_shares").reshape(4, n_parties)
    for i in range(4):
        m0, m1 = i & 1, (i >> 1) & 1
        cts = []
        for j, m in enumerate((m0, m1)):
            ct = LweCiphertext(jnp.asarray(in_a[i, j]), jnp.asarray(in_b[i, j]))
            got = np.asarray(
                gates.decode_bool(params, lwe.decrypt(params.lwe_z, z_sum, ct))
            )
            assert bool(got) == bool(m), (i, j)
            cts.append(ct)
        out = gates.gate(params, bk, "nand", cts[0], cts[1])
        np.testing.assert_array_equal(np.asarray(out.a), out_a[i])
        assert int(np.asarray(out.b)) == int(out_b[i]), i
        # threshold decrypt: the oracle's per-party noisy shares through OUR
        # decryption_share_merge must decode to the NAND truth
        pt = lwe.decryption_share_merge(
            params.lwe_z,
            out.b,
            (jnp.asarray(dec_sh[i, p]) for p in range(n_parties)),
        )
        assert bool(np.asarray(gates.decode_bool(params, pt))) == (
            not (m0 and m1)
        ), i


# -- TFHE --------------------------------------------------------------------


@pytest.fixture(scope="module")
def tfhe_setup():
    from learn_fhe_tpu.models.tfhe import (
        BootstrapParams,
        TggswParams,
        TglweParams,
        TlweParams,
    )

    tlwe_p = TlweParams(
        log_p=4, padding=1, n=1024, std_dev=1.339775301998614e-7, log_b=4, d=5
    )
    tglwe_p = TglweParams(
        log_p=4, padding=1, big_n=2048, k=1, std_dev=2.845267479601915e-15
    )
    tggsw_p = TggswParams(tglwe_p, log_b=23, d=1)
    return BootstrapParams(tlwe_p, tggsw_p)


@needs_transcripts
@needs_tfhe_keys
def test_tfhe_pbs_transcript_parity(tfhe_setup):
    """Reference keys + inputs -> our PBS must reproduce the reference's
    decrypted outputs exactly, and the output phase must sit within the
    pipeline's noise budget of the reference's output phase (ciphertext bits
    differ by design: NTT-domain monomial rotation, ARCHITECTURE §4)."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.tfhe import tggsw, tlwe
    from learn_fhe_tpu.models.tfhe.bootstrapping import (
        BootstrapKey,
        bootstrap,
        lut_table,
    )
    from learn_fhe_tpu.models.tfhe.tggsw import TggswCiphertext
    from learn_fhe_tpu.models.tfhe.tlwe import TlweCiphertext, TlweKeySwitchingKey
    from learn_fhe_tpu.ops.torus_crt import monomial_eval_table, required_bound_bits

    params = tfhe_setup
    n_lwe, big_n, k = 1024, 2048, 1
    d, d_ks = params.tggsw.d, 5

    brk_raw = _load("tfhe_brk")  # (n_lwe, (k+1)d, k+1, big_n)
    brk_coeff = TggswCiphertext(
        jnp.asarray(brk_raw[:, :, :k, :]), jnp.asarray(brk_raw[:, :, k, :])
    )
    brk = tggsw.to_eval(params.tggsw, brk_coeff)
    ksk_a = _load("tfhe_ksk_a").reshape(d_ks, k * big_n, n_lwe)
    ksk_b = _load("tfhe_ksk_b").reshape(d_ks, k * big_n)
    ksk = TlweKeySwitchingKey(jnp.asarray(ksk_a), jnp.asarray(ksk_b))
    rows = (k + 1) * d
    bound = required_bound_bits(big_n, params.tggsw.log_b, rows)
    mv, md = monomial_eval_table(big_n, bound)
    key = BootstrapKey(
        brk,
        ksk,
        tuple(jnp.asarray(mv[i]) for i in range(mv.shape[0])),
        tuple(jnp.asarray(md[i]) for i in range(md.shape[0])),
    )

    z = _i64("tfhe_sk_z")
    in_a = _load("tfhe_pbs_in_a")
    in_b = _load("tfhe_pbs_in_b")
    p = 16
    tables = {
        "identity": lambda v: v,
        "double": lambda v: (2 * v) % p,
        "parity": lambda v: v % 2,
    }
    for name, f in tables.items():
        np.testing.assert_array_equal(
            _load(f"tfhe_table_{name}"), [f(v) for v in range(p)]
        )
        v = lut_table(4, big_n, f)
        ref_a = _load(f"tfhe_pbs_{name}_out_a")
        ref_b = _load(f"tfhe_pbs_{name}_out_b")
        for m in range(p):
            ct = TlweCiphertext(jnp.asarray(in_a[m]), jnp.asarray(in_b[m]))
            out = bootstrap(params, key, jnp.asarray(v), ct)
            got = int(np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out))))
            assert got == f(m), (name, m)
            if name == "identity":
                # the parity path (reference-exact CMux order,
                # `tggsw.rs:113-120` + `bootstrapping.rs:88-95`) must
                # reproduce the reference ciphertext BIT-FOR-BIT
                out_par = bootstrap(params, key, jnp.asarray(v), ct, parity=True)
                np.testing.assert_array_equal(
                    np.asarray(out_par.a), _load(f"tfhe_pbs_{name}_out_a")[m]
                )
                assert int(np.asarray(out_par.b)) == int(
                    _load(f"tfhe_pbs_{name}_out_b")[m]
                ), (name, m)
            # phase distance to the reference output: both phases decrypt to
            # f(m), so they differ by at most the summed noise of two fresh
            # bootstrap outputs — far under half a plaintext slot (2^59).
            ref = TlweCiphertext(jnp.asarray(ref_a[m]), jnp.asarray(ref_b[m]))
            ph_ours = int(np.asarray(tlwe.decrypt(params.tlwe, z, out)))
            ph_ref = int(np.asarray(tlwe.decrypt(params.tlwe, z, ref)))
            diff = (ph_ours - ph_ref) % (1 << 64)
            diff = min(diff, (1 << 64) - diff)
            assert diff < 1 << 55, (name, m, diff)


# -- CKKS --------------------------------------------------------------------


@pytest.fixture(scope="module")
def ckks_setup():
    from learn_fhe_tpu.models.ckks.ckks import CkksParams

    return CkksParams(log_n=9, log_qi=55, big_l=8)


@needs_transcripts
def test_ckks_transcript_parity(ckks_setup):
    """Reference keys + ciphertexts -> our deterministic evaluation paths
    (mul+relin+rescale, rotate, conjugate) must match bit-for-bit; encode
    must reproduce the reference's F256 integers exactly."""
    import jax.numpy as jnp

    from learn_fhe_tpu.models.ckks import ckks as C

    params = ckks_setup
    np.testing.assert_array_equal(_load("ckks_qs"), params.qs)
    np.testing.assert_array_equal(_load("ckks_ps"), params.ps)

    sk = _i64("ckks_sk")

    # encode parity: pt0 = ct0_b + ct0_a * sk - e0 over the qs basis
    # (`ckks.rs:215-225`: b = -(a sk) + e + pt)
    m0 = _load("ckks_m0")  # (l, 2) f64
    m1 = _load("ckks_m1")
    pt0_ref = _ckks_pt_from_dump(params, "ckks_ct0", "ckks_enc0", sk)
    # rounding="trunc": the reference's BigInt::from(&F256) TRUNCATES the
    # mantissa (`util/src/complex/f256.rs:213-238`, RoundingMode::None);
    # the library's default nearest-rounding differs by one ulp on ~half
    # the coefficients, so encode parity pins the reference-exact mode.
    pt0_ours = np.asarray(
        C.encode(
            params,
            m0[:, 0] + 1j * m0[:, 1],
            params.qs,
            precision="f256",
            rounding="trunc",
        )
    )
    np.testing.assert_array_equal(pt0_ours, pt0_ref)

    ct0 = C.CkksCiphertext(
        jnp.asarray(_load("ckks_ct0_b")), jnp.asarray(_load("ckks_ct0_a")), params.qs
    )
    ct1 = C.CkksCiphertext(
        jnp.asarray(_load("ckks_ct1_b")), jnp.asarray(_load("ckks_ct1_a")), params.qs
    )

    def load_ksk(tag):
        b = jnp.asarray(_load(f"{tag}_b"))
        a = jnp.asarray(_load(f"{tag}_a"))
        b_eval, a_eval = C._ksk_to_eval(params, b, a)
        return C.CkksKeySwitchingKey(b_eval, a_eval, params.qps)

    rlk = load_ksk("ckks_rlk")
    ct_mul = C.mul(params, rlk, ct0, ct1)
    np.testing.assert_array_equal(np.asarray(ct_mul.b), _load("ckks_mul_b"))
    np.testing.assert_array_equal(np.asarray(ct_mul.a), _load("ckks_mul_a"))

    # decrypted product decodes to m0*m1 within the reference's budget
    dec = np.asarray(C.decode(params, C.decrypt(params, sk, ct_mul), ct_mul.qs))
    ref_dec = _load("ckks_mul_dec")
    want = (m0[:, 0] + 1j * m0[:, 1]) * (m1[:, 0] + 1j * m1[:, 1])
    assert np.max(np.abs(dec - want)) < 2.0**-30
    assert np.max(np.abs(dec - (ref_dec[:, 0] + 1j * ref_dec[:, 1]))) < 2.0**-30

    rtk = C.CkksRotKey(load_ksk("ckks_rtk1"), 1)
    ct_rot = C.rotate(params, rtk, ct0)
    np.testing.assert_array_equal(np.asarray(ct_rot.b), _load("ckks_rot1_b"))
    np.testing.assert_array_equal(np.asarray(ct_rot.a), _load("ckks_rot1_a"))

    cjk = load_ksk("ckks_cjk")
    ct_conj = C.conjugate(params, cjk, ct0)
    np.testing.assert_array_equal(np.asarray(ct_conj.b), _load("ckks_conj_b"))
    np.testing.assert_array_equal(np.asarray(ct_conj.a), _load("ckks_conj_a"))


def _ckks_pt_from_dump(params, ct_tag, enc_tag, sk):
    """pt = b + a*sk - e over qs, all from dumped limb arrays (exact)."""
    import jax.numpy as jnp

    from learn_fhe_tpu.ops.rns import rns_mul, rns_plan, rns_sub, rns_add, rns_from_i64

    plan = rns_plan(params.qs, params.n)
    a = jnp.asarray(_load(f"{ct_tag}_a"))
    b = jnp.asarray(_load(f"{ct_tag}_b"))
    e = jnp.asarray(_load(f"{enc_tag}_e"))
    np.testing.assert_array_equal(_load(f"{enc_tag}_a"), np.asarray(a))
    sk_rns = rns_from_i64(jnp.asarray(sk), plan)
    ask = rns_mul(a, sk_rns, plan)
    return np.asarray(rns_sub(rns_add(b, ask, plan), e, plan))
