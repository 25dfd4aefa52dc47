"""Batched + mesh-sharded pipelines on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learn_fhe_tpu.models.tfhe import (
    BootstrapParams,
    TggswParams,
    TglweParams,
    TlweParams,
    key_gen,
    lut_table,
    tglwe,
    tlwe,
)
from learn_fhe_tpu.models.tfhe.bootstrapping import mod_switch_2n
from learn_fhe_tpu.parallel import (
    fhew_gate_batch,
    make_mesh,
    replicate,
    shard_batch,
    tfhe_pbs_batch,
    tfhe_pbs_batch_device,
)


@pytest.fixture(scope="module")
def tfhe_env():
    rng = np.random.default_rng(3)
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


def test_tfhe_pbs_batch(tfhe_env):
    params, z, bk, rng = tfhe_env
    tab = jnp.asarray(lut_table(2, 256, lambda v: v))
    B = 16
    ms = rng.integers(0, 4, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    out = tfhe_pbs_batch(params, bk, tab, cts)
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    np.testing.assert_array_equal(got, ms)


def test_tfhe_pbs_sharded_8dev(tfhe_env):
    params, z, bk, rng = tfhe_env
    assert jax.device_count() >= 8
    mesh = make_mesh(n_batch=8, n_limb=1)
    tab = jnp.asarray(lut_table(2, 256, lambda v: v))
    B = 16
    ms = rng.integers(0, 4, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    v_enc = tglwe.encode(params.tglwe, tab)
    a2n, b2n = mod_switch_2n(cts, params.big_n)
    key_r = jax.tree.map(lambda x: replicate(mesh, x), bk)
    out = tfhe_pbs_batch_device(
        params, key_r, replicate(mesh, v_enc), shard_batch(mesh, a2n), shard_batch(mesh, b2n)
    )
    assert "batch" in str(out.a.sharding)
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    np.testing.assert_array_equal(got, ms)


def test_fhew_gate_batch():
    from learn_fhe_tpu.models.fhew import (
        BootstrapParams as FBP,
        LweParams,
        RgswParams,
        RlweParams,
        gates,
        key_gen as fkey_gen,
        lwe,
        rlwe,
    )
    from learn_fhe_tpu.utils.primes import two_adic_primes

    rng = np.random.default_rng(4)
    q = next(two_adic_primes(28, 8))
    params = FBP(
        RgswParams(RlweParams(q=q, p=4, log_n=7, log_b=7, d=4), log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4),
        w=5,
    )
    z = rlwe.sk_gen(params.rlwe, rng)
    bk = fkey_gen(params, z, rng)
    B = 16
    m0 = rng.integers(0, 2, size=B).astype(bool)
    m1 = rng.integers(0, 2, size=B).astype(bool)
    ct0 = lwe.sk_encrypt(params.lwe_z, z, gates.encode_bool(params, m0), rng)
    ct1 = lwe.sk_encrypt(params.lwe_z, z, gates.encode_bool(params, m1), rng)
    out = fhew_gate_batch(params, bk, "xor", ct0, ct1)
    got = np.asarray(gates.decode_bool(params, lwe.decrypt(params.lwe_z, z, out)))
    np.testing.assert_array_equal(got, m0 ^ m1)


def test_graft_entry_and_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    m.dryrun_multichip(min(8, jax.device_count()))


def test_serialization_roundtrip(tfhe_env, tmp_path):
    from learn_fhe_tpu.models.tfhe.bootstrapping import BootstrapKey
    from learn_fhe_tpu.utils import serialization as ser

    params, z, bk, rng = tfhe_env
    path = str(tmp_path / "key.npz")
    ser.save(path, bk=bk)
    loaded = ser.load(path)["bk"]

    # compare BY PATH (a dict reconstruction orders leaves alphabetically,
    # NamedTuples by field order)
    paths0 = {
        jax.tree_util.keystr(kp): np.asarray(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(bk)[0]
    }

    def walk(node, prefix, out):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}", out)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}", out)
        else:
            out[prefix] = np.asarray(node)

    paths1: dict[str, np.ndarray] = {}
    walk(loaded, "", paths1)
    assert len(paths0) == len(paths1)
    # normalize: NamedTuple paths look like '.brk.av[0]', dict like "['brk']['av']['0']"
    norm = lambda s: s.replace("['", ".").replace("']", "").replace("[", ".").replace("]", "").lstrip(".")
    n0 = {norm(k): v for k, v in paths0.items()}
    n1 = {norm(k): v for k, v in paths1.items()}
    assert set(n0) == set(n1), (sorted(n0)[:5], sorted(n1)[:5])
    for k in n0:
        np.testing.assert_array_equal(n0[k], n1[k], err_msg=k)


def test_multiparty_psum_merge(rng):
    """Share merge over a sharded 'party' mesh axis equals the sequential
    fold the scheme modules use."""
    from learn_fhe_tpu.parallel.multiparty import merge_shares, party_mesh, shard_parties
    from learn_fhe_tpu.ops.modular import add_mod

    q = (1 << 55) + 3 * 4096 + 1
    P_ = 8
    shares = rng.integers(0, q, size=(P_, 4, 32), dtype=np.uint64)
    mesh = party_mesh(P_)
    got = np.asarray(merge_shares(mesh, shard_parties(mesh, jnp.asarray(shares)), q))
    want = shares[0]
    for s in shares[1:]:
        want = np.asarray(add_mod(jnp.asarray(want), jnp.asarray(s), q))
    assert np.array_equal(got, want)


def test_multiparty_merge_matches_lwe_ksk_merge(rng):
    """End-to-end: FHEW LWE ksk share merge done via the mesh collective
    decrypts identically to the sequential module path."""
    from learn_fhe_tpu.models.fhew import lwe
    from learn_fhe_tpu.models.fhew.params import LweParams
    from learn_fhe_tpu.parallel.multiparty import merge_shares, party_mesh, shard_parties
    from learn_fhe_tpu.utils.distributions import uniform_zq

    params = LweParams(q=1 << 16, p=4, n=24, log_b=4, d=4)
    n_parties = 4
    sks = [lwe.sk_gen(params, rng) for _ in range(n_parties)]
    sk1 = np.concatenate([np.asarray(s) for s in sks])[:32]  # arbitrary source key
    crs_a = jnp.asarray(uniform_zq(params.q, rng, (params.gadget.d, 32, params.n)))
    shares = [
        lwe.ksk_share_gen(params, crs_a, sks[p], sk1, rng) for p in range(n_parties)
    ]
    want = lwe.ksk_share_merge(params, crs_a, iter(shares))
    mesh = party_mesh(n_parties)
    stacked = jnp.stack([jnp.asarray(s) for s in shares])
    got_b = merge_shares(mesh, shard_parties(mesh, stacked), params.q)
    assert np.array_equal(np.asarray(got_b), np.asarray(want.b))


def test_serialization_ckks_dataclass(tmp_path, rng):
    """CKKS ciphertexts/keys are registered dataclasses (static qs metadata);
    serialization must round-trip them including typed reconstruction."""
    from learn_fhe_tpu.models.ckks import ckks as C
    from learn_fhe_tpu.utils import serialization as ser

    params = C.CkksParams(log_n=4, log_qi=45, big_l=3)
    sk = C.sk_gen(params, rng)
    m = rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)
    path = str(tmp_path / "ct.npz")
    ser.save(path, ct=ct)
    loaded = ser.load(path, reconstruct={"CkksCiphertext": C.CkksCiphertext})["ct"]
    assert isinstance(loaded, C.CkksCiphertext)
    assert loaded.qs == ct.qs
    np.testing.assert_array_equal(np.asarray(loaded.b), np.asarray(ct.b))
    np.testing.assert_array_equal(np.asarray(loaded.a), np.asarray(ct.a))
    got = C.decode(params, C.decrypt(params, sk, loaded), loaded.qs)
    assert np.max(np.abs(got - m)) < 1e-6


def test_noise_meters(rng):
    """The noise budget meters report sane positive headroom on fresh
    ciphertexts (SURVEY section 5: observability subsystem)."""
    from learn_fhe_tpu.models.fhew import BootstrapParams as FP, LweParams, RgswParams, RlweParams
    from learn_fhe_tpu.models.fhew import lwe
    from learn_fhe_tpu.models.fhew import rlwe as frlwe
    from learn_fhe_tpu.utils.noise import fhew_noise_bits
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(28, 8))
    params = FP(
        RgswParams(RlweParams(q=q, p=4, log_n=7, log_b=7, d=4), log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4),
        w=5,
    )
    sk = frlwe.sk_gen(params.rlwe, rng)
    ct = lwe.sk_encrypt(
        params.lwe_z, np.asarray(sk), lwe.encode(params.lwe_z, jnp.asarray(np.uint64(1))), rng
    )
    bits = fhew_noise_bits(params, np.asarray(sk), ct, 1)
    assert bits > 5, bits  # fresh ciphertext has plenty of headroom


def test_tfhe_pbs_batch_chunked(tfhe_env, monkeypatch):
    """Batches beyond PBS_CHUNK stream through padded chunks; results must
    equal the unchunked pipeline element-for-element."""
    from learn_fhe_tpu.parallel import batch as batch_mod

    params, z, bk, rng = tfhe_env
    tab = jnp.asarray(lut_table(2, 256, lambda v: (v + 1) % 4))
    B = 10
    ms = rng.integers(0, 4, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), rng)
    monkeypatch.setattr(batch_mod, "PBS_CHUNK", 4)  # force chunking + tail pad
    out = batch_mod.tfhe_pbs_batch(params, bk, tab, cts)
    got = np.asarray(tlwe.decode(params.tlwe, tlwe.decrypt(params.tlwe, z, out)))
    np.testing.assert_array_equal(got, (ms + 1) % 4)


def test_ckks_key_switch_limb_sharded(rng):
    """The REAL cross-limb collective: CKKS rotate (hence key_switch ->
    extend_bases over the q-limbs + rescale_k(len(ps)) -> switch_bases over
    the p-limbs) with the RNS limb axis sharded over 8 devices, bit-identical
    to the unsharded result (`rns.rs:83-132,331-345` are the serial
    counterparts of these contractions)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learn_fhe_tpu.models.ckks import ckks as C

    params = C.CkksParams(log_n=5, log_qi=45, big_l=8)  # 8 q-limbs + 8 p-limbs
    sk = C.sk_gen(params, rng)
    rtk = C.rtk_gen(params, sk, 3, rng)
    m = rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)
    ct = C.sk_encrypt(params, sk, C.encode(params, m), params.qs, rng)

    ref = C.rotate(params, rtk, ct)

    mesh = make_mesh(n_batch=1, n_limb=8)
    limb_sharding = NamedSharding(mesh, P(None, "limb", None))

    def shard_limbs(x):  # (L, N) -> limb axis over the mesh
        return jax.device_put(x, NamedSharding(mesh, P("limb", None)))

    ct_s = C.CkksCiphertext(shard_limbs(ct.b), shard_limbs(ct.a), ct.qs)
    ksk_s = C.CkksKeySwitchingKey(
        shard_limbs(rtk.ksk.b), shard_limbs(rtk.ksk.a), rtk.ksk.qs
    )
    out = C.rotate(params, C.CkksRotKey(ksk_s, rtk.j), ct_s)
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    # and the decrypt is still the rotated message
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    assert np.max(np.abs(got - np.roll(m, -3))) < 1e-6


def test_ckks_mul_relin_limb_sharded(rng):
    """mul (tensor + relinearize + rescale) with limbs sharded: covers
    key_switch inside mul plus rescale_k(1)'s non-collective branch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learn_fhe_tpu.models.ckks import ckks as C

    params = C.CkksParams(log_n=5, log_qi=45, big_l=8)
    sk = C.sk_gen(params, rng)
    rlk = C.rlk_gen(params, sk, rng)
    m0 = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.5
    m1 = (rng.standard_normal(params.l) + 1j * rng.standard_normal(params.l)) * 0.5
    ct0 = C.sk_encrypt(params, sk, C.encode(params, m0), params.qs, rng)
    ct1 = C.sk_encrypt(params, sk, C.encode(params, m1), params.qs, rng)
    ref = C.mul(params, rlk, ct0, ct1)

    mesh = make_mesh(n_batch=1, n_limb=8)

    def shard_limbs(x):
        return jax.device_put(x, NamedSharding(mesh, P("limb", None)))

    ct0_s = C.CkksCiphertext(shard_limbs(ct0.b), shard_limbs(ct0.a), ct0.qs)
    ct1_s = C.CkksCiphertext(shard_limbs(ct1.b), shard_limbs(ct1.a), ct1.qs)
    rlk_s = C.CkksKeySwitchingKey(
        shard_limbs(rlk.b), shard_limbs(rlk.a), rlk.qs
    )
    out = C.mul(params, rlk_s, ct0_s, ct1_s)
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
    got = C.decode(params, C.decrypt(params, sk, out), out.qs)
    assert np.max(np.abs(got - m0 * m1)) < 1e-5


class TestCoefShardedNtt:
    """Coefficient-axis (N) sharded NTT: the butterfly stages split over the
    mesh, cross-shard layers exchanged with ppermute (`fft.rs:40-77` is the
    serial analogue). Must be BIT-IDENTICAL to the single-device transform."""

    def _qs(self, log_n, k=2):
        from learn_fhe_tpu.utils.primes import two_adic_primes
        from itertools import islice

        return tuple(islice(two_adic_primes(45, log_n + 1), k))

    def test_forward_inverse_roundtrip_vs_unsharded(self, rng):
        from learn_fhe_tpu.ops.rns import rns_intt, rns_ntt, rns_plan
        from learn_fhe_tpu.parallel.coef import (
            coef_mesh,
            coef_sharded_intt,
            coef_sharded_ntt,
            shard_coef,
        )

        log_n, n = 9, 512
        qs = self._qs(log_n)
        plan = rns_plan(qs, n)
        mesh = coef_mesh(8)
        x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
        ref_eval = np.asarray(rns_ntt(jnp.asarray(x), plan))
        xs = shard_coef(mesh, jnp.asarray(x))
        got_eval = np.asarray(coef_sharded_ntt(mesh, xs, qs))
        np.testing.assert_array_equal(got_eval, ref_eval)
        back = np.asarray(coef_sharded_intt(mesh, shard_coef(mesh, jnp.asarray(ref_eval)), qs))
        np.testing.assert_array_equal(back, x)
        np.testing.assert_array_equal(
            np.asarray(rns_intt(jnp.asarray(ref_eval), plan)), back
        )

    @pytest.mark.parametrize("d", [2, 4, 8])
    def test_mul_matches_unsharded_all_widths(self, rng, d):
        from learn_fhe_tpu.ops.rns import rns_mul, rns_plan
        from learn_fhe_tpu.parallel.coef import coef_mesh, coef_sharded_mul, shard_coef

        log_n, n = 8, 256
        qs = self._qs(log_n, k=3)
        plan = rns_plan(qs, n)
        mesh = coef_mesh(d)
        a = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
        b = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])
        ref = np.asarray(rns_mul(jnp.asarray(a), jnp.asarray(b), plan))
        got = np.asarray(
            coef_sharded_mul(mesh, shard_coef(mesh, jnp.asarray(a)), shard_coef(mesh, jnp.asarray(b)), qs)
        )
        np.testing.assert_array_equal(got, ref)

    def test_mul_large_n_with_batch(self, rng):
        """CKKS production shape: N=2^13, a leading batch axis rides along."""
        from learn_fhe_tpu.ops.rns import rns_mul, rns_plan
        from learn_fhe_tpu.parallel.coef import coef_mesh, coef_sharded_mul, shard_coef

        log_n, n = 13, 8192
        qs = self._qs(log_n, k=2)
        plan = rns_plan(qs, n)
        mesh = coef_mesh(8)
        a = np.stack(
            [np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in qs])] * 2
        )  # (2, L, N)
        b = a[::-1].copy()
        ref = np.asarray(rns_mul(jnp.asarray(a), jnp.asarray(b), plan))
        got = np.asarray(
            coef_sharded_mul(mesh, shard_coef(mesh, jnp.asarray(a)), shard_coef(mesh, jnp.asarray(b)), qs)
        )
        np.testing.assert_array_equal(got, ref)


class TestCoef32ShardedNtt:
    """Coefficient-axis sharding for the u32 engine (parallel/coef32.py):
    must be BIT-IDENTICAL to ops.ntt32's fused-radix single-device path
    (canonical modular reductions make any layer decomposition exact)."""

    def _q(self, log_n, bits=28):
        from learn_fhe_tpu.utils.primes import two_adic_primes

        return next(two_adic_primes(bits, log_n + 1))

    def test_forward_inverse_roundtrip_vs_unsharded(self, rng):
        from learn_fhe_tpu.ops.ntt32 import intt32, ntt32, ntt32_plan
        from learn_fhe_tpu.parallel.coef import coef_mesh, shard_coef
        from learn_fhe_tpu.parallel.coef32 import (
            coef32_sharded_intt,
            coef32_sharded_ntt,
        )

        log_n, n = 9, 512
        q = self._q(log_n)
        plan = ntt32_plan(q, n)
        mesh = coef_mesh(8)
        x = rng.integers(0, q, size=(3, n)).astype(np.uint32)
        ref_eval = np.asarray(ntt32(jnp.asarray(x), plan))
        got_eval = np.asarray(
            coef32_sharded_ntt(mesh, shard_coef(mesh, jnp.asarray(x)), q)
        )
        np.testing.assert_array_equal(got_eval, ref_eval)
        back = np.asarray(
            coef32_sharded_intt(mesh, shard_coef(mesh, jnp.asarray(ref_eval)), q)
        )
        np.testing.assert_array_equal(back, x)
        np.testing.assert_array_equal(
            np.asarray(intt32(jnp.asarray(ref_eval), plan)), back
        )

    @pytest.mark.parametrize("d", [2, 4, 8])
    def test_mul_matches_unsharded_all_widths(self, rng, d):
        from learn_fhe_tpu.ops.ntt32 import negacyclic_mul32, ntt32_plan
        from learn_fhe_tpu.parallel.coef import coef_mesh, shard_coef
        from learn_fhe_tpu.parallel.coef32 import coef32_sharded_mul

        log_n, n = 8, 256
        q = self._q(log_n)
        plan = ntt32_plan(q, n)
        mesh = coef_mesh(d)
        a = rng.integers(0, q, size=(2, n)).astype(np.uint32)
        b = rng.integers(0, q, size=(2, n)).astype(np.uint32)
        ref = np.asarray(negacyclic_mul32(jnp.asarray(a), jnp.asarray(b), plan))
        got = np.asarray(
            coef32_sharded_mul(
                mesh, shard_coef(mesh, jnp.asarray(a)), shard_coef(mesh, jnp.asarray(b)), q
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_mul_headline_shape(self, rng):
        """The NTT benchmark shape (N=2^14, 28-bit prime) sharded 8 ways."""
        from learn_fhe_tpu.ops.ntt32 import negacyclic_mul32, ntt32_plan
        from learn_fhe_tpu.parallel.coef import coef_mesh, shard_coef
        from learn_fhe_tpu.parallel.coef32 import coef32_sharded_mul

        log_n, n = 14, 16384
        q = self._q(log_n)
        plan = ntt32_plan(q, n)
        mesh = coef_mesh(8)
        a = rng.integers(0, q, size=(2, n)).astype(np.uint32)
        b = rng.integers(0, q, size=(2, n)).astype(np.uint32)
        ref = np.asarray(negacyclic_mul32(jnp.asarray(a), jnp.asarray(b), plan))
        got = np.asarray(
            coef32_sharded_mul(
                mesh, shard_coef(mesh, jnp.asarray(a)), shard_coef(mesh, jnp.asarray(b)), q
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_noise_profilers_pin_growth(rng):
    """Noise observability subsystem (SURVEY §5): the gate-chain profiler
    must show DEPTH-INDEPENDENT budgets (each gate bootstraps, so noise
    resets — measured ~8-9 worst-lane bits at these params for any depth),
    and the PBS profiler a bounded fresh->post drop."""
    from learn_fhe_tpu.models.fhew import (
        BootstrapParams as FP, LweParams, RgswParams, RlweParams, key_gen as fkg, rlwe,
    )
    from learn_fhe_tpu.models.tfhe import (
        BootstrapParams as TBP, TggswParams, TglweParams, TlweParams, key_gen as tkg, tlwe,
    )
    from learn_fhe_tpu.utils.noise import fhew_gate_chain_profile, tfhe_pbs_io_profile
    from learn_fhe_tpu.utils.primes import two_adic_primes

    q = next(two_adic_primes(28, 8))
    params = FP(
        RgswParams(RlweParams(q=q, p=4, log_n=7, log_b=7, d=4), log_b=7, d=4),
        LweParams(q=1 << 16, p=4, n=16, log_b=4, d=4),
        w=5,
    )
    sk = rlwe.sk_gen(params.rlwe, rng)
    bk = fkg(params, sk, rng)
    log = fhew_gate_chain_profile(params, bk, sk, depth=5, rng=rng)
    bits = log.bits()
    assert bits[0] > 15, log.summary()  # fresh headroom
    gate_bits = bits[1:]
    assert all(4 < b < 15 for b in gate_bits), log.summary()
    assert max(gate_bits) - min(gate_bits) < 6, log.summary()  # depth-independent

    tparams = TBP(
        TlweParams(log_p=2, padding=1, n=64, std_dev=1.34e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=256, k=1, std_dev=2.85e-15),
            log_b=23,
            d=1,
        ),
    )
    z = tlwe.sk_gen(tparams.tlwe, rng)
    tbk = tkg(tparams, z, rng)
    tlog = tfhe_pbs_io_profile(tparams, tbk, z, rng)
    tb = tlog.bits()
    assert tb[0] > 12 and 5 < tb[1] < 15, tlog.summary()


def test_distributed_single_process_degenerates():
    """init_distributed is a no-op without a coordinator; global_mesh builds
    the standard ('batch','limb') mesh over the local device list."""
    from learn_fhe_tpu.parallel.distributed import global_mesh, init_distributed

    assert init_distributed() is False  # single-process in this environment
    mesh = global_mesh(n_limb=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"batch": 4, "limb": 2}
    # a sharded op over that mesh runs (collectives path sanity)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.arange(8, dtype=jnp.uint64)
    xs = jax.device_put(x, NamedSharding(mesh, P("batch")))
    assert int(jnp.sum(xs)) == 28
