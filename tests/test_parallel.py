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
