"""One process of the multi-process jax.distributed test (run by
tests/test_distributed.py, once per process id).

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
a global 8-device runtime (gloo collectives). The worker then proves the two
cross-process paths the framework's scale-out story rests on (SURVEY.md
§2.5, BASELINE ">=2 hosts" row):

  1. a cross-process psum: the multiparty share merge over a global 'party'
     mesh, exact vs the host-side sum;
  2. a batch-sharded TFHE PBS over the global ('batch','limb') mesh built by
     parallel.distributed.global_mesh, every lane decrypt-checked.

Prints DISTRIBUTED_WORKER_OK as the last line on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "ok"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from learn_fhe_tpu.parallel.distributed import global_mesh, init_distributed

    assert (
        init_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
        is True
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    # -- 1. cross-process psum: multiparty share merge ------------------------
    from learn_fhe_tpu.parallel.multiparty import merge_shares, party_mesh

    q = 12289
    n_parties = 4 * nproc
    rng = np.random.default_rng(0)  # same data in every process
    shares = rng.integers(0, q, size=(n_parties, 32), dtype=np.uint64)
    pmesh = party_mesh(n_parties)
    from jax.sharding import NamedSharding, PartitionSpec as P

    gshares = jax.device_put(
        jnp.asarray(shares), NamedSharding(pmesh, P("party"))
    )
    merged = merge_shares(pmesh, gshares, q)
    # out_specs replicate the merge result on every device; read the local copy
    assert merged.sharding.is_fully_replicated
    got = np.asarray(merged.addressable_data(0))
    np.testing.assert_array_equal(got, shares.sum(axis=0) % q)
    print(f"[p{pid}] share merge across {nproc} processes: exact", flush=True)

    if mode == "fault":
        # fault injection (tests/test_distributed.py): process 1 dies
        # abruptly after the first successful collective; the survivor's
        # next collective must fail LOUDLY (gloo error or the runtime's
        # collective_watchdog) instead of hanging the fleet.
        from learn_fhe_tpu.parallel.distributed import collective_watchdog

        if pid == 1:
            os._exit(42)  # simulated host crash — no shutdown, no goodbye
        import time

        time.sleep(2)  # let the peer die first
        with collective_watchdog(60, what="share merge after peer loss"):
            merged = merge_shares(pmesh, gshares, q)
            np.asarray(merged.addressable_data(0))
        print("UNEXPECTED: collective completed after peer death", flush=True)
        os._exit(99)

    # -- 2. batch-sharded TFHE PBS over the global mesh -----------------------
    from learn_fhe_tpu.models.tfhe import (
        BootstrapParams,
        TggswParams,
        TglweParams,
        TlweParams,
        key_gen,
        tglwe,
        tlwe,
    )
    from learn_fhe_tpu.models.tfhe.bootstrapping import lut_table, mod_switch_2n
    from learn_fhe_tpu.parallel.batch import tfhe_pbs_batch_device
    from learn_fhe_tpu.parallel.mesh import replicate, shard_batch

    params = BootstrapParams(
        TlweParams(log_p=2, padding=1, n=32, std_dev=1e-7, log_b=4, d=5),
        TggswParams(
            TglweParams(log_p=2, padding=1, big_n=256, k=1, std_dev=1e-14),
            log_b=8,
            d=2,
        ),
    )
    krng = np.random.default_rng(7)  # identical keys in every process
    z = tlwe.sk_gen(params.tlwe, krng)
    bk = key_gen(params, z, krng)

    mesh = global_mesh(n_limb=1)
    assert mesh.devices.size == 4 * nproc

    B = 8
    ms = krng.integers(0, 4, size=B).astype(np.uint64)
    cts = tlwe.sk_encrypt(params.tlwe, z, tlwe.encode(params.tlwe, jnp.asarray(ms)), krng)
    tab = jnp.asarray(lut_table(2, 256, lambda v: v))
    v_enc = tglwe.encode(params.tglwe, tab)
    a2n, b2n = mod_switch_2n(cts, params.big_n)

    key_r = jax.tree.map(lambda x: replicate(mesh, x), bk)
    out = tfhe_pbs_batch_device(
        params,
        key_r,
        replicate(mesh, v_enc),
        shard_batch(mesh, a2n),
        shard_batch(mesh, b2n),
    )
    out_a = multihost_utils.process_allgather(out.a, tiled=True)
    out_b = multihost_utils.process_allgather(out.b, tiled=True)
    got = np.asarray(
        tlwe.decode(
            params.tlwe,
            tlwe.decrypt(params.tlwe, z, tlwe.TlweCiphertext(jnp.asarray(out_a), jnp.asarray(out_b))),
        )
    )
    np.testing.assert_array_equal(got, ms)
    print(f"[p{pid}] batch-sharded PBS over {4 * nproc} global devices: decrypts", flush=True)

    jax.distributed.shutdown()
    print("DISTRIBUTED_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
