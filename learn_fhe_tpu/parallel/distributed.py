"""Multi-host (multi-process) mesh bootstrap.

SURVEY.md §2.5 / §5: the reference has no communication layer at all; at
scale the framework runs one process per host with XLA collectives riding
ICI/DCN. This module wraps the standard JAX multi-process bring-up so every
entry point (bench, serving, examples) shares one idiom:

    from learn_fhe_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()                  # no-op on a single host
    mesh = global_mesh(n_limb=2)        # ('batch', 'limb') over ALL hosts

Single-host behavior is identical to parallel/mesh.py (this image exposes
one chip, so the multi-host path is exercised only to the extent the
single-process suite can: global_mesh degenerates to make_mesh and the
sharded pipelines/tests cover the collectives on the virtual 8-device CPU
mesh). On a real pod slice, jax.distributed.initialize picks up the
coordinator/process env (TPU metadata or JAX_COORDINATOR_ADDRESS /
JAX_PROCESS_ID / JAX_NUM_PROCESSES) and jax.devices() becomes the GLOBAL
device list, which is exactly what Mesh construction below expects.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import make_mesh

_INITIALIZED = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if a multi-process runtime was brought up, False for single-process.

    Explicit args win; otherwise JAX_* env vars / TPU metadata are used
    (jax.distributed.initialize's own auto-detection). Safe to call twice.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False  # single-process run (this image)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return True


def global_mesh(n_batch: int | None = None, n_limb: int = 1):
    """('batch', 'limb') mesh over the GLOBAL device list, batch-major so the
    limb axis (the chatty one: base-extension collectives) stays within a
    host's ICI domain and the batch axis spans hosts (pure data parallel,
    zero cross-host traffic inside a bootstrap scan)."""
    devices = jax.devices()
    n = len(devices)
    if n_batch is None:
        assert n % n_limb == 0, (n, n_limb)
        n_batch = n // n_limb
    # order devices host-major so contiguous 'limb' groups share a host
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    return make_mesh(n_batch=n_batch, n_limb=n_limb, devices=np.asarray(devices))


# -- failure detection (new-design: the reference has no runtime at all) --------


from contextlib import contextmanager


@contextmanager
def collective_watchdog(seconds: float, what: str = "collective"):
    """Bound a cross-process collective with a hard deadline.

    gloo/ICI collectives BLOCK indefinitely when a peer process dies
    mid-rendezvous, turning one host failure into a silent full-fleet hang.
    Wrapping the collective in this context guarantees a loud, diagnosable
    death instead: if the block has not completed after `seconds`, the
    process prints a FAULT DETECTED line naming the collective and exits
    with code 86 (distinct from crash codes, so orchestrators can tell
    "peer lost" from "I crashed"). Exercised by fault injection in
    tests/test_distributed.py::test_peer_death_is_detected_not_hung.
    """
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(seconds):
            import sys as _sys

            print(
                f"FAULT DETECTED: {what} did not complete within {seconds:.0f}s "
                f"— a peer process is unreachable or dead (process "
                f"{jax.process_index()}/{jax.process_count()})",
                file=_sys.stderr,
                flush=True,
            )
            os._exit(86)

    t = threading.Thread(target=_watch, daemon=True)
    t.start()
    try:
        yield
    finally:
        done.set()
