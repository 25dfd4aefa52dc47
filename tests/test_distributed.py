"""Real multi-process jax.distributed bring-up (VERDICT r2 item: the
`init_distributed() is True` path must actually run, not just exist).

Spawns 2 local processes, each with 4 virtual CPU devices; the workers
initialize jax.distributed against a localhost coordinator (gloo CPU
collectives), build the global ('batch','limb') mesh, and run a
cross-process share-merge psum plus a batch-sharded TFHE PBS with decrypt
checks (tests/distributed_worker.py). This is the single-host stand-in for
the BASELINE ">=2 hosts" row; on a real pod slice the same code path rides
DCN/ICI instead of gloo.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_runtime():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = dict(os.environ)
    # the workers pin their own platform/devices; scrub any pytest-session
    # leakage that would pre-empt their backend init
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "DISTRIBUTED_WORKER_OK" in out, f"worker {pid} incomplete:\n{out}"
