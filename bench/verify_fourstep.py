"""On-chip bit-exactness check: ntt32 four-step (MXU) plan vs stage plan.

Runs both u32 engines on the real device for the benchmark ring (N=2^14)
and a couple of smaller rings, compares polymul outputs elementwise.
"""
import numpy as np
import jax
import jax.numpy as jnp

from learn_fhe_tpu.ops import ntt32
from learn_fhe_tpu.utils.primes import two_adic_primes


def check(log_n: int, batch: int = 8) -> None:
    n = 1 << log_n
    q = next(two_adic_primes(30, log_n + 1))
    rng = np.random.default_rng(log_n)
    a = jnp.asarray(rng.integers(0, q, (batch, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, q, (batch, n), dtype=np.uint32))
    plans = {
        "stage": ntt32.ntt32_plan(q, n),
        "fourstep": ntt32.ntt32_plan(q, n, fourstep=True),
    }
    outs = {}
    for name, plan in plans.items():
        f = jax.jit(lambda x, y, p=plan: ntt32.negacyclic_mul32(x, y, p))
        outs[name] = np.asarray(f(a, b))
    if not (outs["stage"] == outs["fourstep"]).all():
        bad = int((outs["stage"] != outs["fourstep"]).sum())
        raise SystemExit(f"MISMATCH log_n={log_n}: {bad} coeffs differ")
    print(f"log_n={log_n} q={q}: fourstep == stage on device, batch={batch}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for log_n in (10, 12, 14):
        check(log_n)
    print("OK")
