"""FHEW boolean gate layer (MP21 Table 1; reference `scheme/fhew/src/fhew.rs`).

A gate = linear combination of input ciphertexts + one LUT bootstrap:
the LUT maps the 4 plaintext quadrants to +-Q/8, and the final +Q/8 offset
lands the output on {0, Q/4} (`fhew.rs:31-39`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.modular import add_mod, neg_mod, u64
from . import lwe
from .bootstrapping import BootstrapKey, BootstrapParams, bootstrap
from .lwe import LweCiphertext

# Table 1 in 2020/086 (`fhew.rs:59-67`)
GATE_TABLES = {
    "and": [0, 0, 0, 1],
    "nand": [1, 1, 1, 0],
    "or": [0, 1, 1, 1],
    "nor": [1, 0, 0, 0],
    "xor": [0, 1, 1, 1],
    "xnor": [1, 0, 0, 0],
    "majority": [0, 0, 0, 1],
}


def encode_bool(params: BootstrapParams, m) -> jnp.ndarray:
    """m: bool or bool/uint array (batched)."""
    assert params.p == 4
    return lwe.encode(params.lwe_z, jnp.asarray(m, dtype=jnp.uint64))


def decode_bool(params: BootstrapParams, pt) -> jnp.ndarray:
    """Decode to bool; values must land on {0, 1} of Z_4 (`fhew.rs:20-25`)."""
    m = lwe.decode(params.lwe_z, pt)
    return m == 1


def lut_poly(params: BootstrapParams, table) -> jnp.ndarray:
    """Negacyclic LUT: each table entry repeated q/8 times, mapped to -+Q/8
    (`fhew.rs:31-36`)."""
    mapped = np.where(
        np.asarray(table, dtype=np.int64) == 0,
        np.uint64(params.big_q - params.big_q_by_8),
        np.uint64(params.big_q_by_8),
    )
    return jnp.asarray(np.repeat(mapped, params.q_by_8))


def not_(params: BootstrapParams, ct: LweCiphertext) -> LweCiphertext:
    """NOT is linear: (-a, -b + Q/4), no bootstrap (`fhew.rs:27-29`)."""
    return LweCiphertext(
        neg_mod(ct.a, params.big_q),
        add_mod(neg_mod(ct.b, params.big_q), u64(params.big_q_by_4), params.big_q),
    )


def op(
    params: BootstrapParams, key: BootstrapKey, table, ct: LweCiphertext
) -> LweCiphertext:
    f = lut_poly(params, table)
    out = bootstrap(params, key, f, ct)
    return LweCiphertext(out.a, add_mod(out.b, u64(params.big_q_by_8), params.big_q))


def _lin2(params: BootstrapParams, name: str, ct0, ct1) -> LweCiphertext:
    if name in ("and", "nand", "or", "nor"):
        return lwe.add(params.lwe_z, ct0, ct1)
    if name in ("xor", "xnor"):
        return lwe.double(params.lwe_z, lwe.sub(params.lwe_z, ct0, ct1))
    raise KeyError(name)


def gate(
    params: BootstrapParams,
    key: BootstrapKey,
    name: str,
    ct0: LweCiphertext,
    ct1: LweCiphertext,
    ct2: LweCiphertext | None = None,
) -> LweCiphertext:
    """Evaluate a named 2- or 3-input gate with one bootstrap — always via
    the batched pipeline (scalar gates ride as G=1) so every gate in a
    circuit shares the same few compiled shapes."""
    spec = (name, ct0, ct1) if ct2 is None else (name, ct0, ct1, ct2)
    return gate_batch(params, key, [spec])[0]


def and_(p, k, a, b):
    return gate(p, k, "and", a, b)


def nand(p, k, a, b):
    return gate(p, k, "nand", a, b)


def or_(p, k, a, b):
    return gate(p, k, "or", a, b)


def nor(p, k, a, b):
    return gate(p, k, "nor", a, b)


def xor(p, k, a, b):
    return gate(p, k, "xor", a, b)


def xnor(p, k, a, b):
    return gate(p, k, "xnor", a, b)


def majority(p, k, a, b, c):
    return gate(p, k, "majority", a, b, c)


def gate_batch(
    params: BootstrapParams,
    key: BootstrapKey,
    specs: list[tuple],
) -> list[LweCiphertext]:
    """Evaluate a heterogeneous list of gates with ONE batched bootstrap.

    specs: [(name, ct0, ct1[, ct2]), ...] — the linear combines are cheap LWE
    ops; the expensive LUT bootstrap runs once over the stacked batch with
    per-gate LUT polynomials. Circuit semantics are identical to evaluating
    `gate` per spec (`fhew.rs:31-39` per element).

    The input ciphertexts may themselves carry a leading "value lane" batch
    shape (vectorized encrypted datatypes): all G gate slots x V lanes run
    as ONE bootstrap of G*V ciphertexts.
    """
    import jax.numpy as jnp

    lanes = specs[0][1].b.shape  # () for scalar bools, (V,...) for vectors
    # NOTE: single scalar gates deliberately go through this batched path too
    # (G=1): routing them to the unbatched bootstrap() would compile a whole
    # second pipeline (~30-60 s each at production params via the remote
    # compile helper) for no runtime benefit.
    from ...parallel.batch import fhew_bootstrap_batch

    # pad so the jit cache sees few distinct batch shapes (padding
    # re-evaluates spec[0]; outputs are dropped): next power of two by
    # default, or the params' explicit coarse buckets (params.gate_pad)
    n_real = len(specs)
    if params.gate_pad:
        n_pad = next(
            (b for b in params.gate_pad if b >= n_real),
            1 << (n_real - 1).bit_length(),
        )
    else:
        n_pad = 1 << (n_real - 1).bit_length()
    specs = list(specs) + [specs[0]] * (n_pad - n_real)

    lins, luts = [], []
    for spec in specs:
        name, cts = spec[0], spec[1:]
        if name == "majority":
            assert len(cts) == 3
            lin = lwe.add(params.lwe_z, lwe.add(params.lwe_z, cts[0], cts[1]), cts[2])
        else:
            lin = _lin2(params, name, cts[0], cts[1])
        lins.append(lin)
        luts.append(lut_poly(params, GATE_TABLES[name]))
    stacked_a = jnp.stack([l.a for l in lins])  # (G, *lanes, n)
    stacked_b = jnp.stack([l.b for l in lins])  # (G, *lanes)
    n_lwe = stacked_a.shape[-1]
    flat = LweCiphertext(
        stacked_a.reshape(-1, n_lwe), stacked_b.reshape(-1)
    )  # (G*V, n)
    lut_arr = jnp.stack(luts)  # (G, N)
    if lanes:
        v = int(np.prod(lanes))
        lut_arr = jnp.repeat(lut_arr, v, axis=0)  # (G*V, N)
    out = fhew_bootstrap_batch(params, key, lut_arr, flat)
    b = add_mod(out.b, u64(params.big_q_by_8), params.big_q)
    a = out.a.reshape(n_pad, *lanes, n_lwe)
    b = b.reshape(n_pad, *lanes)
    return [LweCiphertext(a[i], b[i]) for i in range(n_real)]
