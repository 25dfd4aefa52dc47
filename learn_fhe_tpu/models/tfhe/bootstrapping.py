"""TFHE programmable bootstrapping: CMux-chain blind rotation
(reference `scheme/tfhe/src/bootstrapping.rs`).

    acc = TGLWE(v) * X^{-b~};  for each LWE key bit i:
        acc = cmux(brk_i, acc, acc * X^{a~_i})
    then sample_extract(0) and key-switch back to the LWE key.

TPU-first control flow: unlike FHEW's LMKCDEY walk there is no data-dependent
branching -- the chain is a natively batched `lax.scan` over the n stacked
TGGSW keys. Each step is restructured as
acc += (X^{a_i} - 1) (*) ExtProd(brk_i, acc) with the monomial applied
POINTWISE in the NTT domain (rows gathered from a precomputed public
evaluation table), so no per-element coefficient gathers exist inside the
scan (ARCHITECTURE.md section 4). Key material lives permanently in the
multi-prime u32 CRT evaluation domain with Shoup duals.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.modular import u64
from . import tggsw, tglwe, tlwe
from .params import TggswParams, TglweParams, TlweParams
from .tggsw import TggswEval
from .tglwe import TglweCiphertext
from .tlwe import TlweCiphertext, TlweKeySwitchingKey


@dataclass(frozen=True)
class BootstrapParams:
    """Pairs a TLWE (for key switch) with a TGGSW (for blind rotation) of
    equal plaintext modulus (`bootstrapping.rs:21-38`)."""

    tlwe: TlweParams
    tggsw: TggswParams

    def __post_init__(self):
        assert self.tlwe.p == self.tggsw.p

    @property
    def tglwe(self) -> TglweParams:
        return self.tggsw.tglwe

    @property
    def big_n(self) -> int:
        return self.tggsw.big_n

    @cached_property
    def tlwe_extracted(self) -> TlweParams:
        """TLWE view of the extracted big_n*k-dimensional ciphertext."""
        return self.tglwe.tlwe_view(self.tlwe.log_b, self.tlwe.d)


class BootstrapKey(NamedTuple):
    brk: TggswEval  # rows stacked over the n LWE key bits: (n, R, ...)
    ksk: TlweKeySwitchingKey
    mon_v: tuple  # per prime (2N, N) u32: NTT rows of X^s for every s
    mon_d: tuple  # matching Shoup duals


def key_gen(
    params: BootstrapParams, z: np.ndarray, rng: np.random.Generator
) -> BootstrapKey:
    """brk_i = TGGSW(z_i as constant poly) under a fresh TGLWE key s;
    ksk from the flattened s back to z (`bootstrapping.rs:59-76`); plus the
    public monomial evaluation tables the NTT-domain rotation gathers from."""
    from ...ops.torus_crt import monomial_eval_table, required_bound_bits

    s = tglwe.sk_gen(params.tglwe, rng)
    const = np.zeros((params.tlwe.n, params.big_n), dtype=np.uint64)
    const[:, 0] = np.asarray(z).astype(np.uint64)
    brk_coeff = tggsw.sk_encrypt(params.tggsw, s, jnp.asarray(const), rng)
    brk = tggsw.to_eval(params.tggsw, brk_coeff)
    ksk = tlwe.ksk_gen(params.tlwe, z, s.reshape(-1), rng)
    rows = (params.tglwe.k + 1) * params.tggsw.d
    bound = required_bound_bits(params.big_n, params.tggsw.log_b, rows)
    mv, md = monomial_eval_table(params.big_n, bound)
    mon_v = tuple(jnp.asarray(mv[i]) for i in range(mv.shape[0]))
    mon_d = tuple(jnp.asarray(md[i]) for i in range(md.shape[0]))
    return BootstrapKey(brk, ksk, mon_v, mon_d)


def mod_switch_2n(ct: TlweCiphertext, big_n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Round (a, b) into Z_2N as signed exponents (`bootstrapping.rs:99-104`)."""
    bits = 64 - (2 * big_n).bit_length() + 1
    half = np.uint64((1 << bits) >> 1)
    a = ((u64(ct.a) + half) >> np.uint64(bits)).astype(jnp.int64)
    b = ((u64(ct.b) + half) >> np.uint64(bits)).astype(jnp.int64)
    return a, b


@partial(jax.jit, static_argnums=(0, 5))
def blind_rotate(
    params: BootstrapParams,
    key: BootstrapKey,
    v_encoded: jnp.ndarray,
    a2n: jnp.ndarray,  # (..., n) signed exponents in [0, 2N)
    b2n: jnp.ndarray,  # (...,)
    parity: bool = False,
) -> TglweCiphertext:
    """CMux chain (`bootstrapping.rs:84-96`), natively batched: every step is
    acc += (X^{a_i} - 1) (*) ExtProd(brk_i, acc) with the monomial applied
    pointwise in the NTT domain (gathered rows of the key's monomial table),
    so no per-element coefficient gathers appear inside the scan.

    parity=True runs the reference's EXACT CMux term order instead —
    acc = cmux(brk_i, acc, acc * X^{a_i}) with the rotation in the
    coefficient domain (`tggsw.rs:113-120` + `bootstrapping.rs:88-95`) — so
    output ciphertexts are bit-identical to the reference, at the cost of
    the per-step coefficient gather the default path removes (~40% of a
    step, ARCHITECTURE §4). Unbatched only; used by the transcript parity
    test."""
    k = params.tglwe.k
    n2 = 2 * params.big_n
    batch = b2n.shape

    acc0 = TglweCiphertext(
        jnp.zeros((*batch, k, params.big_n), dtype=jnp.uint64),
        jnp.broadcast_to(v_encoded, (*batch, params.big_n)),
    )
    # one-time initial rotation by X^{-b} (outside the hot loop).
    # tglwe.rotate needs a scalar shift, so flatten any leading batch dims
    # to one axis, vmap once, and restore the shape.
    neg_b = (-b2n) % n2
    if batch:
        flat = TglweCiphertext(
            acc0.a.reshape(-1, k, params.big_n),
            acc0.b.reshape(-1, params.big_n),
        )
        rot = jax.vmap(tglwe.rotate)(flat, neg_b.reshape(-1))
        acc0 = TglweCiphertext(
            rot.a.reshape(*batch, k, params.big_n),
            rot.b.reshape(*batch, params.big_n),
        )
    else:
        acc0 = tglwe.rotate(acc0, neg_b)

    def step(carry, inp):
        acc = TglweCiphertext(*carry)
        a_i, key_i = inp  # a_i: (...,) exponents for this LWE key bit
        s = a_i % n2
        mv = tuple(jnp.take(t, s, axis=0) for t in key.mon_v)  # (..., N)
        md = tuple(jnp.take(t, s, axis=0) for t in key.mon_d)
        out = tggsw.cmux_rotate(params.tggsw, key_i, acc, mv, md)
        return (out.a, out.b), None

    def step_parity(carry, inp):
        acc = TglweCiphertext(*carry)
        a_i, key_i = inp
        out = tggsw.cmux(
            params.tggsw, key_i, acc, tglwe.rotate(acc, a_i % n2)
        )
        return (out.a, out.b), None

    if parity:
        assert not batch, "parity blind rotation is unbatched by design"
    a_scan = jnp.moveaxis(a2n, -1, 0)  # (n, ...)
    (a, b), _ = jax.lax.scan(
        step_parity if parity else step, (acc0.a, acc0.b), (a_scan, key.brk)
    )
    return TglweCiphertext(a, b)


def bootstrap(
    params: BootstrapParams,
    key: BootstrapKey,
    v: jnp.ndarray,
    ct: TlweCiphertext,
    parity: bool = False,
) -> TlweCiphertext:
    """Programmable bootstrap: LUT v (N values mod p) -> fresh ciphertext of
    v[round(phase)] (`bootstrapping.rs:78-82`). parity=True: reference-exact
    CMux order (see blind_rotate) for ciphertext-level parity checks."""
    v_enc = tglwe.encode(params.tglwe, v)
    a2n, b2n = mod_switch_2n(ct, params.big_n)
    acc = blind_rotate(params, key, v_enc, a2n, b2n, parity)
    ext = tglwe.sample_extract(params.tglwe, acc, 0)
    return tlwe.key_switch(params.tlwe, key.ksk, ext)


def lut_table(log_p: int, big_n: int, f) -> np.ndarray:
    """Negacyclic LUT with half-slot offset (`bootstrapping.rs:118-128` test
    helper, promoted to a library feature): table[v] = f(v) laid out so slot 0
    is centered, with the wrap-around encoded as -f(0) at the tail."""
    p = 1 << log_p
    m = big_n >> log_p
    vals = [int(f(v)) % p for v in range(p)]
    out = []
    out += [vals[0]] * (m // 2)
    for t in vals[1:]:
        out += [t] * m
    out += [(-vals[0]) % p] * (m // 2)
    return np.array(out, dtype=np.uint64)
