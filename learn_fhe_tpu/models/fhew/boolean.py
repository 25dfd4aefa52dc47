"""FhewBool: encrypted boolean with operator overloading
(reference `scheme/fhew/src/fhew/boolean.rs`).

A FhewBool wraps one LWE ciphertext plus a handle to the bootstrap key.
Derived circuits (select, adders, subtractors) are gate compositions exactly
as `boolean.rs:135-176`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import numpy as np

from . import gates, lwe, rlwe
from .bootstrapping import BootstrapKey, BootstrapParams
from .lwe import LweCiphertext
from .rlwe import RlweCiphertext


@dataclass
class FhewBool:
    ct: LweCiphertext
    params: BootstrapParams
    key: BootstrapKey

    # -- encryption / decryption ---------------------------------------------

    @classmethod
    def sk_encrypt(
        cls,
        params: BootstrapParams,
        key: BootstrapKey,
        sk: np.ndarray,
        m,
        rng: np.random.Generator,
    ) -> "FhewBool":
        """m: bool OR a bool array — a batched m yields a VECTORIZED
        encrypted bool whose gates all run lane-parallel in one bootstrap."""
        ct = lwe.sk_encrypt(params.lwe_z, sk, gates.encode_bool(params, m), rng)
        return cls(ct, params, key)

    @classmethod
    def pk_encrypt(
        cls,
        params: BootstrapParams,
        key: BootstrapKey,
        pk: RlweCiphertext,
        m: bool,
        rng: np.random.Generator,
    ) -> "FhewBool":
        """RLWE-encrypt the constant then sample-extract (`boolean.rs:27-35`)."""
        import jax.numpy as jnp

        const = jnp.zeros(params.n, dtype=jnp.uint64).at[0].set(int(m))
        pt = rlwe.encode(params.rlwe, const)
        ct = rlwe.pk_encrypt(params.rlwe, pk, pt, rng)
        return cls(rlwe.sample_extract(params.rlwe, ct, 0), params, key)

    def decrypt(self, sk: np.ndarray):
        """bool for scalar ciphertexts, np.bool_ array for vectorized ones."""
        pt = lwe.decrypt(self.params.lwe_z, sk, self.ct)
        out = np.asarray(gates.decode_bool(self.params, pt))
        return bool(out) if out.ndim == 0 else out

    def share_decrypt(self, sk: np.ndarray, rng: np.random.Generator):
        return lwe.share_decrypt(self.params.lwe_z, sk, self.ct.a, rng)

    def decryption_share_merge(self, shares: Iterable) -> bool:
        pt = lwe.decryption_share_merge(self.params.lwe_z, self.ct.b, shares)
        return bool(np.asarray(gates.decode_bool(self.params, pt)))

    # -- gates ----------------------------------------------------------------

    def _wrap(self, ct: LweCiphertext) -> "FhewBool":
        return FhewBool(ct, self.params, self.key)

    def _gate(self, name: str, *others: "FhewBool") -> "FhewBool":
        return self._wrap(
            gates.gate(self.params, self.key, name, self.ct, *(o.ct for o in others))
        )

    def __invert__(self) -> "FhewBool":
        return self._wrap(gates.not_(self.params, self.ct))

    def __and__(self, o: "FhewBool") -> "FhewBool":
        return self._gate("and", o)

    def __or__(self, o: "FhewBool") -> "FhewBool":
        return self._gate("or", o)

    def __xor__(self, o: "FhewBool") -> "FhewBool":
        return self._gate("xor", o)

    def nand(self, o: "FhewBool") -> "FhewBool":
        return self._gate("nand", o)

    def nor(self, o: "FhewBool") -> "FhewBool":
        return self._gate("nor", o)

    def xnor(self, o: "FhewBool") -> "FhewBool":
        return self._gate("xnor", o)

    def majority(self, o1: "FhewBool", o2: "FhewBool") -> "FhewBool":
        return self._gate("majority", o1, o2)

    # -- derived circuits (`boolean.rs:135-176`) ------------------------------
    # Same gate compositions as the reference; independent gates within a
    # circuit run as ONE batched bootstrap (gate_many).

    def select(self, f: "FhewBool", t: "FhewBool") -> "FhewBool":
        nf, st = gate_many([("and", ~self, f), ("and", self, t)])
        return nf | st

    def overflowing_add(self, rhs: "FhewBool") -> tuple["FhewBool", "FhewBool"]:
        s, c = gate_many([("xor", self, rhs), ("and", self, rhs)])
        return s, c

    def carrying_add(
        self, rhs: "FhewBool", carry: "FhewBool"
    ) -> tuple["FhewBool", "FhewBool"]:
        """Full adder in TWO bootstrap rounds: the carry-out (a&b)|((a^b)&c)
        of `boolean.rs:139-154` IS the 3-input majority, which the gate set
        evaluates in one linear combination — so the carry chain advances one
        round per bit instead of three."""
        t, c_out = gate_many([("xor", self, rhs), ("majority", self, rhs, carry)])
        return t ^ carry, c_out

    def overflowing_sub(self, rhs: "FhewBool") -> tuple["FhewBool", "FhewBool"]:
        d, b = gate_many([("xor", self, rhs), ("and", ~self, rhs)])
        return d, b

    def borrowing_sub(
        self, rhs: "FhewBool", borrow: "FhewBool"
    ) -> tuple["FhewBool", "FhewBool"]:
        """Full subtractor in TWO rounds: borrow-out (~a&b)|(~(a^b)&borrow)
        == majority(~a, b, borrow) (NOT is linear, so ~a costs nothing)."""
        t, b_out = gate_many([("xor", self, rhs), ("majority", ~self, rhs, borrow)])
        return t ^ borrow, b_out


def gate_many(ops: list[tuple]) -> list["FhewBool"]:
    """Evaluate independent gates in ONE batched bootstrap.

    ops: [(name, FhewBool...), ...]. All inputs must share params/key.
    """
    first = ops[0][1]
    specs = [(name, *(b.ct for b in bs)) for name, *bs in ops]
    outs = gates.gate_batch(first.params, first.key, specs)
    return [FhewBool(ct, first.params, first.key) for ct in outs]
