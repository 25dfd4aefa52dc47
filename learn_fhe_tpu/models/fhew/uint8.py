"""FhewU8: encrypted 8-bit integer as little-endian FhewBool lanes
(reference `scheme/fhew/src/fhew/uint8.rs`).

Ripple-carry add/sub, schoolbook multiply, restoring-style division with
select-based conditional subtract -- gate-for-gate the reference circuits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import numpy as np

from .boolean import FhewBool
from .bootstrapping import BootstrapKey, BootstrapParams
from .rlwe import RlweCiphertext


@dataclass
class FhewU8:
    bits: list[FhewBool]  # little-endian, length 8

    @classmethod
    def sk_encrypt(cls, params, key, sk, v, rng) -> "FhewU8":
        """v: int OR an integer array — arrays yield a VECTORIZED encrypted
        u8 (one FhewU8 holding V values); every gate of every arithmetic op
        then runs lane-parallel across the V values in one bootstrap, which
        is how u8 circuits reach the chip's peak gates/s."""
        v = np.asarray(v, dtype=np.uint64)
        return cls(
            [
                FhewBool.sk_encrypt(params, key, sk, (v >> np.uint64(i)) & 1 == 1, rng)
                for i in range(8)
            ]
        )

    @classmethod
    def pk_encrypt(
        cls,
        params: BootstrapParams,
        key: BootstrapKey,
        pk: RlweCiphertext,
        v: int,
        rng: np.random.Generator,
    ) -> "FhewU8":
        return cls(
            [
                FhewBool.pk_encrypt(params, key, pk, (v >> i) & 1 == 1, rng)
                for i in range(8)
            ]
        )

    def decrypt(self, sk):
        """int for scalar, uint array for vectorized encrypted u8."""
        bits = [np.asarray(b.decrypt(sk)) for b in self.bits]
        out = sum(b.astype(np.uint64) << np.uint64(i) for i, b in enumerate(bits))
        return int(out) if np.ndim(out) == 0 else out.astype(np.uint8)

    def share_decrypt(self, sk, rng):
        return [b.share_decrypt(sk, rng) for b in self.bits]

    def decryption_share_merge(self, shares: Iterable[list]) -> int:
        per_bit = list(zip(*shares))
        return sum(
            int(b.decryption_share_merge(list(s))) << i
            for i, (b, s) in enumerate(zip(self.bits, per_bit))
        )

    # -- arithmetic (`uint8.rs:50-163`) ---------------------------------------

    def __invert__(self) -> "FhewU8":
        return FhewU8([~b for b in self.bits])

    def wrapping_neg(self) -> "FhewU8":
        v = self.bits
        out = [v[0]]
        carry = ~v[0]
        for i in range(1, 8):
            s, carry = (~v[i]).overflowing_add(carry)
            out.append(s)
        return FhewU8(out)

    def overflowing_add(self, rhs: "FhewU8") -> tuple["FhewU8", FhewBool]:
        out = []
        carry = None
        for l, r in zip(self.bits, rhs.bits):
            if carry is None:
                s, carry = l.overflowing_add(r)
            else:
                s, carry = l.carrying_add(r, carry)
            out.append(s)
        return FhewU8(out), carry

    def carrying_add(self, rhs: "FhewU8", carry: FhewBool) -> tuple["FhewU8", FhewBool]:
        out = []
        for l, r in zip(self.bits, rhs.bits):
            s, carry = l.carrying_add(r, carry)
            out.append(s)
        return FhewU8(out), carry

    def wrapping_add(self, rhs: "FhewU8") -> "FhewU8":
        return self.overflowing_add(rhs)[0]

    def overflowing_sub(self, rhs: "FhewU8") -> tuple["FhewU8", FhewBool]:
        out = []
        borrow = None
        for l, r in zip(self.bits, rhs.bits):
            if borrow is None:
                s, borrow = l.overflowing_sub(r)
            else:
                s, borrow = l.borrowing_sub(r, borrow)
            out.append(s)
        return FhewU8(out), borrow

    def borrowing_sub(self, rhs: "FhewU8", borrow: FhewBool) -> tuple["FhewU8", FhewBool]:
        out = []
        for l, r in zip(self.bits, rhs.bits):
            s, borrow = l.borrowing_sub(r, borrow)
            out.append(s)
        return FhewU8(out), borrow

    def wrapping_sub(self, rhs: "FhewU8") -> "FhewU8":
        return self.overflowing_sub(rhs)[0]

    def wrapping_mul(self, rhs: "FhewU8") -> "FhewU8":
        """Schoolbook product keeping only the low 8 bits (`uint8.rs:119-131`).

        All 36 partial-product ANDs are independent, so they run as ONE
        batched bootstrap before the carry-propagating accumulation."""
        from .boolean import gate_many

        lhs, rhs_b = self.bits, rhs.bits
        pp_specs = [
            ("and", lhs[j], rhs_b[i - j]) for i in range(8) for j in range(i + 1)
        ]
        pp_flat = gate_many(pp_specs)
        pps: list[list[FhewBool]] = []
        pos = 0
        for i in range(8):
            pps.append(pp_flat[pos : pos + i + 1])
            pos += i + 1

        carries: list[FhewBool | None] = [None] * 7
        product = []
        for i in range(8):
            terms = pps[i]
            acc = terms[0]
            for k, t in enumerate(terms[1:]):
                if carries[k] is None:
                    acc, carries[k] = acc.overflowing_add(t)
                else:
                    acc, carries[k] = acc.carrying_add(t, carries[k])
            product.append(acc)
        return FhewU8(product)

    def div_rem(self, rhs: "FhewU8") -> tuple["FhewU8", "FhewU8"]:
        """Restoring division via select-based conditional subtract
        (`uint8.rs:133-152`)."""
        lhs = self.bits
        neg_rhs = rhs.wrapping_neg().bits
        q: list[FhewBool] = []
        r: list[FhewBool] = []
        for i in range(8):
            r.insert(0, lhs[7 - i])
            d = list(r)
            d[0], carry = d[0].overflowing_add(neg_rhs[0])
            for j in range(1, 8):
                if j < len(d):
                    d[j], carry = d[j].carrying_add(neg_rhs[j], carry)
                else:
                    carry = carry & neg_rhs[j]
            # batched select row: all 2*len(r) ANDs in one bootstrap
            from .boolean import gate_many

            not_carry = ~carry
            flat = gate_many(
                [("and", not_carry, ri) for ri in r] + [("and", carry, di) for di in d]
            )
            ors = gate_many(
                [("or", flat[t], flat[len(r) + t]) for t in range(len(r))]
            )
            r = list(ors)
            q.insert(0, carry)
        return FhewU8(q), FhewU8(r)

    def wrapping_div(self, rhs: "FhewU8") -> "FhewU8":
        return self.div_rem(rhs)[0]

    def wrapping_rem(self, rhs: "FhewU8") -> "FhewU8":
        return self.div_rem(rhs)[1]

    __add__ = wrapping_add
    __sub__ = wrapping_sub
    __mul__ = wrapping_mul
    __truediv__ = wrapping_div
    __floordiv__ = wrapping_div
    __mod__ = wrapping_rem
