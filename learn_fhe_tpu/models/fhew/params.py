"""FHEW parameter sets (reference `scheme/fhew/src/{lwe,rlwe,rgsw}.rs` params).

Parameters are frozen dataclasses; all derived tables (gadgets, NTT plans,
automorphism maps) are pure precomputes hanging off them via cached
properties, so a params object fully determines the compiled kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from ...ops.gadget import Gadget
from ...ops.ntt import NttPlan, ntt_plan

AUTO_G = 5  # generator of the automorphism group used by LMKCDEY (`rlwe.rs:92`)


@dataclass(frozen=True)
class LweParams:
    """LWE over Z_q with plaintext space Z_p (`lwe.rs:10-53`)."""

    q: int
    p: int
    n: int
    log_b: int | None = None
    d: int | None = None

    def __post_init__(self):
        assert self.q > self.p

    @property
    def delta(self) -> float:
        return self.q / self.p

    @cached_property
    def gadget(self) -> Gadget:
        assert self.log_b is not None and self.d is not None
        return Gadget(self.q, self.log_b, self.d)


@dataclass(frozen=True)
class RlweParams:
    """RLWE over R_q = Z_q[X]/(X^N+1) (`rlwe.rs:13-25`)."""

    q: int
    p: int
    log_n: int
    log_b: int | None = None
    d: int | None = None

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def delta(self) -> float:
        return self.q / self.p

    @cached_property
    def gadget(self) -> Gadget:
        assert self.log_b is not None and self.d is not None
        return Gadget(self.q, self.log_b, self.d)

    @cached_property
    def plan(self) -> NttPlan:
        return ntt_plan(self.q, self.n)

    @cached_property
    def use_u32(self) -> bool:
        """Hot loops run on native u32 lanes when the modulus and the whole
        gadget digit span fit (see `ops.gadget.decompose_zq_supports_u32`)."""
        from ...ops.gadget import decompose_zq_supports_u32

        return self.q < (1 << 31) and (
            self.log_b is None or decompose_zq_supports_u32(self.gadget)
        )

    @cached_property
    def plan32(self):
        from ...ops.ntt32 import ntt32_plan

        return ntt32_plan(self.q, self.n)


@dataclass(frozen=True)
class RgswParams:
    """RGSW = gadget-RLWE; its own decomposor for external products
    (`rgsw.rs:11-27`)."""

    rlwe: RlweParams
    log_b: int
    d: int

    @property
    def q(self) -> int:
        return self.rlwe.q

    @property
    def p(self) -> int:
        return self.rlwe.p

    @property
    def n(self) -> int:
        return self.rlwe.n

    @cached_property
    def gadget(self) -> Gadget:
        return Gadget(self.q, self.log_b, self.d)

    @property
    def plan(self) -> NttPlan:
        return self.rlwe.plan

    @cached_property
    def use_u32(self) -> bool:
        from ...ops.gadget import decompose_zq_supports_u32

        return self.q < (1 << 31) and decompose_zq_supports_u32(self.gadget)

    @property
    def plan32(self):
        return self.rlwe.plan32
