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
