"""FHEW: Z_q LWE/RLWE/RGSW with LMKCDEY blind-rotation bootstrapping,
MP21 boolean gates, multi-key/threshold keygen, and encrypted bool/u8 types.

Mirrors the capability surface of the reference `scheme/fhew` crate in a
batched, jit-compiled, array-first design. See SURVEY.md §2.4.
"""

from . import bootstrapping, gates, lwe, rgsw, rlwe
from .boolean import FhewBool
from .bootstrapping import (
    BootstrapCrs,
    BootstrapKey,
    BootstrapKeyShare,
    BootstrapParams,
    bootstrap,
    crs_gen,
    key_gen,
    key_share_gen,
    key_share_merge,
)
from .params import AUTO_G, LweParams, RgswParams, RlweParams
from .uint8 import FhewU8

__all__ = [
    "AUTO_G",
    "BootstrapCrs",
    "BootstrapKey",
    "BootstrapKeyShare",
    "BootstrapParams",
    "FhewBool",
    "FhewU8",
    "LweParams",
    "RgswParams",
    "RlweParams",
    "bootstrap",
    "bootstrapping",
    "crs_gen",
    "gates",
    "key_gen",
    "key_share_gen",
    "key_share_merge",
    "lwe",
    "rgsw",
    "rlwe",
]
