"""TFHE: torus (Z/2^64) LWE tower TLWE -> TGLWE -> TGSW -> TGGSW with
CMux-chain blind rotation and programmable bootstrapping.

Mirrors the capability surface of the reference `scheme/tfhe` crate
(SURVEY.md §2.3) in a batched array-first design; torus ring products run on
the exact 2-prime NTT multiplier (strictly more accurate than the reference's
FFT64 and native to TPU integer lanes).
"""

from . import tggsw, tglwe, tgsw, tlwe
from .bootstrapping import (
    BootstrapKey,
    BootstrapParams,
    blind_rotate,
    bootstrap,
    key_gen,
    lut_table,
    mod_switch_2n,
)
from .params import TggswParams, TglweParams, TgswParams, TlweParams

__all__ = [
    "BootstrapKey",
    "BootstrapParams",
    "TggswParams",
    "TglweParams",
    "TgswParams",
    "TlweParams",
    "blind_rotate",
    "bootstrap",
    "key_gen",
    "lut_table",
    "mod_switch_2n",
    "tggsw",
    "tglwe",
    "tgsw",
    "tlwe",
]
