"""CKKS (approximate complex arithmetic, RNS variant of eprint 2018/1073)
with homomorphic encoding-matrix evaluation (CoeffToSlot/SlotToCoeff).

Mirrors the capability surface of the reference `scheme/ckks` crate
(SURVEY.md §2.2): RNS limb-stacked ciphertexts on device, double-double
host encode/decode, hybrid key switching, BSGS linear transforms.
"""

from . import bootstrapping, ckks, sfft
from .bootstrapping import BootstrapKey, BootstrapParams, coeff_to_slot, key_gen, slot_to_coeff
from .ckks import (
    CkksCiphertext,
    CkksKeySwitchingKey,
    CkksParams,
    CkksRotKey,
    add,
    cjk_gen,
    conjugate,
    decode,
    decrypt,
    encode,
    ksk_gen,
    key_switch,
    mul,
    mul_constant,
    pk_encrypt,
    pk_gen,
    rescale_ct,
    rlk_gen,
    rotate,
    rtk_gen,
    sk_encrypt,
    sk_gen,
    sub,
    to_level,
)

__all__ = [
    "BootstrapKey",
    "BootstrapParams",
    "CkksCiphertext",
    "CkksKeySwitchingKey",
    "CkksParams",
    "CkksRotKey",
    "add",
    "bootstrapping",
    "cjk_gen",
    "ckks",
    "coeff_to_slot",
    "conjugate",
    "decode",
    "decrypt",
    "encode",
    "key_gen",
    "key_switch",
    "ksk_gen",
    "mul",
    "mul_constant",
    "pk_encrypt",
    "pk_gen",
    "rescale_ct",
    "rlk_gen",
    "rotate",
    "rtk_gen",
    "sfft",
    "sk_encrypt",
    "sk_gen",
    "slot_to_coeff",
    "sub",
    "to_level",
]
