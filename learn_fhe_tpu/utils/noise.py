"""Noise-budget observability.

The reference only observes error growth through test tolerances (SURVEY.md
§5); production needs a meter. Given the secret key, these helpers report how
many bits of headroom remain between the accumulated noise and the decryption
threshold, for each scheme's ciphertext type.
"""

from __future__ import annotations

import numpy as np


def fhew_noise_bits(params, sk, ct, m_expected) -> float:
    """Remaining budget (bits) of an FHEW LWE ciphertext: threshold is
    Delta/2 = q/(2p)."""
    from ..models.fhew import lwe

    pt = np.asarray(lwe.decrypt(params.lwe_z, sk, ct)).astype(np.int64)
    q, p = params.big_q, params.p
    ideal = round(int(m_expected) * q / p) % q
    err = (int(pt) - ideal) % q
    if err >= q // 2:
        err -= q
    threshold = q / (2 * p)
    if err == 0:
        return float(np.log2(threshold))
    return float(np.log2(threshold) - np.log2(abs(err)))


def tfhe_noise_bits(params, sk, ct, m_expected) -> float:
    """Remaining budget of a TLWE ciphertext against the 2^log_delta slot."""
    from ..models.tfhe import tlwe

    mu_star = int(
        np.asarray(ct.b - np.sum(np.asarray(ct.a, dtype=np.uint64) * sk.astype(np.uint64)))
    ) % (1 << 64)
    ideal = (int(m_expected) << params.log_delta) % (1 << 64)
    err = (mu_star - ideal) % (1 << 64)
    if err >= 1 << 63:
        err -= 1 << 64
    threshold = 2 ** (params.log_delta - 1)
    if err == 0:
        return float(np.log2(threshold))
    return float(np.log2(threshold) - np.log2(abs(err)))


def ckks_precision_bits(m_expected: np.ndarray, m_got: np.ndarray) -> float:
    """Observed slot precision in bits (the reference's assert_eq_complex
    budget, `f256.rs:291-327`)."""
    d = float(np.max(np.abs(np.asarray(m_expected) - np.asarray(m_got))))
    return 200.0 if d == 0 else float(-np.log2(d))
