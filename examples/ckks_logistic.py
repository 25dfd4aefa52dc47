"""Encrypted logistic-regression inference with CKKS — an applied, end-to-end
workload on the public API (the kind of program a user of the reference's
`scheme/ckks` would want to run; the reference ships no applied example).

Pipeline (all on encrypted data, one ciphertext = 64 examples x 8 features
packed at slot e*8+f):

    dot product    mul_constant(tiled weights) + rotate-and-sum (3 rotations)
    + bias         add_constant
    sigmoid        degree-3 least-squares polynomial, evaluated with one
                   ct x ct square and one ct x ct multiply (Horner form)

Uses 4 of the 6 levels; decrypted scores are checked against the cleartext
poly-sigmoid (tight) and the true sigmoid (approximation budget), and the
hard classifications must agree exactly.

Run: python examples/ckks_logistic.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from learn_fhe_tpu.models.ckks import ckks as C

FEATURES = 8  # power of two so rotate-and-sum stays in-block
EXAMPLES = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log-n", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    params = C.CkksParams(log_n=args.log_n, log_qi=55, big_l=6)
    assert params.l >= EXAMPLES * FEATURES

    # --- model + data (host, cleartext) ---
    w = rng.standard_normal(FEATURES) * 0.8
    bias = 0.3
    x = rng.standard_normal((EXAMPLES, FEATURES))
    logits = x @ w + bias
    truth = 1.0 / (1.0 + np.exp(-logits))

    # degree-3 least-squares sigmoid on the observed logit range
    r = max(4.0, np.abs(logits).max() * 1.1)
    ts = np.linspace(-r, r, 2001)
    c3, _c2, c1, c0 = np.polyfit(ts, 1.0 / (1.0 + np.exp(-ts)), 3)
    poly = lambda v: c0 + c1 * v + c3 * v**3  # noqa: E731  (c2 ~ 0 by symmetry)

    # --- keys ---
    sk = C.sk_gen(params, rng)
    pk = C.pk_gen(params, sk, rng)
    rlk = C.rlk_gen(params, sk, rng)
    shifts = [FEATURES >> k for k in range(1, FEATURES.bit_length())]  # 4,2,1
    rtks = {j: C.rtk_gen(params, sk, j, rng) for j in shifts}

    # --- encrypt the packed batch ---
    slots = np.zeros(params.l, dtype=np.complex128)
    slots[: EXAMPLES * FEATURES] = x.reshape(-1)
    ct = C.pk_encrypt(params, pk, C.encode(params, slots), rng)

    # --- encrypted dot product: w * x, then block rotate-and-sum ---
    w_tiled = np.zeros(params.l, dtype=np.complex128)
    w_tiled[: EXAMPLES * FEATURES] = np.tile(w, EXAMPLES)
    acc = C.mul_constant(params, w_tiled, ct)  # level 1
    for j in shifts:
        acc = C.add(acc, C.rotate(params, rtks[j], acc))
    acc = C.add_constant(params, np.full(params.l, bias, dtype=np.complex128), acc)

    # --- encrypted sigmoid: c0 + x*(c1 + c3*x^2), 3 more levels ---
    sq = C.mul(params, rlk, acc, acc)
    inner = C.add_constant(
        params,
        np.full(params.l, c1, dtype=np.complex128),
        C.mul_constant(params, np.full(params.l, c3, dtype=np.complex128), sq),
    )
    score = C.mul(params, rlk, acc, inner)
    score = C.add_constant(params, np.full(params.l, c0, dtype=np.complex128), score)
    print(f"levels: {params.big_l} -> {len(score.qs)} left")

    # --- decrypt + check ---
    got = np.real(C.decode(params, C.decrypt(params, sk, score), score.qs))
    got = got[: EXAMPLES * FEATURES : FEATURES]  # slot e*8 holds example e
    want_poly = poly(logits)

    err_poly = np.max(np.abs(got - want_poly))
    err_true = np.max(np.abs(got - truth))
    agree = np.mean((got > 0.5) == (truth > 0.5))
    print(f"max |ct - cleartext poly|  = {err_poly:.2e}")
    print(f"max |ct - true sigmoid|    = {err_true:.2e} (poly approx budget)")
    print(f"classification agreement   = {agree:.1%}")
    assert err_poly < 1e-4, err_poly  # ciphertext noise only
    assert err_true < 0.08, err_true  # dominated by the degree-3 fit
    assert agree == 1.0
    print("OK")


if __name__ == "__main__":
    main()
