"""EvalMod + full CKKS bootstrapping — a capability the reference STOPS
SHORT of (`ckks/bootstrapping.rs` implements only the linear transforms;
"No EvalMod/sine" per its own scope). This module completes the pipeline:

    mod_raise -> coeff_to_slot -> eval_mod (sine) -> slot_to_coeff

eval_mod approximates x mod 1 (slots carry t = w/c + I with integer I,
|I| <= K, |w/c| small) as (1/2pi)*sin(2pi t), evaluated as a Chebyshev
interpolant of cos(2pi (t - 1/4) / 2^r) on |t| <= K+1 followed by r
double-angle squarings (cos 2a = 2 cos^2 a - 1) — the classic recipe of
eprint 2018/153 §5 / 2018/1043. The Chebyshev evaluation uses the
recursive Paterson–Stockmeyer split p = q*T_g + r (one ciphertext mul per
split level), so multiplicative depth is ~log2(degree) + r.

Everything here composes the existing public ops (conjugate/mul/rescale and
the reference-parity linear transforms), so bootstrap outputs decrypt under
the same decode as any other ciphertext.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial

import jax
import numpy as np

from ...ops.rns import extend_bases
from . import ckks as C
from .bootstrapping import BootstrapKey, coeff_to_slot, slot_to_coeff
from .ckks import CkksCiphertext, CkksKeySwitchingKey, CkksParams


# ---------------------------------------------------------------------------
# Host-side Chebyshev toolkit (numpy, exact recurrences)
# ---------------------------------------------------------------------------


def cheb_interpolate(f, degree: int) -> np.ndarray:
    """Chebyshev interpolation coefficients of f on [-1, 1] at the
    Chebyshev points (numpy's chebinterpolate)."""
    return np.polynomial.chebyshev.chebinterpolate(f, degree)


def cheb_eval_host(coeffs: np.ndarray, t):
    return np.polynomial.chebyshev.chebval(t, coeffs)


def cheb_split(p: np.ndarray, g: int) -> tuple[np.ndarray, np.ndarray]:
    """Write p = q * T_g + r in the Chebyshev basis with deg q = deg p - g,
    deg r < g, using T_g*T_j = (T_{g+j} + T_{|g-j|}) / 2. Exact in floats up
    to rounding; used host-side to drive the homomorphic recursion."""
    D = len(p) - 1
    assert D >= g
    q = np.zeros(D - g + 1)
    q[0] = p[g]
    q[1:] = 2.0 * p[g + 1 :]
    # r = p - q*T_g expanded back into the Chebyshev basis
    qTg = np.zeros(D + 1)
    qTg[g] += q[0]
    for j in range(1, len(q)):
        qTg[g + j] += q[j] / 2.0
        qTg[abs(g - j)] += q[j] / 2.0
    r = p.copy()
    r[: len(qTg)] -= qTg
    return q, r[:g]


# ---------------------------------------------------------------------------
# Homomorphic Chebyshev evaluation
# ---------------------------------------------------------------------------


from collections import OrderedDict

# LRU over (params, value, qs, eval_basis): one bootstrap at L levels touches
# ~50 constants per level, so the cap comfortably holds several parameter
# sets while bounding device-buffer residency for long sweeping processes.
_CONST_CACHE_MAX = 4096
_const_cache: "OrderedDict" = OrderedDict()


def _const(params: CkksParams, value: complex, qs, eval_basis: bool = False):
    """Encoded constant vector [value]*l at basis qs, cached — EvalMod
    re-uses the same ~50 Chebyshev/offset constants every bootstrap call.
    With eval_basis=True the cached array is pre-NTT'd, saving a forward
    transform inside every constant multiply."""
    key = (params, complex(value), tuple(qs), eval_basis)
    pt = _const_cache.get(key)
    if pt is None:
        pt = C.encode(params, np.full(params.l, value, dtype=np.complex128), qs)
        if eval_basis:
            from .bootstrapping import _pt_eval

            pt = _pt_eval(tuple(qs), pt)
        _const_cache[key] = pt
        while len(_const_cache) > _CONST_CACHE_MAX:
            _const_cache.popitem(last=False)
    else:
        _const_cache.move_to_end(key)
    return pt


def add_const(params: CkksParams, ct: CkksCiphertext, value: float) -> CkksCiphertext:
    """ct + value (plaintext add: no level, no key)."""
    import jax.numpy as jnp

    from ...ops.rns import rns_add

    pt = _const(params, value, ct.qs)
    plan = params.plan(ct.qs)
    return CkksCiphertext(rns_add(ct.b, pt, plan), ct.a, ct.qs)


def mul_const(params: CkksParams, ct: CkksCiphertext, value: complex) -> CkksCiphertext:
    """ct * scalar constant (one level); the constant rides the eval-basis
    cache so each call costs 2 forward + 2 inverse transforms, not 3 + 2."""
    return _mul_pt_eval(params, _const(params, value, ct.qs, eval_basis=True), ct)


@partial(jax.jit, static_argnums=(0,))
def _mul_pt_eval(
    params: CkksParams, pt_eval: "jnp.ndarray", ct: CkksCiphertext
) -> CkksCiphertext:
    from ...ops.rns import rns_intt, rns_mul_eval, rns_ntt

    plan = params.plan(ct.qs)
    out = CkksCiphertext(
        rns_intt(rns_mul_eval(pt_eval, rns_ntt(ct.b, plan), plan), plan),
        rns_intt(rns_mul_eval(pt_eval, rns_ntt(ct.a, plan), plan), plan),
        ct.qs,
    )
    return C.rescale_ct(out)


def _double(ct: CkksCiphertext) -> CkksCiphertext:
    return C.add(ct, ct)


@dataclass
class _ChebCtx:
    params: CkksParams
    rlk: CkksKeySwitchingKey
    powers: dict  # j -> ciphertext of T_j(t)

    def T(self, j: int) -> CkksCiphertext:
        """Ciphertext of T_j(t), built on demand via T_{a+b} = 2 T_a T_b -
        T_{|a-b|} with power-of-two ladder (depth log j)."""
        if j in self.powers:
            return self.powers[j]
        assert j >= 2
        half = 1 << (j.bit_length() - 1)
        a, b = (half, j - half) if j != half else (half // 2, half // 2)
        ta, tb = self.T(a), self.T(b)
        prod = C.mul(self.params, self.rlk, ta, tb)
        out = _double(prod)
        if a == b:
            out = add_const(self.params, out, -1.0)  # T_{2a} = 2 T_a^2 - 1
        else:
            out = C.sub(out, self.T(abs(a - b)))
        self.powers[j] = out
        return out

    def eval(self, coeffs: np.ndarray, baby: int) -> CkksCiphertext:
        """Recursive PS evaluation of sum coeffs[k] T_k."""
        coeffs = np.trim_zeros(np.asarray(coeffs, dtype=np.float64), "b")
        if len(coeffs) == 0:
            coeffs = np.zeros(1)
        D = len(coeffs) - 1
        if D < baby:
            # direct: constant muls of the cached T_j (one level) + adds
            out = None
            for k in range(1, D + 1):
                if coeffs[k] == 0.0:
                    continue
                term = mul_const(self.params, self.T(k), float(coeffs[k]))
                out = term if out is None else C.add(out, term)
            if out is None:
                out = mul_const(self.params, self.T(1), 0.0)
            return add_const(self.params, out, float(coeffs[0]))
        g = 1 << (D.bit_length() - 1)  # largest power of two <= D
        q, r = cheb_split(coeffs, g)
        q_ct = self.eval(q, baby)
        r_ct = self.eval(r, baby)
        return C.add(C.mul(self.params, self.rlk, q_ct, self.T(g)), r_ct)


def eval_chebyshev(
    params: CkksParams,
    rlk: CkksKeySwitchingKey,
    ct_t: CkksCiphertext,
    coeffs: np.ndarray,
    baby: int = 8,
) -> CkksCiphertext:
    """Evaluate sum_k coeffs[k] T_k(t) on a ciphertext whose slots hold
    t in [-1, 1]."""
    ctx = _ChebCtx(params, rlk, {1: ct_t})
    return ctx.eval(coeffs, baby)


# ---------------------------------------------------------------------------
# EvalMod: remove the q0-multiples a mod-raise introduced
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EvalModParams:
    """x -> c * (1/2pi) sin(2pi x / c) config: slots hold x = w + c*I."""

    k: int = 12  # |I| <= k
    r: int = 3  # double-angle squarings
    degree: int = 30  # Chebyshev degree before doubling

    @cached_property
    def cheb_coeffs(self) -> np.ndarray:
        # f(s) = cos(2pi ((k+1) s - 1/4) / 2^r) on s in [-1, 1]
        kp1 = self.k + 1
        f = lambda s: np.cos(2 * np.pi * (kp1 * s - 0.25) / (1 << self.r))
        return cheb_interpolate(f, self.degree)


def eval_mod_real(
    params: CkksParams,
    rlk: CkksKeySwitchingKey,
    ct_s: CkksCiphertext,
    em: EvalModParams,
    c: float,
) -> CkksCiphertext:
    """Slots hold s = x / (c*(k+1)) in [-1, 1] for REAL x = w + c*I;
    returns slots ~ w."""
    cos_ct = eval_chebyshev(params, rlk, ct_s, em.cheb_coeffs)
    for _ in range(em.r):  # cos 2a = 2 cos^2 a - 1
        cos_ct = add_const(params, _double(C.mul(params, rlk, cos_ct, cos_ct)), -1.0)
    # now slots ~ cos(2pi x/c - pi/2) = sin(2pi x/c); scale by c/2pi
    return mul_const(params, cos_ct, c / (2 * np.pi))


def eval_mod(
    params: CkksParams,
    rlk: CkksKeySwitchingKey,
    cjk: CkksKeySwitchingKey,
    ct: CkksCiphertext,
    em: EvalModParams,
    c: float,
) -> CkksCiphertext:
    """Complex slots z = x + i y with x, y = w + c*I each: EvalMod the real
    and imaginary parts separately via conjugation and recombine."""
    conj = C.conjugate(params, cjk, ct)
    scale = 1.0 / (2.0 * c * (em.k + 1))
    s_re = mul_const(params, C.add(ct, conj), scale)
    s_im = mul_const(params, C.sub(ct, conj), scale * -1j)
    w_re = eval_mod_real(params, rlk, s_re, em, c)
    w_im = eval_mod_real(params, rlk, s_im, em, c)
    return C.add(w_re, mul_const(params, w_im, 1j))


# ---------------------------------------------------------------------------
# ModRaise + full bootstrap
# ---------------------------------------------------------------------------


def mod_raise(params: CkksParams, ct: CkksCiphertext) -> CkksCiphertext:
    """Exact embed of a bottom-level ciphertext into the full q-basis: for a
    single source limb the approximate extension (`rns.rs:331-345`) is exact
    (v~ = x, u = round(x/q0) in {0, 1} undoes the wrap of the centered
    lift), so phase becomes c_centered + q0*I with small integer I."""
    import jax.numpy as jnp

    assert len(ct.qs) == 1, "mod_raise expects an exhausted (single-limb) ct"
    q0 = ct.qs[0]
    target = params.qs
    rest = tuple(q for q in target if q != q0)
    b_full = jnp.concatenate([ct.b, extend_bases(ct.b, (q0,), rest)], axis=-2)
    a_full = jnp.concatenate([ct.a, extend_bases(ct.a, (q0,), rest)], axis=-2)
    # reorder limbs into params.qs order (q0 need not be qs[0] in general);
    # index the limb axis explicitly so leading batch axes broadcast through
    have = (q0,) + rest
    perm = [have.index(q) for q in target]
    return CkksCiphertext(b_full[..., perm, :], a_full[..., perm, :], target)


def bootstrap(
    params: CkksParams,
    bk: BootstrapKey,
    rlk: CkksKeySwitchingKey,
    cjk: CkksKeySwitchingKey,
    ct: CkksCiphertext,
    em: EvalModParams = EvalModParams(),
) -> CkksCiphertext:
    """Full CKKS bootstrap: an exhausted ciphertext (basis (q0,)) returns at
    a high level carrying the SAME message (approximately)."""
    q0 = ct.qs[0]
    c = q0 / params.scale  # slot units per q0 wrap
    raised = mod_raise(params, ct)
    slots = coeff_to_slot(bk, raised)
    cleaned = eval_mod(params, rlk, cjk, slots, em, c)
    return slot_to_coeff(bk, cleaned)
