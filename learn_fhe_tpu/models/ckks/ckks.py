"""CKKS (RNS variant, eprint 2018/1073) -- reference `scheme/ckks/src/ckks.rs`.

Ciphertexts are (b, a) pairs of stacked-limb RNS polynomials (L, N) u64; the
level (active prime basis) travels as static metadata so every jitted kernel
is specialized per level, and the limb axis is the mesh shard axis at scale.

Hybrid key switching (`ckks.rs:154-162,284-293`): ksk = enc_{QP}(P * sk'),
key_switch extends the target mask to base QP, multiplies, and rescales the
P-part away.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial
from itertools import islice

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.modular import u64
from ...ops.poly import automorphism_map
from ...ops.rns import (
    RnsPlan,
    add_mod_v,
    extend_bases,
    mul_shoup_v,
    neg_mod_v,
    rescale_k,
    rns_add,
    rns_from_i64,
    rns_intt,
    rns_mul,
    rns_mul_eval,
    rns_neg,
    rns_ntt,
    rns_plan,
    rns_sub,
    sub_mod_v,
)
from ...utils.crt import bigints_to_rns, rns_to_bigints
from ...utils.dd import DDC
from ...utils.distributions import dg, uniform_zq, zo
from ...utils.primes import two_adic_primes
from .sfft import sfft, sifft


@dataclass(frozen=True)
class CkksParams:
    """L q-primes + auxiliary p-primes; the scale is the last q prime
    (`ckks.rs:20-35`).

    Defaults reproduce the reference exactly: uniform log_qi-bit primes and
    |P| = |Q| single-digit key switching. The three optional fields below are
    the production extension (no reference counterpart — `ckks.rs` stops at
    the pedagogical fixture):

    - log_qis: per-prime bit-width ladder, bottom (q0) to top. Lets the
      bootstrap place 60-bit primes at the EvalMod levels and cheaper
      ~45-bit primes at the transform/user levels, which is what makes a
      128-bit-secure bootstrap budget fit (ARCHITECTURE §18).
    - log_ps: explicit auxiliary primes (usually just a few large ones).
    - dnum: hybrid key-switch digit count (Han-Ki, eprint 2019/688). The Q
      basis splits into dnum groups of alpha primes; the ksk carries one
      ciphertext per digit and P only needs ~alpha primes instead of |Q|,
      cutting log(QP) nearly in half at equal security.
    """

    log_n: int
    log_qi: int
    big_l: int
    log_qis: tuple | None = None  # per-prime ladder, bottom -> top
    log_ps: tuple | None = None  # aux primes; default big_l copies of log_qi
    dnum: int | None = None  # key-switch digits; None = 1 (reference)

    def __post_init__(self):
        assert self.log_n >= 1 and self.big_l > 1
        if self.log_qis is not None:
            assert len(self.log_qis) == self.big_l

    @cached_property
    def _prime_streams(self) -> dict:
        """One descending prime stream per distinct bit width, shared by qs
        then ps so equal-width primes never collide."""
        sizes = set(self.log_qis or ()) | set(self.log_ps or ())
        sizes |= {self.log_qi}
        return {s: two_adic_primes(s, self.log_n + 1) for s in sizes}

    @cached_property
    def qs(self) -> tuple[int, ...]:
        if self.log_qis is None:
            return tuple(
                islice(two_adic_primes(self.log_qi, self.log_n + 1), self.big_l)
            )
        return tuple(next(self._prime_streams[s]) for s in self.log_qis)

    @cached_property
    def ps(self) -> tuple[int, ...]:
        if self.log_qis is None and self.log_ps is None:
            it = two_adic_primes(self.log_qi, self.log_n + 1)
            return tuple(islice(it, self.big_l, 2 * self.big_l))
        self.qs  # force qs to consume its share of the shared streams first
        log_ps = self.log_ps or (self.log_qi,) * self.big_l
        return tuple(next(self._prime_streams[s]) for s in log_ps)

    @property
    def qps(self) -> tuple[int, ...]:
        return self.qs + self.ps

    # -- hybrid key-switch digit machinery (dnum > 1) --------------------------

    @property
    def num_digits(self) -> int:
        return self.dnum or 1

    @property
    def alpha(self) -> int:
        """Primes per key-switch digit."""
        return -(-self.big_l // self.num_digits)

    def digit_slices(self, level_l: int) -> tuple:
        """(start, stop) limb ranges of each ACTIVE digit at a level with
        level_l live primes (the full-basis groups cut at the level)."""
        a = self.alpha
        return tuple(
            (s, min(s + a, level_l)) for s in range(0, level_l, a)
        )

    def digit_factor(self, d: int) -> int:
        """P * B_d as an exact integer, where B_d = (Q/Q_d) * [(Q/Q_d)^-1
        mod Q_d] is the CRT basis element of digit d over the FULL q basis
        (B_d = 1 mod every prime of group d, 0 mod every other q prime —
        which is why the same ksk serves every level)."""
        s, e = self.digit_slices(self.big_l)[d]
        big_q = 1
        for q in self.qs:
            big_q *= q
        q_d = 1
        for q in self.qs[s:e]:
            q_d *= q
        q_hat = big_q // q_d
        return self.big_p * q_hat * pow(q_hat % q_d, -1, q_d)

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def l(self) -> int:
        """Slot count N/2 (`ckks.rs:45-47`)."""
        return 1 << (self.log_n - 1)

    @property
    def scale(self) -> int:
        return self.qs[-1]

    @cached_property
    def big_p(self) -> int:
        out = 1
        for p in self.ps:
            out *= p
        return out

    def pow5(self, j: int) -> int:
        return pow(5, j, 2 * self.n)

    def plan(self, qs: tuple[int, ...]) -> RnsPlan:
        return rns_plan(qs, self.n)


@partial(
    jax.tree_util.register_dataclass, data_fields=("b", "a"), meta_fields=("qs",)
)
@dataclass(frozen=True)
class CkksCiphertext:
    """RNS ciphertext; the level metadata `qs` is static pytree aux data, so
    jitted ops specialize per level with no tracing of the basis."""

    b: jnp.ndarray  # (L, N)
    a: jnp.ndarray  # (L, N)
    qs: tuple  # static level metadata


@partial(
    jax.tree_util.register_dataclass, data_fields=("b", "a"), meta_fields=("qs",)
)
@dataclass(frozen=True)
class CkksKeySwitchingKey:
    """Ciphertext over the full QP basis encrypting P * sk', stored in the
    EVALUATION basis (eval-basis key residency, like the FHEW/TFHE keys):
    key_switch multiplies it pointwise against NTT(a_ext), saving the two
    (2L, N) forward key transforms every switch would otherwise redo."""

    b: jnp.ndarray  # (2L, N), NTT domain
    a: jnp.ndarray
    qs: tuple


@partial(
    jax.tree_util.register_dataclass, data_fields=("ksk",), meta_fields=("j",)
)
@dataclass(frozen=True)
class CkksRotKey:
    ksk: CkksKeySwitchingKey
    j: int


def to_level(ct: CkksCiphertext, qs: tuple) -> CkksCiphertext:
    """Keep only the limbs in qs (the reference's limb-intersection semantics,
    `rns.rs:148-158`): dropping RNS limbs reduces mod a smaller Q at the same
    scale."""
    if ct.qs == qs:
        return ct
    idx = [ct.qs.index(q) for q in qs]
    return CkksCiphertext(ct.b[..., idx, :], ct.a[..., idx, :], qs)


def _align(ct0: CkksCiphertext, ct1: CkksCiphertext):
    qs = tuple(q for q in ct0.qs if q in ct1.qs)
    return to_level(ct0, qs), to_level(ct1, qs), qs


@jax.jit
def add(ct0: CkksCiphertext, ct1: CkksCiphertext) -> CkksCiphertext:
    ct0, ct1, qs = _align(ct0, ct1)
    plan = rns_plan(qs, ct0.b.shape[-1])
    return CkksCiphertext(
        rns_add(ct0.b, ct1.b, plan), rns_add(ct0.a, ct1.a, plan), qs
    )


@jax.jit
def sub(ct0: CkksCiphertext, ct1: CkksCiphertext) -> CkksCiphertext:
    ct0, ct1, qs = _align(ct0, ct1)
    plan = rns_plan(qs, ct0.b.shape[-1])
    return CkksCiphertext(
        rns_sub(ct0.b, ct1.b, plan), rns_sub(ct0.a, ct1.a, plan), qs
    )


# -- keygen -------------------------------------------------------------------


def sk_gen(params: CkksParams, rng: np.random.Generator) -> np.ndarray:
    """sk ~ zo(0.5) (`ckks.rs:139-141`)."""
    return zo(0.5, rng, params.n)


def sk_gen_sparse(params: CkksParams, h: int, rng: np.random.Generator) -> np.ndarray:
    """Sparse ternary secret with Hamming weight exactly h (HEAAN bootstrap
    practice, eprint 2018/153 §6 — NOT in the reference, which only
    bootstraps the linear half and never needs it): the mod-raise wrap count
    K scales with sqrt(h), so a fixed h keeps EvalMod's sine range (and its
    Chebyshev degree/depth) independent of the ring size N."""
    assert 0 < h <= params.n
    sk = np.zeros(params.n, dtype=np.int64)
    idx = rng.choice(params.n, size=h, replace=False)
    sk[idx] = rng.choice(np.array([-1, 1]), size=h)
    return sk


def pk_gen(params: CkksParams, sk: np.ndarray, rng: np.random.Generator) -> CkksCiphertext:
    zero = jnp.zeros((len(params.qs), params.n), dtype=jnp.uint64)
    return sk_encrypt(params, sk, zero, params.qs, rng)


def _sk_square(sk: np.ndarray) -> np.ndarray:
    """Negacyclic sk^2 over the integers (`ckks.rs:78-80`)."""
    n = len(sk)
    full = np.convolve(sk.astype(np.int64), sk.astype(np.int64))  # length 2n-1
    lo = full[:n].copy()
    hi = np.zeros(n, dtype=np.int64)
    hi[: 2 * n - 1 - n] = full[n:]
    return lo - hi


def _automorphism_i64(sk: np.ndarray, t: int) -> np.ndarray:
    n = len(sk)
    src, sign = automorphism_map(n, t)
    out = sk[src].copy()
    out[sign] = -out[sign]
    return out


@partial(jax.jit, static_argnums=(0,))
def _ksk_pt(params: CkksParams, sk_prime_i64: jnp.ndarray) -> jnp.ndarray:
    """Per-digit ksk plaintexts: (..., D, 2L, N) holding P * B_d * sk' over
    the qps basis (D = 1, B_0 = 1 reproduces the reference's P * sk',
    `ckks.rs:154-162`)."""
    qps = params.qps
    plan = params.plan(qps)
    pt = rns_from_i64(sk_prime_i64, plan)  # (..., 2L, N)
    from ...ops.modular import shoup_precompute

    D = params.num_digits
    f = np.array(
        [[params.digit_factor(d) % q for q in qps] for d in range(D)],
        dtype=np.uint64,
    )
    fs = np.array(
        [
            [shoup_precompute(int(f[d, i]), q) for i, q in enumerate(qps)]
            for d in range(D)
        ],
        dtype=np.uint64,
    )
    return mul_shoup_v(
        pt[..., None, :, :], f[..., None], fs[..., None], plan.q_arr
    )


def ksk_gen(
    params: CkksParams, sk: np.ndarray, sk_prime: np.ndarray, rng: np.random.Generator
) -> CkksKeySwitchingKey:
    """ksk = enc_{QP}(P * B_d * sk') per digit d (`ckks.rs:154-162`; digits
    per Han-Ki eprint 2019/688 when params.dnum), in eval residency. Single
    digit keeps the reference's 2-D (2L, N) layout; dnum > 1 stacks a
    leading digit axis."""
    pts = _ksk_pt(params, jnp.asarray(np.asarray(sk_prime, dtype=np.int64)))
    D = params.num_digits
    cts = [sk_encrypt(params, sk, pts[d], params.qps, rng) for d in range(D)]
    b = cts[0].b if D == 1 else jnp.stack([ct.b for ct in cts])
    a = cts[0].a if D == 1 else jnp.stack([ct.a for ct in cts])
    b_eval, a_eval = _ksk_to_eval(params, b, a)
    return CkksKeySwitchingKey(b_eval, a_eval, params.qps)


@partial(jax.jit, static_argnums=(0,))
def _ksk_to_eval(params: CkksParams, b, a):
    plan = params.plan(params.qps)
    return rns_ntt(b, plan), rns_ntt(a, plan)


def rlk_gen(params: CkksParams, sk: np.ndarray, rng) -> CkksKeySwitchingKey:
    return ksk_gen(params, sk, _sk_square(sk), rng)


def cjk_gen(params: CkksParams, sk: np.ndarray, rng) -> CkksKeySwitchingKey:
    return ksk_gen(params, sk, _automorphism_i64(sk, -1), rng)


def rtk_gen(params: CkksParams, sk: np.ndarray, j: int, rng) -> CkksRotKey:
    assert j != 0
    j = j % params.l
    sk_rot = _automorphism_i64(sk, params.pow5(j))
    return CkksRotKey(ksk_gen(params, sk, sk_rot, rng), j)


@partial(jax.jit, static_argnums=(0,))
def _ksk_gen_core(params: CkksParams, sk_primes_i64, a, e_i64, sk_i64):
    """Batched ksk generation: K keys in one program. sk_primes (K, N) i64,
    a (K, D, 2L, N) uniform masks, e (K, D, N) noise -> eval-resident
    (b, a) of shape (K, D, 2L, N)."""
    plan = params.plan(params.qps)
    pts = _ksk_pt(params, sk_primes_i64)  # (K, D, 2L, N) via leading bcast
    e = rns_from_i64(e_i64, plan)
    sk_rns = rns_from_i64(sk_i64, plan)
    b = rns_add(rns_add(rns_neg(rns_mul(a, sk_rns, plan), plan), e, plan), pts, plan)
    return rns_ntt(b, plan), rns_ntt(a, plan)


def ksk_gen_many(
    params: CkksParams, sk: np.ndarray, sk_primes: np.ndarray, rng: np.random.Generator
) -> list[CkksKeySwitchingKey]:
    """Generate K key-switching keys in ONE jitted dispatch (ksk_gen's 3
    device round trips per key dominate bootstrap keygen through the remote
    compile tunnel; measured ~500 s for 16 rotation keys at N=2^10 L=8+8)."""
    K = len(sk_primes)
    D = params.num_digits
    qps = params.qps
    a = np.stack(
        [
            np.stack(
                [
                    np.stack([uniform_zq(q, rng, params.n) for q in qps])
                    for _ in range(D)
                ]
            )
            for _ in range(K)
        ]
    )
    e = np.stack(
        [np.stack([dg(3.2, 6, rng, params.n) for _ in range(D)]) for _ in range(K)]
    )
    b_eval, a_eval = _ksk_gen_core(
        params,
        jnp.asarray(np.asarray(sk_primes, dtype=np.int64)),
        jnp.asarray(a),
        jnp.asarray(e),
        jnp.asarray(np.asarray(sk, dtype=np.int64)),
    )
    if D == 1:
        return [CkksKeySwitchingKey(b_eval[k, 0], a_eval[k, 0], qps) for k in range(K)]
    return [CkksKeySwitchingKey(b_eval[k], a_eval[k], qps) for k in range(K)]


def rtk_gen_many(
    params: CkksParams, sk: np.ndarray, js: list, rng: np.random.Generator
) -> dict[int, CkksRotKey]:
    """All BSGS rotation keys in one batched dispatch (see ksk_gen_many)."""
    js = [j % params.l for j in js]
    sk_rots = np.stack([_automorphism_i64(sk, params.pow5(j)) for j in js])
    ksks = ksk_gen_many(params, sk, sk_rots, rng)
    return {j: CkksRotKey(k, j) for j, k in zip(js, ksks)}


# -- encode / decode (host; `ckks.rs:186-213`) ---------------------------------
#
# Two precision backends, both host-only like the reference's F256 endpoints:
#   "dd"   — double-double (~106 bits, utils/dd.py), the fast default; covers
#            every reference test budget with >50 bits of margin.
#   "f256" — 256-bit fixed point (utils/f256.py), the drop-in equivalent of the
#            reference's F256 (`util/src/complex/f256.rs`) for precision-floor
#            work and scales beyond double-double's reach.


def _lift(m, precision: str):
    if isinstance(m, DDC):
        return m
    from ...utils.f256 import FPC

    if isinstance(m, FPC):
        return m
    if precision == "f256":
        return FPC.from_complex(m)
    return DDC.from_complex(m)


def encode(
    params: CkksParams,
    m,
    qs: tuple | None = None,
    precision: str = "dd",
    scale_int: int | None = None,
    rounding: str = "nearest",
) -> jnp.ndarray:
    """m: (l,) complex (np.complex128, DDC, or FPC) -> RNS plaintext (L, N).

    scale_int overrides the encoding scale (default params.scale); EvalMod
    encodes constants at the exact integer scale that keeps a ciphertext's
    true scale aligned through rescales (evalmod.py).

    rounding="trunc" reproduces the reference's integer conversion exactly:
    `BigInt::from(&F256)` shifts the 256-bit mantissa with no rounding step
    (`util/src/complex/f256.rs:213-238`, RoundingMode::None throughout), so
    the reference TRUNCATES toward zero where this library's default rounds
    to nearest (better numerics; ~0.5 ulp noise either way). The transcript
    parity test pins the trunc mode against the reference dump."""
    qs = params.qs if qs is None else qs
    z = _lift(m, precision)
    assert len(z) == params.l
    z = sifft(z).mul_int(params.scale if scale_int is None else scale_int)
    if rounding == "trunc":
        re, im = z.trunc_to_ints()
    else:
        re, im = z.round_to_ints()
    return jnp.asarray(bigints_to_rns(re + im, qs))


def decode(
    params: CkksParams,
    pt: jnp.ndarray,
    qs: tuple,
    precision: str = "dd",
    scale_int: int | None = None,
):
    """RNS plaintext -> (l,) complex128 slots (or an FPC when
    precision="f256", so callers can measure beyond f64's 53 bits).
    scale_int overrides the decoding scale (default params.scale) for
    ciphertexts living on a ladder band (production.py)."""
    vals = rns_to_bigints(np.asarray(pt), qs)
    l = params.l
    s = params.scale if scale_int is None else scale_int
    if precision == "f256":
        from ...utils.f256 import FPC

        z = FPC.from_ints(vals[:l], vals[l:])
        return sfft(z.div_int(s))
    z = DDC.from_ints(vals[:l], vals[l:])
    return sfft(z.div_int(s)).to_complex128()


# -- encrypt / decrypt ---------------------------------------------------------


def sk_encrypt(
    params: CkksParams,
    sk: np.ndarray,
    pt: jnp.ndarray,
    qs: tuple,
    rng: np.random.Generator,
) -> CkksCiphertext:
    """b = -(a*sk) + e + pt (`ckks.rs:215-225`)."""
    a = jnp.asarray(
        np.stack([uniform_zq(q, rng, params.n) for q in qs])
    )
    e_i64 = jnp.asarray(dg(3.2, 6, rng, params.n))
    sk_i64 = jnp.asarray(np.asarray(sk, dtype=np.int64))
    b = _sk_encrypt_core(qs, a, e_i64, sk_i64, pt)
    return CkksCiphertext(b, a, qs)


@partial(jax.jit, static_argnums=(0,))
def _sk_encrypt_core(qs: tuple, a, e_i64, sk_i64, pt):
    plan = rns_plan(qs, a.shape[-1])
    e = rns_from_i64(e_i64, plan)
    sk_rns = rns_from_i64(sk_i64, plan)
    return rns_add(rns_add(rns_neg(rns_mul(a, sk_rns, plan), plan), e, plan), pt, plan)


def pk_encrypt(
    params: CkksParams, pk: CkksCiphertext, pt: jnp.ndarray, rng: np.random.Generator
) -> CkksCiphertext:
    """(b, a) = (pk.b*u + e1 + pt, pk.a*u + e0) (`ckks.rs:227-239`)."""
    qs = pk.qs
    plan = params.plan(qs)
    u = rns_from_i64(jnp.asarray(zo(0.5, rng, params.n)), plan)
    e0 = rns_from_i64(jnp.asarray(dg(3.2, 6, rng, params.n)), plan)
    e1 = rns_from_i64(jnp.asarray(dg(3.2, 6, rng, params.n)), plan)
    a = rns_add(rns_mul(pk.a, u, plan), e0, plan)
    b = rns_add(rns_add(rns_mul(pk.b, u, plan), e1, plan), pt, plan)
    return CkksCiphertext(b, a, qs)


@partial(jax.jit, static_argnums=(0,))
def _decrypt_core(params: CkksParams, ct: CkksCiphertext, sk_i64):
    plan = params.plan(ct.qs)
    sk_rns = rns_from_i64(sk_i64, plan)
    return rns_add(ct.b, rns_mul(ct.a, sk_rns, plan), plan)


def decrypt(params: CkksParams, sk: np.ndarray, ct: CkksCiphertext) -> jnp.ndarray:
    """pt = b + a*sk (`ckks.rs:241-248`)."""
    return _decrypt_core(params, ct, jnp.asarray(np.asarray(sk, dtype=np.int64)))


# -- homomorphic ops ------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def rescale_ct(ct: CkksCiphertext, k: int = 1) -> CkksCiphertext:
    return CkksCiphertext(
        rescale_k(ct.b, ct.qs, k), rescale_k(ct.a, ct.qs, k), ct.qs[:-k]
    )


@partial(jax.jit, static_argnums=(0,))
def _mul_pt(params: CkksParams, pt: jnp.ndarray, ct: CkksCiphertext) -> CkksCiphertext:
    plan = params.plan(ct.qs)
    out = CkksCiphertext(rns_mul(pt, ct.b, plan), rns_mul(pt, ct.a, plan), ct.qs)
    return rescale_ct(out)


def mul_constant(params: CkksParams, m, ct: CkksCiphertext) -> CkksCiphertext:
    """encode(m) * ct, then rescale (`ckks.rs:250-253`)."""
    pt = encode(params, m, ct.qs)  # host (double-double sifft)
    return _mul_pt(params, pt, ct)


@partial(jax.jit, static_argnums=(0,))
def _add_pt(params: CkksParams, pt: jnp.ndarray, ct: CkksCiphertext) -> CkksCiphertext:
    plan = params.plan(ct.qs)
    return CkksCiphertext(rns_add(ct.b, pt, plan), ct.a, ct.qs)


def add_constant(params: CkksParams, m, ct: CkksCiphertext) -> CkksCiphertext:
    """ct + encode(m): plaintext addition into b, no level consumed. Assumes
    ct sits at the canonical scale Delta (as after mul/rescale); callers
    tracking exact drifted scales (evalmod.py) encode at scale_int instead.
    No reference counterpart (it stops at mul_constant, `ckks.rs:250`)."""
    pt = encode(params, m, ct.qs)
    return _add_pt(params, pt, ct)


@partial(jax.jit, static_argnums=(0,))
def mul(
    params: CkksParams, rlk: CkksKeySwitchingKey, ct0: CkksCiphertext, ct1: CkksCiphertext
) -> CkksCiphertext:
    """Tensor + relinearize + rescale (`ckks.rs:255-267`).

    The four operands are transformed ONCE and the tensor products run
    pointwise in the evaluation basis (7 transforms instead of the naive
    12); NTT/INTT are Zq-linear, so summing d1's two products before the
    single inverse transform is bit-identical to the per-product path."""
    ct0, ct1, qs = _align(ct0, ct1)
    plan = params.plan(qs)
    ea0 = rns_ntt(ct0.a, plan)
    eb0 = rns_ntt(ct0.b, plan)
    ea1 = rns_ntt(ct1.a, plan)
    eb1 = rns_ntt(ct1.b, plan)
    d0 = rns_intt(rns_mul_eval(eb0, eb1, plan), plan)
    d1 = rns_intt(
        rns_add(rns_mul_eval(eb0, ea1, plan), rns_mul_eval(ea0, eb1, plan), plan),
        plan,
    )
    d2 = rns_intt(rns_mul_eval(ea0, ea1, plan), plan)
    relin = key_switch(params, rlk, CkksCiphertext(jnp.zeros_like(d2), d2, qs))
    out = CkksCiphertext(
        rns_add(d0, relin.b, plan), rns_add(d1, relin.a, plan), qs
    )
    return rescale_ct(out)


def _automorphism_rns(x: jnp.ndarray, t: int, qs: tuple) -> jnp.ndarray:
    n = x.shape[-1]
    src, sign = automorphism_map(n, t)
    g = u64(x)[..., src]
    q_arr = jnp.asarray(np.array(qs, dtype=np.uint64)[:, None])
    return jnp.where(jnp.asarray(sign), neg_mod_v(g, q_arr), g)


@partial(jax.jit, static_argnums=(0,))
def conjugate(
    params: CkksParams, cjk: CkksKeySwitchingKey, ct: CkksCiphertext
) -> CkksCiphertext:
    ct_conj = CkksCiphertext(
        _automorphism_rns(ct.b, -1, ct.qs), _automorphism_rns(ct.a, -1, ct.qs), ct.qs
    )
    return key_switch(params, cjk, ct_conj)


@partial(jax.jit, static_argnums=(0,))
def rotate(params: CkksParams, rtk: CkksRotKey, ct: CkksCiphertext) -> CkksCiphertext:
    t = params.pow5(rtk.j)
    ct_rot = CkksCiphertext(
        _automorphism_rns(ct.b, t, ct.qs), _automorphism_rns(ct.a, t, ct.qs), ct.qs
    )
    return key_switch(params, rtk.ksk, ct_rot)


@partial(jax.jit, static_argnums=(0, 3))
def hoisted_rotations(
    params: CkksParams,
    rtks: tuple,  # CkksRotKey pytrees aligned with js
    ct: CkksCiphertext,
    js: tuple,
) -> tuple:
    """Rotate one ciphertext by many BSGS baby-step indices at the cost of
    ONE base extension + ONE forward transform ("hoisting", eprint 2018/1043
    §5.3 — an optimization the reference's per-rotation key_switch chain
    `ckks.rs:274-293` repeats |js| times).

    Automorphisms act on the EVALUATION basis as a pure slot permutation
    (`ops/ntt.py:eval_automorphism_perm`), and they commute with the
    coefficient-wise base extension, so extend+NTT once, then per rotation:
    permute slots, pointwise-multiply the eval-resident rotation key, and
    inverse-transform/rescale. Saves the (L+P, N) extension contraction and
    forward NTT on every rotation after the first — the dominant share of a
    rotate at high level."""
    from ...ops.ntt import eval_automorphism_perm

    qs = ct.qs
    ps = params.ps
    qps = qs + ps
    plan = params.plan(qps)
    plan_q = params.plan(qs)
    ae = _ks_hoist(params, ct.a, qs)  # (D, Lqp, N)
    idx = [params.qps.index(q) for q in qps]
    n = ct.a.shape[-1]
    outs = []
    for rtk, j in zip(rtks, js):
        assert rtk.j == j % params.l
        t = params.pow5(j)
        perm = jnp.asarray(eval_automorphism_perm(n, t))
        ae_rot = ae[..., perm]
        ksk_b = _ksk_digits(params, rtk.ksk.b, len(qs), idx)
        ksk_a = _ksk_digits(params, rtk.ksk.a, len(qs), idx)
        b = rescale_k(
            rns_intt(_ks_dot(ksk_b, ae_rot, plan), plan), qps, len(ps)
        )
        a = rescale_k(
            rns_intt(_ks_dot(ksk_a, ae_rot, plan), plan), qps, len(ps)
        )
        b = rns_add(b, _automorphism_rns(ct.b, t, qs), plan_q)
        outs.append(CkksCiphertext(b, a, qs))
    return tuple(outs)


def _ks_hoist(params: CkksParams, a: jnp.ndarray, qs: tuple) -> jnp.ndarray:
    """Digit-decompose a over the active level and base-extend every digit
    to the full qs+ps basis, NTT'd: (D_active, Lqp, N). D=1 reproduces the
    reference's single a_ext (`ckks.rs:284-289`) exactly."""
    ps = params.ps
    qps = qs + ps
    plan = params.plan(qps)
    outs = []
    for s, e in params.digit_slices(len(qs)):
        src = qs[s:e]
        rest = tuple(q for q in qps if q not in src)
        x = a[..., s:e, :]
        ext = jnp.concatenate([x, extend_bases(x, src, rest)], axis=-2)
        have = src + rest
        perm = [have.index(q) for q in qps]
        outs.append(ext[..., perm, :])
    return rns_ntt(jnp.stack(outs, axis=-3), plan)


def _ksk_digits(params: CkksParams, arr: jnp.ndarray, n_active: int, idx) -> jnp.ndarray:
    """Active-level view of one ksk component: (D_active, Lqp_active, N)."""
    d_active = len(params.digit_slices(n_active))
    a3 = arr[None] if arr.ndim == 2 else arr
    return a3[:d_active][..., idx, :]


def _ks_dot(ksk_sel: jnp.ndarray, ae: jnp.ndarray, plan) -> jnp.ndarray:
    """sum_d ksk[d] * ae[d] in the eval basis (modular digit contraction).
    The digit axis is -3 (ae may carry leading batch axes)."""
    acc = rns_mul_eval(ksk_sel[..., 0, :, :], ae[..., 0, :, :], plan)
    for d in range(1, ae.shape[-3]):
        acc = rns_add(
            acc,
            rns_mul_eval(ksk_sel[..., d, :, :], ae[..., d, :, :], plan),
            plan,
        )
    return acc


@partial(jax.jit, static_argnums=(0,))
def key_switch(
    params: CkksParams, ksk: CkksKeySwitchingKey, ct: CkksCiphertext
) -> CkksCiphertext:
    """Digit-decompose a, extend each digit to QP, dot with the per-digit
    ksk, rescale P away (`ckks.rs:284-293`; Han-Ki digits when params.dnum).

    ksk is eval-resident, so the switch costs D forward transforms of the
    extended digits plus two inverse transforms — the key is never
    re-transformed."""
    qs = ct.qs
    ps = params.ps
    qps = qs + ps
    plan = params.plan(qps)
    ae = _ks_hoist(params, ct.a, qs)  # (D, Lqp, N)
    # limb-intersection: select matching ksk limbs (qs is a prefix of full qs)
    idx = [params.qps.index(q) for q in qps]
    ksk_b = _ksk_digits(params, ksk.b, len(qs), idx)
    ksk_a = _ksk_digits(params, ksk.a, len(qs), idx)
    b = rescale_k(rns_intt(_ks_dot(ksk_b, ae, plan), plan), qps, len(ps))
    a = rescale_k(rns_intt(_ks_dot(ksk_a, ae, plan), plan), qps, len(ps))
    plan_q = params.plan(qs)
    return CkksCiphertext(rns_add(b, ct.b, plan_q), a, qs)
