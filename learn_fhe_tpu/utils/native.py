"""ctypes bindings for the native host library (`native/fhe_native.cpp`).

The library carries the host-side pieces that want real native code:
exact schoolbook oracles (used by the test suite instead of Python bigint
loops), a u64 host NTT, gadget decomposition oracles, and the LMKCDEY
schedule transcription. Every entry point has a pure-Python fallback at its
call site, so the package works without the .so; `available()` reports which
path is active. Build with `make -C native` (done automatically on first use
when a toolchain is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfhe_native.so"))

_i64 = ctypes.c_int64
_u64 = ctypes.c_uint64
_i32 = ctypes.c_int32
_int = ctypes.c_int


def _ptr(arr: np.ndarray, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.nega_mul_t64.argtypes = [ctypes.POINTER(_u64)] * 3 + [_i64, _i64]
    lib.nega_mul_zq.argtypes = [ctypes.POINTER(_u64)] * 3 + [_i64, _i64, _u64]
    lib.decompose_zq.argtypes = [
        ctypes.POINTER(_u64), ctypes.POINTER(_u64), _i64, _u64, _int, _int, _int,
    ]
    lib.decompose_t64.argtypes = [
        ctypes.POINTER(_u64), ctypes.POINTER(_u64), _i64, _int, _int, _int,
    ]
    lib.ntt_forward.argtypes = [
        ctypes.POINTER(_u64), ctypes.POINTER(_u64), _i64, _i64, _u64,
    ]
    lib.ntt_inverse.argtypes = [
        ctypes.POINTER(_u64), ctypes.POINTER(_u64), _u64, _i64, _i64, _u64,
    ]
    lib.build_schedule.argtypes = [
        ctypes.POINTER(_i64), _i64, _i64, _i64,
        ctypes.POINTER(_i64), ctypes.POINTER(_i64), _i64,
        _int, ctypes.POINTER(_i32), ctypes.POINTER(_i32), _i64,
    ]
    lib.build_schedule.restype = _int
    if hasattr(lib, "fuse_schedule"):  # older .so builds lack it
        lib.fuse_schedule.argtypes = [
            ctypes.POINTER(_i32), ctypes.POINTER(_i32), _i64, _i64,
            ctypes.POINTER(_i32), ctypes.POINTER(_i32),
        ]
        lib.fuse_schedule.restype = _i64
    return lib


def available() -> bool:
    return _lib() is not None


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------


def nega_mul_t64(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """Exact schoolbook a*b mod (X^n+1, 2^64); a, b: (..., n) u64."""
    lib = _lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    n = a.shape[-1]
    batch = int(np.prod(a.shape[:-1], initial=1))
    out = np.empty_like(a)
    lib.nega_mul_t64(_ptr(a, _u64), _ptr(b, _u64), _ptr(out, _u64), batch, n)
    return out


def nega_mul_zq(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray | None:
    """Exact schoolbook a*b mod (X^n+1, q), q < 2^63, inputs reduced."""
    lib = _lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    n = a.shape[-1]
    batch = int(np.prod(a.shape[:-1], initial=1))
    out = np.empty_like(a)
    lib.nega_mul_zq(_ptr(a, _u64), _ptr(b, _u64), _ptr(out, _u64), batch, n, q)
    return out


def decompose_zq(x: np.ndarray, q: int, log_b: int, d: int, rounding_bits: int):
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.empty((d, x.size), dtype=np.uint64)
    lib.decompose_zq(_ptr(x, _u64), _ptr(out, _u64), x.size, q, log_b, d, rounding_bits)
    return out.reshape(d, *x.shape)


def decompose_t64(x: np.ndarray, log_b: int, d: int, rounding_bits: int):
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.empty((d, x.size), dtype=np.uint64)
    lib.decompose_t64(_ptr(x, _u64), _ptr(out, _u64), x.size, log_b, d, rounding_bits)
    return out.reshape(d, *x.shape)


def ntt_forward(x: np.ndarray, psi_br: np.ndarray, q: int) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.uint64).copy()
    n = x.shape[-1]
    batch = int(np.prod(x.shape[:-1], initial=1))
    psi = np.ascontiguousarray(psi_br, dtype=np.uint64)
    lib.ntt_forward(_ptr(x, _u64), _ptr(psi, _u64), batch, n, q)
    return x


def ntt_inverse(
    x: np.ndarray, psi_inv_br: np.ndarray, n_inv: int, q: int
) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.uint64).copy()
    n = x.shape[-1]
    batch = int(np.prod(x.shape[:-1], initial=1))
    psi = np.ascontiguousarray(psi_inv_br, dtype=np.uint64)
    lib.ntt_inverse(_ptr(x, _u64), _ptr(psi, _u64), n_inv, batch, n, q)
    return x


# ---------------------------------------------------------------------------
# LMKCDEY schedule transcription
# ---------------------------------------------------------------------------


def build_schedule(
    a: np.ndarray,
    minus_map: np.ndarray,
    plus_map: np.ndarray,
    half: int,
    window: int,
    sched_len: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Batched (op, idx) schedules from public Z_2N masks; None if the .so is
    unavailable (caller falls back to the Python transcription)."""
    lib = _lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.int64)
    batch = int(np.prod(a.shape[:-1], initial=1))
    n_lwe = a.shape[-1]
    mm = np.ascontiguousarray(minus_map, dtype=np.int64)
    pm = np.ascontiguousarray(plus_map, dtype=np.int64)
    ops = np.empty((batch, sched_len), dtype=np.int32)
    idxs = np.empty((batch, sched_len), dtype=np.int32)
    rc = lib.build_schedule(
        _ptr(a, _i64), batch, n_lwe, len(mm),
        _ptr(mm, _i64), _ptr(pm, _i64), half,
        window, _ptr(ops, _i32), _ptr(idxs, _i32), sched_len,
    )
    if rc != 0:
        raise AssertionError("schedule overflow or value in both dlog tables")
    shape = (*a.shape[:-1], sched_len)
    return ops.reshape(shape), idxs.reshape(shape)


def fuse_schedule(
    ops: np.ndarray, idxs: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Batched schedule fusion (auto rides with the preceding ext run);
    returns (e_out, a_out, max_len) flat over (B, L), or None if the .so
    is unavailable/old (caller falls back to the Python loop)."""
    lib = _lib()
    if lib is None or not hasattr(lib, "fuse_schedule"):
        return None
    ops = np.ascontiguousarray(ops, dtype=np.int32)
    idxs = np.ascontiguousarray(idxs, dtype=np.int32)
    B, L = ops.shape
    e_out = np.empty((B, L), dtype=np.int32)
    a_out = np.empty((B, L), dtype=np.int32)
    max_len = lib.fuse_schedule(
        _ptr(ops, _i32), _ptr(idxs, _i32), B, L, _ptr(e_out, _i32), _ptr(a_out, _i32)
    )
    return e_out, a_out, int(max_len)
