"""Concurrent pipeline prewarming.

Measured on the tunneled v5e (2026-08-17): the remote compile helper costs
~330 s for the FIRST compile of a process (helper cold start) and ~10 s per
program after that — and it serves CONCURRENT requests (two distinct
programs on two threads: 13.9 s total vs 300+ s issued serially in a cold
process). Its cache is process-external, so lowering+compiling a pipeline
from abstract ShapeDtypeStructs on a background thread makes the later real
call a cache hit.

`prewarm` fires compile thunks on a shared small pool and returns the
futures immediately; a warmup must never break the real path, so exceptions
are captured into the future's result instead of raised.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Iterable

_POOL: ThreadPoolExecutor | None = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=4, thread_name_prefix="fhe-warm")
    return _POOL


def prewarm(thunks: Iterable[Callable[[], object]]) -> list[Future]:
    """Fire-and-forget: schedule each thunk (typically
    `lambda: jit(f).lower(*abstract_args).compile()`) on the warm pool."""

    def safe(t):
        try:
            t()
            return None
        except Exception as e:  # never let a warmup break the real path
            return e

    return [_pool().submit(safe, t) for t in thunks]


def wait_all(futures: list[Future]) -> list[Exception]:
    """Block until done; return the (hopefully empty) list of errors."""
    return [err for err in (f.result() for f in futures) if err is not None]
