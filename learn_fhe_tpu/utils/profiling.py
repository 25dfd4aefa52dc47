"""Profiling / tracing observability (SURVEY.md §5: absent in the reference,
first-class here).

`trace(...)` wraps `jax.profiler.trace` around a region; `summarize(...)`
aggregates the captured device events into per-op-kind totals — the exact
workflow used to find the blind-rotation hot spots (ARCHITECTURE.md §5).

Example:
    from learn_fhe_tpu.utils import profiling
    with profiling.trace("/tmp/fhe_trace"):
        out = pipeline(...)
        jax.block_until_ready(out)
    for line in profiling.summarize("/tmp/fhe_trace")[:15]:
        print(line)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
from contextlib import contextmanager
from dataclasses import dataclass


@contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


# Host-side framework event kinds that the CKKS trace (2026-08-20) showed
# polluting device totals: the profiler records the python-side dispatch and
# the profiling session's own compile alongside device HLO ops. Excluding
# them is what makes "device total" honest — the ckks_profile.py traces
# measured ~835 ms of PjitFunction dispatch wrappers and ~394 ms of
# backend_compile_and_load around ~4 ms of actual device fusions.
_HOST_KINDS = frozenset(
    {
        "backend_compile_and_load",
        "np",
        "lower_sharding_computation",
        "ExecuteReplicated",
        "shard_args",
        "ParseArguments",
        "TransferToDevice",
        "TransferFromDevice",
    }
)


@dataclass(frozen=True)
class OpStat:
    kind: str  # HLO fusion kind, e.g. "compare_select_fusion", "copy"
    total_ms: float
    count: int

    def __str__(self):
        return f"{self.total_ms:9.2f} ms  x{self.count:6d}  {self.kind}"


def summarize(log_dir: str, min_count: int = 1) -> list[OpStat]:
    """Aggregate device trace events by op kind, most expensive first.

    Host-side framework events (python frames, jit dispatch, while wrappers)
    are filtered out so the list reflects device time.
    """
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace files under {log_dir}")
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if (
            name.startswith("$")
            or name.startswith("jit_")
            or name.startswith("while")
            or "block_until" in name
        ):
            continue
        kind = name.split(".")[0]
        if kind in _HOST_KINDS or kind.startswith("PjitFunction"):
            continue
        tot[kind] += e["dur"]
        cnt[kind] += 1
    return [
        OpStat(k, us / 1e3, cnt[k])
        for k, us in tot.most_common()
        if cnt[k] >= min_count
    ]
