"""Key/ciphertext (de)serialization for multi-host deployment.

The reference keeps everything in memory (SURVEY.md §5: no serde anywhere);
a real deployment needs the multi-party protocol messages -- CRS, pk/ksk/ak/
brk shares, ciphertexts, decryption shares -- to cross a wire. This module
flattens any of the framework's NamedTuple/array containers to a single .npz
with a structure manifest, covering checkpoint/resume of key material.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _flatten(obj: Any, prefix: str, arrays: dict, manifest: dict):
    import dataclasses

    if hasattr(obj, "_fields"):  # NamedTuple
        manifest[prefix] = {"kind": "namedtuple", "type": type(obj).__name__, "fields": list(obj._fields)}
        for f in obj._fields:
            _flatten(getattr(obj, f), f"{prefix}.{f}", arrays, manifest)
    elif dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        names = [f.name for f in dataclasses.fields(obj)]
        manifest[prefix] = {
            "kind": "dataclass",
            "type": type(obj).__name__,
            "fields": names,
        }
        for f in names:
            _flatten(getattr(obj, f), f"{prefix}.{f}", arrays, manifest)
    elif isinstance(obj, dict):
        manifest[prefix] = {"kind": "dict", "keys": [str(k) for k in obj.keys()]}
        for k, v in obj.items():
            _flatten(v, f"{prefix}[{k}]", arrays, manifest)
    elif isinstance(obj, (list, tuple)) and obj and not isinstance(obj[0], (int, float)):
        manifest[prefix] = {"kind": "list", "len": len(obj)}
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}#{i}", arrays, manifest)
    elif isinstance(obj, tuple):  # tuple of scalars (e.g. qs level metadata)
        manifest[prefix] = {"kind": "scalars", "values": list(obj)}
    elif isinstance(obj, (int, float, str, bool)):
        manifest[prefix] = {"kind": "scalar", "value": obj}
    elif obj is None:
        manifest[prefix] = {"kind": "none"}
    else:
        manifest[prefix] = {"kind": "array"}
        arrays[prefix] = np.asarray(obj)


def save(path: str, **objects) -> None:
    """Serialize named containers (keys, ciphertexts, CRS...) to one .npz."""
    arrays: dict = {}
    manifest: dict = {}
    for name, obj in objects.items():
        _flatten(obj, name, arrays, manifest)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load(path: str, reconstruct: dict[str, Any] | None = None) -> dict[str, Any]:
    """Load back; returns {name: structure}. If `reconstruct` maps a name to
    a NamedTuple class, that container is rebuilt typed; otherwise nested
    dicts/lists of arrays are returned."""
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    roots = sorted({k.split(".")[0].split("[")[0].split("#")[0] for k in manifest})

    def build(prefix: str):
        meta = manifest[prefix]
        kind = meta["kind"]
        if kind == "array":
            return data[prefix]
        if kind == "scalar":
            return meta["value"]
        if kind == "scalars":
            return tuple(meta["values"])
        if kind == "none":
            return None
        if kind in ("namedtuple", "dataclass"):
            fields = {f: build(f"{prefix}.{f}") for f in meta["fields"]}
            cls = (reconstruct or {}).get(prefix) or (reconstruct or {}).get(
                meta["type"]
            )
            return cls(**fields) if cls else fields
        if kind == "dict":
            return {k: build(f"{prefix}[{k}]") for k in meta["keys"]}
        if kind == "list":
            return [build(f"{prefix}#{i}") for i in range(meta["len"])]
        raise ValueError(kind)

    return {r: build(r) for r in roots}
