"""Dot-path access over plain Python dicts, with lodash parity.

The reference engine's entire expression language is lodash's
``_.get/_.set/_.has/_.unset/_.merge`` over schemaless JSON documents
(reference: src/processor.ts:61,72-73,86,97-101,113-117 and the
``_.merge`` at src/processor.ts:275).  Two lodash behaviors matter and
are replicated here exactly:

1. **Literal-dotted-key equivalence** — lodash treats an object that
   carries the literal key ``"a.b"`` and an object nested as
   ``{a: {b: ...}}`` as equivalent for path access: if the literal key
   exists on the object, the path is NOT split.  MongoDB oplog ``$set``
   payloads use literal dotted keys, while documents are nested
   (reference: test/processor.test.ts:16-21 vs :53-58), so this
   equivalence is load-bearing.

2. **Deep merge, later wins** — ``merge(dst, src)`` recursively merges
   dict values and overwrites everything else (src/processor.ts:275).

These pure functions are the *semantic spec* used by unit tests and by
the driver-side plan builder; the distributed path never calls them
per-row (the plan builder compiles mapped paths to Catalyst column
expressions instead — see mongo_es_spark/plans/scan.py).
"""

from __future__ import annotations

from typing import Any, Mapping

_MISSING = object()


def split_path(path: str) -> list[str]:
    return path.split(".")


def _resolve_parts(obj: Any, path: str) -> list[str]:
    """lodash castPath: if the literal key exists, do not split."""
    if isinstance(obj, Mapping) and path in obj:
        return [path]
    return split_path(path)


def get(obj: Any, path: str, default: Any = None) -> Any:
    cur = obj
    for part in _resolve_parts(obj, path):
        if isinstance(cur, Mapping) and part in cur:
            cur = cur[part]
        else:
            return default
    return cur


def has(obj: Any, path: str) -> bool:
    sentinel = get(obj, path, _MISSING)
    return sentinel is not _MISSING


def set_(obj: dict, path: str, value: Any) -> dict:
    parts = _resolve_parts(obj, path)
    cur = obj
    for part in parts[:-1]:
        nxt = cur.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[part] = nxt
        cur = nxt
    cur[parts[-1]] = value
    return obj


def unset(obj: dict, path: str) -> bool:
    parts = _resolve_parts(obj, path)
    cur = obj
    for part in parts[:-1]:
        if isinstance(cur, Mapping) and part in cur:
            cur = cur[part]
        else:
            return False
    if isinstance(cur, dict) and parts[-1] in cur:
        del cur[parts[-1]]
        return True
    return False


def merge(dst: dict, src: Mapping) -> dict:
    """Deep merge ``src`` into ``dst`` in place; later values win."""
    for key, value in src.items():
        if isinstance(value, Mapping) and isinstance(dst.get(key), dict):
            merge(dst[key], value)
        else:
            dst[key] = value
    return dst


def is_empty(obj: Any) -> bool:
    return obj is None or (hasattr(obj, "__len__") and len(obj) == 0)
