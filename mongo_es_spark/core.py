"""Pure (driver-side / spec) implementations of the transform layer.

These functions pin the *semantics* of the pipeline — they are direct
re-expressions of the reference's pure operators and are covered by the
ported golden unit tests (reference: test/processor.test.ts):

* ``transformer``            — T1/T2 field-mapping projection
                               (src/processor.ts:51-89)
* ``apply_update_mongo_doc`` — T3 ``$set``/``$unset`` application on a
                               source-shaped doc (src/processor.ts:91-105)
* ``apply_update_es_doc``    — T4 same on a mapped doc
                               (src/processor.ts:107-121)
* ``ignore_update``          — F4 change-relevance filter
                               (src/processor.ts:123-132)
* ``merge_oplogs``           — A1 per-key event-algebra compaction
                               (src/processor.ts:260-297)

They run on the DRIVER (tests, oracle replay, tiny control paths) — the
distributed hot path uses the declarative DataFrame equivalents in
``mongo_es_spark/operators/`` and ``mongo_es_spark/plans/``, which
Catalyst can optimize.  Keeping this spec separate gives a fast,
Spark-free semantic oracle for property tests.

Documents are plain dicts.  ``_id`` is a string (the reference
stringifies ObjectIDs at src/processor.ts:60,84).  Oplog timestamps are
ints encoded like BSON Timestamps: ``(epoch_seconds << 32) | increment``
— ``ts_seconds`` extracts the high bits (src/processor.ts:62,87).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

from . import paths
from .config import Task

UPSERT = "upsert"
DELETE = "delete"


def make_ts(seconds: int, increment: int = 0) -> int:
    return (seconds << 32) | increment


def ts_seconds(ts: Optional[int]) -> int:
    return (ts >> 32) if ts else 0


def transformer(
    task: Task,
    action: str,
    doc: dict,
    timestamp: Optional[int] = None,
    is_es_doc: bool = False,
) -> Optional[dict]:
    """Map a source/sink-shaped doc to the IR (reference: processor.ts:51-89).

    Returns ``None`` when the mapped ``data`` would be empty (the
    reference drops such rows, processor.ts:79-81).  ``is_es_doc=True``
    flips key lookup to *target* field names — used when patching a doc
    fetched back from the sink (processor.ts:69-71).
    """
    parent = (
        paths.get(doc, task.transform.parent) if task.transform.parent else None
    )
    if action == DELETE:
        return {
            "action": DELETE,
            "id": str(doc["_id"]),
            "parent": parent,
            "timestamp": ts_seconds(timestamp),
        }

    data: dict = dict(task.transform.static)
    for key, value in task.transform.mapping.items():
        lookup = value if is_es_doc else key
        if paths.has(doc, lookup):
            paths.set_(data, value, paths.get(doc, lookup))
    if paths.is_empty(data):
        return None
    return {
        "action": UPSERT,
        "id": str(doc["_id"]),
        "data": data,
        "parent": parent,
        "timestamp": ts_seconds(timestamp),
    }


def apply_update_mongo_doc(
    task: Task, doc: dict, set_: Optional[dict] = None, unset: Optional[dict] = None
) -> dict:
    """Apply ``$set``/``$unset`` to a source-shaped doc, restricted to
    mapped fields (reference: processor.ts:91-105).

    Note the reference's asymmetry, preserved: unset membership is a
    truthy ``get`` while set membership is ``has``.
    """
    set_ = set_ or {}
    unset = unset or {}
    for key in task.transform.mapping:
        if paths.get(unset, key):
            paths.unset(doc, key)
        if paths.has(set_, key):
            paths.set_(doc, key, paths.get(set_, key))
    return doc


def apply_update_es_doc(
    task: Task, doc: dict, set_: Optional[dict] = None, unset: Optional[dict] = None
) -> dict:
    """Same as :func:`apply_update_mongo_doc` but writes target field
    names (reference: processor.ts:107-121)."""
    set_ = set_ or {}
    unset = unset or {}
    for key, value in task.transform.mapping.items():
        if paths.get(unset, key):
            paths.unset(doc, value)
        if paths.has(set_, key):
            paths.set_(doc, value, paths.get(set_, key))
    return doc


def ignore_update(task: Task, oplog: dict) -> bool:
    """True iff an update event touches no mapped field
    (reference: processor.ts:123-132)."""
    ignore = True
    if oplog["op"] == "u":
        o = oplog.get("o", {}) or {}
        for key in task.transform.mapping:
            touched = (
                paths.has(o, key)
                or paths.has(o.get("$set", {}) or {}, key)
                or bool(paths.get(o.get("$unset", {}) or {}, key))
            )
            ignore = ignore and not touched
    return ignore


def merge_oplogs(task: Task, oplogs: Iterable[dict]) -> list[dict]:
    """Per-key last-writer-wins compaction of a batch of CDC events
    (reference: processor.ts:260-297).  The event algebra:

    * ``i`` then ``u``  -> the insert, patched via ``$set``/``$unset``
      (mapped fields only), timestamp advanced.
    * ``u`` then ``u``  -> deep-merged update (later keys win).
    * ``i`` then ``d``  -> annihilate (no event survives).
    * ``u`` then ``d``  -> the delete survives.
    * ``d`` then ``u``  -> the update replaces the delete.

    Input is sorted by ``ts``; output is sorted by ``ts``.  At most one
    event per ``(ns, _id)`` survives — the invariant that makes the
    sink's per-key ordering safe across partitions (SURVEY §4).
    """
    store: dict[str, dict] = {}
    for oplog in sorted(oplogs, key=lambda lg: lg["ts"]):
        op = oplog["op"]
        if op == "i":
            key = oplog["ns"] + str(oplog["o"]["_id"])
            store[key] = oplog
        elif op == "u":
            key = oplog["ns"] + str(oplog["o2"]["_id"])
            log = store.get(key)
            if log is not None and log["op"] == "i":
                log["o"] = apply_update_mongo_doc(
                    task, log["o"], oplog["o"].get("$set"), oplog["o"].get("$unset")
                )
                log["ts"] = oplog["ts"]
            elif log is not None and log["op"] == "u":
                log["o"] = paths.merge(log["o"], oplog["o"])
                log["ts"] = oplog["ts"]
            else:
                store[key] = oplog
        elif op == "d":
            key = oplog["ns"] + str(oplog["o"]["_id"])
            prior = store.get(key)
            if prior is not None and prior["op"] == "i":
                del store[key]
            else:
                store[key] = oplog
    return sorted(store.values(), key=lambda lg: lg["ts"])


def dispatch_oplog(
    task: Task,
    oplog: dict,
    lookup_sink: Optional[dict] = None,
    lookup_source: Optional[dict] = None,
) -> Optional[dict]:
    """Pure-data variant of the per-event router C5
    (reference: processor.ts:171-223) used by tests and the oracle
    replay.  ``lookup_sink``/``lookup_source`` stand in for the J1-J3
    point lookups (``{_id: doc}`` maps); in the distributed path these
    are left joins per micro-batch (see streaming/tail.py).
    """
    op = oplog["op"]
    try:
        if op == "i":
            return transformer(task, UPSERT, oplog["o"], oplog["ts"])
        if op == "u":
            o2 = oplog.get("o2") or {}
            if not o2.get("_id"):
                return None
            if ignore_update(task, oplog):
                return None
            o = oplog["o"]
            if any(not key.startswith("$") for key in o):
                # full-document replace (T5, processor.ts:186-195)
                return transformer(
                    task, UPSERT, {"_id": o2["_id"], **o}, oplog["ts"]
                )
            old = (lookup_sink or {}).get(str(o2["_id"]))
            if old is not None:
                doc = apply_update_es_doc(
                    task, dict(old), o.get("$set"), o.get("$unset")
                )
                return transformer(task, UPSERT, doc, oplog["ts"], is_es_doc=True)
            doc = (lookup_source or {}).get(str(o2["_id"]))
            if doc is None:
                return None
            return transformer(task, UPSERT, doc, oplog["ts"])
        if op == "d":
            o = oplog.get("o") or {}
            if len(o) != 1 or "_id" not in o:
                return None
            doc = o
            if task.transform.parent:
                doc = (lookup_sink or {}).get(str(o["_id"])) or None
            return transformer(task, DELETE, doc, oplog["ts"]) if doc else None
        return None
    except Exception:
        # reference swallows per-event errors to null (processor.ts:219-222)
        return None
