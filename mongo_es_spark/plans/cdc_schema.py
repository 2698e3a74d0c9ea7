"""Task -> typed schemas for the CDC document payloads.

The reference is schemaless; Spark wants schemas.  Resolution (SURVEY
§7 hard part (a)): only mapped fields ever reach the sink
(reference: src/processor.ts:66-78), so the *effective* document schema
is derivable from ``transform.mapping`` keys, with per-task type hints
(default string — BSON/JSON carries its own types; the hints pin what
the sink mapping declares, like the ES mapping body does in
examples/config.json:60-80).

The oplog ``o`` payload parses with ONE schema covering all shapes:
nested doc fields (insert / full-replace) plus a ``$set`` struct whose
fields are the *literal dotted* mapped paths (Mongo ``$set`` payloads
use literal dotted keys — SURVEY §1.2).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql.types import DataType, StringType, StructField, StructType

from ..config import Task


def _parse_hint(hint) -> DataType:
    if isinstance(hint, DataType):
        return hint
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(hint)


def doc_struct(
    paths_: list[str], hints: Optional[Mapping[str, object]] = None
) -> StructType:
    """Nested StructType from dot-paths (document shape)."""
    hints = hints or {}
    tree: dict = {}
    for path in paths_:
        parts = path.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_hint(hints.get(path, StringType()))

    def build(node) -> DataType:
        if isinstance(node, dict):
            return StructType(
                [StructField(name, build(child)) for name, child in node.items()]
            )
        return node

    out = build(tree)
    assert isinstance(out, StructType)
    return out


def set_struct(
    paths_: list[str], hints: Optional[Mapping[str, object]] = None
) -> StructType:
    """Flat StructType whose field names are the literal dotted paths
    ($set payload shape)."""
    hints = hints or {}
    return StructType(
        [
            StructField(path, _parse_hint(hints.get(path, StringType())))
            for path in paths_
        ]
    )


def oplog_value_schema(
    task: Task, hints: Optional[Mapping[str, object]] = None
) -> StructType:
    """Schema for the oplog ``doc`` JSON payload: mapped doc fields
    (nested) + ``$set`` (literal dotted).  ``$unset`` is extracted at
    compaction time (unset_keys), not parsed here."""
    source_paths = task.source_paths()
    fields = list(doc_struct(source_paths, hints).fields)
    fields.append(StructField("$set", set_struct(source_paths, hints)))
    return StructType(fields)


def sink_data_schema(
    task: Task, hints: Optional[Mapping[str, object]] = None
) -> StructType:
    """Nested StructType of the mapped output document (target paths).

    ``hints`` are keyed by SOURCE path; statics default to string.
    """
    hints = hints or {}
    target_hints: dict[str, object] = {}
    for src, dst in task.transform.mapping.items():
        if src in hints:
            target_hints[dst] = hints[src]
    return doc_struct(task.sink_fields(), target_hints)
