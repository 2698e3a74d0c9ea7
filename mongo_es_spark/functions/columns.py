"""Dot-path -> Catalyst column compilation.

The reference addresses nested documents with lodash dot-paths
(reference: src/processor.ts:61,72-73).  On the distributed path we do
NOT interpret paths per row — the task's mapping is compiled once, on
the driver, into Catalyst column expressions, so the hot path is plain
``select`` that Catalyst can prune/push down and Tungsten can codegen.

Literal-dotted-key equivalence (SURVEY §1.2): a source column literally
named ``"a.b"`` and a nested struct field ``a.b`` are both addressable;
resolution is schema-driven at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def source_path_col(df: DataFrame, path: str) -> Column:
    """Resolve a dot-path against ``df``'s schema.

    Prefers a literal column named exactly ``path`` (oplog ``$set``
    payload shape), falling back to nested-field access (document
    shape) — mirroring lodash ``castPath``.
    """
    if path in df.columns:
        return df[path]  # literal (possibly dotted) column name
    return F.col(path)  # nested struct traversal a.b.c


def has_path(df: DataFrame, path: str) -> bool:
    """Plan-time existence check for a dot-path in ``df``'s schema."""
    if path in df.columns:
        return True
    parts = path.split(".")
    fields = df.schema
    for i, part in enumerate(parts):
        names = {f.name: f for f in fields.fields} if hasattr(fields, "fields") else {}
        if part not in names:
            return False
        if i < len(parts) - 1:
            fields = names[part].dataType
            if not hasattr(fields, "fields"):
                return False
    return True


def nest_target_paths(exprs: dict[str, Column]) -> list[Column]:
    """Turn ``{'a.b': col, 'a.c': col, 'x': col}`` into
    ``[struct(col as b, col as c) as a, col as x]`` — re-nesting the
    mapped output document the way lodash ``_.set`` builds it
    (reference: src/processor.ts:73).
    """
    tree: dict = {}
    for path, column in exprs.items():
        parts = path.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"conflicting target paths at {path}")
        node[parts[-1]] = column

    def build(node) -> Column:
        if isinstance(node, dict):
            return F.struct(
                *[build(child).alias(name) for name, child in node.items()]
            )
        return node

    return [build(child).alias(name) for name, child in tree.items()]
