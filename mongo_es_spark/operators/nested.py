"""ES nested and parent-child (join-field) queries over the search
store — the document-relational third of the ES query DSL the flat
per-doc operators cannot express:

* ``nested``: an ``array<struct>`` stored field where EVERY condition
  of the query must hold on the SAME array element (ES indexes each
  element as a hidden sub-document precisely to get this; an
  object-flattened mapping would wrongly match across elements).
  Served as higher-order functions over the stored array —
  ``filter``/``size`` evaluate per element inside whole-stage codegen,
  no explode, no shuffle beyond the final ordering.
* ``has_child``: parent docs with at least ``min_children`` children
  matching a child query, children and parents living in ONE index
  carrying a join field (``join_name`` + ``parent_id`` stored fields,
  the ES ``join`` mapping type).  One token-pruned postings scan for
  the child match, a parent-keyed count, and a semi-join back to the
  parent docstats — ∝ matched children + parents, never corpus-wide.
* ``has_parent``: child docs whose parent matches a parent query —
  the matched-parent id set (usually small: it is a filtered PARENT
  set) broadcast-joins against the children's ``parent_id``.

Scale shape: both join queries group/join on ``parent_id``, which is
exactly how ES routes parent-child documents to one shard — a cluster
deployment would bucket the store by ``parent_id`` so the child count
never crosses executors.  The nested query is a pure doc-values
predicate: pair it with a term match (the registry row does) so the
postings prune first; a standalone nested filter degenerates to a
doc-values scan, same as any ES query without an indexed leg.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _matched_docstats, _read_search_store, analyze_store_terms

_CMP = {
    "eq": lambda c, v: c == v,
    "gte": lambda c, v: c >= v,
    "gt": lambda c, v: c > v,
    "lte": lambda c, v: c <= v,
    "lt": lambda c, v: c < v,
}


def _element_pred(conditions: Sequence[tuple]):
    """Compile ``(subfield, op, value)`` triples into one per-element
    lambda — ALL conditions on the SAME element, the nested
    semantics."""
    if not conditions:
        raise ValueError("nested query needs at least one condition")
    for _f, op, _v in conditions:
        if op not in _CMP:
            raise ValueError(
                f"unknown nested condition op {op!r}; have {sorted(_CMP)}"
            )

    def pred(x: Column) -> Column:
        out = None
        for fld, op, val in conditions:
            c = _CMP[op](x[fld], F.lit(val))
            out = c if out is None else (out & c)
        return out

    return pred


def nested_query_over_store(
    spark,
    store_path: str,
    terms: Sequence[str],
    nested_field: str,
    conditions: Sequence[tuple],
) -> DataFrame:
    """ES ``bool(match(terms), nested(conditions))``: docs matching
    ANY of ``terms`` that hold at least one ``nested_field`` element
    satisfying ALL ``conditions`` — conditions are ``(subfield, op,
    value)`` with op in eq/gte/gt/lte/lt.  Output ``(doc, n_hits)``
    where ``n_hits`` counts the matching elements (ES ``inner_hits``
    cardinality), matched docs only."""
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame([], "doc string, n_hits long")
    pred = _element_pred(conditions)
    hits = F.size(F.filter(F.col(nested_field), pred))
    return (
        stats.select("doc", hits.cast("long").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy("doc")
    )


def has_child_over_store(
    spark,
    store_path: str,
    child_terms: Sequence[str],
    min_children: int = 1,
    join_col: str = "join_name",
    parent_col: str = "parent_id",
    parent_name: str = "parent",
) -> DataFrame:
    """ES ``has_child``: parent docs (``join_col == parent_name``)
    with at least ``min_children`` children matching ``child_terms``.
    Output: the parent docstats rows (stored fields included) plus
    ``n_children``.  One token-pruned child match, a parent-keyed
    aggregate, an equi-join to parents — the qualifying-parents side
    is a filtered aggregate, so Spark/AQE broadcasts it when small,
    the ES shard-routing analogue."""
    terms = analyze_store_terms(spark, store_path, child_terms)
    postings, docstats = _read_search_store(spark, store_path)
    if postings is None or docstats is None:
        return spark.createDataFrame([], "doc string, n_children long")
    matched = (
        postings.filter(F.col("token").isin(*list(terms)))
        .select("doc")
        .distinct()
    )
    child_counts = (
        docstats.join(matched, "doc", "left_semi")
        .filter(F.col(join_col) != parent_name)
        .filter(F.col(parent_col).isNotNull())
        .groupBy(parent_col)
        .agg(F.count("*").alias("n_children"))
        .filter(F.col("n_children") >= int(min_children))
    )
    parents = docstats.filter(F.col(join_col) == parent_name)
    stored = [
        c
        for c in parents.columns
        if c not in ("doc", "dl", "sig", "gen", "deleted",
                     join_col, parent_col)
    ]
    # both sides derive from the one docstats frame — alias to keep
    # the self-join unambiguous
    counts = child_counts.select(
        F.col(parent_col).alias("__pid"), "n_children"
    )
    return (
        parents.alias("p")
        .join(counts, F.col("p.doc") == F.col("__pid"), "inner")
        .select(
            F.col("p.doc").alias("doc"),
            *[F.col(f"p.{c}").alias(c) for c in stored],
            F.col("n_children").cast("long").alias("n_children"),
        )
        .orderBy("doc")
    )


def has_parent_over_store(
    spark,
    store_path: str,
    parent_terms: Sequence[str],
    join_col: str = "join_name",
    parent_col: str = "parent_id",
    parent_name: str = "parent",
) -> DataFrame:
    """ES ``has_parent``: child docs whose PARENT matches
    ``parent_terms``.  Output: the child docstats rows (stored fields
    included) plus their ``parent_id``.  The matched-parent id set is
    a filtered parent subset — explicitly broadcast against the
    children, the ES routing analogue."""
    terms = analyze_store_terms(spark, store_path, parent_terms)
    postings, docstats = _read_search_store(spark, store_path)
    if postings is None or docstats is None:
        return spark.createDataFrame([], "doc string")
    matched = (
        postings.filter(F.col("token").isin(*list(terms)))
        .select("doc")
        .distinct()
    )
    parent_ids = (
        docstats.filter(F.col(join_col) == parent_name)
        .join(matched, "doc", "left_semi")
        .select(F.col("doc").alias("__pid"))
    )
    children = docstats.filter(F.col(join_col) != parent_name)
    stored = [
        c
        for c in children.columns
        if c not in ("doc", "dl", "sig", "gen", "deleted",
                     join_col, parent_col)
    ]
    return (
        children.alias("k")
        .join(
            F.broadcast(parent_ids),
            F.col(f"k.{parent_col}") == F.col("__pid"),
            "left_semi",
        )
        .select(
            F.col("k.doc").alias("doc"),
            F.col(f"k.{parent_col}").alias(parent_col),
            *[F.col(f"k.{c}").alias(c) for c in stored],
        )
        .orderBy("doc")
    )
