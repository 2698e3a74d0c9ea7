"""Query-driven index mutations — the ES maintenance triad
``_update_by_query`` / ``_delete_by_query`` / ``_reindex`` served
against the incremental BM25 store.

ES can offer these because every index stores ``_source``; the store
mirrors that as a stored-field convention: build the index with the
text column duplicated into a stored field named ``_source``
(``field_cols=[..., "_source"]``).  The operators here require it and
raise a clear error when it is absent.

All three run through the store's existing MVCC machinery
(:func:`..text.apply_cdc_to_bm25_index` generation folds /
:func:`..text.incremental_bm25_index` insert folds), so they inherit
its guarantees for free: crash-retry converges (params-first write
order, fresh generations), replays skip via the whole-doc noop check,
and compaction reclaims the superseded rows.  Per-call work is ∝
matched docs + their tokens — the token-pruned match finds the doc
set, never a corpus rewrite (that is ``compact_bm25_store``'s job).

Scale shape at 100 TB: ES's own _update_by_query is a scroll +
per-doc bulk reindex — linear in matched docs, same as here; the
win of the Spark form is that the "scroll" is a distributed
token-pruned scan and the re-fold is one batch, not millions of
round-trips.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import (
    _matched_docstats,
    _read_search_store,
    _store_params_row,
    apply_cdc_to_bm25_index,
    incremental_bm25_index,
)


def _store_fields(spark, store_path: str) -> list[str]:
    p = _store_params_row(spark, store_path)
    if p is None:
        raise ValueError(f"no search store at {store_path}")
    return list(p.get("fields") or [])


def _require_source(fields: list[str], op: str) -> None:
    if "_source" not in fields:
        raise ValueError(
            f"{op} needs the store built with a '_source' stored "
            "field (field_cols=[..., '_source'] carrying the text) — "
            "without stored source there is nothing to re-index from, "
            f"same as ES with _source disabled; store has {fields}"
        )


def delete_by_query(
    spark, store_path: str, terms, match_all: bool = False
) -> DataFrame:
    """ES ``_delete_by_query``: tombstone every live doc matching ANY
    of ``terms`` through the CDC fold (new-generation tombstones, not
    a rewrite).  Returns the applied ``(doc, op, gen)`` rows — rerun
    on the same store and it returns empty, already-dead docs are
    delete replays.  ``match_all=True`` ignores ``terms`` and deletes
    every live doc (the ES match_all body)."""
    fields = _store_fields(spark, store_path)
    if match_all:
        _p, stats = _read_search_store(spark, store_path)
        if stats is None:
            return spark.createDataFrame(
                [], "doc string, op string, gen long"
            )
    else:
        stats = _matched_docstats(spark, store_path, terms)
        if stats is None:
            return spark.createDataFrame(
                [], "doc string, op string, gen long"
            )
    batch = stats.select(
        F.col("doc").alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
        F.lit("d").alias("op"),
        # tombstones carry the doc's current stored fields — the
        # fold's docstats schema is store-wide
        *[F.col(f) for f in fields],
    )
    return apply_cdc_to_bm25_index(
        spark, batch, store_path, field_cols=fields
    )


def update_by_query(
    spark,
    store_path: str,
    terms,
    script: Mapping[str, Column],
) -> DataFrame:
    """ES ``_update_by_query``: re-index every live doc matching ANY
    of ``terms`` after applying ``script`` — a mapping of column name
    → Column expression evaluated over the doc's stored state
    (``_source`` is the text; stored fields by name).  A script may
    rewrite ``_source`` itself (text change → postings re-derive) or
    only stored fields (the fold's whole-doc noop check still applies
    it).  Docs the script leaves byte-identical are noops and skip —
    exactly ES's ``noop`` counter.  Returns the applied ``(doc, op,
    gen)`` rows."""
    fields = _store_fields(spark, store_path)
    _require_source(fields, "update_by_query")
    bad = sorted(set(script) - set(fields))
    if bad:
        raise ValueError(
            f"update_by_query script writes non-stored columns {bad}; "
            f"store fields are {fields}"
        )
    stats = _matched_docstats(spark, store_path, terms)
    if stats is None:
        return spark.createDataFrame(
            [], "doc string, op string, gen long"
        )
    updated = stats
    for name, expr in script.items():
        updated = updated.withColumn(name, expr)
    batch = updated.select(
        F.col("doc").alias("doc_id"),
        # the re-indexed text IS the (possibly rewritten) source
        F.col("_source").alias("text"),
        F.lit("u").alias("op"),
        *[F.col(f) for f in fields],
    )
    return apply_cdc_to_bm25_index(
        spark, batch, store_path, field_cols=fields
    )


def reindex_store(
    spark,
    src_store: str,
    dst_store: str,
    analyzer: str | None = None,
    script: Mapping[str, Column] | None = None,
) -> int:
    """ES ``_reindex``: read every live doc of ``src_store`` from its
    stored ``_source``, optionally transform (``script``, same shape
    as :func:`update_by_query`), and fold into ``dst_store`` — which
    may declare a DIFFERENT analyzer (the canonical reindex motive:
    re-analyze the corpus under a new chain without touching the
    source of truth).  Pair with the sink's alias-swap cutover to
    retarget readers atomically.  Returns the number of docs
    indexed."""
    fields = _store_fields(spark, src_store)
    _require_source(fields, "reindex_store")
    _p, stats = _read_search_store(spark, src_store)
    if stats is None:
        return 0
    docs = stats
    if script:
        bad = sorted(set(script) - set(fields))
        if bad:
            raise ValueError(
                f"reindex script writes non-stored columns {bad}; "
                f"store fields are {fields}"
            )
        for name, expr in script.items():
            docs = docs.withColumn(name, expr)
    batch = docs.select(
        F.col("doc").alias("doc_id"),
        F.col("_source").alias("text"),
        *[F.col(f) for f in fields],
    )
    out = incremental_bm25_index(
        spark, batch, dst_store,
        field_cols=fields, analyzer=analyzer,
    )
    return out.count()
