"""The query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle returning identical columns.

This is the driver-facing correctness surface (``__spark_entry__.py``
derives ``queries()`` and ``oracle_sql()`` from ``REGISTRY``).  Keys
map to SURVEY §2 operator ids.

Conventions that keep the cross-engine hash compare honest:
* every computed column is aliased identically in Spark and SQL;
* timestamps are normalized to epoch-millisecond BIGINTs on both sides
  (events.ts is read as nanosecond longs, see sources/tables.py);
* floats are rounded where engine-order could perturb the last ulp.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import Task
from .operators.compaction import compact_events
from .plans.scan import scan_mapped_frame
from .sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# --------------------------------------------------------------------
# The synthetic CDC feed: the `events` table viewed as an oplog.
# signup -> insert, error -> delete, click/view/purchase -> update;
# the key is user_id, the mapped payload is `value`.
# --------------------------------------------------------------------

_OPLOG_SQL = """
    SELECT user_id,
           epoch_ms(ts)::BIGINT AS ts_ms,
           event_id,
           CASE event_type WHEN 'signup' THEN 'i'
                           WHEN 'error'  THEN 'd'
                           ELSE 'u' END AS op,
           value
    FROM events
"""


def events_as_oplog(
    spark: SparkSession, sf_dir: str, max_ts_ms: Optional[int] = None
) -> DataFrame:
    # the bound is applied inside load_table on the RAW scan column
    # (type-matched literal, pre-normalization) so it reaches
    # PushedFilters; the exact derived-column filter is re-applied
    # downstream by the consumer
    max_ts_ns = None if max_ts_ms is None else (max_ts_ms + 1) * 1_000_000 - 1
    ev = load_table(spark, sf_dir, "events", max_event_ts_ns=max_ts_ns)
    return ev.select(
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_id",
        F.when(F.col("event_type") == "signup", "i")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
        "value",
    )


# --------------------------------------------------------------------
# S1/F1/T1 — collection scan + projection + field-mapping transform
# (reference: src/mongodb.ts:33-42, src/processor.ts:51-89)
# --------------------------------------------------------------------

_CUSTOMER_TASK = Task(
    {
        "extract": {"db": "tpch", "collection": "customer"},
        "transform": {
            "mapping": {
                "c_name": "name",
                "c_acctbal": "balance",
                "c_mktsegment": "segment",
            },
            "static": {"kind": "customer"},
        },
        "load": {"index": "customer", "type": "doc"},
    }
)


@register(
    "scan_mapping",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS _id,
           'customer' AS kind,
           c_name AS name,
           c_acctbal AS balance,
           c_mktsegment AS segment
    FROM customer
    """,
)
def scan_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return scan_mapped_frame(df, _CUSTOMER_TASK, id_column="c_custkey")


# --------------------------------------------------------------------
# F2 — scan resume predicate (_id >= checkpoint), pushed to the scan
# (reference: src/mongodb.ts:35-39)
# --------------------------------------------------------------------


@register(
    "scan_resume",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS _id,
           'customer' AS kind,
           c_name AS name,
           c_acctbal AS balance,
           c_mktsegment AS segment
    FROM customer WHERE c_custkey >= 100
    """,
)
def scan_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return scan_mapped_frame(df, _CUSTOMER_TASK, id_column="c_custkey", resume_id=100)


# --------------------------------------------------------------------
# F3 — oplog namespace/ts/fromMigrate predicates
# (reference: src/mongodb.ts:46-54)
# --------------------------------------------------------------------


@register(
    "oplog_filter",
    """
    SELECT event_id, user_id, epoch_ms(ts)::BIGINT AS ts_ms, value
    FROM events
    WHERE event_type = 'purchase' AND epoch_ms(ts) >= 1704067200000
    """,
)
def oplog_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_ms = F.expr("ts div 1000000")  # integer div: ns longs exceed double mantissa
    return (
        ev.filter((F.col("event_type") == "purchase") & (ts_ms >= 1704067200000))
        .select("event_id", "user_id", ts_ms.alias("ts_ms"), "value")
    )


# --------------------------------------------------------------------
# F4 — update-relevance filter (ignoreUpdate): drop update events that
# touch no mapped field (reference: src/processor.ts:123-132).  Here
# the "touched field index" is props.k and fields 0..49 are mapped.
# --------------------------------------------------------------------


@register(
    "update_relevance_filter",
    """
    SELECT event_id, user_id, json_extract(props, '$.k')::BIGINT AS touched
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
      AND json_extract(props, '$.k')::BIGINT < 50
    """,
)
def update_relevance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    touched = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .filter(touched < 50)
        .select("event_id", "user_id", touched.alias("touched"))
    )


# --------------------------------------------------------------------
# J1/J3 — batched point-lookup as a per-batch equi-join (reference's
# hand-rolled id-buffering at src/elasticsearch.ts:91-148 /
# src/mongodb.ts:61-104 is subsumed by a broadcast left join)
# --------------------------------------------------------------------


@register(
    "lookup_join",
    """
    SELECT e.event_id, e.user_id, c.c_name AS name,
           epoch_ms(e.ts)::BIGINT AS ts_ms
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type IN ('click', 'view', 'purchase')
    """,
)
def lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("name")
    )
    # the lookup side is small relative to the stream batch: broadcast
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "left"
    )
    return joined.select(
        "event_id",
        "user_id",
        "name",
        F.expr("ts div 1000000").alias("ts_ms"),
    )


# --------------------------------------------------------------------
# A1 — per-key CDC event compaction (the flagship operator)
# (reference: src/processor.ts:260-297; declarative re-derivation in
# operators/compaction.py)
# --------------------------------------------------------------------


_COMPACT_CTES = f"""
    oplog AS ({_OPLOG_SQL}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn
        FROM oplog
    ),
    last_ev AS (
        SELECT user_id, ts_ms, op, value FROM ranked WHERE rn = 1
    ),
    prev_nu AS (
        SELECT user_id, op AS prev_op FROM (
            SELECT user_id, op, row_number() OVER (
                PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn2
            FROM ranked WHERE op <> 'u' AND rn > 1
        ) t WHERE rn2 = 1
    ),
    compacted AS (
        SELECT l.user_id,
               CASE WHEN l.op = 'u' AND COALESCE(p.prev_op, '') = 'i'
                    THEN 'i' ELSE l.op END AS op,
               CASE WHEN l.op = 'd' THEN NULL ELSE l.value END AS value,
               l.ts_ms
        FROM last_ev l LEFT JOIN prev_nu p USING (user_id)
        WHERE NOT (l.op = 'd' AND COALESCE(p.prev_op, '') = 'i')
    )
"""


@register(
    "cdc_compaction",
    f"""
    WITH {_COMPACT_CTES}
    SELECT user_id, op, value, ts_ms FROM compacted
    """,
)
def cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    oplog = events_as_oplog(spark, sf_dir)
    out = compact_events(
        oplog,
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    )
    return out.select("user_id", "op", "value", "ts_ms")


@register(
    "events_rate_anomaly",
    """
    WITH c AS (
        SELECT event_type, epoch_ms(ts) // 3600000 AS bucket,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
        FROM c GROUP BY 1
    )
    SELECT event_type, bucket, n,
           floor((n - mu) / sigma * 1000000) / 1000000 AS z
    FROM c JOIN s USING (event_type)
    WHERE sigma > 0
      AND abs(floor((n - mu) / sigma * 1000000) / 1000000) >= 3.0
    """,
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly monitor (operators/sessions.rate_anomalies):
    hourly per-type counts z-scored against the type's own history,
    |z| >= 3 flagged — the replay-storm / source-outage detector a
    CDC pipeline runs continuously."""
    from .operators.sessions import rate_anomalies

    ev = load_table(spark, sf_dir, "events").select(
        # integer div: ts is epoch-ns and exceeds double's exact range
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
    )
    return rate_anomalies(ev, "ts_ms", "event_type")


@register(
    "cdc_checkpoint_replay",
    f"""
    WITH {_COMPACT_CTES}
    SELECT user_id, op, value, ts_ms FROM compacted
    """,
)
def cdc_checkpoint_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpoint-restart invariant, cross-engine-checked:
    compacting a time-prefix, persisting its survivors, then
    compacting (survivors ∪ suffix) must equal one full-feed
    compaction — the property that makes the reference's scan-then-
    tail phasing (and any micro-batch restart) sound.  The oracle is
    the SINGLE-pass compaction; the Spark side runs the TWO-stage
    resume.  Note the algebra is associative only under time-ordered
    splits — arbitrary (salted) splits are unsound, see
    operators/compaction.py.
    """
    oplog = events_as_oplog(spark, sf_dir)
    mm = oplog.agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")
    ).first()
    mid = (int(mm["mn"]) + int(mm["mx"])) // 2
    cols = ["user_id", "ts_ms", "event_id", "op", "value"]
    kw = dict(
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    )
    prefix_survivors = compact_events(
        oplog.filter(F.col("ts_ms") <= mid), **kw
    )
    resumed = prefix_survivors.select(*cols).unionByName(
        oplog.filter(F.col("ts_ms") > mid).select(*cols)
    )
    return compact_events(resumed, **kw).select(
        "user_id", "op", "value", "ts_ms"
    )


# --------------------------------------------------------------------
# T2 — delete transform: op='d' events as IRDelete rows
# (reference: src/processor.ts:57-64)
# --------------------------------------------------------------------


@register(
    "delete_transform",
    f"""
    WITH oplog AS ({_OPLOG_SQL})
    SELECT 'delete' AS action, CAST(user_id AS VARCHAR) AS id, ts_ms
    FROM oplog WHERE op = 'd'
    """,
)
def delete_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    oplog = events_as_oplog(spark, sf_dir)
    return oplog.filter(F.col("op") == "d").select(
        F.lit("delete").alias("action"),
        F.col("user_id").cast("string").alias("id"),
        "ts_ms",
    )


# --------------------------------------------------------------------
# J2 — parent-routed delete lookup: a delete with `_parent` routing
# needs the parent value fetched from the stored copy
# (reference: src/elasticsearch.ts:30-89, src/processor.ts:210-216)
# --------------------------------------------------------------------


@register(
    "parent_lookup_delete",
    f"""
    WITH oplog AS ({_OPLOG_SQL})
    SELECT 'delete' AS action,
           CAST(o.user_id AS VARCHAR) AS id,
           CAST(c.c_nationkey AS VARCHAR) AS parent,
           o.ts_ms
    FROM oplog o JOIN customer c ON o.user_id = c.c_custkey
    WHERE o.op = 'd'
    """,
)
def parent_lookup_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    deletes = events_as_oplog(spark, sf_dir).filter(F.col("op") == "d")
    stored = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("string").alias("parent")
    )
    # the stored-copy lookup is a broadcast equi-join — the set-oriented
    # replacement for the reference's per-id terms-search batcher
    return (
        deletes.join(F.broadcast(stored), deletes.user_id == stored.c_custkey)
        .select(
            F.lit("delete").alias("action"),
            F.col("user_id").cast("string").alias("id"),
            "parent",
            "ts_ms",
        )
    )


# --------------------------------------------------------------------
# C5 + T1–T5 + A1 — full-pipeline materialization: scan-phase base
# state overlaid with a compacted CDC batch via the event-dispatch
# algebra (reference: src/processor.ts:171-223).  The flagship
# end-to-end batch query: insert replaces the doc, update patches the
# stored copy ($set on the mapped field), update-without-base drops
# (both lookups miss), delete removes, untouched keys pass through.
# --------------------------------------------------------------------


@register(
    "cdc_materialize",
    f"""
    WITH {_COMPACT_CTES},
    base AS (
        SELECT c_custkey AS k,
               CAST(c_custkey AS VARCHAR) AS _id,
               c_name AS name,
               c_acctbal AS balance,
               c_mktsegment AS segment
        FROM customer
    )
    SELECT COALESCE(b._id, CAST(c.user_id AS VARCHAR)) AS _id,
           CASE WHEN c.op = 'i' THEN NULL ELSE b.name END AS name,
           CASE WHEN c.op IN ('i', 'u') THEN c.value ELSE b.balance END
               AS balance,
           CASE WHEN c.op = 'i' THEN NULL ELSE b.segment END AS segment
    FROM base b FULL OUTER JOIN compacted c ON b.k = c.user_id
    WHERE (c.op IS NULL OR c.op <> 'd')
      AND NOT (c.op = 'u' AND b.k IS NULL)
    """,
)
def cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = compact_events(
        events_as_oplog(spark, sf_dir),
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    ).select("user_id", "op", "value")
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_custkey").cast("string").alias("_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    op = F.col("op")
    joined = base.join(comp, base.k == comp.user_id, "full_outer")
    return (
        joined
        # dispatch algebra: 'd' removes; 'u' with no stored/source copy
        # drops (both lookup paths miss); everything else survives
        .filter(op.isNull() | (op != "d"))
        .filter(~((op == "u") & F.col("k").isNull()).eqNullSafe(True))
        .select(
            F.coalesce(F.col("_id"), F.col("user_id").cast("string")).alias("_id"),
            F.when(op == "i", F.lit(None)).otherwise(F.col("name")).alias("name"),
            F.when(op.isin("i", "u"), F.col("value"))
            .otherwise(F.col("balance"))
            .alias("balance"),
            F.when(op == "i", F.lit(None))
            .otherwise(F.col("segment"))
            .alias("segment"),
        )
    )


# --------------------------------------------------------------------
# L1 — bulk-sink action rows: the ES `_bulk` body as a DataFrame
# (`index` action per upsert, `delete` action per delete)
# (reference: src/processor.ts:229-256)
# --------------------------------------------------------------------


@register(
    "bulk_actions",
    f"""
    WITH {_COMPACT_CTES}
    SELECT CASE WHEN op = 'd' THEN 'delete' ELSE 'index' END AS bulk_op,
           'customer' AS _index,
           CAST(user_id AS VARCHAR) AS _id,
           value,
           ts_ms
    FROM compacted
    """,
)
def bulk_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = compact_events(
        events_as_oplog(spark, sf_dir),
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    )
    return comp.select(
        F.when(F.col("op") == "d", "delete").otherwise("index").alias("bulk_op"),
        F.lit("customer").alias("_index"),
        F.col("user_id").cast("string").alias("_id"),
        "value",
        "ts_ms",
    )


# The driver's correctness gate checks the FIRST 50 entries of the
# queries() dict.  _export_order() now rotates the window
# AUTOMATICALLY from the CORRECTNESS_r*.json records at the repo
# root: never-driver-checked names export first, then
# oldest-checked — so every round's 50 slots go to the stalest
# formal records without manual list surgery (the r5/r6 windows
# being byte-identical was a two-round process failure this
# removes).  _DRIVER_PRIORITY survives as the TIE-BREAK within a
# staleness class: names listed here outrank unlisted ones checked
# in the same round, letting a round steer same-staleness slots
# toward the families its code changes touched.
_DRIVER_PRIORITY = [
    # --- round-7 rotation ------------------------------------------------
    # The r5 and r6 driver windows were byte-identical, leaving 65 of the
    # 115 registry queries with no driver row in either round.  This list
    # now leads with exactly those 65 never-checked names, ordered so the
    # queries over files touched by the post-r5 review-fix commit 31d1305
    # (similarity/profile/text) fall inside the driver's 50-slot window;
    # the overflow tail (multimodal/events/cdc, untouched since r3-r4 and
    # pytest-covered) rotates into the r8 window.  New round-7
    # registrations are inserted at the very top so their first driver
    # check happens the round they land.
    # round-7 registrations (new code this round)
    "streaming_substring_dedup",
    "dedup_components_incremental",
    "text_bpe_overlap",
    "streaming_components",
    "dedup_embedding_weighted",
    # similarity/embedding family (31d1305 touched similarity.py)
    "similarity_knn_graph",
    "embedding_knn_classify",
    "dedup_semantic",
    "embedding_whiten",
    # profile/table family (31d1305 touched profile.py)
    "table_profile",
    "table_quantiles",
    "table_skew_profile",
    "corpus_sketch_stats",
    "dedup_cluster_stats",
    # text family (31d1305 touched text.py)
    "text_token_count",
    "text_token_count_bpe",
    "text_quality",
    "text_lang_id",
    "text_bm25_search",
    "text_sample_stratified",
    "text_frequent_tokens",
    "text_corpus_overlap",
    "text_corpus_shuffle",
    "text_unigram_xent",
    "text_bigram_xent",
    "text_fertility",
    "text_train_split",
    "text_split_cluster_safe",
    "text_corpus_stats",
    "text_pack_sequences",
    "text_vocabulary",
    "text_fingerprint",
    "text_repetition",
    "text_contamination",
    "text_rare_bigrams",
    "text_domain_mix",
    "text_chunk",
    "text_corpus_rollup",
    "text_idf_keywords",
    "text_quality_classify",
    "text_bpe_encode",
    "text_bpe_train",
    "text_span_dedup",
    "text_source_cap",
    "text_scrub",
    "text_importance_sample",
    "text_quality_rank",
    "text_ngram_novelty",
    # plan-contract / streaming queries never driver-checked
    "salted_skew_join",
    "bucketed_colocated_join",
    "streaming_heavy_hitters",
    "corpus_diff",
    # events/cdc fill to the 50-slot window edge
    "events_sessionize",
    "events_funnel",
    "events_retention",
    "cdc_full_replace",
    # --- overflow tail: rotates into the r8 window -----------------------
    "events_trailing_features",
    "events_transitions",
    "events_asof_join",
    "events_window_join",
    "streaming_transitions",
    "cdc_scd2",
    "cdc_snapshot_at",
    "multimodal_dedup",
    "multimodal_metadata",
    "multimodal_frame_sample",
    "multimodal_features",
    "multimodal_near_dup",
    "multimodal_frame_overlap",
    "multimodal_cdc_chunks",
]


def _driver_row_history() -> dict[str, int]:
    """name -> most recent round with a driver correctness row, read
    from the ``CORRECTNESS_r*.json`` records the round driver leaves
    at the repo root.  Unreadable or non-dict files are skipped; no
    files at all yields an empty history (priority-list fallback)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            hist[name] = max(hist.get(name, -1), rnd)
    return hist


# Names whose implementation or oracle changed AFTER their last
# driver row: forced to the head of the export window until the
# driver re-hashes them in the given round (or later), then they
# rejoin normal staleness rotation — the one case pure staleness
# ordering cannot see (a name whose FIX landed after its last driver
# row; it must outrank plain staleness until a post-fix round checks
# it).  r11 delivered search_pipeline_agg's fresh green hash, so the
# map is empty again; add entries as {name: first_ok_round} when a
# fix lands between driver windows.
_FORCE_RECHECK: dict[str, int] = {}


def _export_order() -> list[str]:
    """Driver-facing iteration order, self-rotating staleness-first:
    the driver records correctness rows for only the FIRST 50
    exported queries, so never-driver-checked names export first,
    then oldest-checked — except ``_FORCE_RECHECK`` names still
    awaiting their post-fix driver row, which outrank everything.
    Ties (same last-checked round) break to the manual
    ``_DRIVER_PRIORITY`` curation, then registration order.
    Deterministic for a given set of record files."""
    hist = _driver_row_history()
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    reg = {n: i for i, n in enumerate(REGISTRY)}

    def cls(n: str) -> int:
        want = _FORCE_RECHECK.get(n)
        if want is not None and hist.get(n, -1) < want:
            return -2
        return hist.get(n, -1)

    return sorted(
        REGISTRY,
        key=lambda n: (cls(n), prio.get(n, len(prio)), reg[n]),
    )


def _verdict_frame(spark: SparkSession, cols) -> DataFrame:
    """One-row verdict frame built JVM-side.  ``cols`` is a list of
    ``(name, value, sql_type)``.  createDataFrame's local-data path
    evaluates through a Python RDD (one partition per default-
    parallelism slice, each needing a Python worker round-trip) and
    costs whole seconds per downstream action; range+lit never leaves
    the JVM."""
    return spark.range(1).select(
        *[F.lit(v).cast(t).alias(n) for n, v, t in cols]
    )


def _unrolled_cosines(vec_col: str, centers) -> list:
    """Cosine of ``vec_col`` (array<double>) against each center row,
    as UNROLLED whole-stage-codegen expressions (d*k multiply-adds
    sharing one norm).  aggregate/zip_with HOF lambdas evaluate
    interpreted per element — measured ~2x slower on the 200k-vector
    k-means certification (the quantize lesson) — so every
    certification pass shares this one builder.  Centers re-normalize
    driver-side; the row norm floors at 1e-12."""
    import numpy as _np

    C = [_np.asarray(c, dtype=float) for c in centers]
    C = [c / max(float(_np.linalg.norm(c)), 1e-12) for c in C]
    d = len(C[0])
    # built as ONE generated SQL string per center and parsed once:
    # the previous Column-by-Column construction issued ~4 py4j
    # round-trips per multiply-add (d*k + d of them — several
    # thousand driver calls per certification pass) before Catalyst
    # ever saw the tree.  The parsed plan is term-for-term identical
    # (same left-associated add chain, same literals via repr
    # round-trip), so results are bit-identical.
    el = [f"element_at({vec_col}, {i + 1})" for i in range(d)]
    sq = " + ".join(f"{e} * {e}" for e in el)
    norm = f"greatest(sqrt({sq}), 1e-12D)"
    outs = []
    for c in C:
        acc = " + ".join(
            f"{el[i]} * {float(c[i])!r}D" for i in range(d)
        )
        outs.append(F.expr(f"({acc}) / {norm}"))
    return outs


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name][0] for name in _export_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1].strip()
        for name in _export_order()
        if REGISTRY[name][1] is not None
    }


# ====================================================================
# Training-data extensions (SURVEY §7 step 9 — no reference
# counterpart; greenfield Spark operators)
# ====================================================================

from .operators.dedup import (  # noqa: E402
    containment_pairs,
    cross_embedding_pairs,
    cross_minhash_pairs,
    dedup_components,
    drop_near_duplicates,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dedup,
    exact_dedup_weighted,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .operators.multimodal import (  # noqa: E402
    attach_payload,
    byte_histogram_features,
    fake_decode_metadata,
    fake_frame_sample,
)
from .operators.similarity import (  # noqa: E402
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    knn_graph,
    quantize_embeddings,
)
from .operators.text import (  # noqa: E402
    BPE_SPLIT_PATTERN,
    bm25_search,
    bpe_token_count_col,
    chunk_documents,
    contamination,
    temperature_sample,
    fingerprint_col,
    language_id,
    pack_sequences,
    quality_features,
    repetition_features,
    rrf_fuse,
    stratified_sample,
    substring_dedup,
    token_count_col,
    vocabulary,
)

_JACCARD_ORACLE = """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, len(w) - 1)])) AS s
        FROM w
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard
    FROM shared
    JOIN counts ca ON i = ca.doc_id
    JOIN counts cb ON j = cb.doc_id
    WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.8
"""


@register(
    "dedup_exact",
    """
    SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], "doc_id")


@register(
    "dedup_exact_weighted",
    """
    SELECT min(doc_id) AS doc_id, text, count(*) AS multiplicity
    FROM documents GROUP BY text
    """,
)
def dedup_exact_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_weighted(docs, ["text"], "doc_id")


@register(
    "dedup_drop_near_duplicates",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w.comp FROM edges e JOIN walk w ON e.b = w.doc
    ),
    losers AS (
        SELECT doc FROM walk GROUP BY doc HAVING doc <> min(comp)
    )
    SELECT d.doc_id, d.lang, d.text
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc
    WHERE l.doc IS NULL
    """,
)
def dedup_drop_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return drop_near_duplicates(docs, "doc_id", "text", n=3, threshold=0.8)


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "dedup_containment",
    """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, len(w) - 1)])) AS s
        FROM w
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(shared::DOUBLE / least(ca.n, cb.n), 6) AS containment
    FROM shared
    JOIN counts ca ON i = ca.doc_id
    JOIN counts cb ON j = cb.doc_id
    WHERE round(shared::DOUBLE / least(ca.n, cb.n), 6) >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection: max-direction shingle containment
    ``|Si ∩ Sj| / min(|Si|,|Sj|)`` catches quote/excerpt/expansion
    pairs that Jaccard under-scores (a passage embedded in a 10x
    longer doc has Jaccard ~0.1 but containment 1.0).  Same posting
    self-join scale shape as ``dedup_ngram_jaccard``."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@register("dedup_minhash_lsh", _JACCARD_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-verified LSH: output equals the brute-force oracle as long
    # as banding recall holds (miss prob (1-0.8^2)^16 ~ 1e-7)
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "dedup_cross_corpus",
    """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, len(w) - 1)])) AS s
        FROM w
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard
    FROM shared
    JOIN counts ca ON i = ca.doc_id
    JOIN counts cb ON j = cb.doc_id
    WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.8
    """,
)
def dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy train-vs-benchmark decontamination: the corpus hash-split
    into a 90% "train" and 10% "benchmark" side, near-dup pairs
    ACROSS the split by MinHash-LSH + exact Jaccard verify.  The
    benchmark side's band/shingle frames broadcast (map-side candidate
    generation; the train side is never shuffled for it)."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    return cross_minhash_pairs(
        train, bench, "doc_id", "text", n=3, threshold=0.8
    )


@register(
    "dedup_cross_semantic",
    """
    SELECT count(*)::BIGINT AS n_exact_pairs,
           true AS subset_ok,
           true AS recall_ok
    FROM embeddings a JOIN embeddings b
      ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
     AND a.vec_id <> b.vec_id
    WHERE round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
    """,
)
def dedup_cross_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train-vs-benchmark decontamination, hard-checked: the
    embeddings table hash-split into a 90% "train" and 10% "benchmark"
    side, cross-corpus cosine near-dups by hyperplane-LSH + exact
    cosine verify (``cross_minhash_pairs``'s embedding analogue).
    Oracle-pinnable assertions, ``dedup_embedding_lsh``'s shape:

    * ``n_exact_pairs``: the brute-force CROSS pair count, computed
      independently in Spark (blocked gram over the full corpus,
      filtered to split-crossing pairs) and DuckDB;
    * ``subset_ok``: every LSH cross pair is an exact cross pair with
      an identical cosine (precision = 1);
    * ``recall_ok``: recall vs the exact cross set >= 0.5 (measured
      1.0 at sf0.01 AND sf0.1 with dims=64 / 16 bits / 4-bit bands —
      the split-crossing exact pairs are few and high-cosine, so every
      one collides in some band).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 10 != 0)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    lsh = cross_embedding_pairs(
        train, bench, "vec_id", "embedding", dims=64, threshold=0.45
    )
    # exact leg: the scale-sound blocked gram over the WHOLE corpus,
    # reduced to split-crossing pairs and re-oriented train->bench
    # (embedding_dup_pairs canonicalizes i<j; sides here keep their
    # own id spaces)
    full = embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    exact = full.filter(
        (F.col("i") % 10 == 0) != (F.col("j") % 10 == 0)
    ).select(
        F.when(F.col("i") % 10 != 0, F.col("i"))
        .otherwise(F.col("j"))
        .alias("i"),
        F.when(F.col("i") % 10 == 0, F.col("i"))
        .otherwise(F.col("j"))
        .alias("j"),
        "cosine",
    )
    joined = lsh.withColumnRenamed("cosine", "lsh_cosine").join(
        exact, ["i", "j"], "left"
    )
    checks = joined.agg(
        F.coalesce(
            F.bool_and(
                F.col("cosine").isNotNull()
                & (F.col("cosine") == F.col("lsh_cosine"))
            ),
            F.lit(True),
        ).alias("subset_ok"),
        F.coalesce(
            F.sum(F.when(F.col("cosine").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("__n_hit"),
    )
    totals = exact.agg(F.count("*").alias("n_exact_pairs"))
    return totals.crossJoin(checks).select(
        "n_exact_pairs",
        "subset_ok",
        (
            F.col("__n_hit").cast("double")
            / F.greatest(F.col("n_exact_pairs"), F.lit(1)).cast("double")
            >= F.lit(0.5)
        ).alias("recall_ok"),
    )


@register(
    "pipeline_decontaminate",
    """
    WITH train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ),
    bench AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
    ),
    tt AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM train
    ),
    tg AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
                              i -> array_to_string(toks[i:i+4], ' ')) AS grams
        FROM tt
    ),
    bt AS (
        SELECT CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM bench
    ),
    bg AS (
        SELECT DISTINCT
               unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 4, 0)),
                   i -> array_to_string(toks[i:i+4], ' '))) AS gram
        FROM bt
    ),
    exact_hits AS (
        SELECT DISTINCT e.doc_id
        FROM (SELECT doc_id, unnest(grams) AS gram FROM tg) e
        JOIN bg USING (gram)
    ),
    w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, len(w) - 1)])) AS s
        FROM w
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    lex_hits AS (
        SELECT DISTINCT i AS doc_id FROM (
            SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
            FROM sh a JOIN sh b ON a.s = b.s
            WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
            GROUP BY 1, 2
        ) p
        JOIN counts ca ON p.i = ca.doc_id
        JOIN counts cb ON p.j = cb.doc_id
        WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.8
    ),
    sem_hits AS (
        SELECT DISTINCT a.vec_id AS doc_id
        FROM embeddings a JOIN embeddings b
          ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
        WHERE round(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.9
    )
    SELECT t.doc_id,
           (e.doc_id IS NOT NULL) AS exact_hit,
           (l.doc_id IS NOT NULL) AS lexical_hit,
           (s.doc_id IS NOT NULL) AS semantic_hit,
           (e.doc_id IS NULL AND l.doc_id IS NULL AND s.doc_id IS NULL)
               AS keep
    FROM train t
    LEFT JOIN exact_hits e ON t.doc_id = e.doc_id
    LEFT JOIN lex_hits l ON t.doc_id = l.doc_id
    LEFT JOIN sem_hits s ON t.doc_id = s.doc_id
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed decontamination pass a training pipeline runs
    before every release: per TRAIN document, three independent
    leakage verdicts against the benchmark split and the final keep
    decision — the three operators this registry pins individually,
    composed end-to-end.

    * ``exact_hit`` — any word-5-gram collides with a benchmark gram
      (``contamination``: bench grams broadcast, one doc-keyed
      shuffle);
    * ``lexical_hit`` — MinHash-LSH 3-gram Jaccard >= 0.8 against any
      benchmark doc (``cross_minhash_pairs``: benchmark bands
      broadcast, train side never shuffles for candidates; the
      16-band/r=2 scheme's per-pair miss probability at t >= 0.8 is
      (1-0.64)^16 ~ 8e-8 — value-pinnable);
    * ``semantic_hit`` — embedding cosine >= 0.9 against any benchmark
      vector.  The EXACT blocked-gram leg (split-crossing filter of
      ``embedding_dup_pairs``): at 0.9 the hyperplane band scheme's
      per-pair miss is ~4.5%, too lossy for a value oracle — swap in
      ``cross_embedding_pairs`` (the `dedup_cross_semantic` scale
      path) when approximate recall is acceptable;
    * ``keep`` — no leg hit.

    The two flag frames are id-only and distinct (at most one row per
    train doc), so the final assembly is two broadcast-able left joins
    onto the contamination frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    cont = contamination(train, "doc_id", "text", bench, n=5).select(
        "doc_id", F.col("contaminated").alias("exact_hit")
    )
    lex = (
        cross_minhash_pairs(
            train, bench, "doc_id", "text", n=3, threshold=0.8
        )
        .select(F.col("i").alias("doc_id"))
        .distinct()
        .withColumn("__lx", F.lit(True))
    )
    sem = (
        embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.9)
        .filter((F.col("i") % 10 == 0) != (F.col("j") % 10 == 0))
        .select(
            F.when(F.col("i") % 10 != 0, F.col("i"))
            .otherwise(F.col("j"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("__sm", F.lit(True))
    )
    return (
        cont.join(F.broadcast(lex), "doc_id", "left")
        .join(F.broadcast(sem), "doc_id", "left")
        .select(
            "doc_id",
            "exact_hit",
            F.coalesce("__lx", F.lit(False)).alias("lexical_hit"),
            F.coalesce("__sm", F.lit(False)).alias("semantic_hit"),
            (
                ~(
                    F.col("exact_hit")
                    | F.coalesce("__lx", F.lit(False))
                    | F.coalesce("__sm", F.lit(False))
                )
            ).alias("keep"),
        )
    )


@register(
    "dedup_char_jaccard",
    """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [text[i:i+11] for i in range(1, length(text) - 10)]
               )) AS s
        FROM documents WHERE length(text) >= 12
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard
    FROM shared
    JOIN counts ca ON i = ca.doc_id
    JOIN counts cb ON j = cb.doc_id
    WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.7
    """,
)
def dedup_char_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-agnostic near-dup pairs: character-12-gram Jaccard
    (mode='char' on the shared shingle pipeline) — the form that works
    on unsegmented scripts where whitespace tokenization degenerates.
    Runs the LSH path (exact-verified, same output as brute force):
    char mode multiplies posting volume ~10x over word shingles, so
    the banded bucket join replaces the full posting self-join.

    Banding is widened to r=2, b=24 for this oracle-checked query: at
    the default r=2, b=16 a pair sitting exactly at threshold 0.7 is
    missed with probability (1-0.49)^16 ~ 2e-5 — enough for a rare
    cross-engine flake.  b=24 puts the miss at (1-0.49)^24 ~ 1e-7 —
    with the handful of near-threshold CROSS-GROUP pairs the test
    corpora actually contain (within-clone pairs bypass LSH entirely),
    the flake probability is ~1e-6 per full sweep.  The first widening
    (b=32, 5e-10) doubled the signature stage — 64 hash evaluations
    per char-12-gram posting, measured 7.0 s -> 15.0 s at sf0.1 — and
    bought 3 orders of magnitude nobody needs at oracle scale; b=24 is
    the measured-cost/assurance balance point."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        n=12,
        threshold=0.7,
        mode="char",
        num_hashes=48,
        bands=24,
    )


@register(
    "dedup_edit_distance",
    """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [text[i:i+11] for i in range(1, length(text) - 10)]
               )) AS s
        FROM documents WHERE length(text) >= 12
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT i, j FROM shared
        JOIN counts ca ON i = ca.doc_id
        JOIN counts cb ON j = cb.doc_id
        WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.7
    )
    SELECT c.i, c.j,
           levenshtein(a.text, b.text)::BIGINT AS dist,
           round(levenshtein(a.text, b.text)::DOUBLE
                 / greatest(length(a.text), length(b.text)), 6) AS ratio
    FROM cand c
    JOIN documents a ON c.i = a.doc_id
    JOIN documents b ON c.j = b.doc_id
    WHERE round(levenshtein(a.text, b.text)::DOUBLE
                / greatest(length(a.text), length(b.text)), 6) <= 0.2
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-verified fuzzy dedup pairs: char-12-gram Jaccard
    >= 0.7 candidates (the dedup_char_jaccard LSH path and its b=24
    recall argument) re-verified by Levenshtein ratio <= 0.2 — the
    sequence-aware gate that rejects ngram-multiset coincidences.
    One JVM levenshtein per rep pair; clone pairs emit dist 0 without
    running the DP."""
    from .operators.dedup import edit_distance_pairs

    docs = load_table(spark, sf_dir, "documents")
    return edit_distance_pairs(
        docs,
        "doc_id",
        "text",
        n=12,
        jaccard_floor=0.7,
        max_ratio=0.2,
        num_hashes=48,
        bands=24,
    )


@register(
    "dedup_pairs_weighted",
    """
    WITH g AS (
        SELECT text, min(doc_id) AS rep, count(*) AS k
        FROM documents GROUP BY text
    ),
    w AS (
        SELECT rep AS doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM g
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(t[i:i+2], ' ')
                    for i in range(1, len(t) - 1)])) AS s
        FROM w
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cross_pairs AS (
        SELECT i, j,
               round(shared::DOUBLE / (ca.n + cb.n - shared), 6) AS jaccard,
               (gi.k * gj.k)::BIGINT AS n_pairs
        FROM shared
        JOIN counts ca ON i = ca.doc_id
        JOIN counts cb ON j = cb.doc_id
        JOIN g gi ON gi.rep = i
        JOIN g gj ON gj.rep = j
        WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.8
    ),
    within AS (
        SELECT g.rep AS i, g.rep AS j, 1.0::DOUBLE AS jaccard,
               (g.k * (g.k - 1) // 2)::BIGINT AS n_pairs
        FROM g JOIN counts c ON c.doc_id = g.rep
        WHERE g.k > 1
    )
    SELECT * FROM cross_pairs UNION ALL SELECT * FROM within
    """,
)
def dedup_pairs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-output clone contract: one row per representative
    pair with an ``n_pairs`` multiplicity instead of k_i*k_j expanded
    member rows — the shape that keeps a 10^6-clone group from
    emitting ~10^12 pairs.  sum(n_pairs) equals the expanded pair
    count exactly (tested in test_extensions)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, clone_weighted=True
    )


_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w.comp FROM edges e JOIN walk w ON e.b = w.doc
    )
    SELECT doc, min(comp) AS component FROM walk GROUP BY doc
    """


@register("dedup_clusters", _COMPONENTS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pairs -> connected components -> canonical (minimum) doc id per
    # near-duplicate cluster: the step that turns pair detection into
    # an actual keep-one-per-cluster dedup policy
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return dedup_components(pairs)


@register("dedup_components_incremental", _COMPONENTS_ORACLE)
def dedup_components_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The persisted-clustering edition of ``dedup_clusters`` under
    the SAME cross-engine oracle: the corpus's near-dup pairs arrive
    in three hash-split batches (mixed order, so later batches bridge
    components created by earlier ones), each batch folds into the
    append-only label + merge stores via
    :func:`incremental_components`, and the final
    :func:`components_over_store` view must equal the one-shot batch
    clustering row for row.  The middle batch is re-delivered once to
    pin the replay no-op on the formal record."""
    import shutil
    import tempfile

    from .operators.dedup import (
        components_over_store,
        incremental_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).localCheckpoint(eager=True)
    base = tempfile.mkdtemp(prefix="cc_store_")
    try:
        store = os.path.join(base, "cc")
        split = F.pmod(F.xxhash64("i", "j"), F.lit(3))
        for b in range(3):
            incremental_components(
                spark, pairs.filter(split == b), store
            )  # fold is eager; the returned frame is discarded
            if b == 1:  # replay: must change neither store nor labels
                incremental_components(
                    spark, pairs.filter(split == b), store
                )  # fold is eager; the returned frame is discarded
        rows = components_over_store(spark, store).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, component long")


@register("streaming_components", _COMPONENTS_ORACLE)
def streaming_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The components store maintained through Structured Streaming
    under the batch clustering's hard oracle: the corpus's near-dup
    pairs replay as a 3-file hash-split feed (one trigger per file —
    NO ordering required: component labels are min-reachable ids and
    min composes across merges in any order), each micro-batch folds
    into the label + merge stores, and the final
    ``components_over_store`` view must equal the one-shot
    ``dedup_components`` clustering row for row."""
    import glob
    import shutil
    import tempfile

    from .operators.dedup import components_over_store
    from .streaming.components import run_streaming_components

    docs = load_table(spark, sf_dir, "documents")
    # materialize once: each of the 3 feed-slice writes below would
    # otherwise re-run the full pair-generation pipeline
    pairs = jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).localCheckpoint(eager=True)
    base = tempfile.mkdtemp(prefix="cc_stream_")
    try:
        feed = os.path.join(base, "feed")
        split = F.pmod(F.xxhash64("i", "j"), F.lit(3))
        for b in range(3):
            pairs.filter(split == b).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + b * 60,) * 2)
        stream = (
            spark.readStream.schema("i long, j long, jaccard double")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_components(
            spark,
            stream,
            os.path.join(base, "store"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming components drain exceeded 300 s")
        rows = components_over_store(
            spark, os.path.join(base, "store")
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, component long")


@register(
    "dedup_simhash",
    """
    SELECT count(*)::BIGINT AS n_clone_pairs,
           true AS clones_covered,
           true AS bounds_ok
    FROM documents a JOIN documents b
      ON a.text = b.text AND a.doc_id < b.doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard correctness check for the signature-dependent operator:
    the full SimHash pair pipeline runs, then reduces to assertions
    the oracle can pin exactly —

    * ``n_clone_pairs``: identical-text pairs counted independently on
      both engines (cross-engine check of the clone-collapse path);
    * ``clones_covered``: every identical-text pair MUST appear in the
      output with Hamming 0 (recall = 1 on exact duplicates, a
      structural guarantee of SimHash);
    * ``bounds_ok``: every emitted pair respects i < j and
      0 <= hamming <= max_hamming.

    The raw pair set itself is hash-function-dependent and therefore
    not cross-engine comparable; these assertions are.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    d = docs.select("doc_id", "text")
    clones = (
        d.alias("a")
        .join(d.alias("b"), F.col("a.text") == F.col("b.text"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j")
        )
    )
    cov = clones.join(pairs, ["i", "j"], "left").agg(
        F.count("*").alias("n_clone_pairs"),
        F.coalesce(F.bool_and(F.col("hamming") == 0), F.lit(True)).alias(
            "clones_covered"
        ),
    )
    bounds = pairs.agg(
        F.coalesce(
            F.bool_and(
                (F.col("i") < F.col("j"))
                & F.col("hamming").between(0, 3)
            ),
            F.lit(True),
        ).alias("bounds_ok")
    )
    return cov.crossJoin(bounds)


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS i, b.vec_id AS j,
           round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)


@register(
    "dedup_embedding_weighted",
    """
    WITH base AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings
    ),
    g AS (
        SELECT embedding, min(vec_id) AS rep, count(*) AS k
        FROM base GROUP BY embedding
    ),
    cross_pairs AS (
        SELECT a.rep AS i, b.rep AS j,
               round(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                   AS cosine,
               (a.k * b.k)::BIGINT AS n_pairs
        FROM g a JOIN g b ON a.rep < b.rep
        WHERE round(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                  >= 0.45
    ),
    within AS (
        SELECT rep AS i, rep AS j, 1.0::DOUBLE AS cosine,
               (k * (k - 1) // 2)::BIGINT AS n_pairs
        FROM g
        WHERE k > 1 AND list_sum(
            list_transform(embedding::DOUBLE[], x -> x * x)) > 0
    )
    SELECT * FROM cross_pairs UNION ALL SELECT * FROM within
    """,
)
def dedup_embedding_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-output clone contract for EMBEDDING near-dup (the
    multimodal_near_dup 1000× probe's fix): clone multiplicity is
    built deterministically on both engines (the corpus unioned with
    an id-shifted copy — every vector exactly twice), and the
    operator must emit one row per representative pair carrying
    ``n_pairs`` (2×2 across groups, k·(k−1)/2 = 1 within) instead of
    the expanded member pairs.  sum(n_pairs) equals the brute-force
    pair count exactly while output stays ∝ distinct vectors."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    doubled = emb.unionByName(
        emb.select(
            (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
            "embedding",
        )
    )
    return embedding_dup_pairs(
        doubled, "vec_id", "embedding", threshold=0.45, clone_weighted=True
    )


@register(
    "dedup_embedding_lsh",
    """
    SELECT count(*)::BIGINT AS n_exact_pairs,
           true AS subset_ok,
           true AS recall_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard check for the approximate LSH pair path, reduced to
    oracle-pinnable assertions:

    * ``n_exact_pairs``: the brute-force pair count, computed
      independently in Spark and DuckDB (cross-engine);
    * ``subset_ok``: every LSH pair must ALSO be an exact pair with an
      identical cosine (precision = 1 — LSH re-ranks exactly, so any
      false positive or score drift is a bug);
    * ``recall_ok``: LSH recall vs the exact pair set >= 0.5
      (measured 0.64 at sf0.01 with dims=64/16 bits/4-bit bands).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    lsh = embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", dims=64, threshold=0.45
    )
    exact = embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    joined = lsh.withColumnRenamed("cosine", "lsh_cosine").join(
        exact, ["i", "j"], "left"
    )
    checks = joined.agg(
        F.coalesce(
            F.bool_and(
                F.col("cosine").isNotNull()
                & (F.col("cosine") == F.col("lsh_cosine"))
            ),
            F.lit(True),
        ).alias("subset_ok"),
        F.coalesce(
            F.sum(F.when(F.col("cosine").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("__n_hit"),
    )
    totals = exact.agg(F.count("*").alias("n_exact_pairs"))
    return totals.crossJoin(checks).select(
        "n_exact_pairs",
        "subset_ok",
        (
            F.col("__n_hit").cast("double")
            / F.greatest(F.col("n_exact_pairs"), F.lit(1)).cast("double")
            >= F.lit(0.5)
        ).alias("recall_ok"),
    )


@register(
    "streaming_embedding_pairs",
    """
    SELECT count(*)::BIGINT AS n_exact_pairs,
           true AS subset_ok,
           true AS recall_ok,
           true AS indexed_ok,
           true AS replay_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
    """,
)
def streaming_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cell-partitioned embedding near-dup store maintained
    through Structured Streaming (streaming/embedding_pairs.py) —
    the last incremental store to gain a streaming edition.  Vectors
    replay as a 3-file feed (first trigger trains the quantizer,
    later triggers probe + append through the id anti-join), and the
    drained union of per-batch pair outputs is pinned by a
    verified summary:

    * ``n_exact_pairs``: brute-force pair count at cosine >= 0.45,
      computed independently in Spark and DuckDB (cross-engine);
    * ``subset_ok``: every streamed pair is an exact pair with an
      identical (round-6) cosine — cell probing re-ranks exactly, so
      precision is 1 by construction;
    * ``recall_ok``: recall vs the exact pair set >= 0.3 (measured
      0.52 at sf0.1 with k=16 cells trained on the FIRST third of
      the corpus and the new side probing its 2 nearest cells —
      single-cell probing measured 0.29, UNDER the floor, once the
      training sample was made content-deterministic by id-sorting
      it; the first-batch-training caveat is the same as
      ``streaming_ivf``'s);
    * ``indexed_ok``: every vector indexed exactly once;
    * ``replay_ok``: a post-drain redelivery of the training slice
      emits 0 pairs and appends 0 vectors.
    """
    import glob
    import shutil
    import tempfile

    from .operators.similarity import incremental_embedding_pairs
    from .streaming.embedding_pairs import run_streaming_embedding_pairs

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_total = emb.count()
    def build_feed(feed: str) -> None:
        for i in range(3):
            emb.filter(
                F.pmod(F.col("vec_id"), F.lit(3)) == i
            ).coalesce(1).write.mode("append").parquet(feed)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + i * 60,) * 2)

    base = tempfile.mkdtemp(prefix="embp_stream_")
    try:
        feed = _shared_stream_feed(
            spark, sf_dir, "embp_feed", build_feed
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(feed).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        store = os.path.join(base, "store")
        q = run_streaming_embedding_pairs(
            spark,
            stream,
            "vec_id",
            "embedding",
            store,
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            threshold=0.45,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming embedding-pairs drain exceeded 300 s"
            )
        inc = {
            (r["i"], r["j"]): r["cosine"]
            for r in spark.read.parquet(os.path.join(base, "out"))
            .select("i", "j", "cosine")
            .collect()
        }
        vec_ids = [
            r["doc"]
            for r in spark.read.parquet(os.path.join(store, "vectors"))
            .select("doc")
            .collect()
        ]
        replay_n = incremental_embedding_pairs(
            spark,
            emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 0),
            "vec_id",
            "embedding",
            store,
            threshold=0.45,
        ).count()
        n_after = spark.read.parquet(
            os.path.join(store, "vectors")
        ).count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    # the brute-force verification pair set is pure input prep —
    # identical every run, so it persists once per process (the
    # r8 nit-#4 harness-cost trim); the streamed side under test
    # recomputes fully above
    def build_exact(path: str) -> None:
        embedding_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.45
        ).write.mode("overwrite").parquet(path)

    exact = {
        (r["i"], r["j"]): r["cosine"]
        for r in spark.read.parquet(
            _shared_store("embp_exact", sf_dir, build_exact)
        ).collect()
    }
    subset_ok = all(
        p in exact and abs(exact[p] - c) <= 1e-9 for p, c in inc.items()
    )
    recall = len([p for p in inc if p in exact]) / max(len(exact), 1)
    return _verdict_frame(
        spark,
        [
            ("n_exact_pairs", len(exact), "bigint"),
            ("subset_ok", bool(subset_ok), "boolean"),
            ("recall_ok", recall >= 0.3, "boolean"),
            (
                "indexed_ok",
                len(vec_ids) == n_total
                and len(set(vec_ids)) == n_total,
                "boolean",
            ),
            (
                "replay_ok",
                replay_n == 0 and n_after == n_total,
                "boolean",
            ),
        ],
    )


@register(
    "similarity_topk",
    """
    SELECT e.vec_id,
           round(list_cosine_similarity(
               e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, "vec_id", "embedding", query_id=0, k=10)


@register(
    "search_hybrid_rrf",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm_scores AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    ),
    bm AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS bm25_rank
        FROM bm_scores
    ),
    cos_scores AS (
        SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    ),
    cos AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS cos_rank
        FROM cos_scores
    )
    SELECT doc_id,
           round(coalesce(1.0 / (60 + bm25_rank), 0)
                 + coalesce(1.0 / (60 + cos_rank), 0), 6) AS rrf_score,
           bm25_rank, cos_rank
    FROM bm FULL JOIN cos USING (doc_id)
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: a BM25 lexical leg over ``documents`` and an
    exact-cosine dense leg over ``embeddings`` (the tables share the
    0..n-1 id space), fused by reciprocal rank (k=60).  Each leg is
    its own TakeOrdered top-20 over the corpus; fusion runs on <= 40
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm_leg = bm25_search(
        docs, "doc_id", "text", ["spark", "table", "stream"], top_k=20
    )
    cos_leg = cosine_topk(
        emb, "vec_id", "embedding", query_id=0, k=20
    ).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(
        [bm_leg, cos_leg],
        "doc_id",
        ["bm25_rank", "cos_rank"],
        top_k=10,
    )


@register(
    "search_bm25_highlight",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT 10
    ),
    hl AS (
        SELECT doc_id, text,
               list_sort([x FOR x IN
                   [[strpos(lower(text), 'spark'), 1],
                    [strpos(lower(text), 'table'), 2],
                    [strpos(lower(text), 'stream'), 3]]
                   IF x[1] > 0])[1] AS best
        FROM documents
    )
    SELECT b.doc_id, b.score,
           ['spark', 'table', 'stream'][best[2]] AS matched_term,
           best[1]::BIGINT AS match_pos,
           substr(text, greatest(1, best[1] - 30),
                  length(['spark', 'table', 'stream'][best[2]]) + 60)
               AS snippet
    FROM bm b JOIN hl USING (doc_id)
    WHERE best IS NOT NULL
    """,
)
def search_bm25_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical search with hit highlighting — the ES search+highlight
    shape over the corpus: BM25 top-10 joined to
    ``highlight_snippets`` (earliest case-insensitive match across the
    query terms, fixed ±30-char snippet around it, ties to term
    order).  The highlight is a pure JVM projection (lower + locate
    folded through an array-of-struct min + one substring) — no
    shuffle beyond BM25's own, no UDF."""
    from .operators.text import highlight_snippets

    docs = load_table(spark, sf_dir, "documents")
    terms = ["spark", "table", "stream"]
    bm = bm25_search(docs, "doc_id", "text", terms, top_k=10)
    hl = highlight_snippets(docs, "doc_id", "text", terms, window=30)
    return bm.join(hl, "doc_id").select(
        "doc_id", "score", "matched_term", "match_pos", "snippet"
    )


@register(
    "search_more_like_this",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ),
    tf0 AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE length(term) > 0 GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf0 GROUP BY term),
    nn AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
    kw AS (
        SELECT term FROM (
            SELECT t.term,
                   row_number() OVER (
                       ORDER BY round(t.tf * ln(nn.n / dfreq.df), 6) DESC,
                                t.term ASC
                   ) AS rk
            FROM tf0 t JOIN dfreq USING (term), nn
            WHERE t.doc_id = 0
        ) WHERE rk <= 3
    ),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id <> 0),
    toks2 AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM corpus
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks2
        WHERE token IN (SELECT term FROM kw)
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more-like-this: extract the seed document's top TF-IDF
    keywords (doc 0, top 3 — ``text_idf_keywords``'s exact math:
    ``tf * ln(N/df)``, 6-dp rounding, term tie-break), then
    BM25-search them over the corpus minus the seed.

    Scale shape: keyword extraction is SEED-FOCUSED — the seed's
    term frequencies are one tiny aggregate, document frequencies
    come from ONE corpus scan filtered to the seed's terms (a
    broadcast ``isin`` the scan can push down) + a term-keyed
    count-distinct, and the final scoring/ranking runs driver-side
    over <= seed-distinct-terms rows (model-sized state, the query-
    vector budget class).  Computing the registered per-doc
    ``tfidf_keywords`` for ALL docs to read 3 rows of one doc cost
    387 s at 5M docs (a corpus-wide (doc, term) shuffle + window);
    this shape is one filtered scan."""
    import math as _math

    docs = load_table(spark, sf_dir, "documents")
    seed_tf = {
        r["term"]: r["tf"]
        for r in docs.filter(F.col("doc_id") == 0)
        .select(
            F.explode(
                F.split(F.trim(F.col("text")), r"\s+")
            ).alias("term")
        )
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).filter(F.length("term") > 0)
    dfreq = {
        r["term"]: r["df"]
        for r in toks.filter(F.col("term").isin(*seed_tf))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    n = docs.select(F.countDistinct("doc_id")).head()[0]
    scored = sorted(
        (
            (-round(tf * _math.log(n / dfreq[t]), 6), t)
            for t, tf in seed_tf.items()
        ),
    )
    kws = [t for _, t in scored[:3]]
    rest = docs.filter(F.col("doc_id") != 0)
    return bm25_search(rest, "doc_id", "text", kws, top_k=10)


def _ann_topk_check(
    emb: DataFrame, ann: DataFrame, query_id: int, k: int, min_recall: float
) -> DataFrame:
    """Reduce an approximate top-k result to oracle-pinnable
    assertions: ``n_results`` (= k), ``scores_exact`` (every returned
    score equals the independently recomputed exact cosine — ANN must
    never fabricate scores), ``recall_ok`` (overlap with the exact
    top-k >= ``min_recall``)."""
    from .operators.dedup import cosine_col

    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    allscores = (
        emb.filter(F.col("vec_id") != query_id)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias(
                "exact_score"
            ),
        )
    )
    exact_topk = allscores.orderBy(
        F.col("exact_score").desc(), F.col("vec_id").asc()
    ).limit(k)
    checks = ann.join(allscores, "vec_id", "left").agg(
        F.count("*").alias("n_results"),
        F.coalesce(
            F.bool_and(
                F.col("exact_score").isNotNull()
                & (F.col("score") == F.col("exact_score"))
            ),
            F.lit(False),
        ).alias("scores_exact"),
    )
    hits = ann.join(exact_topk.select("vec_id"), "vec_id", "inner").agg(
        F.count("*").alias("__hits")
    )
    return checks.crossJoin(hits).select(
        "n_results",
        "scores_exact",
        (
            F.col("__hits").cast("double") / F.lit(float(k))
            >= F.lit(min_recall)
        ).alias("recall_ok"),
    )


_ANN_CHECK_ORACLE = """
    SELECT 10::BIGINT AS n_results,
           true AS scores_exact,
           true AS recall_ok
"""


@register("similarity_ann_lsh", _ANN_CHECK_ORACLE)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hyperplane-LSH ANN with multi-probe (Lv et al. VLDB'07):
    # Hamming-<=2 neighbor buckets probe near-miss sign flips, the
    # dominant false-negative mode.  r5 sweep over 5 query ids:
    # multiprobe=2 measures recall@10 = 1.0 min at BOTH sf0.01 and
    # sf0.1 (multiprobe=1 dipped to 0.9; single-probe to 0.1) while
    # candidate volume stays bucket-shaped — the recall dial that
    # holds the floor as the corpus grows, unlike widening bands
    # (which degenerates toward a full scan).  Asserted >= 0.8
    # (hyperplanes are seeded — the measurement is deterministic).
    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_lsh_topk(
        emb, "vec_id", "embedding", query_id=0, dims=64, k=10,
        multiprobe=2,
    )
    return _ann_topk_check(emb, ann, query_id=0, k=10, min_recall=0.8)


@register(
    "embedding_quantize",
    """
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               greatest(list_max(list_transform(embedding::DOUBLE[],
                   x -> abs(x))), 1e-30) / 127.0 AS scale
        FROM embeddings
    )
    SELECT vec_id, scale,
           array_to_string(
               list_transform(v, x -> round(x / scale)::INTEGER), ',')
               AS codes_csv
    FROM s
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the registry serializes the int8 codes array to a CSV string so
    # the driver's pandas canonicalizer can sort/hash the column
    # (list cells are unhashable); library callers get the raw
    # array<tinyint> from quantize_embeddings directly.
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias(
            "codes_csv"
        ),
    )


@register(
    "embedding_whiten",
    """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    x AS (
        SELECT u.i AS i, u.x AS x FROM (
            SELECT unnest([{'i': i, 'x': v[i]}
                           for i in range(1, len(v) + 1)]) AS u
            FROM e)
    ),
    mo AS (
        SELECT i, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
        FROM x GROUP BY i
    ),
    st AS (
        SELECT list(sx / n ORDER BY i) AS ms,
               list(greatest(sqrt(greatest(
                   sxx / n - (sx / n) * (sx / n), 0)), 1e-12)
                   ORDER BY i) AS ss
        FROM mo
    )
    SELECT vec_id,
           array_to_string(
               [round((v[i] - ms[i]) / ss[i] * 1000000)::BIGINT
                for i in range(1, len(v) + 1)], ',') AS z_micro_csv
    FROM e, st
    """,
)
def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal whitening of the embedding table: one aggregation for
    all per-dimension moments (d-row model state), then a zero-shuffle
    projection against literal mean/std arrays.  The registry
    serializes z in integer micro-units so the cross-engine hash isn't
    at the mercy of float-to-string formatting."""
    from .operators.similarity import whiten_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    z = whiten_embeddings(emb, "vec_id", "embedding")
    return z.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("z"),
                lambda x: F.round(x * 1e6).cast("long").cast("string"),
            ),
            ",",
        ).alias("z_micro_csv"),
    )


@register("similarity_ann_ivf", _ANN_CHECK_ORACLE)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF ANN, verified: r5 sweep raised n_probe 4 -> 8 (of 16
    # cells) — recall@10 at query 0 measures 0.8 at both sf0.01 and
    # sf0.1 (probe=4 measured 0.3-0.6).  Asserted >= 0.7: at these
    # scales the k-means train sample is the WHOLE table (<= the
    # 100k cap), so the measurement is deterministic — the old
    # sample-order slack only exists beyond 100k vectors.
    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_ivf_topk(
        emb, "vec_id", "embedding", query_id=0, k=10, n_probe=8
    )
    return _ann_topk_check(emb, ann, query_id=0, k=10, min_recall=0.7)


@register(
    "embedding_kmeans",
    """
    SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_points,
           true AS clusters_in_range,
           true AS assignment_optimal,
           true AS assigned_sim_ok
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone spherical k-means (the IVF/SemDeDup quantizer as a
    first-class clustering operator), certified Spark-side: the
    Arrow-kernel assignment is re-scored with an INDEPENDENT JVM
    cosine against the broadcast centroids — every point's kernel sim
    must match its assigned centroid's JVM cosine (1e-5, kernel sims
    round to 6dp) and be within 1e-5 of the JVM max over ALL
    centroids (argmax optimality, tolerant of summation-order float
    noise between numpy and JVM fold).  Oracle pins the exact point
    count plus the three certification booleans."""
    from .operators.similarity import kmeans_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, C = kmeans_clusters(emb, "vec_id", "embedding", k=16, seed=7)
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # unrolled codegen dots via the shared certification builder —
    # measured 27 s -> 16 s for the full 200k-vector check at the
    # 100x replica; the operator itself is the linear part (6 s).
    sims = F.array(*_unrolled_cosines("v", list(C)))
    joined = assigned.join(base, "vec_id").select(
        "cluster",
        "sim",
        sims.alias("__sims"),
    )
    return joined.agg(
        F.count("*").alias("n_points"),
        F.bool_and(
            (F.col("cluster") >= 0) & (F.col("cluster") < F.lit(len(C)))
        ).alias("clusters_in_range"),
        F.bool_and(
            F.col("sim") + F.lit(1e-5) >= F.array_max("__sims")
        ).alias("assignment_optimal"),
        F.bool_and(
            F.abs(
                F.col("sim")
                - F.element_at("__sims", F.col("cluster") + 1)
            )
            <= F.lit(1e-5)
        ).alias("assigned_sim_ok"),
    )


@register(
    "text_token_count",
    """
    SELECT doc_id,
           (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+'))
            END)::BIGINT AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )


@register(
    "text_token_count_bpe",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}'))::BIGINT
               AS n_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count_col(F.col("text")).cast("long").alias("n_tokens"),
    )


@register(
    "text_quality",
    """
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS w,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::DOUBLE AS n
        FROM documents
    ),
    feats AS (
        SELECT doc_id, n,
               len(list_distinct(w))::DOUBLE / nullif(n, 0) AS dr,
               len(list_filter(w, x -> x IN
                   ('the','a','of','to','in','and','is','on')))::DOUBLE
                   / nullif(n, 0) AS sr,
               length(array_to_string(w, ''))::DOUBLE / nullif(n, 0) AS ml
        FROM t
    )
    SELECT doc_id,
           n::BIGINT AS n_tokens,
           round(dr, 6) AS distinct_ratio,
           round(sr, 6) AS stopword_ratio,
           round(ml, 6) AS mean_token_len,
           floor((least(n / 200.0, 1.0) * 0.3 + dr * 0.3
                 + (1.0 - sr) * 0.2 + least(ml / 8.0, 1.0) * 0.2)
                 * 1000000) / 1000000 AS quality_score
    FROM feats
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs, "doc_id", "text")


@register(
    "text_gopher_rules",
    """
    WITH t AS (
        SELECT doc_id, text,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::DOUBLE AS n,
               string_split_regex(trim(text), '\\s+') AS w,
               string_split(text, chr(10)) AS ls
        FROM documents
    ),
    f AS (
        SELECT doc_id, n,
            length(array_to_string(w, ''))::DOUBLE / nullif(n, 0) AS ml,
            ((length(text) - length(replace(text, '#', '')))::DOUBLE
             + (length(text) - length(replace(text, '...', '')))::DOUBLE
               / 3.0) / nullif(n, 0) AS sym,
            len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*]')))::DOUBLE
                / nullif(len(ls), 0) AS bf,
            len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))::DOUBLE
                / nullif(len(ls), 0) AS ef,
            len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / nullif(n, 0) AS af,
            len(list_filter(['the','be','to','of','and','that','have','with'],
                            s -> list_contains(w, s)))::BIGINT AS ns
        FROM t
    )
    SELECT doc_id, n::BIGINT AS n_words,
           round(ml, 6) AS mean_word_len,
           round(sym, 6) AS symbol_ratio,
           round(bf, 6) AS bullet_frac,
           round(ef, 6) AS ellipsis_frac,
           round(af, 6) AS alpha_frac,
           ns AS n_stopwords,
           coalesce(n BETWEEN 50 AND 100000 AND ml BETWEEN 3 AND 10
                    AND sym <= 0.1 AND bf < 0.9 AND ef < 0.3
                    AND af >= 0.8 AND ns >= 2, false) AS passes
    FROM f
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveWeb quality-rule battery (Rae et al. 2021):
    per-document rule signals + combined pass verdict, every value
    pinned cross-engine — the DuckDB oracle recomputes all seven
    rules from the raw text with list comprehensions."""
    from .operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs, "doc_id", "text")


@register(
    "text_lang_id",
    """
    WITH tri AS (
        SELECT doc_id, lang,
               unnest(list_distinct(
                   [substr(tt, i, 3) for i in range(1, length(tt) - 1)]))
                   AS tri
        FROM (SELECT doc_id, lang, trim(text) AS tt FROM documents)
    ),
    counts AS (SELECT lang, tri, count(*) AS cnt FROM tri GROUP BY 1, 2),
    profiles AS (
        SELECT lang, tri FROM (
            SELECT lang, tri, row_number() OVER (
                PARTITION BY lang ORDER BY cnt DESC, tri ASC) AS rk
            FROM counts) WHERE rk <= 20
    ),
    scores AS (
        SELECT d.doc_id, p.lang AS cand, count(*) AS overlap
        FROM tri d JOIN profiles p ON d.tri = p.tri
        GROUP BY 1, 2
    )
    SELECT doc_id, cand AS pred_lang FROM (
        SELECT doc_id, cand, row_number() OVER (
            PARTITION BY doc_id ORDER BY overlap DESC, cand ASC) AS rn
        FROM scores) WHERE rn = 1
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs, "doc_id", "text", "lang", profile_size=20)


@register(
    "text_bm25_search",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(
        docs, "doc_id", "text", ["spark", "table", "stream"], top_k=10
    )


_BM25_ORACLE = REGISTRY["text_bm25_search"][1]


@register("search_bm25_incremental", _BM25_ORACLE)
def search_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index edition of ``text_bm25_search`` under the
    SAME cross-engine oracle: the corpus arrives in three hash-split
    batches, each folds into the append-only postings + docstats
    stores via ``incremental_bm25_index`` (first-arrival doc-id
    identity; the middle batch is re-delivered once to pin the replay
    no-op), and ``bm25_over_store`` must score the same top-10 the
    one-shot ``bm25_search`` does."""
    import shutil
    import tempfile

    from .operators.text import bm25_over_store, incremental_bm25_index

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="bm_store_")
    try:
        store = os.path.join(base, "bm")
        split = F.pmod(F.xxhash64("doc_id"), F.lit(3))
        for b in range(3):
            incremental_bm25_index(
                spark, docs.filter(split == b), store
            )  # fold is eager; the returned frame is discarded
            if b == 1:  # replay: must append nothing
                incremental_bm25_index(
                    spark, docs.filter(split == b), store
                )  # fold is eager; the returned frame is discarded
        rows = bm25_over_store(
            spark, store, ["spark", "table", "stream"], top_k=10
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, score double").select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_phrase",
    """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len([i FOR i IN range(1, len(toks))
                    IF toks[i] = 'value' AND toks[i+1] = 'table'])
                   AS n_occurrences
        FROM t
    )
    SELECT doc_id, n_occurrences::BIGINT AS n_occurrences
    FROM m WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id ASC
    """,
)
def search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_phrase over the positional postings store
    (operators/text.py:phrase_over_store): the corpus folds into the
    incremental BM25 index once (the shared serving store), then the
    phrase "value table" runs as a token-filtered postings scan + one
    doc-keyed join per term + a shifted-position array intersection
    (the occurrence-start set, overlaps counted).  The oracle counts
    occurrences straight off the token lists — the index path must
    agree exactly."""
    from .operators.text import phrase_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return phrase_over_store(spark, store, ["value", "table"]).select(
        F.col("doc").alias("doc_id"), "n_occurrences"
    )


@register(
    "search_phrase_prefix",
    """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len([i FOR i IN range(1, len(toks))
                    IF toks[i] = 'big' AND starts_with(toks[i+1], 's')])
                   AS n_occurrences
        FROM t
    )
    SELECT doc_id, n_occurrences::BIGINT AS n_occurrences
    FROM m WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id ASC
    """,
)
def search_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_phrase_prefix — search-as-you-type
    (operators/text.py:match_phrase_prefix_over_store): the exact
    term 'big' followed by any indexed term starting 's' at the next
    position; exact legs are the phrase plan, the prefix leg a
    half-open token-range scan whose per-doc positions union across
    the (max_expansions-capped, uncapped here) expanded terms.  The
    oracle counts straight off the token lists."""
    from .operators.text import match_phrase_prefix_over_store

    store = _shared_bm25_store(spark, sf_dir)
    # the oracle is UNCAPPED, so the cap must sit above any fixture
    # vocabulary: at 50 the pair silently diverges the moment a scale
    # factor grows >50 distinct 's'-tokens (r10 ADVICE); 2^20 terms
    # is far past any sf while still bounding the guarded collect
    return match_phrase_prefix_over_store(
        spark, store, ["big"], "s", max_expansions=1 << 20
    ).select(F.col("doc").alias("doc_id"), "n_occurrences")


# --------------------------------------------------------------------
# Analyzed search store: the reference's per-field analyzer
# declaration (examples/config.json:64-66) as a store-level analysis
# chain shared by index time, query time AND the DuckDB oracle
# (operators/analysis.py).  The fixture corpus is deliberately messy:
# every third doc uppercased, every third wrapped in punctuation,
# every third with '--' separators injected between words — a raw
# whitespace index would miss most matches; the analyzed index must
# serve exactly what the oracle's identical chain derives.
# --------------------------------------------------------------------

# one mixed-text expression, written once for both engines
_AN_MIXED_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN upper(text) "
    "WHEN 1 THEN concat('<< ', text, ' !!!') "
    "ELSE replace(text, ' ', ' -- ') END"
)


def _an_mixed_col() -> F.Column:
    d = F.col("doc_id") % 3
    return (
        F.when(d == 0, F.upper("text"))
        .when(
            d == 1, F.concat(F.lit("<< "), F.col("text"), F.lit(" !!!"))
        )
        .otherwise(F.regexp_replace(F.col("text"), " ", " -- "))
    )


def _analyzed_toks_sql() -> str:
    from .operators.analysis import get_analyzer

    return get_analyzer("standard").duckdb_tokens_sql(_AN_MIXED_SQL)


# the analyzed-token list expression, rendered once into each oracle
_ANALYZED_TOKS = _analyzed_toks_sql()


def _raw_standard_toks_sql() -> str:
    """Standard chain over the RAW text column (the search_reindex
    oracle: the re-analyzed destination store tokenizes the plain
    corpus, not the mixed-case fixture expression)."""
    from .operators.analysis import get_analyzer

    return get_analyzer("standard").duckdb_tokens_sql("text")


_RAW_STANDARD_TOKS = _raw_standard_toks_sql()


def _shared_analyzed_bm25_store(spark: SparkSession, sf_dir: str) -> str:
    """The mixed-case/punctuated corpus folded once into a
    standard-analyzed BM25 store (analyzer recorded in _bm_params, so
    every serving op analyzes its query terms through the same
    chain)."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", _an_mixed_col().alias("text"), "lang"
        )
        incremental_bm25_index(
            spark, docs, path, field_cols=["lang"], analyzer="standard"
        )  # fold is eager; the returned frame is discarded

    return _shared_store("bm25_an", sf_dir, build)


@register(
    "search_analyzed",
    """
    WITH toks AS (
        SELECT doc_id, unnest({TOKS}) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('value', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """.replace("{TOKS}", _ANALYZED_TOKS),
)
def search_analyzed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case/punctuation-insensitive BM25 over the standard-analyzed
    store (operators/text.py:incremental_bm25_index with
    analyzer="standard" + analyze_store_terms): the query arrives as
    the user typed it — "VALUE!", "Table" — and is analyzed through
    the STORE'S chain before touching postings, matching docs whose
    raw text was uppercased, punct-wrapped or dash-separated by the
    fixture.  The oracle runs the byte-identical analysis chain
    (analysis.py duckdb twin) over the same mixed expression —
    index-time and query-time analysis provably one pipeline."""
    from .operators.text import bm25_over_store

    store = _shared_analyzed_bm25_store(spark, sf_dir)
    return bm25_over_store(
        spark, store, ["VALUE!", "Table"], top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_analyzed_phrase",
    """
    WITH t AS (
        SELECT doc_id, {TOKS} AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len([i FOR i IN range(1, len(toks))
                    IF toks[i] = 'value' AND toks[i+1] = 'table'])
                   AS n_occurrences
        FROM t
    )
    SELECT doc_id, n_occurrences::BIGINT AS n_occurrences
    FROM m WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id ASC
    """.replace("{TOKS}", _ANALYZED_TOKS),
)
def search_analyzed_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase over the analyzed store: the phrase "Value,
    TABLE" analyzes to ['value', 'table'] and must find consecutive
    positions in the ANALYZED token stream — including docs where the
    fixture injected '--' separators between the words (separator
    runs collapse, so positions stay adjacent).  Same positional
    plan as search_phrase; the oracle re-derives positions from the
    analyzed lists."""
    from .operators.text import phrase_over_store

    store = _shared_analyzed_bm25_store(spark, sf_dir)
    return phrase_over_store(spark, store, ["Value,", "TABLE"]).select(
        F.col("doc").alias("doc_id"), "n_occurrences"
    )


@register(
    "search_analyzed_facets",
    """
    WITH t AS (
        SELECT doc_id, lang, {TOKS} AS toks
        FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs
    FROM t WHERE list_contains(toks, 'value')
    GROUP BY lang
    ORDER BY n_docs DESC, lang ASC
    """.replace("{TOKS}", _ANALYZED_TOKS),
)
def search_analyzed_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-values facet counts over the analyzed match set: terms
    aggregation on the stored ``lang`` field for documents matching
    the query-time-analyzed term "VALUE?" — the agg family
    (range/histogram/significant/…) all route term analysis through
    the same _matched_docstats chokepoint this exercises."""
    from .operators.text import facets_over_store

    store = _shared_analyzed_bm25_store(spark, sf_dir)
    return facets_over_store(spark, store, ["VALUE?"], "lang")


@register(
    "search_proximity",
    """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
            [i FOR i IN range(1, len(toks)+1) IF toks[i] = 'value'] AS p1,
            [i FOR i IN range(1, len(toks)+1) IF toks[i] = 'table'] AS p2,
            [i FOR i IN range(1, len(toks)+1) IF toks[i] = 'stream'] AS p3
        FROM t
    )
    SELECT doc_id,
           min(greatest(a, b, c) - least(a, b, c))::BIGINT AS min_span
    FROM m, unnest(p1) AS ua(a), unnest(p2) AS ub(b), unnest(p3) AS uc(c)
    GROUP BY doc_id
    ORDER BY min_span ASC, doc_id ASC
    """,
)
def search_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES proximity scoring over the positional postings store
    (operators/text.py:proximity_over_store): minimal window span
    containing one occurrence of each of the three query terms, per
    matching doc — the match_phrase-with-slop / proximity-boost
    primitive.  The index path runs the LINEAR merged-events fold
    over a token-pruned postings scan; the oracle brute-forces the
    span off the token lists (min over the full occurrence cross
    product) — they must agree exactly."""
    from .operators.text import proximity_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return proximity_over_store(
        spark, store, ["value", "table", "stream"]
    ).select(F.col("doc").alias("doc_id"), "min_span")


@register("streaming_bm25_index", _BM25_ORACLE)
def streaming_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 index maintained through Structured Streaming under
    the batch search's hard oracle: the corpus replays as a 3-file
    hash-split feed (one trigger per file, order-free — doc identity
    is first-arrival by immutable id), each micro-batch folds into
    the postings + docstats stores, and query-time
    ``bm25_over_store`` must equal the one-shot ``bm25_search``
    top-10 row for row."""
    import glob
    import shutil
    import tempfile

    from .operators.text import bm25_over_store
    from .streaming.bm25_index import run_streaming_bm25_index

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    def build_feed(feed: str) -> None:
        split = F.pmod(F.xxhash64("doc_id"), F.lit(3))
        for b in range(3):
            docs.filter(split == b).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + b * 60,) * 2)

    base = tempfile.mkdtemp(prefix="bm_stream_")
    try:
        feed = _shared_stream_feed(
            spark, sf_dir, "bm_hash_feed", build_feed
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_bm25_index(
            spark,
            stream,
            os.path.join(base, "bm"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
        )
        q.awaitTermination()
        rows = bm25_over_store(
            spark,
            os.path.join(base, "bm"),
            ["spark", "table", "stream"],
            top_k=10,
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, score double").select(
        F.col("doc").alias("doc_id"), "score"
    )


@register("search_index_compaction", _BM25_ORACLE)
def search_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index VACUUM pass under the batch search's hard oracle:
    the corpus folds into the postings/docstats stores in three
    hash-split batches (each append is range-clustered only within
    itself, so files span the full token alphabet),
    ``compact_bm25_store`` then rewrites the store globally
    token-range-clustered via the crash-aware directory swap — and
    ``bm25_over_store`` must return the exact same top-10 it did
    before the rewrite (rows unchanged, layout the only thing
    compaction may touch).  The harness asserts the file count
    dropped so the registry row really exercised a multi-file
    compaction."""
    import shutil
    import tempfile

    from .operators.text import (
        bm25_over_store,
        compact_bm25_store,
        incremental_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="bm_compact_")
    try:
        store = os.path.join(base, "bm")
        split = F.pmod(F.xxhash64("doc_id"), F.lit(3))
        for b in range(3):
            incremental_bm25_index(
                spark, docs.filter(split == b), store
            )  # fold is eager; the returned frame is discarded
        pre = bm25_over_store(
            spark, store, ["spark", "table", "stream"], top_k=10
        ).collect()
        counts = compact_bm25_store(spark, store, min_files=1)
        if not counts["postings_files"][1] < counts["postings_files"][0]:
            raise AssertionError(
                f"compaction did not reduce files: {counts}"
            )
        rows = bm25_over_store(
            spark, store, ["spark", "table", "stream"], top_k=10
        ).collect()
        if rows != pre:
            raise AssertionError("compaction changed query results")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, score double").select(
        F.col("doc").alias("doc_id"), "score"
    )


# --------------------------------------------------------------------
# Shared read-only index stores for the search-family harnesses.
# Queries that SERVE from an index (hybrid, more-like-this, phrase,
# proximity) all want the same fully-folded index over the same
# corpus, so one build per (kind, corpus) amortizes across every such
# query in a bench / correctness run — BENCH_r07 carried ~40-80 s of
# per-query store rebuilds that measured the harness, not the
# operator.  Queries whose POINT is fold/replay semantics
# (search_bm25_incremental, the streaming editions) keep building
# their own fresh stores.
# --------------------------------------------------------------------
_SHARED_STORES: dict[tuple[str, str], str] = {}


def _shared_store(kind: str, sf_dir: str, build) -> str:
    import atexit
    import shutil
    import tempfile

    key = (kind, os.path.abspath(sf_dir))
    path = _SHARED_STORES.get(key)
    if path is None or not os.path.isdir(path):
        base = tempfile.mkdtemp(prefix=f"shared_{kind}_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        path = os.path.join(base, kind)
        build(path)
        _SHARED_STORES[key] = path
    return path


def _shared_bm25_store(spark: SparkSession, sf_dir: str) -> str:
    """The corpus folded once into the incremental BM25 index
    (postings + docstats + positions) — the serving index every
    store-backed lexical query reads."""
    from .operators.geo import materialize_geo_index
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").withColumn(
            # a deterministic per-doc date (the fixture has no date
            # column) so the date_histogram query exercises the
            # calendar-interval doc-values path; the oracle derives
            # the identical date in SQL
            "day",
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("doc_id") % 365).cast("int"),
            ),
        ).withColumn(
            # deterministic per-doc geo point (the fixture has no geo
            # columns) for the geo_distance / bounding-box queries;
            # integer-derived so the oracle reproduces it exactly
            "lat",
            ((F.col("doc_id") % 180) - 90 + F.lit(0.5)).cast("double"),
        ).withColumn(
            "lon",
            ((F.col("doc_id") * 7 % 360) - 180 + F.lit(0.5)).cast(
                "double"
            ),
        )
        # lang + n_chars + day + geo ride docstats as stored fields
        # (ES doc values) so the facet, range-filter, histogram,
        # date-histogram and geo queries serve from the index alone
        incremental_bm25_index(
            spark, docs, path,
            field_cols=["lang", "n_chars", "day", "lat", "lon"],
        )  # fold is eager; the returned frame is discarded
        # cell-partitioned geo sidecar (operators/geo.py): pure-geo
        # and geo-filtered queries prune FILES by cell ring instead
        # of scanning every doc's point — the BKD-tree role
        materialize_geo_index(spark, path, cell_deg=15.0)

    return _shared_store("bm25", sf_dir, build)


def _shared_ivf_store(spark: SparkSession, sf_dir: str) -> str:
    """The embeddings table materialized once as the IVF index
    (cell-partitioned vectors + centroids + pruning cellstats) — the
    serving index the store-backed dense legs read."""
    from .operators.similarity import materialize_ivf_index

    def build(path: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        materialize_ivf_index(
            emb, "vec_id", "embedding", path, n_cells=16
        )

    return _shared_store("ivf", sf_dir, build)


def _shared_pc_store(spark: SparkSession, sf_dir: str) -> str:
    """Parent-child (ES join-field) index: orders as parent docs,
    lineitems as child docs, ONE store carrying ``join_name`` +
    ``parent_id`` stored fields — the ES ``join`` mapping type.  Text
    is synthesized deterministically from the categorical columns
    (the fixture has no comment text), so every token maps 1:1 to a
    generating column the oracle can match on."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        orders = load_table(spark, sf_dir, "orders")
        line = load_table(spark, sf_dir, "lineitem")
        parents = orders.select(
            F.concat(F.lit("O"), F.col("o_orderkey")).alias("doc_id"),
            F.concat(
                F.lit("order "), F.col("o_orderpriority"),
                F.lit(" st_"), F.col("o_orderstatus"),
            ).alias("text"),
            F.lit("parent").alias("join_name"),
            F.lit(None).cast("string").alias("parent_id"),
            F.col("o_totalprice").alias("price"),
        )
        from pyspark.sql.window import Window

        # (l_orderkey, l_linenumber) is NOT unique in the fixture —
        # child ids number rows within the order by a total column
        # order both engines reproduce (full-duplicate rows tie, but
        # then either numbering yields the same output multiset)
        ln = F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy(
                "l_linenumber", "l_partkey", "l_suppkey",
                "l_quantity", "l_extendedprice",
            )
        )
        children = line.select(
            F.concat(
                F.lit("L"), F.col("l_orderkey"), F.lit("-"), ln
            ).alias("doc_id"),
            F.concat(
                F.lit("line rf_"), F.col("l_returnflag"),
                F.lit(" ls_"), F.col("l_linestatus"),
            ).alias("text"),
            F.lit("child").alias("join_name"),
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("parent_id"),
            F.col("l_extendedprice").alias("price"),
        )
        incremental_bm25_index(
            spark, parents.unionByName(children), path,
            field_cols=["join_name", "parent_id", "price"],
        )  # fold is eager; the returned frame is discarded

    return _shared_store("pcstore", sf_dir, build)


def _shared_nested_store(spark: SparkSession, sf_dir: str) -> str:
    """Orders indexed with their lineitems as an ES ``nested`` field:
    an ``array<struct>`` stored field where per-element query
    conditions must hold on the SAME element."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        orders = load_table(spark, sf_dir, "orders")
        line = load_table(spark, sf_dir, "lineitem")
        items = line.groupBy("l_orderkey").agg(
            F.collect_list(
                F.struct(
                    F.col("l_quantity").alias("qty"),
                    F.col("l_returnflag").alias("rflag"),
                    F.col("l_extendedprice").alias("price"),
                )
            ).alias("items")
        )
        docs = (
            orders.join(
                items,
                orders["o_orderkey"] == items["l_orderkey"],
                "left",
            )
            .select(
                F.col("o_orderkey").cast("string").alias("doc_id"),
                F.concat(
                    F.lit("order "), F.col("o_orderpriority"),
                    F.lit(" st_"), F.col("o_orderstatus"),
                ).alias("text"),
                # a parent with no lineitems keeps a NULL array:
                # filter(NULL) -> NULL -> n_hits NULL -> not matched,
                # exactly the ES no-nested-docs behavior
                F.col("items"),
            )
        )
        incremental_bm25_index(
            spark, docs, path, field_cols=["items"]
        )  # fold is eager; the returned frame is discarded

    return _shared_store("nestedstore", sf_dir, build)


def _shared_src_store(spark: SparkSession, sf_dir: str) -> str:
    """documents folded with the text duplicated into a ``_source``
    stored field — the ES _source convention that makes the
    query-driven mutations (update_by_query / delete_by_query /
    reindex) possible: there is stored source to re-index from."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "n_chars",
            F.col("text").alias("_source"),
        )
        incremental_bm25_index(
            spark, docs, path,
            field_cols=["lang", "n_chars", "_source"],
        )  # fold is eager; the returned frame is discarded

    return _shared_store("srcstore", sf_dir, build)


def _shared_title_store(spark: SparkSession, sf_dir: str) -> str:
    """A second analyzed FIELD for the multi-field layout: the
    documents' first five tokens indexed as the "title" store (the
    engine's per-field-store answer to ES multi-field mappings)."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat_ws(
                " ",
                F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 5),
            ).alias("text"),
        )
        incremental_bm25_index(spark, docs, path)  # fold is eager; the returned frame is discarded

    return _shared_store("titlestore", sf_dir, build)


def _shared_knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symmetrized exact 5-NN edge set of the embeddings table,
    computed ONCE per process and persisted — shared input prep for
    the seed-distance family (batch, incremental-store and streaming
    editions).  The operator each of those queries measures is the
    BFS / store fold / drain, not the 5-NN build; recomputing the
    identical Arrow-kernel pass per query (x bench repeats) was pure
    harness cost (r8 VERDICT nit #4).  ``similarity_knn_graph`` keeps
    computing it live — that one IS the 5-NN operator's record."""

    def build(path: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        # REBALANCE before the write (guide §6): the kNN kernel's
        # output partitioning tracks the embedding scan (16 tiny
        # files for a few-hundred-KB edge list here), and every
        # seed-distance fold re-scans this store several times — AQE
        # sizes the rebalanced partitions by bytes, so this is one
        # file locally and 64 MB-targeted files at corpus scale.
        knn_graph(emb, "vec_id", "embedding", k=5).select(
            "i", "j"
        ).hint("rebalance").write.mode("overwrite").parquet(path)

    return spark.read.parquet(_shared_store("knn5", sf_dir, build))


def _shared_stream_feed(
    spark: SparkSession, sf_dir: str, kind: str, build
) -> str:
    """A deterministic streaming FEED directory (one file per trigger,
    strictly-increasing mtimes pinned by ``build`` itself, batch by
    batch) shared across queries and bench repeats.  The feed is
    read-only input — every run still drains it through a FRESH
    checkpoint, so the streaming work under test is untouched; only
    the repeated feed construction drops out of the harness cost."""
    return _shared_store(kind, sf_dir, build)


def _shared_derived_store(kind: str, sf_dir: str, src: str, post) -> str:
    """A shared store DERIVED from another shared store by a mutating
    maintenance pass: copy the source directory once, run ``post`` on
    the copy.  The file copy replaces re-running the fold+CDC build
    (pure harness cost, r9 VERDICT #8); the maintenance pass itself
    still runs — it is the measured operator — and repeats reuse the
    result like every other shared store."""
    import shutil

    def build(path: str) -> None:
        shutil.copytree(src, path)
        post(path)

    return _shared_store(kind, sf_dir, build)


@register("search_hybrid_over_store", REGISTRY["search_hybrid_rrf"][1])
def search_hybrid_over_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval SERVED FROM MAINTAINED INDEXES, under the
    scan-path query's own oracle: the BM25 leg reads the persisted
    postings store (token-filtered scan — ``PushedFilters:
    In(token, …)`` over token-range-clustered files, never a corpus
    re-tokenize), the dense leg reads the IVF store through
    ``ivf_exact_topk`` (centroid-radius upper-bound pruning with a
    brute-force-equality certificate — unprobed cells' parquet is
    never read), and ``rrf_fuse`` combines the two ≤20-row legs.
    This is the shape the reference exists to serve
    (src/elasticsearch.ts:30-89 — queries hit the index, not the
    collection): per-query work ∝ postings of the query terms + the
    probed cells, not corpus size.  Must equal ``search_hybrid_rrf``
    (the corpus-scan edition) row for row."""
    from .operators.similarity import ivf_exact_topk
    from .operators.text import bm25_over_store

    bm_store = _shared_bm25_store(spark, sf_dir)
    ivf_store = _shared_ivf_store(spark, sf_dir)
    bm_leg = bm25_over_store(
        spark, bm_store, ["spark", "table", "stream"], top_k=20
    ).select(F.col("doc").alias("doc_id"), "score")
    # the query vector is one point lookup (model state, same budget
    # class as the IVF training sample)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    cos_leg = ivf_exact_topk(
        spark, ivf_store, qv, "vec_id", k=20, exclude_id=0
    ).withColumnRenamed("vec_id", "doc_id")
    return rrf_fuse(
        [bm_leg, cos_leg],
        "doc_id",
        ["bm25_rank", "cos_rank"],
        top_k=10,
    )


@register(
    "search_highlight_over_store", REGISTRY["search_bm25_highlight"][1]
)
def search_highlight_over_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Search + highlight SERVED FROM the index, under the scan
    edition's own oracle: BM25 top-10 comes from the postings store
    (token-pruned), and the snippets compute over a POINT LOOKUP of
    just those 10 documents (the hit ids are model-sized driver state;
    the corpus filter is an ``In(doc_id, …)`` the parquet scan pushes
    down) — the scan edition runs the highlight projection over the
    ENTIRE corpus and joins it down to 10 rows.  This is the ES
    search+highlight serving shape: stored-field fetch per hit, not a
    corpus pass per query."""
    from .operators.text import bm25_over_store, highlight_snippets

    store = _shared_bm25_store(spark, sf_dir)
    terms = ["spark", "table", "stream"]
    bm = bm25_over_store(spark, store, terms, top_k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )
    hit_ids = [r["doc_id"] for r in bm.collect()]
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isin(hit_ids)
    )
    hl = highlight_snippets(docs, "doc_id", "text", terms, window=30)
    return bm.join(hl, "doc_id").select(
        "doc_id", "score", "matched_term", "match_pos", "snippet"
    )


@register("search_dense_over_store", REGISTRY["similarity_topk"][1])
def search_dense_over_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense retrieval SERVED FROM the maintained IVF store, under the
    brute-force query's own oracle: ``ivf_exact_topk`` probes cells in
    upper-bound order (cos(q,x) ≤ q·centroid + stored max residual)
    and stops as soon as no unprobed cell can beat the provisional
    k-th rounded score — unprobed cells' parquet is never read, and
    the result is EXACTLY ``cosine_topk`` over the indexed vectors.
    The pruning bites on clustered corpora (the IVF premise); on this
    fixture's random-ish vectors it degrades to a certified full scan
    (the honest negative recorded in SCALING.md)."""
    from .operators.similarity import ivf_exact_topk

    store = _shared_ivf_store(spark, sf_dir)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    return ivf_exact_topk(
        spark, store, qv, "vec_id", k=10, exclude_id=0
    ).select("vec_id", "score")


@register(
    "search_dense_batch",
    """
    WITH q AS (
        SELECT vec_id AS q_id, embedding FROM embeddings
        WHERE vec_id IN (0, 1, 2)
    )
    SELECT q_id, vec_id, score FROM (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
                   AS score,
               row_number() OVER (
                   PARTITION BY q.q_id
                   ORDER BY round(list_cosine_similarity(
                       e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
                       DESC, e.vec_id ASC
               ) AS rk
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ) WHERE rk <= 10
    ORDER BY q_id ASC, score DESC, vec_id ASC
    """,
)
def search_dense_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense msearch over the IVF store
    (operators/similarity.py:ivf_exact_batch_topk): three corpus-drawn
    query vectors served in shared two-wave passes — each wave scans
    the UNION of the queries' probe cells once, with a per-(query,
    cell) allow mask inside the Arrow kernel so every query's result
    stays exactly its standalone run.  Oracle: per-query brute-force
    cosine top-10 (self excluded)."""
    from .operators.similarity import ivf_exact_batch_topk

    store = _shared_ivf_store(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2]))
        .orderBy("vec_id")
        .collect()
    ]
    return ivf_exact_batch_topk(
        spark, store, queries, "vec_id", k=10, exclude_self=True
    )


@register(
    "search_bm25_batch",
    """
    WITH qt(q_id, token) AS (
        VALUES (0, 'spark'), (0, 'table'),
               (1, 'stream'), (1, 'value'),
               (2, 'table'), (2, 'stream'), (2, 'spark')
    ),
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN (SELECT DISTINCT token FROM qt)
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    w AS (
        SELECT doc_id, token,
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    ),
    scores AS (
        SELECT q.q_id, w.doc_id, round(sum(w.w), 6) AS score
        FROM w JOIN qt q USING (token)
        GROUP BY q.q_id, w.doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY score DESC, doc_id ASC
        ) AS rk
        FROM scores
    )
    SELECT q_id::BIGINT AS q_id, doc_id, score
    FROM ranked WHERE rk <= 10
    ORDER BY q_id ASC, score DESC, doc_id ASC
    """,
)
def search_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched lexical serving — the ES ``msearch`` shape over the
    maintained index (operators/text.py:bm25_batch_over_store): three
    queries share ONE token-pruned postings scan; the query-independent
    per-(doc, token) BM25 weight is computed once and fanned out to
    queries through a broadcast (q_id, token) map, then one (q_id, doc)
    aggregation and a q_id-keyed window take each top-10.  Scoring is
    identical per query to ``bm25_over_store`` (the oracle replays the
    same math per q_id from the raw text)."""
    from .operators.text import bm25_batch_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return bm25_batch_over_store(
        spark,
        store,
        [
            (0, ["spark", "table"]),
            (1, ["stream", "value"]),
            (2, ["table", "stream", "spark"]),
        ],
        top_k=10,
    ).select("q_id", F.col("doc").alias("doc_id"), "score")


@register(
    "search_prefix",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token >= 's' AND token < 't'
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES prefix query over the postings store
    (operators/text.py:prefix_search_over_store): BM25 over every
    indexed term starting with 's', expanded by a half-open token
    RANGE the parquet scan pushes down — the token-range-clustered
    files make prefix queries prune exactly like exact-term ones."""
    from .operators.text import prefix_search_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return prefix_search_over_store(spark, store, "s", top_k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_facets",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'stream')
    )
    SELECT d.lang, count(*) AS n_docs
    FROM documents d JOIN matched USING (doc_id)
    GROUP BY d.lang
    ORDER BY n_docs DESC, lang ASC
    """,
)
def search_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation served from the index
    (operators/text.py:facets_over_store): per-language document
    counts over the FULL set of docs matching any query term — the
    matched ids come from one token-pruned postings scan and the
    language from the docstats-stored field (doc values), so the
    corpus is never touched."""
    from .operators.text import facets_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return facets_over_store(
        spark, store, ["spark", "stream"], "lang"
    )


@register(
    "search_bool",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream', 'value')
        GROUP BY doc_id, token
    ),
    cand AS (
        SELECT doc_id FROM tf WHERE token IN ('spark', 'table')
        GROUP BY doc_id HAVING count(DISTINCT token) = 2
    ),
    blocked AS (SELECT DISTINCT doc_id FROM tf WHERE token = 'value'),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT t.doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf t
    JOIN cand USING (doc_id)
    ANTI JOIN blocked USING (doc_id)
    JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    WHERE t.token IN ('spark', 'table', 'stream')
    GROUP BY t.doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool query over the postings store
    (operators/text.py:bool_search_over_store): must=[spark, table]
    gates membership (all required), should=[stream] boosts scoring,
    must_not=[value] blocks — one token-pruned postings scan, gates as
    a distinct-token count + a broadcast anti-join, BM25 over the
    must+should matches of the surviving candidates."""
    from .operators.text import bool_search_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return bool_search_over_store(
        spark,
        store,
        must=["spark", "table"],
        should=["stream"],
        must_not=["value"],
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_fuzzy",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT DISTINCT token FROM toks WHERE length(token) > 0),
    expanded AS (
        SELECT token FROM vocab
        WHERE levenshtein(token, 'sow') <= 1
           OR levenshtein(token, 'steam') <= 1
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN (SELECT token FROM expanded)
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzziness over the postings store: the misspelled query
    terms [sow, steam] expand against the INDEX VOCABULARY (distinct
    stored tokens, index-metadata-sized) to every token within
    Levenshtein 1 — on this corpus {row, slow, stream} — then plain
    BM25 serves the expanded set from the store.  The oracle replays
    the same expansion + scoring from the raw text."""
    from .operators.text import bm25_over_store, expand_fuzzy_terms

    store = _shared_bm25_store(spark, sf_dir)
    expanded = expand_fuzzy_terms(
        spark, store, ["sow", "steam"], max_dist=1
    )
    return bm25_over_store(spark, store, expanded, top_k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register("search_mlt_over_store", REGISTRY["search_more_like_this"][1])
def search_mlt_over_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this SERVED FROM the maintained BM25 index, under the
    scan-path query's own oracle: the seed's term frequencies come
    from tokenizing ONE document (a doc_id point lookup on the
    corpus), the per-term document frequencies come from a POSTINGS
    AGGREGATE filtered to the seed's terms (``PushedFilters:
    In(token, …)`` — the index prunes to the seed's vocabulary
    instead of re-tokenizing the corpus), the corpus size is one
    column-pruned count, and the keyword scoring runs driver-side
    over ≤ seed-distinct-terms rows.  The BM25 stage then scores the
    keywords over the store with the seed excluded from every
    statistic (``exclude_docs`` — corpus-minus-seed, exactly the
    scan edition's semantics).  Must equal ``search_more_like_this``
    row for row."""
    import math as _math

    from .operators.text import _bm_postings_path, bm25_over_store

    store = _shared_bm25_store(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    seed_tf = {
        r["term"]: r["tf"]
        for r in docs.filter(F.col("doc_id") == 0)
        .select(
            F.explode(
                F.split(F.trim(F.col("text")), r"\s+")
            ).alias("term")
        )
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
        .collect()
    }
    postings = spark.read.parquet(_bm_postings_path(store))
    dfreq = {
        r["token"]: r["df"]
        for r in postings.filter(F.col("token").isin(*seed_tf))
        .groupBy("token")
        .agg(F.countDistinct("doc").alias("df"))
        .collect()
    }
    n = docs.select(F.countDistinct("doc_id")).head()[0]
    scored = sorted(
        (
            (-round(tf * _math.log(n / dfreq[t]), 6), t)
            for t, tf in seed_tf.items()
        ),
    )
    kws = [t for _, t in scored[:3]]
    return bm25_over_store(
        spark, store, kws, top_k=10, exclude_docs=[0]
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "text_sample_stratified",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 / 4294967296.0
          < (CASE lang WHEN 'en' THEN 0.5 ELSE 0.2 END)
    """,
)
def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, "doc_id", "lang", rates={"en": 0.5}, default_rate=0.2
    )


@register(
    "text_sample_weighted",
    """
    SELECT doc_id, lang, (length(text) + 1)::BIGINT AS __weight
    FROM documents
    ORDER BY ln((doc_id * 2654435761 % 4294967296 + 0.5) / 4294967296.0)
             / (length(text) + 1) DESC
    LIMIT 500
    """,
)
def text_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): exactly 500 documents, inclusion probability proportional
    to text length, from ONE scan with no global sort — the per-row
    key ln(u)/w ranks through TakeOrderedAndProject (bounded
    per-partition heaps + a k×partitions driver merge; plan pinned in
    the contracts suite).  The uniform u derives from the id via the
    Knuth multiplicative hash, so the oracle reproduces the exact
    same sample with plain SQL."""
    from .operators.text import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return weighted_sample_topk(
        docs, "doc_id", (F.length("text") + F.lit(1)).cast("long"), k=500
    ).select("doc_id", "lang", "__weight")


@register(
    "text_sample_weighted_grouped",
    """
    WITH keyed AS (
        SELECT doc_id, lang, (length(text) + 1)::BIGINT AS __weight,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ln((doc_id * 2654435761 % 4294967296 + 0.5)
                              / 4294967296.0) / (length(text) + 1) DESC,
                            doc_id ASC
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, __weight FROM keyed WHERE rn <= 40
    """,
)
def text_sample_weighted_grouped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balanced per-language weighted sample: 40 documents per lang,
    inclusion probability proportional to text length within each
    language (A-ES key per group).  Two salted window stages — no
    task sorts a whole language; the oracle is the textbook
    single-window row_number, pinning the staged form exactly."""
    from .operators.text import weighted_sample_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return weighted_sample_per_group(
        docs,
        "doc_id",
        "lang",
        (F.length("text") + F.lit(1)).cast("long"),
        k=40,
    ).select("doc_id", "lang", "__weight")


@register(
    "text_token_budget_sample",
    """
    WITH t AS (
        SELECT doc_id, lang,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS __tokens,
               doc_id * 2654435761 % 4294967296 AS k
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, __tokens,
               coalesce(sum(__tokens) OVER (
                   PARTITION BY lang ORDER BY k ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS before
        FROM t
    )
    SELECT doc_id, lang, __tokens FROM c WHERE before < 2000
    """,
)
def text_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget sampling: keep a deterministic
    random prefix of each language's documents until ~2000 tokens
    are consumed (greedy prefix, last doc may overshoot) — the unit
    real data mixtures are specified in.  Oracle replays the same
    hash order and running sum in SQL."""
    from .operators.text import token_budget_sample, token_count_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return token_budget_sample(
        docs,
        "doc_id",
        "lang",
        token_count_col(F.col("text")).cast("long"),
        budget=2000,
    ).select("doc_id", "lang", "__tokens")


@register(
    "table_profile",
    """
    WITH t AS (SELECT count(*)::BIGINT AS n_rows FROM lineitem)
    SELECT p.* FROM t, LATERAL (
        SELECT 'l_orderkey' AS "column", n_rows,
               (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)::BIGINT AS n_nulls,
               (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT AS n_distinct,
               (SELECT CAST(min(l_orderkey) AS VARCHAR) FROM lineitem) AS min_value,
               (SELECT CAST(max(l_orderkey) AS VARCHAR) FROM lineitem) AS max_value
        UNION ALL
        SELECT 'l_suppkey', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_suppkey) FROM lineitem)::BIGINT,
               (SELECT CAST(min(l_suppkey) AS VARCHAR) FROM lineitem),
               (SELECT CAST(max(l_suppkey) AS VARCHAR) FROM lineitem)
        UNION ALL
        SELECT 'l_returnflag', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_returnflag) FROM lineitem)::BIGINT,
               (SELECT min(l_returnflag) FROM lineitem),
               (SELECT max(l_returnflag) FROM lineitem)
        UNION ALL
        SELECT 'l_linestatus', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_linestatus IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_linestatus) FROM lineitem)::BIGINT,
               (SELECT min(l_linestatus) FROM lineitem),
               (SELECT max(l_linestatus) FROM lineitem)
    ) p
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass ingest-QA profile (operators/profile.py): nulls,
    distincts, min/max for every column in ONE aggregation — the
    oracle does it the naive way (one subquery per statistic) and the
    results must match exactly."""
    from .operators.profile import table_profile as profile

    li = load_table(spark, sf_dir, "lineitem")
    return profile(
        li, ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    )


@register(
    "table_profile_approx",
    """
    WITH t AS (SELECT count(*)::BIGINT AS n_rows FROM lineitem)
    SELECT p.* FROM t, LATERAL (
        SELECT 'l_orderkey' AS "column", n_rows,
               (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)::BIGINT AS n_nulls,
               (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT AS n_distinct,
               (SELECT CAST(min(l_orderkey) AS VARCHAR) FROM lineitem) AS min_value,
               (SELECT CAST(max(l_orderkey) AS VARCHAR) FROM lineitem) AS max_value,
               true AS hll_ok
        UNION ALL
        SELECT 'l_suppkey', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_suppkey) FROM lineitem)::BIGINT,
               (SELECT CAST(min(l_suppkey) AS VARCHAR) FROM lineitem),
               (SELECT CAST(max(l_suppkey) AS VARCHAR) FROM lineitem),
               true
        UNION ALL
        SELECT 'l_returnflag', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_returnflag IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_returnflag) FROM lineitem)::BIGINT,
               (SELECT min(l_returnflag) FROM lineitem),
               (SELECT max(l_returnflag) FROM lineitem),
               true
        UNION ALL
        SELECT 'l_linestatus', n_rows,
               (SELECT count(*) FROM lineitem WHERE l_linestatus IS NULL)::BIGINT,
               (SELECT count(DISTINCT l_linestatus) FROM lineitem)::BIGINT,
               (SELECT min(l_linestatus) FROM lineitem),
               (SELECT max(l_linestatus) FROM lineitem),
               true
    ) p
    """,
)
def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profile path under a tolerance oracle
    (operators/profile.py:table_profile_certified): the approx plan —
    HLL++ ``approx_count_distinct``, ONE aggregation pass with NO
    Expand multiplication of the scan (plan-contract pinned) — runs
    alongside an exact certification pass; the oracle pins the exact
    statistics cross-engine and ``hll_ok`` certifies each HLL
    estimate within 5% of the exact distinct count."""
    from .operators.profile import table_profile_certified

    li = load_table(spark, sf_dir, "lineitem")
    return table_profile_certified(
        li, ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    )


@register(
    "profile_incremental",
    """
    WITH t AS (SELECT count(*)::BIGINT AS n_rows FROM documents)
    SELECT p.* FROM t, LATERAL (
        SELECT 'doc_id' AS "column", n_rows,
               (SELECT count(*) FROM documents WHERE doc_id IS NULL)::BIGINT AS n_nulls,
               true AS hll_ok, true AS merge_close
        UNION ALL
        SELECT 'lang', n_rows,
               (SELECT count(*) FROM documents WHERE lang IS NULL)::BIGINT,
               true, true
        UNION ALL
        SELECT 'source', n_rows,
               (SELECT count(*) FROM documents WHERE source IS NULL)::BIGINT,
               true, true
        UNION ALL
        SELECT 'text', n_rows,
               (SELECT count(*) FROM documents WHERE text IS NULL)::BIGINT,
               true, true
    ) p
    """,
)
def profile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profile that never re-scans history: documents feed the
    mergeable DataSketches-HLL store in three batches, and the merged
    result must equal the one-shot whole-corpus sketch EXACTLY
    (``merge_exact`` — HLL union is register-wise max, so the merge
    itself introduces zero error) while each estimate lands within 5%
    of the exact distinct count (``hll_ok``).  Exact row/null counts
    pinned cross-engine."""
    import shutil
    import tempfile

    from .operators.profile import incremental_profile, profile_over_store

    cols = ["doc_id", "text", "lang", "source"]
    docs = load_table(spark, sf_dir, "documents").select(*cols)
    base = tempfile.mkdtemp(prefix="prof_store_")
    try:
        for i in range(3):
            incremental_profile(
                spark,
                docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i),
                os.path.join(base, "store"),
                cols,
            )
        merged = profile_over_store(spark, os.path.join(base, "store"))
        aggs = []
        for c in cols:
            aggs.append(
                F.expr(
                    "cast(round(hll_sketch_estimate(hll_sketch_agg("
                    f"cast(`{c}` as string)))) as bigint)"
                ).alias(f"__os_{c}")
            )
            aggs.append(F.countDistinct(F.col(c)).alias(f"__ex_{c}"))
        one = docs.agg(*aggs)
        ref = None
        for c in cols:
            row = one.select(
                F.lit(c).alias("column"),
                F.col(f"__os_{c}").alias("__oneshot"),
                F.col(f"__ex_{c}").alias("__exact"),
            )
            ref = row if ref is None else ref.unionByName(row)
        rows = (
            merged.join(ref, "column")
            .select(
                "column",
                "n_rows",
                "n_nulls",
                (
                    F.abs(F.col("approx_distinct") - F.col("__exact"))
                    <= 0.05 * F.col("__exact")
                ).alias("hll_ok"),
                (
                    F.abs(F.col("approx_distinct") - F.col("__oneshot"))
                    <= 0.02 * F.col("__oneshot")
                ).alias("merge_close"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, "
        "hll_ok boolean, merge_close boolean",
    )


@register(
    "table_quantiles_approx",
    """
    WITH q AS (
        SELECT quantile_cont(l_quantity, [0.5, 0.9, 0.99]) AS ql,
               quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS qe
        FROM lineitem
    )
    SELECT 'l_quantity' AS "column", round(ql[1], 6) AS p50,
           round(ql[2], 6) AS p90, round(ql[3], 6) AS p99,
           true AS approx_ok FROM q
    UNION ALL
    SELECT 'l_extendedprice', round(qe[1], 6), round(qe[2], 6),
           round(qe[3], 6), true FROM q
    """,
)
def table_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path under a tolerance oracle
    (operators/profile.py:table_quantiles_certified):
    ``approx_percentile`` (KLL-style mergeable sketch, no per-
    partition value buffering) runs alongside the exact
    ``percentile`` pass; the oracle pins the exact percentiles
    cross-engine and ``approx_ok`` certifies every sketch estimate
    within 5% of its exact counterpart."""
    from .operators.profile import table_quantiles_certified

    li = load_table(spark, sf_dir, "lineitem")
    return table_quantiles_certified(
        li, ["l_quantity", "l_extendedprice"]
    )


@register(
    "salted_skew_join",
    """
    WITH stats AS (
        SELECT source, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, s.n_docs, s.total_chars
    FROM documents d JOIN stats s USING (source)
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation join: documents (hot low-cardinality `source`
    keys) against per-source stats via salting — every hot key's rows
    split across n_salts shuffle partitions instead of one straggler
    task (operators/joins.salted_join; result equals the plain join
    exactly).  The merge hint forces the shuffle path the operator
    exists for — broadcasting would hide the skew problem the demo
    measures."""
    from .operators.joins import salted_join

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return salted_join(
        docs.select("doc_id", "source"), stats.hint("merge"), ["source"]
    ).select("doc_id", "source", "n_docs", "total_chars")


@register(
    "bucketed_colocated_join",
    """
    SELECT l_orderkey AS order_key,
           count(*)::BIGINT AS n_lines,
           sum(l_quantity) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pay-the-shuffle-once layout: fact tables written bucketed +
    in-bucket sorted on the join key, then the per-order rollup join
    runs with ZERO exchanges (plan-contract pinned) — the scan itself
    carries the hash distribution and sort order.  At 100 TB this is
    the difference between an interactive join and re-shuffling both
    tables per query."""
    import hashlib
    import tempfile

    from .plans.bucketed import read_bucketed, write_bucketed

    # fixed per-sf_dir location: overwrite-in-place keeps repeated
    # runs (bench min-of-N) from accumulating table copies in /tmp.
    # The catalog names carry the same tag as the data path — two
    # sf_dirs sharing one Spark session/metastore would otherwise race
    # on DROP TABLE + saveAsTable of a single fixed name
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"bucketed_{tag}")
    li_name, ord_name = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    write_bucketed(
        li, li_name, ["l_orderkey"], 16, f"{base}/li",
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders, ord_name, ["o_orderkey"], 16, f"{base}/ord",
        sort_cols=["o_orderkey"],
    )
    lb, ob = read_bucketed(spark, li_name), read_bucketed(spark, ord_name)
    return (
        lb.hint("merge")
        .join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .select(
            F.col("l_orderkey").alias("order_key"), "n_lines", "total_qty"
        )
    )


@register(
    "text_frequent_tokens",
    """
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT sum(c)::BIGINT AS n FROM vocab)
    SELECT n AS n_tokens,
           (SELECT count(*) FROM vocab, tot
             WHERE c > n / 65.0)::BIGINT AS n_heavy,
           true AS heavy_covered,
           true AS bounds_ok
    FROM tot
    """,
)
def text_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (operators/text.frequent_tokens, k=64)
    reduced to oracle-pinnable assertions:

    * ``n_tokens`` / ``n_heavy``: corpus token total and the number of
      distinct tokens above the N/(k+1) guarantee threshold — both
      computed independently in Spark and DuckDB;
    * ``heavy_covered``: every heavy token appears in the merged
      sketch summaries (the MG coverage guarantee, checked against
      Spark-exact counts);
    * ``bounds_ok``: for every sketch token present,
      ``count_min <= exact count <= count_max``.
    """
    from .operators.text import frequent_tokens, tokens_col

    k = 64
    docs = load_table(spark, sf_dir, "documents")
    sk = frequent_tokens(docs, "text", k=k, top=None)
    exact = (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    tot = exact.agg(F.sum("c").cast("long").alias("n"))
    heavy = exact.join(F.broadcast(tot)).filter(
        F.col("c") > F.col("n") / F.lit(float(k + 1))
    )
    n_heavy = heavy.count()
    covered = (
        heavy.join(sk, heavy.t == sk.token, "left_anti").limit(1).count() == 0
    )
    joined = sk.join(exact, sk.token == exact.t)
    bounds_ok = (
        joined.filter(
            (F.col("count_min") > F.col("c"))
            | (F.col("c") > F.col("count_max"))
        )
        .limit(1)
        .count()
        == 0
    )
    n_tokens = tot.first()["n"]
    return _verdict_frame(
        spark,
        [
            ("n_tokens", n_tokens, "long"),
            ("n_heavy", n_heavy, "long"),
            ("heavy_covered", covered, "boolean"),
            ("bounds_ok", bounds_ok, "boolean"),
        ],
    )


@register(
    "streaming_heavy_hitters",
    """
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT sum(c)::BIGINT AS n FROM vocab)
    SELECT n AS n_tokens,
           (SELECT count(*) FROM vocab, tot
             WHERE c > n / 65.0)::BIGINT AS n_heavy,
           true AS heavy_covered,
           true AS bounds_ok
    FROM tot
    """,
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING sketch path under the same hard oracle as its
    batch twin (text_frequent_tokens): the documents table replays as
    a file stream, sharded Misra-Gries state folds across triggers
    (streaming/heavy.py), and the latest-wins snapshot must satisfy
    the identical coverage + bracket guarantees — per-shard err <=
    n_shard/(k+1) <= N/(k+1), so every globally-heavy token survives
    the stream exactly as it would the batch pass.
    """
    import shutil
    import tempfile

    from .operators.text import tokens_col
    from .streaming.heavy import (
        heavy_hitters_snapshot,
        run_streaming_heavy_hitters,
    )

    k = 64
    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="hh_stream_")
    try:
        # the fixture ships documents.parquet as a single file (so the
        # file-stream source gets the parent dir + a glob), while the
        # scale-probe replicas write it as a parquet DIRECTORY — read
        # whichever layout is present
        schema = (
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        doc_path = os.path.join(sf_dir, "documents.parquet")
        reader = spark.readStream.schema(schema)
        if os.path.isdir(doc_path):
            stream = reader.parquet(doc_path)
        else:
            stream = reader.option(
                "pathGlobFilter", "documents.parquet"
            ).parquet(sf_dir)
        q = run_streaming_heavy_hitters(
            spark,
            stream,
            "text",
            f"{base}/sink",
            f"{base}/ckpt",
            k=k,
            n_shards=8,
        )
        # awaitTermination(timeout) returns False while the query is
        # still running; reading the sink then would race a live
        # writer (and the finally-rmtree would pull the directory out
        # from under it).  Stop and fail loudly instead.
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming heavy-hitters drain exceeded 300 s"
            )
        sk = heavy_hitters_snapshot(spark, f"{base}/sink", top=None)

        exact = (
            docs.filter(F.length(F.trim(F.col("text"))) > 0)
            .select(F.explode(tokens_col(F.col("text"))).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("c"))
        )
        tot = exact.agg(F.sum("c").cast("long").alias("n"))
        heavy = exact.join(F.broadcast(tot)).filter(
            F.col("c") > F.col("n") / F.lit(float(k + 1))
        )
        n_heavy = heavy.count()
        covered = (
            heavy.join(sk, heavy.t == sk.token, "left_anti").limit(1).count()
            == 0
        )
        joined = sk.join(exact, sk.token == exact.t)
        bounds_ok = (
            joined.filter(
                (F.col("count_min") > F.col("c"))
                | (F.col("c") > F.col("count_max"))
            )
            .limit(1)
            .count()
            == 0
        )
        n_tokens = tot.first()["n"]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return _verdict_frame(
        spark,
        [
            ("n_tokens", n_tokens, "long"),
            ("n_heavy", n_heavy, "long"),
            ("heavy_covered", covered, "boolean"),
            ("bounds_ok", bounds_ok, "boolean"),
        ],
    )


@register(
    "text_corpus_overlap",
    """
    WITH w AS (
        SELECT source, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT g, s FROM (
            SELECT source AS g,
                   unnest(list_distinct(
                       [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)])) AS s
            FROM w
        )
    ),
    counts AS (SELECT g, count(*) AS n FROM sh GROUP BY g),
    shared AS (
        SELECT a.g AS src_a, b.g AS src_b, count(*) AS n_shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.g < b.g
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, ca.n AS n_a, cb.n AS n_b, n_shared,
           floor(n_shared::DOUBLE / (ca.n + cb.n - n_shared) * 1000000)
               / 1000000 AS jaccard
    FROM shared
    JOIN counts ca ON src_a = ca.g
    JOIN counts cb ON src_b = cb.g
    """,
)
def text_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content overlap (distinct shingle Jaccard per
    source pair) — the corpus-level contamination question (see
    operators/text.corpus_overlap)."""
    from .operators.text import corpus_overlap

    docs = load_table(spark, sf_dir, "documents")
    return corpus_overlap(docs, "source", "text")


@register(
    "text_corpus_shuffle",
    """
    SELECT doc_id,
           (row_number() OVER (
                ORDER BY ((doc_id + 1) * 2654435761) % 4294967296,
                         doc_id) - 1)::BIGINT AS shuffle_pos
    FROM documents
    """,
)
def text_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle as a dataset column (see
    operators/text.corpus_shuffle — distributed two-pass prefix sum,
    no single-partition ranking)."""
    from .operators.text import corpus_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return corpus_shuffle(docs, "doc_id")


@register(
    "text_unigram_xent",
    """
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
    x AS (
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               floor(avg(-ln(c / n)) * 1000000) / 1000000 AS xent
        FROM tok JOIN vocab USING (t) CROSS JOIN tot
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(x.n_tokens, 0) AS n_tokens,
           coalesce(x.xent, 0.0) AS xent
    FROM documents d LEFT JOIN x USING (doc_id)
    """,
)
def text_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: per-doc cross-entropy vs the
    corpus unigram distribution (see operators/text.py)."""
    from .operators.text import unigram_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    return unigram_cross_entropy(docs, "doc_id", "text")


@register(
    "text_bigram_xent",
    """
    WITH t0 AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE length(trim(text)) > 0
    ),
    tok AS (SELECT doc_id, unnest(w) AS t FROM t0),
    uni AS (SELECT t, count(*) AS c1 FROM tok GROUP BY t),
    tot AS (SELECT sum(c1)::DOUBLE AS n FROM uni),
    pairs AS (
        SELECT doc_id,
               unnest([{'p': w[i], 'c': w[i + 1]}
                       for i in range(1, len(w))], recursive := true)
        FROM t0
    ),
    bi AS (SELECT p, c, count(*) AS c2 FROM pairs GROUP BY p, c),
    x AS (
        SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               floor(avg(-ln(0.7 * (c2 / up.c1)
                             + 0.3 * (uc.c1 / n))) * 1000000)
                   / 1000000 AS xent2
        FROM pairs
        JOIN bi USING (p, c)
        JOIN uni up ON pairs.p = up.t
        JOIN uni uc ON pairs.c = uc.t
        CROSS JOIN tot
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(x.n_bigrams, 0) AS n_bigrams,
           coalesce(x.xent2, 0.0) AS xent2
    FROM documents d LEFT JOIN x USING (doc_id)
    """,
)
def text_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fluency-style quality signal: per-doc cross-entropy under the
    corpus's interpolated bigram LM (see operators/text.py — catches
    word salad that unigram entropy misses)."""
    from .operators.text import bigram_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    return bigram_cross_entropy(docs, "doc_id", "text")


@register(
    "text_fertility",
    f"""
    WITH t AS (
        SELECT lang,
               length(text)::BIGINT AS n_chars,
               len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}'))::BIGINT AS n_tok
        FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           sum(n_tok)::BIGINT AS total_bpe,
           floor(sum(n_chars)::DOUBLE / sum(n_tok) * 1000000) / 1000000
               AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: characters per BPE-style
    pre-token — the standard tokenizer-efficiency report (fertility
    spread across languages is why multilingual tokenizers get
    re-trained).  Pure JVM regexp counting + one combined
    aggregation; the oracle counts the identical RE2/Java-shared
    pattern's matches."""
    from .operators.text import bpe_token_count_col

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        bpe_token_count_col(F.col("text")).cast("long").alias("n_tok"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tok").alias("total_bpe"),
        _floor6_local(
            F.sum("n_chars").cast("double") / F.sum("n_tok")
        ).alias("chars_per_token"),
    )


def _floor6_local(x):
    return F.floor(x * 1_000_000) / 1_000_000


@register(
    "text_train_split",
    """
    SELECT doc_id, source,
           CASE WHEN u < 0.9 THEN 'train'
                WHEN u < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               ((doc_id + 1) * 2654435761) % 4294967296
                   / 4294967296.0 AS u
        FROM documents
    )
    """,
)
def text_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic leak-free train/val/test assignment by hashed-id
    interval (engine-portable integer arithmetic; a doc's split never
    changes as the corpus grows)."""
    from .operators.text import train_val_test_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return train_val_test_split(docs, "doc_id")


@register(
    "text_split_cluster_safe",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w.comp FROM edges e JOIN walk w ON e.b = w.doc
    ),
    comp AS (SELECT doc, min(comp) AS rep FROM walk GROUP BY doc),
    r AS (
        SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
    )
    SELECT doc_id, rep,
           CASE WHEN u < 0.9 THEN 'train'
                WHEN u < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, rep,
               ((rep + 1) * 2654435761) % 4294967296
                   / 4294967296.0 AS u
        FROM r
    )
    """,
)
def text_split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free split hardened against near-duplicates: the
    hash-interval assignment is computed on each doc's near-dup
    cluster representative (jaccard>=0.8 connected components), so a
    paraphrase/mirror of a test document cannot land in train.
    Composes jaccard_pairs -> dedup_components -> one left join ->
    zero-shuffle hash projection."""
    from .operators.dedup import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    return cluster_safe_split(docs, "doc_id", "text", n=3, threshold=0.8)


@register(
    "text_corpus_stats",
    """
    WITH t AS (
        SELECT source, lang,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS n_tokens
        FROM documents
    )
    SELECT source, lang,
           count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           floor(sum(n_tokens)::DOUBLE / count(*) * 1000000) / 1000000
               AS avg_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM t GROUP BY source, lang
    """,
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the curation report: corpus composition by (source, lang) — one
    # partial+final aggregation over token counts.  avg_tokens is
    # computed as exact-bigint sum / count (one IEEE division, bit-
    # identical across engines) then floor-stabilized to 6 decimals;
    # the engines' own avg()/round() differ in the last ulp because
    # they accumulate/round differently.
    docs = load_table(spark, sf_dir, "documents")
    n = token_count_col(F.col("text")).cast("long")
    avg_stable = (
        F.floor(
            F.sum("n_tokens").cast("double") / F.count("*") * F.lit(1e6)
        )
        / F.lit(1e6)
    )
    return (
        docs.select("source", "lang", n.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            avg_stable.alias("avg_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@register(
    "text_pack_sequences",
    """
    WITH t AS (
        SELECT doc_id,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           ((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // 2048)::BIGINT
               AS seq_id
    FROM t
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: docs fill context windows of
    max_tokens in id order; a doc starts a new sequence when the
    running total crosses the cap.  Runs as a distributed two-pass
    prefix sum (contiguous id-range buckets -> per-bucket sums ->
    broadcast offsets -> bucket-local window) — no global
    single-partition window.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = token_count_col(F.col("text")).cast("long")
    with_n = docs.select("doc_id", n.alias("n_tokens"))
    return pack_sequences(
        with_n, "doc_id", "n_tokens", max_tokens=2048, n_buckets=32
    )


@register(
    "text_vocabulary",
    """
    SELECT token,
           count(*) AS term_freq,
           count(DISTINCT doc_id) AS doc_freq
    FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    )
    WHERE length(token) > 0
    GROUP BY token
    ORDER BY term_freq DESC, token ASC
    LIMIT 1000
    """,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return vocabulary(docs, "doc_id", "text", top_k=1000)


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   [(ascii(substr(t, 1, 1)) * 31 + length(t))::BIGINT
                    for t in string_split_regex(trim(text), '\\s+')]),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint_col(F.col("text")).alias("fingerprint")
    )


_TOKS_CTE = """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    )
"""


@register(
    "text_repetition",
    _TOKS_CTE
    + """
    , m AS (
        SELECT doc_id, toks, len(toks)::BIGINT AS n,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
        FROM t
    )
    SELECT doc_id, n AS n_tokens,
        CASE WHEN n > 0 THEN floor(
            (list_max(list_transform(list_distinct(toks),
                t -> len(list_filter(toks, x -> x = t))))::DOUBLE / n)
            * 1000000) / 1000000 END AS top_token_frac,
        CASE WHEN n > 1 THEN floor(
            (list_max(list_transform(list_distinct(bigrams),
                t -> len(list_filter(bigrams, x -> x = t))))::DOUBLE
             / (n - 1)) * 1000000) / 1000000 END AS top_bigram_frac,
        CASE WHEN n > 0 THEN floor(
            ((n - len(list_distinct(toks)))::DOUBLE / n) * 1000000)
            / 1000000 END AS dup_token_frac
    FROM m
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition filter signals — shuffle-free per-doc
    # higher-order folds (operators/text.py:repetition_features)
    docs = load_table(spark, sf_dir, "documents")
    return repetition_features(docs, "doc_id", "text")


@register(
    "text_contamination",
    _TOKS_CTE
    + """
    , g AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
                              i -> array_to_string(toks[i:i+4], ' ')) AS grams
        FROM t
    ), bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
    ), hits AS (
        SELECT e.doc_id, count(*) AS cnt
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g) e
        JOIN bench USING (gram) GROUP BY e.doc_id
    )
    SELECT g.doc_id, len(g.grams)::BIGINT AS n_grams,
           coalesce(hits.cnt, 0)::BIGINT AS n_contaminated,
           coalesce(hits.cnt, 0) > 0 AS contaminated
    FROM g LEFT JOIN hits USING (doc_id)
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # benchmark decontamination: word-5-gram overlap of every doc
    # against the deterministic "benchmark" slice (doc_id % 97 == 0);
    # broadcast bench grams, one doc-keyed shuffle
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = contamination(docs, "doc_id", "text", bench, n=5)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        "contaminated",
    )


@register(
    "text_contamination_bloom",
    _TOKS_CTE
    + """
    , g AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
                              i -> array_to_string(toks[i:i+4], ' ')) AS grams
        FROM t
    ), bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 89 = 0
    ), hits AS (
        SELECT e.doc_id, count(*) AS cnt
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g) e
        JOIN bench USING (gram) GROUP BY e.doc_id
    )
    SELECT g.doc_id, len(g.grams)::BIGINT AS n_grams,
           coalesce(hits.cnt, 0)::BIGINT AS n_contaminated,
           coalesce(hits.cnt, 0) > 0 AS contaminated
    FROM g LEFT JOIN hits USING (doc_id)
    """,
)
def text_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (operators/text.py:
    contamination_bloom): the benchmark grams build a 2^20-bit / 4-
    probe xxhash64 Bloom bitmap (bounded 128 KB driver state shipped
    as ONE array<long> literal), corpus grams test membership as pure
    codegen bit arithmetic, and only survivors reach the exact join —
    the trillion-gram shape where the benchmark side is too big to
    broadcast and the exact join would otherwise shuffle every corpus
    gram.  The Bloom stage is INVISIBLE to the result (false
    positives die in the exact verify), so the oracle is the plain
    exact-overlap SQL — a hard equality, not a recall bound."""
    from .operators.text import contamination_bloom

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    out = contamination_bloom(docs, "doc_id", "text", bench, n=5)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        "contaminated",
    )


@register(
    "text_rare_bigrams",
    _TOKS_CTE
    + """
    , g AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                              i -> toks[i] || ' ' || toks[i + 1]) AS grams
        FROM t
    ), e AS (
        SELECT doc_id, unnest(grams) AS gram FROM g
    ), cf AS (
        SELECT gram, count(*) AS c FROM e GROUP BY gram
    ), rare AS (
        SELECT gram FROM cf WHERE c <= 2
    ), hits AS (
        SELECT e.doc_id, count(*) AS nr
        FROM e JOIN rare USING (gram) GROUP BY e.doc_id
    )
    SELECT g.doc_id, len(g.grams)::BIGINT AS n_grams,
           coalesce(hits.nr, 0)::BIGINT AS n_rare,
           CASE WHEN len(g.grams) > 0
                THEN floor(coalesce(hits.nr, 0)::DOUBLE / len(g.grams)
                           * 1000000) / 1000000 END AS rare_frac
    FROM g LEFT JOIN hits USING (doc_id)
    """,
)
def text_rare_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer-exact perplexity stand-in: density of corpus-rare word
    # bigrams per doc (operators/text.py:rare_ngram_density)
    from .operators.text import rare_ngram_density

    docs = load_table(spark, sf_dir, "documents")
    return rare_ngram_density(
        docs, "doc_id", "text", n=2, max_corpus_freq=2
    )


@register(
    "similarity_knn_graph",
    """
    WITH pairs AS (
        -- DOUBLE[] casts: list_dot_product on FLOAT[] accumulates in
        -- float32 (~1e-7 error), which flips round(...,6) boundaries
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT i, j, cosine, rk FROM (
        SELECT i, j, cosine,
               row_number() OVER (PARTITION BY i
                                  ORDER BY cosine DESC, j ASC) AS rk
        FROM pairs)
    WHERE rk <= 5
    """,
)
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact kNN graph over the blocked gram matrix; the adaptive
    # block default keeps >= 2 blocks at sf0.01, so the oracle
    # exercises the multi-block grid, not the degenerate one-cell case
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_graph(emb, "vec_id", "embedding", k=5)


_SEED_DISTANCE_ORACLE = """
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (PARTITION BY i
                                      ORDER BY cosine DESC, j ASC) AS rk
            FROM pairs)
        WHERE rk <= 5
    ),
    edges AS (
        SELECT i AS a, j AS b FROM knn
        UNION
        SELECT j AS a, i AS b FROM knn
    ),
    walk AS (
        SELECT vec_id AS doc, 0 AS dist
        FROM embeddings WHERE vec_id % 50 = 0
        UNION
        SELECT e.b AS doc, w.dist + 1 AS dist
        FROM walk w JOIN edges e ON e.a = w.doc
        WHERE w.dist < 4
    )
    SELECT doc, min(dist)::BIGINT AS dist FROM walk GROUP BY doc
    """


@register("graph_seed_distance", _SEED_DISTANCE_ORACLE)
def graph_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-distance-from-trusted-seeds quality signal
    (operators/similarity.py:seed_distance): minimum hops from the
    deterministic seed slice (vec_id % 50 == 0) over the symmetrized
    exact 5-NN embedding graph, horizon 4.  Frontier BFS — max_depth
    rounds of one edge-frontier equi-join + one settled anti-join,
    each frontier eagerly checkpointed; integer distances make the
    iterative result exactly value-pinnable against DuckDB's bounded
    recursive CTE."""
    from .operators.similarity import seed_distance

    emb = load_table(spark, sf_dir, "embeddings")
    edges = _shared_knn_edges(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("doc")
    )
    return seed_distance(edges, seeds, id_col="doc", max_depth=4)


@register("graph_seed_distance_incremental", _SEED_DISTANCE_ORACLE)
def graph_seed_distance_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The persisted edition of ``graph_seed_distance`` under the
    SAME cross-engine oracle: the 5-NN edge set arrives in three
    hash-split batches (mixed order; seeds fold with the MIDDLE batch
    — min hop distance composes across arrival orders, so no feed
    ordering is required), each batch folds into the append-only
    edge + distance stores via ``incremental_seed_distance``, and the
    final ``seed_distance_over_store`` view must equal the one-shot
    BFS row for row.  The middle batch is re-delivered once to pin
    the replay no-op on the formal record."""
    import shutil
    import tempfile

    from .operators.similarity import (
        incremental_seed_distance,
        seed_distance_over_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    edges = _shared_knn_edges(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("doc")
    )
    base = tempfile.mkdtemp(prefix="sd_store_")
    try:
        store = os.path.join(base, "sd")
        split = F.pmod(F.xxhash64("i", "j"), F.lit(3))
        for b in range(3):
            incremental_seed_distance(
                spark,
                store,
                edges_batch=edges.filter(split == b),
                seeds_batch=seeds if b == 1 else None,
                max_depth=4,
            )  # fold is eager; the returned frame is discarded
            if b == 1:  # replay: must change neither store nor view
                incremental_seed_distance(
                    spark,
                    store,
                    edges_batch=edges.filter(split == b),
                    seeds_batch=seeds,
                    max_depth=4,
                )  # fold is eager; the returned frame is discarded
        rows = seed_distance_over_store(spark, store).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, dist long")


@register("streaming_seed_distance", _SEED_DISTANCE_ORACLE)
def streaming_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seed-distance store maintained through Structured
    Streaming under the batch BFS's hard oracle: the 5-NN edge set
    replays as a 3-file hash-split feed (one trigger per file, NO
    ordering required — min hop distance composes), each micro-batch
    folds into the edge + distance stores, and the final
    ``seed_distance_over_store`` view must equal the one-shot
    ``seed_distance`` row for row."""
    import glob
    import shutil
    import tempfile

    from .operators.similarity import seed_distance_over_store
    from .streaming.seed_distance import run_streaming_seed_distance

    emb = load_table(spark, sf_dir, "embeddings")
    edges = _shared_knn_edges(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("doc")
    )

    def build_feed(feed: str) -> None:
        split = F.pmod(F.xxhash64("i", "j"), F.lit(3))
        for b in range(3):
            edges.filter(split == b).coalesce(1).write.mode(
                "append"
            ).parquet(feed)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + b * 60,) * 2)

    base = tempfile.mkdtemp(prefix="sd_stream_")
    try:
        feed = _shared_stream_feed(spark, sf_dir, "sd_feed", build_feed)
        stream = (
            spark.readStream.schema("i long, j long")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_seed_distance(
            spark,
            stream,
            seeds,
            os.path.join(base, "sd"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            max_depth=4,
        )
        q.awaitTermination()
        rows = seed_distance_over_store(
            spark, os.path.join(base, "sd")
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "doc long, dist long")


@register(
    "text_domain_mix",
    """
    WITH c AS (
        SELECT lang, count(*)::BIGINT AS n_g,
               floor(sqrt(count(*)::DOUBLE) * 1000000)::BIGINT AS w_g
        FROM documents GROUP BY lang
    ), tot AS (
        SELECT sum(n_g)::BIGINT AS n, sum(w_g)::BIGINT AS w FROM c
    ), r AS (
        SELECT lang,
               least(1.0, (w_g::DOUBLE / w::DOUBLE) * n / n_g) AS rate
        FROM c, tot
    )
    SELECT d.doc_id, d.lang,
           floor(r.rate * 1000000) / 1000000 AS rate
    FROM documents d JOIN r USING (lang)
    WHERE (d.doc_id * 2654435761) % 4294967296 / 4294967296.0 < r.rate
    """,
)
def text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # temperature (alpha=0.5) language rebalancing with exact-integer
    # group weights — see operators/text.py:temperature_sample
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_sample(docs, "doc_id", "lang", alpha=0.5)


@register(
    "text_chunk",
    _TOKS_CTE
    + """
    , c AS (
        SELECT doc_id, toks,
               1 + ceil(greatest(len(toks) - 64, 0)::DOUBLE / 48)::INT
                   AS n_chunks
        FROM t
    ), e AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, n_chunks)) AS i
        FROM c
    )
    SELECT doc_id, (i - 1)::BIGINT AS chunk_id,
           array_to_string(toks[((i-1)*48+1):((i-1)*48+64)], ' ')
               AS chunk_text,
           (CASE WHEN len(toks) = 0 THEN 0
                 ELSE len(toks[((i-1)*48+1):((i-1)*48+64)])
            END)::BIGINT AS chunk_tokens
    FROM e
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # overlapping 64-token windows, stride 48 — retrieval/embedding
    # chunking as a pure JVM explode (operators/text.py:chunk_documents)
    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)
    return out.select(
        "doc_id",
        "chunk_id",
        "chunk_text",
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )


@register(
    "pipeline_curate",
    """
    WITH RECURSIVE t0 AS (
        SELECT doc_id, lang, text,
               string_split_regex(trim(text), '\\s+') AS w,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS n_tokens
        FROM documents
    ),
    feats AS (
        SELECT doc_id, n_tokens::DOUBLE AS n,
               len(list_distinct(w))::DOUBLE / nullif(n_tokens, 0) AS dr,
               len(list_filter(w, x -> x IN
                   ('the','a','of','to','in','and','is','on')))::DOUBLE
                   / nullif(n_tokens, 0) AS sr,
               length(array_to_string(w, ''))::DOUBLE
                   / nullif(n_tokens, 0) AS ml
        FROM t0
    ),
    kept AS (
        SELECT t0.doc_id, t0.lang, t0.w, t0.n_tokens
        FROM t0 JOIN feats USING (doc_id)
        WHERE floor((least(feats.n / 200.0, 1.0) * 0.3 + dr * 0.3
                    + (1.0 - sr) * 0.2 + least(ml / 8.0, 1.0) * 0.2)
                    * 1000000) / 1000000 >= 0.52
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(w[i:i+2], ' ')
                    for i in range(1, len(w) - 1)])) AS s
        FROM kept
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT i, j FROM shared
        JOIN counts ca ON i = ca.doc_id
        JOIN counts cb ON j = cb.doc_id
        WHERE round(shared::DOUBLE / (ca.n + cb.n - shared), 6) >= 0.8
    ),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w2.comp FROM edges e JOIN walk w2 ON e.b = w2.doc
    ),
    losers AS (
        SELECT doc FROM walk GROUP BY doc HAVING doc <> min(comp)
    ),
    surv AS (
        SELECT k.doc_id, k.lang, k.n_tokens
        FROM kept k LEFT JOIN losers l ON k.doc_id = l.doc
        WHERE l.doc IS NULL
    ),
    c AS (
        SELECT lang, count(*)::BIGINT AS n_g,
               floor(sqrt(count(*)::DOUBLE) * 1000000)::BIGINT AS w_g
        FROM surv GROUP BY lang
    ),
    tot AS (SELECT sum(n_g)::BIGINT AS n, sum(w_g)::BIGINT AS w FROM c),
    r AS (
        SELECT lang,
               least(1.0, (w_g::DOUBLE / w::DOUBLE) * n / n_g) AS rate
        FROM c, tot
    ),
    sampled AS (
        SELECT s.doc_id, s.lang, s.n_tokens
        FROM surv s JOIN r USING (lang)
        WHERE (s.doc_id * 2654435761) % 4294967296 / 4294967296.0 < r.rate
    )
    SELECT doc_id, lang, n_tokens,
           ((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
            // 2048)::BIGINT AS seq_id
    FROM sampled
    """,
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline — the end-to-end shape a
    training-data run takes, as ONE declarative plan:

        quality filter (>= 0.52 composite score)
          -> near-duplicate drop (MinHash-LSH + components, keep min)
          -> temperature domain mix (alpha=0.5 over lang)
          -> sequence packing (2048-token windows, id order)

    Each stage is the already-oracle-checked operator; the value of
    this entry is proving they COMPOSE — one lazy DataFrame chain,
    one oracle, stage boundaries free of collect()s (the only
    driver-side data: the pack stage's 32-row bucket offsets and the
    components loop's convergence flag).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scores = quality_features(docs, "doc_id", "text")
    kept = docs.join(
        scores.filter(F.col("quality_score") >= 0.52).select("doc_id"),
        "doc_id",
    )
    surv = drop_near_duplicates(kept, "doc_id", "text", n=3, threshold=0.8)
    # lazy persist: `mixed` feeds both the token-count join into the
    # packer AND the final label join — without it the whole
    # quality->dedup->mix chain evaluates once per consumer
    mixed = temperature_sample(
        surv.select("doc_id", "lang"), "doc_id", "lang", alpha=0.5
    ).select("doc_id", "lang").persist()
    with_counts = mixed.join(
        docs.select(
            "doc_id",
            token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        ),
        "doc_id",
    )
    packed = pack_sequences(with_counts, "doc_id", "n_tokens")
    return packed.join(mixed, "doc_id").select(
        "doc_id", "lang", "n_tokens", "seq_id"
    )


@register(
    "events_sessionize",
    """
    WITH o AS (
        SELECT user_id, event_id, epoch_ms(ts)::BIGINT AS ts_ms
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts_ms,
               CASE WHEN lag(ts_ms) OVER w IS NULL
                         OR ts_ms - lag(ts_ms) OVER w > 1800000
                    THEN 1 ELSE 0 END AS is_new
        FROM o WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts_ms, event_id)
    ), numbered AS (
        SELECT user_id, ts_ms,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1
                   AS session_id
        FROM flagged
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*) AS n_events,
           min(ts_ms) AS start_ms,
           max(ts_ms) AS end_ms,
           (max(ts_ms) - min(ts_ms))::BIGINT AS duration_ms
    FROM numbered GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 30-minute-gap sessionization; one exchange on user_id shared by
    # both windows and the aggregation (operators/sessions.py)
    from .operators.sessions import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000000").alias("ts_ms")
    )
    return sessionize(
        ev, "user_id", "ts_ms", "event_id", gap_ms=30 * 60 * 1000
    )


@register(
    "text_corpus_rollup",
    r"""
    WITH t AS (
        SELECT source, lang,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+'))
                END)::BIGINT AS n_tok
        FROM documents
    )
    SELECT coalesce(source, '<all>') AS source,
           coalesce(lang, '<all>') AS lang,
           count(*) AS n_docs,
           sum(n_tok)::BIGINT AS total_tokens
    FROM t GROUP BY ROLLUP (source, lang)
    """,
)
def text_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity corpus accounting in ONE pass: per
    (source, lang), per source, and grand total via ROLLUP — Catalyst
    compiles the grouping sets into a single Expand + aggregate, so
    the reporting layer costs one scan instead of three queries.
    NULL grouping slots render as '<all>' to keep the frame
    join-friendly."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        "lang",
        token_count_col(F.col("text")).cast("long").alias("n_tok"),
    )
    return (
        t.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_tokens",
        )
    )


@register(
    "corpus_diff",
    """
    WITH a AS (
        SELECT doc_id, md5(text) AS h FROM documents
        WHERE doc_id % 10 <> 0
    ),
    b AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 13 = 0 THEN upper(text)
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.h IS NOT DISTINCT FROM b.h THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the data-ops primitive for auditing what a
    pipeline rerun changed: full outer join on the document key with a
    content-hash compare classifies every id as added / removed /
    changed / unchanged.  One equi-join shuffle; hashes computed
    during the scan so the join carries 16 bytes per side, not
    document payloads.  (The two 'snapshots' here are deterministic
    slices of the fixture corpus — the operator is the join shape.)"""
    from .operators.diff import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    b = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.upper(F.col("text"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return snapshot_diff(a, b, "doc_id", "text")


@register(
    "text_idf_keywords",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM tok WHERE len(term) > 0 GROUP BY 1, 2
    ),
    dfq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*)::DOUBLE AS n FROM documents),
    s AS (
        SELECT doc_id, term,
               round(tf * ln(n / df), 6) AS score
        FROM tf JOIN dfq USING (term), n
    ),
    r AS (
        SELECT doc_id, term, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rank
        FROM s
    )
    SELECT doc_id, term, rank::INT AS rank, score FROM r WHERE rank <= 3
    """,
)
def text_idf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms): explode +
    per-doc term counts, term-keyed df join, WindowGroupLimit top-k
    on the 6-dp-rounded score (raw float ordering would hang rank
    boundaries on libm's last ulp)."""
    from .operators.text import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_keywords(docs, "doc_id", "text", top_k=3)


@register(
    "table_quantiles",
    """
    WITH q AS (
        SELECT quantile_cont(l_quantity, [0.5, 0.9, 0.99]) AS ql,
               quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS qe,
               quantile_cont(l_discount, [0.5, 0.9, 0.99]) AS qd,
               quantile_cont(l_tax, [0.5, 0.9, 0.99]) AS qt
        FROM lineitem
    )
    SELECT 'l_quantity' AS "column", round(ql[1], 6) AS p50,
           round(ql[2], 6) AS p90, round(ql[3], 6) AS p99 FROM q
    UNION ALL
    SELECT 'l_extendedprice', round(qe[1], 6), round(qe[2], 6),
           round(qe[3], 6) FROM q
    UNION ALL
    SELECT 'l_discount', round(qd[1], 6), round(qd[2], 6),
           round(qd[3], 6) FROM q
    UNION ALL
    SELECT 'l_tax', round(qt[1], 6), round(qt[2], 6),
           round(qt[3], 6) FROM q
    """,
)
def table_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution half of the ingest-QA profile: exact interpolated
    p50/p90/p99 for four lineitem measures in one aggregation pass
    (percentile == ANSI quantile_cont; approx_percentile is the
    documented 100 TB swap-in)."""
    from .operators.profile import table_quantiles as tq

    li = load_table(spark, sf_dir, "lineitem")
    return tq(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@register(
    "dedup_cluster_stats",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w.comp FROM edges e JOIN walk w ON e.b = w.doc
    ),
    comp AS (SELECT doc, min(comp) AS rep FROM walk GROUP BY doc),
    r AS (
        SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
    ),
    sizes AS (SELECT rep, count(*) AS cluster_size FROM r GROUP BY rep)
    SELECT cluster_size,
           count(*) AS n_clusters,
           (cluster_size * count(*))::BIGINT AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-profile report: the near-dup cluster size histogram
    (how much of the corpus sits in clones of size k) — the number a
    curation run quotes before deciding thresholds.  Pairs ->
    components -> two tiny aggregations; singletons counted via the
    same left join the split operator uses."""
    from .operators.dedup import dedup_components, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comp = dedup_components(pairs)
    base = docs.select("doc_id")
    rep = base.join(
        comp, base["doc_id"] == comp["doc"], "left"
    ).select(
        F.coalesce(F.col("component"), F.col("doc_id")).alias("rep")
    )
    sizes = rep.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*"))
        .cast("long")
        .alias("n_docs"),
    )


@register(
    "events_trailing_features",
    """
    WITH o AS (
        SELECT user_id, event_id, epoch_ms(ts)::BIGINT AS ts_ms,
               round(value * 1000)::BIGINT AS v_milli
        FROM events
    )
    SELECT user_id, event_id, ts_ms,
           count(*) OVER w AS n_prev,
           coalesce(sum(v_milli) OVER w, 0)::BIGINT
               AS sum_value_milli_prev
    FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                        RANGE BETWEEN 3600000 PRECEDING
                                  AND 1 PRECEDING)
    """,
)
def events_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time aggregates: per event, the user's
    event count and value sum over the trailing hour STRICTLY before
    event time (no label leakage).  Value sums in integer milli-units
    keep the cross-engine compare exact."""
    from .operators.sessions import trailing_features

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "value",
    )
    return trailing_features(
        ev, "user_id", "event_id", "ts_ms", "value",
        window_ms=3600 * 1000,
    )


@register(
    "events_transitions",
    """
    WITH o AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(ts)::BIGINT AS ts_ms
        FROM events
    ),
    lagged AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts_ms, event_id)
                   AS prev_state,
               event_type AS next_state
        FROM o
    )
    SELECT prev_state, next_state, count(*) AS n
    FROM lagged WHERE prev_state IS NOT NULL
    GROUP BY prev_state, next_state
    """,
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences — the behavior-model aggregate.  One user-keyed
    exchange for the lag window, then a hash agg over the tiny
    |states|^2 key space."""
    from .operators.sessions import transition_counts

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000000").alias("ts_ms"),
    )
    return transition_counts(
        ev, "user_id", "ts_ms", "event_id", "event_type"
    )


@register(
    "cdc_full_replace",
    """
    WITH o AS (
        SELECT event_id, (epoch_ms(ts) // 1000)::BIGINT AS ts_s, value,
               CASE event_type WHEN 'signup' THEN 'i'
                               WHEN 'error'  THEN 'd'
                               ELSE 'u' END AS op
        FROM events
    )
    SELECT CASE WHEN op = 'd' THEN 'delete' ELSE 'upsert' END AS action,
           CAST(event_id AS VARCHAR) AS _id,
           CASE WHEN op = 'd' THEN NULL
                WHEN op = 'u' AND event_id % 2 = 0 THEN -1.0
                ELSE round(value, 6) END AS balance,
           CASE WHEN op = 'i' THEN 'ins'
                WHEN op = 'u' AND event_id % 2 = 0 THEN 'src'
                ELSE NULL END AS name,
           ts_s AS ts_sec
    FROM o
    """,
)
def cdc_full_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 (full-replace update detect) + J3 (source fallback) under a
    hard oracle, driving the REAL pipeline operators: every event
    becomes its own oplog document — inserts carry {value, name},
    even-id updates a {"$set": {value}} patch (must consult the
    source lookup: both mapped fields come back from the source doc,
    the Mongo-current-document semantic), odd-id updates a PLAIN
    {value} document (the has_plain marker routes it through the
    insert-like branch: no lookup, unmapped name dropped), errors
    delete.  The frame runs compact_oplog_docs -> dispatch_ir_frame —
    the same code the streaming tail executes per micro-batch
    (reference: src/processor.ts:186 replace detect, :202 lookup
    fallback)."""
    from .operators.oplog_compaction import compact_oplog_docs
    from .streaming.tail import dispatch_ir_frame

    task = Task(
        {
            "extract": {"db": "tpch", "collection": "docs"},
            "transform": {
                "mapping": {"value": "balance", "name": "name"}
            },
            "load": {"index": "docs", "type": "doc"},
        }
    )
    ev = load_table(spark, sf_dir, "events")
    opc = (
        F.when(F.col("event_type") == "signup", "i")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    val = F.col("value")
    doc = (
        F.when(
            opc == "i",
            F.to_json(
                F.struct(val.alias("value"), F.lit("ins").alias("name"))
            ),
        )
        .when(
            (opc == "u") & (F.col("event_id") % 2 == 0),
            F.to_json(
                F.struct(
                    F.struct(val.alias("value")).alias("$set")
                )
            ),
        )
        .when(opc == "u", F.to_json(F.struct(val.alias("value"))))
        .otherwise(F.lit("{}"))
    )
    frame = ev.select(
        F.expr("shiftleft(ts div 1000000000, 32)").alias("ts"),
        F.lit("tpch.docs").alias("ns"),
        opc.alias("op"),
        F.col("event_id").cast("string").alias("id"),
        doc.alias("doc"),
    )
    compacted = compact_oplog_docs(frame, task)
    source_df = ev.select(
        F.col("event_id").alias("_id"),
        F.lit(-1.0).alias("value"),
        F.lit("src").alias("name"),
    )
    irs = dispatch_ir_frame(
        compacted,
        task,
        sink_state=None,
        source_df=source_df,
        hints={"value": "double"},
    )
    return irs.select(
        "action",
        F.col("id").alias("_id"),
        F.round(F.col("data.balance"), 6).alias("balance"),
        F.col("data.name").alias("name"),
        F.col("timestamp").alias("ts_sec"),
    )


_TRANSITIONS_ORACLE = """
    WITH o AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(ts)::BIGINT AS ts_ms
        FROM events
    ),
    lagged AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts_ms, event_id)
                   AS prev_state,
               event_type AS next_state
        FROM o
    )
    SELECT prev_state, next_state, count(*) AS n
    FROM lagged WHERE prev_state IS NOT NULL
    GROUP BY prev_state, next_state
"""


@register("streaming_transitions", _TRANSITIONS_ORACLE)
def streaming_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING transition-matrix maintainer under the batch
    twin's hard oracle: the events table replays as a file stream,
    per-user last-event state folds across triggers
    (streaming/transitions.py), and the summed increment changelog
    must equal the batch lag-window result exactly (no late events in
    an ordered drain — the late path is pytest-covered)."""
    import shutil
    import tempfile

    from .streaming.transitions import (
        run_streaming_transitions,
        transitions_snapshot,
    )

    base = tempfile.mkdtemp(prefix="trans_stream_")
    try:
        from pyspark.sql.types import LongType

        ev_path = os.path.join(sf_dir, "events.parquet")
        # fixtures have shipped events.ts as TIMESTAMP(MICROS) and as
        # TIMESTAMP(NANOS) (which the session's nanosAsLong flag reads
        # as LongType) — a hard-coded stream schema breaks on one or
        # the other, so derive the ts shape from the batch footer
        probe = spark.read.parquet(ev_path)
        ts_is_long = isinstance(
            probe.schema["ts"].dataType, LongType
        )
        ts_type = "long" if ts_is_long else "timestamp"
        schema = (
            f"event_id long, ts {ts_type}, user_id long, "
            "event_type string, value double, props string"
        )
        reader = spark.readStream.schema(schema)
        if os.path.isdir(ev_path):
            stream = reader.parquet(ev_path)
        else:
            stream = reader.option(
                "pathGlobFilter", "events.parquet"
            ).parquet(sf_dir)
        ts_ms = (
            F.expr("ts div 1000000")
            if ts_is_long
            else F.unix_millis(F.col("ts"))
        )
        ev = stream.select(
            "user_id",
            "event_id",
            ts_ms.alias("ts_ms"),
            "event_type",
        )
        q = run_streaming_transitions(
            spark, ev, f"{base}/sink", f"{base}/ckpt"
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming transitions drain exceeded 300 s"
            )
        out = transitions_snapshot(spark, f"{base}/sink")
        # materialize before the tempdir vanishes
        rows = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "prev_state string, next_state string, n long"
    )


@register(
    "multimodal_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-addressable exact dedup on the binary payload digest
    from .operators.multimodal import dedup_payloads

    docs = load_table(spark, sf_dir, "documents")
    return dedup_payloads(attach_payload(docs, "doc_id", "text"))


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           'image/fake' AS media_type,
           (octet_length(encode(text)) % 640 + 16)::INTEGER AS width,
           (octet_length(encode(text)) % 480 + 16)::INTEGER AS height,
           (octet_length(encode(text)) * 40)::BIGINT AS duration_ms
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fake_decode_metadata(attach_payload(docs, "doc_id", "text"))


@register(
    "multimodal_frame_sample",
    """
    WITH sized AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    ex AS (
        SELECT doc_id, n,
               unnest(range(0, least(8, (n + 255) // 256))) AS i
        FROM sized
    )
    SELECT doc_id,
           i::INTEGER AS frame_idx,
           least(256, n - i * 256)::INTEGER AS frame_len
    FROM ex
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fake_frame_sample(attach_payload(docs, "doc_id", "text"))


@register(
    "multimodal_features",
    """
    WITH b AS (
        SELECT doc_id,
               ascii(unnest(regexp_extract_all(text, '(?s).'))) // 8 AS bin
        FROM documents
    ),
    h AS (
        SELECT doc_id, bin, count(*)::DOUBLE AS cnt FROM b GROUP BY 1, 2
    ),
    hl AS (
        SELECT doc_id,
               list(bin ORDER BY bin) AS bins,
               list(cnt ORDER BY bin) AS cnts
        FROM h GROUP BY doc_id
    ),
    t AS (
        SELECT doc_id, octet_length(encode(text))::DOUBLE AS n
        FROM documents
    )
    SELECT t.doc_id,
           array_to_string(
               list_transform(range(0, 32), i -> coalesce(
                   round(coalesce(cnts[list_position(bins, i)], 0.0)
                         / nullif(n, 0) * 1000000.0)::BIGINT, 0)),
               ',') AS features_csv
    FROM t LEFT JOIN hl USING (doc_id)
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # serialized for the driver's hash compare: each histogram ratio is
    # quantized to integer microunits (round(x*1e6) — both engines do
    # the identical divide-then-multiply on IEEE doubles) and the
    # vector joined to CSV, since the canonicalizer can't hash list
    # cells.  The oracle is valid because documents.text is ASCII in
    # the test corpus (ascii(char) == utf-8 byte); the operator itself
    # bins raw payload bytes.
    docs = load_table(spark, sf_dir, "documents")
    feats = byte_histogram_features(attach_payload(docs, "doc_id", "text"))
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x * F.lit(1e6)).cast("long").cast("string"),
            ),
            ",",
        ).alias("features_csv"),
    )


# --------------------------------------------------------------------
# Temporal joins (greenfield — SURVEY §2.2: the reference has no join
# surface beyond point lookups; operators/joins.py for the scale
# rationale of each formulation)
# --------------------------------------------------------------------


@register(
    "events_asof_join",
    """
    WITH o AS (
        SELECT event_id, user_id, epoch_ms(ts)::BIGINT AS ts_ms,
               event_type, value
        FROM events
    ),
    c AS (SELECT event_id, user_id, ts_ms FROM o
          WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, ts_ms, value FROM o
          WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts_ms,
           pm.ts_ms AS ts_ms_asof, pm.value AS value_asof
    FROM c LEFT JOIN LATERAL (
        SELECT p.ts_ms, p.value FROM p
        WHERE p.user_id = c.user_id AND p.ts_ms <= c.ts_ms
        ORDER BY p.ts_ms DESC, p.event_id DESC LIMIT 1
    ) pm ON true
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click picks up the user's most recent
    purchase at or before it.  The oracle runs a per-row LATERAL
    top-1 — a genuinely different algorithm than the union+window
    plan, so agreement is a strong check of the tie/inclusivity
    semantics."""
    from .operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
        "value",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "event_id", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts_ms",
        right_ts="ts_ms",
        value_cols=["value"],
        tiebreak_col="event_id",
    )


@register(
    "events_window_join",
    """
    WITH o AS (
        SELECT event_id, user_id, epoch_ms(ts)::BIGINT AS ts_ms,
               event_type, value
        FROM events
    ),
    e AS (SELECT event_id, user_id, ts_ms FROM o
          WHERE event_type = 'error'),
    p AS (SELECT ts_ms AS p_ts, value AS p_value FROM o
          WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id, e.ts_ms,
           count(p.p_ts)::BIGINT AS n_nearby,
           round(coalesce(sum(p.p_value), 0), 6) AS nearby_value
    FROM e LEFT JOIN p ON abs(e.ts_ms - p.p_ts) <= 60000
    GROUP BY 1, 2, 3
    """,
)
def events_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: purchases within +/-60 s of each error,
    corpus-wide (no equi-key).  The bucketed operator turns the
    inequality into an equi-join; the oracle does the naive
    inequality join, checking no pair is gained or lost at bucket
    boundaries."""
    from .operators.joins import bucketed_range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
        "value",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_ms"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts_ms").alias("p_ts"), F.col("value").alias("p_value")
    )
    pairs = bucketed_range_join(
        errors, purchases, left_ts="ts_ms", right_ts="p_ts", window_ms=60000
    )
    nearby = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_nearby"),
        F.sum("p_value").alias("__sum"),
    )
    return errors.join(nearby, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts_ms",
        F.coalesce(F.col("n_nearby"), F.lit(0)).alias("n_nearby"),
        F.round(F.coalesce(F.col("__sum"), F.lit(0.0)), 6).alias(
            "nearby_value"
        ),
    )


# --------------------------------------------------------------------
# CDC history: SCD2 version intervals + point-in-time snapshot
# (operators/history.py — time-travel over the A1 event algebra)
# --------------------------------------------------------------------


@register(
    "cdc_scd2",
    f"""
    WITH o AS ({_OPLOG_SQL}),
    v AS (
        SELECT user_id, value, op, ts_ms,
               lead(ts_ms) OVER (PARTITION BY user_id
                                 ORDER BY ts_ms, event_id) AS valid_to
        FROM o
    )
    SELECT user_id, value,
           ts_ms AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM v WHERE op <> 'd'
    """,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.history import scd2_intervals

    return scd2_intervals(
        events_as_oplog(spark, sf_dir),
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    )


_SNAPSHOT_TS = 1704100000000  # ~9h into the synthetic feed


@register(
    "cdc_snapshot_at",
    f"""
    WITH
    oplog AS (SELECT * FROM ({_OPLOG_SQL}) WHERE ts_ms <= {_SNAPSHOT_TS}),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn
        FROM oplog
    ),
    last_ev AS (
        SELECT user_id, ts_ms, op, value FROM ranked WHERE rn = 1
    ),
    prev_nu AS (
        SELECT user_id, op AS prev_op FROM (
            SELECT user_id, op, row_number() OVER (
                PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn2
            FROM ranked WHERE op <> 'u' AND rn > 1
        ) t WHERE rn2 = 1
    ),
    compacted AS (
        SELECT l.user_id,
               CASE WHEN l.op = 'u' AND COALESCE(p.prev_op, '') = 'i'
                    THEN 'i' ELSE l.op END AS op,
               CASE WHEN l.op = 'd' THEN NULL ELSE l.value END AS value,
               l.ts_ms
        FROM last_ev l LEFT JOIN prev_nu p USING (user_id)
        WHERE NOT (l.op = 'd' AND COALESCE(p.prev_op, '') = 'i')
    )
    SELECT user_id, value, ts_ms AS as_of_ts
    FROM compacted WHERE op <> 'd'
    """,
)
def cdc_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection state as of a fixed mid-feed timestamp.  The ts
    predicate pushes to the parquet scan, so early snapshots read a
    fraction of the oplog; the rest is the shared one-shuffle
    compaction."""
    from .operators.history import snapshot_at

    return snapshot_at(
        events_as_oplog(spark, sf_dir, max_ts_ms=_SNAPSHOT_TS),
        at_ts=_SNAPSHOT_TS,
        key_cols=["user_id"],
        ts_col="ts_ms",
        op_col="op",
        payload_cols=["value"],
        tiebreak_col="event_id",
    )


# --------------------------------------------------------------------
# Corpus-level span dedup + per-source cap (operators/text.py —
# passage-level curation beyond whole-document dedup)
# --------------------------------------------------------------------


@register(
    "text_quality_classify",
    r"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS toks,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens = 0 THEN NULL ELSE
                   round(1.0 / (1.0 + exp(-4.0 *
                       (list_sum([
                           ((((ascii(x[1]) * 31 + len(x) * 7 +
                               ascii(substr(x, len(x), 1)))::BIGINT % 64)
                             * 2654435761) % 1000)::DOUBLE / 1000.0 - 0.5
                           for x in toks])::DOUBLE / n_tokens))), 6)
               END AS quality_score
        FROM t
    )
    SELECT doc_id, n_tokens, quality_score,
           CASE WHEN quality_score IS NULL THEN NULL
                WHEN quality_score >= 0.5 THEN 'keep'
                ELSE 'drop' END AS label
    FROM s
    """,
)
def text_quality_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (fastText/CCNet
    architecture): portable integer feature hash, mean-pooled weight
    lookup, sigmoid — a zero-shuffle JVM projection.  Weights are a
    deterministic pretrained-model stand-in; the plan shape is the
    deliverable."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import quality_classifier

    return quality_classifier(docs, "doc_id", "text")


def _bpe_oracle(n_merges: int, source: str = "documents") -> str:
    """Generate the ``n_merges``-stage DuckDB replay of BPE training.

    Words are wrapped as ``(sym)(sym)...`` strings so DuckDB's plain
    left-to-right ``replace`` applies a merge with exactly the greedy
    non-overlapping semantics of the Spark array fold (symbol
    boundaries are explicit, so no match can straddle or share a
    token).  Every stage CTE is MATERIALIZED: scalar subqueries
    reference each merge four times and inlining would re-expand the
    whole prefix exponentially.

    ``source``: the (doc_id, text) relation to train on — a table
    name or a parenthesized subquery (the overlap fixture derives
    its text from doc_id so both engines build it identically).
    """
    parts = [r"""
    WITH w0 AS MATERIALIZED (
        SELECT regexp_replace(t, '(.)', '(\1)', 'g') AS repr,
               count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS t
              FROM """ + source + r""")
        WHERE len(t) > 0
        GROUP BY 1
    )"""]
    for k in range(n_merges):
        parts.append(f"""
    , m{k} AS MATERIALIZED (
        SELECT u.l AS l, u.r AS r, sum(cnt) AS c FROM (
            SELECT cnt,
                   unnest([{{'l': syms[i], 'r': syms[i+1]}}
                           for i in range(1, len(syms))]) AS u
            FROM (SELECT cnt,
                         string_split(substr(repr, 2, len(repr) - 2),
                                      ')(') AS syms
                  FROM w{k})
        ) GROUP BY 1, 2
        ORDER BY c DESC, l, r LIMIT 1
    ),
    w{k + 1} AS MATERIALIZED (
        SELECT cnt,
               replace(repr,
                       '(' || (SELECT l FROM m{k}) || ')(' ||
                       (SELECT r FROM m{k}) || ')',
                       '(' || (SELECT l FROM m{k}) ||
                       (SELECT r FROM m{k}) || ')') AS repr
        FROM w{k}
    )""")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS rank, l AS left_sym, r AS right_sym,"
        f" c::BIGINT AS pair_count FROM m{k}"
        for k in range(n_merges)
    )
    return "".join(parts) + "\n    " + sel


def _bpe_encode_oracle(n_merges: int, source: str = "documents") -> str:
    """Replay training (same staged CTEs), then decode the final word
    representations back to ``(word, n_chars, n_syms)`` — stripping
    the parens wrapper recovers the original word exactly — and
    aggregate symbol counts per document through a token join."""
    prefix = _bpe_oracle(n_merges, source)
    # drop the trailing merge-table SELECT; keep the CTE chain
    prefix = prefix[: prefix.rindex("\n    SELECT 0 AS rank")]
    return (
        prefix
        + f"""
    , enc AS (
        SELECT replace(replace(repr, '(', ''), ')', '') AS w,
               len(replace(replace(repr, '(', ''), ')', ''))::BIGINT
                   AS nc,
               len(string_split(substr(repr, 2, len(repr) - 2),
                   ')('))::BIGINT AS ns
        FROM w{n_merges}
    ),
    tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+'))
                   AS w
        FROM {source} WHERE length(trim(text)) > 0
    ),
    agg AS (
        SELECT doc_id, sum(nc)::BIGINT AS n_char_syms,
               sum(ns)::BIGINT AS n_bpe_syms
        FROM tok JOIN enc USING (w) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_char_syms, 0) AS n_char_syms,
           coalesce(a.n_bpe_syms, 0) AS n_bpe_syms,
           round(a.n_char_syms::DOUBLE /
                 (CASE WHEN a.n_bpe_syms > 0 THEN a.n_bpe_syms END), 6)
               AS compression
    FROM {source} d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """
    )


@register("text_bpe_encode", _bpe_encode_oracle(8))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency measurement: train 8 BPE merges, encode
    every document, report per-doc char-symbol vs BPE-symbol counts.
    Encoding folds run on the DISTINCT word table only; documents get
    their counts via one explode + word join + aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import bpe_encode

    return bpe_encode(docs, "doc_id", "text", n_merges=8)


# Overlap-heavy BPE fixture: text derived deterministically from
# doc_id with the SAME expression on both engines.  Single-char runs
# (aaaa...) are where greedy non-overlapping application matters
# ('aaaa' folds to (aa)(aa), never the straddling (a)(aa)(a));
# alternating 'abab' makes a merged (ab) symbol that a later (b,a)
# merge must NOT re-match inside; 'aab' chains force merge-priority
# order to decide between (a,a) and (a,b).
_BPE_OVERLAP_TEXT = (
    "concat(repeat('a', 2 + doc_id % 6), ' ', "
    "repeat('ab', 1 + doc_id % 5), ' ', "
    "repeat('ba', 1 + doc_id % 4), ' ', "
    "repeat('aab', 1 + doc_id % 3))"
)
_BPE_OVERLAP_SRC = (
    f"(SELECT doc_id, {_BPE_OVERLAP_TEXT} AS text FROM documents)"
)


@register(
    "text_bpe_overlap", _bpe_encode_oracle(6, source=_BPE_OVERLAP_SRC)
)
def text_bpe_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-priority-correct BPE encoding pinned on the overlap-heavy
    fixture: every stage of training AND the final encoding must agree
    with the staged DuckDB replay, whose wrapped-symbol representation
    makes greedy non-overlapping fold semantics explicit.  Naive
    regex/replace encoders (matches straddling merged symbols,
    re-merging inside a symbol, wrong tie order) diverge on this
    corpus by construction."""
    from .operators.text import bpe_encode

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fx = docs.select("doc_id", F.expr(_BPE_OVERLAP_TEXT).alias("text"))
    return bpe_encode(fx, "doc_id", "text", n_merges=6)


@register("text_bpe_train", _bpe_oracle(8))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BPE tokenizer training (Sennrich et al. 2016):
    8 most-frequent-pair merges over the word-frequency table, ties
    broken lexicographically.  The distributed shape is one hash agg
    for word counts, then per round a JVM zip_with pair explode + agg
    with a 1-row argmax collect (model state) and a column-fold merge
    application — no Python in the hot path, driver state = the merge
    table itself."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import bpe_train

    return bpe_train(docs, "text", n_merges=8)


_SUBSTRING_ORACLE = r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS toks,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
        FROM documents
    ),
    inst AS (
        SELECT doc_id, u.pos AS pos, u.win AS win FROM (
            SELECT doc_id,
                   unnest([{'pos': i,
                            'win': array_to_string(toks[i:i+7], ' ')}
                           for i in range(1, greatest(n_tokens - 6, 1))])
                       AS u
            FROM w)
    ),
    rk AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY win ORDER BY doc_id, pos)
                   AS rn
        FROM inst
    ),
    cov AS (
        SELECT DISTINCT doc_id, tp FROM (
            SELECT doc_id, unnest(range(pos, pos + 8)) AS tp
            FROM rk WHERE rn > 1)
    ),
    cagg AS (
        SELECT doc_id, count(*) AS dup_tokens, list(tp) AS cov
        FROM cov GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_tokens,
           coalesce(cagg.dup_tokens, 0) AS dup_tokens,
           round(1.0 - coalesce(cagg.dup_tokens, 0)::DOUBLE /
                 (CASE WHEN w.n_tokens > 0 THEN w.n_tokens END), 6)
               AS keep_frac,
           coalesce(array_to_string(
               [w.toks[j] FOR j IN range(1, len(w.toks) + 1)
                IF NOT coalesce(list_contains(cagg.cov, j), false)], ' '),
               '') AS clean_text
    FROM w LEFT JOIN cagg ON w.doc_id = cagg.doc_id
    """


@register("text_substring_dedup", _SUBSTRING_ORACLE)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact substring dedup (Lee et al. 2021's
    ExactSubstr, re-expressed as a window-text shuffle instead of a
    suffix array): any 8-token passage whose exact text occurred
    earlier in the corpus — any document, any offset — is marked and
    removed; ``clean_text`` keeps the surviving tokens.  Catches
    boilerplate and quoted passages that whole-document and fixed-span
    dedup both miss."""
    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(docs, "doc_id", "text", window_tokens=8)


@register(
    "text_span_dedup",
    _TOKS_CTE
    + """
    , c AS (
        SELECT doc_id, toks,
               greatest(ceil(len(toks)::DOUBLE / 32)::BIGINT, 1)
                   AS n_spans
        FROM t
    ), e AS (
        SELECT doc_id, toks, n_spans,
               unnest(generate_series(1, n_spans::INT)) AS i
        FROM c
    ), spans AS (
        SELECT doc_id, (i - 1)::BIGINT AS span_id,
               array_to_string(toks[((i-1)*32+1):(i*32)], ' ')
                   AS span_text
        FROM e
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY span_text
                                     ORDER BY doc_id, span_id) AS rn
        FROM spans
    ), rebuilt AS (
        SELECT doc_id,
               string_agg(span_text, ' ' ORDER BY span_id)
                   AS clean_text,
               count(*)::BIGINT AS n_kept
        FROM ranked WHERE rn = 1 GROUP BY doc_id
    )
    SELECT c.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           c.n_spans,
           coalesce(r.n_kept, 0)::BIGINT AS n_kept
    FROM c LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document 32-token span dedup: one surviving instance per
    distinct span corpus-wide, documents reassembled from survivors.
    The oracle replays the same keep-first rule via a window
    row_number."""
    from .operators.text import span_dedup

    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(docs, "doc_id", "text", span_tokens=32)


@register(
    "text_source_cap",
    """
    SELECT doc_id, source, n_chars, rank FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id)::INT
                   AS rank
        FROM documents
    ) WHERE rank <= 15
    """,
)
def text_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the per-domain limit of web curation):
    at most 15 docs per source, largest first."""
    from .operators.text import source_cap

    docs = load_table(spark, sf_dir, "documents")
    return source_cap(docs, "doc_id", "source", "n_chars", cap=15)


# --------------------------------------------------------------------
# Streaming incremental curation surfaced as a verified-summary query
# (streaming/curate.py; the continuous form of pipeline_curate)
# --------------------------------------------------------------------


@register(
    "curate_incremental",
    """
    WITH t0 AS (
        SELECT doc_id, text,
               string_split_regex(trim(text), '\\s+') AS w,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::BIGINT AS n_tokens
        FROM documents
    ),
    feats AS (
        SELECT doc_id, text, n_tokens::DOUBLE AS n,
               len(list_distinct(w))::DOUBLE / nullif(n_tokens, 0) AS dr,
               len(list_filter(w, x -> x IN
                   ('the','a','of','to','in','and','is','on')))::DOUBLE
                   / nullif(n_tokens, 0) AS sr,
               length(array_to_string(w, ''))::DOUBLE
                   / nullif(n_tokens, 0) AS ml
        FROM t0
    ),
    q AS (
        SELECT doc_id, text FROM feats
        WHERE floor((least(n / 200.0, 1.0) * 0.3 + dr * 0.3
                    + (1.0 - sr) * 0.2 + least(ml / 8.0, 1.0) * 0.2)
                    * 1000000) / 1000000 >= 0.52
    )
    SELECT count(*)::BIGINT AS n_quality,
           count(DISTINCT md5(text))::BIGINT AS n_exact_unique,
           true AS incremental_equals_full,
           true AS no_kept_near_pair
    FROM q
    """,
)
def curate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard check for the streaming curation path, reduced to
    oracle-pinnable assertions:

    * ``n_quality`` / ``n_exact_unique``: quality-gate survivors and
      distinct-content survivors, counted independently by DuckDB
      (cross-engine — the stateless and hash-store stages);
    * ``incremental_equals_full``: running the corpus through
      curate_batch in two id-ordered halves against a fresh state dir
      must keep EXACTLY the docs a single full-corpus batch keeps
      (first-arrival-wins == in-batch keep-min when arrivals are id
      ordered — the invariant that makes backfill-then-tail sound);
    * ``no_kept_near_pair``: no two kept docs are near-duplicates of
      each other (re-checked with the batch LSH operator).
    """
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from .operators.dedup import minhash_pairs_over_store
    from .operators.text import quality_features
    from .streaming.curate import curate_batch

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    mm = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    ).first()
    split = (mm["mn"] + mm["mx"]) // 2
    dir_a = tempfile.mkdtemp(prefix="curate_a_")
    try:
        # full-corpus reference: quality gate -> exact keep-min —
        # independent of the store state, so its materialization runs
        # CONCURRENTLY with the two stateful batch passes (Spark job
        # submission is thread-safe; the narrow id frame is
        # checkpointed once and every later assertion reuses it)
        import threading

        q_ok = quality_features(docs, "doc_id", "text").filter(
            F.col("quality_score") >= 0.52
        ).select("doc_id")
        passed = docs.join(q_ok, "doc_id", "left_semi")
        w = Window.partitionBy(F.md5(F.col("text")))
        ref_box: dict = {}

        def _materialize_ref() -> None:
            try:
                ref_box["first_ids"] = (
                    passed.withColumn("__m", F.min("doc_id").over(w))
                    .filter(F.col("__m") == F.col("doc_id"))
                    .select("doc_id")
                    .localCheckpoint(eager=True)
                )
            except Exception as exc:  # surfaced after join()
                ref_box["err"] = exc

        ref_thread = threading.Thread(target=_materialize_ref)
        ref_thread.start()
        s1 = curate_batch(spark, docs.filter(F.col("doc_id") <= split), dir_a)
        s2 = curate_batch(spark, docs.filter(F.col("doc_id") > split), dir_a)
        ref_thread.join()
        if "err" in ref_box:
            raise ref_box["err"]
        first_ids = ref_box["first_ids"]
        # pair detection audits the PERSISTED signature store (no
        # re-shingling); membership (quality + exact keep-min) stays
        # independently derived, so a store divergence still flips
        # sets_equal below.  ONE band join over the store total — the
        # pair frame is tiny and every later assertion derives from it
        ref_pairs = minhash_pairs_over_store(
            spark,
            f"{dir_a}/sigs",
            ids_df=first_ids.select(F.col("doc_id").alias("doc")),
            threshold=0.8,
        ).localCheckpoint(eager=True)
        cur_b = first_ids.join(
            ref_pairs.select(F.col("j").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        # distributed verification — no driver-side id sets: set
        # equality is two anti-join emptiness probes over checkpointed
        # id frames
        cur_a = spark.read.parquet(f"{dir_a}/curated").select("doc_id")
        sets_equal = (
            cur_a.join(cur_b, "doc_id", "left_anti").limit(1).count() == 0
            and cur_b.join(cur_a, "doc_id", "left_anti").limit(1).count() == 0
        )
        # no-kept-near-pair: a pair of KEPT docs in the audited pair
        # set.  Restricting the materialized ref_pairs by membership is
        # the same check as a second store audit whenever cur_a is a
        # subset of first_ids — and when it isn't, sets_equal has
        # already flipped the verdict false
        ka = cur_a.select(F.col("doc_id").alias("i"))
        kb = cur_a.select(F.col("doc_id").alias("j"))
        kept_pairs = (
            ref_pairs.join(ka, "i", "left_semi")
            .join(kb, "j", "left_semi")
            .count()
        )
        row = (
            s1["quality"] + s2["quality"],
            s1["fresh"] + s2["fresh"],
            sets_equal,
            kept_pairs == 0,
        )
    finally:
        shutil.rmtree(dir_a, ignore_errors=True)
    return _verdict_frame(
        spark,
        [
            ("n_quality", row[0], "long"),
            ("n_exact_unique", row[1], "long"),
            ("incremental_equals_full", row[2], "boolean"),
            ("no_kept_near_pair", row[3], "boolean"),
        ],
    )


@register(
    "multimodal_near_dup",
    """
    WITH b AS (
        SELECT doc_id,
               ascii(unnest(regexp_extract_all(text, '(?s).'))) // 8 AS bin
        FROM documents
    ),
    h AS (
        SELECT doc_id, bin, count(*)::DOUBLE AS cnt FROM b GROUP BY 1, 2
    ),
    hl AS (
        SELECT doc_id,
               list(bin ORDER BY bin) AS bins,
               list(cnt ORDER BY bin) AS cnts
        FROM h GROUP BY doc_id
    ),
    t AS (
        SELECT doc_id, octet_length(encode(text))::DOUBLE AS n
        FROM documents
    ),
    f AS (
        SELECT t.doc_id,
               list_transform(range(0, 32), i ->
                   coalesce(cnts[list_position(bins, i)], 0.0)
                   / nullif(n, 0)) AS feat
        FROM t LEFT JOIN hl USING (doc_id)
    )
    SELECT a.doc_id AS i, b2.doc_id AS j,
           round(list_cosine_similarity(a.feat, b2.feat), 6) AS cosine
    FROM f a JOIN f b2 ON a.doc_id < b2.doc_id
    WHERE round(list_cosine_similarity(a.feat, b2.feat), 6) >= 0.9999
    """,
)
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection for binary payloads:
    fake-codec byte-histogram features (the stand-in for a real image
    embedding) fed into the blocked-gram-matrix cosine pair operator —
    the multimodal twin of embedding dedup.  Composition of two
    already-oracle-checked stages; threshold 0.9999 because byte
    histograms of same-alphabet text concentrate near 1."""
    from .operators.dedup import embedding_dup_pairs
    from .operators.multimodal import attach_payload, byte_histogram_features

    docs = load_table(spark, sf_dir, "documents")
    feats = byte_histogram_features(attach_payload(docs, "doc_id", "text"))
    return embedding_dup_pairs(
        feats, "doc_id", "features", threshold=0.9999
    )


@register("similarity_ann_ivf_pq", _ANN_CHECK_ORACLE)
def similarity_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF + product quantization: ADC candidate ranking over m-byte
    # codes, exact re-rank of the top k*refine.  r5 sweep: m=16
    # sub-codebooks (vs 8) lift recall@10 from min 0.6 to min 0.8
    # across 5 query ids at sf0.1 at the same probe/refine — finer
    # sub-quantizers beat deeper probing here (probe=12/refine=16
    # with m=8 only reached 0.7).  Asserted >= 0.7; deterministic at
    # these scales (train sample == whole table under the 100k cap).
    from .operators.similarity import ann_ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    ann = ann_ivf_pq_topk(
        emb, "vec_id", "embedding", query_id=0, k=10,
        n_probe=8, refine=8, ksub=64, m=16,
    )
    return _ann_topk_check(emb, ann, query_id=0, k=10, min_recall=0.7)


# --------------------------------------------------------------------
# Round 3 — PII scrub, DSIR importance selection, semantic dedup,
# sketch-vs-exact corpus stats
# --------------------------------------------------------------------

_SCRUB_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_SCRUB_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_SCRUB_PHONE = "\\+?[0-9][0-9()\\- ]{6,}[0-9]\\b"
_SCRUB_BLOCK = "\\b(spark|hash)\\b"


@register(
    "text_scrub",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_SCRUB_EMAIL}'))::BIGINT
               AS n_email,
           len(regexp_extract_all(text, '{_SCRUB_IPV4}'))::BIGINT
               AS n_ipv4,
           len(regexp_extract_all(text, '{_SCRUB_PHONE}'))::BIGINT
               AS n_phone,
           len(regexp_extract_all(text, '{_SCRUB_BLOCK}'))::BIGINT
               AS n_blocked,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text,
               '{_SCRUB_EMAIL}', '[REDACTED]', 'g'),
               '{_SCRUB_IPV4}', '[REDACTED]', 'g'),
               '{_SCRUB_PHONE}', '[REDACTED]', 'g'),
               '{_SCRUB_BLOCK}', '[REDACTED]', 'g') AS clean_text
    FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII + blocklist scrub (operators/text.py:scrub_text): per-class
    # counts on the original text, sequential redaction.  The PII
    # classes are structurally absent from the synthetic corpus (the
    # regex mechanics are pinned by unit tests on adversarial strings
    # and by the shared Java/RE2 pattern subset); the blocklist terms
    # DO hit the corpus, so the oracle exercises real replacements.
    from .operators.text import scrub_text

    docs = load_table(spark, sf_dir, "documents")
    return scrub_text(docs, "doc_id", "text", blocklist=("spark", "hash"))


@register(
    "text_importance_sample",
    _TOKS_CTE
    + """
    , tk AS (
        SELECT t.doc_id, d.source = 'src0' AS tgt, unnest(t.toks) AS tok
        FROM t JOIN documents d USING (doc_id)
    ),
    vocab AS (
        SELECT tok, count(*) AS total,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_tf
        FROM tk GROUP BY tok
    ),
    scores AS (
        SELECT tk.doc_id,
               sum((1000000 * (v.tgt_tf + 1)) // (v.total + 1))::BIGINT
                   AS score
        FROM tk JOIN vocab v USING (tok)
        GROUP BY tk.doc_id
    )
    SELECT doc_id, score FROM scores
    ORDER BY score DESC, doc_id ASC LIMIT 100
    """,
)
def text_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DSIR-shaped data selection (operators/text.py:importance_topk):
    # integer-exact add-one-smoothed target/total term-frequency
    # weights, summed over token occurrences; top-100 by score.
    # Target distribution = the 'src0' slice of the corpus.
    from .operators.text import importance_topk

    docs = load_table(spark, sf_dir, "documents")
    return importance_topk(
        docs, "doc_id", "text", F.col("source") == "src0", k=100
    )


@register(
    "dedup_semantic",
    """
    WITH near AS (
        SELECT DISTINCT doc FROM (
            SELECT a.vec_id AS doc
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE round(list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
        )
    )
    SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_docs,
           (SELECT count(*) FROM near)::BIGINT AS n_global_near_docs,
           true AS no_kept_near_pair,
           true AS dropped_subset_ok
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (k-means cells -> within-cell exact-cosine components
    -> keep min id), reduced to oracle-pinnable assertions:

    * ``n_docs`` / ``n_global_near_docs``: corpus size and the number
      of docs having ANY exact global neighbor at the threshold —
      both computed independently in Spark and DuckDB;
    * ``no_kept_near_pair``: no within-cell pair at/above threshold
      survives with BOTH endpoints kept (components must separate);
    * ``dropped_subset_ok``: every dropped doc is one of the
      ``n_global_near_docs`` (the cluster path can only drop docs the
      exact global pair graph also flags — clustering limits recall,
      never precision).
    """
    from .operators.dedup import embedding_dup_pairs
    from .operators.similarity import semantic_dedup_frames

    emb = load_table(spark, sf_dir, "embeddings")
    per_doc, pairs = semantic_dedup_frames(
        emb, "vec_id", "embedding", n_clusters=8, threshold=0.45
    )
    # NOTE: eager localCheckpoints of per_doc/pairs were measured
    # SLOWER here (6.5 s vs 6.0 s at sf0.1) — the materialization
    # barriers cost more than the repeated lazy evaluation saves.
    # LAZY persist is different: no barrier job, and the gram-matrix
    # kernel behind flags/near_docs runs once instead of once per
    # consumer subtree inside the final save job.
    flags = per_doc.select(F.col("vec_id"), "kept").persist()

    kept_pairs = (
        pairs.join(
            flags.select(
                F.col("vec_id").alias("i"), F.col("kept").alias("kept_i")
            ),
            "i",
        )
        .join(
            flags.select(
                F.col("vec_id").alias("j"), F.col("kept").alias("kept_j")
            ),
            "j",
        )
        .agg(
            F.coalesce(
                F.bool_and(~(F.col("kept_i") & F.col("kept_j"))), F.lit(True)
            ).alias("no_kept_near_pair")
        )
    )

    exact = embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    near_docs = (
        exact.select(F.col("i").alias("vec_id"))
        .union(exact.select(F.col("j").alias("vec_id")))
        .distinct()
        .persist()
    )
    n_near = near_docs.agg(F.count("*").alias("n_global_near_docs"))

    dropped_ok = (
        flags.filter(~F.col("kept"))
        .join(near_docs.withColumn("__near", F.lit(True)), "vec_id", "left")
        .agg(
            F.coalesce(F.bool_and(F.col("__near").isNotNull()), F.lit(True))
            .alias("dropped_subset_ok")
        )
    )

    n_docs = emb.agg(F.count("*").alias("n_docs"))
    return (
        n_docs.crossJoin(n_near)
        .crossJoin(kept_pairs)
        .crossJoin(dropped_ok)
        .select(
            "n_docs", "n_global_near_docs",
            "no_kept_near_pair", "dropped_subset_ok",
        )
    )


@register(
    "dedup_semantic_keep_best",
    """
    WITH near AS (
        SELECT DISTINCT doc FROM (
            SELECT a.vec_id AS doc
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE round(list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
        )
    )
    SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_docs,
           (SELECT count(*) FROM near)::BIGINT AS n_global_near_docs,
           true AS one_kept_per_component,
           true AS kept_is_best,
           true AS dropped_subset_ok
    """,
)
def dedup_semantic_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware SemDeDup (keep the best-scoring member of every
    embedding near-dup component — score = the document's n_chars),
    reduced to oracle-pinnable assertions:

    * ``n_docs`` / ``n_global_near_docs``: computed independently in
      both engines, exactly as in ``dedup_semantic``;
    * ``one_kept_per_component``: every component keeps exactly one
      member;
    * ``kept_is_best``: the kept member's score equals its
      component's max score AND its id is the smallest among the tied
      maxima — re-derived from the output frame, not from the
      operator's own max_by;
    * ``dropped_subset_ok``: every dropped doc has a global exact
      neighbor at the threshold (clustering limits recall, never
      precision).
    """
    from .operators.dedup import embedding_dup_pairs
    from .operators.similarity import keep_best_semantic

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "n_chars"
    )
    # lazy persist: `out` feeds three assertion subtrees and the
    # near-dup kernel behind it would otherwise run once per consumer
    # inside the final save job (no barrier job — see dedup_semantic)
    out = keep_best_semantic(
        emb, "vec_id", "embedding", docs, "n_chars",
        n_clusters=8, threshold=0.45,
    ).persist()
    comp_stats = out.groupBy("component").agg(
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("__n_kept"),
        F.max("n_chars").alias("__smax"),
        F.min(F.when(F.col("kept"), F.col("n_chars"))).alias(
            "__kept_score"
        ),
        F.min(F.when(F.col("kept"), F.col("vec_id"))).alias("__kept_id"),
    )
    tied_min = out.join(
        comp_stats.select("component", "__smax"), "component"
    ).filter(F.col("n_chars") == F.col("__smax")).groupBy("component").agg(
        F.min("vec_id").alias("__tie_min")
    )
    checks = comp_stats.join(tied_min, "component").agg(
        F.coalesce(
            F.bool_and(F.col("__n_kept") == 1), F.lit(True)
        ).alias("one_kept_per_component"),
        F.coalesce(
            F.bool_and(
                (F.col("__kept_score") == F.col("__smax"))
                & (F.col("__kept_id") == F.col("__tie_min"))
            ),
            F.lit(True),
        ).alias("kept_is_best"),
    )
    exact = embedding_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    near_docs = (
        exact.select(F.col("i").alias("vec_id"))
        .union(exact.select(F.col("j").alias("vec_id")))
        .distinct()
        .persist()
    )
    n_near = near_docs.agg(F.count("*").alias("n_global_near_docs"))
    dropped_ok = (
        out.filter(~F.col("kept"))
        .join(near_docs.withColumn("__near", F.lit(True)), "vec_id", "left")
        .agg(
            F.coalesce(F.bool_and(F.col("__near").isNotNull()), F.lit(True))
            .alias("dropped_subset_ok")
        )
    )
    n_docs = emb.agg(F.count("*").alias("n_docs"))
    return (
        n_docs.crossJoin(n_near)
        .crossJoin(checks)
        .crossJoin(dropped_ok)
        .select(
            "n_docs",
            "n_global_near_docs",
            "one_kept_per_component",
            "kept_is_best",
            "dropped_subset_ok",
        )
    )


@register(
    "similarity_kcenter",
    """
    SELECT least(16, (SELECT count(*) FROM embeddings))::BIGINT
               AS n_centers,
           true AS centers_are_input_points,
           true AS radius_nonincreasing,
           true AS final_radius_ok
    """,
)
def similarity_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (farthest-first, Gonzalez 2-approx) as
    a verified summary: the iterative selection's reported cover
    radius is RE-DERIVED independently (broadcast the 16 chosen
    centers, exact min-distance per point, global max) and must match
    the last round's radius; radii must be nonincreasing and every
    center an input point."""
    from pyspark.sql.window import Window

    from .operators.similarity import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    centers = kcenter_coreset(emb, "vec_id", "embedding", k=16)
    w = Window.orderBy("round")
    mono = centers.select(
        (
            F.col("radius_after")
            <= F.coalesce(
                F.lag("radius_after").over(w), F.lit(float("inf"))
            ) + F.lit(1e-12)
        ).alias("__ok")
    ).agg(F.bool_and("__ok").alias("radius_nonincreasing"))
    member = centers.join(emb, "vec_id", "left_semi").agg(
        F.count("*").alias("__n_in")
    )
    n_centers = centers.agg(F.count("*").alias("n_centers"))
    # unrolled codegen re-derivation via the shared builder: center
    # vectors become literal arrays, min-over-centers and
    # max-over-points in one pass with no join at all
    cvec_rows = (
        emb.join(centers.select("vec_id"), "vec_id", "left_semi")
        .select(F.col("embedding").cast("array<double>").alias("cv"))
        .collect()
    )
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mind_expr = F.least(
        *[
            F.lit(1.0) - c
            for c in _unrolled_cosines("v", [r["cv"] for r in cvec_rows])
        ]
    )
    mind = pts.select(mind_expr.alias("__mind")).agg(
        F.max("__mind").alias("__recomputed")
    )
    last = (
        centers.orderBy(F.col("round").desc())
        .limit(1)
        .select(F.col("radius_after").alias("__reported"))
    )
    return (
        n_centers.crossJoin(member)
        .crossJoin(mono)
        .crossJoin(mind)
        .crossJoin(last)
        .select(
            F.col("n_centers").cast("long").alias("n_centers"),
            (F.col("__n_in") == F.col("n_centers")).alias(
                "centers_are_input_points"
            ),
            "radius_nonincreasing",
            (
                F.abs(F.col("__recomputed") - F.col("__reported"))
                <= F.lit(1e-6)
            ).alias("final_radius_ok"),
        )
    )


@register(
    "similarity_kcenter_reps",
    """
    SELECT least(16, (SELECT count(*) FROM embeddings))::BIGINT
               AS n_centers,
           true AS centers_are_input_points,
           true AS full_ge_rep_radius,
           true AS triangle_bound_holds
    """,
)
def similarity_kcenter_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The large-n k-center composition the kcenter_coreset docstring
    promises, converted from a claim into a checked behavior: greedy
    k-center over one min-id representative per k-means cell, then
    certify (1) every chosen center is an input point, (2) the
    FULL-corpus cover radius (re-derived with unrolled codegen dots
    against the chosen centers) is >= the rep-level radius the greedy
    reported, and (3) the triangle-inequality loss bound holds in the
    CHORD metric — cosine distance d = 1-cos is not itself a metric
    (1-cos(a+b) > (1-cos a)+(1-cos b)), but chord = sqrt(2d) is, so
    the sound bound is sqrt(full) <= sqrt(rep) + sqrt(p2r), i.e.
    full_radius <= (sqrt(rep_radius) + sqrt(max_p2r))^2."""
    from .operators.dedup import cosine_pairs_col
    from .operators.similarity import kcenter_over_reps

    emb = load_table(spark, sf_dir, "embeddings")
    centers, assigned = kcenter_over_reps(
        emb, "vec_id", "embedding", k=16, n_cells=64
    )
    n_centers = centers.agg(F.count("*").alias("n_centers"))
    member = centers.join(emb, "vec_id", "left_semi").agg(
        F.count("*").alias("__n_in")
    )
    rep_radius = (
        centers.orderBy(F.col("round").desc())
        .limit(1)
        .select(F.col("radius_after").alias("__rep_r"))
    )
    cvec_rows = (
        emb.join(centers.select("vec_id"), "vec_id", "left_semi")
        .select(F.col("embedding").cast("array<double>").alias("cv"))
        .collect()
    )
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    full = pts.select(
        F.least(
            *[
                F.lit(1.0) - c
                for c in _unrolled_cosines(
                    "v", [r["cv"] for r in cvec_rows]
                )
            ]
        ).alias("__mind")
    ).agg(F.max("__mind").alias("__full_r"))
    # max point -> its cell representative distance (Arrow pairwise)
    rep_ids = assigned.groupBy("cluster").agg(
        F.min("vec_id").alias("__rid")
    )
    rep_vecs = rep_ids.join(
        emb.select(
            F.col("vec_id").alias("__rid"),
            F.col("embedding").cast("array<double>").alias("__rv"),
        ),
        "__rid",
    )
    p2r = (
        assigned.select("vec_id", "cluster")
        .join(pts, "vec_id")
        .join(rep_vecs, "cluster")
        .select(
            (
                F.lit(1.0) - cosine_pairs_col(F.col("v"), F.col("__rv"))
            ).alias("__d")
        )
        .agg(F.max("__d").alias("__max_p2r"))
    )
    return (
        n_centers.crossJoin(member)
        .crossJoin(rep_radius)
        .crossJoin(full)
        .crossJoin(p2r)
        .select(
            F.col("n_centers").cast("long").alias("n_centers"),
            (F.col("__n_in") == F.col("n_centers")).alias(
                "centers_are_input_points"
            ),
            (F.col("__full_r") >= F.col("__rep_r") - F.lit(1e-9)).alias(
                "full_ge_rep_radius"
            ),
            (
                F.col("__full_r")
                <= (
                    F.sqrt(F.greatest(F.col("__rep_r"), F.lit(0.0)))
                    + F.sqrt(F.greatest(F.col("__max_p2r"), F.lit(0.0)))
                ) ** 2
                + F.lit(1e-9)
            ).alias("triangle_bound_holds"),
        )
    )


@register(
    "corpus_sketch_stats",
    _TOKS_CTE
    + """
    , tk AS (SELECT unnest(toks) AS tok FROM t),
    n AS (
        SELECT doc_id,
               (CASE WHEN len(toks) IS NULL THEN 0 ELSE len(toks) END)
                   AS n_tok
        FROM t
    )
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
           (SELECT count(DISTINCT tok) FROM tk)::BIGINT
               AS n_distinct_tokens,
           (SELECT round(quantile_cont(n_tok, 0.5), 6) FROM n)
               AS p50_tokens,
           (SELECT round(quantile_cont(n_tok, 0.95), 6) FROM n)
               AS p95_tokens,
           true AS hll_ok,
           true AS approx_p50_ok
    """,
)
def corpus_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sketch-vs-exact corpus accounting (operators/text.py:
    # corpus_sketch_stats): exact figures cross-engine, sketch
    # estimates asserted within 5% Spark-side.
    from .operators.text import corpus_sketch_stats as _stats

    docs = load_table(spark, sf_dir, "documents")
    return _stats(docs, "doc_id", "text")


@register(
    "embedding_knn_classify",
    """
    WITH pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j, b.label AS predicted_label,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT i, predicted_label, cosine FROM (
            SELECT i, predicted_label, cosine,
                   row_number() OVER (PARTITION BY i
                                      ORDER BY cosine DESC, j ASC) AS rk
            FROM pairs)
        WHERE rk <= 5
    ),
    votes AS (
        SELECT i, predicted_label, count(*)::BIGINT AS votes,
               max(cosine) AS best
        FROM knn GROUP BY i, predicted_label
    )
    SELECT i AS vec_id, predicted_label, votes FROM (
        SELECT i, predicted_label, votes,
               row_number() OVER (PARTITION BY i
                                  ORDER BY votes DESC, best DESC,
                                           predicted_label ASC) AS rk
        FROM votes)
    WHERE rk = 1
    """,
)
def embedding_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # kNN label transfer (operators/similarity.py:knn_classify):
    # majority vote over the exact 5-NN graph with a fully
    # deterministic tie-break.
    from .operators.similarity import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_classify(emb, "vec_id", "embedding", "label", k=5)


@register(
    "events_funnel",
    """
    WITH ev AS (
        SELECT user_id, epoch_ms(ts)::BIGINT AS t, event_type FROM events
    ),
    s1 AS (
        SELECT user_id, min(t) AS step1_ms
        FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.t) AS step2_ms
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.t > s1.step1_ms
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.t) AS step3_ms
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.t > s2.step2_ms
        GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.step1_ms, s2.step2_ms, s3.step3_ms,
           s3.step3_ms IS NOT NULL AS converted
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered conversion funnel (operators/sessions.py:funnel):
    # signup -> click -> purchase, each step strictly after the
    # previous step's earliest completion.
    from .operators.sessions import funnel

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000000").alias("ts_ms"), "event_type"
    )
    return funnel(ev, "user_id", "ts_ms", ("signup", "click", "purchase"))


_FUNNEL_ORACLE = REGISTRY["events_funnel"][1]


@register("streaming_funnel", _FUNNEL_ORACLE)
def streaming_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversion funnel maintained through Structured Streaming
    under the batch query's hard oracle: events replay as a
    ts-ORDERED file feed (3 ascending time slices, one per trigger —
    greedy-incremental equals batch greedy-earliest when each user's
    events arrive in ts order), per-user funnel state advances in
    applyInPandasWithState, and the latest-wins snapshot must equal
    the one-shot batch operator row for row."""
    import glob
    import shutil
    import tempfile

    from .streaming.funnel import funnel_snapshot, run_streaming_funnel

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
    )
    t1, t2 = ev.approxQuantile("ts_ms", [0.33, 0.66], 0.001)
    base = tempfile.mkdtemp(prefix="funnel_stream_")
    try:
        feed = os.path.join(base, "feed")
        slices = [
            ev.filter(F.col("ts_ms") <= t1),
            ev.filter((F.col("ts_ms") > t1) & (F.col("ts_ms") <= t2)),
            ev.filter(F.col("ts_ms") > t2),
        ]
        for i, sl in enumerate(slices):
            sl.coalesce(1).write.mode("append").parquet(feed)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts_ms long, "
                "event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_funnel(
            spark,
            stream,
            ("signup", "click", "purchase"),
            os.path.join(base, "sink"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming funnel drain exceeded 300 s")
        rows = funnel_snapshot(
            spark, os.path.join(base, "sink"), 3
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id long, step1_ms long, step2_ms long, step3_ms long, "
        "converted boolean",
    )


@register(
    "events_retention",
    """
    WITH ev AS (
        SELECT user_id,
               epoch_ms(ts)::BIGINT // 86400000 AS b,
               event_type
        FROM events
    ),
    cohorts AS (
        SELECT user_id, min(b) AS cohort_bucket
        FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT e.user_id, c.cohort_bucket,
               e.b - c.cohort_bucket AS "offset"
        FROM ev e JOIN cohorts c USING (user_id)
        WHERE e.b >= c.cohort_bucket
    )
    SELECT cohort_bucket, "offset", count(*)::BIGINT AS n_active
    FROM act GROUP BY cohort_bucket, "offset"
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily cohort retention anchored on signup
    # (operators/sessions.py:retention)
    from .operators.sessions import retention

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000000").alias("ts_ms"), "event_type"
    )
    return retention(ev, "user_id", "ts_ms", "signup")


@register(
    "multimodal_frame_overlap",
    """
    WITH reps AS (
        SELECT min(doc_id) AS doc_id, min_by(text, doc_id) AS text
        FROM documents GROUP BY md5(text)
    ),
    idx AS (
        SELECT doc_id, text,
               unnest(range(0, least(8, ceil(length(text) / 256.0)::INT)))
                   AS i
        FROM reps WHERE length(text) > 0
    ),
    fr AS (
        SELECT DISTINCT doc_id,
               md5(substr(text, (i * 256 + 1)::INT, 256)) AS frame_hash
        FROM idx
    )
    SELECT a.doc_id AS i, b.doc_id AS j, count(*)::BIGINT AS n_shared
    FROM fr a JOIN fr b ON a.frame_hash = b.frame_hash
                        AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
)
def multimodal_frame_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared-frame near-dup over binary payloads (operators/
    # multimodal.py:frame_overlap_pairs), composed after exact
    # payload collapse (dedup_payloads) per the ingest ordering the
    # operator documents.  UTF-8 payload bytes == the varchar's bytes,
    # so DuckDB's substr/md5 on text mirrors Spark's on binary.
    from .operators.multimodal import attach_payload, frame_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_payload(docs, "doc_id", "text")
    reps = (
        payloads.groupBy(F.md5("payload").alias("__h"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("payload", "doc_id").alias("payload"),
        )
        .drop("__h")
    )
    return frame_overlap_pairs(reps, k_shared=2)


@register(
    "similarity_hard_negatives",
    """
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.qv), 6) AS score
        FROM embeddings e, q
        WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
        SELECT q_id, vec_id, score,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY score DESC, vec_id ASC
               ) AS rank
        FROM scored WHERE score < 0.95
    )
    SELECT q_id, vec_id, score, rank::BIGINT AS rank
    FROM ranked WHERE rank > 5 AND rank <= 15
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training
    (operators/similarity.py:exact_batch_topk): per query (the first
    20 vectors, a stand-in training batch), the EXACT rank band
    [6, 15] of corpus candidates after excluding the query itself and
    near-duplicates (cosine >= 0.95 — those are positives, not
    negatives).  One corpus scan with the unit-normalized query matrix
    in kernel closure, a local per-batch top-(skip+k) prune, one
    query-keyed window — no join, no corpus replication; fully
    value-pinned cross-engine (exact scores, deterministic ties)."""
    from .operators.similarity import exact_batch_topk

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") < 20)
    out = exact_batch_topk(
        emb,
        "vec_id",
        "embedding",
        qs,
        "vec_id",
        "embedding",
        k=10,
        skip=5,
        dup_threshold=0.95,
        exclude_self=True,
    )
    return out.select(
        "q_id", "vec_id", "score", F.col("rank").cast("long").alias("rank")
    )


@register(
    "similarity_ann_batch",
    """
    SELECT 20::BIGINT AS n_queries,
           200::BIGINT AS n_results,
           true AS scores_exact,
           true AS mean_recall_ok,
           true AS min_recall_ok
    """,
)
def similarity_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN retrieval — top-10 for 20 queries in ONE plan
    (operators/similarity.py:ann_ivf_batch_topk), the RAG /
    eval-harness shape.  Candidates meet co-grouped by k-means cell
    (each query explodes to its 8 probed cells), scored as one BLAS
    gram block per cell with a local top-k — never a cartesian, never
    a per-pair HOF; per-query global top-k runs as WindowGroupLimit.  The
    verified-summary oracle pins: 20 queries x 10 results, every
    returned score equals the independently recomputed exact cosine,
    mean recall@10 >= 0.75 and per-query min >= 0.4 vs the exact
    top-10 (measured mean 0.83 / min 0.5-0.6 at both sf0.01 and
    sf0.1; deterministic — the quantizer trains on the whole table
    under the 100k sample cap)."""
    from pyspark.sql.window import Window

    from .operators.dedup import cosine_col
    from .operators.similarity import ann_ivf_batch_topk

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") < 20)
    got = ann_ivf_batch_topk(
        emb, "vec_id", "embedding", qs, "vec_id", "embedding",
        k=10, n_probe=8, exclude_self=True,
    )
    q2 = qs.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c2 = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    allpairs = (
        c2.crossJoin(F.broadcast(q2))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias(
                "exact_score"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("exact_score").desc(), F.col("vec_id").asc()
    )
    exact_topk = (
        allpairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_id", "vec_id")
    )
    score_check = got.join(allpairs, ["q_id", "vec_id"], "left").agg(
        F.count("*").alias("n_results"),
        F.count_distinct("q_id").alias("n_queries"),
        F.coalesce(
            F.bool_and(
                F.col("exact_score").isNotNull()
                & (F.col("score") == F.col("exact_score"))
            ),
            F.lit(False),
        ).alias("scores_exact"),
    )
    # count hits per query with zero-hit queries RETAINED (a left_semi
    # + groupBy would silently drop an all-miss query from the min)
    recalls = (
        exact_topk.join(
            got.select(
                "q_id", "vec_id", F.lit(True).alias("__hit")
            ),
            ["q_id", "vec_id"],
            "left",
        )
        .groupBy("q_id")
        .agg(
            (
                F.count(F.when(F.col("__hit"), 1)) / F.lit(10.0)
            ).alias("recall")
        )
    )
    recall_check = recalls.agg(
        (F.avg("recall") >= F.lit(0.75)).alias("mean_recall_ok"),
        (F.min("recall") >= F.lit(0.4)).alias("min_recall_ok"),
    )
    return score_check.crossJoin(recall_check).select(
        "n_queries",
        "n_results",
        "scores_exact",
        "mean_recall_ok",
        "min_recall_ok",
    )


@register(
    "streaming_ivf",
    """
    SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_indexed,
           true AS unique_ok,
           10::BIGINT AS n_results,
           true AS scores_exact,
           true AS recall_ok,
           true AS replay_ok
    """,
)
def streaming_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index maintained through Structured Streaming
    (streaming/ivf.py) — completes the every-store-has-a-streaming-
    edition symmetry: embeddings replay as a 3-file feed, the first
    trigger TRAINS (materializes centroids + cell partitions), later
    triggers APPEND through the idempotent id anti-join.  The oracle
    pins: every vector indexed exactly once (count == table, ids
    unique), a post-drain re-append of the training slice appends 0
    (replay_ok), and an index search returns exact cosine scores with
    recall@10 >= 0.6 vs the full-corpus exact top-10 — measured 0.8
    at sf0.01 / 0.7 at sf0.1 with centroids trained on the FIRST
    batch only (the honest streaming cost: one third of the data
    picks the cells)."""
    import shutil
    import tempfile

    from .operators.similarity import (
        ann_ivf_search,
        append_to_ivf_index,
    )
    from .streaming.ivf import run_streaming_ivf

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    base = tempfile.mkdtemp(prefix="ivf_stream_")
    try:
        feed = os.path.join(base, "feed")
        for i in range(3):
            emb.filter(
                F.pmod(F.col("vec_id"), F.lit(3)) == i
            ).coalesce(1).write.mode("append").parquet(feed)
        stream = (
            spark.readStream.schema(
                spark.read.parquet(feed).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        index = os.path.join(base, "index")
        q = run_streaming_ivf(
            spark, stream, "vec_id", "embedding", index,
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming IVF drain exceeded 300 s")
        # replay probe: re-feeding the training slice appends nothing
        n_replay = append_to_ivf_index(
            emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 0),
            "vec_id",
            "embedding",
            index,
        )
        idx = spark.read.parquet(f"{index}/vectors")
        n_indexed = idx.count()
        n_unique = idx.select("vec_id").distinct().count()
        qv = emb.filter(F.col("vec_id") == 0).head()["embedding"]
        ann = ann_ivf_search(
            spark, index, qv, "vec_id", k=11, n_probe=8
        )
        ann10 = (
            ann.filter(F.col("vec_id") != 0)
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(10)
        )
        checks = _ann_topk_check(
            emb, ann10, query_id=0, k=10, min_recall=0.6
        ).head()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return _verdict_frame(
        spark,
        [
            ("n_indexed", n_indexed, "bigint"),
            ("unique_ok", n_unique == n_indexed, "boolean"),
            ("n_results", checks["n_results"], "bigint"),
            ("scores_exact", bool(checks["scores_exact"]), "boolean"),
            ("recall_ok", bool(checks["recall_ok"]), "boolean"),
            ("replay_ok", n_replay == 0, "boolean"),
        ],
    )


@register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
    edges AS (
        SELECT i AS a, j AS b FROM pairs
        UNION
        SELECT j AS a, i AS b FROM pairs
    ),
    walk AS (
        SELECT a AS doc, a AS comp FROM edges
        UNION
        SELECT e.a AS doc, w.comp FROM edges e JOIN walk w ON e.b = w.doc
    ),
    comp AS (SELECT doc, min(comp) AS component FROM walk GROUP BY doc),
    labeled AS (
        SELECT d.doc_id, d.lang, d.n_chars,
               coalesce(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
    )
    SELECT doc_id, lang, n_chars, component
    FROM labeled
    QUALIFY row_number() OVER (
        PARTITION BY component ORDER BY n_chars DESC, doc_id
    ) = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup collapse: keep the LONGEST document of
    each Jaccard-0.8 cluster (ties -> smallest id), not the smallest
    id — the representative-selection policy production curation
    actually uses.  One max_by aggregation per component (map-side
    combine, no per-cluster window)."""
    from .operators.dedup import keep_best_near_dup

    docs = load_table(spark, sf_dir, "documents")
    return keep_best_near_dup(
        docs,
        "doc_id",
        "text",
        "n_chars",
        n=3,
        threshold=0.8,
        keep_cols=["doc_id", "lang", "n_chars"],
    )


@register(
    "dedup_normalized",
    """
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                   lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'),
                   '\\s+', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT min(doc_id) AS doc_id, norm_text, count(*) AS multiplicity
    FROM n
    GROUP BY norm_text,
             CASE WHEN norm_text = '' OR norm_text IS NULL
                  THEN doc_id ELSE 0 END
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style fuzzy-exact dedup: group on case/punctuation/
    whitespace-normalized text, keep the smallest id.  The cheap
    first pass before MinHash; one hash aggregation."""
    from .operators.dedup import normalized_dedup

    docs = load_table(spark, sf_dir, "documents")
    return normalized_dedup(docs, "doc_id", "text")


_BOILERPLATE_ORACLE = """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    ch AS (
        SELECT doc_id,
               unnest([struct_pack(
                   i := i,
                   t := array_to_string(w[i*4+1:i*4+4], ' '))
                   for i in range(0, greatest(ceil(len(w)/4.0)::INT, 1))
               ]) AS c
        FROM w
    ),
    flat AS (SELECT doc_id, c.i AS chunk_id, c.t AS chunk_text FROM ch),
    df AS (
        SELECT chunk_text, count(DISTINCT doc_id) AS df
        FROM flat GROUP BY 1
    ),
    j AS (
        SELECT f.doc_id, f.chunk_id, f.chunk_text,
               (d.df >= 2) AS boiler
        FROM flat f JOIN df d USING (chunk_text)
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_chunks,
           (count(*) FILTER (boiler))::BIGINT AS n_removed,
           coalesce(
               string_agg(chunk_text, ' ' ORDER BY chunk_id)
                   FILTER (NOT boiler),
               '') AS clean_text
    FROM j GROUP BY doc_id
    """


@register(
    "text_boilerplate",
    _BOILERPLATE_ORACLE,
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (CCNet/RefinedWeb cleanup):
    strip non-overlapping 4-word chunks whose document frequency is
    >= 2, reassemble survivors in order.  DF-count and membership join
    are keyed on a two-salt xxhash64 pair so chunk text never rides a
    shuffle."""
    from .operators.text import boilerplate_removal

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_removal(
        docs, "doc_id", "text", chunk_words=4, min_df=2
    )


_LINE_DEDUP_ORACLE = """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    ch AS (
        SELECT doc_id,
               unnest([struct_pack(
                   i := i,
                   t := array_to_string(w[i*4+1:i*4+4], ' '))
                   for i in range(0, greatest(ceil(len(w)/4.0)::INT, 1))
               ]) AS c
        FROM w
    ),
    flat AS (SELECT doc_id, c.i AS chunk_id, c.t AS chunk_text FROM ch),
    marked AS (
        SELECT doc_id, chunk_id, chunk_text,
               row_number() OVER (
                   PARTITION BY chunk_text ORDER BY doc_id, chunk_id
               ) AS rn
        FROM flat
    )
    SELECT doc_id,
           coalesce(
               string_agg(chunk_text, ' ' ORDER BY chunk_id)
                   FILTER (rn = 1),
               '') AS clean_text,
           count(*)::BIGINT AS n_chunks,
           (count(*) FILTER (rn = 1))::BIGINT AS n_kept
    FROM marked GROUP BY doc_id
    """


@register("text_line_dedup", _LINE_DEDUP_ORACLE)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level first-occurrence-wins segment dedup (CCNet/Dolma
    line dedup with 4-token segments standing in for lines): every
    distinct segment survives exactly once corpus-wide, at its
    earliest (doc_id, chunk_id).  Keep-one complement to
    text_boilerplate's drop-all; clone-collapsed, winner election is
    one min-struct hash aggregation on the 128-bit chunk key."""
    from .operators.text import line_dedup

    docs = load_table(spark, sf_dir, "documents")
    return line_dedup(docs, "doc_id", "text", chunk_words=4)


@register(
    "layout_zorder",
    """
    WITH b AS (
        SELECT min(user_id) AS xlo, max(user_id) AS xhi,
               min(epoch_ms(ts)::BIGINT) AS ylo,
               max(epoch_ms(ts)::BIGINT) AS yhi
        FROM events
    ),
    s AS (
        SELECT event_id,
               ((user_id - xlo) * 255) // greatest(xhi - xlo, 1) AS sx,
               ((epoch_ms(ts)::BIGINT - ylo) * 255)
                   // greatest(yhi - ylo, 1) AS sy
        FROM events, b
    )
    SELECT event_id,
           (
             (((sx >> 0) & 1) << 0)  | (((sy >> 0) & 1) << 1)  |
             (((sx >> 1) & 1) << 2)  | (((sy >> 1) & 1) << 3)  |
             (((sx >> 2) & 1) << 4)  | (((sy >> 2) & 1) << 5)  |
             (((sx >> 3) & 1) << 6)  | (((sy >> 3) & 1) << 7)  |
             (((sx >> 4) & 1) << 8)  | (((sy >> 4) & 1) << 9)  |
             (((sx >> 5) & 1) << 10) | (((sy >> 5) & 1) << 11) |
             (((sx >> 6) & 1) << 12) | (((sy >> 6) & 1) << 13) |
             (((sx >> 7) & 1) << 14) | (((sy >> 7) & 1) << 15)
           )::BIGINT AS z
    FROM s
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) codes over (user_id, event-time): the
    multi-dimensional clustering key that makes file min/max pruning
    work on BOTH filter columns at once — the data-layout lever for
    selective scans at 100 TB.  Exact-integer bucket ranks (DIV, no
    float rounding) against one broadcast bounds row, bit interleave
    inside whole-stage codegen; the hard oracle pins the code
    bit-for-bit cross-engine."""
    from .operators.layout import zorder_frame

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # integer div: ts is epoch-ns and exceeds double's exact range
        F.expr("ts div 1000000").alias("ts_ms"),
    )
    return zorder_frame(ev, "user_id", "ts_ms", bits=8).select(
        "event_id", "z"
    )


@register(
    "table_skew_profile",
    """
    WITH counts AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    s AS (
        SELECT sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
               max(cnt)::BIGINT AS max_key_rows,
               round(quantile_cont(cnt, 0.99), 6) AS p99_key_rows
        FROM counts
    ),
    t AS (
        SELECT sum(cnt)::BIGINT AS top_rows FROM (
            SELECT cnt FROM counts ORDER BY cnt DESC, user_id LIMIT 10
        )
    )
    SELECT n_rows, n_keys,
           round(n_rows::DOUBLE / n_keys, 6) AS avg_key_rows,
           max_key_rows, p99_key_rows,
           round(max_key_rows::DOUBLE / (n_rows::DOUBLE / n_keys), 6)
               AS skew_ratio,
           round(top_rows::DOUBLE / n_rows, 6) AS topk_share,
           least(64, greatest(1, ceil(
               (max_key_rows::DOUBLE / (n_rows::DOUBLE / n_keys)) / 4
           )::INT))::INT AS recommended_salts
    FROM s, t
    """,
)
def table_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics on events.user_id — max/p99/top-10
    key load vs the uniform baseline, plus the salt fan-out
    recommendation salted_join would take.  Two aggregations over the
    |keys|-sized count frame."""
    from .operators.profile import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, ["user_id"], top_k=10)


@register(
    "text_quality_rank",
    """
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(trim(text), '\\s+') AS w,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END)::DOUBLE AS n
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               floor((least(n / 200.0, 1.0) * 0.3
                     + (len(list_distinct(w))::DOUBLE / nullif(n, 0)) * 0.3
                     + (1.0 - len(list_filter(w, x -> x IN
                           ('the','a','of','to','in','and','is','on')
                       ))::DOUBLE / nullif(n, 0)) * 0.2
                     + least((length(array_to_string(w, ''))::DOUBLE
                              / nullif(n, 0)) / 8.0, 1.0) * 0.2)
                     * 1000000) / 1000000 AS quality_score
        FROM t
    ),
    thr AS (
        SELECT lang, quantile_cont(quality_score, 0.5) AS thr
        FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.quality_score,
           round(t.thr, 6) AS group_threshold
    FROM scored s JOIN thr t USING (lang)
    WHERE s.quality_score >= t.thr
    """,
)
def text_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality thresholding: keep each language's top
    half by quality score.  The threshold is a |languages|-row
    broadcast aggregate, NOT a percent_rank window — the corpus is
    never range-partitioned by the low-cardinality language key."""
    from .operators.text import quality_rank_filter

    docs = load_table(spark, sf_dir, "documents")
    return quality_rank_filter(
        docs, "doc_id", "text", ["lang"], quantile=0.5
    )


@register(
    "text_ngram_novelty",
    """
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            [array_to_string(w[i:i+2], ' ')
             for i in range(1, len(w) - 1)])) AS s
        FROM w
    ),
    dfc AS (SELECT s, count(*) AS dfc FROM sh GROUP BY s)
    SELECT doc_id,
           count(*)::BIGINT AS n_grams,
           round(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS novelty
    FROM sh JOIN dfc USING (s)
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's distinct 3-gram shingles with
    corpus document-frequency 1 — the linear inverted-index
    aggregation (no pair join), flagging boilerplate-heavy docs (low)
    and memorization-risk one-offs (high)."""
    from .operators.text import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, "doc_id", "text", n=3)


@register(
    "multimodal_cdc_chunks",
    """
    SELECT count(*)::BIGINT AS n_payloads,
           count(DISTINCT text)::BIGINT AS n_distinct_payloads,
           sum(octet_length(encode(text)))::BIGINT AS total_bytes,
           true AS bytes_match,
           true AS bounds_ok,
           true AS clones_consistent
    FROM documents
    """,
)
def multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (FastCDC-style) over binary payloads
    under a verified-summary oracle: the chunk set is hash-rule-
    dependent (not SQL-expressible), so the cross-engine check pins
    what IS engine-independent — payload counts and total bytes — and
    reduces the structural guarantees to booleans the oracle pins
    ``true``:

    * ``bytes_match``: every payload's chunks sum exactly to its byte
      length (exact cover, no gap/overlap);
    * ``bounds_ok``: every chunk length within (0, max_len];
    * ``clones_consistent``: identical payloads produce identical
      ordered chunk-digest sequences (the determinism that makes
      chunk-level dedup correct).

    Shift-resilience (the CDC selling point vs fixed-size chunking)
    is pinned in the unit test with controlled prefix-insertion data.
    """
    from .operators.multimodal import attach_payload, content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_payload(docs, "doc_id", "text")
    chunks = content_defined_chunks(
        payloads, window=4, mask_bits=5, min_len=16, max_len=64
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("length").alias("__cbytes"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "digest"))
                    ),
                    lambda s: s["digest"],
                ),
                "",
            )
        ).alias("__fp"),
    )
    pl = payloads.select(
        "doc_id",
        F.length("payload").alias("__nb"),
        F.md5("payload").alias("__pdig"),
    )
    joined = pl.join(per_doc, "doc_id", "left")
    summary = joined.agg(
        F.count("*").alias("n_payloads"),
        F.countDistinct("__pdig").alias("n_distinct_payloads"),
        F.sum("__nb").cast("long").alias("total_bytes"),
        F.bool_and(
            F.coalesce(F.col("__cbytes"), F.lit(0)) == F.col("__nb")
        ).alias("bytes_match"),
    )
    bounds = chunks.agg(
        F.coalesce(
            F.bool_and(F.col("length").between(1, 64)), F.lit(True)
        ).alias("bounds_ok")
    )
    clones = (
        joined.groupBy("__pdig")
        .agg(F.countDistinct("__fp").alias("__nfp"))
        .agg(
            F.coalesce(
                F.bool_and(F.col("__nfp") == 1), F.lit(True)
            ).alias("clones_consistent")
        )
    )
    return summary.crossJoin(bounds).crossJoin(clones)


@register("streaming_line_dedup", _LINE_DEDUP_ORACLE)
def streaming_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first-occurrence-wins segment store maintained through
    Structured Streaming under the batch query's hard oracle:
    documents replay as an id-ORDERED file feed (3 ascending doc_id
    ranges, one per trigger — first-arrival-wins equals batch
    min-id-wins exactly when ids arrive in order), each micro-batch
    appends its newly-kept segment hashes through the digest-guarded
    incremental store, and the concatenated per-batch outputs must
    equal the one-shot batch operator row for row."""
    import glob
    import shutil
    import tempfile

    from .streaming.line_dedup import run_streaming_line_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t1, t2 = docs.approxQuantile("doc_id", [0.33, 0.66], 0.001)
    base = tempfile.mkdtemp(prefix="ld_stream_")
    try:
        feed = os.path.join(base, "feed")
        slices = [
            docs.filter(F.col("doc_id") <= t1),
            docs.filter((F.col("doc_id") > t1) & (F.col("doc_id") <= t2)),
            docs.filter(F.col("doc_id") > t2),
        ]
        for i, sl in enumerate(slices):
            sl.coalesce(1).write.mode("append").parquet(feed)
            # strictly increasing mtimes pin trigger order = id order
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_line_dedup(
            spark,
            stream,
            "doc_id",
            "text",
            os.path.join(base, "store"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            chunk_words=4,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming line-dedup drain exceeded 300 s")
        rows = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("doc_id", "clean_text", "n_chunks", "n_kept")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, clean_text string, n_chunks long, n_kept long"
    )


@register("streaming_substring_dedup", _SUBSTRING_ORACLE)
def streaming_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr window-hash store maintained through
    Structured Streaming under the batch query's hard oracle:
    documents replay as an id-ORDERED file feed (3 ascending doc_id
    ranges, one per trigger — a window's first ``(doc, pos)``
    instance sits in the first batch that contains the window, so
    first-arrival-wins equals batch min-(doc,pos)-wins exactly), each
    micro-batch appends its first-seen window hashes through the
    digest-guarded incremental store, and the concatenated per-batch
    outputs must equal the one-shot batch operator row for row."""
    import glob
    import shutil
    import tempfile

    from .streaming.substring_dedup import run_streaming_substring_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t1, t2 = docs.approxQuantile("doc_id", [0.33, 0.66], 0.001)
    base = tempfile.mkdtemp(prefix="sub_stream_")
    try:
        feed = os.path.join(base, "feed")
        slices = [
            docs.filter(F.col("doc_id") <= t1),
            docs.filter((F.col("doc_id") > t1) & (F.col("doc_id") <= t2)),
            docs.filter(F.col("doc_id") > t2),
        ]
        for i, sl in enumerate(slices):
            sl.coalesce(1).write.mode("append").parquet(feed)
            # strictly increasing mtimes pin trigger order = id order
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_substring_dedup(
            spark,
            stream,
            "doc_id",
            "text",
            os.path.join(base, "store"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            window_tokens=8,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming substring-dedup drain exceeded 300 s"
            )
        rows = (
            spark.read.parquet(os.path.join(base, "out"))
            .select(
                "doc_id", "n_tokens", "dup_tokens", "keep_frac", "clean_text"
            )
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, n_tokens long, dup_tokens long, keep_frac double, "
        "clean_text string",
    )


@register("streaming_boilerplate", _BOILERPLATE_ORACLE)
def streaming_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate chunk-DF store maintained through Structured
    Streaming under the batch query's hard oracle: documents replay
    as a file feed (3 files, one per trigger), each micro-batch
    appends its chunk doc-counts through the digest-guarded
    incremental store, and cleaning the full corpus against the final
    store must equal the one-shot batch operator exactly — DF sums
    commute, so the drain order cannot matter and the oracle pins
    that it didn't."""
    import shutil
    import tempfile

    from .operators.text import boilerplate_clean_over_store
    from .streaming.boilerplate import run_streaming_boilerplate

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    def build_feed(feed: str) -> None:
        # three disjoint slices -> three files -> three triggers
        for i in range(3):
            docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i).coalesce(
                1
            ).write.mode("append").parquet(feed)

    base = tempfile.mkdtemp(prefix="bp_stream_")
    try:
        feed = _shared_stream_feed(spark, sf_dir, "bp_feed", build_feed)
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).option("maxFilesPerTrigger", 1).parquet(feed)
        store = os.path.join(base, "store")
        q = run_streaming_boilerplate(
            spark,
            stream,
            "doc_id",
            "text",
            store,
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            chunk_words=4,
            min_df=2,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming boilerplate drain exceeded 300 s"
            )
        out = boilerplate_clean_over_store(
            spark, docs, "doc_id", "text", store,
            chunk_words=4, min_df=2,
        )
        rows = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, n_chunks long, n_removed long, clean_text string",
    )


# ====================================================================
# Hashing-trick document embeddings + text-to-ANN retrieval pipeline
# (round 7 continuation)
# ====================================================================

_HASH_EMBED_DIM = 32

_HASH_EMBED_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(coalesce(text, ''))) > 0
    ),
    h AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 8))::BIGINT
                   % {_HASH_EMBED_DIM} AS b,
               CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM toks
    ),
    agg AS (
        SELECT doc_id,
               {", ".join(
                   f"coalesce(sum(CASE WHEN b={i} THEN s END), 0)::BIGINT"
                   f" AS c{i}" for i in range(_HASH_EMBED_DIM)
               )}
        FROM h GROUP BY doc_id
    )
    SELECT d.doc_id,
           concat_ws(',', {", ".join(
               f"coalesce(a.c{i}, 0)" for i in range(_HASH_EMBED_DIM)
           )}) AS vec_csv
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register("text_hash_embed", _HASH_EMBED_SQL)
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings (Weinberger et al.
    ICML'09): md5-bucketed ±1 token histogram, all JVM (explode +
    one conditional-sum aggregation, map-side combined — no
    token-keyed join, no Python).  The registry pins the RAW signed
    counts — exact integers, so the cross-engine hash is
    float-risk-free — serialized CSV like the quantize codes (list
    cells are unhashable driver-side).  The normalized form feeds
    the ANN stack; ``pipeline_text_ann`` certifies it end-to-end."""
    from .operators.text import hash_embed

    docs = load_table(spark, sf_dir, "documents")
    emb = hash_embed(
        docs, "doc_id", "text", dim=_HASH_EMBED_DIM, normalize=False
    )
    return emb.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("vec"), lambda x: x.cast("long").cast("string")
            ),
            ",",
        ).alias("vec_csv"),
    )


@register(
    "pipeline_text_ann",
    """
    SELECT 10::BIGINT AS n_results,
           true AS scores_exact,
           true AS recall_ok
    """,
)
def pipeline_text_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end model-free retrieval: hash-embed the documents
    table (unit-normalized), index with IVF, query one doc's vector,
    certify against the exact brute-force cosine top-k over the same
    embeddings (the `_ann_topk_check` contract: ANN must never
    fabricate scores; recall@10 floor 0.7 — measured 1.0 at sf0.01
    and sf0.1, deterministic at these scales because the k-means
    train sample is the whole distinct-text rep set).

    The pipeline runs over one rep per DISTINCT text (min doc_id) —
    exact-duplicate texts produce identical vectors, and indexing
    them would only multiply tie rows in every top-k; dedup-then-
    index is also the semantically right pipeline order.  Empty-text
    docs (zero vectors, no cosine) are excluded by construction.
    """
    from .operators.text import hash_embed
    from .operators.similarity import ann_ivf_topk

    docs = load_table(spark, sf_dir, "documents")
    reps = (
        docs.filter(F.length(F.trim(F.coalesce("text", F.lit("")))) > 0)
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    emb = hash_embed(
        reps, "doc_id", "text", dim=_HASH_EMBED_DIM, normalize=True
    ).select(
        F.col("doc_id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    # one eager materialization: the IVF trainer, the cell assigner,
    # and the exact-check scan would each otherwise recompute the
    # explode + histogram lineage
    emb = emb.localCheckpoint(eager=True)
    qid = int(emb.agg(F.min("vec_id")).head()[0])
    ann = ann_ivf_topk(
        emb, "vec_id", "embedding", query_id=qid, k=10, n_probe=8
    )
    return _ann_topk_check(emb, ann, query_id=qid, k=10, min_recall=0.7)


@register(
    "text_perplexity_buckets",
    """
    WITH t0 AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE length(trim(text)) > 0
    ),
    tok AS (SELECT doc_id, unnest(w) AS t FROM t0),
    uni AS (SELECT t, count(*) AS c1 FROM tok GROUP BY t),
    tot AS (SELECT sum(c1)::DOUBLE AS n FROM uni),
    pairs AS (
        SELECT doc_id,
               unnest([{'p': w[i], 'c': w[i + 1]}
                       for i in range(1, len(w))], recursive := true)
        FROM t0
    ),
    bi AS (SELECT p, c, count(*) AS c2 FROM pairs GROUP BY p, c),
    x AS (
        SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               floor(avg(-ln(0.7 * (c2 / up.c1)
                             + 0.3 * (uc.c1 / n))) * 1000000)
                   / 1000000 AS xent2
        FROM pairs
        JOIN bi USING (p, c)
        JOIN uni up ON pairs.p = up.t
        JOIN uni uc ON pairs.c = uc.t
        CROSS JOIN tot
        GROUP BY doc_id
    ),
    xd AS (
        SELECT d.doc_id, d.lang,
               coalesce(x.n_bigrams, 0) AS n_bigrams,
               coalesce(x.xent2, 0.0) AS xent2
        FROM documents d LEFT JOIN x USING (doc_id)
    ),
    r AS (
        SELECT lang, n_bigrams, xent2,
               ntile(3) OVER (PARTITION BY lang
                              ORDER BY xent2, doc_id) AS bucket
        FROM xd
    )
    SELECT lang, bucket::INT AS bucket, count(*)::BIGINT AS n_docs,
           sum(n_bigrams)::BIGINT AS total_bigrams,
           (sum(round(xent2 * 1000000)::BIGINT) // count(*))::BIGINT
               AS avg_xent2_micro
    FROM r GROUP BY lang, bucket
    """,
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity tiers per language (Wenzek
    et al., LREC'20) — the data-selection recipe that keeps the
    lowest-perplexity tier and drops or downweights the rest.  The
    oracle uses DuckDB's own ntile window; the Spark side computes
    identical tiers WITHOUT a per-language single-task window sort
    (grid-offset two-pass ranking — see the operator docstring for
    the skew story).  Mean xent is exact integer micro-nats: the
    per-doc xent2 values are already floor6-pinned cross-engine, so
    summing their micro-units and integer-dividing is float-free."""
    from .operators.text import perplexity_buckets

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "doc_id", "text", "lang", n_buckets=3)


@register(
    "events_attribution",
    """
    WITH o AS (
        SELECT user_id, event_id, event_type,
               epoch_ms(ts)::BIGINT AS ts_ms
        FROM events
    ),
    conv AS (
        SELECT user_id, event_id AS conv_id, ts_ms AS conv_ts
        FROM o WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id, event_type, ts_ms
        FROM o WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT c.conv_id, t.event_id, t.event_type,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.ts_ms, t.event_id) AS rf,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.ts_ms DESC,
                                           t.event_id DESC) AS rl,
               count(*) OVER (PARTITION BY c.conv_id) AS n_t
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.ts_ms >= c.conv_ts - 3600000
         AND t.ts_ms <= c.conv_ts - 1
    ),
    f AS (SELECT conv_id, event_id AS first_touch_id,
                 event_type AS first_touch_type FROM j WHERE rf = 1),
    l AS (SELECT conv_id, event_id AS last_touch_id,
                 event_type AS last_touch_type, n_t FROM j WHERE rl = 1)
    SELECT c.user_id, c.conv_id, c.conv_ts,
           f.first_touch_id, f.first_touch_type,
           l.last_touch_id, l.last_touch_type,
           coalesce(l.n_t, 0)::BIGINT AS n_touches
    FROM conv c
    LEFT JOIN f USING (conv_id)
    LEFT JOIN l USING (conv_id)
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution over the trailing hour
    (purchases attributed to click/view touches).  The oracle takes
    the textbook conversions×touches range self-join; the Spark side
    gets all three signals from ONE value-based RANGE frame over one
    user-keyed exchange — at scale the self-join multiplies every
    conversion by its lookback volume, the window does not."""
    from .operators.sessions import attribution

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000000").alias("ts_ms"),
        "event_type",
    )
    return attribution(
        ev,
        "user_id",
        "event_id",
        "ts_ms",
        "event_type",
        touch_types=("click", "view"),
        conversion_type="purchase",
        lookback_ms=3600 * 1000,
    )


@register(
    "text_topic_clusters",
    """
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs_total,
           true AS clusters_ok,
           true AS labels_ok
    """,
)
def text_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free topic discovery end-to-end (hash-embed -> spherical
    k-means -> TF-IDF cluster labels), verified-summary style:
    ``n_docs_total`` pins cross-engine that every document landed in
    exactly one cluster (sum of per-cluster counts == table count);
    ``clusters_ok`` that the partition is 1..k clusters;
    ``labels_ok`` that every cluster carries a non-empty rank-ordered
    label (the fixture has no all-empty-text cluster).  The k-means
    assignment itself is independently certified by the
    ``embedding_kmeans`` registry query; a pytest pins that two
    disjoint-vocabulary topic groups separate and label correctly."""
    from .operators.text import topic_clusters

    docs = load_table(spark, sf_dir, "documents")
    out = topic_clusters(docs, "doc_id", "text", k=8)
    return out.agg(
        F.sum("n_docs").cast("long").alias("n_docs_total"),
        F.coalesce(
            F.bool_and(
                (F.col("cluster") >= 0) & (F.col("cluster") < 8)
            ),
            F.lit(False),
        ).alias("clusters_ok"),
        F.coalesce(
            F.bool_and(
                F.col("top_terms_csv").isNotNull()
                & (F.length("top_terms_csv") > 0)
            ),
            F.lit(False),
        ).alias("labels_ok"),
    )


@register(
    "dedup_text_semantic",
    f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents WHERE length(trim(coalesce(text, ''))) > 0
    ),
    h AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 8))::BIGINT
                   % {_HASH_EMBED_DIM} AS b,
               CASE WHEN ('0x' || substr(md5(t), 9, 1))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM toks
    ),
    agg AS (
        SELECT doc_id,
               {", ".join(
                   f"coalesce(sum(CASE WHEN b={i} THEN s END), 0)::DOUBLE"
                   f" AS c{i}" for i in range(_HASH_EMBED_DIM)
               )}
        FROM h GROUP BY doc_id
    ),
    vecs AS (
        SELECT d.doc_id,
               [{", ".join(
                   f"coalesce(a.c{i}, 0.0)"
                   for i in range(_HASH_EMBED_DIM)
               )}] AS v
        FROM documents d LEFT JOIN agg a USING (doc_id)
    ),
    nz AS (
        SELECT doc_id, v FROM vecs
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    )
    SELECT a.doc_id AS i, b.doc_id AS j,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.92
    """,
)
def dedup_text_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free semantic near-dup over the documents table:
    hash-embed (raw signed counts — cosine is scale-invariant, so no
    normalization pass is needed) and run the exact blocked-gram
    cosine pair operator at 0.92.  Uniquely among the semantic-dedup
    family, this one gets a HARD cross-engine oracle: DuckDB
    recomputes the embeddings themselves from the text (same md5
    bucketing) and brute-forces the pair set — no verified-summary
    indirection, every pair and cosine value hashed."""
    from .operators.text import hash_embed

    docs = load_table(spark, sf_dir, "documents")
    emb = hash_embed(
        docs, "doc_id", "text", dim=_HASH_EMBED_DIM, normalize=False
    )
    return embedding_dup_pairs(emb, "doc_id", "vec", threshold=0.92)


_WINNOW_FPS = """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    nums AS (
        SELECT doc_id,
               [(ascii(x[1:1]) * 31 + length(x))::BIGINT for x in w] AS v
        FROM t WHERE len(w) >= 5
    ),
    grams AS (
        SELECT doc_id,
               [list_reduce(list_prepend(0::BIGINT, v[i:i+4]),
                            (acc, x) -> (acc * 31 + x) % 1000000007)
                for i in generate_series(1, len(v) - 4)] AS h
        FROM nums
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(h) <= 4 THEN [list_min(h)]
                        ELSE [list_min(h[j:j+3])
                              for j in generate_series(1, len(h) - 3)]
                   END) AS f
        FROM grams
    )
"""


@register(
    "text_winnow_fingerprints",
    _WINNOW_FPS + "SELECT doc_id, unnest(f) AS fp FROM fps",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=5-token grams, window w=4) —
    every selected local hash of every document, pinned value-exact
    cross-engine: the DuckDB oracle recomputes the rolling gram
    hashes and the window minima from the raw text with list
    comprehensions."""
    from .operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "doc_id", "text", k=5, w=4)


@register(
    "dedup_winnow_overlap",
    _WINNOW_FPS
    + """,
    counts AS (SELECT doc_id, len(f) AS nf FROM fps),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*)::BIGINT AS sh
        FROM (SELECT doc_id, unnest(f) AS fp FROM fps) a
        JOIN (SELECT doc_id, unnest(f) AS fp FROM fps) b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(sh::DOUBLE / least(ca.nf, cb.nf), 6) AS containment
    FROM shared
    JOIN counts ca ON ca.doc_id = i
    JOIN counts cb ON cb.doc_id = j
    WHERE round(sh::DOUBLE / least(ca.nf, cb.nf), 6) >= 0.5
    """,
)
def dedup_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-sharing pairs over winnowing fingerprints: containment
    >= 0.5 of the smaller fingerprint set.  By the winnowing guarantee
    any shared 8-token run (k+w-1) forces a shared fingerprint, so
    excerpt/quote relationships surface that doc-level Jaccard
    dilutes away.  Clone-collapsed inverted-index self-join (the
    jaccard_pairs scale shape); oracle brute-forces the same pair set
    from the raw text."""
    from .operators.dedup import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        docs, "doc_id", "text", k=5, w=4, threshold=0.5
    )


@register(
    "streaming_winnow_pairs",
    _WINNOW_FPS
    + """,
    counts AS (SELECT doc_id, len(f) AS nf FROM fps),
    shared AS (
        SELECT a.doc_id AS i, b.doc_id AS j, count(*)::BIGINT AS sh
        FROM (SELECT doc_id, unnest(f) AS fp FROM fps) a
        JOIN (SELECT doc_id, unnest(f) AS fp FROM fps) b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i, j,
           round(sh::DOUBLE / least(ca.nf, cb.nf), 6) AS containment
    FROM shared
    JOIN counts ca ON ca.doc_id = i
    JOIN counts cb ON cb.doc_id = j
    WHERE round(sh::DOUBLE / least(ca.nf, cb.nf), 6) >= 0.5
    """,
)
def streaming_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnowing-fingerprint store maintained through Structured
    Streaming under the batch query's hard oracle: documents replay
    as an UNORDERED hash-split file feed (the fingerprint set fully
    determines the score, so the family is exact and order-free —
    each pair is emitted once, by whichever batch first contains both
    members), each micro-batch probes + appends through the
    id-anti-joined incremental store, and the concatenated per-batch
    outputs must equal the one-shot batch operator row for row."""
    import glob
    import shutil
    import tempfile

    from .streaming.winnow import run_streaming_winnow_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build_feed(feed: str) -> None:
        slices = [
            docs.filter(F.col("doc_id") % 3 == s) for s in (2, 0, 1)
        ]
        for i, sl in enumerate(slices):
            sl.coalesce(1).write.mode("append").parquet(feed)
            # strictly increasing mtimes pin a deterministic trigger
            # order (any order is correct; determinism aids replay)
            for f in glob.glob(os.path.join(feed, "*.parquet")):
                if os.path.getmtime(f) > 1_700_000_000:
                    os.utime(f, (1_600_000_000 + i * 60,) * 2)

    base = tempfile.mkdtemp(prefix="wn_stream_")
    try:
        feed = _shared_stream_feed(spark, sf_dir, "wn_feed", build_feed)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_streaming_winnow_pairs(
            spark,
            stream,
            "doc_id",
            "text",
            os.path.join(base, "store"),
            os.path.join(base, "out"),
            os.path.join(base, "ckpt"),
            k=5,
            w=4,
            threshold=0.5,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming winnow drain exceeded 300 s")
        rows = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("i", "j", "containment")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "i long, j long, containment double")


# --------------------------------------------------------------------
# Round 9: CDC-maintained search stores — inserts, updates AND deletes
# flow through to the BM25 index (the reference's whole purpose:
# src/processor.ts:225-258 routes all three op kinds into ES, deletes
# at :244-250), pinned against an oracle computing BM25 over the FINAL
# corpus state (insert ∪ update − delete) from the raw table — i.e.
# exactly an index rebuilt from scratch.
# --------------------------------------------------------------------

_CDC_BM25_ORACLE = """
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 3
                    THEN 'updated ' || text ELSE text END AS text
        FROM documents
        WHERE NOT (doc_id % 11 = 5 AND doc_id % 7 <> 3)
    ),
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM corpus
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('updated', 'spark', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
"""


def _cdc_mutated_store(spark: SparkSession, sf_dir: str, store: str) -> str:
    """Fold the corpus, then apply one CDC batch (update docs with
    doc_id % 7 == 3 to 'updated ' || text; delete doc_id % 11 == 5
    among the rest) and REPLAY it once — the digest no-op pin."""
    from .operators.text import (
        apply_cdc_to_bm25_index,
        incremental_bm25_index,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incremental_bm25_index(spark, docs, store)  # fold is eager; the returned frame is discarded
    upd = docs.filter(F.col("doc_id") % 7 == 3).select(
        "doc_id",
        F.lit("u").alias("op"),
        F.concat(F.lit("updated "), F.col("text")).alias("text"),
    )
    dels = docs.filter(
        (F.col("doc_id") % 11 == 5) & (F.col("doc_id") % 7 != 3)
    ).select(
        "doc_id", F.lit("d").alias("op"), F.lit(None).cast("string").alias("text")
    )
    cdc = upd.unionByName(dels)
    apply_cdc_to_bm25_index(spark, cdc, store)
    # at-least-once redelivery: the whole batch must no-op
    apply_cdc_to_bm25_index(spark, cdc, store)
    return store


@register("search_cdc_upsert", _CDC_BM25_ORACLE)
def search_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained BM25 store (operators/text.py:
    apply_cdc_to_bm25_index): the corpus folds in, one CDC batch
    updates ~1/7 of the docs and deletes ~1/11, the batch REPLAYS once
    (content-digest no-op), and ``bm25_over_store`` — resolving each
    doc to its latest generation and dropping tombstones at read time
    — must score exactly like an index rebuilt from the final corpus
    state (the oracle computes that rebuild from the raw table).
    Updates supersede by generation, deletes tombstone; the store is
    append-only throughout.  The mutated store is built ONCE per
    process (shared with the compaction row and bench repeats — r9
    VERDICT #8); the serving read is the per-call work."""
    from .operators.text import bm25_over_store

    store = _shared_store(
        "bm_cdc", sf_dir, lambda p: _cdc_mutated_store(spark, sf_dir, p)
    )
    rows = bm25_over_store(
        spark, store, ["updated", "spark", "table"], top_k=10
    ).collect()
    return spark.createDataFrame(rows, "doc long, score double").select(
        F.col("doc").alias("doc_id"), "score"
    )


@register("search_cdc_compaction", _CDC_BM25_ORACLE)
def search_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction RECLAIM on a CDC-mutated store: after the update +
    delete batch, ``compact_bm25_store`` drops superseded generations
    and tombstoned docs, rewrites token-range-clustered, and resets
    the mutated flag so readers return to the no-window fast path —
    and the top-10 must STILL equal the rebuilt-from-scratch oracle
    (same oracle as ``search_cdc_upsert``; the reclaim may change
    layout, never results).  The mutated store is shared with
    ``search_cdc_upsert``; this row COPIES it and runs the reclaim on
    the copy — the compaction is the measured operator, the fold+CDC
    build is not re-paid (r9 VERDICT #8)."""
    from .operators.text import bm25_over_store, compact_bm25_store

    src = _shared_store(
        "bm_cdc", sf_dir, lambda p: _cdc_mutated_store(spark, sf_dir, p)
    )
    store = _shared_derived_store(
        "bm_cdc_compact",
        sf_dir,
        src,
        lambda p: compact_bm25_store(spark, p),
    )
    rows = bm25_over_store(
        spark, store, ["updated", "spark", "table"], top_k=10
    ).collect()
    return spark.createDataFrame(rows, "doc long, score double").select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_cdc_facets",
    """
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 <> 1
    ),
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM corpus
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('spark', 'value')
    )
    SELECT lang, count(*) AS n_docs
    FROM corpus JOIN matched USING (doc_id)
    GROUP BY lang
    ORDER BY n_docs DESC, lang ASC
    """,
)
def search_cdc_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-values facets on a CDC-mutated store: the corpus folds in
    with ``lang`` as a stored field, a CDC batch deletes every third
    doc, and the terms aggregation over the matched set — served
    entirely from the index — must count exactly the SURVIVING docs
    (tombstoned docstats rows drop at read time; the oracle counts
    from the raw table minus the deletes).  Store built once per
    process, shared across bench repeats (r9 VERDICT #8)."""
    from .operators.text import (
        apply_cdc_to_bm25_index,
        facets_over_store,
        incremental_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )

    def build(store: str) -> None:
        incremental_bm25_index(
            spark, docs, store, field_cols=["lang"]
        )  # fold is eager; the returned frame is discarded
        dels = docs.filter(F.col("doc_id") % 3 == 1).select(
            "doc_id",
            F.lit("d").alias("op"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        apply_cdc_to_bm25_index(
            spark, dels, store, field_cols=["lang"]
        )

    store = _shared_store("bm_cdc_facets", sf_dir, build)
    rows = facets_over_store(
        spark, store, ["spark", "value"], "lang"
    ).collect()
    return spark.createDataFrame(rows, "lang string, n_docs long")


_DENSE_CDC_ORACLE = """
    WITH corpus AS (
        SELECT vec_id,
               CASE WHEN vec_id % 7 = 3
                    THEN list_transform(embedding::DOUBLE[], x -> -x)
                    ELSE embedding::DOUBLE[] END AS embedding
        FROM embeddings
        WHERE vec_id % 5 <> 2
    )
    SELECT e.vec_id,
           round(list_cosine_similarity(
               e.embedding, q.embedding), 6) AS score
    FROM corpus e,
         (SELECT embedding FROM corpus WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
"""


def _cdc_mutated_ivf(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Materialize the IVF index, then one CDC batch: negate the
    embedding of every vec_id % 7 == 3 (an update the oracle can
    replicate exactly — negation is FP-exact) and delete every
    vec_id % 5 == 2; replay the batch once (content no-op pin)."""
    from .operators.similarity import (
        apply_cdc_to_ivf_index,
        materialize_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    materialize_ivf_index(emb, "vec_id", "embedding", path, n_cells=16)
    upd = emb.filter(
        (F.col("vec_id") % 7 == 3) & (F.col("vec_id") % 5 != 2)
    ).select(
        "vec_id",
        F.lit("u").alias("op"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: -x
        ).alias("embedding"),
    )
    dels = emb.filter(F.col("vec_id") % 5 == 2).select(
        "vec_id",
        F.lit("d").alias("op"),
        F.lit(None).cast("array<double>").alias("embedding"),
    )
    cdc = upd.unionByName(dels)
    apply_cdc_to_ivf_index(cdc, path, "vec_id", "embedding")
    apply_cdc_to_ivf_index(cdc, path, "vec_id", "embedding")  # replay
    return path


@register("search_dense_cdc", _DENSE_CDC_ORACLE)
def search_dense_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained IVF store (operators/similarity.py:
    apply_cdc_to_ivf_index): updates supersede their old vector by
    generation, deletes append a dead-watermark, the batch replays
    once (content no-op), and EXACT dense top-k over the mutated store
    — probed cells only, dead rows filtered at the scan — must equal
    brute-force cosine over the final corpus state (the oracle
    computes that from the raw table).  The mutated store is built
    once per process (shared with the recluster row and bench
    repeats — r9 VERDICT #8); the exact top-k is the per-call work."""
    from .operators.similarity import ivf_exact_topk

    path = _shared_store(
        "ivf_cdc", sf_dir, lambda p: _cdc_mutated_ivf(spark, sf_dir, p)
    )
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    rows = ivf_exact_topk(
        spark, path, qv, "vec_id", k=10, exclude_id=0
    ).collect()
    return spark.createDataFrame(rows, "vec_id long, score double")


@register("search_dense_recluster", _DENSE_CDC_ORACLE)
def search_dense_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-centering compaction on the CDC-mutated IVF store
    (operators/similarity.py:recluster_ivf_store): after the
    update + delete batch the store re-trains its coarse quantizer on
    the LIVE vectors, reassigns, and drops dead generations via the
    crash-aware whole-index swap — restoring fresh-index pruning
    (SCALING.md probe) while the exact top-k stays EQUAL to the same
    rebuilt-from-scratch oracle (reclustering may change geometry,
    never results).  Shares the mutated store with ``search_dense_cdc``
    and runs the recluster on a COPY — the re-train is the measured
    operator, the materialize+CDC build is not re-paid (r9 VERDICT
    #8)."""
    from .operators.similarity import ivf_exact_topk, recluster_ivf_store

    src = _shared_store(
        "ivf_cdc", sf_dir, lambda p: _cdc_mutated_ivf(spark, sf_dir, p)
    )
    path = _shared_derived_store(
        "ivf_cdc_rec",
        sf_dir,
        src,
        lambda p: recluster_ivf_store(spark, p, "vec_id", n_cells=16),
    )
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    rows = ivf_exact_topk(
        spark, path, qv, "vec_id", k=10, exclude_id=0
    ).collect()
    return spark.createDataFrame(rows, "vec_id long, score double")


# --------------------------------------------------------------------
# Round 9: ES query-DSL long tail over the postings store — filtered
# retrieval on stored fields, wildcard and regexp term expansion.
# --------------------------------------------------------------------


@register(
    "search_filtered_range",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT t.doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf t
    JOIN documents d ON d.doc_id = t.doc_id
    JOIN n_t USING (token) JOIN dl ON dl.doc_id = t.doc_id, stats
    WHERE d.lang = 'en' AND d.n_chars >= 120 AND d.n_chars < 900
    GROUP BY t.doc_id
    ORDER BY score DESC, t.doc_id ASC
    LIMIT 10
    """,
)
def search_filtered_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool FILTER CONTEXT served from the index
    (operators/text.py:filtered_bm25_over_store): BM25 over
    [spark, table] restricted to lang = 'en' AND n_chars in
    [120, 900) — both predicates evaluated on docstats STORED FIELDS
    (doc values), pushed into that scan, never touching the corpus.
    ES semantics pinned by the oracle: filters gate membership but
    idf/avgdl/n_docs stay whole-index statistics (filter context is
    non-scoring)."""
    from .operators.text import filtered_bm25_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return filtered_bm25_over_store(
        spark,
        store,
        ["spark", "table"],
        [("lang", "=", "en"), ("n_chars", ">=", 120), ("n_chars", "<", 900)],
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_wildcard",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT DISTINCT token FROM toks),
    expanded AS (
        SELECT token FROM vocab WHERE regexp_matches(token, '^s.*am$')
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN (SELECT token FROM expanded)
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``wildcard`` query over the postings store
    (operators/text.py:expand_wildcard_terms): the pattern ``s*am``
    expands against the index vocabulary — the literal prefix ``s``
    prunes the scan as a token range before the regex runs, the ES
    wildcard-rewrite optimization — then plain BM25 serves the
    expanded terms.  The oracle replays the identical anchored regex
    (the wildcard translation stays in the Java-regex/RE2 common
    subset) + scoring from the raw text."""
    from .operators.text import bm25_over_store, expand_wildcard_terms

    store = _shared_bm25_store(spark, sf_dir)
    expanded = expand_wildcard_terms(spark, store, "s*am")
    return bm25_over_store(spark, store, expanded, top_k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_regexp",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT DISTINCT token FROM toks),
    expanded AS (
        SELECT token FROM vocab
        WHERE regexp_matches(token, '^(?:[rt]ab?les?)$')
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN (SELECT token FROM expanded)
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``regexp`` query over the postings store
    (operators/text.py:expand_regexp_terms): ``[rt]ab?les?`` matches
    the whole token (ES's implicit anchoring, reproduced with
    ``^(?:...)$``) against the index vocabulary, then BM25 serves the
    expansion.  The oracle runs the IDENTICAL pattern under RE2 —
    the expansion contract keeps patterns inside the Java/RE2 common
    subset so both engines see one language."""
    from .operators.text import bm25_over_store, expand_regexp_terms

    store = _shared_bm25_store(spark, sf_dir)
    expanded = expand_regexp_terms(spark, store, "[rt]ab?les?")
    return bm25_over_store(spark, store, expanded, top_k=10).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_histogram",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('spark', 'value')
    )
    SELECT floor(n_chars / 200.0) * 200.0 AS bucket,
           count(*) AS n_docs
    FROM documents JOIN matched USING (doc_id)
    WHERE n_chars IS NOT NULL
    GROUP BY 1
    ORDER BY bucket ASC
    """,
)
def search_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation served from the index
    (operators/text.py:histogram_over_store): documents matching ANY
    query term bucketed by floor(n_chars/200)*200 over the STORED
    numeric field — matched ids from one token-pruned postings scan,
    buckets from docstats doc values, the corpus never read.  ES
    aggregates over the FULL matched set (not the top-k page) and
    omits empty buckets (min_doc_count=1) — both pinned by the
    oracle."""
    from .operators.text import histogram_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return histogram_over_store(
        spark, store, ["spark", "value"], "n_chars", interval=200.0
    )


@register(
    "search_page2",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 5 OFFSET 5
    """,
)
def search_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search_after deep pagination
    (operators/text.py:bm25_page_over_store): page 1's last (score,
    doc) sort values become the cursor, page 2 is a top-k with the
    strictly-after predicate — no offset materialization, each page
    one token-pruned scan.  The oracle is the textbook LIMIT/OFFSET
    over the full ranking: page 2 by cursor must equal rows 6-10 of
    the deep sort exactly."""
    from .operators.text import bm25_page_over_store

    store = _shared_bm25_store(spark, sf_dir)
    terms = ["spark", "table", "stream"]
    page1 = bm25_page_over_store(
        spark, store, terms, page_size=5
    ).collect()
    cursor = (page1[-1]["score"], page1[-1]["doc"])
    return bm25_page_over_store(
        spark, store, terms, page_size=5, search_after=cursor
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_function_score",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    )
    SELECT doc_id,
           round(s * log10(1.0 + coalesce(n_chars, 1.0)), 6) AS score
    FROM bm JOIN documents USING (doc_id)
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score + field_value_factor
    (operators/text.py:function_score_over_store): BM25 relevance
    multiplied by log10(1 + n_chars) over the STORED numeric field —
    the "boost long documents" re-rank, served from the index alone
    (the boost is one doc-keyed join against a column-pruned docstats
    projection; the corpus is never read).  ES 'log1p' is the COMMON
    log of value+1 and 'missing' substitutes before the modifier —
    both pinned by the oracle."""
    from .operators.text import function_score_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return function_score_over_store(
        spark,
        store,
        ["spark", "table", "stream"],
        "n_chars",
        modifier="log1p",
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_significant",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id FROM toks GROUP BY doc_id),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('stream', 'window')
    ),
    sizes AS (
        SELECT (SELECT count(*) FROM dl) AS n_bg,
               (SELECT count(*) FROM matched) AS n_fg
    ),
    fg AS (
        SELECT token, count(*) AS fg_df
        FROM toks JOIN matched USING (doc_id) GROUP BY token
    ),
    bg AS (SELECT token, count(*) AS bg_df FROM toks GROUP BY token)
    SELECT token, fg_df, bg_df,
           round(((fg_df * 1.0 / n_fg) - (bg_df * 1.0 / n_bg))
                 * ((fg_df * 1.0 / n_fg) / (bg_df * 1.0 / n_bg)),
                 6) AS score
    FROM fg JOIN bg USING (token), sizes
    WHERE fg_df * 1.0 / n_fg > bg_df * 1.0 / n_bg
    ORDER BY score DESC, token ASC
    LIMIT 10
    """,
)
def search_significant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms aggregation
    (operators/text.py:significant_terms_over_store): the tokens
    OVER-represented in the docs matching the query vs the whole
    index, JLH-scored with ES's superset counting (background
    includes foreground).  The foreground leg is token-pruned +
    semi-joined; the background document frequencies are the one
    vocabulary-sized index aggregate the statistic inherently needs."""
    from .operators.text import significant_terms_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return significant_terms_over_store(
        spark, store, ["stream", "window"], size=10
    )


@register(
    "search_top_hits",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'value')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    ranked AS (
        SELECT d.lang, doc_id, score,
               row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY score DESC, doc_id ASC
               ) AS rnk
        FROM bm JOIN documents d USING (doc_id)
        WHERE d.lang IS NOT NULL
    )
    SELECT lang, doc_id, score, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY lang ASC, rnk ASC
    """,
)
def search_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation + top_hits
    (operators/text.py:top_hits_over_store): the 3 most relevant
    matching docs PER LANGUAGE — the BM25 plan plus one window
    partitioned by the stored field, every partition the bucket's
    slice of the MATCHED set (never the corpus)."""
    from .operators.text import top_hits_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return top_hits_over_store(
        spark, store, ["spark", "value"], "lang", per_group=3
    ).select(
        "lang", F.col("doc").alias("doc_id"), "score", "rnk"
    )


@register(
    "search_date_histogram",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'batch')
    ),
    days AS (
        SELECT doc_id,
               DATE '2024-01-01' + CAST(doc_id % 365 AS INT) AS day
        FROM documents
    )
    SELECT CAST(date_trunc('month', day) AS DATE) AS bucket,
           count(*) AS n_docs
    FROM days JOIN matched USING (doc_id)
    GROUP BY 1
    ORDER BY bucket ASC
    """,
)
def search_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram aggregation served from the index
    (operators/text.py:date_histogram_over_store): documents matching
    ANY query term bucketed by calendar month over the STORED date
    field (derived deterministically from doc_id at index build —
    the fixture has no date column; the oracle derives the identical
    date in SQL).  Matched ids from one token-pruned postings scan,
    buckets from docstats doc values, the corpus never read; empty
    buckets omitted (min_doc_count=1)."""
    from .operators.text import date_histogram_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return date_histogram_over_store(
        spark, store, ["spark", "batch"], "day", interval="month"
    )


@register("streaming_search_cdc", _CDC_BM25_ORACLE)
def streaming_search_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-9 centerpiece END-TO-END: a search index kept in sync
    with a mutating collection through the ACTUAL tail pipeline —
    ``run_tail`` drains a file oplog feed (inserts for the whole
    corpus, then full-replace updates for ~1/7 of the docs, then
    deletes for ~1/11 plus a REDELIVERY of the update batch) through
    ``SearchIndexedSink``, which chains the keyed document sink with
    :func:`~mongo_es_spark.operators.text.apply_cdc_to_bm25_index`
    (streaming/sink.py:SearchIndexedSink) — the reference's whole
    reason to exist, src/processor.ts:225-258 routing inserts, updates
    AND deletes into ES.  ``bm25_over_store`` must then score exactly
    like an index rebuilt from the final collection state (the shared
    ``_CDC_BM25_ORACLE`` computes that rebuild from the raw table):
    updates supersede by generation, deletes tombstone, the replayed
    batch no-ops on the content digest.  Same oracle as
    ``search_cdc_upsert`` — the fold arriving via micro-batches with
    at-least-once redelivery must change NOTHING."""
    import json as _json
    import shutil
    import tempfile

    from .config import Controls, Task
    from .core import make_ts
    from .operators.text import bm25_over_store
    from .sources.cdc import file_oplog_stream
    from .streaming.sink import ParquetIndexSink, SearchIndexedSink
    from .streaming.tail import run_tail

    def build_feed(feed: str) -> None:
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
        )
        ins = [("i", r["doc_id"], {"text": r["text"]}) for r in docs]
        upd = [
            ("u", r["doc_id"], {"text": "updated " + r["text"]})
            for r in docs
            if r["doc_id"] % 7 == 3
        ]
        dels = [
            ("d", r["doc_id"], {})
            for r in docs
            if r["doc_id"] % 11 == 5 and r["doc_id"] % 7 != 3
        ]
        # batch 3 = deletes + a REPLAY of the whole update batch: the
        # content digest must no-op it (at-least-once -> exactly-once)
        batches = [ins, upd, dels + upd]
        os.makedirs(feed, exist_ok=True)
        seq = 0
        for i, batch in enumerate(batches):
            path = os.path.join(feed, f"b{i}.json")
            with open(path, "w") as fh:
                for op, did, doc in batch:
                    seq += 1
                    fh.write(
                        _json.dumps(
                            {
                                "ts": make_ts(seq),
                                "ns": "lib.docs",
                                "op": op,
                                "id": str(did),
                                "doc": _json.dumps(doc),
                            }
                        )
                        + "\n"
                    )
            os.utime(path, (1_600_000_000 + i * 60,) * 2)

    feed = _shared_stream_feed(spark, sf_dir, "cdc_oplog_feed", build_feed)
    task = Task(
        {
            "from": {"phase": "tail"},
            "extract": {"db": "lib", "collection": "docs"},
            "transform": {"mapping": {"text": "text"}},
            "load": {"index": "docs", "type": "doc"},
        }
    )
    base = tempfile.mkdtemp(prefix="search_cdc_stream_")
    try:
        store = os.path.join(base, "bm")
        sink = SearchIndexedSink(
            ParquetIndexSink(os.path.join(base, "sink"), mode="merge"),
            store,
            text_field="text",
        )
        stream = file_oplog_stream(
            spark, feed, task, max_files_per_trigger=1
        )
        q = run_tail(
            spark,
            task,
            Controls(),
            stream,
            sink,
            hints={"text": "string"},
            checkpoint_dir=os.path.join(base, "ckpt"),
            available_now=True,
        )
        q.awaitTermination()
        rows = bm25_over_store(
            spark, store, ["updated", "spark", "table"], top_k=10
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(int(r["doc"]), float(r["score"])) for r in rows],
        "doc_id long, score double",
    )


@register(
    "search_stats",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'stream')
    )
    SELECT count(n_chars) AS n_docs,
           CAST(min(n_chars) AS DOUBLE) AS min_v,
           CAST(max(n_chars) AS DOUBLE) AS max_v,
           round(avg(n_chars), 6) AS avg_v,
           round(CAST(sum(n_chars) AS DOUBLE), 6) AS sum_v,
           count(DISTINCT lang) AS n_distinct
    FROM documents JOIN matched USING (doc_id)
    """,
)
def search_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats + cardinality aggregations served from the index
    (operators/text.py:stats_over_store): count/min/max/avg/sum of the
    stored n_chars doc value plus the distinct-language count across
    the FULL matched set — one token-pruned postings scan, one
    docstats semi-join, one global aggregate; the corpus never read.
    Cardinality is served exact here (ES uses HLL — the approximate
    swap is operators/profile.py's sketch store)."""
    from .operators.text import stats_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return stats_over_store(
        spark,
        store,
        ["spark", "stream"],
        "n_chars",
        cardinality_col="lang",
    )


@register(
    "search_decay",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    days AS (
        SELECT doc_id,
               CAST(abs(date_diff('day', DATE '2024-06-01',
                    DATE '2024-01-01' + CAST(doc_id % 365 AS INT)))
                    AS DOUBLE) AS d
        FROM documents
    )
    SELECT doc_id,
           round(s * exp(-0.0007701635339554948 * d * d), 6) AS score
    FROM bm JOIN days USING (doc_id)
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score gauss DATE decay
    (operators/text.py:decay_score_over_store): BM25 multiplied by a
    Gaussian of the day-distance from 2024-06-01 over the STORED date
    field — half score at 30 days out (decay=0.5, so the constant is
    ln(2)/30^2, inlined as its exact double repr in the oracle).  The
    recency-boost shape, one doc-keyed join past the token-pruned
    BM25 plan."""
    from .operators.text import decay_score_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return decay_score_over_store(
        spark,
        store,
        ["spark", "table"],
        "day",
        origin="2024-06-01",
        scale_days=30.0,
        decay=0.5,
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_collapse",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    ranked AS (
        SELECT doc_id, d.lang, score,
               row_number() OVER (
                   PARTITION BY coalesce(d.lang, '__doc_' || doc_id)
                   ORDER BY score DESC, doc_id ASC
               ) AS rn
        FROM bm JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, score
    FROM ranked WHERE rn = 1
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field collapsing (operators/text.py:collapse_over_store):
    the ranked list keeps the single best hit per language (stored
    doc value), then the global top-10 — one matched-set window per
    bucket plus a TakeOrdered, the corpus never read."""
    from .operators.text import collapse_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return collapse_over_store(
        spark, store, ["spark", "table"], "lang", top_k=10
    ).select(F.col("doc").alias("doc_id"), "lang", "score")


@register(
    "search_boosting",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    neg AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('stream')
    )
    SELECT doc_id,
           round(CASE WHEN doc_id IN (SELECT doc_id FROM neg)
                      THEN s * 0.5 ELSE s END, 6) AS score
    FROM bm
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query (operators/text.py:boosting_over_store):
    positive-term BM25 with hits matching the negative term demoted
    by x0.5 instead of excluded — one postings scan over both
    clauses' terms, the negative side a broadcast id set."""
    from .operators.text import boosting_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return boosting_over_store(
        spark,
        store,
        positive=["spark", "table"],
        negative=["stream"],
        negative_boost=0.5,
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_dismax",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf1 AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table')
        GROUP BY doc_id, token
    ),
    nt1 AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf1 GROUP BY token),
    s1 AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf1 JOIN nt1 USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    tf2 AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('stream', 'value')
        GROUP BY doc_id, token
    ),
    nt2 AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf2 GROUP BY token),
    s2 AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf2 JOIN nt2 USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
    SELECT doc_id,
           round(max(s) + 0.3 * (sum(s) - max(s)), 6) AS score
    FROM u
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_dismax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES dis_max (operators/text.py:dis_max_over_store): two
    subqueries score independently (each leg identical to its own
    bm25_over_store), a doc takes its best leg plus 0.3x the rest —
    the don't-double-count-synonyms combinator; per-leg token-pruned
    scans + one doc-keyed aggregate."""
    from .operators.text import dis_max_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return dis_max_over_store(
        spark,
        store,
        [["spark", "table"], ["stream", "value"]],
        tie_breaker=0.3,
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_dense_filtered",
    """
    WITH allowed AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 1
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT a.vec_id,
           round(list_cosine_similarity(
               a.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
               AS score
    FROM allowed a, q
    WHERE a.vec_id <> 0
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
    """,
)
def search_dense_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES kNN-with-filter over the IVF store
    (operators/similarity.py:ivf_exact_topk allow_ids): the filter
    (label = 1, evaluated OUTSIDE the vector index) pushes into the
    probed cells as a semi-join, and the exactness certificate holds —
    cell bounds over-cover the allowed subset, and an under-filled
    wave 1 forces wave 2 to probe every remaining cell rather than
    skip a qualifying row.  Oracle: brute-force cosine top-10 over the
    filtered set."""
    from .operators.similarity import ivf_exact_topk

    store = _shared_ivf_store(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    allow = emb.filter(F.col("label") == 1).select("vec_id")
    return ivf_exact_topk(
        spark, store, qv, "vec_id", k=10, exclude_id=0, allow_ids=allow
    ).select("vec_id", "score")


@register(
    "search_rescore",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('value', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    win AS (
        SELECT doc_id, s FROM (
            SELECT doc_id, s,
                   row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rn
            FROM bm
        ) WHERE rn <= 50
    ),
    t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len([i FOR i IN range(1, len(toks))
                    IF toks[i] = 'value' AND toks[i+1] = 'table'])
                   AS n_occ
        FROM t
    )
    SELECT w.doc_id,
           round(1.0 * s + 0.5 * coalesce(n_occ, 0), 6) AS score
    FROM win w LEFT JOIN m USING (doc_id)
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rescore window (operators/text.py:rescore_over_store): the
    top-50 BM25 hits for 'value table' re-ranked by the EXACT-PHRASE
    occurrence count from the positional postings, score_mode total
    (1.0 x bm25 + 0.5 x occurrences) — the expensive secondary runs
    against the window, never the full hit set; oracle replays both
    stages off the raw text."""
    from .operators.text import rescore_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return rescore_over_store(
        spark,
        store,
        ["value", "table"],
        ["value", "table"],
        window_size=50,
        rescore_weight=0.5,
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register("streaming_dense_cdc", _DENSE_CDC_ORACLE)
def streaming_dense_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense index kept in sync with a mutating collection
    END-TO-END (streaming/sink.py:DenseIndexedSink): the scan phase
    materializes the IVF store from the collection snapshot (the
    reference's scan-then-tail order — the coarse quantizer needs a
    training corpus), then ``run_tail`` drains a full-collection
    upsert REPLAY (content no-op against the scan-built store),
    vector updates (FP-exact negation), deletes, and an
    at-least-once redelivery of the update batch through the sink —
    and EXACT dense top-k over the maintained store must equal
    brute-force cosine over the final collection state (the shared
    ``_DENSE_CDC_ORACLE``).  Same oracle as ``search_dense_cdc``:
    arrival via micro-batches must change nothing."""
    import json as _json
    import shutil
    import tempfile

    from .config import Controls, Task
    from .core import make_ts
    from .operators.similarity import (
        ivf_exact_topk,
        materialize_ivf_index,
    )
    from .sources.cdc import file_oplog_stream
    from .streaming.sink import DenseIndexedSink, ParquetIndexSink
    from .streaming.tail import run_tail

    def build_feed(feed: str) -> None:
        rows = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
        ins = [
            ("u", r["vec_id"], {"embedding": [float(x) for x in r["embedding"]]})
            for r in rows
        ]
        upd = [
            ("u", r["vec_id"], {"embedding": [-float(x) for x in r["embedding"]]})
            for r in rows
            if r["vec_id"] % 7 == 3 and r["vec_id"] % 5 != 2
        ]
        dels = [
            ("d", r["vec_id"], {})
            for r in rows
            if r["vec_id"] % 5 == 2
        ]
        batches = [ins, upd, dels + upd]  # b2 redelivers the updates
        os.makedirs(feed, exist_ok=True)
        seq = 0
        for i, batch in enumerate(batches):
            path = os.path.join(feed, f"b{i}.json")
            with open(path, "w") as fh:
                for op, vid, doc in batch:
                    seq += 1
                    fh.write(
                        _json.dumps(
                            {
                                "ts": make_ts(seq),
                                "ns": "lib.vecs",
                                "op": op,
                                "id": str(vid),
                                "doc": _json.dumps(doc),
                            }
                        )
                        + "\n"
                    )
            os.utime(path, (1_600_000_000 + i * 60,) * 2)

    feed = _shared_stream_feed(spark, sf_dir, "dense_oplog_feed", build_feed)
    task = Task(
        {
            "from": {"phase": "tail"},
            "extract": {"db": "lib", "collection": "vecs"},
            "transform": {"mapping": {"embedding": "embedding"}},
            "load": {"index": "vecs", "type": "doc"},
        }
    )
    # scan-phase store build shared across calls and bench repeats
    # (r9 VERDICT #8): the quantizer training is identical every time;
    # each run COPIES the pristine store because the tail mutates it
    pristine = _shared_store(
        "ivf_init",
        sf_dir,
        lambda p: materialize_ivf_index(
            load_table(spark, sf_dir, "embeddings"),
            "vec_id",
            "embedding",
            p,
            n_cells=16,
        ),
    )
    base = tempfile.mkdtemp(prefix="dense_cdc_stream_")
    try:
        store = os.path.join(base, "ivf")
        shutil.copytree(pristine, store)
        sink = DenseIndexedSink(
            ParquetIndexSink(os.path.join(base, "sink"), mode="merge"),
            store,
            vec_field="embedding",
        )
        stream = file_oplog_stream(
            spark, feed, task, max_files_per_trigger=1
        )
        q = run_tail(
            spark,
            task,
            Controls(),
            stream,
            sink,
            hints={"embedding": "array<double>"},
            checkpoint_dir=os.path.join(base, "ckpt"),
            available_now=True,
        )
        q.awaitTermination()
        qv = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .first()["embedding"]
        )
        rows = ivf_exact_topk(
            spark, store, qv, "vec_id", k=10, exclude_id=0
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(int(r["vec_id"]), float(r["score"])) for r in rows],
        "vec_id long, score double",
    )


@register(
    "search_percolate",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    q(q_id, token, need, match_all) AS (
        VALUES (1, 'spark', 1, false),
               (2, 'stream', 2, true), (2, 'value', 2, true),
               (3, 'window', 1, false), (3, 'sort', 1, false)
    ),
    hits AS (
        SELECT doc_id, q_id, need, match_all,
               count(DISTINCT t.token) AS got
        FROM toks t JOIN q USING (token)
        GROUP BY doc_id, q_id, need, match_all
    )
    SELECT doc_id, CAST(q_id AS BIGINT) AS q_id FROM hits
    WHERE (NOT match_all AND got >= 1) OR (match_all AND got = need)
    ORDER BY doc_id ASC, q_id ASC
    """,
)
def search_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolate — the reverse search
    (operators/text.py:percolate): three registered queries (one
    match-any, one match-ALL, one two-term any) stored as the small
    side; the document batch streams through once and each doc
    reports which saved searches it triggers.  The query map
    broadcasts; per-doc work ∝ matching terms."""
    from .operators.text import percolate

    qdf = spark.createDataFrame(
        [
            (1, ["spark"], False),
            (2, ["stream", "value"], True),
            (3, ["window", "sort"], False),
        ],
        "q_id long, terms array<string>, match_all boolean",
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    return percolate(spark, qdf, docs)


@register(
    "search_percolate_indexed",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    q(q_id, token, need, match_all) AS (
        VALUES (1, 'dup', 2, true), (1, 'batch', 2, true),
               (2, 'dup', 2, true), (2, 'missingterm', 2, true),
               (3, 'dup', 1, false), (3, 'value', 1, false),
               (4, 'batch', 3, true), (4, 'scan', 3, true),
               (4, 'data', 3, true),
               (5, 'dup', 1, true)
    ),
    hits AS (
        SELECT doc_id, q_id, need, match_all,
               count(DISTINCT t.token) AS got
        FROM toks t JOIN q USING (token)
        GROUP BY doc_id, q_id, need, match_all
    )
    SELECT doc_id, CAST(q_id AS BIGINT) AS q_id FROM hits
    WHERE (NOT match_all AND got >= 1) OR (match_all AND got = need)
    ORDER BY doc_id ASC, q_id ASC
    """,
)
def search_percolate_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolate on the QUERY-INDEXED plan
    (operators/text.py:_percolate_indexed — ES's percolator
    query-index trick): conjunctive saved queries generate candidates
    from their single batch-rarest required term ('dup', df 25 of 500
    docs, vs 'batch' at ~400) and only candidates are verified, so
    the selective alerting shape costs ∝ the rare term's postings;
    an absent required term designates itself at df 0 and the query
    produces zero candidates without scanning anything.  Same oracle
    shape as search_percolate — the plan is an optimization, never a
    semantics change."""
    from .operators.text import percolate

    qdf = spark.createDataFrame(
        [
            (1, ["dup", "batch"], True),
            (2, ["dup", "missingterm"], True),
            (3, ["dup", "value"], False),
            (4, ["batch", "scan", "data"], True),
            (5, ["dup"], True),
        ],
        "q_id long, terms array<string>, match_all boolean",
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    return percolate(spark, qdf, docs, mode="indexed")


_MATCHED_CTE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'value')
    )
"""


@register(
    "search_range_agg",
    _MATCHED_CTE
    + """
    , r(ord, key, lo, hi) AS (
        VALUES (0, '*-200', NULL, 200),
               (1, '200-400', 200, 400),
               (2, '400-*', 400, NULL)
    ),
    m AS (
        SELECT n_chars FROM documents JOIN matched USING (doc_id)
    ),
    c AS (
        SELECT ord, count(*) AS n
        FROM r JOIN m
          ON (r.lo IS NULL OR m.n_chars >= r.lo)
         AND (r.hi IS NULL OR m.n_chars < r.hi)
        GROUP BY ord
    )
    SELECT r.key, CAST(coalesce(c.n, 0) AS BIGINT) AS n_docs
    FROM r LEFT JOIN c USING (ord)
    ORDER BY r.ord
    """,
)
def search_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation (operators/text.py:range_agg_over_store):
    independent from-inclusive/to-exclusive buckets over the stored
    n_chars of the hit set, empty buckets returned at zero — each doc
    tests the broadcast model-sized range list map-side."""
    from .operators.text import range_agg_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return range_agg_over_store(
        spark, store, ["spark", "value"], "n_chars",
        [(None, 200), (200, 400), (400, None)],
    )


@register(
    "search_filters_agg",
    _MATCHED_CTE
    + """
    , m AS (
        SELECT lang, n_chars FROM documents JOIN matched USING (doc_id)
    )
    SELECT 'english' AS filter_name,
           count(*) FILTER (WHERE lang = 'en') AS n_docs FROM m
    UNION ALL
    SELECT 'long_docs', count(*) FILTER (WHERE n_chars >= 300) FROM m
    UNION ALL
    SELECT 'short_fr',
           count(*) FILTER (WHERE lang = 'fr' AND n_chars < 250) FROM m
    ORDER BY filter_name ASC
    """,
)
def search_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters aggregation (operators/text.py:
    filters_agg_over_store): named predicate buckets counted
    independently over the hit set in ONE map-side conditional-sum
    pass over the matched docstats frame."""
    from .operators.text import filters_agg_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return filters_agg_over_store(
        spark, store, ["spark", "value"],
        {
            "english": F.col("lang") == "en",
            "long_docs": F.col("n_chars") >= 300,
            "short_fr": (F.col("lang") == "fr") & (F.col("n_chars") < 250),
        },
    )


@register(
    "search_multi_terms",
    _MATCHED_CTE
    + """
    , m AS (
        SELECT d.lang,
               DATE '2024-01-01' + CAST(d.doc_id % 365 AS INT) AS day
        FROM documents d JOIN matched USING (doc_id)
        WHERE d.lang IS NOT NULL
    )
    SELECT lang, day, count(*) AS n_docs
    FROM m GROUP BY lang, day
    ORDER BY n_docs DESC, lang ASC, day ASC
    LIMIT 8
    """,
)
def search_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms aggregation (operators/text.py:
    multi_terms_over_store): buckets keyed by the (lang, day) stored
    field TUPLE over the hit set — one distributed composite
    aggregate, null-keyed docs dropped per ES."""
    from .operators.text import multi_terms_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return multi_terms_over_store(
        spark, store, ["spark", "value"], ["lang", "day"], size=8
    )


@register(
    "search_rare_terms",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS df
    FROM toks GROUP BY token
    HAVING count(*) <= 30
    ORDER BY df ASC, token ASC
    """,
)
def search_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms aggregation (operators/text.py:
    rare_terms_over_store): the index's long-tail tokens (df <= 30),
    served from the tokenstats df ROLLUP when provably in sync — a
    vocabulary-sized sidecar read, no postings touch — else the exact
    postings-wide aggregate."""
    from .operators.text import rare_terms_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return rare_terms_over_store(spark, store, max_doc_count=30)


@register(
    "search_percentiles",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'spark'
    ),
    m AS (
        SELECT n_chars FROM documents JOIN matched USING (doc_id)
    )
    SELECT pct, round(value, 6) AS value FROM (
        SELECT unnest(CAST([25.0, 50.0, 75.0, 95.0] AS DOUBLE[])) AS pct,
               unnest(quantile_cont(n_chars,
                      [0.25, 0.50, 0.75, 0.95])) AS value
        FROM m
    )
    ORDER BY pct ASC
    """,
)
def search_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation (operators/text.py:
    percentiles_over_store): exact linear-interpolation percentiles
    of the stored n_chars over the hit set (quantile_cont semantics —
    value-pinnable cross-engine where ES would t-digest)."""
    from .operators.text import percentiles_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return percentiles_over_store(
        spark, store, ["spark"], "n_chars", (25.0, 50.0, 75.0, 95.0)
    )


@register(
    "search_geo_distance",
    _MATCHED_CTE
    + """
    , g AS (
        SELECT doc_id,
               CAST((doc_id % 180) - 90 + 0.5 AS DOUBLE) AS lat,
               CAST((doc_id * 7 % 360) - 180 + 0.5 AS DOUBLE) AS lon
        FROM documents JOIN matched USING (doc_id)
    ),
    d AS (
        SELECT doc_id,
               round(2 * 6371 * asin(sqrt(
                   pow(sin(radians(lat - 10.5) / 2), 2)
                   + cos(radians(10.5)) * cos(radians(lat))
                     * pow(sin(radians(lon - 20.5) / 2), 2))), 6)
                   AS dist_km
        FROM g
    )
    SELECT doc_id, dist_km FROM d
    WHERE dist_km <= 3000
    ORDER BY dist_km ASC, doc_id ASC
    LIMIT 10
    """,
)
def search_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance + distance sort, served from the
    cell-partitioned geo sidecar (operators/geo.py:
    geo_distance_pruned): the ring's partitions are the only files
    read (PartitionFilters on cell), haversine verifies exactly
    inside, the term match semi-joins — matched docs within 3000 km
    of (10.5, 20.5), nearest first.  The oracle mirrors the formula
    term for term; pruning is covered (superset) so results are
    identical to the linear plan."""
    from .operators.geo import geo_distance_pruned

    store = _shared_bm25_store(spark, sf_dir)
    return geo_distance_pruned(
        spark, store, 10.5, 20.5, 3000.0, terms=["spark", "value"], k=10
    ).select(F.col("doc").alias("doc_id"), "dist_km")


@register(
    "search_geo_bbox",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'table')
    ),
    g AS (
        SELECT doc_id,
               CAST((doc_id % 180) - 90 + 0.5 AS DOUBLE) AS lat,
               CAST((doc_id * 7 % 360) - 180 + 0.5 AS DOUBLE) AS lon
        FROM documents JOIN matched USING (doc_id)
    )
    SELECT doc_id, lat, lon FROM g
    WHERE lat BETWEEN -20 AND 40 AND lon BETWEEN -60 AND 60
    ORDER BY doc_id ASC
    """,
)
def search_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounding_box served from the geo sidecar
    (operators/geo.py:geo_bbox_pruned): box-covering cells prune the
    scan at file level, the exact edge-inclusive comparisons verify
    inside."""
    from .operators.geo import geo_bbox_pruned

    store = _shared_bm25_store(spark, sf_dir)
    return geo_bbox_pruned(
        spark, store, -20.0, 40.0, -60.0, 60.0, terms=["spark", "table"]
    ).select(F.col("doc").alias("doc_id"), "lat", "lon")


@register(
    "search_geo_pure",
    """
    WITH g AS (
        SELECT doc_id,
               CAST((doc_id % 180) - 90 + 0.5 AS DOUBLE) AS lat,
               CAST((doc_id * 7 % 360) - 180 + 0.5 AS DOUBLE) AS lon
        FROM documents
    ),
    d AS (
        SELECT doc_id,
               round(2 * 6371 * asin(sqrt(
                   pow(sin(radians(lat - 45.5) / 2), 2)
                   + cos(radians(45.5)) * cos(radians(lat))
                     * pow(sin(radians(lon + 100.5) / 2), 2))), 6)
                   AS dist_km
        FROM g
    )
    SELECT doc_id, dist_km FROM d
    WHERE dist_km <= 2000
    ORDER BY dist_km ASC, doc_id ASC
    LIMIT 10
    """,
)
def search_geo_pure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE-geo query — no term companion, the r10 verdict's one
    named scale-killer: nearest docs within 2000 km of (45.5,
    -100.5) with NO match leg to pre-prune.  Serves from the
    cell-partitioned sidecar (operators/geo.py:geo_distance_pruned):
    only the ring's partition directories are opened
    (PartitionFilters on cell — plan pinned in tests/test_geo.py),
    exact haversine verifies inside, so cost is ring-area-, not
    corpus-, proportional.  The oracle scans everything — results
    must agree exactly."""
    from .operators.geo import geo_distance_pruned

    store = _shared_bm25_store(spark, sf_dir)
    return geo_distance_pruned(
        spark, store, 45.5, -100.5, 2000.0, k=10
    ).select(F.col("doc").alias("doc_id"), "dist_km")


@register(
    "search_geo_grid",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    ),
    g AS (
        SELECT doc_id,
               CAST((doc_id % 180) - 90 + 0.5 AS DOUBLE) AS lat,
               CAST((doc_id * 7 % 360) - 180 + 0.5 AS DOUBLE) AS lon
        FROM documents JOIN matched USING (doc_id)
    ),
    k AS (
        SELECT concat('3/',
                   least(greatest(floor((lon + 180) / 360 * 8), 0), 7)
                       ::BIGINT::VARCHAR,
                   '/',
                   least(greatest(floor((1 - ln(tan(radians(lat))
                       + 1 / cos(radians(lat))) / pi()) / 2 * 8), 0), 7)
                       ::BIGINT::VARCHAR) AS key
        FROM g
    )
    SELECT key, count(*)::BIGINT AS n_docs FROM k
    GROUP BY key ORDER BY n_docs DESC, key ASC
    """,
)
def search_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geotile_grid aggregation (operators/geo.py:
    geotile_grid_over_store): doc counts per web-mercator tile
    ("z/x/y" keys, zoom 3) over the matched set — the heat-map query
    every geo UI issues.  Pure codegen trig over matched doc values;
    the oracle re-derives the identical tile math (boundaries at
    multiples of 45 degrees and mercator parallels, never at the
    fixture's X.5-degree points, so cross-engine floor() cannot
    disagree)."""
    from .operators.geo import geotile_grid_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return geotile_grid_over_store(spark, store, ["value"], zoom=3)


@register(
    "search_geo_bounds",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('stream')
    ),
    d AS (
        SELECT CAST((doc_id % 180) - 90 AS DOUBLE) + 0.5 AS lat,
               CAST((doc_id * 7 % 360) - 180 AS DOUBLE) + 0.5 AS lon
        FROM documents JOIN matched USING (doc_id)
    )
    SELECT min(lat) AS min_lat, max(lat) AS max_lat,
           min(lon) AS min_lon, max(lon) AS max_lon,
           avg(lat) AS c_lat, avg(lon) AS c_lon,
           count(*)::BIGINT AS n_points
    FROM d
    """,
)
def search_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounds + geo_centroid aggregations (operators/geo.py:
    geo_bounds_centroid_over_store): the matched set's bounding box,
    arithmetic centroid and point count in ONE partial-aggregated
    pass over doc values — a one-row result regardless of corpus
    size."""
    from .operators.geo import geo_bounds_centroid_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return geo_bounds_centroid_over_store(spark, store, ["stream"])


@register(
    "search_cardinality",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    )
    SELECT count(DISTINCT n_chars)::BIGINT AS n_exact,
           TRUE AS hll_ok
    FROM documents JOIN matched USING (doc_id)
    """,
)
def search_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation served the way ES serves it — an
    HLL sketch (operators/aggs.py:cardinality_certified_over_store,
    Spark HyperLogLog++) — certified in the same one-row result
    against the exact distinct count: the sketch is the fixed-memory
    100 TB path, the exact count is what the oracle pins
    cross-engine, and ``hll_ok`` asserts the sketch landed within
    3·rsd."""
    from .operators.aggs import cardinality_certified_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return cardinality_certified_over_store(
        spark, store, ["value"], "n_chars", rsd=0.02
    )


@register(
    "search_match_freetext",
    """
    WITH toks AS (
        SELECT doc_id, unnest({TOKS}) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """.replace("{TOKS}", _ANALYZED_TOKS),
)
def search_match_freetext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match — free text in, analyzed scoring out
    (operators/text.py:match_over_store): the user's raw string
    "Spark, table & STREAM!" analyzes through the store's chain to
    ['spark', 'table', 'stream'] and BM25-scores their union over
    the analyzed index.  The oracle hardcodes the analyzed terms the
    Python twin derives — pinning that query-string analysis and
    index-time analysis land on the same tokens."""
    from .operators.text import match_over_store

    store = _shared_analyzed_bm25_store(spark, sf_dir)
    return match_over_store(
        spark, store, "Spark, table & STREAM!", top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_agg_nested",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value', 'spark')
    ),
    d AS (
        SELECT doc_id, lang, n_chars,
               DATE '2024-01-01' + CAST(doc_id % 365 AS INT) AS day
        FROM documents JOIN matched USING (doc_id)
    ),
    leaf AS (
        SELECT lang, CAST(date_trunc('month', day) AS DATE) AS month,
               count(*) AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars,
               avg(n_chars) AS avg_chars
        FROM d WHERE lang IS NOT NULL AND day IS NOT NULL
        GROUP BY 1, 2
    ),
    lvl AS (SELECT *, sum(n_docs) OVER (PARTITION BY lang) AS lvl_n FROM leaf),
    rk AS (SELECT *, dense_rank() OVER (ORDER BY lvl_n DESC, lang ASC) AS rk
           FROM lvl)
    SELECT lang, month, n_docs, sum_chars, avg_chars
    FROM rk WHERE rk <= 3
    ORDER BY lang ASC, month ASC
    """,
)
def search_agg_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregation tree (operators/aggs.py:
    agg_tree_over_store): terms(lang, size=3) → date_histogram(day,
    month) → {sum, avg}(n_chars) — the ES any-bucket-nests-any-agg
    model the per-shape helpers could not compose.  The whole tree is
    ONE pass: token-pruned match, one docstats semi-join, a single
    groupBy over both level keys; the per-parent top-size truncation
    runs as windows over the bucket-cardinality-sized frame.  The
    oracle re-derives the tree as GROUP BY + window rank."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["value", "spark"],
        {"lang": {"terms": {"field": "lang", "size": 3},
            "aggs": {"month": {
                "date_histogram": {"field": "day", "interval": "month"},
                "aggs": {
                    "sum_chars": {"sum": {"field": "n_chars"}},
                    "avg_chars": {"avg": {"field": "n_chars"}},
                }}}}},
    ).select(
        "lang", "month", "n_docs",
        F.col("sum_chars").cast("long").alias("sum_chars"),
        "avg_chars",
    )


@register(
    "search_agg_range_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('table')
    ),
    d AS (
        SELECT lang, n_chars,
               CASE WHEN n_chars < 200 THEN '*-200'
                    WHEN n_chars >= 200 AND n_chars < 500 THEN '200-500'
                    WHEN n_chars >= 500 THEN '500-*'
               END AS chars
        FROM documents JOIN matched USING (doc_id)
    ),
    leaf AS (
        SELECT chars, lang, count(*) AS n_docs,
               max(n_chars)::BIGINT AS max_chars
        FROM d WHERE chars IS NOT NULL AND lang IS NOT NULL
        GROUP BY 1, 2
    ),
    rk AS (SELECT *, dense_rank() OVER (PARTITION BY chars
               ORDER BY n_docs DESC, lang ASC) AS rk FROM leaf)
    SELECT chars, lang, n_docs, max_chars
    FROM rk WHERE rk <= 2
    ORDER BY chars ASC, lang ASC
    """,
)
def search_agg_range_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested tree #2: range(n_chars) → terms(lang, size=2) →
    max(n_chars) — the per-PARENT top-size semantics (ES keeps the
    top langs within EACH range bucket, not globally), pinned by the
    oracle's partitioned window rank."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["table"],
        {"chars": {"range": {"field": "n_chars",
                             "ranges": [(None, 200), (200, 500),
                                        (500, None)]},
            "aggs": {"lang": {"terms": {"field": "lang", "size": 2},
                "aggs": {"max_chars": {"max": {"field": "n_chars"}}}}}}},
    ).select(
        "chars", "lang", "n_docs",
        F.col("max_chars").cast("long").alias("max_chars"),
    )


@register(
    "search_agg_histogram_nested",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('stream')
    ),
    d AS (
        SELECT lang, n_chars,
               floor(n_chars / 250.0) * 250.0 AS bucket
        FROM documents JOIN matched USING (doc_id)
    )
    SELECT lang, bucket, count(*) AS n_docs,
           min(n_chars)::BIGINT AS min_chars
    FROM d WHERE lang IS NOT NULL AND bucket IS NOT NULL
    GROUP BY 1, 2
    ORDER BY lang ASC, bucket ASC
    """,
)
def search_agg_histogram_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested tree #3: terms(lang, no size) → histogram(n_chars, 250)
    → min(n_chars) — numeric histogram composing under a terms
    parent through the same one-pass planner."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["stream"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"bucket": {
                "histogram": {"field": "n_chars", "interval": 250.0},
                "aggs": {"min_chars": {"min": {"field": "n_chars"}}}}}}},
    ).select(
        "lang", "bucket", "n_docs",
        F.col("min_chars").cast("long").alias("min_chars"),
    )


@register(
    "search_agg_pipeline_tree",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value', 'spark')
    ),
    d AS (
        SELECT lang, n_chars,
               CAST(date_trunc('month',
                    DATE '2024-01-01' + CAST(doc_id % 365 AS INT))
                    AS DATE) AS month
        FROM documents JOIN matched USING (doc_id)
    ),
    leaf AS (
        SELECT lang, month, count(*) AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars
        FROM d WHERE lang IS NOT NULL AND month IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT lang, month, n_docs, sum_chars,
           (sum(n_docs) OVER (PARTITION BY lang ORDER BY month ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           )::BIGINT AS cum_docs,
           n_docs - lag(n_docs) OVER (PARTITION BY lang
                ORDER BY month ASC) AS dlt_docs
    FROM leaf
    ORDER BY lang ASC, month ASC
    """,
)
def search_agg_pipeline_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent-pipeline aggregations through the recursive planner
    (operators/aggs.py): terms(lang) → date_histogram(month) →
    {sum(n_chars), cumulative_sum(n_docs), derivative(n_docs)} — the
    running total and bucket-over-bucket delta ES computes in the
    reduce phase.  The pipelines are windows over the
    bucket-cardinality-sized frame partitioned by the parent prefix
    (lang) and ordered by the leaf key (month): zero additional
    corpus work beyond the one matched scan.  The oracle re-derives
    both as SQL window functions."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["value", "spark"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"month": {
                "date_histogram": {"field": "day", "interval": "month"},
                "aggs": {
                    "sum_chars": {"sum": {"field": "n_chars"}},
                    "cum_docs": {"cumulative_sum": {
                        "buckets_path": "n_docs"}},
                    "dlt_docs": {"derivative": {
                        "buckets_path": "n_docs"}},
                }}}}},
    ).select(
        "lang", "month", "n_docs",
        F.col("sum_chars").cast("long").alias("sum_chars"),
        F.col("cum_docs").cast("long").alias("cum_docs"),
        F.col("dlt_docs").cast("long").alias("dlt_docs"),
    )


@register(
    "search_agg_bucket_sort",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('table')
    ),
    d AS (
        SELECT lang, n_chars,
               floor(n_chars / 100.0) * 100.0 AS bucket
        FROM documents JOIN matched USING (doc_id)
    ),
    leaf AS (
        SELECT bucket, count(*) AS n_docs,
               avg(n_chars) AS avg_chars,
               count(DISTINCT lang) AS n_langs
        FROM d WHERE bucket IS NOT NULL
        GROUP BY 1
    ),
    kept AS (SELECT * FROM leaf WHERE n_docs >= 5),
    ma AS (
        SELECT *, avg(n_docs) OVER (ORDER BY bucket ASC
                ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ma_docs
        FROM kept
    ),
    rk AS (SELECT *, row_number() OVER (ORDER BY n_docs DESC,
                bucket ASC) AS rn FROM ma)
    SELECT bucket, n_docs, avg_chars, n_langs, ma_docs
    FROM rk WHERE rn <= 5
    ORDER BY bucket ASC
    """,
)
def search_agg_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bucket_selector + moving_fn + bucket_sort through the planner
    (operators/aggs.py): histogram(n_chars, 100) buckets with an
    exact cardinality(lang) metric, pruned to >= 5 docs
    (bucket_selector), a trailing 3-bucket moving average over the
    PRUNED sequence (moving_fn, ES shift=0: strictly-before window,
    first bucket NULL), then the per-parent top-5 buckets by doc
    count (bucket_sort, key-ascending tiebreak).  Spec order IS
    application order; the oracle mirrors it as filter → window →
    rank CTEs."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["table"],
        {"bucket": {"histogram": {"field": "n_chars",
                                  "interval": 100.0},
            "aggs": {
                "avg_chars": {"avg": {"field": "n_chars"}},
                "n_langs": {"cardinality": {"field": "lang"}},
                "keep": {"bucket_selector": {
                    "buckets_path": "n_docs", "gte": 5}},
                "ma_docs": {"moving_fn": {
                    "buckets_path": "n_docs", "window": 3}},
                "top": {"bucket_sort": {
                    "buckets_path": "n_docs", "size": 5}},
            }}},
    ).select(
        "bucket", "n_docs", "avg_chars", "n_langs", "ma_docs"
    )


@register(
    "search_nested_query",
    """
    WITH matched AS (
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT CAST(o_orderkey AS VARCHAR) AS doc,
           count(*)::BIGINT AS n_hits
    FROM matched JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_quantity >= 45 AND l_returnflag = 'R'
    GROUP BY 1
    ORDER BY 1
    """,
)
def search_nested_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested query (operators/nested.py:nested_query_over_store):
    orders indexed with their lineitems as an array<struct> nested
    field, matching ``bool(match(st_F), nested(qty >= 45 AND rflag =
    'R'))`` — BOTH conditions must hold on the SAME array element
    (the reason ES nested mappings exist; a flattened object mapping
    would wrongly match any order holding some heavy item and some
    other returned item).  The token-pruned match runs first, the
    per-element predicate is a higher-order filter/size over the
    stored array (codegen, no explode), ``n_hits`` is the
    inner_hits cardinality.  The oracle re-derives same-element
    semantics as a relational join on the child table."""
    from .operators.nested import nested_query_over_store

    store = _shared_nested_store(spark, sf_dir)
    return nested_query_over_store(
        spark, store, ["st_F"], "items",
        [("qty", "gte", 45.0), ("rflag", "eq", "R")],
    )


@register(
    "search_has_child",
    """
    SELECT 'O' || l_orderkey AS doc,
           any_value(o_totalprice) AS price,
           count(*)::BIGINT AS n_children
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY 1
    HAVING count(*) >= 3
    ORDER BY 1
    """,
)
def search_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_child query (operators/nested.py:has_child_over_store):
    orders (parent docs) with at least 3 lineitem children matching
    the child term ``rf_R`` — parents and children live in ONE index
    carrying the ES join-field pattern (``join_name`` +
    ``parent_id`` stored fields).  One token-pruned child match, a
    parent-keyed count, an equi-join back to parent docstats.  The
    oracle is the relational parent-child join with HAVING."""
    from .operators.nested import has_child_over_store

    store = _shared_pc_store(spark, sf_dir)
    return has_child_over_store(
        spark, store, ["rf_R"], min_children=3,
        parent_name="parent",
    )


@register(
    "search_has_parent",
    """
    WITH kids AS (
        SELECT l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey,
                            l_quantity, l_extendedprice) AS ln
        FROM lineitem
    )
    SELECT 'L' || l_orderkey || '-' || ln AS doc,
           'O' || l_orderkey AS parent_id,
           l_extendedprice AS price
    FROM kids JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    ORDER BY 1
    """,
)
def search_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_parent query (operators/nested.py:
    has_parent_over_store): lineitem child docs whose parent order
    matches the parent term ``1-URGENT``.  The matched-parent id set
    is a filtered PARENT subset — explicitly broadcast against the
    children's ``parent_id``, the ES shard-routing analogue; at
    cluster scale the store would bucket by ``parent_id`` so the
    probe never shuffles the child corpus."""
    from .operators.nested import has_parent_over_store

    store = _shared_pc_store(spark, sf_dir)
    return has_parent_over_store(
        spark, store, ["1-URGENT"], parent_name="parent")


@register(
    "search_delete_by_query",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    deleted AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'value'
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'spark'
    )
    SELECT d.lang, count(*) AS n_docs
    FROM documents d JOIN matched USING (doc_id)
    WHERE doc_id NOT IN (SELECT doc_id FROM deleted)
    GROUP BY d.lang
    ORDER BY n_docs DESC, lang ASC
    """,
)
def search_delete_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _delete_by_query (operators/indexops.py:delete_by_query):
    every doc matching 'value' is tombstoned through the CDC fold
    (new-generation MVCC tombstones, NOT a corpus rewrite), then the
    facet aggregation for 'spark' serves from the survivors.  The
    oracle recomputes post-mutation state relationally: matched minus
    deleted."""
    from .operators.indexops import delete_by_query
    from .operators.text import facets_over_store

    src = _shared_src_store(spark, sf_dir)
    store = _shared_derived_store(
        "delbyq", sf_dir, src,
        lambda p: delete_by_query(spark, p, ["value"]).count(),
    )
    return facets_over_store(spark, store, ["spark"], "lang")


@register(
    "search_update_by_query",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    touched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'table'
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'spark'
    )
    SELECT CASE WHEN touched.doc_id IS NOT NULL THEN upper(d.lang)
                ELSE d.lang END AS lang,
           count(*) AS n_docs
    FROM documents d
    JOIN matched USING (doc_id)
    LEFT JOIN touched ON touched.doc_id = d.doc_id
    GROUP BY 1
    ORDER BY n_docs DESC, lang ASC
    """,
)
def search_update_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _update_by_query (operators/indexops.py:update_by_query):
    docs matching 'table' get ``lang`` rewritten to uppercase by a
    script over their stored state — a FIELDS-ONLY update, the case
    the fold's whole-doc noop comparison exists for (a text-digest
    replay check alone would silently skip it) — then the 'spark'
    facet serves mixed pre/post-update languages.  The oracle applies
    the same script relationally via CASE over the touched set."""
    from .operators.indexops import update_by_query
    from .operators.text import facets_over_store

    src = _shared_src_store(spark, sf_dir)
    store = _shared_derived_store(
        "updbyq", sf_dir, src,
        lambda p: update_by_query(
            spark, p, ["table"], {"lang": F.upper(F.col("lang"))}
        ).count(),
    )
    return facets_over_store(spark, store, ["spark"], "lang")


@register(
    "search_reindex",
    """
    WITH toks AS (
        SELECT doc_id, unnest({TOKS}) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('value', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """.replace("{TOKS}", _RAW_STANDARD_TOKS),
)
def search_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _reindex (operators/indexops.py:reindex_store): the raw
    whitespace-analyzed source store re-indexes from its stored
    ``_source`` into a NEW store declared with the standard analyzer
    — the canonical reindex motive (re-analyze the corpus under a new
    chain without touching the source of truth; pair with the
    alias-swap cutover to retarget readers).  BM25 over the new store
    then matches the cased/punctuated query "VALUE!"/"Table" that the
    raw store cannot.  The oracle runs the byte-identical standard
    chain over the raw text."""
    from .operators.indexops import reindex_store
    from .operators.text import bm25_over_store

    src = _shared_src_store(spark, sf_dir)

    def post(p: str) -> None:
        import shutil

        # the derived-store copy seeds the DESTINATION path — reindex
        # builds a fresh store there from the source's stored _source
        shutil.rmtree(p)
        reindex_store(spark, src, p, analyzer="standard")

    store = _shared_derived_store("reindexed", sf_dir, src, post)
    return bm25_over_store(
        spark, store, ["VALUE!", "Table"], top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


def _shared_pit_store(spark: SparkSession, sf_dir: str) -> str:
    """The _source store MUTATED after generation 0 — every doc
    matching 'stream' deleted, every doc matching 'table' rewritten —
    the fixture behind the PIT rows: generation 0 still serves the
    exact pre-mutation corpus."""
    from .operators.indexops import delete_by_query, update_by_query
    from .operators.text import current_generation

    src = _shared_src_store(spark, sf_dir)

    def post(p: str) -> None:
        g0 = current_generation(spark, p)
        assert g0 == 0, f"insert-only store expected gen 0, got {g0}"
        delete_by_query(spark, p, ["stream"]).count()
        update_by_query(
            spark, p, ["table"],
            {"_source": F.concat(F.col("_source"), F.lit(" mutated"))},
        ).count()

    return _shared_derived_store("pitstore", sf_dir, src, post)


@register("search_pit", _BM25_ORACLE)
def search_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES point-in-time search (operators/text.py:
    bm25_over_store_pit / read_search_store_at): the store's MVCC
    generations ARE the PIT — capture the generation counter (0 for
    the insert-only build), then delete every doc matching 'stream'
    and rewrite every doc matching 'table', and the PIT read at
    generation 0 still serves the EXACT pre-mutation top-10 for
    those very terms, byte-identical to the one-shot corpus BM25 the
    oracle computes (scores included: snapshot df/avgdl, not live
    ones).  The snapshot lives until compaction reclaims superseded
    generations — the ES PIT keep-alive analogue."""
    from .operators.text import bm25_over_store_pit

    store = _shared_pit_store(spark, sf_dir)
    return bm25_over_store_pit(
        spark, store, ["spark", "table", "stream"], gen=0, top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_pit_page",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    scored AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    rk AS (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM scored
    )
    SELECT doc_id, score FROM rk
    WHERE rn BETWEEN 11 AND 20
    ORDER BY score DESC, doc_id ASC
    """,
)
def search_pit_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_after UNDER a point-in-time — the ES pairing (a
    search_after cursor is only consistent inside a PIT): page 2 of
    the pre-mutation ranking fetched from a store that was mutated on
    the very query terms AFTER generation 0.  Page 1 runs at the
    snapshot, its last (score, doc) becomes the cursor, and page 2
    tiles the SAME total order — the oracle pins it against rows
    11–20 of the pre-mutation corpus ranking."""
    from .operators.text import bm25_page_over_store

    store = _shared_pit_store(spark, sf_dir)
    page1 = bm25_page_over_store(
        spark, store, ["spark", "table", "stream"],
        page_size=10, pit_gen=0,
    ).collect()
    cursor = (float(page1[-1]["score"]), page1[-1]["doc"])
    return bm25_page_over_store(
        spark, store, ["spark", "table", "stream"],
        page_size=10, search_after=cursor, pit_gen=0,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_script_fields",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    )
    SELECT doc_id,
           n_chars::DOUBLE / dl AS chars_per_tok,
           n_chars >= 500 AS is_long
    FROM documents JOIN matched USING (doc_id) JOIN dl USING (doc_id)
    ORDER BY doc_id
    """,
)
def search_script_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_fields / runtime fields (operators/text.py:
    script_fields_over_store): the hit set served with columns
    COMPUTED at query time over stored doc values — chars-per-token
    (n_chars over the indexed token count dl) and a length flag —
    zero index changes, pure codegen expressions.  The oracle
    re-derives dl as the token count of the same split."""
    from .operators.text import script_fields_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return script_fields_over_store(
        spark, store, ["value"],
        {
            "chars_per_tok":
                F.col("n_chars").cast("double") / F.col("dl"),
            "is_long": F.col("n_chars") >= 500,
        },
    ).select(F.col("doc").alias("doc_id"), "chars_per_tok", "is_long")


@register(
    "search_sampler",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('value', 'spark')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    scored AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    s AS (
        SELECT scored.doc_id, score, lang
        FROM scored JOIN documents USING (doc_id)
    ),
    div AS (
        SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY score DESC, doc_id ASC) AS dr
        FROM s
    ),
    top AS (
        SELECT * FROM div WHERE dr <= 20
        ORDER BY score DESC, doc_id ASC LIMIT 50
    )
    SELECT lang, count(*)::BIGINT AS n_docs
    FROM top GROUP BY 1
    ORDER BY n_docs DESC, lang ASC
    """,
)
def search_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler aggregation (operators/text.py:
    sampler_facets_over_store): the lang facet computed over only the
    top-50 best-scoring hits, first capped at 20 docs per language
    (the diversified form — one dominant language cannot flood the
    sample).  Truncations are deterministic (score desc, doc asc);
    the global top-50 compiles to TakeOrderedAndProject, never a
    partitionless window.  The oracle mirrors score → diversify →
    truncate → count as window CTEs."""
    from .operators.text import sampler_facets_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return sampler_facets_over_store(
        spark, store, ["value", "spark"], "lang",
        shard_size=50, max_docs_per_value=20,
    )


@register(
    "search_api_bool",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream', 'table')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    w AS (
        SELECT doc_id, token,
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    ),
    must AS (
        SELECT doc_id, sum(w) AS s FROM w
        WHERE token IN ('spark', 'stream') GROUP BY doc_id
    ),
    boost AS (
        SELECT doc_id, sum(w) AS s FROM w
        WHERE token = 'table' GROUP BY doc_id
    ),
    blocked AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'value'
    )
    SELECT m.doc_id,
           round(m.s + coalesce(b.s, 0), 6) AS score
    FROM must m
    JOIN documents d ON d.doc_id = m.doc_id
    LEFT JOIN boost b ON b.doc_id = m.doc_id
    WHERE d.n_chars >= 200 AND d.n_chars < 900
      AND m.doc_id NOT IN (SELECT doc_id FROM blocked)
    ORDER BY score DESC, m.doc_id ASC
    LIMIT 10
    """,
)
def search_api_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES _search API executor (operators/searchapi.py:search):
    an ES-shaped request body — bool(must: match OR, filter: range
    over doc values, must_not: term, should: term boost) — compiled
    onto the store primitives with Lucene additive scoring: filter
    context gates membership at zero score, the should clause boosts
    without gating, one postings scan pruned to the union of scoring
    tokens feeds a shared checkpointed weight frame.  The oracle
    hand-expands the same request into weight/gate/boost CTEs."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark stream"}}],
            "filter": [{"range": {"n_chars": {"gte": 200, "lt": 900}}}],
            "must_not": [{"term": {"text": "value"}}],
            "should": [{"term": {"text": "table"}}],
        }},
        "size": 10,
    }).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_api_aggs",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    hits AS (
        SELECT doc_id FROM toks
        WHERE token IN ('stream', 'table', 'value')
        GROUP BY doc_id
        HAVING count(DISTINCT token) >= 2
    )
    SELECT lang, count(*) AS n_docs, avg(n_chars) AS avg_chars
    FROM documents JOIN hits USING (doc_id)
    WHERE lang IS NOT NULL
    GROUP BY lang
    ORDER BY lang ASC
    """,
)
def search_api_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_search with aggregations: a pure-should bool gated at
    minimum_should_match=2 compiles to the hit set, and the ``aggs``
    section delegates to the recursive planner over exactly that set
    (operators/aggs.py:agg_tree_frame) — the ES request shape where
    aggregations run over the FULL matched set, not the hits page."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"bool": {
            "should": [
                {"term": {"text": "stream"}},
                {"term": {"text": "table"}},
                {"term": {"text": "value"}},
            ],
            "minimum_should_match": 2,
        }},
        "aggs": {"lang": {"terms": {"field": "lang"},
            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}},
    })


@register(
    "search_query_string",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('stream', 'table', 'value')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    w AS (
        SELECT doc_id, token,
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    ),
    must AS (
        SELECT doc_id, sum(w) AS s FROM w
        WHERE token = 'stream' GROUP BY doc_id
    ),
    boost AS (
        SELECT doc_id, sum(w) AS s FROM w
        WHERE token IN ('table', 'value') GROUP BY doc_id
    ),
    blocked AS (
        SELECT DISTINCT doc_id FROM toks WHERE token = 'spark'
    )
    SELECT m.doc_id,
           round(m.s + coalesce(b.s, 0), 6) AS score
    FROM must m
    LEFT JOIN boost b ON b.doc_id = m.doc_id
    WHERE m.doc_id NOT IN (SELECT doc_id FROM blocked)
    ORDER BY score DESC, m.doc_id ASC
    LIMIT 10
    """,
)
def search_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query_string (operators/searchapi.py:parse_query_string):
    the Lucene mini-syntax ``+stream (table OR value) -spark`` parsed
    into the executor's node algebra — ``+`` lands in must, the
    parenthesized OR group boosts without gating (must present →
    ES minimum_should_match=0), ``-`` hoists into must_not with no
    intermediate complement frame.  The oracle hand-expands the same
    request."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"query_string": {
            "query": "+stream (table OR value) -spark"}},
        "size": 10,
    }).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_explain",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token)
    SELECT doc_id, token, tf, df,
           round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf,
           round(tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
               AS tf_norm,
           round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
               AS weight
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    WHERE doc_id < 40
    ORDER BY doc_id ASC, token ASC
    """,
)
def search_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _explain API (operators/text.py:explain_score_over_store):
    the BM25 decomposition — tf, df, idf, length norm and the
    resulting term weight — for each requested doc's matched terms;
    the sum of weights IS the doc's bm25_over_store score.  The
    oracle recomputes every factor."""
    from .operators.text import explain_score_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return explain_score_over_store(
        spark, store, ["spark", "stream"], list(range(40))
    ).select(
        F.col("doc").alias("doc_id"), "token", "tf", "df",
        "idf", "tf_norm", "weight",
    )


@register(
    "search_api_sorted_page",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token = 'spark' GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    scored AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.score, d.lang, d.n_chars
    FROM scored s JOIN documents d USING (doc_id)
    ORDER BY d.n_chars DESC, s.doc_id ASC
    LIMIT 10 OFFSET 5
    """,
)
def search_api_sorted_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_search with field sort + from/size paging + stored-field
    projection: the hit set sorted by a doc-values column (doc-asc
    tiebreak), page window applied AFTER the global order (the ES
    from/size contract), requested fields joined from docstats."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": {"order": "desc"}}],
        "fields": ["lang", "n_chars"],
        "from": 5,
        "size": 10,
    }).select(
        F.col("doc").alias("doc_id"), "score", "lang", "n_chars"
    )


@register(
    "search_matrix_stats",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    ),
    d AS (
        SELECT n_chars::DOUBLE AS a, dl::DOUBLE AS b
        FROM documents JOIN matched USING (doc_id)
        JOIN dl USING (doc_id)
    )
    SELECT 'n_chars' AS field_x, 'n_chars' AS field_y,
           count(*) AS n, avg(a) AS mean_x, avg(a) AS mean_y,
           round(covar_samp(a, a), 6) AS covariance,
           round(corr(a, a), 6) AS correlation
    FROM d
    UNION ALL
    SELECT 'n_chars', 'dl', count(*), avg(a), avg(b),
           round(covar_samp(a, b), 6), round(corr(a, b), 6)
    FROM d
    UNION ALL
    SELECT 'dl', 'dl', count(*), avg(b), avg(b),
           round(covar_samp(b, b), 6), round(corr(b, b), 6)
    FROM d
    """,
)
def search_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats aggregation (operators/aggs.py:
    matrix_stats_over_store): the pairwise covariance/correlation
    matrix of numeric doc values over the hit set in ONE
    partial-aggregated pass, unpivoted lazily to pair rows.  n_chars
    vs dl correlate strongly by construction (chars grow with
    tokens) — the oracle recomputes each cell with
    covar_samp/corr."""
    from .operators.aggs import matrix_stats_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return matrix_stats_over_store(
        spark, store, ["value"], ["n_chars", "dl"]
    )


@register(
    "search_agg_weighted_avg",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    )
    SELECT lang, count(*) AS n_docs,
           sum(n_chars * dl)::DOUBLE / sum(dl)::DOUBLE AS w_chars
    FROM documents JOIN matched USING (doc_id) JOIN dl USING (doc_id)
    WHERE lang IS NOT NULL
    GROUP BY lang
    ORDER BY lang ASC
    """,
)
def search_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg metric through the recursive planner: per
    language, n_chars weighted by the doc's indexed token count dl —
    sum(v*w)/sum(w) composed as agg expressions in the same single
    pass (null value/weight rows drop, the ES contract)."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["value"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"w_chars": {"weighted_avg": {
                "value": {"field": "n_chars"},
                "weight": {"field": "dl"},
            }}}}},
    )


@register(
    "search_api_function_score",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    scored AS (
        SELECT doc_id,
               sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    )
    SELECT s.doc_id,
           round(s.score * (0.5 * ln(d.n_chars + 1.0)), 6) AS score
    FROM scored s JOIN documents d USING (doc_id)
    WHERE d.n_chars >= 100
    ORDER BY score DESC, s.doc_id ASC
    LIMIT 10
    """,
)
def search_api_function_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """function_score through the _search executor
    (operators/searchapi.py:_eval_function_score): a bool query
    (match OR + range filter) wrapped in field_value_factor ln1p
    re-scoring — the functions join ONE column-pruned docstats
    projection onto the compiled hit frame and the math stays
    codegen.  The oracle multiplies the hand-expanded BM25 by the
    same factor."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"function_score": {
            "query": {"bool": {
                "must": [{"match": {"text": "spark stream"}}],
                "filter": [{"range": {"n_chars": {"gte": 100}}}],
            }},
            "functions": [{"field_value_factor": {
                "field": "n_chars", "modifier": "ln1p",
                "factor": 0.5,
            }}],
        }},
        "size": 10,
    }).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_multi_match",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    bdl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    bstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM bdl),
    btf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('value', 'spark')
        GROUP BY doc_id, token
    ),
    bnt AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM btf GROUP BY token),
    body AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM btf JOIN bnt USING (token) JOIN bdl USING (doc_id), bstats
        GROUP BY doc_id
    ),
    ttoks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')[1:5])
                   AS token
        FROM documents
    ),
    tdl AS (SELECT doc_id, count(*) AS dl FROM ttoks GROUP BY doc_id),
    tstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM tdl),
    ttf AS (
        SELECT doc_id, token, count(*) AS tf FROM ttoks
        WHERE token IN ('value', 'spark')
        GROUP BY doc_id, token
    ),
    tnt AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM ttf GROUP BY token),
    title AS (
        SELECT doc_id,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM ttf JOIN tnt USING (token) JOIN tdl USING (doc_id), tstats
        GROUP BY doc_id
    ),
    u AS (
        SELECT doc_id, 2.0 * score AS score FROM title
        UNION ALL
        SELECT doc_id, score FROM body
    )
    SELECT doc_id,
           round(max(score) + 0.3 * (sum(score) - max(score)), 6)
               AS score
    FROM u GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def search_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match best_fields (operators/text.py:
    multi_match_over_stores): one query scored against TWO analyzed
    fields — "title" (the first five tokens, its own postings store
    and its own df/avgdl statistics) boosted 2x, and the body — best
    field's score plus tie_breaker 0.3 times the rest, the Lucene
    dis_max rewrite.  Per-field stores are the engine's multi-field
    layout (each may declare its own analyzer).  The oracle
    re-derives both fields' BM25 and the combination."""
    from .operators.text import multi_match_over_stores

    body = _shared_bm25_store(spark, sf_dir)
    title = _shared_title_store(spark, sf_dir)
    return multi_match_over_stores(
        spark, {"title": title, "body": body},
        ["value", "spark"],
        boosts={"title": 2.0},
        match_type="best_fields",
        tie_breaker=0.3,
        top_k=10,
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_terms_set",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    )
    SELECT doc_id, count(*) AS n_matched
    FROM toks
    WHERE token IN ('spark', 'value', 'table', 'stream')
    GROUP BY doc_id
    HAVING count(*) >= 3
    ORDER BY n_matched DESC, doc_id ASC
    """,
)
def search_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms_set query (operators/text.py:terms_set_over_store):
    docs holding at least 3 distinct terms of a 4-term set — the
    minimum_should_match middle ground between OR and AND; one
    token-pruned scan, df is a plain count on the unique-(token,doc)
    postings."""
    from .operators.text import terms_set_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return terms_set_over_store(
        spark, store, ["spark", "value", "table", "stream"], 3
    ).select(F.col("doc").alias("doc_id"), "n_matched")


@register(
    "search_span_first",
    """
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\\s+')
               END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               list_min([i FOR i IN range(1, len(toks) + 1)
                         IF toks[i] = 'spark' AND i <= 3]) - 1
                   AS first_pos
        FROM t
    )
    SELECT doc_id, CAST(first_pos AS BIGINT) AS first_pos
    FROM m WHERE first_pos IS NOT NULL
    ORDER BY doc_id ASC
    """,
)
def search_span_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_first query (operators/text.py:span_first_over_store):
    docs where 'spark' occurs within the first 3 positions, with the
    earliest qualifying position — an array predicate over the
    positional postings, single-token pruned scan, no explode."""
    from .operators.text import span_first_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return span_first_over_store(spark, store, "spark", 3).select(
        F.col("doc").alias("doc_id"), "first_pos"
    )


@register(
    "search_termvectors",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM toks
        GROUP BY token
    )
    SELECT doc_id, token, tf, df
    FROM tf JOIN df USING (token)
    WHERE doc_id IN (0, 1, 2)
    ORDER BY doc_id ASC, token ASC
    """,
)
def search_termvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term_vectors API (term_statistics=true)
    (operators/text.py:term_vectors_over_store): per-doc term stats
    straight from the index — requested docs' tokens with in-doc tf
    and corpus-wide df; the doc filter pushes into the postings scan,
    df rides the vocabulary-sized aggregate."""
    from .operators.text import term_vectors_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return term_vectors_over_store(spark, store, [0, 1, 2]).select(
        F.col("doc").alias("doc_id"), "token", "tf", "df"
    )


@register(
    "search_suggest",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    vocab AS (SELECT token, count(*) AS df FROM toks GROUP BY token),
    inp(term) AS (VALUES ('strean'), ('tabel'), ('spark')),
    missing AS (
        SELECT term FROM inp
        WHERE term NOT IN (SELECT token FROM vocab)
    ),
    cand AS (
        SELECT m.term, v.token AS suggestion,
               levenshtein(m.term, v.token) AS dist, v.df
        FROM missing m, vocab v
        WHERE levenshtein(m.term, v.token) <= 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY term
            ORDER BY dist ASC, df DESC, suggestion ASC
        ) AS rn
        FROM cand
    )
    SELECT term, suggestion, CAST(dist AS INTEGER) AS dist, df
    FROM ranked WHERE rn <= 3
    ORDER BY term ASC, rn ASC
    """,
)
def search_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term suggester, suggest_mode=missing
    (operators/text.py:suggest_terms): misspelled inputs get the
    closest indexed terms ranked distance-then-frequency; terms
    already in the vocabulary ('spark') return nothing.  The
    vocabulary+df frame is index-metadata-sized; the threshold join
    broadcasts the input terms."""
    from .operators.text import suggest_terms

    store = _shared_bm25_store(spark, sf_dir)
    return suggest_terms(
        spark, store, ["strean", "tabel", "spark"], max_dist=2, size=3
    )


@register(
    "search_pipeline_agg",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'batch')
    ),
    days AS (
        SELECT doc_id,
               DATE '2024-01-01' + CAST(doc_id % 365 AS INT) AS day
        FROM documents
    ),
    hist AS (
        SELECT CAST(date_trunc('month', day) AS DATE) AS bucket,
               count(*) AS n_docs
        FROM days JOIN matched USING (doc_id)
        GROUP BY 1
    )
    SELECT bucket, n_docs,
           CAST(sum(n_docs) OVER (ORDER BY bucket ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
           n_docs - lag(n_docs) OVER (ORDER BY bucket ASC)
               AS delta_docs
    FROM hist
    ORDER BY bucket ASC
    """,
)
def search_pipeline_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations
    (operators/text.py:date_histogram_pipeline_over_store):
    cumulative_sum and derivative over the monthly date_histogram
    buckets — the second-pass stage runs on the bucket-count-sized
    frame (a calendar axis), never the corpus; derivative is NULL on
    the first bucket per ES."""
    from .operators.text import date_histogram_pipeline_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return date_histogram_pipeline_over_store(
        spark, store, ["spark", "batch"], "day", interval="month"
    )


@register(
    "search_composite",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'value')
    ),
    b AS (
        SELECT lang, floor(n_chars / 200.0) * 200.0 AS n_chars,
               count(*) AS n_docs
        FROM documents JOIN matched USING (doc_id)
        WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT lang, n_chars, n_docs FROM b
    ORDER BY lang ASC, n_chars ASC
    LIMIT 5 OFFSET 5
    """,
)
def search_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation — paginated multi-source buckets
    (operators/text.py:composite_agg_over_store): (lang terms,
    n_chars histogram-200) buckets five at a time; page 1's last
    bucket becomes the strictly-greater lexicographic after-cursor
    for page 2, which must equal rows 6-10 of the full ordered bucket
    list (the LIMIT/OFFSET oracle) — no offset materialization, each
    page one token-pruned scan + bucket TakeOrdered."""
    from .operators.text import composite_agg_over_store

    store = _shared_bm25_store(spark, sf_dir)
    sources = [("lang", "terms", None), ("n_chars", "histogram", 200.0)]
    page1 = composite_agg_over_store(
        spark, store, ["spark", "value"], sources, size=5
    ).collect()
    after = (page1[-1]["lang"], page1[-1]["n_chars"])
    return composite_agg_over_store(
        spark, store, ["spark", "value"], sources, size=5, after=after
    )


@register(
    "search_adjacency",
    """
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    m(name, token) AS (
        VALUES ('a', 'spark'), ('b', 'stream'),
               ('c', 'window'), ('c', 'sort')
    ),
    mem AS (
        SELECT DISTINCT doc_id, name FROM toks JOIN m USING (token)
    ),
    singles AS (
        SELECT name AS key, count(*) AS n_docs FROM mem GROUP BY name
    ),
    pairs AS (
        SELECT x.name || '&' || y.name AS key, count(*) AS n_docs
        FROM mem x JOIN mem y USING (doc_id)
        WHERE x.name < y.name
        GROUP BY 1
    )
    SELECT key, n_docs
    FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
    ORDER BY key ASC
    """,
)
def search_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix aggregation
    (operators/text.py:adjacency_matrix_over_store): three named term
    filters and every pairwise intersection count — one token-pruned
    scan builds the (doc, filter) membership frame, the pair join runs
    on that frame (∝ matching docs x filters), intersection keys
    'x&y' in sorted order per ES."""
    from .operators.text import adjacency_matrix_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return adjacency_matrix_over_store(
        spark,
        store,
        {"a": ["spark"], "b": ["stream"], "c": ["window", "sort"]},
    )


@register(
    "search_agg_siblings",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('table')
    ),
    d AS (
        SELECT lang, n_chars FROM documents JOIN matched USING (doc_id)
    ),
    langs AS (
        SELECT 'langs' AS agg, lang AS key, count(*) AS n_docs,
               'avg_c' AS metric, avg(n_chars) AS value
        FROM d WHERE lang IS NOT NULL GROUP BY lang
    ),
    hist AS (
        SELECT 'hist' AS agg,
               CAST(floor(n_chars / 200.0) * 200.0 AS VARCHAR) AS key,
               count(*) AS n_docs, '_count' AS metric,
               CAST(count(*) AS DOUBLE) AS value
        FROM d GROUP BY 2
    )
    SELECT agg, key, n_docs, metric, value
    FROM (SELECT * FROM langs UNION ALL SELECT * FROM hist)
    ORDER BY agg ASC, key ASC, metric ASC
    """,
)
def search_agg_siblings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIBLING BUCKET FOREST (operators/aggs.py:agg_forest_over_store)
    — the Kibana-dashboard request shape: two independent root
    subtrees (terms(lang)→avg(n_chars) beside histogram(n_chars))
    over ONE hit set.  The matched frame localCheckpoints once and
    each subtree is its own bucket-sized pass over the cached blocks
    — one corpus-side scan total, the property that keeps
    client-composed dashboard forests safe at 100 TB.  Results union
    in the normalized long schema (agg, key, n_docs, metric, value);
    the oracle re-derives both subtrees as UNION ALL of GROUP BYs."""
    from .operators.aggs import agg_forest_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_forest_over_store(
        spark, store, ["table"],
        {"langs": {"terms": {"field": "lang"},
                   "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}},
         "hist": {"histogram": {"field": "n_chars",
                                "interval": 200.0}}},
    )


@register(
    "search_agg_sibling_pipeline",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('stream')
    ),
    d AS (
        SELECT lang, n_chars FROM documents JOIN matched USING (doc_id)
    ),
    leaf AS (
        SELECT lang, floor(n_chars / 200.0) * 200.0 AS hist,
               count(*) AS n_docs, max(n_chars) AS mx
        FROM d WHERE lang IS NOT NULL GROUP BY 1, 2
    )
    SELECT lang, hist, n_docs, mx,
           avg(n_docs) OVER w AS avg_b,
           count(mx) OVER w AS st_count,
           min(mx) OVER w AS st_min,
           max(mx) OVER w AS st_max,
           avg(mx) OVER w AS st_avg,
           CAST(sum(mx) OVER w AS DOUBLE) AS st_sum
    FROM leaf
    WINDOW w AS (PARTITION BY lang)
    ORDER BY lang ASC, hist ASC
    """,
)
def search_agg_sibling_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SIBLING PIPELINE aggregations (operators/aggs.py): avg_bucket
    over the histogram's _count and stats_bucket over its max-metric,
    declared beside the deepest bucket node — each reduces the
    sibling bucket's buckets within the parent prefix (lang) and
    lands constant within it, the flat-frame rendering of ES's
    one-value-per-parent response.  Still one corpus scan: siblings
    are windows over the bucket-cardinality frame.  st_sum casts to
    double on both sides (DuckDB widens window sum to HUGEINT)."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    out = agg_tree_over_store(
        spark, store, ["stream"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {
                "hist": {"histogram": {"field": "n_chars",
                                       "interval": 200.0},
                         "aggs": {"mx": {"max": {"field": "n_chars"}}}},
                "avg_b": {"avg_bucket": {"buckets_path": "hist>_count"}},
                "st": {"stats_bucket": {"buckets_path": "hist>mx"}},
            }}},
    )
    return out.withColumn("st_sum", F.col("st_sum").cast("double"))


@register(
    "search_api_nested",
    """
    WITH matched AS (
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    ),
    hit AS (
        SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS doc
        FROM matched JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity >= 45 AND l_returnflag = 'R'
    )
    SELECT doc, CAST(1.0 AS DOUBLE) AS score FROM hit ORDER BY doc
    """,
)
def search_api_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``nested`` query as a ``_search`` BODY NODE
    (operators/searchapi.py:_nested_pred) — the r11 gap: the
    standalone operator existed but a real ES request puts nested
    inside a bool tree.  constant_score(bool(term st_F,
    nested(items.qty >= 45 AND items.rflag = 'R'))) — both conditions
    on the SAME array element (higher-order filter in codegen, no
    explode), pinned to the standalone operator's relational oracle."""
    from .operators.searchapi import search

    store = _shared_nested_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"constant_score": {
            "filter": {"bool": {
                "must": [{"term": {"text": "st_F"}}],
                "filter": [{"nested": {
                    "path": "items",
                    "query": {"bool": {"must": [
                        {"range": {"items.qty": {"gte": 45.0}}},
                        {"term": {"items.rflag": "R"}},
                    ]}},
                }}],
            }},
            "boost": 1.0,
        }},
        "size": 10_000_000,
    })


@register(
    "search_api_has_child",
    """
    SELECT 'O' || l_orderkey AS doc, CAST(1.0 AS DOUBLE) AS score,
           any_value(o_totalprice) AS price
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY 1
    HAVING count(*) >= 3
    ORDER BY 1
    """,
)
def search_api_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``has_child`` as a ``_search`` body node: parents with >= 3
    children matching term rf_R over the join-field store, constant
    score (ES score_mode=none default), stored ``price`` returned via
    the body's ``fields`` — pinned to the standalone operator's
    parent-child-join oracle."""
    from .operators.searchapi import search

    store = _shared_pc_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"has_child": {
            "type": "child",
            "query": {"term": {"text": "rf_R"}},
            "min_children": 3,
        }},
        "size": 10_000_000,
        "fields": ["price"],
    })


@register(
    "search_api_has_parent",
    """
    WITH kids AS (
        SELECT l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey,
                            l_quantity, l_extendedprice) AS ln
        FROM lineitem
    )
    SELECT 'L' || l_orderkey || '-' || ln AS doc,
           CAST(1.0 AS DOUBLE) AS score,
           l_extendedprice AS price
    FROM kids JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT'
    ORDER BY 1
    """,
)
def search_api_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``has_parent`` as a ``_search`` body node: children of parents
    matching term 1-URGENT, constant score, matched-parent id set
    semi-joined against the children's parent_id — pinned to the
    standalone operator's oracle."""
    from .operators.searchapi import search

    store = _shared_pc_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"has_parent": {
            "parent_type": "parent",
            "query": {"term": {"text": "1-URGENT"}},
        }},
        "size": 10_000_000,
        "fields": ["price"],
    })


@register(
    "search_api_knn",
    """
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    allowed AS (
        SELECT doc_id FROM documents WHERE n_chars >= 200 AND doc_id > 0
    ),
    s AS (
        SELECT e.vec_id AS doc,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.embedding::DOUBLE[]),
                   6) AS score
        FROM embeddings e JOIN allowed ON allowed.doc_id = e.vec_id, q
    )
    SELECT doc, score FROM s ORDER BY score DESC, doc ASC LIMIT 10
    """,
)
def search_api_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES-8 top-level ``knn`` clause through the ``_search``
    executor (operators/searchapi.py:_eval_knn): top-10 by cosine
    from the IVF store with the FILTER evaluated on the lexical
    store's doc values and pushed INTO the vector ranking as a
    semi-join on the scanned cells (always k hits when k qualify —
    the ES filtered-kNN contract, not post-filtering).  The oracle is
    brute-force cosine over the filtered id set."""
    from .operators.searchapi import search

    bm = _shared_bm25_store(spark, sf_dir)
    ivf = _shared_ivf_store(spark, sf_dir)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    return search(spark, bm, {
        "knn": {
            "query_vector": [float(x) for x in qv],
            "k": 10,
            "filter": {"bool": {"filter": [
                {"range": {"n_chars": {"gte": 200}}},
                {"range": {"doc": {"gt": 0}}},
            ]}},
        },
        "size": 10,
    }, dense_store=ivf)


@register("search_api_highlight", REGISTRY["search_bm25_highlight"][1])
def search_api_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``highlight`` as a ``_search`` request key: the returned
    page's hits gain matched_term / match_pos / snippet computed over
    the stored ``_source`` of JUST those hits (a point-lookup-sized
    projection — the ES stored-field-fetch-per-hit shape), pinned to
    the corpus-scan highlight row's own oracle."""
    from .operators.searchapi import search

    store = _shared_src_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"match": {"text": "spark table stream"}},
        "size": 10,
        "highlight": {"fields": {"_source": {}}},
    }).select(
        F.col("doc").alias("doc_id"), "score",
        "matched_term", "match_pos", "snippet",
    )


@register("search_api_suggest", REGISTRY["search_suggest"][1])
def search_api_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``suggest`` as a ``_search`` request key (like ``aggs``, the
    response schema differs so the suggestion frame IS the response)
    — pinned to the standalone term-suggester row's oracle."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "suggest": {"fix": {
            "text": "strean tabel spark",
            "term": {"field": "text", "max_edits": 2, "size": 3},
        }},
    })


@register(
    "search_api_count",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    hits AS (
        SELECT DISTINCT doc_id FROM toks
        WHERE token IN ('spark', 'stream')
    )
    SELECT count(*)::BIGINT AS count
    FROM hits JOIN documents USING (doc_id)
    WHERE n_chars >= 200 AND n_chars < 900
    """,
)
def search_api_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES ``_count`` endpoint (operators/searchapi.py:count_api):
    the matched-set cardinality of a query body with scoring skipped
    entirely — every clause in filter context, no weight frame, one
    token-pruned membership scan + doc-values filter."""
    from .operators.searchapi import count_api

    store = _shared_bm25_store(spark, sf_dir)
    return count_api(spark, store, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark stream"}}],
            "filter": [{"range": {"n_chars": {"gte": 200, "lt": 900}}}],
        }},
    })


@register(
    "search_api_search_after",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id AS doc,
               round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    )
    SELECT doc, score FROM bm
    ORDER BY score DESC, doc ASC
    LIMIT 5 OFFSET 5
    """,
)
def search_api_search_after(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``search_after`` cursor paging WITHOUT a PIT (live-store
    paging): page 1's last sort values (score + doc tiebreak, a
    driver-side model-sized cursor) feed page 2 as a lexicographic
    strictly-after predicate pushed BEFORE the top-k — page 2 costs
    one TakeOrderedAndProject like page 1, never offset's
    sort-then-skip.  The oracle pins it to the OFFSET formulation of
    the same total order."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    body = {"query": {"match": {"text": "spark stream"}}, "size": 5}
    page1 = search(spark, store, body).collect()
    last = page1[-1]
    return search(spark, store, {
        **body, "search_after": [last["score"], last["doc"]],
    })


def _stem_mixed_col() -> F.Column:
    """Suffix-bearing fixture text: deterministic per-doc injection of
    plural / -ing / -ed forms the stemmer must fold back (the corpus
    vocabulary itself carries no inflected forms)."""
    d = F.col("doc_id") % 3
    return (
        F.when(d == 0, F.regexp_replace("text", "table", "tables"))
        .when(d == 1, F.regexp_replace("text", "stream", "streaming"))
        .otherwise(F.regexp_replace("text", "sort", "sorted"))
    )


_STEM_MIXED_SQL = (
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "regexp_replace(text, 'table', 'tables', 'g') "
    "WHEN doc_id % 3 = 1 THEN "
    "regexp_replace(text, 'stream', 'streaming', 'g') "
    "ELSE regexp_replace(text, 'sort', 'sorted', 'g') END)"
)


def _stemmed_toks_sql() -> str:
    from .operators.analysis import get_analyzer

    return get_analyzer("standard_stem").duckdb_tokens_sql(
        _STEM_MIXED_SQL
    )


def _shared_stemmed_bm25_store(spark: SparkSession, sf_dir: str) -> str:
    """The suffix-injected corpus folded once under the
    standard_stem analyzer (porter-lite; analyzer name persisted in
    _bm_params so mismatched stores never merge)."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", _stem_mixed_col().alias("text")
        )
        incremental_bm25_index(
            spark, docs, path, analyzer="standard_stem"
        )  # fold is eager; the returned frame is discarded

    return _shared_store("bm25_stem", sf_dir, build)


@register(
    "search_analyzed_stemmed",
    """
    WITH toks AS (
        SELECT doc_id, unnest({TOKS}) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('table', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """.replace("{TOKS}", _stemmed_toks_sql()),
)
def search_analyzed_stemmed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stemmed retrieval (operators/analysis.py standard_stem): the
    corpus carries injected plural/-ing/-ed forms, the store folds
    them through the porter-lite chain, and the query arrives
    INFLECTED the other way — "Tables!" / "Streaming" analyze to the
    same stems 'table' / 'stream' the index holds, so morphological
    variants retrieve each other.  The oracle re-runs the identical
    five-rule chain via the DuckDB twin over the same suffix-injected
    expression — index-time and query-time stemming provably one
    pipeline, cross-engine."""
    from .operators.text import bm25_over_store

    store = _shared_stemmed_bm25_store(spark, sf_dir)
    return bm25_over_store(
        spark, store, ["Tables!", "Streaming"], top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


def warm_shared_fixtures(spark: SparkSession, sf_dir: str) -> list:
    """Build every NAMED shared fixture eagerly — the bench harness
    calls this as an explicit SETUP phase charged to its own
    ``setup_sec`` instead of to whichever query touches a store first
    (r11 adjudication: registry insertions re-shuffled first-touch
    order and two per-query rows absorbed fixture builds, looking
    like regressions until hand re-timed).  Streaming FEED fixtures
    remain first-touch-charged: their build closures live inside the
    query functions by design (each documents its feed shape beside
    the drain it measures) and cost well under a second each.
    Returns the list of warmed fixture kinds."""
    warmed = []
    for kind, fn in (
        ("bm25", _shared_bm25_store),
        ("bm25_an", _shared_analyzed_bm25_store),
        ("bm25_stem", _shared_stemmed_bm25_store),
        ("ivf", _shared_ivf_store),
        ("pcstore", _shared_pc_store),
        ("nestedstore", _shared_nested_store),
        ("srcstore", _shared_src_store),
        ("titlestore", _shared_title_store),
        ("pitstore", _shared_pit_store),
    ):
        fn(spark, sf_dir)
        warmed.append(kind)
    _shared_knn_edges(spark, sf_dir)
    warmed.append("knn5")
    return warmed


@register(
    "search_api_ids",
    """
    SELECT doc_id AS doc, CAST(1.0 AS DOUBLE) AS score, lang, n_chars
    FROM documents
    WHERE doc_id IN (5, 10, 15, 20)
    ORDER BY doc
    """,
)
def search_api_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``ids`` query through the executor: point membership on the
    doc id (a pushed-down In(doc, …) on docstats), constant score,
    stored fields returned via the body's ``fields``."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"ids": {"values": [5, 10, 15, 20]}},
        "size": 10,
        "fields": ["lang", "n_chars"],
    })


@register(
    "search_api_boosting",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id,
               sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    neg AS (SELECT DISTINCT doc_id FROM toks WHERE token = 'value')
    SELECT doc_id AS doc,
           round(CASE WHEN doc_id IN (SELECT doc_id FROM neg)
                      THEN s * 0.2 ELSE s END, 6) AS score
    FROM bm
    ORDER BY score DESC, doc ASC
    LIMIT 10
    """,
)
def search_api_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``boosting`` query: docs matching the negative clause stay
    MEMBERS at negative_boost x score (demote, don't exclude — the
    soft must_not a hard bool cannot express).  One matched-sized
    left mark join over the shared weight frame."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"boosting": {
            "positive": {"match": {"text": "spark stream"}},
            "negative": {"term": {"text": "value"}},
            "negative_boost": 0.2,
        }},
        "size": 10,
    })


@register(
    "search_api_rescore",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    tl AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id, round(sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS score
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    win AS (
        SELECT doc_id, score FROM bm
        ORDER BY score DESC, doc_id ASC LIMIT 10
    ),
    gated AS (
        SELECT doc_id FROM tl
        WHERE len([i FOR i IN range(1, len(tk))
                   IF tk[i] = 'spark' AND tk[i+1] = 'stream']) > 0
    ),
    ph AS (
        SELECT doc_id, score FROM bm JOIN gated USING (doc_id)
    ),
    win2 AS (
        SELECT w.doc_id,
               round(w.score + 2.0 * coalesce(p.score, 0), 6) AS score,
               1 AS wf
        FROM win w LEFT JOIN ph p USING (doc_id)
    ),
    rest AS (
        SELECT doc_id, score, 0 AS wf FROM bm
        WHERE doc_id NOT IN (SELECT doc_id FROM win)
    )
    SELECT doc_id AS doc, score
    FROM (SELECT * FROM win2 UNION ALL SELECT * FROM rest)
    ORDER BY wf DESC, score DESC, doc ASC
    LIMIT 5
    """,
)
def search_api_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rescore``: the top window_size hits of the match re-rank
    by original + 2 x phrase score (precision on top of recall); docs
    beyond the window keep their original order below the block.  The
    rescore leg reuses the one token-pruned weight frame and joins
    down to the window — never a second corpus pass.  The oracle
    re-derives window, phrase gate and combination in SQL."""
    from .operators.searchapi import search

    store = _shared_bm25_store(spark, sf_dir)
    return search(spark, store, {
        "query": {"match": {"text": "spark stream"}},
        "size": 5,
        "rescore": {
            "window_size": 10,
            "query": {
                "rescore_query": {
                    "match_phrase": {"text": "spark stream"}},
                "query_weight": 1.0,
                "rescore_query_weight": 2.0,
            },
        },
    })


def _cjk_mixed_col() -> F.Column:
    """CJK-bearing fixture text: deterministic per-doc injection of
    han runs (the corpus is ASCII) so the bigram analyzer has real
    ideograph sequences to expand."""
    d = F.col("doc_id") % 3
    return (
        F.when(d == 0, F.regexp_replace("text", "spark", "火花引擎"))
        .when(d == 1, F.regexp_replace("text", "stream", "流式处理"))
        .otherwise(F.col("text"))
    )


_CJK_MIXED_SQL = (
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "regexp_replace(text, 'spark', '火花引擎', 'g') "
    "WHEN doc_id % 3 = 1 THEN "
    "regexp_replace(text, 'stream', '流式处理', 'g') "
    "ELSE text END)"
)


def _cjk_toks_sql() -> str:
    from .operators.analysis import get_analyzer

    return get_analyzer("cjk_bigram").duckdb_tokens_sql(_CJK_MIXED_SQL)


def _shared_cjk_bm25_store(spark: SparkSession, sf_dir: str) -> str:
    """The CJK-injected corpus folded once under the cjk_bigram
    analyzer (ideograph runs index as overlapping bigrams — the
    segmentation-free core of the ik family the reference's mapping
    declares, examples/config.json:64-66)."""
    from .operators.text import incremental_bm25_index

    def build(path: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", _cjk_mixed_col().alias("text")
        )
        incremental_bm25_index(
            spark, docs, path, analyzer="cjk_bigram"
        )  # fold is eager; the returned frame is discarded

    return _shared_store("bm25_cjk", sf_dir, build)


@register(
    "search_analyzed_cjk",
    """
    WITH toks AS (
        SELECT doc_id, unnest({TOKS}) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('火花', '花引', '引擎')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           round(sum(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """.replace("{TOKS}", _cjk_toks_sql()),
)
def search_analyzed_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK retrieval without a dictionary (operators/analysis.py
    cjk_bigram): ideograph runs index as overlapping bigrams, and the
    query string '火花引擎' analyzes through the SAME chain into
    [火花, 花引, 引擎] — so any doc carrying the run matches without
    segmentation.  The oracle re-runs the identical bigram expansion
    via the DuckDB twin over the same CJK-injected expression."""
    from .operators.text import bm25_over_store

    store = _shared_cjk_bm25_store(spark, sf_dir)
    return bm25_over_store(
        spark, store, ["火花引擎"], top_k=10
    ).select(F.col("doc").alias("doc_id"), "score")


@register(
    "search_api_knn_hybrid",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'stream')
        GROUP BY doc_id, token
    ),
    n_t AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM tf GROUP BY token),
    bm AS (
        SELECT doc_id AS doc,
               sum(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ) AS s
        FROM tf JOIN n_t USING (token) JOIN dl USING (doc_id), stats
        GROUP BY doc_id
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    kn AS (
        SELECT e.vec_id AS doc,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.embedding::DOUBLE[]),
                   6) AS c
        FROM embeddings e, q
        WHERE e.vec_id > 0
        ORDER BY c DESC, doc ASC
        LIMIT 10
    )
    SELECT coalesce(b.doc, k.doc) AS doc,
           round(coalesce(b.s, 0) + coalesce(k.c, 0), 6) AS score
    FROM bm b FULL OUTER JOIN kn k ON b.doc = k.doc
    ORDER BY score DESC, doc ASC
    LIMIT 10
    """,
)
def search_api_knn_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES-8 hybrid request — ``query`` AND ``knn`` in one body:
    the union of both hit sets with scores SUMMED where a doc appears
    in both (a full-outer doc-keyed join of two matched-sized
    frames), then one global top-k.  The oracle re-derives both legs
    and the outer sum."""
    from .operators.searchapi import search

    bm = _shared_bm25_store(spark, sf_dir)
    ivf = _shared_ivf_store(spark, sf_dir)
    qv = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    )
    return search(spark, bm, {
        "query": {"match": {"text": "spark stream"}},
        "knn": {
            "query_vector": [float(x) for x in qv],
            "k": 10,
            "filter": {"range": {"doc": {"gt": 0}}},
        },
        "size": 10,
    }, dense_store=ivf)


@register("search_api_multi_match", REGISTRY["search_multi_match"][1])
def search_api_multi_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``multi_match`` as a ``_search`` BODY NODE over the per-field-
    store layout (field_stores= maps extra analyzed fields; the main
    store is the ``text`` field): best_fields with title^2 and
    tie_breaker 0.3 — pinned to the standalone operator's two-field
    BM25 oracle."""
    from .operators.searchapi import search

    body = _shared_bm25_store(spark, sf_dir)
    title = _shared_title_store(spark, sf_dir)
    return search(spark, body, {
        "query": {"multi_match": {
            "query": "value spark",
            "fields": ["title^2", "text"],
            "type": "best_fields",
            "tie_breaker": 0.3,
        }},
        "size": 10,
    }, field_stores={"title": title}).select(
        F.col("doc").alias("doc_id"), "score"
    )


@register(
    "search_agg_min_doc_count",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('spark')
    ),
    d AS (
        SELECT lang, n_chars FROM documents JOIN matched USING (doc_id)
    )
    SELECT lang, floor(n_chars / 100.0) * 100.0 AS b,
           count(*) AS n_docs
    FROM d WHERE lang IS NOT NULL
    GROUP BY 1, 2
    HAVING count(*) >= 15
    ORDER BY lang ASC, b ASC
    """,
)
def search_agg_min_doc_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES ``min_doc_count``: buckets under the floor drop — applied
    per parent prefix at the bucket's own level, BEFORE any ``size``
    truncation (the ES order, pinned by test).  Window filter over
    the bucket-cardinality frame; the oracle is GROUP BY + HAVING."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return agg_tree_over_store(
        spark, store, ["spark"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"b": {"histogram": {
                "field": "n_chars", "interval": 100.0,
                "min_doc_count": 15}}}}},
    )


@register(
    "search_span_near",
    """
    WITH tl AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents
    ),
    pos AS (
        SELECT doc_id,
               [i - 1 FOR i IN range(1, len(tk) + 1)
                IF tk[i] = 'spark'] AS p0,
               [i - 1 FOR i IN range(1, len(tk) + 1)
                IF tk[i] = 'stream'] AS p1
        FROM tl
    )
    SELECT doc_id AS doc FROM pos
    WHERE len(p0) > 0 AND len(p1) > 0
      AND len([x FOR x IN p0
               IF len([y FOR y IN p1
                       IF y > x AND y - x - 1 <= 2]) > 0]) > 0
    ORDER BY doc
    """,
)
def search_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``span_near`` (operators/text.py:span_near_over_store):
    'spark' then 'stream' within slop 2, in order — the Lucene
    proximity window ((max−min+1)−n ≤ slop) as a nested-EXISTS
    higher-order predicate over per-term position arrays; one
    single-token-pruned postings scan per term, doc-keyed joins of
    matched-sized frames, no explode.  The oracle re-derives the
    positions and the pairwise window in SQL."""
    from .operators.text import span_near_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return span_near_over_store(
        spark, store, ["spark", "stream"], slop=2, in_order=True
    )


@register(
    "search_span_near_unordered",
    """
    WITH tl AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents
    ),
    pos AS (
        SELECT doc_id,
               [i - 1 FOR i IN range(1, len(tk) + 1)
                IF tk[i] = 'window'] AS p0,
               [i - 1 FOR i IN range(1, len(tk) + 1)
                IF tk[i] = 'sort'] AS p1
        FROM tl
    )
    SELECT doc_id AS doc FROM pos
    WHERE len(p0) > 0 AND len(p1) > 0
      AND len([x FOR x IN p0
               IF len([y FOR y IN p1
                       IF abs(y - x) - 1 <= 1 AND y <> x]) > 0]) > 0
    ORDER BY doc
    """,
)
def search_span_near_unordered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``span_near`` with ``in_order=False``: 'window' and 'sort'
    within slop 1 in either order — same window contract without the
    ascending-position requirement."""
    from .operators.text import span_near_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return span_near_over_store(
        spark, store, ["window", "sort"], slop=1, in_order=False
    )


@register(
    "search_agg_top_hits",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('table')
    ),
    ranked AS (
        SELECT lang, doc_id AS doc, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id ASC
               ) AS rank
        FROM documents JOIN matched USING (doc_id)
        WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    )
    SELECT lang, CAST(rank AS INT) AS rank, doc, n_chars
    FROM ranked WHERE rank <= 3
    ORDER BY lang ASC, rank ASC
    """,
)
def search_agg_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_hits`` (operators/aggs.py:top_hits_over_store): the
    top 3 docs per language by n_chars over the hit set — grouped
    retrieval, one window row_number over the matched docstats frame
    (bucket-cardinality x k output).  The oracle is the identical
    window in SQL."""
    from .operators.aggs import top_hits_over_store

    store = _shared_bm25_store(spark, sf_dir)
    return top_hits_over_store(
        spark, store, ["table"], "lang", "n_chars", k=3
    )


@register(
    "search_agg_histogram_empty_buckets",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    matched AS (
        SELECT DISTINCT doc_id FROM toks WHERE token IN ('value')
    ),
    d AS (
        SELECT n_chars FROM documents JOIN matched USING (doc_id)
        WHERE n_chars IS NOT NULL
    ),
    leaf AS (
        SELECT floor(n_chars / 100.0) * 100.0 AS b,
               count(*) AS n_docs, sum(n_chars) AS s
        FROM d GROUP BY 1
    ),
    spine AS (
        -- extended_bounds (-200..1200) cover the fixture's n_chars
        -- range at every sf, so the spine is the constant series
        SELECT CAST(x AS DOUBLE) AS b
        FROM generate_series(-200, 1200, 100) t(x)
    )
    SELECT spine.b, coalesce(n_docs, 0) AS n_docs,
           coalesce(s, 0)::BIGINT AS s
    FROM spine LEFT JOIN leaf ON spine.b = leaf.b
    ORDER BY spine.b ASC
    """,
)
def search_agg_histogram_empty_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram with ``min_doc_count: 0`` + ``extended_bounds``: the
    ES empty-bucket rendering — every interval step between the
    bounds exists, gaps at n_docs 0 / additive metrics 0 (the Kibana
    no-holes contract; pipelines walk the gapless sequence).  The
    spine is a bucket-cardinality sequence + left join, zero extra
    corpus work; the oracle uses generate_series."""
    from .operators.aggs import agg_tree_over_store

    store = _shared_bm25_store(spark, sf_dir)
    out = agg_tree_over_store(
        spark, store, ["value"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0,
                             "min_doc_count": 0,
                             "extended_bounds": {"min": -200,
                                                 "max": 1200}},
               "aggs": {"s": {"sum": {"field": "n_chars"}}}}},
    )
    return out.withColumn("s", F.col("s").cast("long"))
