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


def events_as_oplog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
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


@register(
    "cdc_compaction",
    f"""
    WITH oplog AS ({_OPLOG_SQL}),
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
    )
    SELECT l.user_id,
           CASE WHEN l.op = 'u' AND COALESCE(p.prev_op, '') = 'i'
                THEN 'i' ELSE l.op END AS op,
           CASE WHEN l.op = 'd' THEN NULL ELSE l.value END AS value,
           l.ts_ms
    FROM last_ev l LEFT JOIN prev_nu p USING (user_id)
    WHERE NOT (l.op = 'd' AND COALESCE(p.prev_op, '') = 'i')
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


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql.strip()
        for name, (_, sql) in REGISTRY.items()
        if sql is not None
    }
