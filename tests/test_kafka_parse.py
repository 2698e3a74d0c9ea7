"""Unit tests for the Kafka oplog wire parsing (sources/cdc.py
``parse_kafka_oplog``) — no broker: the parse + filter expressions run
over a batch frame shaped like the Kafka source's output (binary
``value`` plus transport metadata columns), mirroring how the file
feed is tested.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mongo_es_spark.config import CheckPoint, Task
from mongo_es_spark.sources.cdc import ms_to_bson_ts, parse_kafka_oplog

TASK = Task(
    {
        "extract": {"db": "appdb", "collection": "users"},
        "transform": {"mapping": {"name": "name"}},
        "load": {"index": "users", "type": "doc"},
    }
)


def _kafka_frame(spark, values: list[str]):
    """Batch frame with the Kafka source's column shape: binary value
    plus the transport metadata the parser must ignore."""
    return (
        spark.range(len(values))
        .withColumn(
            "value",
            F.element_at(
                F.array(*[F.lit(v.encode()) for v in values]),
                (F.col("id") + 1).cast("int"),
            ),
        )
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("topic", F.lit("oplog"))
        .withColumn("partition", F.lit(0).cast("int"))
        .withColumn("offset", F.col("id"))
        .select("key", "value", "topic", "partition", "offset")
    )


def _ev(ts, ns="appdb.users", op="i", id="1", doc=None, fromMigrate=None):
    row = {"ts": ts, "ns": ns, "op": op, "id": id}
    if doc is not None:
        row["doc"] = json.dumps(doc)
    if fromMigrate is not None:
        row["fromMigrate"] = fromMigrate
    return json.dumps(row)


def test_parse_filters_ns_migrate_and_malformed(spark):
    values = [
        _ev(100, id="a", doc={"name": "x"}),            # kept
        _ev(101, ns="appdb.orders", id="b"),            # wrong collection
        _ev(102, ns="otherdb.users", id="c"),           # wrong db
        _ev(103, id="d", fromMigrate=True),             # shard migration
        _ev(104, id="e", fromMigrate=False),            # explicit false kept
        "{not valid json",                              # malformed -> dropped
        "",                                             # empty -> dropped
        json.dumps({"unrelated": "shape"}),             # no ns -> dropped
        _ev(105, op="d", id="f"),                       # delete kept
    ]
    out = parse_kafka_oplog(_kafka_frame(spark, values), TASK)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"a", "e", "f"}
    assert rows["a"]["op"] == "i"
    assert json.loads(rows["a"]["doc"]) == {"name": "x"}
    assert rows["f"]["op"] == "d"
    # transport metadata must not leak into the oplog shape
    assert set(out.columns) == {"ts", "ns", "op", "id", "doc", "fromMigrate"}


def test_parse_applies_checkpoint_watermark(spark):
    ck_ms = 50_000  # 50 s wall clock
    bound = ms_to_bson_ts(ck_ms)
    values = [
        _ev(bound - 1, id="old"),
        _ev(bound, id="edge"),
        _ev(bound + 1, id="new"),
    ]
    out = parse_kafka_oplog(
        _kafka_frame(spark, values),
        TASK,
        CheckPoint(phase="tail", time=ck_ms),
    )
    assert {r["id"] for r in out.collect()} == {"edge", "new"}


def test_parse_matches_file_feed_shape(spark, tmp_path):
    """A record delivered over Kafka and the same record delivered as
    a JSON file line must produce identical oplog rows, so every
    downstream plan (relevance filter, compaction, sink) is transport
    agnostic."""
    from mongo_es_spark.sources.cdc import OPLOG_SCHEMA

    line = _ev(7, id="z", doc={"name": "n", "age": 3})
    (tmp_path / "feed.json").write_text(line + "\n")
    via_file = (
        spark.read.schema(OPLOG_SCHEMA)
        .json(str(tmp_path / "feed.json"))
        .collect()
    )
    via_kafka = parse_kafka_oplog(_kafka_frame(spark, [line]), TASK).collect()
    assert [r.asDict() for r in via_kafka] == [r.asDict() for r in via_file]
