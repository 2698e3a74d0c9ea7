"""L1 sink contracts: bulk-body format (reference:
src/processor.ts:229-256) and the idempotent overwrite-by-key semantics
that make at-least-once delivery safe (SURVEY §7 hard part (c))."""

from __future__ import annotations

import json

from mongo_es_spark.streaming.sink import EsBulkSink, ParquetIndexSink


def test_bulk_body_format():
    rows = [
        {"action": "upsert", "id": "A", "parent": None,
         "data": {"name": "x", "n": 1}},
        {"action": "upsert", "id": "B", "parent": "P9",
         "data": {"name": "y"}},
        {"action": "delete", "id": "C", "parent": None},
    ]
    body = EsBulkSink.bulk_body(rows, index="idx", doc_type="doc")
    lines = [json.loads(ln) for ln in body.strip().split("\n")]
    assert lines[0] == {"index": {"_index": "idx", "_type": "doc", "_id": "A"}}
    assert lines[1] == {"name": "x", "n": 1}
    # parent routing rides in the action metadata (reference: _parent)
    assert lines[2]["index"]["_parent"] == "P9"
    assert lines[4] == {"delete": {"_index": "idx", "_type": "doc", "_id": "C"}}
    assert body.endswith("\n")
    assert EsBulkSink.bulk_body([], "idx", "doc") == ""


def _apply(spark, sink, irs, batch_id):
    df = spark.createDataFrame(
        irs,
        "action string, id string, parent string, "
        "data struct<name:string>, timestamp long",
    )
    sink.apply(spark, df, batch_id)


def _state(spark, sink):
    state = sink.read_state(spark)
    return {
        r["_id"]: r["data"]["name"] for r in state.collect()
    } if state is not None else {}


def test_parquet_sink_upsert_delete_and_idempotent_replay(spark, tmp_path):
    sink = ParquetIndexSink(str(tmp_path / "idx"))
    batch1 = [
        ("upsert", "A", None, ("a1",), 1),
        ("upsert", "B", None, ("b1",), 1),
    ]
    _apply(spark, sink, batch1, 0)
    assert _state(spark, sink) == {"A": "a1", "B": "b1"}

    batch2 = [
        ("upsert", "A", None, ("a2",), 2),   # overwrite by key
        ("delete", "B", None, None, 2),
        ("upsert", "C", None, ("c1",), 2),
    ]
    _apply(spark, sink, batch2, 1)
    assert _state(spark, sink) == {"A": "a2", "C": "c1"}

    # at-least-once: replaying the same batch (same id) must converge
    # to the same state, not duplicate or resurrect anything
    _apply(spark, sink, batch2, 1)
    assert _state(spark, sink) == {"A": "a2", "C": "c1"}
