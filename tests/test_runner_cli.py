"""End-to-end orchestrator test (C6/C7): a reference-shaped config JSON
with a ``file://`` MongoDB URL drives scan-then-tail through
``runner.run`` and the final sink state reflects both phases."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mongo_es_spark.config import read_config
from mongo_es_spark.core import make_ts
from mongo_es_spark.runner import run
from mongo_es_spark.streaming.sink import ParquetIndexSink


def test_run_from_config_json(spark, tmp_path):
    root = tmp_path / "mongo"
    oplog = root / "oplog"
    oplog.mkdir(parents=True)

    spark.createDataFrame(
        [("D1", "one", 1), ("D2", "two", 2), ("D3", "three", 3)],
        "_id string, name string, n long",
    ).write.parquet(str(root / "appdb.items.parquet"))

    events = [
        {"ts": make_ts(100), "ns": "appdb.items", "op": "u", "id": "D1",
         "doc": json.dumps({"$set": {"name": "one!"}})},
        {"ts": make_ts(101), "ns": "appdb.items", "op": "i", "id": "D4",
         "doc": json.dumps({"name": "four", "n": 4})},
        {"ts": make_ts(102), "ns": "appdb.items", "op": "d", "id": "D2",
         "doc": json.dumps({})},
    ]
    feed = oplog / "batch0.json"
    with open(feed, "w") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")
    os.utime(feed, (1_700_000_000, 1_700_000_000))

    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({
        "mongodb": {"url": f"file://{root}"},
        "elasticsearch": {"options": {}},
        "tasks": [{
            "from": {"phase": "scan"},
            "extract": {"db": "appdb", "collection": "items"},
            "transform": {"mapping": {"name": "name", "n": "n"}},
            "load": {"index": "items", "type": "doc"},
            "hints": {"name": "string", "n": "long"},
        }],
    }))

    work_dir = str(tmp_path / "work")
    run(
        read_config(str(cfg_path)),
        spark=spark,
        work_dir=work_dir,
        available_now=True,
    )

    sink = ParquetIndexSink(
        os.path.join(work_dir, "index", "appdb.items___items.doc")
    )
    state = sink.read_state(spark)
    assert state is not None
    got = {
        r["_id"]: r["data"].asDict()
        for r in state.select("_id", "data").collect()
    }
    assert set(got) == {"D1", "D3", "D4"}          # D2 deleted, D4 inserted
    assert got["D1"]["name"] == "one!"             # patch-update applied
    assert got["D3"] == {"name": "three", "n": 3}  # untouched scan row
    assert got["D4"] == {"name": "four", "n": 4}   # insert from the tail
