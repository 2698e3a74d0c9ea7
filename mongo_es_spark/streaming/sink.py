"""Sinks for the IR stream (L1 bulk load + L2 DDL bootstrap).

The reference loads every micro-batch with one Elasticsearch ``_bulk``
call mixing ``index`` (upsert-by-_id overwrite) and ``delete`` actions
(reference: src/processor.ts:225-258).  Idempotence comes from
overwrite-by-key — the at-least-once contract (SURVEY §7 hard part (c)).

Two implementations:

* :class:`ParquetIndexSink` — a versioned parquet directory emulating
  the keyed index for tests/benchmarks: per batch, the new state is
  ``(old state anti-join batch keys) union upserts``.  Versioned dirs +
  a ``_CURRENT`` pointer make replays idempotent (same batch id
  rewrites the same version), mirroring how Spark's offset log plus an
  idempotent sink gives effectively-once.
* :class:`EsBulkSink` — the real thing: per-partition HTTP ``_bulk``
  bodies (executor-side, connection per partition — the distributed
  equivalent of the reference's single bulk call; 1000 executors write
  1000 parallel bulks).  Needs a live cluster, so tests gate on
  reachability.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IR_COLUMNS = ("action", "id", "parent", "data", "timestamp")


class ParquetIndexSink:
    """Keyed upsert/delete state over versioned parquet directories."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> Optional[str]:
        try:
            with open(self._pointer(), "r", encoding="utf-8") as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def read_state(self, spark: SparkSession) -> Optional[DataFrame]:
        """Current index state: ``(_id, _parent, data)`` or None."""
        version = self.current_version()
        if version is None:
            return None
        return spark.read.parquet(os.path.join(self.path, version))

    def apply(self, spark: SparkSession, irs: DataFrame, batch_id: int) -> None:
        """L1: apply one compacted IR batch. Compaction guarantees at
        most one IR per id, so ordering within the batch is moot —
        the invariant that makes this safe across partitions."""
        upserts = irs.filter(F.col("action") == "upsert").select(
            F.col("id").alias("_id"),
            F.col("parent").alias("_parent"),
            F.col("data"),
        )
        keys = irs.select(F.col("id").alias("_id")).distinct()
        state = self.read_state(spark)
        if state is None:
            new_state = upserts
        else:
            kept = state.join(keys, "_id", "left_anti")
            new_state = kept.unionByName(upserts)
        version = f"v{batch_id}"
        out = os.path.join(self.path, version)
        new_state.write.mode("overwrite").parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp, self._pointer())


class EsBulkSink:
    """Executor-side Elasticsearch ``_bulk`` writer.

    Bulk-body format per reference src/processor.ts:229-256: an
    ``index`` action line + source doc per upsert, a ``delete`` action
    line per delete; ``_parent`` routing when configured.
    """

    def __init__(self, hosts: str, index: str, doc_type: str = "_doc",
                 bulk_size: int = 5000):
        self.hosts = hosts.rstrip("/")
        self.index = index
        self.doc_type = doc_type
        self.bulk_size = bulk_size

    @staticmethod
    def bulk_body(rows, index: str, doc_type: str) -> str:
        """Pure body builder (unit-testable without a cluster)."""
        lines = []
        for row in rows:
            meta = {"_index": index, "_type": doc_type, "_id": row["id"]}
            if row.get("parent"):
                meta["_parent"] = row["parent"]
            if row["action"] == "upsert":
                lines.append(json.dumps({"index": meta}))
                lines.append(json.dumps(row.get("data") or {}))
            else:
                lines.append(json.dumps({"delete": meta}))
        return "\n".join(lines) + "\n" if lines else ""

    def apply(self, spark: SparkSession, irs: DataFrame, batch_id: int) -> None:
        hosts, index, doc_type, bulk_size = (
            self.hosts, self.index, self.doc_type, self.bulk_size,
        )

        def write_partition(rows):
            import urllib.request

            buf = []

            def flush():
                if not buf:
                    return
                body = EsBulkSink.bulk_body(buf, index, doc_type)
                req = urllib.request.Request(
                    f"{hosts}/_bulk",
                    data=body.encode("utf-8"),
                    headers={"Content-Type": "application/x-ndjson"},
                    method="POST",
                )
                urllib.request.urlopen(req, timeout=60).read()
                buf.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                buf.append(d)
                if len(buf) >= bulk_size:
                    flush()
            flush()

        irs.foreachPartition(write_partition)


def init_indices(hosts: str, indices: list[dict], suffix: str = "") -> None:
    """L2 DDL bootstrap: create index if missing, put mapping;
    ``suffix`` implements blue-green index versioning
    (reference: src/indices.ts:19-33, suffix at :22,29)."""
    import urllib.error
    import urllib.request

    for spec in indices:
        name = spec.get("index", "") + suffix
        url = f"{hosts.rstrip('/')}/{name}"
        try:
            urllib.request.urlopen(
                urllib.request.Request(url, method="HEAD"), timeout=10
            )
        except urllib.error.HTTPError as err:
            if err.code == 404:
                body = json.dumps(spec.get("body", {})).encode("utf-8")
                req = urllib.request.Request(
                    url,
                    data=body,
                    headers={"Content-Type": "application/json"},
                    method="PUT",
                )
                urllib.request.urlopen(req, timeout=30).read()
            else:
                raise
