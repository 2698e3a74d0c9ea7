"""Exact document-level oplog compaction via ``applyInPandas``.

Two compaction implementations exist, picked by payload shape:

* ``operators/compaction.py::compact_events`` — fully declarative
  window pass for flat/dense payloads (every event carries all mapped
  columns).  All-JVM, whole-stage codegen, the scale path.
* this module — exact reference semantics for *document-shaped* events
  (nested docs, sparse ``$set``/``$unset``, the deep-merge quirks of
  ``_.merge`` at reference src/processor.ts:275), by running the
  golden-tested pure fold (core.merge_oplogs) inside
  ``groupBy(ns,id).applyInPandas``.

Why applyInPandas is legitimate here (and only here): the u-after-u
deep merge over arbitrary nested JSON is order-dependent per key and
not expressible as a fixed-width column computation when the document
schema is open.  The shuffle is the same single ``(ns, id)`` exchange
as the declarative path; groups are tiny (events per key per batch);
transfer is Arrow-batched.  At 100 TB the cost is the shuffle, which
is unavoidable for per-key compaction, not the Python fold.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..config import Task
from ..core import merge_oplogs
from .. import paths


def _truthy_unset(unset: dict, key: str) -> bool:
    return bool(paths.get(unset, key))

COMPACTED_SCHEMA = (
    "ts long, ns string, op string, id string, doc string, "
    "has_plain boolean, unset_keys array<string>"
)


def compact_oplog_docs(df: DataFrame, task: Task) -> DataFrame:
    """Compact oplog rows (sources/cdc.py schema) to at most one
    survivor per ``(ns, id)``; exact reference event algebra.

    Adds two dispatch aids computed here, where the document is
    already materialized (JSON re-parsing downstream is typed and
    cannot see these reliably):

    * ``has_plain`` — survivor's ``doc`` carries a non-``$`` top-level
      key: the full-document-replace marker (reference:
      src/processor.ts:186);
    * ``unset_keys`` — mapped paths with a truthy ``$unset`` entry
      (the reference's asymmetric truthy-get, src/processor.ts:97).
    """

    def fold(pdf):
        import pandas as pd

        oplogs = []
        for row in pdf.itertuples(index=False):
            o = json.loads(row.doc) if row.doc else {}
            lg = {"ts": int(row.ts), "ns": row.ns, "op": row.op}
            if row.op == "u":
                lg["o"] = o
                lg["o2"] = {"_id": row.id}
            else:
                o.setdefault("_id", row.id)
                lg["o"] = o
            oplogs.append(lg)
        out = []
        for lg in merge_oplogs(task, oplogs):
            if lg["op"] == "u":
                doc_id = str(lg["o2"]["_id"])
            else:
                doc_id = str(lg["o"]["_id"])
            doc = {k: v for k, v in lg["o"].items() if k != "_id"}
            has_plain = any(not k.startswith("$") for k in doc)
            unset = doc.get("$unset") or {}
            unset_keys = [
                k for k in task.transform.mapping if _truthy_unset(unset, k)
            ]
            out.append(
                (
                    lg["ts"],
                    lg["ns"],
                    lg["op"],
                    doc_id,
                    json.dumps(doc),
                    has_plain,
                    unset_keys,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "ts", "ns", "op", "id", "doc", "has_plain", "unset_keys",
            ],
        )

    return df.groupBy("ns", "id").applyInPandas(fold, COMPACTED_SCHEMA)
