"""Build the 10x scale-probe replica used by SCALING.md.

Id-shifted duplication of the sf0.1 tables: each copy k shifts every id
column by k * STRIDE, leaving non-id payloads identical — which makes
the replica an *adversarially clone-heavy* corpus (every document /
embedding / event payload gains COPIES-1 exact clones).  That is the
stress shape the dedup family must survive, per SCALING.md.

Usage: python tools/make_replica.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

STRIDE = 100_000_000

# id columns to shift per table; everything else copies verbatim
ID_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],  # user_id kept so per-user streams grow 10x
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# tiny dimension tables are NOT duplicated (they are lookup sides)
SINGLE_COPY = {"region", "nation"}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from mongo_es_spark.session import get_spark

    spark = get_spark("make-replica")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for name, ids in ID_COLS.items():
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        if name in SINGLE_COPY:
            out = df
        else:
            k = F.explode(
                F.sequence(F.lit(0), F.lit(copies - 1))
            ).alias("__k")
            rep = df.select("*", k)
            out = rep.select(
                *[
                    (
                        F.col(c)
                        + F.col("__k").cast("long") * F.lit(STRIDE)
                    ).alias(c)
                    if c in ids
                    else F.col(c)
                    for c in df.columns
                ]
            )
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {out.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
