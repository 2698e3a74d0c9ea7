"""Time a subset of registry queries exactly as bench.py does (warm,
shared fixtures, noop sink, min-of-N) — the tight-A/B harness for
config toggles.  Usage:

    python tools/bench_subset.py [sf_dir] query [query ...]

Env: SPARK_GRAFT_BENCH_REPEAT (default 2).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    ident = pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(ident("id")).write.mode(
        "overwrite"
    ).format("noop").save()
    from mongo_es_spark.queries import warm_shared_fixtures

    warm_shared_fixtures(spark, sf_dir)

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    qs = entry.queries()
    timings = {}
    for name in names:
        reps = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            reps.append(round(time.perf_counter() - t0, 2))
        print(f"subset: {name} reps={reps}", file=sys.stderr)
        timings[name] = min(reps)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
