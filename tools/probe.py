"""Targeted per-query scale probe: time a subset of registry queries
at an arbitrary sf dir (default the 10x replica built by
tools/make_replica.py).  Same measurement policy as bench.py (noop
sink, min of N repeats).

Usage: python tools/probe.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/tmp/sf1"

    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    qs = entry.queries()
    names = args or list(qs)
    for name in names:
        best = float("inf")
        try:
            for _ in range(repeat):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.perf_counter() - t0)
            print(f"{name:32s} {best:8.2f} s")
        except Exception as exc:
            print(f"{name:32s} FAILED: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
