"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query.  Queries whose
helper returns an already-materialized summary frame (the fold/
streaming harnesses) still dump their returned frame's plan — the
fold-side evidence for those lives in the per-job profiles recorded
in OPTIMIZATION notes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from mongo_es_spark.queries import warm_shared_fixtures

        warm_shared_fixtures(spark, sf_dir)
    except Exception as exc:
        print(f"warm failed: {exc}", file=sys.stderr)
    qs = entry.queries()
    for name in names:
        buf = io.StringIO()
        try:
            df = qs[name](spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
        except Exception as exc:  # record the failure, keep going
            buf.write(f"PLAN DUMP FAILED: {exc}\n")
        with open(
            os.path.join(out_dir, f"{name}_{suffix}.txt"), "w"
        ) as fh:
            fh.write(buf.getvalue())
        print(f"dumped {name}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
