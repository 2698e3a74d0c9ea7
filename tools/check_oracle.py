"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` in DuckDB over
the same sf dir, compare row count + column names + order-insensitive
values (column order normalized by name, floats rounded).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):7d} (rows-only, no oracle)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        s_n, d_n = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = s_n == d_n
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:32s} {status} rows={len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
        )
        if not ok_vals and ok_cols:
            diff_a = [r for r in s_n if r not in set(d_n)][:3]
            diff_b = [r for r in d_n if r not in set(s_n)][:3]
            print(f"   spark-only: {diff_a}\n   duck-only : {diff_b}")
        failures += 0 if (ok_cols and ok_vals) else 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
