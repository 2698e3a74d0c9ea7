"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry in Spark and its ``oracle_sql()`` in DuckDB over
the same sf dir, compare row count + column names + column DTYPES +
order-insensitive values (column order normalized by name, floats
rounded).

The dtype check exists because the driver's value hash is dtype-aware:
DuckDB silently widens integer ``sum()`` in agg/window position to
HUGEINT (int128) and typed division to DECIMAL, so two result sets
with identical Python values can still hash differently.  We map both
sides onto a canonical type string (int64, float64, decimal(s=N),
string, date, timestamp, bool, binary, list<...>, struct<...>) and
fail on any per-column mismatch, which the value comparison alone
cannot catch.

Usage: python tools/check_oracle.py [--schema-only] [sf_dir] [query ...]

``--schema-only`` skips collecting values: it builds each Spark plan
(lazily, no action beyond any store materialization the query helper
does) and asks DuckDB for the oracle's relation types, then compares
canonical dtypes only.  Use it to sweep the whole registry for typing
drift cheaply.
"""

from __future__ import annotations

import math
import re
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


def canon_spark(dt) -> str:
    """Canonical dtype string for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.DecimalType):
        return f"decimal(s={dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"other({dt.simpleString()})"


_DUCK_SCALARS = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "UHUGEINT": "uint128",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BLOB": "binary",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIME": "time",
    "NULL": "null",
    '"NULL"': "null",
}


def canon_duck(typestr: str) -> str:
    """Canonical dtype string for a DuckDB type string (str(rel.types[i]))."""
    s = typestr.strip()
    if s.endswith("[]"):
        return f"list<{canon_duck(s[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", s)
    if m:
        return f"decimal(s={m.group(2)})"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.startswith("STRUCT(") and s.endswith(")"):
        inner = s[len("STRUCT(") : -1]
        parts, depth, cur = [], 0, ""
        for ch in inner:
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
                continue
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            cur += ch
        if cur:
            parts.append(cur)
        fields = []
        for p in parts:
            name, _, t = p.strip().partition(" ")
            fields.append(f"{name.strip(chr(34))}:{canon_duck(t)}")
        return "struct<" + ",".join(fields) + ">"
    m = re.fullmatch(r"MAP\((.+), *(.+)\)", s)
    if m:
        return f"map<{canon_duck(m.group(1))},{canon_duck(m.group(2))}>"
    if s in _DUCK_SCALARS:
        return _DUCK_SCALARS[s]
    return f"other({s})"


def compare_dtypes(sdf, rel):
    """Return list of (col, spark_canon, duck_canon) mismatches."""
    s_types = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
    d_types = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
    bad = []
    for col in sorted(set(s_types) & set(d_types)):
        if s_types[col] != d_types[col]:
            bad.append((col, s_types[col], d_types[col]))
    return bad


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    schema_only = "--schema-only" in argv
    if schema_only:
        argv.remove("--schema-only")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
        if name not in oracles:
            if schema_only:
                print(f"{name:32s} (rows-only, no oracle)")
            else:
                srows = [tuple(r) for r in sdf.collect()]
                print(
                    f"{name:32s} rows={len(srows):7d} (rows-only, no oracle)"
                )
            continue
        rel = con.sql(oracles[name])
        dcols = list(rel.columns)
        ok_cols = sorted(scols) == sorted(dcols)
        type_bad = compare_dtypes(sdf, rel) if ok_cols else []
        if schema_only:
            status = "OK " if (ok_cols and not type_bad) else "FAIL"
            print(
                f"{name:32s} {status} "
                f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
                + (f" dtypes={type_bad}" if type_bad else "")
            )
            failures += 0 if (ok_cols and not type_bad) else 1
            continue
        srows = [tuple(r) for r in sdf.collect()]
        drows = rel.fetchall()
        s_n, d_n = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = s_n == d_n
        ok = ok_cols and ok_vals and not type_bad
        status = "OK " if ok else "FAIL"
        print(
            f"{name:32s} {status} rows={len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
            + (f" dtypes={type_bad}" if type_bad else "")
        )
        if not ok_vals and ok_cols:
            diff_a = [r for r in s_n if r not in set(d_n)][:3]
            diff_b = [r for r in d_n if r not in set(s_n)][:3]
            print(f"   spark-only: {diff_a}\n   duck-only : {diff_b}")
        failures += 0 if ok else 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
