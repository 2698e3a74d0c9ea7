"""Recursive bucket→agg planner: one-pass plan contract (the whole
tree = one postings scan + one docstats scan regardless of depth),
per-parent terms-size truncation, equivalence with the flat per-shape
helpers on single-level specs, spec validation.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.aggs import agg_tree_over_store
from mongo_es_spark.operators.text import (
    facets_over_store,
    incremental_bm25_index,
)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def agg_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("aggtree") / "bm")
    rows = []
    langs = ["en", "fr", "de", "es"]
    for i in range(120):
        rows.append(
            (
                i,
                "alpha beta" if i % 2 == 0 else "alpha gamma",
                langs[i % 4] if i % 10 != 9 else None,  # some null langs
                50 + (i * 13) % 500,
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    incremental_bm25_index(
        spark, df, store, field_cols=["lang", "n_chars"]
    ).count()
    return store


def test_one_pass_regardless_of_depth(spark, agg_store):
    q = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang", "size": 3},
            "aggs": {"bucket": {
                "histogram": {"field": "n_chars", "interval": 100.0},
                "aggs": {"mx": {"max": {"field": "n_chars"}}}}}}},
    )
    plan = _plan_of(q)
    assert len(re.findall(r"Location.*/postings", plan)) == 1
    assert len(re.findall(r"Location.*/docstats", plan)) == 1
    rows = q.collect()
    assert len(rows) > 0
    assert list(rows[0].asDict()) == ["lang", "bucket", "n_docs", "mx"]


def test_per_parent_size_truncation(spark, agg_store):
    # terms(lang, size=2) under range buckets: the kept langs must be
    # the per-RANGE top-2 by count, not a global top-2
    q = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"c": {"range": {"field": "n_chars",
                         "ranges": [(None, 300), (300, None)]},
            "aggs": {"lang": {"terms": {"field": "lang", "size": 2}}}}},
    )
    got = [(r["c"], r["lang"], r["n_docs"]) for r in q.collect()]
    per_parent = {}
    for c, lang, n in got:
        per_parent.setdefault(c, []).append((lang, n))
    assert set(per_parent) == {"*-300", "300-*"}
    for c, pairs in per_parent.items():
        assert len(pairs) == 2
    # brute-force expectation from the raw frame
    docstats = spark.read.parquet(agg_store + "/docstats")
    base = docstats.filter(F.col("lang").isNotNull()).select(
        F.when(F.col("n_chars") < 300, "*-300")
        .otherwise("300-*")
        .alias("c"),
        "lang",
    )
    want = {}
    for r in base.groupBy("c", "lang").count().collect():
        want.setdefault(r["c"], []).append((r["lang"], r["count"]))
    for c in want:
        top2 = sorted(want[c], key=lambda t: (-t[1], t[0]))[:2]
        assert sorted(per_parent[c]) == sorted(top2), c


def test_single_level_matches_flat_facets(spark, agg_store):
    tree = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"}}},
    )
    got = sorted((r["lang"], r["n_docs"]) for r in tree.collect())
    flat = sorted(
        (r["lang"], r["n_docs"])
        for r in facets_over_store(
            spark, agg_store, ["alpha"], "lang"
        ).collect()
        if r["lang"] is not None  # planner drops null keys (ES default)
    )
    assert got == flat and len(got) == 4


def test_null_keys_drop_at_their_level(spark, agg_store):
    rows = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"}}},
    ).collect()
    assert all(r["lang"] is not None for r in rows)
    # 12 docs have null lang out of 120
    assert sum(r["n_docs"] for r in rows) == 108


def test_spec_validation(spark, agg_store):
    with pytest.raises(ValueError, match="one bucket node"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"a": {"terms": {"field": "lang"}},
             "b": {"terms": {"field": "lang"}}},
        )
    with pytest.raises(ValueError, match="exactly one metric"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"lang": {"terms": {"field": "lang"},
                "aggs": {"bad": {"nonsense": {}}}}},
        )
    with pytest.raises(ValueError, match="at least one bucket"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"m": {"sum": {"field": "n_chars"}}},
        )
    with pytest.raises(ValueError, match="calendar interval"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"d": {"date_histogram": {"field": "day",
                                      "interval": "minute"}}},
        )


def test_geotile_bucket_nests(spark, tmp_path):
    """geotile as a planner bucket source: terms(lang) → geotile —
    the heat-map-per-language composition."""
    from mongo_es_spark.operators.geo import geotile_key_cols

    store = str(tmp_path / "bmgeo")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("point").alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
        ((F.col("id") % 180) - 90 + F.lit(0.5)).cast("double").alias("lat"),
        ((F.col("id") * 7 % 360) - 180 + F.lit(0.5)).cast("double").alias("lon"),
    )
    incremental_bm25_index(
        spark, df, store, field_cols=["lang", "lat", "lon"]
    ).count()
    got = agg_tree_over_store(
        spark, store, ["point"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"tile": {"geotile": {"zoom": 2}}}}},
    ).collect()
    assert sum(r["n_docs"] for r in got) == 100
    # brute force from doc values
    want = (
        spark.read.parquet(store + "/docstats")
        .select("lang", geotile_key_cols(2, "lat", "lon").alias("tile"))
        .groupBy("lang", "tile")
        .count()
        .collect()
    )
    assert sorted((r["lang"], r["tile"], r["n_docs"]) for r in got) == sorted(
        (r["lang"], r["tile"], r["count"]) for r in want
    )
