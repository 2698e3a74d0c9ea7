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


def _leaf_counts(spark, agg_store):
    """Brute-force (lang, bucket100) -> count from docstats."""
    docstats = spark.read.parquet(agg_store + "/docstats")
    out = {}
    for r in (
        docstats.filter(F.col("lang").isNotNull())
        .select("lang", (F.floor(F.col("n_chars") / 100) * 100).alias("b"))
        .groupBy("lang", "b")
        .count()
        .collect()
    ):
        out[(r["lang"], float(r["b"]))] = r["count"]
    return out


def test_pipeline_cumsum_derivative(spark, agg_store):
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"b": {
                "histogram": {"field": "n_chars", "interval": 100.0},
                "aggs": {
                    "cum": {"cumulative_sum": {"buckets_path": "n_docs"}},
                    "dlt": {"derivative": {"buckets_path": "n_docs"}},
                }}}}},
    ).collect()
    want = _leaf_counts(spark, agg_store)
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows = sorted(rows, key=lambda r: r["b"])
        run, prev = 0, None
        for r in rows:
            assert r["n_docs"] == want[(lang, r["b"])]
            run += r["n_docs"]
            assert r["cum"] == run
            if prev is None:
                assert r["dlt"] is None
            else:
                assert r["dlt"] == r["n_docs"] - prev
            prev = r["n_docs"]


def test_moving_fn_window_excludes_current(spark, agg_store):
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
            "aggs": {"ma": {"moving_fn": {
                "buckets_path": "n_docs", "window": 2}}}}},
    ).collect()
    rows = sorted(got, key=lambda r: r["b"])
    hist = [r["n_docs"] for r in rows]
    for i, r in enumerate(rows):
        prev = hist[max(0, i - 2):i]  # ES shift=0: strictly before
        if not prev:
            assert r["ma"] is None
        else:
            assert abs(r["ma"] - sum(prev) / len(prev)) < 1e-9


def test_bucket_selector_then_sort(spark, agg_store):
    # selector prunes < 10-doc buckets, THEN derivative walks the
    # pruned sequence (spec order), THEN bucket_sort keeps top-2
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
            "aggs": {
                "keep": {"bucket_selector": {
                    "buckets_path": "n_docs", "gte": 10}},
                "dlt": {"derivative": {"buckets_path": "n_docs"}},
                "top": {"bucket_sort": {
                    "buckets_path": "n_docs", "size": 2}},
            }}},
    ).collect()
    base = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0}}},
    ).collect()
    kept = sorted(
        [(r["b"], r["n_docs"]) for r in base if r["n_docs"] >= 10],
        key=lambda t: t[0],
    )
    top2 = sorted(kept, key=lambda t: (-t[1], t[0]))[:2]
    assert sorted((r["b"], r["n_docs"]) for r in got) == sorted(top2)
    # derivative over the PRUNED sequence: check one surviving row
    # whose pruned-predecessor differs from its unpruned predecessor
    seq = {b: n for b, n in kept}
    for r in got:
        idx = [b for b, _n in kept].index(r["b"])
        if idx == 0:
            assert r["dlt"] is None
        else:
            assert r["dlt"] == r["n_docs"] - kept[idx - 1][1]


def test_sibling_pipeline_avg_and_stats_bucket(spark, agg_store):
    # the canonical ES shape: avg_bucket/stats_bucket beside the
    # deepest bucket node, reducing its buckets per parent prefix
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {
                "b": {"histogram": {"field": "n_chars",
                                    "interval": 100.0},
                      "aggs": {"mx": {"max": {"field": "n_chars"}}}},
                "avg_n": {"avg_bucket": {"buckets_path": "b>_count"}},
                "st": {"stats_bucket": {"buckets_path": "b>mx"}},
            }}},
    ).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        ns = [r["n_docs"] for r in rows]
        mxs = [r["mx"] for r in rows]
        for r in rows:
            # constant within the parent prefix, the ES one-value-
            # per-parent response flattened
            assert abs(r["avg_n"] - sum(ns) / len(ns)) < 1e-9
            assert r["st_count"] == len(mxs)
            assert r["st_min"] == min(mxs)
            assert r["st_max"] == max(mxs)
            assert r["st_sum"] == sum(mxs)
            assert abs(r["st_avg"] - sum(mxs) / len(mxs)) < 1e-9


def test_sibling_pipeline_runs_after_truncation(spark, agg_store):
    # size truncation first, THEN the sibling reduces the RETURNED
    # buckets (ES evaluation order)
    full = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0}}},
    ).collect()
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
               "aggs": {
                   "top": {"bucket_sort": {
                       "buckets_path": "n_docs", "size": 3}},
               }},
         "sum_n": {"sum_bucket": {"buckets_path": "b>_count"}}},
    ).collect()
    kept = sorted(
        [(r["b"], r["n_docs"]) for r in full],
        key=lambda t: (-t[1], t[0]),
    )[:3]
    want = sum(n for _b, n in kept)
    assert len(got) == 3
    for r in got:
        assert r["sum_n"] == want


def test_sibling_pipeline_deepest_only(spark, agg_store):
    with pytest.raises(ValueError, match="deepest"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"lang": {"terms": {"field": "lang"},
                "aggs": {"b": {"histogram": {
                    "field": "n_chars", "interval": 100.0}}}},
             "bad": {"avg_bucket": {"buckets_path": "lang>_count"}}},
        ).collect()


def test_agg_forest_union_long_schema(spark, agg_store):
    from mongo_es_spark.operators.aggs import agg_forest_over_store

    got = agg_forest_over_store(
        spark, agg_store, ["alpha"],
        {"langs": {"terms": {"field": "lang"},
                   "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}},
         "hist": {"histogram": {"field": "n_chars",
                                "interval": 200.0}}},
    )
    rows = got.collect()
    assert got.columns == ["agg", "key", "n_docs", "metric", "value"]
    # subtree 1 matches the single-tree run, long-ified
    single = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"langs": {"terms": {"field": "lang"},
                   "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}}},
    ).collect()
    want1 = {
        (r["langs"], r["n_docs"], round(r["avg_c"], 6)) for r in single
    }
    got1 = {
        (r["key"], r["n_docs"], round(r["value"], 6))
        for r in rows
        if r["agg"] == "langs"
    }
    assert got1 == want1
    # subtree 2 (no metric leaves) emits _count rows
    hist = [r for r in rows if r["agg"] == "hist"]
    assert hist and all(r["metric"] == "_count" for r in hist)
    assert all(r["value"] == float(r["n_docs"]) for r in hist)


def test_agg_forest_one_matched_scan(spark, agg_store):
    """The forest must not rescan the corpus per subtree: the matched
    frame materializes once (localCheckpoint) and the per-subtree
    plans read the cached blocks — no postings/docstats file scan in
    the final plan."""
    from mongo_es_spark.operators.aggs import agg_forest_over_store

    q = agg_forest_over_store(
        spark, agg_store, ["alpha"],
        {"a": {"terms": {"field": "lang"}},
         "b": {"histogram": {"field": "n_chars", "interval": 100.0}}},
    )
    plan = _plan_of(q)
    assert len(re.findall(r"Location.*/postings", plan)) == 0
    assert len(re.findall(r"Location.*/docstats", plan)) == 0


def test_cardinality_metric(spark, agg_store):
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"range": {"field": "n_chars",
                         "ranges": [(None, 300), (300, None)]},
            "aggs": {"nl": {"cardinality": {"field": "lang"}}}}},
    ).collect()
    docstats = spark.read.parquet(agg_store + "/docstats")
    want = {
        r["c"]: r["nl"]
        for r in docstats.select(
            F.when(F.col("n_chars") < 300, "*-300")
            .otherwise("300-*")
            .alias("c"),
            "lang",
        )
        .groupBy("c")
        .agg(F.countDistinct("lang").alias("nl"))
        .collect()
    }
    assert {r["b"]: r["nl"] for r in got} == want


def test_pipeline_validation(spark, agg_store):
    with pytest.raises(ValueError, match="buckets_path"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
                "aggs": {"c": {"cumulative_sum": {
                    "buckets_path": "nope"}}}}},
        )
    with pytest.raises(ValueError, match="needs a bound"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
                "aggs": {"c": {"bucket_selector": {
                    "buckets_path": "n_docs"}}}}},
        )
    with pytest.raises(ValueError, match="exactly one of"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"b": {"histogram": {"field": "n_chars", "interval": 100.0},
                "aggs": {"c": {
                    "cumulative_sum": {"buckets_path": "n_docs"},
                    "derivative": {"buckets_path": "n_docs"},
                }}}},
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


def test_cardinality_certified(spark, agg_store):
    from mongo_es_spark.operators.aggs import (
        cardinality_certified_over_store,
    )

    row = cardinality_certified_over_store(
        spark, agg_store, ["alpha"], "n_chars", rsd=0.02
    ).head()
    exact = (
        spark.read.parquet(agg_store + "/docstats")
        .select("n_chars")
        .distinct()
        .count()
    )
    assert row["n_exact"] == exact
    assert row["hll_ok"] is True


def test_terms_missing_bucket(spark, agg_store):
    """ES `missing`: null keys land in the sentinel bucket instead of
    dropping; without it they drop (the default)."""
    base = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"}}},
    ).collect()
    with_missing = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang", "missing": "(none)"}}},
    ).collect()
    langs = {r["lang"]: r["n_docs"] for r in with_missing}
    assert "(none)" in langs and langs["(none)"] > 0
    # non-null buckets unchanged
    for r in base:
        assert langs[r["lang"]] == r["n_docs"]
    docstats = spark.read.parquet(agg_store + "/docstats")
    n_null = docstats.filter(F.col("lang").isNull()).count()
    assert langs["(none)"] == n_null


def test_min_doc_count_before_size(spark, agg_store):
    """min_doc_count drops buckets under the floor BEFORE size picks
    the top — a small bucket can never ride in on size."""
    full = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0}}},
    ).collect()
    floor = 12
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0,
                             "min_doc_count": floor}}},
    ).collect()
    want = {(r["b"], r["n_docs"]) for r in full if r["n_docs"] >= floor}
    assert {(r["b"], r["n_docs"]) for r in got} == want
    # nested: floor applies per parent prefix at its own level
    got2 = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"b": {"histogram": {
                "field": "n_chars", "interval": 100.0,
                "min_doc_count": 8}}}}},
    ).collect()
    for r in got2:
        assert r["n_docs"] >= 8


def test_terms_order_picks_size_keepers(spark, agg_store):
    """ES terms `order`: _key desc, _count asc, and a deepest-level
    metric order each decide which buckets size keeps."""
    full = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"},
                  "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}}},
    ).collect()
    by_key = sorted(full, key=lambda r: r["lang"], reverse=True)[:2]
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang", "size": 2,
                            "order": {"_key": "desc"}},
                  "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}}},
    ).collect()
    assert {r["lang"] for r in got} == {r["lang"] for r in by_key}
    by_metric = sorted(
        full, key=lambda r: (-r["avg_c"], r["lang"])
    )[:2]
    got2 = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang", "size": 2,
                            "order": {"avg_c": "desc"}},
                  "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}}},
    ).collect()
    assert {r["lang"] for r in got2} == {r["lang"] for r in by_metric}
    # metric order on a non-deepest level raises with a pointer
    with pytest.raises(ValueError, match="non-deepest"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"lang": {"terms": {"field": "lang", "size": 2,
                                "order": {"avg_c": "desc"}},
                "aggs": {"b": {"histogram": {
                    "field": "n_chars", "interval": 100.0},
                    "aggs": {"avg_c": {"avg": {
                        "field": "n_chars"}}}}}}},
        ).collect()


def test_histogram_zero_fill_and_extended_bounds(spark, agg_store):
    """min_doc_count=0: every interval step between the bounds exists
    as a bucket — empty ones at n_docs 0, additive metrics 0, others
    NULL; a derivative then walks the gapless sequence."""
    got = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"b": {"histogram": {"field": "n_chars", "interval": 100.0,
                             "min_doc_count": 0,
                             "extended_bounds": {"min": -200,
                                                 "max": 800}},
               "aggs": {"s": {"sum": {"field": "n_chars"}},
                        "mx": {"max": {"field": "n_chars"}},
                        "dlt": {"derivative": {
                            "buckets_path": "n_docs"}}}}},
    ).collect()
    keys = [r["b"] for r in got]
    assert keys == [float(x) for x in range(-200, 801, 100)]
    empt = {r["b"]: r for r in got if r["n_docs"] == 0}
    assert -200.0 in empt and -100.0 in empt
    assert empt[-200.0]["s"] == 0 and empt[-200.0]["mx"] is None
    # derivative sees the zero buckets: at the first real bucket the
    # delta is n_docs - 0
    rows = sorted(got, key=lambda r: r["b"])
    for i, r in enumerate(rows[1:], 1):
        assert r["dlt"] == r["n_docs"] - rows[i - 1]["n_docs"]
    # nested under terms: per-parent spine
    got2 = agg_tree_over_store(
        spark, agg_store, ["alpha"],
        {"lang": {"terms": {"field": "lang"},
            "aggs": {"b": {"histogram": {
                "field": "n_chars", "interval": 100.0,
                "min_doc_count": 0}}}}},
    ).collect()
    per = {}
    for r in got2:
        per.setdefault(r["lang"], []).append(r["b"])
    for lang, ks in per.items():
        ks = sorted(ks)
        assert ks == [ks[0] + 100.0 * i for i in range(len(ks))], lang
    # non-deepest zero-fill raises
    with pytest.raises(ValueError, match="deepest"):
        agg_tree_over_store(
            spark, agg_store, ["alpha"],
            {"b": {"histogram": {"field": "n_chars",
                                 "interval": 100.0,
                                 "min_doc_count": 0},
                   "aggs": {"lang": {"terms": {
                       "field": "lang"}}}}},
        ).collect()
