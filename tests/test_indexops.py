"""Query-driven index mutations (ES _update_by_query /
_delete_by_query / _reindex): fields-only updates apply (the
whole-doc noop check), reruns are noops, deletes tombstone through
MVCC, reindex re-analyzes from stored _source.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.indexops import (
    delete_by_query,
    reindex_store,
    update_by_query,
)
from mongo_es_spark.operators.text import (
    bm25_over_store,
    compact_bm25_store,
    facets_over_store,
    incremental_bm25_index,
)

ROWS = [
    ("d1", "Alpha BETA gamma", "en", 10),
    ("d2", "alpha delta", "en", 20),
    ("d3", "beta epsilon", "fr", 30),
    ("d4", "zeta", "fr", 40),
]


def _build(spark, path: str) -> None:
    df = spark.createDataFrame(
        ROWS, "doc_id string, text string, lang string, n_chars long"
    ).withColumn("_source", F.col("text"))
    incremental_bm25_index(
        spark, df, path,
        field_cols=["lang", "n_chars", "_source"],
    ).count()


def test_update_by_query_fields_only(spark, tmp_path):
    store = str(tmp_path / "s")
    _build(spark, store)
    # the raw store is case-sensitive: 'beta' matches d3 only (d1
    # holds 'BETA')
    applied = update_by_query(
        spark, store, ["beta"], {"lang": F.lit("xx")}
    )
    assert applied.count() == 1
    got = {
        r["lang"]: r["n_docs"]
        for r in facets_over_store(
            spark, store, ["Alpha", "alpha", "beta", "zeta"], "lang"
        ).collect()
    }
    assert got == {"en": 2, "xx": 1, "fr": 1}
    # rerun is a full noop — nothing applied, nothing written
    again = update_by_query(
        spark, store, ["beta"], {"lang": F.lit("xx")}
    )
    assert again.count() == 0


def test_update_by_query_rewrites_source(spark, tmp_path):
    store = str(tmp_path / "s")
    _build(spark, store)
    # docs matching 'alpha' (d2 only: raw store is case-sensitive)
    # get their text suffixed -> postings re-derive
    applied = update_by_query(
        spark, store, ["alpha"],
        {"_source": F.concat(F.col("_source"), F.lit(" omega"))},
    )
    assert applied.count() == 1
    hits = {
        r["doc"]
        for r in bm25_over_store(
            spark, store, ["omega"], top_k=10
        ).collect()
    }
    assert hits == {"d2"}


def test_update_script_validation(spark, tmp_path):
    store = str(tmp_path / "s")
    _build(spark, store)
    with pytest.raises(ValueError, match="non-stored columns"):
        update_by_query(spark, store, ["alpha"], {"nope": F.lit(1)})


def test_delete_by_query_and_replay(spark, tmp_path):
    store = str(tmp_path / "s")
    _build(spark, store)
    assert delete_by_query(spark, store, ["beta"]).count() == 1  # d3
    live = {
        r["lang"]
        for r in facets_over_store(
            spark, store,
            ["Alpha", "alpha", "epsilon", "zeta"], "lang",
        ).collect()
    }
    # d3 (fr, epsilon) is gone; d4 (fr, zeta) keeps fr alive
    assert live == {"en", "fr"}
    docs = {
        r["doc"]
        for r in bm25_over_store(
            spark, store, ["epsilon"], top_k=10
        ).collect()
    }
    assert docs == set()
    # delete replay: nothing applies
    assert delete_by_query(spark, store, ["beta"]).count() == 0
    # survives compaction
    compact_bm25_store(spark, store)
    assert bm25_over_store(
        spark, store, ["epsilon"], top_k=10
    ).count() == 0


def test_delete_by_query_match_all(spark, tmp_path):
    store = str(tmp_path / "s")
    _build(spark, store)
    assert delete_by_query(
        spark, store, [], match_all=True
    ).count() == 4
    assert bm25_over_store(
        spark, store, ["alpha"], top_k=10
    ).count() == 0


def test_reindex_reanalyzes(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _build(spark, src)
    n = reindex_store(spark, src, dst, analyzer="standard")
    assert n == 4
    # the standard chain folds case: the cased query now matches the
    # docs whose raw text said 'Alpha' / 'BETA'
    hits = {
        r["doc"]
        for r in bm25_over_store(
            spark, dst, ["ALPHA"], top_k=10
        ).collect()
    }
    assert hits == {"d1", "d2"}
    # the raw source store is untouched and still case-sensitive
    raw = {
        r["doc"]
        for r in bm25_over_store(
            spark, src, ["ALPHA"], top_k=10
        ).collect()
    }
    assert raw == set()


def test_source_required(spark, tmp_path):
    store = str(tmp_path / "nosrc")
    df = spark.createDataFrame(
        ROWS, "doc_id string, text string, lang string, n_chars long"
    )
    incremental_bm25_index(
        spark, df, store, field_cols=["lang"]
    ).count()
    with pytest.raises(ValueError, match="_source"):
        update_by_query(spark, store, ["alpha"], {"lang": F.lit("x")})
    with pytest.raises(ValueError, match="_source"):
        reindex_store(spark, store, str(tmp_path / "d"))


def test_pit_generations(spark, tmp_path):
    """PIT reads resolve to each generation's state; compaction
    reclaims superseded rows (the keep-alive expiry)."""
    from mongo_es_spark.operators.text import (
        bm25_over_store_pit,
        current_generation,
    )

    store = str(tmp_path / "s")
    _build(spark, store)
    assert current_generation(spark, store) == 0

    # gen 1: delete d3; gen 2: rewrite d2
    delete_by_query(spark, store, ["beta"]).count()  # d3
    g1 = current_generation(spark, store)
    update_by_query(
        spark, store, ["alpha"],
        {"_source": F.concat(F.col("_source"), F.lit(" omega"))},
    ).count()  # d2
    assert current_generation(spark, store) == g1 + 1

    def hits(term, gen):
        return {
            r["doc"]
            for r in bm25_over_store_pit(
                spark, store, [term], gen=gen, top_k=10
            ).collect()
        }

    # gen 0: everything pre-mutation
    assert hits("epsilon", 0) == {"d3"}
    assert hits("omega", 0) == set()
    # gen 1: d3 dead, d2 not yet rewritten
    assert hits("epsilon", g1) == set()
    assert hits("omega", g1) == set()
    # gen 2 == live
    assert hits("omega", g1 + 1) == {"d2"}

    # compaction reclaims superseded generations: PIT 0 now equals
    # the live view (snapshot expired), never a resurrected doc
    from mongo_es_spark.operators.text import compact_bm25_store

    compact_bm25_store(spark, store)
    assert hits("epsilon", 0) == set()
