"""Analyzer chain: cross-engine equality (Spark column expression vs
DuckDB SQL twin vs Python twin), analyzed-store end-to-end behavior
("SPARK finds spark"), analyzer drift guards, and the
MVCC rebuilt==mutated contract under a non-default analyzer.

Reference parity: the ES mapping's per-field analyzer declaration
(``examples/config.json:64-66`` — ``"analyzer": "ik_max_word"``)
means index-time and query-time analysis share one chain; these tests
pin that the repo's chain is one pipeline applied at both ends.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.analysis import ANALYZERS, get_analyzer
from mongo_es_spark.operators.text import (
    analyze_store_terms,
    apply_cdc_to_bm25_index,
    bm25_over_store,
    bool_search_over_store,
    facets_over_store,
    incremental_bm25_index,
    phrase_over_store,
    store_analyzer,
)

# a Unicode gauntlet: case, ASCII + Unicode punctuation/symbols,
# accents, CJK, padding, degenerate all-separator and empty strings
SAMPLE = [
    "Hello, World!",
    "SPARK—fast… really?",
    "!!!",
    "",
    "  pad  me  ",
    "café ÉCOLE näive",
    "a+b=c $100 50%",
    "foo_bar x2",
    "日本語、テスト。",
    "The quick (brown) fox; AND the dog.",
    "tab\tand\nnewline",
    "Ñoño's piñata",
    # stemmer gauntlet: every porter-lite rule + the cascade + the
    # s/u plural guards ('kiss' must not re-strip, 'status' keeps us)
    "tables kisses queries running sorted meetings used status THINGS",
    # CJK bigram gauntlet: pure-han runs (bigram), a single ideograph
    # (passes through), katakana + mixed latin-han (pass through)
    "中文分词 中 中文abc データ Spark与中文",
]


@pytest.mark.parametrize("name", sorted(ANALYZERS))
def test_three_forms_agree(spark, name):
    """Spark column form == DuckDB SQL twin == Python twin, per
    analyzer, over the Unicode gauntlet."""
    an = get_analyzer(name)
    df = spark.createDataFrame([(s,) for s in SAMPLE], "s string")
    got_spark = [
        r["t"]
        for r in df.select(an.tokens_col(F.col("s")).alias("t")).collect()
    ]
    con = duckdb.connect()
    rel = con.execute(
        f"SELECT {an.duckdb_tokens_sql('s')} AS t FROM df_v",
        # DuckDB parameter binding doesn't cover table functions;
        # register the sample as a view instead
    ) if False else None
    con.register(
        "df_v",
        __import__("pandas").DataFrame({"s": SAMPLE}),
    )
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {an.duckdb_tokens_sql('s')} AS t FROM df_v"
        ).fetchall()
    ]
    got_py = [an.analyze_text(s) for s in SAMPLE]
    assert got_spark == got_py, name
    assert got_duck == got_py, name


@pytest.mark.parametrize("name", sorted(ANALYZERS))
def test_nonnull_text_always_tokenizes(spark, name):
    """The CDC fold invariant: every NON-NULL text analyzes to ≥1
    token (degenerate analyses pad to [''])."""
    an = get_analyzer(name)
    for s in SAMPLE:
        toks = an.analyze_text(s)
        assert isinstance(toks, list) and len(toks) >= 1, (name, s)
    assert an.analyze_text(None) is None


def test_analyze_terms_idempotent_and_drops_pad():
    an = get_analyzer("standard")
    once = an.analyze_terms(["The QUICK fox!", "!!!", "a+b"])
    assert once == ["the", "quick", "fox", "a", "b"]
    assert an.analyze_terms(once) == once
    stop = get_analyzer("standard_stop")
    assert stop.analyze_terms(["The AND of"]) == []
    fold = get_analyzer("standard_fold")
    assert fold.analyze_terms(["Café ÉCOLE"]) == ["cafe", "ecole"]


def _mixed_docs(spark):
    rows = [
        (1, "Spark Engine runs FAST queries", "en"),
        (2, "the SPARK engine — fast, scalable!", "en"),
        (3, "slow mongo pipeline", "en"),
        (4, "Fast CAFÉ reviews", "fr"),
        (5, "unrelated text entirely", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_analyzed_store_case_insensitive_search(spark, tmp_path):
    """Day-one user contract: on a standard-analyzed store, 'SPARK'
    matches documents containing 'Spark' / 'spark' / 'SPARK', and
    punctuation never splits retrieval."""
    store = str(tmp_path / "an_store")
    incremental_bm25_index(
        spark, _mixed_docs(spark), store,
        field_cols=["lang"], analyzer="standard",
    ).count()
    assert store_analyzer(spark, store).name == "standard"
    hits = {r["doc"] for r in bm25_over_store(spark, store, ["SPARK"]).collect()}
    assert hits == {1, 2}
    # mixed-case multi-term query, analyzed at query time
    assert analyze_store_terms(spark, store, ["FAST", "Queries!"]) == [
        "fast", "queries",
    ]
    hits = {r["doc"] for r in bm25_over_store(spark, store, ["FAST"]).collect()}
    assert hits == {1, 2, 4}
    # phrase across case+punct variants: "spark engine" matches doc 1
    # ("Spark Engine runs") and doc 2 ("SPARK engine — fast")
    ph = {r["doc"] for r in phrase_over_store(spark, store, ["Spark", "ENGINE"]).collect()}
    assert ph == {1, 2}
    # facets over the analyzed match set
    fc = {
        (r["lang"], r["n_docs"])
        for r in facets_over_store(spark, store, ["Fast"], "lang").collect()
    }
    assert fc == {("en", 2), ("fr", 1)}
    # bool: must SPARK, must_not Mongo
    bl = {
        r["doc"]
        for r in bool_search_over_store(
            spark, store, must=["SPARK"], must_not=["MONGO?"]
        ).collect()
    }
    assert bl == {1, 2}


def test_case_sensitive_on_whitespace_store(spark, tmp_path):
    """Legacy stores keep the raw chain: term analysis is identity,
    so 'SPARK' does NOT match 'spark' (the pre-analyzer contract the
    199 existing oracles pin)."""
    store = str(tmp_path / "ws_store")
    incremental_bm25_index(spark, _mixed_docs(spark), store).count()
    assert store_analyzer(spark, store).name == "whitespace"
    assert bm25_over_store(spark, store, ["SPARK"]).count() == 1  # doc 2 only
    assert analyze_store_terms(spark, store, ["SPARK!"]) == ["SPARK!"]


def test_analyzer_drift_guard(spark, tmp_path):
    """Folding with a different analyzer than the store's raises —
    mixed chains index garbage silently (the tokenizer-scheme guard
    extended to analysis)."""
    store = str(tmp_path / "drift_store")
    incremental_bm25_index(
        spark, _mixed_docs(spark), store, analyzer="standard"
    ).count()
    more = spark.createDataFrame(
        [(10, "new doc", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="analyzer"):
        incremental_bm25_index(spark, more, store, analyzer="whitespace")
    with pytest.raises(ValueError, match="analyzer"):
        apply_cdc_to_bm25_index(
            spark,
            more.withColumn("op", F.lit("i")),
            store,
            analyzer="lowercase",
        )


def test_cdc_preserves_analyzer_and_matches_rebuild(spark, tmp_path):
    """CDC folds inherit the store's analyzer from params (no
    explicit arg), and the mutated store serves identically to a
    fresh rebuild of the post-CDC corpus — the rebuilt==mutated
    contract under a non-default analyzer, including a punct-only
    update (analyzes to [''], must behave like the raw chain's
    empty-text case, NOT as a tombstone)."""
    store = str(tmp_path / "cdc_an")
    incremental_bm25_index(
        spark, _mixed_docs(spark), store, analyzer="standard"
    ).count()
    batch = spark.createDataFrame(
        [
            (2, "Mongo REPLACED the spark text", "i"),
            (3, None, "d"),
            (6, "Brand NEW: Spark-Doc!", "i"),
            (4, "!!!", "i"),  # degenerate: analyzes to ['']
        ],
        "doc_id long, text string, op string",
    )
    applied = apply_cdc_to_bm25_index(spark, batch, store)
    assert applied.count() == 4
    assert store_analyzer(spark, store).name == "standard"
    post_corpus = spark.createDataFrame(
        [
            (1, "Spark Engine runs FAST queries"),
            (2, "Mongo REPLACED the spark text"),
            (5, "unrelated text entirely"),
            (6, "Brand NEW: Spark-Doc!"),
            (4, "!!!"),
        ],
        "doc_id long, text string",
    )
    rebuilt = str(tmp_path / "cdc_an_rebuilt")
    incremental_bm25_index(
        spark, post_corpus, rebuilt, analyzer="standard"
    ).count()
    for terms in (["SPARK"], ["Doc"], ["Mongo", "text"]):
        got = sorted(
            map(tuple, bm25_over_store(spark, store, terms, top_k=100).collect())
        )
        want = sorted(
            map(tuple, bm25_over_store(spark, rebuilt, terms, top_k=100).collect())
        )
        assert got == want, terms


def test_duckdb_twin_matches_store_postings(spark, tmp_path):
    """The DuckDB SQL twin re-derives the store's exact postings for
    the standard chain — the mechanism every analyzed-store registry
    oracle relies on."""
    import pandas as pd

    store = str(tmp_path / "twin_store")
    docs = _mixed_docs(spark)
    incremental_bm25_index(spark, docs, store, analyzer="standard").count()
    got = (
        spark.read.parquet(store + "/postings")
        .groupBy("token")
        .agg(F.sum("tf").alias("tf"))
        .orderBy("token")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs_v", docs.toPandas())
    an = get_analyzer("standard")
    want = con.execute(
        f"""
        SELECT t AS token, count(*)::bigint AS tf
        FROM (SELECT unnest({an.duckdb_tokens_sql('text')}) AS t FROM docs_v)
        GROUP BY 1 ORDER BY 1
        """
    ).fetch_df()
    assert list(got["token"]) == list(want["token"])
    assert list(got["tf"]) == list(want["tf"])


def test_match_over_store_free_text(spark, tmp_path):
    """ES match: free text analyzed through the store's chain; raw
    whitespace stores still split the string; a query analyzing to
    nothing returns empty (the zero-terms NONE behavior)."""
    from mongo_es_spark.operators.text import match_over_store

    an_store = str(tmp_path / "an")
    incremental_bm25_index(
        spark, _mixed_docs(spark), an_store, analyzer="standard"
    ).count()
    hits = {
        r["doc"]
        for r in match_over_store(
            spark, an_store, "SPARK engine!!"
        ).collect()
    }
    assert hits == {1, 2}  # both terms analyze and match docs 1, 2
    ws_store = str(tmp_path / "ws")
    incremental_bm25_index(spark, _mixed_docs(spark), ws_store).count()
    ws_hits = {
        r["doc"]
        for r in match_over_store(spark, ws_store, "spark engine").collect()
    }
    # raw store stays case-sensitive: only doc 2 has lowercase 'engine'
    assert ws_hits == {2}
    assert match_over_store(spark, an_store, "!!! ???").count() == 0


def test_stemmer_rule_semantics():
    """Pin the porter-lite outputs themselves (the three-form test
    only proves the engines agree, not that the rules are right)."""
    an = get_analyzer("standard_stem")
    got = an.analyze_text(
        "tables kisses queries running sorted meetings used status dress"
    )
    assert got == [
        "table",   # plural -s
        "kiss",    # sses -> ss, and the ss guard stops re-stripping
        "queri",   # ies -> i
        "runn",    # -ing, stem >= 3
        "sort",    # -ed, stem >= 2
        "meet",    # cascade: -s then -ing in ONE pass
        "us",      # -ed; the u guard then keeps 'us' stable
        "status",  # -us never strips
        "dress",   # ss guard
    ]
    # idempotent: re-analyzing analyzed output is a no-op (the
    # analyze_terms contract layered entry points rely on)
    assert [an.analyze_text(w)[0] for w in got] == got


def test_cjk_bigram_semantics():
    an = get_analyzer("cjk_bigram")
    assert an.analyze_text("中文分词测试") == [
        "中文", "文分", "分词", "词测", "测试"
    ]
    # single ideograph, katakana, mixed latin-han: pass through whole
    assert an.analyze_text("中 データ spark与中文") == [
        "中", "データ", "spark与中文"
    ]
    # idempotent: bigrams are length-2 CJK tokens -> themselves
    assert an.analyze_text("中文") == ["中文"]


def test_stemmed_store_search_end_to_end(spark, tmp_path):
    """'Streaming' finds 'streams' through a standard_stem store —
    index-time and query-time stemming are one pipeline."""
    store = str(tmp_path / "stem")
    df = spark.createDataFrame(
        [("d1", "spark streams fast"), ("d2", "sorted tables here"),
         ("d3", "nothing relevant")],
        "doc_id string, text string",
    )
    incremental_bm25_index(
        spark, df, store, analyzer="standard_stem"
    ).count()
    hits = {
        r["doc"]
        for r in bm25_over_store(
            spark, store, ["Streaming", "table"], top_k=10
        ).collect()
    }
    assert hits == {"d1", "d2"}
