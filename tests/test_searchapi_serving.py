"""_search serving surface beyond the query DSL: the ES-8 knn clause
(pure, filtered, hybrid score-sum with query), highlight and suggest
request keys, search_after cursor paging, and the _count endpoint.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.searchapi import count_api, search
from mongo_es_spark.operators.text import incremental_bm25_index

_DOCS = [
    (1, "spark streaming engine", 100),
    (2, "spark batch engine", 200),
    (3, "flink streaming engine", 300),
    (4, "spark streaming deprecated", 400),
    (5, "pandas dataframe", 500),
    (6, "streaming spark backwards", 600),
    (7, "window sort shuffle", 700),
    (8, "table scan join", 800),
]
_VECS = {
    1: [1.0, 0.0, 0.0],
    2: [0.9, 0.1, 0.0],
    3: [0.0, 1.0, 0.0],
    4: [0.7, 0.7, 0.0],
    5: [0.0, 0.0, 1.0],
    6: [0.5, 0.0, 0.5],
    7: [-1.0, 0.0, 0.0],
    8: [0.6, 0.3, 0.1],
}
_QV = [1.0, 0.0, 0.0]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
        sum(x * x for x in b)
    )
    return round(num / den, 6)


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serving")
    bm = str(base / "bm")
    docs = spark.createDataFrame(
        [(i, t, n, t) for i, t, n in _DOCS],
        "doc_id long, text string, n_chars long, _source string",
    )
    incremental_bm25_index(
        spark, docs, bm, field_cols=["n_chars", "_source"]
    ).count()

    from mongo_es_spark.operators.similarity import materialize_ivf_index

    ivf = str(base / "ivf")
    emb = spark.createDataFrame(
        [(i, v) for i, v in _VECS.items()],
        "vec_id long, v array<double>",
    )
    materialize_ivf_index(emb, "vec_id", "v", ivf, n_cells=2)
    return bm, ivf


def test_knn_pure_topk(spark, stores):
    bm, ivf = stores
    got = search(
        spark, bm, {"knn": {"query_vector": _QV, "k": 3}, "size": 3},
        dense_store=ivf,
    ).collect()
    want = sorted(
        ((i, _cos(v, _QV)) for i, v in _VECS.items()),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [(r["doc"], r["score"]) for r in got] == want


def test_knn_filtered(spark, stores):
    """The filter evaluates on the lexical store's doc values and
    pushes INTO the vector ranking (always k hits when k qualify) —
    the ES filtered-kNN contract, not post-filtering."""
    bm, ivf = stores
    got = search(
        spark, bm,
        {"knn": {
            "query_vector": _QV, "k": 3,
            "filter": {"range": {"n_chars": {"gte": 300}}},
        }, "size": 3},
        dense_store=ivf,
    ).collect()
    allowed = {i for i, _t, n in _DOCS if n >= 300}
    want = sorted(
        ((i, _cos(v, _QV)) for i, v in _VECS.items() if i in allowed),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [(r["doc"], r["score"]) for r in got] == want


def test_knn_hybrid_sums_with_query(spark, stores):
    """query + knn: the union of both hit sets with scores summed —
    pinned against composing the two legs by hand."""
    bm, ivf = stores
    body_q = {"query": {"match": {"text": "spark"}}, "size": 20}
    lex = {
        r["doc"]: r["score"]
        for r in search(spark, bm, body_q).collect()
    }
    knn = {
        i: _cos(v, _QV)
        for i, v in sorted(
            _VECS.items(),
            key=lambda kv: (-_cos(kv[1], _QV), kv[0]),
        )[:3]
    }
    got = search(
        spark, bm,
        {"query": {"match": {"text": "spark"}},
         "knn": {"query_vector": _QV, "k": 3},
         "size": 20},
        dense_store=ivf,
    ).collect()
    want = {
        d: round(lex.get(d, 0.0) + knn.get(d, 0.0), 6)
        for d in set(lex) | set(knn)
    }
    assert {r["doc"]: r["score"] for r in got} == want


def test_knn_boost_and_missing_store(spark, stores):
    bm, ivf = stores
    plain = search(
        spark, bm, {"knn": {"query_vector": _QV, "k": 2}},
        dense_store=ivf,
    ).collect()
    boosted = search(
        spark, bm, {"knn": {"query_vector": _QV, "k": 2, "boost": 2.0}},
        dense_store=ivf,
    ).collect()
    assert [(r["doc"], round(r["score"] / 2.0, 6)) for r in boosted] == [
        (r["doc"], r["score"]) for r in plain
    ]
    with pytest.raises(ValueError, match="dense_store"):
        search(spark, bm, {"knn": {"query_vector": _QV, "k": 2}})


def test_count_api(spark, stores):
    bm, _ivf = stores
    got = count_api(spark, bm, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "filter": [{"range": {"n_chars": {"lte": 400}}}],
        }},
    }).collect()
    assert got[0]["count"] == 3  # docs 1, 2, 4
    # match_all default
    assert count_api(spark, bm, {}).collect()[0]["count"] == len(_DOCS)


def test_search_after_cursor_paging(spark, stores):
    """Two cursor pages == one double-size page, under both the
    default _score sort and a doc-values sort."""
    bm, _ivf = stores
    body = {"query": {"match": {"text": "spark streaming"}}, "size": 2}
    p1 = search(spark, bm, body).collect()
    last = p1[-1]
    p2 = search(
        spark, bm, {**body, "search_after": [last["score"], last["doc"]]}
    ).collect()
    full = search(spark, bm, {**body, "size": 4}).collect()
    assert [(r["doc"], r["score"]) for r in p1 + p2] == [
        (r["doc"], r["score"]) for r in full
    ]

    sbody = {
        "query": {"match": {"text": "spark streaming"}},
        "sort": [{"n_chars": {"order": "desc"}}],
        "fields": ["n_chars"],
        "size": 2,
    }
    s1 = search(spark, bm, sbody).collect()
    s2 = search(
        spark, bm,
        {**sbody, "search_after": [s1[-1]["n_chars"], s1[-1]["doc"]]},
    ).collect()
    sfull = search(spark, bm, {**sbody, "size": 4}).collect()
    assert [r["doc"] for r in s1 + s2] == [r["doc"] for r in sfull]


def test_search_after_validation(spark, stores):
    bm, _ivf = stores
    with pytest.raises(ValueError, match="cannot combine with from"):
        search(spark, bm, {
            "query": {"match": {"text": "spark"}},
            "from": 2,
            "search_after": [1.0, 3],
        }).collect()
    with pytest.raises(ValueError, match="one value per sort key"):
        search(spark, bm, {
            "query": {"match": {"text": "spark"}},
            "search_after": [1.0],
        }).collect()


def test_highlight_in_body(spark, stores):
    """highlight over the returned page's stored text — pinned to the
    standalone highlight_snippets on the same hits."""
    from mongo_es_spark.operators.text import highlight_snippets

    bm, _ivf = stores
    got = search(spark, bm, {
        "query": {"match": {"text": "spark streaming"}},
        "size": 3,
        "highlight": {"fields": {"_source": {}}},
    }).collect()
    assert [c for c in got[0].asDict()] == [
        "doc", "score", "matched_term", "match_pos", "snippet"
    ]
    page = search(spark, bm, {
        "query": {"match": {"text": "spark streaming"}},
        "size": 3,
        "fields": ["_source"],
    })
    want = {
        (r["doc"], r["matched_term"], r["match_pos"], r["snippet"])
        for r in highlight_snippets(
            page, "doc", "_source", ["spark", "streaming"], window=30
        ).collect()
    }
    assert {
        (r["doc"], r["matched_term"], r["match_pos"], r["snippet"])
        for r in got
    } == want
    with pytest.raises(ValueError, match="highlight field"):
        search(spark, bm, {
            "query": {"match": {"text": "spark"}},
            "highlight": {"fields": {"nope": {}}},
        })


def test_suggest_in_body(spark, stores):
    from mongo_es_spark.operators.text import suggest_terms

    bm, _ivf = stores
    got = search(spark, bm, {
        "suggest": {"fix": {
            "text": "sparc streeming",
            "term": {"field": "text", "max_edits": 2, "size": 2},
        }},
    }).collect()
    want = suggest_terms(
        spark, bm, ["sparc", "streeming"], max_dist=2, size=2
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="term suggester"):
        search(spark, bm, {
            "suggest": {"fix": {"text": "x", "phrase": {}}},
        })
