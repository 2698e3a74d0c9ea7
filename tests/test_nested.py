"""ES nested + parent-child (join-field) queries over the store:
same-element nested semantics, has_child min-children counting,
has_parent membership, and the intra-batch conflicting-content guard
the parent-child fixture relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_es_spark.operators.nested import (
    has_child_over_store,
    has_parent_over_store,
    nested_query_over_store,
)
from mongo_es_spark.operators.text import incremental_bm25_index


@pytest.fixture(scope="module")
def nested_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("nested") / "bm")
    rows = [
        # d1: one element holds BOTH conditions -> matches
        ("d1", "alpha", [(50.0, "R"), (5.0, "N")]),
        # d2: conditions split ACROSS elements -> a flattened mapping
        # would match, nested must NOT
        ("d2", "alpha", [(50.0, "N"), (5.0, "R")]),
        # d3: two qualifying elements -> n_hits 2
        ("d3", "alpha", [(45.0, "R"), (99.0, "R"), (1.0, "N")]),
        # d4: matches the pred but NOT the term -> excluded
        ("d4", "beta", [(50.0, "R")]),
        # d5: no items at all (NULL array)
        ("d5", "alpha", None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, text string, "
        "items array<struct<qty:double,rflag:string>>",
    )
    incremental_bm25_index(
        spark, df, store, field_cols=["items"]
    ).count()
    return store


def test_nested_same_element_semantics(spark, nested_store):
    got = {
        r["doc"]: r["n_hits"]
        for r in nested_query_over_store(
            spark, nested_store, ["alpha"], "items",
            [("qty", "gte", 45.0), ("rflag", "eq", "R")],
        ).collect()
    }
    assert got == {"d1": 1, "d3": 2}  # d2 is the flattened trap


def test_nested_condition_validation(spark, nested_store):
    with pytest.raises(ValueError, match="at least one condition"):
        nested_query_over_store(
            spark, nested_store, ["alpha"], "items", []
        )
    with pytest.raises(ValueError, match="unknown nested condition"):
        nested_query_over_store(
            spark, nested_store, ["alpha"], "items",
            [("qty", "like", 1)],
        )


@pytest.fixture(scope="module")
def pc_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("pc") / "bm")
    parents = [
        ("P1", "order urgent", "parent", None, 10.0),
        ("P2", "order urgent", "parent", None, 20.0),
        ("P3", "order slow", "parent", None, 30.0),
    ]
    children = [
        # P1: 2 matching children, P2: 1, P3: 2
        ("C1", "line rf_R", "child", "P1", 1.0),
        ("C2", "line rf_R", "child", "P1", 2.0),
        ("C3", "line rf_N", "child", "P1", 3.0),
        ("C4", "line rf_R", "child", "P2", 4.0),
        ("C5", "line rf_R", "child", "P3", 5.0),
        ("C6", "line rf_R", "child", "P3", 6.0),
    ]
    df = spark.createDataFrame(
        parents + children,
        "doc_id string, text string, join_name string, "
        "parent_id string, price double",
    )
    incremental_bm25_index(
        spark, df, store,
        field_cols=["join_name", "parent_id", "price"],
    ).count()
    return store


def test_has_child_min_children(spark, pc_store):
    got = {
        (r["doc"], r["n_children"], r["price"])
        for r in has_child_over_store(
            spark, pc_store, ["rf_R"], min_children=2
        ).collect()
    }
    assert got == {("P1", 2, 10.0), ("P3", 2, 30.0)}
    # min_children=1 adds P2
    docs = {
        r["doc"]
        for r in has_child_over_store(
            spark, pc_store, ["rf_R"], min_children=1
        ).collect()
    }
    assert docs == {"P1", "P2", "P3"}


def test_has_parent_membership(spark, pc_store):
    got = {
        (r["doc"], r["parent_id"])
        for r in has_parent_over_store(
            spark, pc_store, ["urgent"]
        ).collect()
    }
    assert got == {
        ("C1", "P1"), ("C2", "P1"), ("C3", "P1"), ("C4", "P2")
    }


def test_intra_batch_conflict_raises(spark, tmp_path):
    """One id, two texts in one fold: raises instead of indexing an
    arbitrary winner; same-(id, text) duplicates collapse silently."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = str(tmp_path / "ok")
    dup = spark.createDataFrame(
        [("a", "same text"), ("a", "same text"), ("b", "other")],
        "doc_id string, text string",
    )
    out = incremental_bm25_index(spark, dup, ok)
    assert out.count() == 2  # a once, b once

    bad = spark.createDataFrame(
        [("a", "one text"), ("a", "another text")],
        "doc_id string, text string",
    )
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException),
        match="conflicting content",
    ):
        incremental_bm25_index(
            spark, bad, str(tmp_path / "bad")
        ).count()


def test_intra_batch_field_conflict_raises(spark, tmp_path):
    """The duplicate signature is WHOLE-DOC: two rows with the same
    id and the same text but CONFLICTING stored-field values raise
    too (no defensible winner), while full whole-doc duplicates still
    collapse silently as replays."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = str(tmp_path / "fok")
    dup = spark.createDataFrame(
        [("a", "same text", "en"), ("a", "same text", "en")],
        "doc_id string, text string, lang string",
    )
    out = incremental_bm25_index(
        spark, dup, ok, field_cols=["lang"]
    )
    assert out.count() == 1

    bad = spark.createDataFrame(
        [("a", "same text", "en"), ("a", "same text", "de")],
        "doc_id string, text string, lang string",
    )
    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException),
        match="conflicting content",
    ):
        incremental_bm25_index(
            spark, bad, str(tmp_path / "fbad"), field_cols=["lang"]
        ).count()


# ---- the same relations served through the _search body ------------


def test_api_nested_matches_standalone(spark, nested_store):
    """bool(match alpha, nested(...)) through the executor == the
    standalone nested_query_over_store doc set, including the
    flattened-mapping trap doc staying unmatched."""
    from mongo_es_spark.operators.searchapi import search

    got = search(spark, nested_store, {
        "query": {"bool": {
            "must": [{"match": {"text": "alpha"}}],
            "filter": [{"nested": {
                "path": "items",
                "query": {"bool": {"must": [
                    {"range": {"items.qty": {"gte": 45.0}}},
                    {"term": {"items.rflag": "R"}},
                ]}},
            }}],
        }},
    })
    want = {
        r["doc"]
        for r in nested_query_over_store(
            spark, nested_store, ["alpha"], "items",
            [("qty", "gte", 45.0), ("rflag", "eq", "R")],
        ).collect()
    }
    assert {r["doc"] for r in got.collect()} == want == {"d1", "d3"}


def test_api_nested_should_and_must_not(spark, nested_store):
    from mongo_es_spark.operators.searchapi import search

    # must_not applies per element: qty >= 45 AND NOT rflag == 'N'
    # must hold on ONE element — d2's (50, N) fails the negation and
    # its (5, R) fails the range, so d2 stays out
    got = search(spark, nested_store, {
        "query": {"nested": {
            "path": "items",
            "query": {"bool": {
                "must": [{"range": {"items.qty": {"gte": 45.0}}}],
                "must_not": [{"term": {"items.rflag": "N"}}],
            }},
        }},
    })
    assert {r["doc"] for r in got.collect()} == {"d1", "d3", "d4"}
    # should = OR on the same element: qty >= 99 OR rflag == 'N'
    got2 = search(spark, nested_store, {
        "query": {"nested": {
            "path": "items",
            "query": {"bool": {"should": [
                {"range": {"items.qty": {"gte": 99.0}}},
                {"term": {"items.rflag": "N"}},
            ]}},
        }},
    })
    assert {r["doc"] for r in got2.collect()} == {"d1", "d2", "d3"}


def test_api_nested_validation(spark, nested_store):
    from mongo_es_spark.operators.searchapi import search

    with pytest.raises(ValueError, match="not a stored field"):
        search(spark, nested_store, {
            "query": {"nested": {
                "path": "nope",
                "query": {"term": {"nope.x": 1}},
            }},
        })
    with pytest.raises(ValueError, match="term/range/bool"):
        search(spark, nested_store, {
            "query": {"nested": {
                "path": "items",
                "query": {"match": {"items.rflag": "R"}},
            }},
        })


def test_api_has_child_matches_standalone(spark, pc_store):
    from mongo_es_spark.operators.searchapi import search

    got = search(spark, pc_store, {
        "query": {"has_child": {
            "type": "child",
            "query": {"term": {"text": "rf_R"}},
            "min_children": 2,
        }},
        "size": 10,
        "fields": ["price"],
    })
    want = {
        (r["doc"], r["price"])
        for r in has_child_over_store(
            spark, pc_store, ["rf_R"], min_children=2
        ).collect()
    }
    assert {
        (r["doc"], r["price"]) for r in got.collect()
    } == want == {("P1", 10.0), ("P3", 30.0)}


def test_api_has_parent_matches_standalone(spark, pc_store):
    from mongo_es_spark.operators.searchapi import search

    got = search(spark, pc_store, {
        "query": {"has_parent": {
            "parent_type": "parent",
            "query": {"match": {"text": "urgent"}},
        }},
        "size": 10,
    })
    want = {
        r["doc"]
        for r in has_parent_over_store(
            spark, pc_store, ["urgent"]
        ).collect()
    }
    assert {r["doc"] for r in got.collect()} == want == {
        "C1", "C2", "C3", "C4"
    }


def test_api_relations_nest_in_bool(spark, pc_store):
    """Relation nodes compose inside a bool tree — the request shape
    the r11 VERDICT called out as raising before."""
    from mongo_es_spark.operators.searchapi import search

    got = search(spark, pc_store, {
        "query": {"bool": {
            "must": [{"match": {"text": "line"}}],
            "filter": [{"has_parent": {
                "parent_type": "parent",
                "query": {"match": {"text": "urgent"}},
            }}],
            "must_not": [{"term": {"text": "rf_N"}}],
        }},
        "size": 10,
    })
    assert {r["doc"] for r in got.collect()} == {"C1", "C2", "C4"}


def test_api_has_child_missing_join_columns(spark, nested_store):
    from mongo_es_spark.operators.searchapi import search

    with pytest.raises(ValueError, match="join-field"):
        search(spark, nested_store, {
            "query": {"has_child": {
                "type": "child",
                "query": {"match": {"text": "alpha"}},
            }},
        })
