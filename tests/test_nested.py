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
