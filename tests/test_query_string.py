"""query_string parser: Lucene mini-syntax -> executor node algebra.
Pure-Python tests (no Spark) for the grammar; the executor-level
integration rides tests/test_searchapi.py.
"""

from __future__ import annotations

import pytest

from mongo_es_spark.operators.searchapi import parse_query_string


def test_bare_term_is_match():
    assert parse_query_string("spark") == {"match": {"text": "spark"}}


def test_juxtaposition_defaults_to_or():
    assert parse_query_string("spark flink") == {
        "bool": {"should": [
            {"match": {"text": "spark"}},
            {"match": {"text": "flink"}},
        ]}
    }


def test_default_operator_and():
    assert parse_query_string("spark flink", "and") == {
        "bool": {"must": [
            {"match": {"text": "spark"}},
            {"match": {"text": "flink"}},
        ]}
    }


def test_explicit_and_or_precedence():
    # OR binds looser than AND: a AND b OR c == (a AND b) OR c
    got = parse_query_string("a AND b OR c")
    assert got == {
        "bool": {"should": [
            {"bool": {"must": [
                {"match": {"text": "a"}},
                {"match": {"text": "b"}},
            ]}},
            {"match": {"text": "c"}},
        ]}
    }


def test_plus_minus_hoist():
    got = parse_query_string("+spark -deprecated engine")
    assert got == {
        "bool": {
            "must": [{"match": {"text": "spark"}}],
            "should": [{"match": {"text": "engine"}}],
            "must_not": [{"match": {"text": "deprecated"}}],
        }
    }


def test_not_and_pure_negation():
    assert parse_query_string("NOT spark") == {
        "bool": {
            "must": [{"match_all": {}}],
            "must_not": [{"match": {"text": "spark"}}],
        }
    }


def test_phrase_wildcard_fuzzy():
    got = parse_query_string('"spark streaming" str* sparc~2')
    assert got == {
        "bool": {"should": [
            {"match_phrase": {"text": "spark streaming"}},
            {"wildcard": {"text": "str*"}},
            {"fuzzy": {"text": {"value": "sparc", "fuzziness": 2}}},
        ]}
    }


def test_parens_nesting():
    got = parse_query_string("(a OR b) AND c")
    assert got == {
        "bool": {"must": [
            {"bool": {"should": [
                {"match": {"text": "a"}},
                {"match": {"text": "b"}},
            ]}},
            {"match": {"text": "c"}},
        ]}
    }


def test_errors():
    with pytest.raises(ValueError, match="unterminated"):
        parse_query_string('"open phrase')
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(a OR b")
    with pytest.raises(ValueError, match="AND needs a left"):
        parse_query_string("AND b")
    with pytest.raises(ValueError, match="empty clause"):
        parse_query_string("")
    with pytest.raises(ValueError, match="unexpected"):
        parse_query_string("a ) b")
