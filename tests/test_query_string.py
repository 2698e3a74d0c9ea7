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


def test_binary_and_leaves_juxtaposed_operands_optional():
    # Lucene/ES: AND is binary between its two adjacent operands —
    # 'a AND b c' with default_operator=or is '+a +b c', c optional
    got = parse_query_string("a AND b c")
    assert got == {
        "bool": {
            "must": [
                {"match": {"text": "a"}},
                {"match": {"text": "b"}},
            ],
            "should": [{"match": {"text": "c"}}],
        }
    }
    # the promotion respects explicit signs: 'a AND -b' is '+a -b'
    assert parse_query_string("a AND -b") == {
        "bool": {
            "must": [{"match": {"text": "a"}}],
            "must_not": [{"match": {"text": "b"}}],
        }
    }
    # and an AND later in the chain promotes only its own pair
    assert parse_query_string("x y AND z") == {
        "bool": {
            "must": [
                {"match": {"text": "y"}},
                {"match": {"text": "z"}},
            ],
            "should": [{"match": {"text": "x"}}],
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


# ---- hypothesis: parse -> render -> parse is a fixpoint ------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.from_regex(r"[a-z]{1,6}", fullmatch=True).filter(
    lambda w: w not in ("and", "or", "not")
)


def _leaf():
    return st.one_of(
        _WORD,
        _WORD.map(lambda w: f'"{w} {w}x"'),       # phrase
        _WORD.map(lambda w: w + "*"),              # wildcard
        _WORD.map(lambda w: w + "~1"),             # fuzzy
    )


def _qs():
    return st.recursive(
        _leaf(),
        lambda inner: st.builds(
            lambda sign, parts, joiner: joiner.join(
                (sign if i == 0 else "") + p
                for i, p in enumerate(parts)
            ),
            st.sampled_from(["", "+", "-"]),
            st.lists(
                inner.map(
                    lambda s: f"({s})" if " " in s else s
                ),
                min_size=1,
                max_size=3,
            ),
            st.sampled_from([" ", " AND ", " OR "]),
        ),
        max_leaves=8,
    )


def _render(node) -> str:
    if "match" in node:
        return node["match"]["text"]
    if "match_phrase" in node:
        return f'"{node["match_phrase"]["text"]}"'
    if "wildcard" in node:
        return node["wildcard"]["text"]
    if "fuzzy" in node:
        v = node["fuzzy"]["text"]
        return f'{v["value"]}~{v["fuzziness"]}'
    if "match_all" in node:
        return ""  # only appears as the pure-negation anchor
    b = node["bool"]

    def wrap(n):
        s = _render(n)
        return f"({s})" if "bool" in n else s

    parts = (
        [("+" + wrap(m)) for m in b.get("must", [])
         if "match_all" not in m]
        + [wrap(s) for s in b.get("should", [])]
        + [("-" + wrap(n)) for n in b.get("must_not", [])]
    )
    return " ".join(p for p in parts if p)


@settings(max_examples=200, deadline=None)
@given(_qs())
def test_parse_render_parse_fixpoint(qs):
    try:
        ast1 = parse_query_string(qs)
    except ValueError:
        return  # generator can build degenerate strings; skip those
    ast2 = parse_query_string(_render(ast1))
    assert ast2 == ast1
