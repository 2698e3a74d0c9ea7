"""Hypothesis property tests over the pure semantic spec (paths +
compaction) — no Spark session, so hundreds of generated cases run in
seconds.  The Spark operators are separately proven equal to this spec
on randomized batches (test_compaction_spark.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mongo_es_spark import paths
from mongo_es_spark.config import Task
from mongo_es_spark.core import make_ts, merge_oplogs

TASK = Task({"transform": {"mapping": {"value": "value", "x.y": "x.y"}}})

segment = st.sampled_from(["a", "b", "c", "x", "y"])
path_s = st.lists(segment, min_size=1, max_size=3).map(".".join)
scalar = st.one_of(st.integers(), st.text(max_size=5), st.booleans())


@given(path_s, scalar)
def test_set_then_get_roundtrip(path, value):
    obj: dict = {}
    paths.set_(obj, path, value)
    assert paths.get(obj, path) == value
    assert paths.has(obj, path)


@given(path_s, scalar)
def test_unset_removes(path, value):
    obj: dict = {}
    paths.set_(obj, path, value)
    assert paths.unset(obj, path)
    assert not paths.has(obj, path)


@given(path_s, scalar)
def test_literal_dotted_key_equivalence(path, value):
    # lodash: a literal dotted key wins over nested traversal
    literal = {path: value}
    assert paths.get(literal, path) == value
    assert paths.has(literal, path)


@given(
    st.dictionaries(segment, scalar, max_size=3),
    st.dictionaries(segment, scalar, max_size=3),
)
def test_merge_later_wins(a, b):
    merged = paths.merge(dict(a), b)
    for k, v in b.items():
        assert merged[k] == v
    for k, v in a.items():
        if k not in b:
            assert merged[k] == v


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),            # key
        st.integers(0, 20),           # ts seconds
        st.sampled_from("iiuuuud"),   # op mix, update-heavy
        st.integers(0, 99),           # payload
    ),
    max_size=40,
)


def _to_oplogs(events):
    out = []
    for seq, (key, ts, op, val) in enumerate(events):
        base = {"ts": make_ts(ts, seq), "ns": "t", "op": op}
        if op == "i":
            base["o"] = {"_id": str(key), "value": val}
        elif op == "u":
            base["o"] = {"$set": {"value": val}}
            base["o2"] = {"_id": str(key)}
        else:
            base["o"] = {"_id": str(key)}
        out.append(base)
    return out


def _key(lg):
    ref = lg["o2"] if lg["op"] == "u" else lg["o"]
    return lg["ns"] + str(ref["_id"])


@settings(max_examples=200)
@given(events_strategy)
def test_compaction_at_most_one_survivor_per_key(events):
    merged = merge_oplogs(TASK, _to_oplogs(events))
    keys = [_key(lg) for lg in merged]
    assert len(keys) == len(set(keys))


@settings(max_examples=200)
@given(events_strategy)
def test_compaction_idempotent(events):
    once = merge_oplogs(TASK, _to_oplogs(events))
    twice = merge_oplogs(TASK, [dict(lg) for lg in once])
    assert twice == once


@settings(max_examples=200)
@given(events_strategy)
def test_compaction_output_sorted_and_bounded(events):
    oplogs = _to_oplogs(events)
    merged = merge_oplogs(TASK, oplogs)
    ts_list = [lg["ts"] for lg in merged]
    assert ts_list == sorted(ts_list)
    assert len(merged) <= len(oplogs)
    if oplogs:
        assert all(
            lg["ts"] <= max(o["ts"] for o in oplogs) for lg in merged
        )
