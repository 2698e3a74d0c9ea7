"""Golden-behavior tests ported from the reference's unit suite
(reference: test/processor.test.ts — same inputs, same expected outputs,
re-expressed over plain dicts with string ids and int BSON-style
timestamps)."""

from __future__ import annotations

import pytest

from mongo_es_spark import paths
from mongo_es_spark.config import Task
from mongo_es_spark.core import (
    apply_update_es_doc,
    apply_update_mongo_doc,
    dispatch_oplog,
    ignore_update,
    make_ts,
    merge_oplogs,
    transformer,
)

AID = "aaaaaaaaaaaaaaaaaaaaaaaa"


def oplog_update():
    # reference: test/processor.test.ts:8-23
    return {
        "ts": make_ts(1495012567, 14),
        "op": "u",
        "ns": "db0.collection0",
        "o2": {"_id": AID},
        "o": {
            "$set": {"field0.field1": "set nested field"},
            "$unset": {"field0.field2": 1},
        },
    }


@pytest.fixture
def task():
    # reference: test/processor.test.ts:25-37
    return Task(
        {
            "from": {"phase": "scan"},
            "extract": {},
            "transform": {
                "mapping": {"field0.field1": "field1", "field0.field2": "field2"}
            },
            "load": {},
        }
    )


@pytest.fixture
def task2():
    # reference: test/processor.test.ts:39-50
    return Task(
        {
            "from": {"phase": "scan"},
            "extract": {},
            "transform": {"mapping": {"field0.field3": "field3"}},
            "load": {},
        }
    )


def mongo_doc():
    # reference: test/processor.test.ts:52-58
    return {"_id": AID, "field0": {"field1": 1, "field2": 2}}


def es_doc():
    # reference: test/processor.test.ts:60-64
    return {"_id": AID, "field1": 1, "field2": 2}


def test_transformer_create(task):
    # reference: test/processor.test.ts:66-78
    assert transformer(task, "upsert", mongo_doc()) == {
        "action": "upsert",
        "id": AID,
        "data": {"field1": 1, "field2": 2},
        "parent": None,
        "timestamp": 0,
    }


def test_transformer_update(task):
    # reference: test/processor.test.ts:80-92
    assert transformer(task, "upsert", mongo_doc()) == {
        "action": "upsert",
        "id": AID,
        "data": {"field1": 1, "field2": 2},
        "parent": None,
        "timestamp": 0,
    }


def test_transformer_delete(task):
    # reference: test/processor.test.ts:94-102
    assert transformer(task, "delete", mongo_doc()) == {
        "action": "delete",
        "id": AID,
        "parent": None,
        "timestamp": 0,
    }


def test_apply_update_mongo_doc(task):
    # reference: test/processor.test.ts:104-112
    o = oplog_update()["o"]
    assert apply_update_mongo_doc(task, mongo_doc(), o["$set"], o["$unset"]) == {
        "_id": AID,
        "field0": {"field1": "set nested field"},
    }


def test_apply_update_es_doc(task):
    # reference: test/processor.test.ts:114-120
    o = oplog_update()["o"]
    assert apply_update_es_doc(task, es_doc(), o["$set"], o["$unset"]) == {
        "_id": AID,
        "field1": "set nested field",
    }


def test_ignore_update_true(task2):
    # reference: test/processor.test.ts:122-125
    assert ignore_update(task2, oplog_update()) is True


def test_ignore_update_false(task):
    # reference: test/processor.test.ts:127-130
    assert ignore_update(task, oplog_update()) is False


def test_merge_oplogs_insert_then_update(task):
    # reference: test/processor.test.ts:132-184
    merged = merge_oplogs(
        task,
        [
            {
                "ts": make_ts(0, 0),
                "op": "i",
                "ns": "example1",
                "o": {"_id": AID, "field0.field1": 0},
            },
            {
                "ts": make_ts(1, 0),
                "op": "u",
                "ns": "example1",
                "o": {
                    "$set": {"field0.field1": 1},
                    "$unset": {"field0.field2": 1},
                },
                "o2": {"_id": AID},
            },
        ],
    )
    assert merged == [
        {
            "ts": make_ts(1, 0),
            "op": "i",
            "ns": "example1",
            "o": {"_id": AID, "field0.field1": 1},
        }
    ]


def test_merge_oplogs_update_then_update(task):
    # reference: test/processor.test.ts:186-247
    merged = merge_oplogs(
        task,
        [
            {
                "ts": make_ts(1, 0),
                "op": "u",
                "ns": "example1",
                "o": {"field0.field1": 1, "$set": {"field0.field2": 1}},
                "o2": {"_id": AID},
            },
            {
                "ts": make_ts(0, 0),
                "op": "u",
                "ns": "example1",
                "o": {"$set": {"field0.field1": 3, "field0.field2": 2}},
                "o2": {"_id": AID},
            },
        ],
    )
    assert merged == [
        {
            "ts": make_ts(1, 0),
            "op": "u",
            "ns": "example1",
            "o": {
                "field0.field1": 1,
                "$set": {"field0.field1": 3, "field0.field2": 1},
            },
            "o2": {"_id": AID},
        }
    ]


def test_merge_oplogs_update_then_delete(task):
    # reference: test/processor.test.ts:249-297
    merged = merge_oplogs(
        task,
        [
            {
                "ts": make_ts(0, 0),
                "op": "u",
                "ns": "example1",
                "o": {"field0.field1": 1, "$set": {"field0.field2": 1}},
                "o2": {"_id": AID},
            },
            {
                "ts": make_ts(1, 0),
                "op": "d",
                "ns": "example1",
                "o": {"_id": AID},
            },
        ],
    )
    assert merged == [
        {"ts": make_ts(1, 0), "op": "d", "ns": "example1", "o": {"_id": AID}}
    ]


def test_merge_oplogs_insert_then_delete(task):
    # reference: test/processor.test.ts:299-333
    merged = merge_oplogs(
        task,
        [
            {
                "ts": make_ts(0, 0),
                "op": "i",
                "ns": "example1",
                "o": {"_id": AID, "field0": 1},
            },
            {
                "ts": make_ts(1, 0),
                "op": "d",
                "ns": "example1",
                "o": {"_id": AID},
            },
        ],
    )
    assert merged == []


def test_merge_oplogs_insert_update_update_out_of_order():
    # reference: test/processor.test.ts:335-396
    task = Task({"transform": {"mapping": {"field0.field1": "field1"}}})
    merged = merge_oplogs(
        task,
        [
            {
                "ts": make_ts(0, 0),
                "op": "i",
                "ns": "example1",
                "o": {"_id": AID, "field0.field1": 0},
            },
            {
                "ts": make_ts(2, 0),
                "op": "u",
                "ns": "example1",
                "o": {"$set": {"field0.field1": 2}},
                "o2": {"_id": AID},
            },
            {
                "ts": make_ts(1, 0),
                "op": "u",
                "ns": "example1",
                "o": {"$set": {"field0.field1": 1}},
                "o2": {"_id": AID},
            },
        ],
    )
    assert merged == [
        {
            "ts": make_ts(2, 0),
            "op": "i",
            "ns": "example1",
            "o": {"_id": AID, "field0.field1": 2},
        }
    ]


# -- behaviors beyond the reference suite, pinned from code reading --


def test_merge_oplogs_delete_then_update_revives(task):
    # reference: processor.ts:277-278 — u after d replaces the delete
    merged = merge_oplogs(
        task,
        [
            {"ts": make_ts(0, 0), "op": "d", "ns": "ex", "o": {"_id": AID}},
            {
                "ts": make_ts(1, 0),
                "op": "u",
                "ns": "ex",
                "o": {"$set": {"field0.field1": 5}},
                "o2": {"_id": AID},
            },
        ],
    )
    assert len(merged) == 1 and merged[0]["op"] == "u"


def test_transformer_empty_data_dropped():
    # reference: processor.ts:79-81
    task = Task({"transform": {"mapping": {"missing.field": "x"}}})
    assert transformer(task, "upsert", {"_id": AID, "other": 1}) is None


def test_transformer_static_constants():
    # reference: processor.ts:77 — static constants seed the data doc
    task = Task(
        {
            "transform": {
                "mapping": {"a": "b"},
                "static": {"kind": "banner"},
            }
        }
    )
    assert transformer(task, "upsert", {"_id": AID, "a": 7}) == {
        "action": "upsert",
        "id": AID,
        "data": {"kind": "banner", "b": 7},
        "parent": None,
        "timestamp": 0,
    }


def test_transformer_parent_extraction():
    # reference: processor.ts:61,86
    task = Task({"transform": {"mapping": {"a": "b"}, "parent": "user.id"}})
    doc = {"_id": AID, "a": 1, "user": {"id": "u1"}}
    ir = transformer(task, "upsert", doc)
    assert ir is not None and ir["parent"] == "u1"


def test_dispatch_full_replace_update(task):
    # reference: processor.ts:186-195 (T5)
    ir = dispatch_oplog(
        task,
        {
            "ts": make_ts(3, 0),
            "op": "u",
            "ns": "ex",
            "o": {"field0": {"field1": 9}},
            "o2": {"_id": AID},
        },
    )
    assert ir == {
        "action": "upsert",
        "id": AID,
        "data": {"field1": 9},
        "parent": None,
        "timestamp": 3,
    }


def test_dispatch_update_via_sink_lookup(task):
    # reference: processor.ts:196-202 (J1 -> T4)
    ir = dispatch_oplog(
        task,
        oplog_update(),
        lookup_sink={AID: es_doc()},
    )
    assert ir == {
        "action": "upsert",
        "id": AID,
        "data": {"field1": "set nested field"},
        "parent": None,
        "timestamp": 1495012567,
    }


def test_dispatch_update_via_source_fallback(task):
    # reference: processor.ts:199-202 (J3 -> T1)
    ir = dispatch_oplog(task, oplog_update(), lookup_source={AID: mongo_doc()})
    assert ir is not None and ir["data"] == {"field1": 1, "field2": 2}


def test_dispatch_malformed_delete_dropped(task):
    # reference: processor.ts:205-208
    assert (
        dispatch_oplog(
            task,
            {"ts": make_ts(1, 0), "op": "d", "ns": "ex", "o": {"_id": AID, "x": 1}},
        )
        is None
    )


def test_paths_literal_dotted_key_equivalence():
    # lodash parity (SURVEY §1.2): literal dotted key == nested
    assert paths.has({"a.b": 1}, "a.b")
    assert paths.has({"a": {"b": 1}}, "a.b")
    assert paths.get({"a.b": 1}, "a.b") == 1
    assert paths.get({"a": {"b": 1}}, "a.b") == 1
    d = {"a.b": 0}
    paths.set_(d, "a.b", 2)
    assert d == {"a.b": 2}
    d2: dict = {}
    paths.set_(d2, "a.b", 2)
    assert d2 == {"a": {"b": 2}}


def test_paths_merge_later_wins():
    dst = {"a": {"x": 1, "y": 2}, "b": 1}
    paths.merge(dst, {"a": {"y": 3, "z": 4}, "c": 5})
    assert dst == {"a": {"x": 1, "y": 3, "z": 4}, "b": 1, "c": 5}
