"""Randomized equivalence tests for the temporal-join and CDC-history
operators (operators/joins.py, operators/history.py) against
plain-Python replays, plus plan contracts pinning their scale shapes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _rand_events(seed: int, n_users: int = 8, max_per_user: int = 30):
    """(user, event_id, ts, kind, value) with deliberate ts ties both
    within and across kinds."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(n_users):
        t = 0
        for _ in range(rng.randint(0, max_per_user)):
            t += rng.choice([0, 0, 1, 2, rng.randint(1, 50)])
            kind = rng.choice(["click", "purchase", "error"])
            rows.append((uid, eid, t, kind, round(rng.uniform(0, 100), 2)))
            eid += 1
    return rows


def test_asof_join_matches_python_replay(spark):
    from mongo_es_spark.operators.joins import asof_join

    rows = _rand_events(41)
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, kind string, value double"
    )
    clicks = df.filter(F.col("kind") == "click").select(
        "event_id", "uid", "ts"
    )
    purchases = df.filter(F.col("kind") == "purchase").select(
        "uid", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["uid"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        tiebreak_col="event_id",
    )
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"]) for r in out.collect()
    }

    purch = [r for r in rows if r[3] == "purchase"]
    want = {}
    for uid, eid, t, kind, _ in rows:
        if kind != "click":
            continue
        cand = [p for p in purch if p[0] == uid and p[2] <= t]
        if cand:
            # greatest ts, then greatest event_id
            best = max(cand, key=lambda p: (p[2], p[1]))
            want[eid] = (best[2], best[4])
        else:
            want[eid] = (None, None)
    assert got == want


def test_asof_join_distinct_tables_and_no_key_collision(spark):
    """right ts column named differently from left; multi-column left
    payload survives untouched."""
    from mongo_es_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 6, 3.0)],
        "k long, rt long, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="rt",
        value_cols=["v"],
    ).collect()
    byTag = {r["tag"]: (r["rt_asof"], r["v_asof"]) for r in out}
    assert byTag == {
        "a": (10, 1.0),   # inclusive <=
        "b": (15, 2.0),
        "c": (None, None),  # right at t=6 is after left t=5
    }


def test_bucketed_range_join_matches_python(spark):
    from mongo_es_spark.operators.joins import bucketed_range_join

    rows = _rand_events(43)
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, kind string, value double"
    )
    W = 25
    left = df.filter(F.col("kind") == "error").select("event_id", "ts")
    right = df.filter(F.col("kind") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    pairs = bucketed_range_join(
        left, right, left_ts="ts", right_ts="p_ts", window_ms=W
    )
    got = {(r["event_id"], r["p_id"]) for r in pairs.collect()}

    errs = [r for r in rows if r[3] == "error"]
    purch = [r for r in rows if r[3] == "purchase"]
    want = {
        (e[1], p[1])
        for e in errs
        for p in purch
        if abs(e[2] - p[2]) <= W
    }
    assert got == want


def test_bucketed_range_join_with_key(spark):
    from mongo_es_spark.operators.joins import bucketed_range_join

    rows = _rand_events(47)
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, kind string, value double"
    )
    W = 10
    left = df.filter(F.col("kind") == "click").select(
        "uid", "event_id", "ts"
    )
    right = df.filter(F.col("kind") == "error").select(
        "uid", F.col("ts").alias("e_ts"), F.col("event_id").alias("e_id")
    )
    pairs = bucketed_range_join(
        left, right, left_ts="ts", right_ts="e_ts", window_ms=W, on=["uid"]
    )
    got = {(r["event_id"], r["e_id"]) for r in pairs.collect()}
    want = {
        (c[1], e[1])
        for c in rows
        if c[3] == "click"
        for e in rows
        if e[3] == "error" and e[0] == c[0] and abs(c[2] - e[2]) <= W
    }
    assert got == want


def _replay_history(rows):
    """Python oracle: per-key event replay in (ts, event_id) order.
    Returns (scd2 rows, final state fn)."""
    per_key: dict[int, list] = {}
    for uid, eid, t, op, v in sorted(rows, key=lambda r: (r[2], r[1])):
        per_key.setdefault(uid, []).append((eid, t, op, v))
    return per_key


def test_scd2_intervals_match_python(spark):
    from mongo_es_spark.operators.history import scd2_intervals

    rng = random.Random(53)
    rows = []
    eid = 0
    for uid in range(10):
        t = 0
        for _ in range(rng.randint(0, 25)):
            t += rng.choice([0, 1, rng.randint(1, 40)])
            rows.append(
                (uid, eid, t, rng.choice("iiuuud"), round(rng.uniform(0, 9), 2))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, op string, value double"
    )
    out = scd2_intervals(
        df, ["uid"], "ts", "op", ["value"], tiebreak_col="event_id"
    )
    got = {
        (r["uid"], r["valid_from"], r["valid_to"], r["value"], r["is_current"])
        for r in out.collect()
    }

    want = set()
    for uid, evs in _replay_history(rows).items():
        for i, (eid_, t, op, v) in enumerate(evs):
            nxt = evs[i + 1][1] if i + 1 < len(evs) else None
            if op != "d":
                want.add((uid, t, nxt, v, nxt is None))
    assert got == want


def test_snapshot_at_matches_python(spark):
    from mongo_es_spark.operators.history import snapshot_at

    rng = random.Random(59)
    rows = []
    eid = 0
    for uid in range(10):
        t = 0
        first = True
        for _ in range(rng.randint(1, 25)):
            t += rng.choice([1, rng.randint(1, 40)])
            op = "i" if first else rng.choice("iuuud")
            rows.append((uid, eid, t, op, round(rng.uniform(0, 9), 2)))
            first = False
            eid += 1
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, op string, value double"
    )
    T = 60
    out = snapshot_at(
        df, T, ["uid"], "ts", "op", ["value"], tiebreak_col="event_id"
    )
    got = {r["uid"]: r["value"] for r in out.collect()}

    want = {}
    for uid, evs in _replay_history(rows).items():
        state = None
        for eid_, t, op, v in evs:
            if t > T:
                break
            state = None if op == "d" else v
        if state is not None:
            want[uid] = state
    assert got == want


def test_snapshot_full_range_equals_materialize_keys(spark):
    """Snapshot at +inf must agree with the compaction-materialize
    path on which keys are live."""
    from mongo_es_spark.operators.compaction import compact_events
    from mongo_es_spark.operators.history import snapshot_at

    rows = _rand_events(61)
    op = (
        F.when(F.col("kind") == "click", "i")
        .when(F.col("kind") == "error", "d")
        .otherwise("u")
    )
    df = spark.createDataFrame(
        rows, "uid long, event_id long, ts long, kind string, value double"
    ).select("uid", "event_id", "ts", op.alias("op"), "value")
    snap = snapshot_at(
        df, 10**9, ["uid"], "ts", "op", ["value"], tiebreak_col="event_id"
    )
    comp = compact_events(
        df, ["uid"], "ts", "op", ["value"], tiebreak_col="event_id"
    ).filter(F.col("op") != "d")
    assert {r["uid"] for r in snap.collect()} == {
        r["uid"] for r in comp.collect()
    }
