"""C1 rate limiter: token-bucket semantics (fake clock) and the
DataFrame throttle really pacing a read (wall clock).

Reference behavior being matched: src/processor.ts:31-49 counts docs
per 1-second window and pauses the stream when the provisioned
read capacity is spent."""

from __future__ import annotations

import math
import time

import pytest

from mongo_es_spark.ratelimit import TokenBucket, throttle


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.slept: list[float] = []

    def monotonic(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.slept.append(s)
        self.t += s


def _bucket(rate: float) -> tuple[TokenBucket, FakeClock]:
    clk = FakeClock()
    return TokenBucket(rate, monotonic=clk.monotonic, sleep=clk.sleep), clk


def test_burst_within_one_second_window_is_free():
    bucket, clk = _bucket(100)
    assert bucket.consume(60) == 0.0
    assert bucket.consume(40) == 0.0  # exactly the 1 s budget
    assert clk.slept == []


def test_over_budget_sleeps_proportionally():
    bucket, clk = _bucket(100)
    bucket.consume(100)
    # next 50 docs arrive instantly: budget empty -> wait 50/100 s
    assert bucket.consume(50) == pytest.approx(0.5)
    assert clk.slept == [pytest.approx(0.5)]


def test_budget_refills_with_elapsed_time():
    bucket, clk = _bucket(100)
    bucket.consume(100)
    clk.t += 0.5  # half a second passes -> 50 tokens back
    assert bucket.consume(50) == 0.0
    assert bucket.consume(10) == pytest.approx(0.1)


def test_refill_caps_at_one_second_of_burst():
    bucket, clk = _bucket(100)
    bucket.consume(100)
    clk.t += 60  # a minute idle does NOT bank 6000 tokens
    assert bucket.consume(100) == 0.0
    assert bucket.consume(1) == pytest.approx(0.01)


def test_single_batch_larger_than_burst():
    bucket, _ = _bucket(100)
    bucket.consume(100)
    # a 1000-doc Arrow batch at 100 docs/s waits the full 10 s
    assert bucket.consume(1000) == pytest.approx(10.0)


def test_rate_must_be_positive():
    with pytest.raises(ValueError):
        TokenBucket(0)


def test_throttle_disabled_is_identity_plan(spark):
    df = spark.range(10)
    for capacity in (None, math.inf, 0):
        assert throttle(df, capacity) is df


def test_throttle_paces_scan_and_preserves_rows(spark):
    df = spark.range(600).repartition(1)
    t0 = time.monotonic()
    rows = throttle(df, 300, concurrency=1).collect()
    elapsed = time.monotonic() - t0
    assert sorted(r["id"] for r in rows) == list(range(600))
    # 600 rows at 300/s with a 300-row burst window -> >= ~1 s paced
    assert elapsed >= 0.9


def test_throttle_splits_capacity_across_tasks(spark):
    # 2 partitions x 200 rows at aggregate 400/s, concurrency 2:
    # each task paces at 200/s; 200 rows fit the burst -> no sleep
    df = spark.range(400).repartition(2)
    t0 = time.monotonic()
    assert throttle(df, 400, concurrency=2).count() == 400
    assert time.monotonic() - t0 < 30  # sanity: did not serialize
