"""interval_join (operators/rangejoin.py): bucketized range join vs a
pandas brute-force oracle, boundary inclusivity, keyed variant, plan
shape (no nested loop), and the explode-factor guard."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.operators.rangejoin import interval_join

TS = dt.datetime
BASE = TS(2024, 1, 1)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, k long, ts timestamp")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "iid long, k long, start timestamp, end timestamp")


def test_interval_join_matches_bruteforce(spark):
    rng = random.Random(7)
    pts = [
        (i, rng.randrange(3), BASE + dt.timedelta(minutes=rng.randrange(0, 5000)))
        for i in range(300)
    ]
    ivs = []
    for i in range(60):
        s = BASE + dt.timedelta(minutes=rng.randrange(0, 4500))
        ivs.append((i, rng.randrange(3), s, s + dt.timedelta(minutes=rng.randrange(0, 400))))

    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            _pts(spark, pts), _ivs(spark, ivs), bucket="1 hour"
        ).collect()
    }
    exp = {
        (pid, iid)
        for pid, _pk, ts in pts
        for iid, _ik, s, e in ivs
        if s <= ts <= e
    }
    assert got == exp

    # keyed variant: only same-k pairs
    got_k = {
        (r["pid"], r["iid"])
        for r in interval_join(
            _pts(spark, pts), _ivs(spark, ivs), by=["k"], bucket="1 hour"
        ).collect()
    }
    exp_k = {
        (pid, iid)
        for pid, pk, ts in pts
        for iid, ik, s, e in ivs
        if pk == ik and s <= ts <= e
    }
    assert got_k == exp_k


def test_interval_join_boundaries_inclusive(spark):
    pts = _pts(
        spark,
        [
            (1, 0, TS(2024, 1, 1, 10, 0, 0)),   # == start
            (2, 0, TS(2024, 1, 1, 12, 0, 0)),   # == end
            (3, 0, TS(2024, 1, 1, 12, 0, 1)),   # 1s past end
            (4, 0, TS(2024, 1, 1, 9, 59, 59)),  # 1s before start
        ],
    )
    ivs = _ivs(spark, [(1, 0, TS(2024, 1, 1, 10, 0, 0), TS(2024, 1, 1, 12, 0, 0))])
    got = {r["pid"] for r in interval_join(pts, ivs).collect()}
    assert got == {1, 2}


def test_interval_join_plan_is_hash_join(spark):
    pts = _pts(spark, [(1, 0, BASE)])
    ivs = _ivs(spark, [(1, 0, BASE, BASE + dt.timedelta(hours=2))])
    plan = interval_join(pts, ivs)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_guard_on_missized_bucket(spark):
    ivs = _ivs(spark, [(1, 0, BASE, BASE + dt.timedelta(days=400))])
    pts = _pts(spark, [(1, 0, BASE)])
    joined = interval_join(pts, ivs, bucket="1 minute", max_buckets_per_interval=1000)
    with pytest.raises(Exception, match="buckets"):
        joined.collect()


def test_interval_join_bad_bucket_string(spark):
    with pytest.raises(ValueError, match="fortnights"):
        interval_join(_pts(spark, []), _ivs(spark, []), bucket="2 fortnights")


def test_interval_join_null_and_reversed_intervals_drop(spark):
    """Code-review r3: NULL start/end and reversed (end < start)
    intervals must produce NO matches (BETWEEN semantics) — not a
    misleading guard error, and never sequence()'s descending explode."""
    pts = _pts(spark, [(1, 0, BASE + dt.timedelta(hours=1))])
    ivs = spark.createDataFrame(
        [
            (1, 0, None, BASE + dt.timedelta(hours=2)),          # null start
            (2, 0, BASE, None),                                  # null end
            (3, 0, BASE + dt.timedelta(days=400), BASE),         # reversed, huge span
            (4, 0, BASE, BASE + dt.timedelta(hours=2)),          # valid
        ],
        "iid long, k long, start timestamp, end timestamp",
    )
    got = {r["iid"] for r in interval_join(pts, ivs, bucket="1 hour").collect()}
    assert got == {4}
