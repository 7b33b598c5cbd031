from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from pyorchdb_spark.operators.asof import asof_join

TS = dt.datetime


def test_asof_basic_semantics(spark):
    """Inclusive backward as-of: equal-ts right row matches; no earlier
    right row -> nulls; later right rows never leak backward."""
    left = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), "a"),
            (1, TS(2024, 1, 1, 12, 0), "b"),
            (2, TS(2024, 1, 1, 9, 0), "c"),   # before any right row
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), 100.0),  # ties left 'a' exactly
            (1, TS(2024, 1, 1, 11, 0), 200.0),
            (2, TS(2024, 1, 1, 9, 30), 300.0),  # after left 'c'
        ],
        "k long, ts timestamp, price double",
    )
    out = {
        r["tag"]: (r["ts_right"], r["price"])
        for r in asof_join(left, right, by=["k"]).collect()
    }
    assert out["a"] == (TS(2024, 1, 1, 10, 0), 100.0)   # inclusive tie
    assert out["b"] == (TS(2024, 1, 1, 11, 0), 200.0)   # latest, not first
    assert out["c"] == (None, None)                      # nothing earlier


def test_asof_null_payload_not_backfilled(spark):
    """A NULL payload value in the LATEST right row must stay NULL — not
    be stitched from an older right row (DuckDB ASOF / merge_asof
    semantics). Regression for the per-column F.last formulation."""
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 0, 30), "x")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 0, 0, 10), 100.0, "live"),
            (1, TS(2024, 1, 1, 0, 0, 20), None, None),
        ],
        "k long, ts timestamp, price double, status string",
    )
    row = asof_join(left, right, by=["k"]).collect()[0]
    assert row["ts_right"] == TS(2024, 1, 1, 0, 0, 20)
    assert row["price"] is None and row["status"] is None


def test_asof_tolerance(spark):
    """Matches older than the tolerance are nulled, row still kept."""
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 12, 0), "x")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9, 0), 1.0)], "k long, ts timestamp, price double"
    )
    with_tol = asof_join(left, right, by=["k"], tolerance="1 hour").collect()[0]
    assert with_tol["price"] is None and with_tol["ts_right"] is None
    without = asof_join(left, right, by=["k"]).collect()[0]
    assert without["price"] == 1.0


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Real events table vs the pandas merge_asof oracle (backward,
    by user), on error->click matching."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    got = {
        (r["user_id"], r["event_id"], r["ts_right"], r["click_value"])
        for r in asof_join(err, clk, by=["user_id"]).collect()
    }

    lp = err.toPandas().sort_values("ts")
    rp = clk.toPandas().sort_values("ts").rename(columns={"ts": "click_ts"})
    m = pd.merge_asof(
        lp, rp, left_on="ts", right_on="click_ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    exp = {
        (
            r.user_id,
            r.event_id,
            None if pd.isna(r.click_ts) else r.click_ts.to_pydatetime(),
            None if pd.isna(r.click_value) else r.click_value,
        )
        for r in m.itertuples()
    }
    assert got == exp


def test_asof_plan_has_no_nested_loop(spark, sf_dir):
    """The formulation must stay a single hash-shuffle + window — never a
    broadcast nested loop or cartesian product."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clk = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    plan = asof_join(err, clk, by=["user_id"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange") <= 2  # one per union branch at most
