"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Conventions used throughout:
- the driver ``events`` table doubles as a generic change log:
  key = user_id, sequence = event_id, op = 'delete' when
  event_type = 'error' else 'upsert' (SURVEY.md section 5);
- every computed column is aliased identically in the Spark plan and the
  DuckDB SQL; ratios are exact rationals (int/int in double) so value
  hashes agree bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyorchdb_spark.functions.text import (  # noqa: E402
    STOPWORDS,
    lang_id,
    stopword_ratio,
    token_count,
)
from pyorchdb_spark.operators.dedup import lww_dedup, lww_dedup_salted  # noqa: E402
from pyorchdb_spark.operators.dedup_docs import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shared_substring_pairs,
    simhash_pairs,
)
from pyorchdb_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    embedding_neardup_pairs,
)
from pyorchdb_spark.plans.merge import resolve_full_sync, resolve_merge  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table viewed as a CDC stream (see module docstring)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.col("event_id").cast("string").alias("commit"),
        F.floor(F.col("event_id") / 1000).alias("batch_no"),
    )


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay semantics (LWW + tombstones) on sf0.001 events."""
    return q_cdc_final_state(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# CDC / engine queries (SURVEY.md sections 2.3-2.5, 2.9)
# --------------------------------------------------------------------------

def q_cdc_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key last-writer-wins pick — the engine's window operator."""
    cl = _events_as_changelog(spark, sf_dir)
    out = lww_dedup(cl, keys=("user_id",), seq_col="event_id", tiebreakers=())
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_cdc_lww_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted dedup — must equal the plain window (same oracle)."""
    cl = _events_as_changelog(spark, sf_dir)
    out = lww_dedup_salted(cl, keys=("user_id",), seq_col="event_id", tiebreakers=(), n_salts=8)
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW winners minus tombstones — replayed final table state."""
    cl = _events_as_changelog(spark, sf_dir)
    win = lww_dedup(cl, keys=("user_id",), seq_col="event_id", tiebreakers=())
    return win.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics: state(first half) merged with second-half
    events == LWW final state over the whole log (idempotent upsert)."""
    cl = _events_as_changelog(spark, sf_dir)
    mid = 5_000
    first = cl.filter(F.col("event_id") < mid)
    # stored state retains tombstone winners (see plans/merge.py)
    target = lww_dedup(first, keys=("user_id",), seq_col="event_id", tiebreakers=())
    source = cl.filter(F.col("event_id") >= mid)
    merged = resolve_merge(target, source, keys=("user_id",), seq_col="event_id")
    return merged.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def q_cdc_marker_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once gate (J1): drop events of committed batches via
    broadcast anti-join on batch id; count what remains per batch."""
    cl = _events_as_changelog(spark, sf_dir)
    committed = spark.range(0, 5).select(F.col("id").alias("batch_no"))
    remaining = cl.join(F.broadcast(committed), "batch_no", "left_anti")
    return remaining.groupBy("batch_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_id").alias("max_event_id"),
    )


def q_cdc_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-sync MERGE (WHEN NOT MATCHED BY SOURCE THEN DELETE,
    plans/merge.resolve_full_sync): the first-half state synced to the
    second-half snapshot — keys absent from the snapshot are tombstoned
    at the snapshot's high-watermark; live result = the snapshot keys'
    LWW winners over the whole log."""
    cl = _events_as_changelog(spark, sf_dir)
    target = lww_dedup(
        cl.filter(F.col("event_id") < 5_000),
        keys=("user_id",), seq_col="event_id", tiebreakers=(),
    )
    source = cl.filter(F.col("event_id") >= 5_000)
    synced = resolve_full_sync(target, source, keys=("user_id",), seq_col="event_id")
    return synced.filter(F.col("op") != "delete").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version diff — the table_changes CDC-read shape: per-key live
    state at the v1 cut vs the full log, emitting only keys that
    changed, classified insert/update/delete. One full-outer join of two
    thin winner tables."""
    cl = _events_as_changelog(spark, sf_dir)

    def live(df):
        w = lww_dedup(df, keys=("user_id",), seq_col="event_id", tiebreakers=())
        return w.filter(F.col("op") != "delete")

    s1 = live(cl.filter(F.col("event_id") < 5_000)).select(
        "user_id",
        F.col("event_id").alias("old_event_id"),
        F.col("value").alias("old_value"),
    )
    s2 = live(cl).select(
        "user_id",
        F.col("event_id").alias("new_event_id"),
        F.col("value").alias("new_value"),
    )
    j = s1.join(s2, ["user_id"], "full_outer")
    change = (
        F.when(F.col("old_event_id").isNull(), F.lit("insert"))
        .when(F.col("new_event_id").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return j.filter(
        F.col("old_event_id").isNull()
        | F.col("new_event_id").isNull()
        | (F.col("old_event_id") != F.col("new_event_id"))
    ).select(
        "user_id",
        change.alias("change_type"),
        "old_event_id",
        "new_event_id",
        "old_value",
        "new_value",
    )


def q_ivm_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): a GROUP BY
    aggregate of the first-half CDC state, maintained through two change
    batches by retraction deltas — O(changed keys) thin-row shuffles per
    batch, never a base-table rescan — must equal the oracle's full-log
    recompute exactly (decimal-exact retraction)."""
    from pyorchdb_spark.operators.ivm import _live, agg_view, group_contributions, ivm_step

    cl = _events_as_changelog(spark, sf_dir)
    state = lww_dedup(
        cl.filter(F.col("event_id") < 5_000),
        keys=("user_id",), seq_col="event_id", tiebreakers=(),
    )
    agg = group_contributions(_live(state), "event_type", ["value"])
    for lo, hi in ((5_000, 7_500), (7_500, None)):
        batch = cl.filter(F.col("event_id") >= lo)
        if hi is not None:
            batch = batch.filter(F.col("event_id") < hi)
        state, agg = ivm_step(
            state, batch, agg, "event_type", ["value"], keys=("user_id",), seq_col="event_id"
        )
        state = state.localCheckpoint(eager=False)
        agg = agg.localCheckpoint(eager=False)
    return agg_view(agg, ["value"]).select(
        F.col("grp").alias("state_type"),
        F.col("n_rows").alias("n_keys"),
        "total_value",
        "avg_value",
    )


def q_lineage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — lineage-style metrics: per event_type counts/sums/max-seq."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("event_id").alias("max_seq"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# curation operators (SURVEY.md section 2.2)
# --------------------------------------------------------------------------

def q_filter_not_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7 — contains / anti-contains filters on a name column."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(~F.col("source").contains("1"))
        .filter(F.lower(F.col("lang")).contains("e"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_insert_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — extract a yyyy-mm-dd date from a filename-shaped string."""
    ev = _t(spark, sf_dir, "events")
    named = ev.select(
        "event_id",
        F.concat(F.lit("export_"), F.date_format("ts", "yyyy-MM-dd"), F.lit(".csv")).alias("fname"),
    )
    return named.select(
        "event_id",
        F.regexp_extract("fname", r"(\d{4}-\d{2}-\d{2})", 1).alias("periodo"),
    )


def q_distinct_directories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — distinct of a derived segment column (pruned scan + distinct)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(F.col("source").alias("directory")).distinct()


def q_union_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — unionByName(allowMissingColumns): additive schema evolution."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.col("n_chars").alias("extra_chars")
    )
    return old.unionByName(new, allowMissingColumns=True)


def q_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — deterministic global sort + limit (top-10 users by value)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
        .select("user_id", "n_events")
    )


# --------------------------------------------------------------------------
# event-time windows / sessions / JSON (operators/timeseries.py,
# streaming/stateful.py holds the streaming twins — parity in
# tests/test_stateful_streaming.py)
# --------------------------------------------------------------------------

def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows per event_type (F.window)."""
    from pyorchdb_spark.operators.timeseries import windowed_agg

    ev = _t(spark, sf_dir, "events")
    return windowed_agg(ev, "ts", "1 day", keys=("event_type",))


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows (2-day length, 1-day slide): each event lands in
    exactly 2 windows — Catalyst expands this as a generator, so shuffle
    volume grows by exactly the windows-per-event factor."""
    from pyorchdb_spark.operators.timeseries import windowed_agg

    ev = _t(spark, sf_dir, "events")
    return windowed_agg(ev, "ts", "2 days", slide="1 day")


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (strictly-greater-than-gap splits): one shuffle
    on user_id + two window functions; oracle = SQL gaps-and-islands."""
    from pyorchdb_spark.operators.timeseries import sessionize

    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, "ts", gap="1 day", keys=("user_id",))


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase (one user
    shuffle; stage chain as codegen'd array expressions — the oracle is
    the equivalent chain of min-aggregate CTEs)."""
    from pyorchdb_spark.operators.timeseries import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, "ts", stages=("view", "click", "purchase"))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention triangle over the events table
    (single user-keyed shuffle; see operators/timeseries.py)."""
    from pyorchdb_spark.operators.timeseries import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "ts")


def q_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based analytic window: 3-event rolling average of value per
    user (ROWS 2 PRECEDING..CURRENT).  Exact decimal accumulation inside
    the frame so Spark's rotating add/remove sliding-sum and DuckDB's
    segment tree cannot drift on float ordering; one user-keyed shuffle,
    frame state is O(frame) per task."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(18,4)")).over(w)
            .cast("decimal(28,4)").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("rolling_avg"),
    )


def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(10) over per-user totals WITHOUT a single-task
    window: operators/ranking.py two-phase range-partitioned ranking —
    bit-identical to the SQL NTILE oracle."""
    from pyorchdb_spark.operators.ranking import global_ntile

    ev = _t(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(28,4)").cast("double")
        .alias("total_value")
    )
    tiles = global_ntile(
        totals, [F.desc("total_value"), F.asc("user_id")], k=10, tile_col="decile"
    )
    return tiles.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("total_value").alias("top_value"),
        F.min("total_value").alias("bottom_value"),
    )


def q_asof_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for every error event, the user's
    latest click at-or-before it — union-sort formulation, ONE shuffle,
    no pair blowup; oracle = DuckDB native ASOF LEFT JOIN."""
    from pyorchdb_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(err, clk, by=["user_id"], left_ts="ts", right_ts="ts")
    return out.select(
        "user_id", "event_id", F.col("ts_right").alias("click_ts"), "click_value"
    )


def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream watermarked interval join, batch twin
    (streaming/join.py — the same code path runs on live streams with
    watermark-bounded state): every click by the same user within the
    30 minutes before a signup."""
    from pyorchdb_spark.streaming.join import interval_stream_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    out = interval_stream_join(signups, clicks, by="user_id", lookback="30 minutes")
    return out.select(
        "user_id",
        F.col("event_id").alias("signup_event_id"),
        F.col("event_id_r").alias("click_event_id"),
        F.col("ts_r").alias("click_ts"),
        F.col("value_r").alias("click_value"),
    )


def q_range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/rangejoin.interval_join):
    purchases falling inside each day's error-incident window
    [first error, last error] — a plain BETWEEN join would plan as a
    BroadcastNestedLoopJoin; the bucketized form is two hash shuffles."""
    from pyorchdb_spark.operators.rangejoin import interval_join

    ev = _t(spark, sf_dir, "events")
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("incident_day"))
        .agg(F.min("ts").alias("start"), F.max("ts").alias("end"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "value")
    return (
        interval_join(purchases, incidents, bucket="1 hour")
        .groupBy("incident_day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (F.percentile, JVM-side).
    Interpolation fractions are quarters and inputs are 2-decimal values,
    so the true quartiles are exact 4-decimal decimals — round(4) makes
    the double representation hash-stable against the oracle."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("q75"),
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event_type categories to columns, one row per user (the
    explicit values list keeps the plan single-pass — no distinct scan)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.round(F.sum("value"), 2))
        .select(
            "user_id",
            F.col("click").alias("click_value"),
            F.col("view").alias("view_value"),
            F.col("purchase").alias("purchase_value"),
            F.col("error").alias("error_value"),
        )
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: (event_type, day) -> (event_type) -> grand total in
    one pass (F.rollup); oracle = SQL GROUP BY ROLLUP."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    return ev.rollup("event_type", day).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (get_json_object, JVM-side) + aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"), "value")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --------------------------------------------------------------------------
# analytics (bench headliners; joins/agg with broadcast + pushdown)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # no broadcast hint on customer: it is unbounded at scale — Catalyst/
    # AQE broadcasts it when its statistics fit (it does at bench SFs,
    # asserted in test_entry.test_analytics_plan_shapes)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey")
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # broadcast hints ONLY on the bounded dimensions (nation: 25 rows,
    # region: 5 — fixed by the schema); supplier/customer grow with scale
    # and are left to statistics-driven planning (AQE broadcasts them
    # while they fit, shuffles them when they don't)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — the predicate-pushdown showcase
    (every filter reaches the parquet scan; zero joins, one partial agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape adapted to this schema (no l_commitdate): orders
    with at least one lineitem shipped > 90 days after the order date,
    counted per priority — the EXISTS -> left-semi-join pattern."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    late = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (orders.o_orderkey == late.l_orderkey)
            & (late.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in one
    quarter, top 20 — join + agg + deterministic top-k."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    # exact decimal accumulation (order-independent), then ONE final
    # decimal->double conversion per output row: a double SUM is
    # order-dependent, but summing in decimal and converting the exact
    # result to double is deterministic on both engines — and avoids the
    # half-cent HALF_UP-vs-double-repr divergence a final round() hits,
    # while a raw DECIMAL output hash-diverges on trailing-zero rendering
    # ('107568.9600' vs '107568.96').
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc).cast("decimal(28,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations per direction and
    year — double nation join with an order-insensitive pair predicate."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month — conditional
    aggregation over a fact-dimension join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0.0)))
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's ECONOMY-part
    order revenue per year — two-level conditional aggregation over a
    seven-table join (part/region filters pushed to their scans, both
    nation roles broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_supp), sup.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_12", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted to this schema: profit per supplier nation
    and year over parts matching a name pattern.  The schema has no
    partsupp, so supply cost is proxied as ``0.6 * p_retailprice *
    l_quantity`` — deterministic and engine-neutral (stated in the oracle
    identically)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # exact decimal accumulation, ONE final conversion (q10 pattern)
        .agg(F.sum(profit).cast("decimal(28,4)").cast("double").alias("sum_profit"))
    )


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted (no l_shipmode/l_receiptdate): among
    lineitems shipped more than 60 days after their order date in 1996-97,
    count critical- vs normal-priority orders per return flag — the
    conditional dual count over a fact join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer —
    LEFT OUTER join (customers with no orders count as 0) with a join-side
    predicate, then a second aggregation over the first's result."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — a derived aggregate joined against its own maximum (the
    max side is a 1-row broadcast equi-join, not a nested-loop)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("decimal(28,4)").cast("double")
        .alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.max_revenue)
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders for one brand's parts were not taken — the correlated AVG
    subquery decorrelated into a per-part aggregate joined back."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    # restrict lineitem to the brand's parts FIRST (broadcast semi-ish
    # inner join on the pruned part list), then decorrelate the per-part
    # average over that small subset only
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li_brand.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li_brand.join(F.broadcast(avg_q), li_brand.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with any single order totalling more
    than 300 units — HAVING over a fact aggregate, joined up to the
    order/customer detail, deterministic top-100."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    windows — the disjunctive mixed-column predicate (part attributes
    AND lineitem attributes inside each disjunct) that exercises
    post-join filter placement."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("decimal(28,4)").cast("double")
        .alias("revenue")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted (lateness = shipped >90 days after order
    date; no receipt/commit dates in this schema): suppliers who were the
    SOLE late shipper on a finished multi-supplier order — EXISTS
    (another supplier shipped the order) AND NOT EXISTS (another supplier
    shipped late), as one semi and one anti hash join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    lo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
        )
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = lo.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = lo.filter(F.col("late")).select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    return (
        l1.join(l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "left_semi")
        .join(l3, (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("s3")), "left_anti")
        .join(sup, l1.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted (no c_phone: nation keys stand in for the
    country-code substring): per selected nation, customers with an
    above-average positive balance and NO orders — scalar aggregate
    threshold + NOT EXISTS as a left-anti join."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    # scalar-subquery materialization: one bounded driver scalar (the
    # same thing Catalyst does internally for an uncorrelated scalar
    # subquery), NOT a data collect
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal")).first()[0]
    return (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted (no partsupp table: the observed
    part-supplier relation is derived from lineitem, unit cost =
    min(l_extendedprice / l_quantity)): for STANDARD parts of small
    size, the supplier in one region offering the minimum unit cost —
    the correlated MIN subquery decorrelated into a per-part aggregate
    joined back, all dimensions broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name", "p_size")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # part/supplier/nation/region are all tiny dims; the one big input
    # (lineitem) is reduced to a (part, supp) cost relation in a single
    # partial-aggregated shuffle before any join
    cost = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eur = (
        cost.join(F.broadcast(sup), cost.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    min_cost = eur.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        eur.join(
            F.broadcast(min_cost),
            (eur.l_partkey == F.col("mc_key")) & (eur.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(part), eur.l_partkey == part.p_partkey)
        # raw double: min() of identical IEEE divisions is engine-exact;
        # a round() here would reintroduce HALF_UP-vs-half-away skew
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted (part value = revenue shipped by one
    nation's suppliers, not availqty*supplycost): parts whose value
    exceeds a fixed fraction of the nation's grand total — a per-group
    aggregate HAVING against an uncorrelated scalar aggregate, planned
    as a 1-row broadcast join, never a driver collect of data rows."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_li = (
        li.join(F.broadcast(sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
                            .select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .select("l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)").alias("val"))
    )
    # exact decimal accumulation at BOTH levels (a double grand total
    # would be partition-order-dependent and could flip boundary rows),
    # one decimal->double conversion per emitted value
    per_part = nat_li.groupBy("l_partkey").agg(
        F.sum("val").cast("decimal(28,4)").alias("dec_value")
    )
    total = per_part.agg(
        F.sum("dec_value").cast("decimal(38,4)").cast("double").alias("grand_total")
    )
    return (
        per_part.join(F.broadcast(total))
        .withColumn("part_value", F.col("dec_value").cast("double"))
        .filter(F.col("part_value") > F.col("grand_total") * 0.001)
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted (supplier-part relation from lineitem;
    the 'complaints' exclusion list = suppliers with negative balance):
    distinct supplier count per (brand, type, size) bucket for
    non-PROMO mid-size parts — distinct aggregation over a semi-reduced
    fact with a broadcast anti-join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted (no availqty: 'excess stock' becomes
    market dominance — a supplier holding >30% of a part's shipped 1996
    quantity): suppliers of red parts who dominate at least one such
    part, named per nation — nested per-(part,supp)/per-part aggregates
    compared, then a semi join up to the supplier dimension."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    red_li = li.join(F.broadcast(red), li.l_partkey == red.p_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    per_ps = red_li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("supp_qty"))
    per_p = per_ps.groupBy(F.col("l_partkey").alias("tp_key")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    dominant = (
        per_ps.join(F.broadcast(per_p), per_ps.l_partkey == F.col("tp_key"))
        .filter(F.col("supp_qty") > F.col("total_qty") * 0.3)
        .select("l_suppkey")
    )
    return (
        sup.join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name", "s_acctbal")
        .orderBy(F.asc("s_name"))
    )


# --------------------------------------------------------------------------
# CDC history projections (SCD2 / transitions)
# --------------------------------------------------------------------------

def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type state over the changelog
    (operators/scd.py): consecutive identical states collapse into one
    half-open [valid_from, valid_to) version row."""
    from pyorchdb_spark.operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events")
    return scd2_history(
        ev, key_cols=["user_id"], seq_col="event_id", state_cols=["event_type"]
    ).select("user_id", "event_type", "valid_from_seq", "valid_to_seq", "is_current")


def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/scd.py scd2_apply_batch):
    build history from the first two-thirds of the changelog (by global
    sequence — per-key monotone by construction, the contract the replay
    path guarantees), then fold in the rest as a batch.  The oracle is
    the full-log rebuild — incremental maintenance must be
    indistinguishable from it."""
    from pyorchdb_spark.operators.scd import scd2_apply_batch, scd2_history

    ev = _t(spark, sf_dir, "events")
    # bounded driver scalar (split point), same pattern as q22's scalar
    # subquery materialization
    thr = ev.agg(F.floor(F.max("event_id") * 2 / 3).alias("t")).first()[0]
    base = ev.filter(F.col("event_id") <= thr)
    late = ev.filter(F.col("event_id") > thr)
    hist = scd2_history(base, key_cols=["user_id"], seq_col="event_id", state_cols=["event_type"])
    out = scd2_apply_batch(
        hist, late, key_cols=["user_id"], seq_col="event_id", state_cols=["event_type"]
    )
    return out.select("user_id", "event_type", "valid_from_seq", "valid_to_seq", "is_current")


def q_scd2_lake_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-backed SCD2 (sources/scd_table.py, VERDICT r4 next #8): fold
    the changelog into a BUCKETED stored history in two commits — the
    second fold reads only the affected key-buckets via manifest
    arithmetic — then read the stored table. The oracle is the same
    full-log window rebuild as scd2_history: bucket-pruned incremental
    storage must be indistinguishable from it."""
    import shutil
    import tempfile

    from pyorchdb_spark.sources.scd_table import Scd2Table

    ev = _t(spark, sf_dir, "events")
    thr = ev.agg(F.floor(F.max("event_id") * 2 / 3).alias("t")).first()[0]
    root = tempfile.mkdtemp(prefix="scd2_lake_")
    try:
        t = Scd2Table(
            spark, root, key_cols=["user_id"], seq_col="event_id",
            state_cols=["event_type"],
        )
        t.apply_batch(ev.filter(F.col("event_id") <= thr), batch_id="b0", num_files=16)
        t.apply_batch(ev.filter(F.col("event_id") > thr), batch_id="b1")
        out = t.read().select(
            "user_id", "event_type", "valid_from_seq", "valid_to_seq", "is_current"
        )
        # materialize before the temp table vanishes (bounded: one row per
        # state run; the driver collects the result anyway)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_state_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event_type transition counts over each user's
    sequence-ordered changelog (operators/scd.py transition_counts)."""
    from pyorchdb_spark.operators.scd import transition_counts

    ev = _t(spark, sf_dir, "events")
    return transition_counts(ev, key_cols=["user_id"], seq_col="event_id", state_col="event_type")


# --------------------------------------------------------------------------
# training-data pipeline: dedup / similarity / text analysis
# --------------------------------------------------------------------------

def q_corpus_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide trigram document frequencies, top 50 — the vocabulary/
    boilerplate-discovery scan.  word_ngrams is per-doc DISTINCT, so the
    count is document frequency, not term frequency.  One shuffle on the
    gram with map-side partial counts; the top-k is TakeOrderedAndProject
    (no global sort materialization)."""
    from pyorchdb_spark.operators.dedup_docs import word_ngrams

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(word_ngrams("text", 3)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(50)
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per language — the grouped top-k (window
    rank) shape: one shuffle on the group key, rank computed in the
    sorted partition pass, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("lang", "doc_id", "n_chars", "rk")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("rep_id")
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.9, n=1, block_col="lang")


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. ACL'22 ExactSubstr criterion as
    a distributed gram join): doc pairs sharing a verbatim 8-token
    window, boilerplate windows (df > 100) excluded."""
    docs = _t(spark, sf_dir, "documents")
    return shared_substring_pairs(docs, k=8, max_df=100)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16, n=3)


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair -> group resolution: connected components over near-dup pairs
    (min-label propagation + pointer jumping, operators/components.py);
    oracle = DuckDB recursive-CTE transitive closure."""
    from pyorchdb_spark.operators.components import resolve_groups

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.9, n=1, block_col="lang")
    return resolve_groups(pairs).select("component_id", "n_members", "rep_id")


def q_dedup_fuzzy_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: drop every non-representative member of
    each near-dup component; returns surviving doc ids."""
    from pyorchdb_spark.operators.components import drop_duplicates_by_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.9, n=1, block_col="lang")
    return drop_duplicates_by_pairs(docs, pairs, id_col="doc_id").select("doc_id")


def q_dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end scale-path dedup: MinHash-LSH pairs -> connected
    components -> duplicate groups. Oracle: the LSH output at these fixed
    params provably equals the exact 3-gram Jaccard pairs (see the
    dedup_minhash_lsh oracle note), so the recursive-CTE transitive
    closure over those exact edges is the groups oracle."""
    from pyorchdb_spark.operators.components import resolve_groups

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16, n=3)
    return resolve_groups(pairs).select("component_id", "n_members", "rep_id")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup verification (VERDICT r3 next #5; made NON-VACUOUS
    in r5 — the old empty-set oracle could not distinguish "no violations"
    from "operator returned nothing"). The signatures are xxhash64
    bit-vote values no SQL engine can reproduce, so the oracle checks
    three SQL-derivable invariants in one summary row:

    (a) ``n_violations`` = pairs whose reported hamming disagrees with an
        INDEPENDENT numpy popcount of the XOR of the exported signatures,
        exceeds max_hamming, or is non-canonical — must be 0;
    (b) ``n_exact_pairs`` = exact-duplicate pairs (identical non-blank
        text) — computed from the data by BOTH engines, >0 at every SF;
    (c) ``n_exact_pairs_missing`` = exact-dup pairs the banding failed to
        emit — must be 0, because identical text ⇒ identical signature ⇒
        hamming 0, and pigeonhole banding has no bucket caps
        (operators/dedup_docs.py:412-465).

    The synthetic corpus carries no byte-identical duplicates, so (like
    q_scrub_pii / q_remove_boilerplate) the input is salted first with
    deterministic copies of every 50th doc — both engines derive the
    identical salted corpus, making (b)/(c) non-vacuous at every SF.

    Pair-set exactness vs a brute-force all-pairs scan is separately
    asserted in tests/test_docs_dedup.py."""
    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000)
        )
    )
    # with_signatures exports (s_a, s_b) so verification reuses the
    # signatures already computed inside the banding — not a second
    # corpus hashing pass
    pairs = simhash_pairs(docs, max_hamming=3, with_signatures=True)

    @F.pandas_udf("integer")
    def np_popcount(x: pd.Series) -> pd.Series:
        # numpy 1.x has no bitwise_count: view int64 as 8 bytes and
        # unpack to bits — one vectorized pass per Arrow batch
        a = x.to_numpy(dtype=np.int64).view(np.uint8).reshape(-1, 8)
        return pd.Series(np.unpackbits(a, axis=1).sum(axis=1).astype(np.int32))

    checked = pairs.withColumn(
        "np_ham", np_popcount(F.col("s_a").bitwiseXOR(F.col("s_b")))
    )
    viol = checked.filter(
        (F.col("hamming") != F.col("np_ham"))
        | (F.col("hamming") > 3)
        | (F.col("id_a") >= F.col("id_b"))
    )
    # exact-dup pairs on a thin sha key (never joins full text); blank
    # docs tokenize to nothing and carry no simhash row, so exclude them
    d = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("h")
    )
    ex_pairs = (
        d.select(F.col("doc_id").alias("id_a"), "h")
        .join(d.select(F.col("doc_id").alias("id_b"), "h"), "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    missing = ex_pairs.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    # single-row summary via one tagged union-aggregate (no cross join)
    u = (
        viol.select(F.lit("viol").alias("k"))
        .unionByName(ex_pairs.select(F.lit("exact").alias("k")))
        .unionByName(missing.select(F.lit("missing").alias("k")))
    )
    return u.agg(
        F.coalesce(F.sum((F.col("k") == "viol").cast("long")), F.lit(0)).alias("n_violations"),
        F.coalesce(F.sum((F.col("k") == "exact").cast("long")), F.lit(0)).alias("n_exact_pairs"),
        F.coalesce(F.sum((F.col("k") == "missing").cast("long")), F.lit(0)).alias("n_exact_pairs_missing"),
    )


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (email/IPv4/phone -> typed tokens) over doc text.
    The synthetic corpus carries no PII, so each doc's text is salted
    with deterministic doc_id-derived PII first — both engines derive
    the identical input, so the oracle exercises every pattern on every
    row (functions/text.scrub_pii; pure regexp_replace chain, no UDF)."""
    from pyorchdb_spark.functions.text import scrub_pii

    docs = _t(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".17"),
        F.lit(" call +1 555 0198 "), F.col("doc_id").cast("string"),
    )
    return docs.select("doc_id", scrub_pii(salted).alias("clean_text"))


def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate line removal (operators/boilerplate.py).
    The single-line synthetic corpus is salted with deterministic shared
    header/footer lines (identically derivable in both engines): the
    headers recur across hundreds of docs and must be dropped; each
    doc's unique body line must survive."""
    from pyorchdb_spark.operators.boilerplate import remove_boilerplate_lines

    docs = _t(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("GENERATED FILE - DO NOT EDIT"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("cookie notice: accept all"))
            .otherwise(F.lit("nav: home | about | contact")),
            F.col("text"),
            F.lit("copyright 2024 example corp"),
        ).alias("text"),
    )
    return remove_boilerplate_lines(salted, min_doc_frequency=10).select(
        F.col("id").alias("doc_id"), "clean_text"
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quota (operators/sampling.stratified_quota):
    at most 30 docs per lang, picked in deterministic md5-hash order —
    sampleBy gives only approximate fractions; curation wants exact,
    engine-portable caps."""
    from pyorchdb_spark.operators.sampling import stratified_quota

    docs = _t(spark, sf_dir, "documents")
    return stratified_quota(
        docs.select("doc_id", "lang"),
        strata=["lang"],
        n_per_stratum=30,
        order_cols=["doc_id"],
    )


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed train/val/test assignment
    (operators/sampling.hash_split — md5-bucket thresholds, portable
    bit-for-bit to DuckDB): per-doc split label plus per-split counts
    are both pinned by the oracle."""
    from pyorchdb_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(
        docs.select("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, cols=["doc_id"]
    )


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the training-data pipeline a user of
    this engine actually runs, composed from the first-class pieces:
    quality gate (C4/Gopher heuristics) -> exact dedup (keep the lowest
    doc_id per content hash) -> deterministic train/val assignment.
    One oracle covers the whole chain. The clean synthetic corpus is
    salted so every stage does real work (identically in both engines):
    every 10th doc gets an exact duplicate at doc_id+100000 (the dedup
    stage must drop it) and every 17th doc's text becomes pure
    punctuation (the quality gate must drop it)."""
    from pyorchdb_spark.functions.text import quality_score
    from pyorchdb_spark.operators.dedup_docs import exact_dedup
    from pyorchdb_spark.operators.sampling import split_column

    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 17 == 0, F.lit("!!! ??? !!! ??? !!!"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    dups = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text"
    )
    docs = base.unionByName(dups)
    good = docs.filter(quality_score("text") >= 0.75)
    deduped = exact_dedup(good)
    return deduped.select(
        "doc_id", split_column({"train": 0.9, "val": 0.1}, ["doc_id"]).alias("split")
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 3-gram overlap of every training doc
    against the held-out 'benchmark' slice (doc_id % 20 == 0) —
    operators/dedup_docs.ngram_contamination."""
    from pyorchdb_spark.operators.dedup_docs import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return ngram_contamination(corpus, bench, n=3).select(
        F.col("id").alias("doc_id"), "n_grams", "n_contaminated",
        F.round("contamination", 9).alias("contamination"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        stopword_ratio("text", "en").alias("stop_ratio_en"),
        lang_id("text").alias("lang_guess"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality scoring (functions/text.py): BPE-ish token
    count, punctuation ratio, and a 4-term indicator score — all
    whole-stage-codegen built-ins; score terms are exact quarters so the
    value hash is float-safe."""
    from pyorchdb_spark.functions.text import bpe_token_count, punct_ratio, quality_score

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        quality_score("text").alias("quality"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition signals (functions/text.py
    repetition_stats): duplicate-line fraction (pure array exprs) and
    top-2-gram mass (explode -> two partial aggs). Exact ratios of
    integer counts, so the value hash is float-safe after 9dp round."""
    from pyorchdb_spark.functions.text import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    out = repetition_stats(docs)
    return out.select(
        "doc_id",
        F.round("dup_line_frac", 9).alias("dup_line_frac"),
        F.round("top_2gram_frac", 9).alias("top_2gram_frac"),
    )


def q_normalize_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_path pandas UDF, oracle-checked: synthesize noisy paths
    from the documents table, normalize, compare against the regexp form."""
    from pyorchdb_spark.functions.udfs import normalize_path

    docs = _t(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.concat(F.lit("./"), F.col("source"), F.lit("//docs///"), F.col("lang"), F.lit("/")).alias("p"),
    )
    return noisy.select("doc_id", normalize_path("p").alias("norm_path"))


def q_sha256_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha256_content pandas UDF, oracle-checked against DuckDB sha256."""
    from pyorchdb_spark.functions.udfs import sha256_content

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", sha256_content("text").alias("sha"))


def q_lang_of_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang_of_path pandas UDF, oracle-checked: extension -> language tag."""
    from pyorchdb_spark.functions.udfs import lang_of_path

    docs = _t(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("lang") == "en", F.lit(".py"))
        .when(F.col("lang") == "es", F.lit(".md"))
        .when(F.col("lang") == "de", F.lit(".rs"))
        .when(F.col("lang") == "fr", F.lit(".ts"))
        .otherwise(F.lit(".bin"))
    )
    paths = docs.select("doc_id", F.concat(F.col("source"), F.lit("/f"), ext).alias("p"))
    return paths.select("doc_id", lang_of_path("p").alias("lang_tag"))


def q_clean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — general value cleaning (reference clean_db): accents folded,
    case/whitespace normalized; oracle = DuckDB strip_accents chain."""
    from pyorchdb_spark.operators.curate import clean_string_values

    docs = _t(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.concat(
            F.lit("  Café  "), F.upper("source"), F.lit("  ÑANDÚ\t"), F.col("lang")
        ).alias("cleaned"),
    )
    return clean_string_values(noisy, cols=["cleaned"])


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2("text", 256).alias("fp"))


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline; LSH path below)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.3, exact=True).select("id_a", "id_b")


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-bucketed near-dup pairs, reported as a CONTAINMENT check
    (VERDICT round 1, next-round item 6): the LSH path exact-verifies
    cosine on candidates, so its output must be a subset of the exact
    all-pairs result. r5: non-vacuous summary form — one row with
    ``n_containment_violations`` (LSH pairs NOT in the exact set; must
    be 0) and ``n_true_pairs`` (the exact all-pairs count, derived from
    the data by BOTH engines, >0 at every test SF — proves neither side
    returned an empty result by accident). Recall (the part SQL can't
    pin down — hash-family-dependent) is asserted in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    lsh = embedding_neardup_pairs(emb, threshold=0.3, exact=False, n_bits=6).select("id_a", "id_b")
    exact = embedding_neardup_pairs(emb, threshold=0.3, exact=True).select("id_a", "id_b")
    viol = lsh.join(exact, ["id_a", "id_b"], "left_anti")
    u = viol.select(F.lit("viol").alias("k")).unionByName(
        exact.select(F.lit("exact").alias("k"))
    )
    return u.agg(
        F.coalesce(F.sum((F.col("k") == "viol").cast("long")), F.lit(0)).alias(
            "n_containment_violations"
        ),
        F.coalesce(F.sum((F.col("k") == "exact").cast("long")), F.lit(0)).alias("n_true_pairs"),
    )


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN verification (VERDICT r3 next #1b), dedup_embedding_lsh-
    style containment oracle: the candidate SET is quantizer-model-
    dependent (no SQL oracle can reproduce it), but every pair the IVF
    path RETURNS must (a) report a cos_sim equal (±1e-9) to the exact
    cosine recomputed by an INDEPENDENT numpy path over the same
    vectors, and (b) carry a rank consistent with (cos_sim desc,
    corpus_id asc) dense per query. This query returns one summary row
    per query_id, which must show zero such violations AND exactly k
    results (made NON-VACUOUS in r5: the old empty-violations oracle could
    not distinguish "all correct" from "operator returned nothing"; the
    per-query n_results=k row can — 3 probed cells of an 8-cell IVF always
    hold >= 5 valid candidates at every test SF). Recall vs brute force is
    asserted in tests/test_similarity.py."""
    from pyorchdb_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    res = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3)

    @F.pandas_udf("double")
    def np_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a.to_numpy()])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b.to_numpy()])
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        denom = na * nb
        ok = denom > 0
        out = np.zeros(len(A))
        out[ok] = (A[ok] * B[ok]).sum(axis=1) / denom[ok]
        return pd.Series(out)

    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv"))
    cv = emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").cast("array<double>").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("corpus_id"))
    checked = (
        res.withColumn("rerank", F.row_number().over(w))
        .join(qv, "query_id")
        .join(cv, "corpus_id")
        .withColumn("np_sim", np_cos("qv", "cv"))
    )
    bad = (F.abs(F.col("cos_sim") - F.col("np_sim")) > 1e-9) | (
        F.col("rank") != F.col("rerank")
    )
    return checked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.sum(bad.cast("long")).alias("n_violations"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3)
    return brute_force_topk(emb, queries, k=5).select(
        "query_id", "corpus_id", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------------
# registry + oracles
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver records only the FIRST 50 entries (dict insertion order) on
    # the correctness board (VERDICT r4 "Next #1").  Slots 1-50 therefore go
    # to: (a) the 31 queries that carried no driver row in r4 — every
    # dedup_*/ann_*/scd2_*/text/UDF/sampling op, incl. the never-recorded
    # ann_topk_ivf and the new-oracle dedup_simhash/dedup_substring/
    # stratified_sample/repetition_stats; (b) the q12 fix (CAST AS BIGINT);
    # (c) the load-bearing CDC/IVM/lineage rows; (d) one query per remaining
    # operator family.  Everything rotated BELOW slot 50 was driver-green in
    # CORRECTNESS_r04 (the full TPC-H suite and the events/curate family) and
    # stays pytest-covered via tests/test_entry.py, which runs ALL entries.
    return {
        # --- (a) LLM-pipeline ops, unrecorded in r4 (all driver-green in r3
        #         except where noted; oracles unchanged since) -------------
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_substring": q_dedup_substring,          # oracle new in r4, never recorded
        "dedup_groups": q_dedup_groups,
        "dedup_fuzzy_resolve": q_dedup_fuzzy_resolve,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_minhash_groups": q_dedup_minhash_groups,
        "dedup_simhash": q_dedup_simhash,              # oracle new in r4, never recorded
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_topk": q_ann_topk,
        "ann_topk_ivf": q_ann_topk_ivf,                # never recorded in any round
        "scrub_pii": q_scrub_pii,
        "decontaminate": q_decontaminate,
        "remove_boilerplate": q_remove_boilerplate,
        "stratified_sample": q_stratified_sample,      # oracle new in r4, never recorded
        "train_val_split": q_train_val_split,
        "curate_corpus": q_curate_corpus,
        "text_stats": q_text_stats,
        "doc_quality": q_doc_quality,
        "repetition_stats": q_repetition_stats,        # oracle new in r4, never recorded
        "clean_values": q_clean_values,
        "fingerprint": q_fingerprint,
        "normalize_paths": q_normalize_paths,
        "sha256_udf": q_sha256_udf,
        "lang_of_path": q_lang_of_path,
        "corpus_ngrams": q_corpus_ngrams,
        "topk_per_group": q_topk_per_group,
        "scd2_history": q_scd2_history,
        "scd2_incremental": q_scd2_incremental,
        "scd2_lake_incremental": q_scd2_lake_incremental,  # new r5 (bucket-pruned folds)
        "state_transitions": q_state_transitions,
        # --- (b) the r4 hash-fail, oracle fixed this round ----------------
        "q12_late_priority": q12_late_priority,
        # --- (c) load-bearing CDC / IVM / lineage (green r4, keep on) -----
        "cdc_lww": q_cdc_lww,
        "cdc_lww_salted": q_cdc_lww_salted,
        "cdc_final_state": q_cdc_final_state,
        "cdc_merge_upsert": q_cdc_merge_upsert,
        "cdc_marker_antijoin": q_cdc_marker_antijoin,
        "cdc_full_sync": q_cdc_full_sync,
        "cdc_snapshot_diff": q_cdc_snapshot_diff,
        "ivm_group_stats": q_ivm_group_stats,
        "lineage_counts": q_lineage_counts,
        # --- (d) one representative per remaining operator family --------
        "union_evolution": q_union_evolution,          # A2/U2 schema evolution
        "insert_period": q_insert_period,              # P8 regex period injection
        "filter_not_contains": q_filter_not_contains,  # P6/P7 list filters
        "distinct_directories": q_distinct_directories,  # A1/F1 split+index
        "topk_users": q_topk_users,                    # O1 top-k
        "sessionize": q_sessionize,                    # stateful-streaming batch twin
        "asof_latest_click": q_asof_latest_click,      # as-of join custom op
        "range_join_incidents": q_range_join_incidents,  # range join custom op
        # ------------------- slot 51+ (off the recorded board) -----------
        "value_quantiles": q_value_quantiles,          # green r4; approx/exact quantile op
        # All rows below were driver-green in CORRECTNESS_r04 and are still
        # run per-round by tests/test_entry.py against the same oracles.
        "events_windowed": q_events_windowed,          # green r4
        "events_sliding": q_events_sliding,            # green r4
        "json_props": q_json_props,                    # green r4
        "funnel_steps": q_funnel_steps,                # green r4
        "cohort_retention": q_cohort_retention,        # green r4
        "rolling_value": q_rolling_value,              # green r4
        "value_deciles": q_value_deciles,              # green r4
        "click_attribution": q_click_attribution,      # green r4
        "events_pivot": q_events_pivot,                # green r4
        "events_rollup": q_events_rollup,              # green r4
        "q1_pricing_summary": q1_pricing_summary,      # green r4
        "q3_shipping_priority": q3_shipping_priority,  # green r4
        "q5_local_supplier_volume": q5_local_supplier_volume,  # green r4
        "q6_forecast_revenue": q6_forecast_revenue,    # green r4
        "q4_order_priority": q4_order_priority,        # green r4
        "q10_returned_items": q10_returned_items,      # green r4
        "q7_volume_shipping": q7_volume_shipping,      # green r4
        "q14_promo_revenue": q14_promo_revenue,        # green r4
        "q8_market_share": q8_market_share,            # green r4
        "q9_product_profit": q9_product_profit,        # green r4
        "q13_customer_distribution": q13_customer_distribution,  # green r4
        "q15_top_supplier": q15_top_supplier,          # green r4
        "q17_small_quantity": q17_small_quantity,      # green r4
        "q18_large_volume": q18_large_volume,          # green r4
        "q19_discounted_revenue": q19_discounted_revenue,  # green r4
        "q21_waiting_supplier": q21_waiting_supplier,  # green r4
        "q22_idle_balances": q22_idle_balances,        # green r4
        "q2_min_cost_supplier": q2_min_cost_supplier,  # green r4
        "q11_important_parts": q11_important_parts,    # green r4
        "q16_supplier_count": q16_supplier_count,      # green r4
        "q20_dominant_supplier": q20_dominant_supplier,  # green r4
    }


_LWW_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

_FINAL_STATE_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""

# SCD2 full-log rebuild: also the oracle for the INCREMENTAL path —
# folding a batch into an existing history must match the rebuild.
_SCD2_SQL = """
    WITH runs AS (
      SELECT user_id, event_type, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ), v AS (
      SELECT user_id, event_type, event_id AS valid_from_seq,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
               AS valid_to_seq
      FROM runs WHERE chg = 1
    )
    SELECT user_id, event_type, valid_from_seq, valid_to_seq,
           valid_to_seq IS NULL AS is_current
    FROM v
"""

_TOKENS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"

# 3-word shingles, mirroring operators/dedup_docs.word_ngrams(n=3): docs
# shorter than 3 tokens collapse to one whole-text shingle.
_SHINGLES3 = f"""CASE WHEN len({_TOKENS}) >= 3
  THEN list_distinct([array_to_string(({_TOKENS})[i:i+2], ' ')
                      for i in generate_series(1, len({_TOKENS}) - 2)])
  ELSE [array_to_string({_TOKENS}, ' ')] END"""

# 8-token windows, mirroring dedup_docs.shared_substring_pairs(k=8):
# STRICT — a doc under 8 tokens emits no windows (no whole-text fallback)
_WINDOWS8 = f"""CASE WHEN len({_TOKENS}) >= 8
  THEN list_distinct([array_to_string(({_TOKENS})[i:i+7], ' ')
                      for i in generate_series(1, len({_TOKENS}) - 7)])
  ELSE []::VARCHAR[] END"""


def _lang_id_sql() -> str:
    """Deterministic argmax over stopword votes, ties by language code."""
    score = {
        lang: f"len(list_filter({_TOKENS}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in STOPWORDS.items()
    }
    langs = sorted(STOPWORDS)
    expr = f"'{langs[0]}'"
    best = score[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN {score[lang]} > ({best}) THEN '{lang}' ELSE {expr} END"
        best = f"CASE WHEN {score[lang]} > ({best}) THEN {score[lang]} ELSE ({best}) END"
    return f"CASE WHEN ({best}) > 0 THEN {expr} ELSE 'und' END"


def oracle_sql() -> dict[str, str]:
    en = ", ".join(repr(w) for w in STOPWORDS["en"])
    return {
        "cdc_lww": _LWW_SQL,
        "cdc_lww_salted": _LWW_SQL,
        "cdc_final_state": _FINAL_STATE_SQL,
        "cdc_merge_upsert": _FINAL_STATE_SQL,
        "cdc_full_sync": """
            SELECT user_id, event_id AS last_event_id, value AS last_value
            FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1 AND event_type <> 'error'
              AND user_id IN (SELECT user_id FROM events WHERE event_id >= 5000)
        """,
        "cdc_snapshot_diff": """
            WITH s1 AS (
              SELECT user_id, event_id, value FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events WHERE event_id < 5000
              ) WHERE rn = 1 AND event_type <> 'error'
            ), s2 AS (
              SELECT user_id, event_id, value FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
              ) WHERE rn = 1 AND event_type <> 'error'
            )
            SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
                   CASE WHEN s1.event_id IS NULL THEN 'insert'
                        WHEN s2.event_id IS NULL THEN 'delete'
                        ELSE 'update' END AS change_type,
                   s1.event_id AS old_event_id,
                   s2.event_id AS new_event_id,
                   s1.value AS old_value,
                   s2.value AS new_value
            FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
            WHERE s1.event_id IS NULL OR s2.event_id IS NULL
               OR s1.event_id <> s2.event_id
        """,
        # the maintained aggregate must equal the full-log recompute —
        # the oracle IS the recompute (incremental path has no SQL twin)
        "ivm_group_stats": """
            SELECT event_type AS state_type,
                   count(*) AS n_keys,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE)
                       AS total_value,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE)
                       / count(*) AS avg_value
            FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1 AND event_type <> 'error'
            GROUP BY event_type
        """,
        "cdc_marker_antijoin": """
            SELECT CAST(floor(event_id / 1000) AS BIGINT) AS batch_no,
                   count(*) AS n_events,
                   max(event_id) AS max_event_id
            FROM events
            WHERE floor(event_id / 1000) >= 5
            GROUP BY 1
        """,
        "lineage_counts": """
            SELECT event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value,
                   max(event_id) AS max_seq,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "filter_not_contains": """
            SELECT source, count(*) AS n_docs
            FROM documents
            WHERE source NOT LIKE '%1%' AND lower(lang) LIKE '%e%'
            GROUP BY source
        """,
        "insert_period": """
            SELECT event_id,
                   regexp_extract('export_' || strftime(ts, '%Y-%m-%d') || '.csv',
                                  '(\\d{4}-\\d{2}-\\d{2})', 1) AS periodo
            FROM events
        """,
        "distinct_directories": "SELECT DISTINCT source AS directory FROM documents",
        "union_evolution": """
            SELECT doc_id, lang, NULL::BIGINT AS extra_chars FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id, lang, n_chars AS extra_chars FROM documents WHERE doc_id % 2 = 1
        """,
        "topk_users": """
            SELECT user_id, n_events FROM (
              SELECT user_id, count(*) AS n_events
              FROM events GROUP BY user_id
            ) ORDER BY n_events DESC, user_id ASC LIMIT 10
        """,
        "events_windowed": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2, 3
        """,
        "events_sliding": """
            WITH w AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
                       - x * INTERVAL 1 DAY AS window_start, value
              FROM events, (VALUES (0), (1)) t(x)
            )
            SELECT window_start,
                   window_start + INTERVAL 2 DAY AS window_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM w GROUP BY 1, 2
        """,
        "rolling_value": """
            SELECT user_id, event_id,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w
                             AS DECIMAL(28,4)) AS DOUBLE)
                   / count(*) OVER w AS rolling_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "value_deciles": """
            WITH totals AS (
              SELECT user_id,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS total_value
              FROM events GROUP BY 1
            ), tiles AS (
              SELECT total_value,
                     CAST(NTILE(10) OVER (ORDER BY total_value DESC, user_id ASC) AS INTEGER) AS decile
              FROM totals
            )
            SELECT decile, count(*) AS n_users,
                   max(total_value) AS top_value,
                   min(total_value) AS bottom_value
            FROM tiles GROUP BY 1
        """,
        "funnel_steps": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
              WHERE e.event_type = 'click' GROUP BY 1
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
              WHERE e.event_type = 'purchase' GROUP BY 1
            )
            SELECT 'view' AS stage, 1 AS stage_idx,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL SELECT 'click', 2, (SELECT count(*) FROM s2)
            UNION ALL SELECT 'purchase', 3, (SELECT count(*) FROM s3)
        """,
        "cohort_retention": """
            WITH fu AS (
              SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
              FROM events GROUP BY 1
            ), act AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
            )
            SELECT cohort_date,
                   CAST(date_diff('day', cohort_date, d) AS INTEGER) AS day_offset,
                   count(*) AS n_users
            FROM act JOIN fu USING (user_id)
            GROUP BY 1, 2
        """,
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts > lag(ts) OVER w + INTERVAL 1 DAY
                          THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT *, sum(brk) OVER (
                PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
              ) AS sess FROM o
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM s GROUP BY user_id, sess
        """,
        "json_props": """
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1
        """,
        "range_join_incidents": """
            WITH incidents AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS incident_day,
                     min(ts) AS s, max(ts) AS e
              FROM events WHERE event_type = 'error' GROUP BY 1
            )
            SELECT incident_day,
                   count(*) AS n_purchases,
                   round(sum(value), 2) AS total_value
            FROM events p JOIN incidents i ON p.ts BETWEEN i.s AND i.e
            WHERE p.event_type = 'purchase'
            GROUP BY incident_day
        """,
        "asof_latest_click": """
            SELECT e.user_id, e.event_id, c.ts AS click_ts, c.value AS click_value
            FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') e
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
              ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "click_attribution": """
            SELECT s.user_id,
                   s.event_id AS signup_event_id,
                   c.event_id AS click_event_id,
                   c.ts AS click_ts,
                   c.value AS click_value
            FROM events s JOIN events c
              ON s.user_id = c.user_id
             AND c.ts <= s.ts
             AND c.ts >= s.ts - INTERVAL 30 MINUTE
            WHERE s.event_type = 'signup' AND c.event_type = 'click'
        """,
        "value_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 4) AS q25,
                   round(quantile_cont(value, 0.50), 4) AS q50,
                   round(quantile_cont(value, 0.75), 4) AS q75
            FROM events GROUP BY event_type
        """,
        "events_pivot": """
            SELECT user_id,
                   round(sum(value) FILTER (event_type = 'click'), 2) AS click_value,
                   round(sum(value) FILTER (event_type = 'view'), 2) AS view_value,
                   round(sum(value) FILTER (event_type = 'purchase'), 2) AS purchase_value,
                   round(sum(value) FILTER (event_type = 'error'), 2) AS error_value
            FROM events GROUP BY user_id
        """,
        "events_rollup": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events
            GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey FROM (
              SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
              GROUP BY l_orderkey
            ) ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.04 AND 0.06
              AND l_quantity < 24
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
              )
            GROUP BY o_orderpriority
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name,
                   CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        """,
        "q14_promo_revenue": """
            SELECT round(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        """,
        "q8_market_share": """
            SELECT year(o_orderdate) AS o_year,
                   round(sum(CASE WHEN sn.n_name = 'NATION_12'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   year(o_orderdate) AS o_year,
                   CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                      - 0.6 * p_retailprice * l_quantity
                                      AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
        """,
        "q12_late_priority": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_returnflag
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist FROM (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey
            ) GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS supplier_no,
                     CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                        AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE)
                       AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q17_small_quantity": """
            WITH li_brand AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#11'
            ), avg_q AS (
              SELECT l_partkey AS ap_key, 0.2 * avg(l_quantity) AS qty_limit
              FROM li_brand GROUP BY l_partkey
            )
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM li_brand JOIN avg_q ON l_partkey = ap_key
            WHERE l_quantity < qty_limit
        """,
        "q18_large_volume": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
            FROM (
              SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
            ) big
            JOIN orders   ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "q19_discounted_revenue": """
            SELECT CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
               OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
        """,
        "q21_waiting_supplier": """
            WITH lo AS (
              SELECT l_orderkey, l_suppkey,
                     l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
            )
            SELECT s_name, count(*) AS numwait
            FROM lo l1 JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE l1.late
              AND EXISTS (SELECT 1 FROM lo l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lo l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.late)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 20
        """,
        "q22_idle_balances": """
            SELECT c_nationkey AS cntrycode,
                   count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
              AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0
                                 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY 1
        """,
        "q2_min_cost_supplier": """
            WITH cost AS (
              SELECT l_partkey, l_suppkey,
                     min(l_extendedprice / l_quantity) AS unit_cost
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_type = 'STANDARD' AND p_size <= 15)
              GROUP BY l_partkey, l_suppkey
            ), eur AS (
              SELECT c.*, s.s_name, s.s_acctbal, n.n_name
              FROM cost c
              JOIN supplier s ON c.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE r.r_name = 'EUROPE'
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
            FROM eur
            JOIN part ON l_partkey = p_partkey
            WHERE unit_cost = (SELECT min(unit_cost) FROM eur e2
                               WHERE e2.l_partkey = eur.l_partkey)
            ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
            LIMIT 100
        """,
        "q11_important_parts": """
            WITH per_part AS (
              SELECT l_partkey,
                     CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS dec_value
              FROM lineitem
              WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier JOIN nation
                  ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3')
              GROUP BY l_partkey
            )
            SELECT l_partkey AS p_partkey,
                   CAST(dec_value AS DOUBLE) AS part_value
            FROM per_part
            WHERE CAST(dec_value AS DOUBLE) >
                  CAST(CAST((SELECT sum(dec_value) FROM per_part) AS DECIMAL(38,4)) AS DOUBLE) * 0.001
            ORDER BY part_value DESC, p_partkey ASC
        """,
        "q16_supplier_count": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_type <> 'PROMO'
              AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0.0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
        """,
        "q20_dominant_supplier": """
            WITH red_li AS (
              SELECT l_partkey, l_suppkey, l_quantity
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1997-01-01'
                AND l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'red%')
            ), per_ps AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
              FROM red_li GROUP BY l_partkey, l_suppkey
            ), per_p AS (
              SELECT l_partkey, sum(supp_qty) AS total_qty
              FROM per_ps GROUP BY l_partkey
            )
            SELECT s_name, n_name, s_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT ps.l_suppkey FROM per_ps ps
              JOIN per_p p ON ps.l_partkey = p.l_partkey
              WHERE ps.supp_qty > p.total_qty * 0.3)
            ORDER BY s_name ASC
        """,
        "scd2_history": _SCD2_SQL,
        "scd2_incremental": _SCD2_SQL,
        "scd2_lake_incremental": _SCD2_SQL,
        "state_transitions": """
            SELECT prev_state, next_state, count(*) AS n_transitions FROM (
              SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                       AS prev_state,
                     event_type AS next_state
              FROM events
            ) WHERE prev_state IS NOT NULL
            GROUP BY prev_state, next_state
        """,
        "corpus_ngrams": f"""
            SELECT gram, count(*) AS doc_freq FROM (
              SELECT unnest({_SHINGLES3}) AS gram
              FROM documents WHERE len({_TOKENS}) > 0
            ) GROUP BY gram
            ORDER BY doc_freq DESC, gram ASC LIMIT 50
        """,
        "topk_per_group": """
            SELECT lang, doc_id, n_chars, rk FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id ASC) AS rk
              FROM documents
            ) WHERE rk <= 3
        """,
        "dedup_exact": """
            SELECT sha256(text) AS content_hash,
                   count(*) AS n_dups,
                   min(doc_id) AS rep_id
            FROM documents GROUP BY sha256(text)
        """,
        "scrub_pii": r"""
            SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
                         || ' call +1 555 0198 ' || CAST(doc_id AS VARCHAR),
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\+?\b\d[\d \-()]{7,}\d\b', '<PHONE>', 'g') AS clean_text
            FROM documents
        """,
        "curate_corpus": f"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 17 = 0 THEN '!!! ??? !!! ??? !!!'
                          ELSE text END AS text
              FROM documents
            ),
            salted AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id % 10 = 0
            ),
            t AS (
              SELECT doc_id, text,
                     len({_TOKENS}) AS n_tok,
                     CASE WHEN length(text) > 0
                          THEN CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                               / length(text) ELSE 0.0 END AS praw,
                     CASE WHEN len({_TOKENS}) > 0
                          THEN CAST(len(list_filter({_TOKENS},
                                 x -> x IN ('the','and','of','to','is','that','with','for'))) AS DOUBLE)
                               / len({_TOKENS}) ELSE 0.0 END AS sraw,
                     CASE WHEN len({_TOKENS}) > 0
                          THEN CAST(length(text) AS DOUBLE) / len({_TOKENS})
                          ELSE 0.0 END AS mean_len
              FROM salted
            ),
            good AS (
              SELECT doc_id, text FROM t
              WHERE (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END
                     + CASE WHEN praw < 0.3 THEN 1.0 ELSE 0.0 END
                     + CASE WHEN sraw > 0.01 THEN 1.0 ELSE 0.0 END
                     + CASE WHEN mean_len BETWEEN 2.0 AND 15.0 THEN 1.0 ELSE 0.0 END
                    ) / 4.0 >= 0.75
            ),
            dedup AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY sha256(text))
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '42'), 1, 8)) AS BIGINT) % 10000 < 9000
                        THEN 'train' ELSE 'val' END AS split
            FROM dedup
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY lang
                ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '42'), 1, 8)) AS BIGINT) % 2147483648,
                         doc_id
              ) AS rk
              FROM documents
            ) WHERE rk <= 30
        """,
        "train_val_split": """
            SELECT doc_id,
                   CASE
                     WHEN b < 8000 THEN 'train'
                     WHEN b < 9000 THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31) || '42'), 1, 8)) AS BIGINT) % 10000 AS b
              FROM documents
            )
        """,
        "remove_boilerplate": """
            WITH salted AS (
              SELECT doc_id,
                     'GENERATED FILE - DO NOT EDIT' || chr(10)
                     || CASE WHEN doc_id % 2 = 0 THEN 'cookie notice: accept all'
                             ELSE 'nav: home | about | contact' END || chr(10)
                     || text || chr(10)
                     || 'copyright 2024 example corp' AS text
              FROM documents
            ),
            split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM salted
            ),
            lines AS (
              SELECT doc_id, u['ord'] AS ord, u['line'] AS line FROM (
                SELECT doc_id,
                       unnest([{'ord': i, 'line': ls[i]}
                               for i in generate_series(1, len(ls))]) AS u
                FROM split
              )
            ),
            boiler AS (
              SELECT line FROM lines WHERE trim(line) <> ''
              GROUP BY line HAVING count(DISTINCT doc_id) >= 10
            )
            SELECT doc_id, string_agg(l.line, chr(10) ORDER BY l.ord) AS clean_text
            FROM lines l LEFT JOIN boiler b ON l.line = b.line
            WHERE b.line IS NULL
            GROUP BY doc_id
        """,
        "decontaminate": f"""
            WITH bench AS (
              SELECT DISTINCT unnest({_SHINGLES3}) AS gram
              FROM documents WHERE doc_id % 20 = 0 AND len({_TOKENS}) > 0
            ),
            doc_grams AS (
              SELECT doc_id, unnest({_SHINGLES3}) AS gram
              FROM documents WHERE doc_id % 20 <> 0 AND len({_TOKENS}) > 0
            )
            SELECT d.doc_id, count(*) AS n_grams,
                   CAST(count(b.gram) AS BIGINT) AS n_contaminated,
                   round(CAST(count(b.gram) AS DOUBLE) / count(*), 9) AS contamination
            FROM doc_grams d LEFT JOIN bench b ON d.gram = b.gram
            GROUP BY d.doc_id
        """,
        "dedup_substring": f"""
            WITH g AS (
              SELECT doc_id AS _id, unnest({_WINDOWS8}) AS gram FROM documents
            ), keep AS (
              SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 100
            )
            SELECT DISTINCT a._id AS id_a, b._id AS id_b
            FROM g a JOIN keep USING (gram) JOIN g b USING (gram)
            WHERE a._id < b._id
        """,
        "dedup_ngram_jaccard": f"""
            WITH sig AS (
              SELECT doc_id AS id, lang AS blk,
                     list_distinct({_TOKENS}) AS grams
              FROM documents WHERE len({_TOKENS}) > 0
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
            FROM sig a JOIN sig b ON a.blk = b.blk AND a.id < b.id
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.9
        """,
        "dedup_groups": f"""
            WITH RECURSIVE sig AS (
              SELECT doc_id AS id, lang AS blk,
                     list_distinct({_TOKENS}) AS grams
              FROM documents WHERE len({_TOKENS}) > 0
            ),
            edges AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM sig a JOIN sig b ON a.blk = b.blk AND a.id < b.id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.9
            ),
            und AS (
              SELECT id_a AS s, id_b AS d FROM edges
              UNION SELECT id_b, id_a FROM edges
            ),
            reach(a, b) AS (
              SELECT s, d FROM und
              UNION
              SELECT r.a, u.d FROM reach r JOIN und u ON r.b = u.s
            ),
            comp AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS component_id FROM reach GROUP BY a
            )
            SELECT CAST(component_id AS BIGINT) AS component_id,
                   count(*) AS n_members,
                   CAST(min(id) AS BIGINT) AS rep_id
            FROM comp GROUP BY component_id
        """,
        "dedup_fuzzy_resolve": f"""
            WITH RECURSIVE sig AS (
              SELECT doc_id AS id, lang AS blk,
                     list_distinct({_TOKENS}) AS grams
              FROM documents WHERE len({_TOKENS}) > 0
            ),
            edges AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM sig a JOIN sig b ON a.blk = b.blk AND a.id < b.id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.9
            ),
            und AS (
              SELECT id_a AS s, id_b AS d FROM edges
              UNION SELECT id_b, id_a FROM edges
            ),
            reach(a, b) AS (
              SELECT s, d FROM und
              UNION
              SELECT r.a, u.d FROM reach r JOIN und u ON r.b = u.s
            ),
            comp AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS component_id FROM reach GROUP BY a
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component_id)
        """,
        # dedup_minhash_lsh: with the fixed seeds/params here, the LSH
        # candidate set provably-with-overwhelming-probability covers every
        # pair at J>=0.5 (P[miss] = (1-J^2)^16 and the verify is exact), and
        # the result is deterministic — so the oracle is the exact 3-gram
        # Jaccard itself (verified equal; any regression hash-fails here).
        "dedup_minhash_lsh": f"""
            WITH sig AS (SELECT doc_id AS id, {_SHINGLES3} AS grams FROM documents WHERE len({_TOKENS}) > 0)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
            FROM sig a JOIN sig b ON a.id < b.id
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
        """,
        # dedup_minhash_groups: same edge set as dedup_minhash_lsh (exact
        # 3-gram Jaccard >= 0.5 — see the note above), closed transitively.
        "dedup_minhash_groups": f"""
            WITH RECURSIVE sig AS (
              SELECT doc_id AS id, {_SHINGLES3} AS grams
              FROM documents WHERE len({_TOKENS}) > 0
            ),
            edges AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM sig a JOIN sig b ON a.id < b.id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
            ),
            und AS (
              SELECT id_a AS s, id_b AS d FROM edges
              UNION SELECT id_b, id_a FROM edges
            ),
            reach(a, b) AS (
              SELECT s, d FROM und
              UNION
              SELECT r.a, u.d FROM reach r JOIN und u ON r.b = u.s
            ),
            comp AS (
              SELECT a AS id, LEAST(a, MIN(b)) AS component_id FROM reach GROUP BY a
            )
            SELECT CAST(component_id AS BIGINT) AS component_id,
                   count(*) AS n_members,
                   CAST(min(id) AS BIGINT) AS rep_id
            FROM comp GROUP BY component_id
        """,
        # dedup_embedding_lsh is a containment check (see the query
        # docstring): zero LSH-not-in-exact violations, anchored by the
        # SQL-derived true all-pairs count so an empty result can't pass.
        "dedup_embedding_lsh": """
            SELECT CAST(0 AS BIGINT) AS n_containment_violations,
                   CAST(count(*) AS BIGINT) AS n_true_pairs
            FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                         CAST(e2.embedding AS DOUBLE[])) >= 0.3
        """,
        # ann_topk_ivf / dedup_simhash are verification queries (see
        # their docstrings): the quantizer-model / hash-family dependent
        # candidate sets can't be reproduced in SQL, but their reported
        # distances are re-derived independently in-engine. r5: both now
        # return NON-VACUOUS summaries — result/exact-dup counts the SQL
        # side derives from the data, not just empty violation sets.
        "ann_topk_ivf": """
            SELECT vec_id AS query_id,
                   CAST(5 AS BIGINT) AS n_results,
                   CAST(0 AS BIGINT) AS n_violations
            FROM embeddings WHERE vec_id < 3
        """,
        "dedup_simhash": """
            WITH s AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 50 = 0
            ), d AS (
              SELECT doc_id, text FROM s WHERE length(trim(text)) > 0
            ), g AS (
              SELECT count(*) AS n FROM d GROUP BY text HAVING count(*) > 1
            )
            SELECT CAST(0 AS BIGINT) AS n_violations,
                   CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_exact_pairs,
                   CAST(0 AS BIGINT) AS n_exact_pairs_missing
            FROM g
        """,
        "text_stats": f"""
            SELECT doc_id,
                   len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) > 0
                        THEN CAST(len(list_filter({_TOKENS}, t -> t IN ({en}))) AS DOUBLE)
                             / len({_TOKENS})
                        ELSE 0.0 END AS stop_ratio_en,
                   {_lang_id_sql()} AS lang_guess
            FROM documents
        """,
        "doc_quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                     len({_TOKENS}) AS n_tok,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
                     CASE WHEN length(text) > 0
                          THEN CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
                               / length(text) ELSE 0.0 END AS praw,
                     CASE WHEN len({_TOKENS}) > 0
                          THEN CAST(len(list_filter({_TOKENS},
                                 x -> x IN ('the','and','of','to','is','that','with','for'))) AS DOUBLE)
                               / len({_TOKENS}) ELSE 0.0 END AS sraw,
                     CASE WHEN len({_TOKENS}) > 0
                          THEN CAST(length(text) AS DOUBLE) / len({_TOKENS})
                          ELSE 0.0 END AS mean_len
              FROM documents
            )
            SELECT doc_id,
                   n_bpe AS n_bpe_tokens,
                   round(praw, 6) AS punct_ratio,
                   (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END
                    + CASE WHEN praw < 0.3 THEN 1.0 ELSE 0.0 END
                    + CASE WHEN sraw > 0.01 THEN 1.0 ELSE 0.0 END
                    + CASE WHEN mean_len BETWEEN 2.0 AND 15.0 THEN 1.0 ELSE 0.0 END
                   ) / 4.0 AS quality
            FROM t
        """,
        "repetition_stats": """
            WITH lines AS (
              SELECT doc_id, string_split(text, chr(10)) AS l FROM documents
            ),
            toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
              FROM documents
            ),
            g AS (
              SELECT doc_id, list_extract(t, i) || ' ' || list_extract(t, i + 1) AS gram
              FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 2
            ),
            tc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            top AS (
              SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tg FROM tc GROUP BY 1
            )
            SELECT lines.doc_id,
                   round(CASE WHEN len(l) > 0
                         THEN CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l)
                         ELSE 0.0 END, 9) AS dup_line_frac,
                   round(COALESCE(tg, 0.0), 9) AS top_2gram_frac
            FROM lines LEFT JOIN top USING (doc_id)
        """,
        "clean_values": """
            SELECT doc_id,
                   regexp_replace(
                     trim(lower(strip_accents(
                       '  Café  ' || upper(source) || '  ÑANDÚ' || chr(9) || lang))),
                     '\\s+', ' ', 'g') AS cleaned
            FROM documents
        """,
        "fingerprint": "SELECT doc_id, sha256(text) AS fp FROM documents",
        "normalize_paths": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace('./' || source || '//docs///' || lang || '/', '^(\\./)+', ''),
                       '/{2,}', '/', 'g'),
                     '(.)/$', '\\1') AS norm_path
            FROM documents
        """,
        "sha256_udf": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "lang_of_path": """
            SELECT doc_id,
                   CASE lang WHEN 'en' THEN 'python' WHEN 'es' THEN 'markdown'
                             WHEN 'de' THEN 'rust' WHEN 'fr' THEN 'typescript'
                             ELSE 'unknown' END AS lang_tag
            FROM documents
        """,
        "dedup_embedding": """
            SELECT e1.vec_id AS id_a, e2.vec_id AS id_b
            FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
            WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                         CAST(e2.embedding AS DOUBLE[])) >= 0.3
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 3),
                 c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings)
            SELECT query_id, corpus_id, rank FROM (
              SELECT q.query_id, c.corpus_id,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.corpus_id ASC
                     ) AS rank
              FROM q, c WHERE q.query_id <> c.corpus_id
            ) WHERE rank <= 5
        """,
    }
