"""Stream-stream watermarked interval join (streaming/join.py) vs its
batch twin: the same function run over micro-batch file streams must
produce exactly the batch join's rows, including matches that span
micro-batch boundaries (left row in one batch, right row in an earlier
one buffered in join state)."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from pyorchdb_spark.streaming.join import interval_stream_join


def _split_parquet(spark, src_df, out_dir: str, n_batches: int, order_col: str):
    """Write time-ordered micro-batch parquet files with pinned mtimes so
    the file source replays them deterministically in order."""
    os.makedirs(out_dir, exist_ok=True)
    pdf = src_df.toPandas().sort_values(order_col).reset_index(drop=True)
    # pandas writes naive datetimes as parquet NTZ; localize so the files
    # round-trip as true TIMESTAMP (what the watermark needs)
    if pdf[order_col].dt.tz is None:
        pdf[order_col] = pdf[order_col].dt.tz_localize("UTC")
    step = (len(pdf) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        p = os.path.join(out_dir, f"b{i:03d}.parquet")
        chunk.to_parquet(p, coerce_timestamps="us")  # Spark reads micros, not nanos
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def _run_append(spark, df_stream, ckpt: str):
    name = f"j_{uuid.uuid4().hex[:8]}"
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # stream-stream joins are append-only
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_join_matches_batch(spark, sf_dir, tmp_path):
    # watermarks require TIMESTAMP (with zone); the fixture stores NTZ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )

    expected = sorted(
        (r["user_id"], r["event_id"], r["event_id_r"])
        for r in interval_stream_join(
            signups, clicks, by="user_id", lookback="30 minutes"
        ).collect()
    )
    assert expected, "fixture must produce at least one attribution pair"

    sdir, cdir = str(tmp_path / "s"), str(tmp_path / "c")
    _split_parquet(spark, signups, sdir, 3, "ts")
    _split_parquet(spark, clicks, cdir, 3, "ts")
    s_stream = spark.readStream.schema(signups.schema).option("maxFilesPerTrigger", 1).parquet(sdir)
    c_stream = spark.readStream.schema(clicks.schema).option("maxFilesPerTrigger", 1).parquet(cdir)
    joined = interval_stream_join(
        s_stream, c_stream, by="user_id", lookback="30 minutes", watermark="6 hours"
    )
    got_df = _run_append(spark, joined, str(tmp_path / "ckpt"))
    got = sorted((r["user_id"], r["event_id"], r["event_id_r"]) for r in got_df.collect())
    assert got == expected


def test_interval_join_plan_is_equi_hash_not_nlj(spark, sf_dir):
    """The interval join must compile to an EQUI join on the key with the
    time range as a residual condition — never a nested-loop/cartesian
    pair enumeration (which would be quadratic at scale)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    plan = (
        interval_stream_join(s, c, by="user_id", lookback="30 minutes")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join [user_id" in plan or "Join [coalesce(user_id" in plan or "HashJoin" in plan or "SortMergeJoin" in plan
