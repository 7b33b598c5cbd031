"""Table column statistics (sources/stats.py): the one-pass aggregate
must agree with direct per-column queries, survive a JSON round-trip,
and stay pinned to the analyzed table version."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyorchdb_spark.sources.lake import LakeTable
from pyorchdb_spark.sources.stats import analyze_table, column_stats, read_stats

DDL = "repo string, path string, seq long, lang string, size double, op string"


def test_column_stats_match_direct_queries(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stats = column_stats(ev)
    assert stats["_rows"] == ev.count()
    s = stats["value"]
    assert s["nulls"] == ev.filter(F.col("value").isNull()).count()
    assert s["count"] == stats["_rows"] - s["nulls"]
    assert s["min"] == ev.agg(F.min("value")).first()[0]
    assert s["max"] == ev.agg(F.max("value")).first()[0]
    exact = ev.select("user_id").distinct().count()
    approx = stats["user_id"]["approx_distinct"]
    assert abs(approx - exact) / exact < 0.1  # rsd=0.02, generous bound


def test_analyze_roundtrip_and_version_pinning(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    b1 = spark.createDataFrame(
        [("r", "a", 1, "py", 10.0, "upsert"), ("r", "b", 2, "rs", None, "upsert")], DDL
    )
    lake.merge(b1, batch_id="b1")
    stats = analyze_table(lake)
    assert stats["_rows"] == 2 and stats["size"]["nulls"] == 1
    got = read_stats(lake)
    assert got["_version"] == lake.manifest().version
    assert got["size"]["min"] == 10.0 and got["lang"]["approx_distinct"] == 2

    # new commit: head has no stats until re-analyzed; old version keeps its
    lake.merge(
        spark.createDataFrame([("r", "c", 3, "go", 4.0, "upsert")], DDL), batch_id="b2"
    )
    assert read_stats(lake) is None
    assert read_stats(lake, version=stats["_version"])["_rows"] == 2
    assert analyze_table(lake)["_rows"] == 3


def test_cli_analyze(spark, tmp_path, capsys):
    import importlib.util
    import json as _json
    import os as _os
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "jobs_ingest", _os.path.join(repo, "jobs", "ingest.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    events = str(tmp_path / "events")
    table = str(tmp_path / "t")
    mod.main(["generate", "--out", events, "--n-events", "1000", "--batch-size", "500"])
    capsys.readouterr()
    mod.main(["replay", "--events", events, "--table", table, "--no-warmup"])
    capsys.readouterr()
    mod.main(["analyze", "--table", table])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0 and out["columns"] >= 5

    from pyorchdb_spark.sources.lake import LakeTable
    from pyorchdb_spark.sources.stats import read_stats

    stats = read_stats(LakeTable(spark, table))
    assert stats is not None and stats["_rows"] == out["rows"]
