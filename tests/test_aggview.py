"""Durable maintained aggregate view (sources/aggview.py): after any
sequence of merges/deletes/compactions and any refresh cadence, read()
must equal the full recompute over the base table's snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyorchdb_spark.operators.ivm import group_contributions
from pyorchdb_spark.sources.aggview import MaintainedAggregate
from pyorchdb_spark.sources.lake import LakeTable

DDL = "repo string, path string, seq long, lang string, size double, op string"


def _b(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _truth(lake):
    return {
        r["grp"]: (r["n_rows"], r["sum_size"])
        for r in group_contributions(lake.snapshot(), "lang", ["size"]).collect()
    }


def _got(view):
    return {
        r["grp"]: (r["n_rows"], r["sum_size"])
        for r in view.refresh().collect()
    }


BATCHES = [
    [("r1", "a.py", 1, "py", 10.0, "upsert"), ("r1", "b.rs", 2, "rs", 20.0, "upsert")],
    [("r1", "a.py", 3, "py", 11.0, "upsert"), ("r2", "c.py", 4, "py", 5.0, "upsert")],
    [("r1", "b.rs", 5, "rs", 0.0, "delete"), ("r2", "d.go", 6, "go", 2.5, "upsert")],
]


def test_refresh_per_commit_and_catchup(spark, tmp_path):
    for mor in (False, True):
        lake = LakeTable(spark, str(tmp_path / f"lake_{mor}"), keys=("repo", "path"))
        view = MaintainedAggregate(lake, str(tmp_path / f"view_{mor}"), "lang", ["size"])
        # per-commit refresh
        for i, rows in enumerate(BATCHES[:2]):
            lake.merge(_b(spark, rows), batch_id=f"b{i}", mor=mor)
            assert _got(view) == _truth(lake), f"mor={mor} batch={i}"
        # multi-version catch-up: two commits, one refresh
        lake.merge(_b(spark, BATCHES[2]), batch_id="b2", mor=mor)
        lake.merge(
            _b(spark, [("r3", "e.py", 7, "py", 1.0, "upsert")]), batch_id="b3", mor=mor
        )
        assert _got(view) == _truth(lake), f"mor={mor} catchup"
        # no-op refresh at head keeps the same view version
        v = view.current_version()
        view.refresh()
        assert view.current_version() == v


def test_refresh_skips_compaction_and_survives_it(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    view = MaintainedAggregate(lake, str(tmp_path / "view"), "lang", ["size"])
    for i, rows in enumerate(BATCHES):
        lake.merge(_b(spark, rows), batch_id=f"b{i}", mor=True)
    view.refresh()
    lake.compact()
    lake.merge(_b(spark, [("r9", "z.go", 9, "go", 4.0, "upsert")]), batch_id="b9", mor=True)
    assert _got(view) == _truth(lake)


def test_group_vanishes_and_user_view_shape(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    view = MaintainedAggregate(lake, str(tmp_path / "view"), "lang", ["size"])
    lake.merge(_b(spark, BATCHES[0]), batch_id="b0")
    view.refresh()
    lake.merge(_b(spark, [("r1", "b.rs", 5, "rs", 0.0, "delete")]), batch_id="b1")
    got = _got(view)
    assert "rs" not in got and got["py"][0] == 1
    row = {r["grp"]: r for r in view.read().collect()}["py"]
    assert row["total_size"] == 10.0 and row["avg_size"] == 10.0


def test_bootstrap_on_existing_table(spark, tmp_path):
    """A view created AFTER the table has history bootstraps from the
    snapshot, then maintains incrementally."""
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    for i, rows in enumerate(BATCHES[:2]):
        lake.merge(_b(spark, rows), batch_id=f"b{i}")
    view = MaintainedAggregate(lake, str(tmp_path / "view"), "lang", ["size"])
    assert _got(view) == _truth(lake)
    lake.merge(_b(spark, BATCHES[2]), batch_id="b2")
    assert _got(view) == _truth(lake)
