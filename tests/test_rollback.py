"""rollback() — the RESTORE shape: roll FORWARD to a past version's
state, keep history immutable, rewind the seq horizon so downstream
incremental consumers are told to resync instead of silently keeping
rolled-back state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.operators.ivm import group_contributions
from pyorchdb_spark.sources.aggview import MaintainedAggregate
from pyorchdb_spark.sources.lake import LakeTable

DDL = "repo string, path string, seq long, lang string, size double, op string"


def _b(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _state(lake, version=None):
    return {
        (r["repo"], r["path"], r["seq"]) for r in lake.snapshot(version=version).collect()
    }


def test_rollback_restores_state_and_keeps_history(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    lake.merge(_b(spark, [("r", "a", 1, "py", 1.0, "upsert")]), batch_id="b1")
    v1 = lake.manifest().version
    v1_state = _state(lake)
    lake.merge(
        _b(spark, [("r", "b", 2, "rs", 2.0, "upsert"), ("r", "a", 3, "py", 9.0, "upsert")]),
        batch_id="b2",
    )
    v2 = lake.manifest().version
    v2_state = _state(lake)

    m = lake.rollback(v1)
    assert m.version == v2 + 1 and m.batch_id == f"rollback-to-{v1}"
    assert _state(lake) == v1_state          # head shows the restored state
    assert _state(lake, version=v2) == v2_state  # bad version still time-travels
    # a rollback can itself be rolled back (restore the newer state)
    lake.rollback(v2)
    assert _state(lake) == v2_state


def test_rollback_rewinds_head_seq_and_changes_since_guards(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    lake.merge(_b(spark, [("r", "a", 1, "py", 1.0, "upsert")]), batch_id="b1")
    v1 = lake.manifest().version
    lake.merge(_b(spark, [("r", "b", 5, "rs", 2.0, "upsert")]), batch_id="b2")
    assert lake.manifest().head_seq == 5
    # caught-up consumer: since == horizon is fine (empty changeset)
    assert lake.changes_since(5).count() == 0

    lake.rollback(v1)
    assert lake.manifest().head_seq == 1  # horizon rewound
    # the same consumer is now AHEAD of the table — must be told to resync
    with pytest.raises(ValueError, match="rolled back"):
        lake.changes_since(5)
    # a consumer at/behind the restored horizon proceeds normally
    assert lake.changes_since(0).count() == 1


def test_head_seq_monotone_through_tombstone_gc(spark, tmp_path):
    """A drop-all compaction lowers the surviving files' max seq but the
    HORIZON stays — a consumer checkpointed at the dropped tombstone's
    seq must NOT be falsely told the table was rolled back."""
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    lake.merge(
        _b(spark, [("r", "a", 1, "py", 1.0, "upsert"), ("r", "a", 9, "py", 0.0, "delete")]),
        batch_id="b1",
    )
    lake.compact()  # drop-all: the seq-9 tombstone is physically gone
    assert lake.manifest().head_seq == 9
    assert lake.changes_since(9).count() == 0  # no false rollback error


def test_aggview_rebootstraps_across_rollback(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"), keys=("repo", "path"))
    view = MaintainedAggregate(lake, str(tmp_path / "view"), "lang", ["size"])
    lake.merge(_b(spark, [("r", "a", 1, "py", 1.0, "upsert")]), batch_id="b1")
    v1 = lake.manifest().version
    lake.merge(_b(spark, [("r", "b", 2, "rs", 2.0, "upsert")]), batch_id="b2")
    view.refresh()
    lake.rollback(v1)  # key (r, b) vanishes without appearing in new files
    lake.merge(_b(spark, [("r", "c", 3, "go", 4.0, "upsert")]), batch_id="b3")
    got = {r["grp"]: (r["n_rows"], r["sum_size"]) for r in view.refresh().collect()}
    truth = {
        r["grp"]: (r["n_rows"], r["sum_size"])
        for r in group_contributions(lake.snapshot(), "lang", ["size"]).collect()
    }
    assert got == truth and "rs" not in got
