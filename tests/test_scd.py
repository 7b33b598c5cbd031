"""SCD2 history build / point-in-time read / transition counts
(operators/scd.py) — exact semantics on hand-built changelogs, plus a
plan-shape check that the two window passes share one shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.operators.scd import (
    scd2_apply_batch,
    scd2_history,
    state_asof,
    transition_counts,
)


@pytest.fixture(scope="module")
def changelog(spark):
    # user 1: a->a->b->b->a  (runs: a@1, b@3, a@5)
    # user 2: x              (single open version)
    rows = [
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "b"), (1, 5, "a"),
        (2, 10, "x"),
    ]
    return spark.createDataFrame(rows, "user_id int, seq int, state string")


def test_scd2_collapses_noop_updates(changelog):
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    got = {
        (r.user_id, r.valid_from_seq): (r.state, r.valid_to_seq, r.is_current)
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("a", 3, False),
        (1, 3): ("b", 5, False),
        (1, 5): ("a", None, True),
        (2, 10): ("x", None, True),
    }


def test_scd2_asof_read(changelog):
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    # at seq 4 user 1 is in the b-version [3, 5); user 2 not yet born
    asof4 = {(r.user_id): r.state for r in state_asof(hist, 4).collect()}
    assert asof4 == {1: "b"}
    # at seq 10 both current versions are visible
    asof10 = {(r.user_id): r.state for r in state_asof(hist, 10).collect()}
    assert asof10 == {1: "a", 2: "x"}


def test_scd2_multi_state_columns(spark):
    rows = [(1, 1, "a", 10), (1, 2, "a", 10), (1, 3, "a", 20)]
    df = spark.createDataFrame(rows, "k int, seq int, s string, v int")
    hist = scd2_history(df, ["k"], "seq", ["s", "v"])
    # v changed at seq 3 even though s did not -> two versions
    assert sorted(r.valid_from_seq for r in hist.collect()) == [1, 3]


def test_transition_counts(changelog):
    got = {
        (r.prev_state, r.next_state): r.n_transitions
        for r in transition_counts(changelog, ["user_id"], "seq", "state").collect()
    }
    # user 1 pairs: (a,a) (a,b) (b,b) (b,a); user 2 contributes none
    assert got == {("a", "a"): 1, ("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def _hist_set(df):
    return {
        (r.user_id, r.valid_from_seq, r.state, r.valid_to_seq, r.is_current)
        for r in df.collect()
    }


@pytest.mark.parametrize(
    "batch_rows",
    [
        # same-state boundary: batch opens with the state user 1 already
        # holds -> must collapse into the open version, not fork a new one
        [(1, 6, "a"), (1, 7, "c")],
        # new key only
        [(3, 1, "z")],
        # mixed: new version for user 1, new key, and user-2 extension
        [(1, 8, "b"), (2, 11, "y"), (3, 1, "z")],
        # empty batch
        [],
    ],
)
def test_incremental_equals_rebuild(spark, changelog, batch_rows):
    schema = "user_id int, seq int, state string"
    batch = spark.createDataFrame(batch_rows, schema)
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    inc = scd2_apply_batch(hist, batch, ["user_id"], "seq", ["state"])
    full = scd2_history(
        changelog.unionByName(batch), ["user_id"], "seq", ["state"]
    )
    assert _hist_set(inc) == _hist_set(full)


def test_incremental_drops_stale_events(spark, changelog):
    """An event at or below the key's last_seq watermark lands inside a
    possibly-collapsed run; replaying it from change points alone would
    silently diverge from a rebuild, so it must be DROPPED and the
    history (watermark included) left exactly as it was."""
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    # user 1's watermark is 5 (events 1..5): seqs 2 and 5 are both stale
    stale = spark.createDataFrame(
        [(1, 2, "q"), (1, 5, "q")], "user_id int, seq int, state string"
    )
    out = scd2_apply_batch(hist, stale, ["user_id"], "seq", ["state"])
    assert _hist_set(out) == _hist_set(hist)
    # watermark survives the round-trip (synthetic no-op re-injection)
    wm = {r.user_id: r.last_seq for r in out.filter("is_current").collect()}
    assert wm == {1: 5, 2: 10}


def test_incremental_touches_only_batch_keys(spark, changelog):
    """The untouched side is carried by an anti join, not recomputed:
    the plan must contain exactly one anti and one semi join, and the
    batch key set must be broadcast."""
    batch = spark.createDataFrame([(1, 6, "c")], "user_id int, seq int, state string")
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    out = scd2_apply_batch(hist, batch, ["user_id"], "seq", ["state"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one anti join carries the untouched majority; the affected slice is
    # consumed three ways (reopen, watermark rows, stale gate) -> three
    # semi joins, all broadcast, never a sort-merge or nested-loop
    assert plan.count("LeftAnti") == 1, plan
    assert plan.count("LeftSemi") == 3, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan


def test_scd2_single_shuffle(changelog):
    """Both window passes run off ONE exchange on the key columns."""
    hist = scd2_history(changelog, ["user_id"], "seq", ["state"])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scd2_lake_table_bucket_pruned_folds(spark, tmp_path):
    """Lake-backed SCD2 (sources/scd_table.py, VERDICT r4 next #8): folds
    read only the batch's affected key-buckets, untouched files ride the
    manifest unchanged, and the stored history stays bit-identical to a
    full rebuild over the concatenated log."""
    from pyorchdb_spark.generator import change_events
    from pyorchdb_spark.sources.scd_table import Scd2Table

    ev = change_events(spark, 12_000, batch_size=4_000).cache()
    try:
        t = Scd2Table(
            spark, str(tmp_path / "scd"),
            key_cols=["repo", "path"], seq_col="seq", state_cols=["op", "lang"],
        )
        for b in ("b000000", "b000001", "b000002"):
            t.apply_batch(ev.filter(F.col("batch_id") == b), batch_id=b, num_files=16)

        full = scd2_history(
            ev.select("repo", "path", "seq", "op", "lang"),
            ["repo", "path"], "seq", ["op", "lang"],
        )
        cols = ["repo", "path", "valid_from_seq", "valid_to_seq", "is_current",
                "last_seq", "op", "lang"]
        got = t.read().select(*cols)
        exp = full.select(*cols)
        assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()

        # bucket pruning is real: a 1-key batch affects exactly one bucket
        # file; every other file path carries over verbatim
        one = ev.filter(F.col("batch_id") == "b000002").limit(1).collect()[0]
        m_before = t.lake.manifest()
        tiny = spark.createDataFrame(
            [(one["repo"], one["path"], int(one["seq"]) + 10_000, "upsert", "zz")],
            "repo string, path string, seq long, op string, lang string",
        )
        affected, untouched = t.lake._affected_files(m_before, tiny)
        assert len(affected) == 1 and len(untouched) == len(m_before.files) - 1
        t.apply_batch(tiny, batch_id="tiny")
        m_after = t.lake.manifest()
        carried = {f["path"] for f in m_after.files} & {f["path"] for f in m_before.files}
        assert carried == {f["path"] for f in untouched}
        # and the tiny fold is still rebuild-exact
        ev2 = ev.select("repo", "path", "seq", "op", "lang").unionByName(tiny)
        exp2 = scd2_history(ev2, ["repo", "path"], "seq", ["op", "lang"]).select(*cols)
        got2 = t.read().select(*cols)
        assert got2.exceptAll(exp2).isEmpty() and exp2.exceptAll(got2).isEmpty()
    finally:
        ev.unpersist()
