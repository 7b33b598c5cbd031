"""operators/ranking.py: the two-phase distributed rank/ntile must be
bit-identical to the single-task Window.orderBy() reference form."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyorchdb_spark.operators.ranking import global_ntile, global_rank


def _rand_df(spark, n, seed, dup_every=3):
    rnd = random.Random(seed)
    # deliberate heavy ties in v: the composite (v, id) total order is
    # what makes the distributed numbering well-defined
    rows = [(i, rnd.randint(0, n // dup_every)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long").repartition(7)


def test_global_rank_matches_single_task_window(spark):
    df = _rand_df(spark, 500, seed=1)
    order = [F.desc("v"), F.asc("id")]
    got = {r["id"]: r["rank"] for r in global_rank(df, order, num_partitions=5).collect()}
    ref = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(Window.orderBy(*order))).collect()
    }
    assert got == ref


def test_global_ntile_matches_sql_ntile_uneven(spark):
    # n=503, k=10 -> 3 tiles of 51, 7 of 50: exercises the uneven split
    df = _rand_df(spark, 503, seed=2)
    order = [F.asc("v"), F.asc("id")]
    got = {r["id"]: r["tile"] for r in global_ntile(df, order, k=10, num_partitions=4).collect()}
    ref = {
        r["id"]: r["tile"]
        for r in df.withColumn("tile", F.ntile(10).over(Window.orderBy(*order))).collect()
    }
    assert got == ref


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = _rand_df(spark, 6, seed=3)
    got = {r["id"]: r["tile"] for r in global_ntile(df, [F.asc("id")], k=10).collect()}
    ref = {
        r["id"]: r["tile"]
        for r in df.withColumn("tile", F.ntile(10).over(Window.orderBy(F.asc("id")))).collect()
    }
    assert got == ref


def test_global_rank_slices_are_contiguous_and_parallel(spark):
    """The phase-1 range slices must (a) be MULTIPLE — no slice holds
    everything, the failure mode a plain Window.orderBy() would have —
    and (b) each hold a CONTIGUOUS span of the total order, which is the
    property the cumulative-offset arithmetic rests on.  Asserted on the
    operator's internal slice id (physical placement afterwards is
    AQE's business, not the contract)."""
    from pyorchdb_spark.operators.ranking import _LOCAL, _PID, _locally_numbered

    df = _rand_df(spark, 500, seed=4)
    order = [F.asc("v"), F.asc("id")]
    local = _locally_numbered(df, order, num_partitions=5)
    rows = local.select("v", "id", _PID, _LOCAL).collect()
    assert len({r[_PID] for r in rows}) > 1, "all rows landed in one slice"
    # slices partition the SORTED sequence into contiguous runs: the
    # max key of slice i precedes the min key of slice i+1
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r[_PID], []).append((r["v"], r["id"], r[_LOCAL]))
    prev_max = None
    for pid in sorted(by_pid):
        keys = sorted((v, i) for v, i, _ in by_pid[pid])
        locals_ = sorted(loc for _, _, loc in by_pid[pid])
        assert locals_ == list(range(1, len(keys) + 1))
        if prev_max is not None and keys:
            assert prev_max <= keys[0]
        if keys:
            prev_max = keys[-1]
