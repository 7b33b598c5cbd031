"""Merge-on-read delta commits (sources/lake.py ``merge(mor=True)``).

MoR is the scale-correct write path when batch keys disperse across most
buckets: a delta commit writes bytes proportional to the BATCH, never the
table, and reads resolve LWW across base+delta until compaction. These
tests pin state-equality with the copy-on-write path, idempotency,
out-of-order delete protection, schema evolution, and the replay
self-compaction policy.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyorchdb_spark.generator import change_events
from pyorchdb_spark.ingest import replay
from pyorchdb_spark.sources.catalog import BatchLedger
from pyorchdb_spark.sources.lake import RETAIN_ALL_TOMBSTONES, LakeTable


def _sig(df):
    rows = df.select("repo", "path", "content_sha256").fillna("<null>").collect()
    return {tuple(r) for r in rows}


def test_mor_replay_equals_cow(spark, tmp_path):
    ev = change_events(spark, 4_000, batch_size=1_000)

    cow_root, mor_root = str(tmp_path / "cow"), str(tmp_path / "mor")
    replay(LakeTable(spark, cow_root), BatchLedger(spark, cow_root), ev, num_files=4)
    lake_mor = LakeTable(spark, mor_root)
    replay(lake_mor, BatchLedger(spark, mor_root), ev, num_files=4, mor=True)

    assert _sig(lake_mor.snapshot()) == _sig(LakeTable(spark, cow_root).snapshot())
    # batches 2..4 landed as deltas; base files from batch 1 untouched
    m = lake_mor.manifest()
    assert any(f.get("delta") for f in m.files)

    # compaction folds deltas to base; state unchanged
    sig_before = _sig(lake_mor.snapshot())
    lake_mor.compact(tombstone_watermark_seq=RETAIN_ALL_TOMBSTONES)
    m2 = lake_mor.manifest()
    assert not any(f.get("delta") for f in m2.files)
    assert _sig(lake_mor.snapshot()) == sig_before
    # RETAIN_ALL keeps tombstones (late-event protection persists)
    assert (
        lake_mor.snapshot(include_tombstones=True).filter(F.col("op") == "delete").count() > 0
    )


def test_mor_delta_write_proportional_to_batch(spark, tmp_path):
    """The point of MoR: a later commit's new bytes scale with the batch,
    not the table — no base file is rewritten."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 4_000, batch_size=2_000)
    replay(lake, ledger, ev, num_files=8, mor=True)

    m = lake.manifest()
    base = [f for f in m.files if not f.get("delta")]
    delta = [f for f in m.files if f.get("delta")]
    assert base and delta
    # every base file path is still the batch-1 commit's path (untouched)
    assert all(f["path"].split("/")[1].startswith("commit-00000001") for f in base)
    # delta rows ~ batch-2 LWW winners, far below table rows
    assert sum(f["rows"] for f in delta) <= 2_200  # one 2k-event batch (incl. dups)


def test_mor_idempotent_and_out_of_order_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=2, mor=True)
    sig1 = _sig(lake.snapshot())

    # crash between manifest publish and marker write → re-apply appends a
    # duplicate delta; LWW resolution makes it a logical no-op
    last = "b000001"
    os.unlink(os.path.join(ledger.markers_dir, f"{last}.json"))
    replay(lake, ledger, ev.filter(F.col("batch_id") == last), num_files=2, mor=True)
    assert _sig(lake.snapshot()) == sig1

    # out-of-order late upsert below an applied delete's seq stays dead.
    # Pick a key whose FINAL state is a tombstone (post-LWW resolve).
    dead = lake.snapshot(include_tombstones=True).filter(F.col("op") == "delete").first()
    late = ev.limit(1).select(
        F.lit(dead.repo).alias("repo"),
        F.lit(dead.path).alias("path"),
        F.lit("latecommit").alias("commit"),
        F.lit(dead.seq - 1).cast("long").alias("seq"),
        F.lit("upsert").alias("op"),
        F.lit(dead.lang).alias("lang"),
        F.lit("resurrect attempt").alias("content"),
        F.lit("late").alias("batch_id"),
        F.current_timestamp().alias("ts"),
        F.lit(None).cast("string").alias("lang_variant"),
    )
    replay(lake, ledger, late, num_files=2, mor=True)
    live = lake.snapshot().filter((F.col("repo") == dead.repo) & (F.col("path") == dead.path))
    assert live.count() == 0


def test_mor_schema_evolution_and_self_compaction(spark, tmp_path):
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 6_000, batch_size=1_000, evolution_batch=3)
    # compact after every 2 delta commits
    replay(lake, ledger, ev, num_files=4, mor=True, mor_compact_factor=2)

    m = lake.manifest()
    delta_commits = len({f["path"].split("/")[1] for f in m.files if f.get("delta")})
    assert delta_commits < 2  # policy kept the delta backlog bounded

    # evolved column visible and populated for late batches only
    snap = lake.snapshot()
    assert "lang_variant" in snap.columns
    assert snap.filter(F.col("lang_variant").isNotNull()).count() > 0

    # full-state parity with a CoW replay of the same log
    cow_root = str(tmp_path / "cow")
    replay(LakeTable(spark, cow_root), BatchLedger(spark, cow_root), ev, num_files=4)
    assert _sig(lake.snapshot()) == _sig(LakeTable(spark, cow_root).snapshot())
