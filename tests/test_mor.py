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


def _one_event(ev, repo, path, seq, op, content, batch_id, lang="py"):
    return ev.limit(1).select(
        F.lit(repo).alias("repo"),
        F.lit(path).alias("path"),
        F.lit(f"c{seq}").alias("commit"),
        F.lit(seq).cast("long").alias("seq"),
        F.lit(op).alias("op"),
        F.lit(lang).alias("lang"),
        F.lit(content).alias("content"),
        F.lit(batch_id).alias("batch_id"),
        F.current_timestamp().alias("ts"),
        F.lit(None).cast("string").alias("lang_variant"),
    )


def test_tombstone_gc_watermark_drops_dead_keys_and_blocks_stragglers(spark, tmp_path):
    """VERDICT r2 #4: with an opt-in disorder contract
    (tombstone_lag_batches), compaction derives a low-watermark from the
    lineage history and PHYSICALLY drops tombstones at or below it; an
    out-of-order upsert below the recorded watermark is quarantined
    (below_watermark), so the vanished tombstone can never be
    resurrected."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    # mor_compact_factor=1 -> compact after every delta commit;
    # lag=1 -> watermark trails the head batch by one
    replay(lake, ledger, ev, num_files=2, mor=True, mor_compact_factor=1,
           tombstone_lag_batches=1)

    m = lake.manifest()
    assert m.tombstone_watermark is not None
    wm = m.tombstone_watermark
    lw = ledger.low_watermark(lag_batches=1)
    assert lw == wm

    # every tombstone at or below the watermark is physically gone
    stored = lake.snapshot(include_tombstones=True)
    assert stored.filter((F.col("op") == "delete") & (F.col("seq") <= wm)).count() == 0
    # the GC actually dropped something: the un-gated replay keeps them
    root2 = str(tmp_path / "ref")
    lake2, ledger2 = LakeTable(spark, root2), BatchLedger(spark, root2)
    replay(lake2, ledger2, ev, num_files=2, mor=True, mor_compact_factor=1)
    kept = (
        lake2.snapshot(include_tombstones=True)
        .filter((F.col("op") == "delete") & (F.col("seq") <= wm))
        .count()
    )
    assert kept > 0
    # live state identical with and without GC (GC only removes markers)
    assert _sig(lake.snapshot()) == _sig(lake2.snapshot())

    # pick a key deleted at seq <= wm in the reference table; its
    # tombstone is GC'd in `lake`. A straggler upsert BELOW the watermark
    # must be quarantined, not merged.
    dead = (
        lake2.snapshot(include_tombstones=True)
        .filter((F.col("op") == "delete") & (F.col("seq") <= wm))
        .first()
    )
    late = _one_event(ev, dead.repo, dead.path, max(dead.seq - 1, 0), "upsert",
                      "resurrect attempt", "zlate", lang=dead.lang)
    res = replay(lake, ledger, late, num_files=2, mor=True)
    assert res[0].rows_rejected == 1
    live = lake.snapshot().filter(
        (F.col("repo") == dead.repo) & (F.col("path") == dead.path)
    )
    assert live.count() == 0  # not resurrected
    reasons = {r["reject_reason"] for r in ledger.rejects().collect()}
    assert "below_watermark" in reasons

    # an event ABOVE the watermark for the same key merges normally
    fresh = _one_event(ev, dead.repo, dead.path, wm + 10_000, "upsert",
                       "legit recreate", "zfresh", lang=dead.lang)
    replay(lake, ledger, fresh, num_files=2, mor=True)
    assert lake.snapshot().filter(
        (F.col("repo") == dead.repo) & (F.col("path") == dead.path)
    ).count() == 1


def test_low_watermark_derivation(spark, tmp_path):
    """low_watermark = max_seq of the batch lag_batches behind the head,
    lowered by any observed straggler in the lag window; None until
    enough batches committed."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    assert ledger.low_watermark() is None

    ev = change_events(spark, 3_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=2)
    lin = ledger.lineage().groupBy("batch_id").agg(
        F.max("max_seq").alias("mx"), F.min("min_seq").alias("mn")
    ).collect()
    by_batch = {r["batch_id"]: r for r in lin}
    batches = sorted(by_batch)
    assert len(batches) == 3

    expected = max(by_batch[b]["mx"] for b in batches[:-1])
    head_min = by_batch[batches[-1]]["mn"]
    if head_min is not None:
        expected = min(expected, head_min - 1)
    assert ledger.low_watermark(lag_batches=1) == expected
    assert ledger.low_watermark(lag_batches=3) is None


def test_partial_compaction_rewrites_only_hot_groups(spark, tmp_path):
    """VERDICT r2 #5: compact_partial folds only bucket groups whose
    delta backlog exceeds the bounds; cold base files keep their paths
    BYTE-identically, and resolved state matches a full compaction."""
    import hashlib

    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 4_000, batch_size=4_000)
    replay(lake, ledger, ev, num_files=8, mor=True)  # base at 8 buckets
    m0 = lake.manifest()
    sig_full = _sig(lake.snapshot())

    # a tiny delta touching exactly ONE existing key -> one hot group
    one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    from pyorchdb_spark.ingest import apply_batch

    apply_batch(lake, ledger, _one_event(ev, one.repo, one.path, 10_000_000,
                                         "upsert", "hot!", "zhot", lang=one.lang),
                "zhot", mor=True)
    m1 = lake.manifest()
    delta_files = [f for f in m1.files if f.get("delta")]
    assert delta_files
    hot_buckets = {f["bucket"] % 8 for f in delta_files}

    def sha(relpath):
        with open(os.path.join(root, relpath), "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()

    cold_before = {
        f["path"]: sha(f["path"])
        for f in m1.files
        if not f.get("delta") and f["bucket"] % 8 not in hot_buckets
    }

    # delta_fraction=0: any group with a delta exceeds -> the hot group
    # is selected while delta-free groups stay untouched
    m2 = lake.compact_partial(
        delta_fraction=0.0, tombstone_watermark_seq=RETAIN_ALL_TOMBSTONES
    )
    assert m2.version == m1.version + 1
    assert not any(f.get("delta") for f in m2.files)  # hot group folded
    # cold base files: same paths, same bytes
    paths_after = {f["path"] for f in m2.files}
    for p, h in cold_before.items():
        assert p in paths_after and sha(p) == h
    # only the hot group was rewritten
    rewritten = paths_after - {f["path"] for f in m1.files}
    assert all(f"commit-{m2.version:08d}" in p for p in rewritten)
    assert {int(p.split("_bucket=")[1].split("/")[0]) % 8 for p in rewritten} <= hot_buckets

    # resolved state identical to pre-compaction and carries the patch
    sig_after = _sig(lake.snapshot())
    assert sig_after != sig_full  # the patch is visible
    got = lake.snapshot().filter(
        (F.col("repo") == one.repo) & (F.col("path") == one.path)
    ).collect()
    assert len(got) == 1 and got[0]["content"] == "hot!"


def test_partial_compaction_noop_below_bounds(spark, tmp_path):
    """A delta backlog below both bounds publishes NO new version."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 4_000, batch_size=4_000)
    replay(lake, ledger, ev, num_files=8, mor=True)
    one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    from pyorchdb_spark.ingest import apply_batch

    apply_batch(lake, ledger, _one_event(ev, one.repo, one.path, 10_000_000,
                                         "upsert", "tiny", "ztiny", lang=one.lang),
                "ztiny", mor=True)
    v = lake.manifest().version
    # fraction bound huge, file bound high -> nothing exceeds
    m = lake.compact_partial(delta_fraction=0.99, max_delta_files_per_group=100)
    assert m.version == v  # unchanged manifest returned
    assert any(f.get("delta") for f in m.files)


def test_low_watermark_orders_by_commit_time_not_batch_id(spark, tmp_path):
    """ADVICE r3 #1: batches from heterogeneous feeders ('b%06d' replay +
    'stream-<sha>-<epoch>' tails) do NOT sort in time order
    lexicographically; low_watermark must order them by the durable
    committed_at ordinal recorded in lineage."""
    root = str(tmp_path / "t")
    ledger = BatchLedger(spark, root)

    def rec(batch_id, mn, mx):
        ledger.record_lineage(
            batch_id,
            [{"partition_id": 0, "rows_in": mx - mn + 1, "tombstones": 0,
              "max_seq": mx, "min_seq": mn}],
            table_rows_after=0,
        )

    # COMMIT order (time): stream, stream, replay, replay — seqs increase
    # with time. Lexicographic order would be [b000001, b000002,
    # stream-a..., stream-b...], i.e. the two replay batches (the NEWEST)
    # misfiled as the oldest.
    rec("stream-aaaa-100", 1, 100)
    rec("stream-bbbb-200", 101, 200)
    rec("b000001", 201, 300)
    rec("b000002", 301, 400)

    # commit-time order, lag=2: body = the two stream batches -> w =
    # max(100, 200) = 200; head mins cap = min(201, 301) - 1 = 200.
    assert ledger.low_watermark(lag_batches=2) == 200
    # (a lexicographic sort would put b000001/b000002 in the body ->
    # w = 400, capped by min(1, 101) - 1 = 0 — wrong either way)


def test_compact_partial_default_retains_tombstones(spark, tmp_path):
    """ADVICE r3 #2: compact_partial exists for MID-stream use, so its
    default must retain tombstones (RETAIN_ALL_TOMBSTONES) — a direct
    library call during active ingest must not silently GC deletes."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=2_000)
    replay(lake, ledger, ev, num_files=4)

    victim = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    delete = _one_event(ev, victim.repo, victim.path, 10_000_000, "delete",
                        "", "zdel", lang=victim.lang)
    lake.merge(delete, batch_id="zdel", mor=True)
    n_tomb = lake.snapshot(include_tombstones=True).filter(F.col("op") == "delete").count()
    assert n_tomb >= 1

    m = lake.compact_partial(delta_fraction=0.0)  # defaults: no watermark passed
    assert not any(f.get("delta") for f in m.files)  # deltas folded
    # every tombstone survived the fold, and no GC watermark was recorded
    assert (
        lake.snapshot(include_tombstones=True).filter(F.col("op") == "delete").count() == n_tomb
    )
    assert m.tombstone_watermark is None


def test_changes_since_guards_watermark_on_empty_table(spark, tmp_path):
    """ADVICE r3 #5: a table compacted down to ZERO files (every key
    deleted and GC'd) must still refuse changes_since below its tombstone
    watermark — an empty changeset would leave the consumer holding
    deleted keys forever."""
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 500, batch_size=500)
    replay(lake, ledger, ev, num_files=2)

    live = lake.snapshot().select("repo", "path", "lang").collect()
    deletes = None
    for i, r in enumerate(live):
        d = _one_event(ev, r.repo, r.path, 20_000_000 + i, "delete", "", "zkill", lang=r.lang)
        deletes = d if deletes is None else deletes.unionByName(d)
    lake.merge(deletes, batch_id="zkill", mor=True)
    m = lake.compact(tombstone_watermark_seq=30_000_000)
    assert not m.files  # all keys dead and GC'd -> zero data files
    assert m.tombstone_watermark == 30_000_000

    import pytest

    with pytest.raises(ValueError, match="below the tombstone GC watermark"):
        lake.changes_since(10)
    # at/above the watermark: empty changeset is fine
    assert lake.changes_since(30_000_000).count() == 0
