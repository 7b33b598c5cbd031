from __future__ import annotations

from pyspark.sql import functions as F

from pyorchdb_spark.generator import change_events, write_events
from pyorchdb_spark.ingest import prepare_events
from pyorchdb_spark.oracle import expected_final_state, state_signature
from pyorchdb_spark.sources.catalog import BatchLedger
from pyorchdb_spark.sources.lake import LakeTable
from pyorchdb_spark.streaming.tail import run_tail_to_completion


def _sig(df):
    return {tuple(r) for r in df.select("repo", "path", "content_sha256").fillna("<null>").collect()}


def test_stream_tail_checkpoint_resume(spark, tmp_path):
    """Tail a growing log with kill/restart between phases; the checkpoint
    resumes from committed offsets and the final state matches the oracle."""
    ev = change_events(spark, 3_000, batch_size=1_000).cache()
    try:
        log_dir = str(tmp_path / "log")
        ckpt = str(tmp_path / "ckpt")
        root = str(tmp_path / "table")
        lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)

        # phase 1: only batches b0, b1 exist
        write_events(ev.filter(F.col("batch_id") < "b000002"), log_dir)
        run_tail_to_completion(spark, log_dir, lake, ledger, ckpt, num_files=2)
        v_phase1 = lake.current_version()
        assert v_phase1 is not None and lake.snapshot().count() > 0

        # phase 2 ("restart after kill"): b2 arrives; same checkpoint —
        # only new files are processed
        (
            ev.filter(F.col("batch_id") == "b000002")
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(log_dir)
        )
        run_tail_to_completion(spark, log_dir, lake, ledger, ckpt, num_files=2)
        v_phase2 = lake.current_version()
        assert v_phase2 > v_phase1

        # phase 3: restart with nothing new → zero data commits
        run_tail_to_completion(spark, log_dir, lake, ledger, ckpt, num_files=2)
        assert lake.current_version() == v_phase2

        exp = expected_final_state(prepare_events(ev).drop("content_sha256").toPandas())
        assert _sig(lake.snapshot()) == state_signature(exp)
    finally:
        ev.unpersist()


def test_stream_micro_batches_split_by_files(spark, tmp_path):
    """maxFilesPerTrigger forces several micro-batches; markers record one
    epoch per micro-batch and the result still matches single-shot replay."""
    ev = change_events(spark, 2_000, batch_size=500)
    log_dir = str(tmp_path / "log")
    write_events(ev, log_dir)
    root = str(tmp_path / "table")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    run_tail_to_completion(
        spark, log_dir, lake, ledger, str(tmp_path / "ckpt"), num_files=2, max_files_per_trigger=2
    )
    assert ledger.markers().count() >= 2
    exp = expected_final_state(prepare_events(ev).drop("content_sha256").toPandas())
    assert _sig(lake.snapshot()) == state_signature(exp)
