from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.generator import change_events, split_batches
from pyorchdb_spark.ingest import apply_batch
from pyorchdb_spark.sources.catalog import BatchLedger
from pyorchdb_spark.sources.lake import LakeTable


def test_additive_column_mid_stream(spark, tmp_path):
    """A column physically appears in batch >= 2: old rows read as null,
    new rows populated, final schema includes it (SURVEY.md section 4.3)."""
    root = str(tmp_path / "evo")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 3_000, batch_size=1_000, evolution_batch=2)

    for b, bdf in split_batches(ev, drop_variant_before="b000002"):
        apply_batch(lake, ledger, bdf, b, num_files=2)

    snap = lake.snapshot()
    assert "lang_variant" in snap.columns
    # rows whose winner predates the evolution batch are null
    assert snap.filter((F.col("seq") < 2000) & F.col("lang_variant").isNotNull()).isEmpty()
    assert snap.filter(F.col("lang_variant").isNotNull()).count() > 0

    # schema order is stable: original envelope first, evolved column last
    m = lake.manifest()
    names = [f.name for f in m.schema().fields]
    assert names.index("lang_variant") == len(names) - 1


def test_evolution_matches_full_log_replay(spark, tmp_path):
    """Mid-stream evolution replay == replaying the full log with the
    column present from the start (nulls before the evolution batch)."""
    ev = change_events(spark, 3_000, batch_size=1_000, evolution_batch=2)

    a = LakeTable(spark, str(tmp_path / "a"))
    la = BatchLedger(spark, str(tmp_path / "a"))
    for b, bdf in split_batches(ev, drop_variant_before="b000002"):
        apply_batch(a, la, bdf, b, num_files=2)

    b_ = LakeTable(spark, str(tmp_path / "b"))
    lb = BatchLedger(spark, str(tmp_path / "b"))
    for b, bdf in split_batches(ev):
        apply_batch(b_, lb, bdf, b, num_files=2)

    cols = ["repo", "path", "content_sha256", "lang_variant"]
    sa = {tuple(r) for r in a.snapshot().select(cols).fillna("<null>").collect()}
    sb = {tuple(r) for r in b_.snapshot().select(cols).fillna("<null>").collect()}
    assert sa == sb


def test_non_additive_change_rejected(spark, tmp_path):
    root = str(tmp_path / "bad")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    ev = change_events(spark, 500, batch_size=500)
    apply_batch(lake, ledger, ev, "b000000", num_files=1)
    bad = ev.withColumn("lang", F.lit(1).cast("int")).withColumn("batch_id", F.lit("b000001"))
    with pytest.raises(ValueError, match="non-additive"):
        apply_batch(lake, ledger, bad, "b000001", num_files=1)
