"""C3 — invalid events are quarantined to _rejects, not silently dropped
(nor allowed to corrupt state)."""

from __future__ import annotations

from pyorchdb_spark.ingest import apply_batch
from pyorchdb_spark.sources.catalog import BatchLedger
from pyorchdb_spark.sources.lake import LakeTable

DDL = "repo string, path string, commit string, seq long, op string, lang string, content string, batch_id string"


def test_invalid_rows_quarantined(spark, tmp_path):
    root = str(tmp_path / "q")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    rows = [
        ("r", "ok.py", "c1", 1, "upsert", "python", "good", "b0"),
        (None, "nokey.py", "c2", 2, "upsert", "python", "x", "b0"),
        ("r", "", "c3", 3, "upsert", "python", "x", "b0"),
        ("r", "noseq.py", "c4", None, "upsert", "python", "x", "b0"),
        ("r", "badop.py", "c5", 5, "truncate", "python", "x", "b0"),
    ]
    res = apply_batch(lake, ledger, spark.createDataFrame(rows, DDL), "b0", num_files=1)
    assert res.rows_rejected == 4
    assert res.rows_in == 5  # lineage records raw input; rejects tracked apart

    snap = lake.snapshot()
    assert [r["path"] for r in snap.collect()] == ["ok.py"]

    rej = ledger.rejects()
    reasons = {r["path"]: r["reject_reason"] for r in rej.collect()}
    assert reasons[""] == "null_or_empty_key"
    assert reasons["nokey.py"] == "null_or_empty_key"
    assert reasons["noseq.py"] == "null_seq"
    assert reasons["badop.py"] == "unknown_op"
    assert {r["batch_id_rejected"] for r in rej.collect()} == {"b0"}


def test_clean_batch_writes_no_rejects(spark, tmp_path):
    root = str(tmp_path / "clean")
    lake, ledger = LakeTable(spark, root), BatchLedger(spark, root)
    rows = [("r", "a.py", "c1", 1, "upsert", "python", "x", "b0")]
    res = apply_batch(lake, ledger, spark.createDataFrame(rows, DDL), "b0", num_files=1)
    assert res.rows_rejected == 0
    import os

    assert not os.path.exists(os.path.join(root, "_rejects"))
