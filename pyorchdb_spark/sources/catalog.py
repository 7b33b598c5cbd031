"""Batch-marker ledger + lineage metrics — the reference's EventController, reborn.

The reference persists ``catalog.csv`` (file name + timestamp) and diffs
it against the current listing to skip already-processed inputs
(PyOrchDB/utilities/catalog.py:50-109). The engine generalizes this to:

- **markers**: one JSON file per committed ``batch_id``
  (``_markers/{batch_id}.json``), published by atomic rename. The gate is
  an O(1) existence check on the driver (no Spark job), and the whole
  ledger is Spark-readable for the anti-join form of the gate (J1 in
  SURVEY.md section 2.3).
- **lineage**: an append-only parquet table of per-batch per-partition
  metrics (rows in/deduped/tombstones, max seq, merge outcome counts) —
  replacing the reference's per-directory log files
  (PyOrchDB/main.py:342-352).

Crash safety: markers are written *after* the lake-table manifest commit.
A crash in between re-runs the batch, which is a no-op because the merge
itself is idempotent (LWW-by-seq — SURVEY.md section 7, hard part 1).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER_SCHEMA = "batch_id string, version long, rows_in long, committed_at double"
LINEAGE_SCHEMA = (
    "batch_id string, partition_id int, rows_in long, tombstones long, "
    "max_seq long, table_rows_after long"
)


class BatchLedger:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.markers_dir = os.path.join(self.root, "_markers")
        self.lineage_dir = os.path.join(self.root, "_lineage")
        os.makedirs(self.markers_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ---------- markers (exactly-once gate) ----------

    def is_committed(self, batch_id: str) -> bool:
        return os.path.exists(os.path.join(self.markers_dir, f"{batch_id}.json"))

    def commit_marker(self, batch_id: str, version: int, rows_in: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.markers_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(
                {
                    "batch_id": batch_id,
                    "version": version,
                    "rows_in": rows_in,
                    "committed_at": time.time(),
                },
                fh,
            )
        os.rename(tmp, os.path.join(self.markers_dir, f"{batch_id}.json"))

    def markers(self) -> DataFrame:
        """The ledger as a DataFrame (for the anti-join gate at scale)."""
        files = [
            os.path.join(self.markers_dir, f)
            for f in os.listdir(self.markers_dir)
            if f.endswith(".json")
        ]
        if not files:
            return self.spark.createDataFrame([], MARKER_SCHEMA)
        return self.spark.read.schema(MARKER_SCHEMA).json(files)

    def filter_uncommitted(self, events: DataFrame, batch_col: str = "batch_id") -> DataFrame:
        """J1: drop events of already-committed batches via broadcast anti-join.

        The marker table is small (one row per batch) → always broadcast;
        the event stream is never shuffled by this gate.
        """
        m = self.markers().select(F.col("batch_id").alias(batch_col)).distinct()
        return events.join(F.broadcast(m), on=batch_col, how="left_anti")

    # ---------- lineage ----------

    def collect_partition_metrics(self, source_events: DataFrame, invalid_reason=None) -> list:
        """One pass over the batch: per-partition rows/tombstones/max_seq
        (+ invalid count when a quarantine predicate is given). Collected
        driver-side — one tiny row per task."""
        seq_col = "seq" if "seq" in source_events.columns else source_events.columns[0]
        aggs = [
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((F.col("op") == "delete").cast("long")).alias("tombstones"),
            F.max(seq_col).alias("max_seq"),
        ]
        if invalid_reason is not None:
            aggs.append(F.sum(invalid_reason.isNotNull().cast("long")).alias("n_invalid"))
        return (
            source_events.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(*aggs)
            .collect()
        )

    def record_lineage(self, batch_id: str, metrics_rows: list, table_rows_after: int) -> int:
        """Append per-partition ingest metrics (from collect_partition_metrics)."""
        per_part = self.spark.createDataFrame(
            [
                (batch_id, int(r["partition_id"]), r["rows_in"], r["tombstones"], r["max_seq"], table_rows_after)
                for r in metrics_rows
            ],
            LINEAGE_SCHEMA,
        )
        per_part.coalesce(1).write.mode("append").parquet(self.lineage_dir)
        return int(sum(r["rows_in"] for r in metrics_rows))

    def lineage(self) -> DataFrame:
        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)

    # ---------- quarantine (C3: error-row removal, reborn) ----------
    # The reference silently drops whole tables that fail processing
    # (PyOrchDB/main.py:144-149,300-309) and scrubs them from the catalog
    # (main.py:369-378). The engine quarantines *rows* instead: invalid
    # events are diverted to an append-only _rejects table with a reason,
    # so nothing is lost and reprocessing is possible.

    def record_rejects(self, batch_id: str, rejects: DataFrame) -> None:
        """Append invalid events (+ reject_reason) for this batch."""
        rejects_dir = os.path.join(self.root, "_rejects")
        rejects.withColumn("batch_id_rejected", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(rejects_dir)

    def rejects(self) -> DataFrame:
        rejects_dir = os.path.join(self.root, "_rejects")
        return self.spark.read.parquet(rejects_dir)
