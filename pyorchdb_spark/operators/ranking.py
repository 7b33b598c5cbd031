"""Distributed global order statistics: rank / row_number / ntile over a
TOTAL order without a single-task window.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` coalesces the
whole input into ONE task — correct, and fine when the windowed relation
is dimension-sized, but a non-starter for a fact-sized ranking at 100 TB.
The reference has no ranking surface at all (its ``top``-style outputs
come from eager pandas sorts, PyOrchDB/utilities/tools.py); this module
is the Spark-first generalization the engine's own top-k/decile queries
build on.

Shape (classic two-phase distributed ranking):

1. ``repartitionByRange`` on the full composite order key — Spark's
   range partitioner samples boundaries, so partition *i* holds keys
   wholly <= partition *i+1*'s (ties may straddle a boundary; the caller
   supplies a TOTAL order, so straddling cannot misnumber);
2. in-partition sort + ``row_number`` over a window partitioned by
   ``spark_partition_id()`` — embarrassingly parallel;
3. per-partition row counts (O(num_partitions) driver metadata, the
   same class as a manifest read — never row data) become broadcast
   cumulative offsets added to the local row numbers.

Every phase is bounded: no task ever holds more than one range slice,
and the only driver materialization is one long per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"


def _locally_numbered(
    df: DataFrame,
    order_by: Sequence[Column],
    num_partitions: int | None,
) -> DataFrame:
    """Phase 1+2: range-partition on the composite order key, then
    ``row_number`` within each range slice.

    The slice id (``_PID``) is stamped from ``spark_partition_id()`` of
    the RANGE layout; the window then hash-exchanges on that id (Catalyst
    cannot know a range layout already clusters its own partition id, so
    the second exchange is the price of pure-JVM expressions over
    arbitrary orderable key types — an Arrow ``mapInPandas`` enumeration
    would save it but push every row through Python).  Both exchanges
    move thin rows and neither ever concentrates the data: slice
    contiguity, not physical placement, is what the offset math needs.
    """
    order_by = list(order_by)
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    ).withColumn(_PID, F.spark_partition_id())
    return parts.withColumn(
        _LOCAL,
        F.row_number().over(Window.partitionBy(_PID).orderBy(*order_by)),
    ).localCheckpoint(eager=False)  # lazily materialized by the counts
    # job in global_rank, so the final output reuses it instead of
    # re-running both exchanges (same lazy-barrier pattern as
    # operators/components.py)


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` computed over ``order_by``
    without ever collapsing the data to one task.

    ``order_by`` must define a TOTAL order (include a unique tiebreak
    column); with ties left in the order the numbering among tied rows
    would follow the range partitioner's arbitrary boundary placement.
    """
    local = _locally_numbered(df, order_by, num_partitions)
    # O(num_partitions) driver metadata -> cumulative offsets
    counts = {r[_PID]: r["c"] for r in local.groupBy(_PID).agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, f"{_PID} int, __rank_offset long")
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(rank_col, (F.col(_LOCAL) + F.col("__rank_offset")).cast("long"))
        .drop(_PID, _LOCAL, "__rank_offset")
    )


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    k: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``NTILE(k) OVER (ORDER BY ...)`` semantics at scale: the first
    ``n % k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` —
    bit-identical to the single-task window form, built on
    :func:`global_rank` (same total-order requirement).
    """
    ranked = global_rank(df, order_by, rank_col="__rank_r", num_partitions=num_partitions)
    # n is already on the driver as the sum of the per-partition counts,
    # but re-deriving it via a max() would re-trigger the job; thread it
    # through a broadcast 1-row aggregate instead to keep one pipeline
    n_df = ranked.agg(F.max("__rank_r").alias("__rank_n"))
    r = F.col("__rank_r")
    n = F.col("__rank_n")
    q = F.floor(n / k)
    rem = n % k
    big = q + 1
    tile = F.when(r <= rem * big, F.floor((r - 1) / big) + 1).otherwise(
        rem + F.floor((r - 1 - rem * big) / q) + 1
    )
    return (
        ranked.join(F.broadcast(n_df))
        .withColumn(tile_col, tile.cast("int"))
        .drop("__rank_r", "__rank_n")
    )
