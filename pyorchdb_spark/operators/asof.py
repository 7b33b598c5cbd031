"""As-of (temporal) join: each left row matched to the latest right row
at or before its timestamp, per key.

The reference pipeline has no temporal join (it stamps wall-clock periods
per batch, PyOrchDB/utilities/tools.py:183-207, and stops there); this is
an engine extension for event-time analytics — the standard "price as of
trade time" / "state as of event time" operator.

Spark has no ASOF JOIN primitive, and the naive formulations are traps at
scale: an inequality theta-join plans as a broadcast nested loop, and a
"join then keep max ts per left row" materializes every (left, right-
earlier) pair — O(n·m) within key. The UNION-SORT formulation below is
linear and needs exactly ONE shuffle:

    1. tag right rows 0, left rows 1 (payload columns null on left);
    2. union, hash-shuffle on the join keys, sort within partition by
       (ts, tag) — the same shuffle+sort a window function needs;
    3. running ``last(payload_struct, ignorenulls=True)`` over rows
       unbounded preceding: for every left row that is exactly "the latest
       right row at or earlier ts" (ties: right sorts first via tag, so an
       equal-ts right row IS visible — inclusive as-of). All right payload
       columns ride in ONE struct (null only on left rows), so every
       matched column comes from the SAME right row — a NULL payload value
       in the latest right row stays NULL instead of being backfilled from
       an older right row (matching DuckDB ASOF / pandas merge_asof);
    4. keep tag=1 rows, unpack the struct.

Per-executor state is one row (the running payload); no pair blowup; skew
on a hot key is bounded by that key's row count, the same bound any
window over the key has. ``tolerance`` re-checks the matched ts distance
and nulls matches that are too stale (same semantics as pandas
``merge_asof(tolerance=...)``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Latest right row at-or-before each left row's timestamp, per key.

    Returns every left row with the matched right payload columns
    appended (suffixed where names collide; the matched right timestamp
    is always surfaced as ``{right_ts}{suffix}``). Left rows with no
    earlier right row keep nulls.
    """
    by = list(by)
    payload = [c for c in right.columns if c not in by and c != right_ts]
    rname = {c: (c + suffix if c in left.columns else c) for c in payload}
    ts_r = right_ts + suffix

    # All matched columns travel in one struct so a single running
    # last(ignorenulls) picks one whole right ROW; the struct itself is
    # null exactly on left rows (ts_r is non-null on every right row).
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_ts).alias(ts_r),
            *[F.col(c).alias(rname[c]) for c in payload],
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
    )
    null_struct = F.struct(
        F.lit(None).cast(right.schema[right_ts].dataType).alias(ts_r),
        *[F.lit(None).cast(right.schema[c].dataType).alias(rname[c]) for c in payload],
    )
    l = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.when(F.lit(False), null_struct).alias("_r"),
        *[F.col(c) for c in left.columns if c not in by],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_cols = [ts_r] + [rname[c] for c in payload]
    out = (
        r.unionByName(l)
        .withColumn("_r", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .select("*", *[F.col(f"_r.{c}").alias(c) for c in matched_cols])
        .drop("_r")
    )
    if tolerance is not None:
        # materialize the flag BEFORE nulling: the predicate reads ts_r,
        # which is itself one of the columns being nulled
        out = out.withColumn(
            "_stale", F.col("_ts") > F.col(ts_r) + F.expr(f"INTERVAL {tolerance}")
        )
        for c in matched_cols:
            out = out.withColumn(c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c)))
    return out.select(
        *by,
        F.col("_ts").alias(left_ts),
        *[c for c in left.columns if c not in by and c != left_ts],
        *matched_cols,
    )
