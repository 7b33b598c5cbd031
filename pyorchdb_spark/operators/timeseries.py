"""Event-time window operators: tumbling / sliding aggregation and
gap-based sessionization.

The reference pipeline stamps a wall-clock period onto every batch
(PyOrchDB/utilities/tools.py:183-207 ``insert_period_columns``) and all
of its time reasoning stops there; a Spark-native engine can aggregate
on event time directly.  These operators are the batch halves of the
engine's time surface — ``streaming/stateful.py`` holds the streaming
halves (watermarked windowed aggregation, ``applyInPandasWithState``
sessions) that are asserted equal to these on the same input.

Scale notes (100 TB):
- tumbling/sliding aggregation is ONE hash shuffle on
  ``(window, *keys)`` with map-side partial aggregation — per-executor
  state is bounded by the number of open groups, not event volume;
- ``F.window`` is evaluated JVM-side inside whole-stage codegen (a
  sliding window becomes a deterministic generator expression — no
  Python, no explode of per-event arrays beyond windows-per-event);
- sessionization shuffles once on the session keys; the in-partition
  pass is two window functions (lag + running sum) over a sort that
  feeds straight from the shuffle's sorted output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _agg_or_default(aggs: Sequence[Column] | None) -> list[Column]:
    if aggs:
        return list(aggs)
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ]


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time window
    aggregation.

    Returns one row per ``(window_start, *keys)`` group with
    ``window_start``/``window_end`` surfaced as plain timestamp columns
    (stable names for the oracle contract).  With ``slide`` < ``duration``
    an event contributes to ``duration/slide`` windows — Catalyst expands
    this as a generator expression, so shuffle volume grows by exactly
    that factor and nothing else.
    """
    win = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("w"), *keys).agg(*_agg_or_default(aggs))
    agg_names = [c for c in out.columns if c not in ("w", *keys)]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *agg_names,
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Gap-based sessions: within each key, a new session starts when the
    time since the previous event is STRICTLY GREATER than ``gap``
    (an event exactly ``gap`` after its predecessor extends the session —
    the same closed-interval rule the streaming stateful variant applies,
    and expressible verbatim as a SQL gaps-and-islands oracle).

    One shuffle on ``keys``; lag + running count are computed in a single
    in-partition sorted pass.  Output: one row per session with
    ``session_start`` / ``session_end`` / aggregates.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    by_key = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    ts = F.col(ts_col)
    is_new = (
        F.when(F.lag(ts).over(by_key).isNull(), F.lit(1))
        .when(ts > F.lag(ts).over(by_key) + gap_expr, F.lit(1))
        .otherwise(F.lit(0))
    )
    with_sess = df.withColumn("_new", is_new).withColumn(
        "session_no",
        F.sum("_new").over(by_key.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy(*keys, "session_no")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            *_agg_or_default(aggs),
        )
        .drop("session_no")
    )
