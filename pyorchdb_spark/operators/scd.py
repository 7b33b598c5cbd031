"""Slowly-changing-dimension (type 2) history build from a changelog.

The reference engine's table maintenance is last-write-wins overwrite
(PyOrchDB/main.py:214-232 ``upsert_to_table``): every merge discards the
superseded row.  A CDC-grade engine also needs the *opposite* projection
of the same changelog — keep every superseded version as a closed
interval so a consumer can ask "what was the state at sequence N".
These operators derive that history with plain window functions, so the
semantics stay SQL-expressible (DuckDB oracle) and the plan stays inside
whole-stage codegen.

Scale notes (100 TB):
- ONE hash shuffle on the key columns; both window passes (change
  detection, then interval close) reuse the same partitioning and the
  same in-partition sort — Catalyst plans a single Exchange + Sort;
- no-op updates (consecutive versions with identical tracked state) are
  collapsed BEFORE the interval close, so output size is bounded by the
  number of real state changes, not raw event volume;
- per-key state during the pass is O(1) (lag/lead of one row), never a
  per-key buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    state_cols: Sequence[str],
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
    current_flag: str = "is_current",
) -> DataFrame:
    """Type-2 history: one row per (key, distinct consecutive state run).

    ``valid_from`` is the sequence number that opened the version;
    ``valid_to`` is the sequence number that superseded it (NULL while
    current, making the interval half-open ``[from, to)``); ``is_current``
    marks the open version.  ``last_seq`` carries the highest event
    sequence observed for the key (on every version row) — the per-key
    high watermark that ``scd2_apply_batch`` needs to detect stale
    arrivals, because collapsed no-op events are no longer recoverable
    from the change points alone.  Ties on ``seq_col`` within a key must
    not occur upstream (the CDC replay path already enforces a total
    (seq, commit, op) order — see plans/merge.py).
    """
    keys = list(key_cols)
    states = list(state_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    w_all = Window.partitionBy(*keys)
    state_struct = F.struct(*[F.col(c) for c in states])
    changed = (
        F.lag(state_struct).over(w).isNull()
        | (F.lag(state_struct).over(w) != state_struct)
    )
    runs = (
        df.select(*keys, seq_col, *states)
        .withColumn("_chg", changed)
        # per-key high watermark BEFORE dropping collapsed events — an
        # unordered frame over the same partitioning: no extra exchange
        .withColumn("last_seq", F.max(F.col(seq_col)).over(w_all))
        .filter(F.col("_chg"))
    )
    # second window over the CHANGE rows only: same partitioning, same
    # sort -> no extra shuffle, and lead() closes each interval
    w2 = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    return (
        runs.withColumn(valid_to, F.lead(F.col(seq_col)).over(w2))
        .withColumnRenamed(seq_col, valid_from)
        .withColumn(current_flag, F.col(valid_to).isNull())
        .drop("_chg")
    )


def state_asof(
    history: DataFrame,
    asof_seq: int,
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
) -> DataFrame:
    """Point-in-time read over an SCD2 history: the version whose
    half-open interval ``[valid_from, valid_to)`` contains ``asof_seq``.
    Pure filter — prunes on both interval bounds, no shuffle."""
    return history.filter(
        (F.col(valid_from) <= F.lit(asof_seq))
        & (F.col(valid_to).isNull() | (F.col(valid_to) > F.lit(asof_seq)))
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    state_cols: Sequence[str],
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
    current_flag: str = "is_current",
) -> DataFrame:
    """Fold a new changelog batch into an existing SCD2 history,
    touching only the keys the batch mentions.

    Contract: batch events must be NEWER than everything the history has
    seen for their key (per-key monotone sequences — what the engine's
    replay path guarantees by construction, batches being seq-ranged).
    Events at or below the key's recorded ``last_seq`` high watermark are
    STALE and dropped here explicitly: after no-op collapse the change
    points alone cannot replay an event that lands inside a collapsed
    run, so accepting it would silently diverge from a full rebuild
    (mirror of ingest.py's below-watermark quarantine).  Under the
    contract the result is EXACTLY a full rebuild over the concatenated
    log (``tests/test_scd.py::test_incremental_equals_rebuild``).

    Scale notes (100 TB): untouched keys are carried over by ONE left-anti
    join against the batch's distinct keys (broadcast while it fits — a
    micro-batch's key set is small by construction); the window rebuild
    shuffles only ``O(batch keys x versions-per-key)`` rows, never the
    full history.
    """
    keys = list(key_cols)
    states = list(state_cols)
    batch_keys = batch.select(*keys).distinct()
    untouched = history.join(F.broadcast(batch_keys), keys, "left_anti")
    affected = history.join(F.broadcast(batch_keys), keys, "left_semi")
    # stale gate against the per-key high watermark (current version row)
    watermarks = affected.filter(F.col(current_flag)).select(
        *keys, F.col("last_seq").alias("_wm")
    )
    fresh = (
        batch.join(F.broadcast(watermarks), keys, "left_outer")
        .filter(F.col("_wm").isNull() | (F.col(seq_col) > F.col("_wm")))
        .select(*keys, seq_col, *states)
    )
    reopened = affected.select(*keys, F.col(valid_from).alias(seq_col), *states)
    # re-inject the watermark as a synthetic no-op event at last_seq with
    # the current state: it collapses away (same state as the open
    # version) but keeps the rebuilt history's last_seq watermark exact
    # even when every batch event for the key was stale
    wm_events = affected.filter(
        F.col(current_flag) & (F.col("last_seq") > F.col(valid_from))
    ).select(*keys, F.col("last_seq").alias(seq_col), *states)
    merged = reopened.unionByName(wm_events).unionByName(fresh)
    rebuilt = scd2_history(
        merged, keys, seq_col, states,
        valid_from=valid_from, valid_to=valid_to, current_flag=current_flag,
    )
    return untouched.unionByName(rebuilt)


def transition_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    state_col: str,
) -> DataFrame:
    """First-order state-transition counts: for each key's sequence of
    states, count every adjacent ``(prev_state, next_state)`` pair across
    the whole table (the Markov transition matrix of the changelog).

    One shuffle on the keys for the lag pass, then a map-side-combined
    aggregation on the (tiny) state-pair domain.
    """
    w = Window.partitionBy(*list(key_cols)).orderBy(F.col(seq_col).asc())
    pairs = df.select(
        F.lag(F.col(state_col)).over(w).alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).filter(F.col("prev_state").isNotNull())
    return pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
