"""Watermarked stream-stream interval join (SURVEY.md §2.9 widening).

The reference joins nothing across feeds (each extract loads
independently — PyOrchDB/main.py drives one table at a time); a CDC
engine tailing several event feeds needs the Structured Streaming
join: correlate two live streams on a key within a bounded event-time
interval (click-to-signup attribution, impression-to-conversion, change
events to deploy markers).

Spark executes this as a symmetric hash join over watermark-bounded
state: each side buffers rows only until the OTHER side's watermark
proves no future match can arrive — with an equi-key plus a closed
time-range condition, state per executor is bounded by
``arrival rate x (watermark delay + lookback)``, never by stream
history. That bound is what makes the operator viable at the
10^10-event design point; an unbounded-condition stream join (no
time range) would accumulate state forever and is deliberately not
exposed here.

``withWatermark`` is a no-op on batch DataFrames, so the SAME function
is its own batch twin — the driver's ``click_attribution`` query runs
this exact code path on static inputs against a DuckDB oracle, and
tests/test_stream_join.py replays the batch result over micro-batch
file streams for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    right_suffix: str = "_r",
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` rows with the same ``by``
    key whose event time falls in ``[left_ts - lookback, left_ts]``.

    Right-side columns are suffixed (``_r``) so both event envelopes
    survive into the output unambiguously. ``watermark`` is the
    out-of-orderness bound for BOTH sides: a row later than that behind
    its stream's max event time may be dropped by the state store (the
    documented late-data contract, same as streaming/stateful.py).
    Works identically on static inputs (watermarks are no-ops there).
    """
    r = right.select(*[F.col(c).alias(c + right_suffix) for c in right.columns])
    r = r.withWatermark(right_ts + right_suffix, watermark)
    l = left.withWatermark(left_ts, watermark)
    rts = F.col(right_ts + right_suffix)
    cond = (
        (F.col(by) == F.col(by + right_suffix))
        & (rts <= F.col(left_ts))
        & (rts >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "inner")
