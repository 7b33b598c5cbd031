"""Bucketized range (interval) join: points matched to the intervals
containing them — without a nested-loop join.

The reference pipeline has no temporal/range join (its only time logic
stamps wall-clock periods per batch, PyOrchDB/utilities/tools.py:183-207);
this is an engine extension alongside ``operators/asof.py`` — the
standard "events within incident window" / "reading within calibration
interval" operator.

Spark plans a raw ``a.ts BETWEEN b.start AND b.end`` predicate as a
BroadcastNestedLoopJoin (O(|A|x|B|) comparisons, and a full broadcast of
one side regardless of size). The bucketized formulation turns it into a
plain hash equi-join:

    1. pick a bucket width w (default: 1 hour);
    2. every point maps to ONE bucket: floor(epoch(ts) / w);
    3. every interval EXPLODES to the buckets it covers:
       sequence(floor(start/w), floor(end/w)) — an interval of length L
       becomes ceil(L/w)+1 rows of (bucket, interval payload);
    4. hash-join on (optional keys..., bucket), then the exact
       ``start <= ts <= end`` filter removes same-bucket near-misses.

Complete by construction: an interval containing ts also covers ts's
bucket. No duplicates: a point lives in exactly one bucket, so each
qualifying (point, interval) pair meets exactly once.

Scale shape: ONE shuffle per side keyed by (keys, bucket). The explode
factor is interval_length / w — pick w near the median interval length
so intervals land in O(1) buckets; ``max_buckets_per_interval`` guards
against a mis-sized width silently exploding a month-long interval into
hourly rows (fail loud, don't degrade silently). Point-side skew on a
hot bucket is the same bound a window over that bucket would have.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _width_us(bucket: str) -> int:
    try:
        qty, unit = bucket.split()
        return int(qty) * _UNITS_S[unit] * 1_000_000
    except (ValueError, KeyError):
        raise ValueError(
            f"bucket {bucket!r} must be '<int> <unit>' with unit one of {sorted(set(_UNITS_S))}"
        ) from None


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket: str = "1 hour",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join: each point row x each interval row with
    ``start <= ts <= end`` (inclusive both ends), equi-joined on
    ``by`` keys + time bucket — never a nested loop.

    Column-name collisions between the two inputs (other than ``by``)
    must be resolved by the caller; the output carries all point columns
    plus all interval columns.
    """
    by = list(by)
    w = _width_us(bucket)

    def _us(c):
        # unix_micros rejects TIMESTAMP_NTZ (common in parquet); the cast
        # interprets NTZ in the session zone — applied to BOTH sides, so
        # bucket alignment is consistent regardless of zone
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("_b", F.floor(_us(point_ts) / F.lit(w)))
    lo = F.floor(_us(start_col) / F.lit(w))
    hi = F.floor(_us(end_col) / F.lit(w))
    # Branch order matters:
    # - well-formed, bounded interval -> its bucket sequence;
    # - well-formed but wider than the guard -> fail LOUD (a silent
    #   10^6-way explode is a cluster-killer; the fix is a one-line
    #   wider bucket=). The guard lives INSIDE the _b expression — a
    #   separate guard column would be pruned away unused;
    # - NULL start/end or reversed (end < start) -> NULL -> explode
    #   emits nothing, matching BETWEEN semantics (no match), instead of
    #   a misleading raise (NULL condition falls through when-branches)
    #   or sequence()'s DESCENDING step for lo > hi (an unbounded explode
    #   that would bypass a span-only guard).
    seq = (
        F.when(
            (hi >= lo) & (hi - lo < max_buckets_per_interval),
            F.sequence(lo, hi),
        )
        .when(
            hi - lo >= max_buckets_per_interval,
            F.raise_error(
                F.lit(
                    f"interval spans >= {max_buckets_per_interval} buckets of '{bucket}'; "
                    "choose a wider bucket= for interval_join"
                )
            ),
        )
        .otherwise(F.lit(None))
    )
    iv = intervals.withColumn("_b", F.explode(seq))
    return (
        p.join(iv, [*by, "_b"])
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col)))
        .drop("_b")
    )
