"""Last-writer-wins dedup — the engine's single window operator.

The reference has no per-key ordering at all: its incrementality is a set
difference over whole file names (PyOrchDB/utilities/catalog.py:96-105)
and recorded timestamps are never compared. The north rule requires true
CDC semantics: per (repo, path) key, the event with the highest ``seq``
wins, ties broken deterministically by ``commit`` then ``op``
(SURVEY.md section 2.5).

Two implementations with identical results:

- ``lww_dedup`` — one window shuffle. Right default; Catalyst plans a
  single hash-partitioned sort + running row_number, and AQE splits
  skewed partitions.
- ``lww_dedup_salted`` — explicit two-stage dedup for hot-key skew
  (SURVEY.md section 4 item 1): stage 1 dedups within
  (key, salt) so a hot repo's millions of events collapse to at most
  ``n_salts`` rows before the final per-key shuffle. The salt derives
  from ``seq`` (never from the key), so the final MERGE join keys are
  untouched. At 10^10 events with Zipf-skewed repos this is the
  difference between one straggler task and an even shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KEYS = ("repo", "path")


def _order_cols(seq_col: str, tiebreakers: Sequence[str]):
    return [F.col(seq_col).desc()] + [F.col(c).desc() for c in tiebreakers]


def lww_dedup(
    events: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    seq_col: str = "seq",
    tiebreakers: Sequence[str] = ("commit", "op"),
) -> DataFrame:
    """One row per key: the last writer. Single window shuffle."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(seq_col, tiebreakers))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_salted(
    events: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    seq_col: str = "seq",
    tiebreakers: Sequence[str] = ("commit", "op"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage LWW dedup: (key, salt) pre-dedup, then final per-key pick.

    Equivalent to ``lww_dedup`` for any input (stage 1 only drops rows that
    could never win stage 2 — row_number ordering is identical), verified
    property-style in tests/test_dedup.py.
    """
    order = _order_cols(seq_col, tiebreakers)
    salt = F.pmod(F.xxhash64(F.col(seq_col), F.lit("salt")), F.lit(n_salts))
    w1 = Window.partitionBy(*list(keys), "_salt").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        events.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )


def final_state(
    events: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    seq_col: str = "seq",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Replay semantics: LWW winners minus tombstones.

    Tombstones participate in the ordering (a delete with the max seq
    erases the key) but are excluded from the surviving state
    (SURVEY.md section 7, hard part 4).
    """
    dedup = lww_dedup_salted(events, keys, seq_col, n_salts=n_salts) if salted else lww_dedup(events, keys, seq_col)
    return dedup.filter(F.col("op") != "delete")
