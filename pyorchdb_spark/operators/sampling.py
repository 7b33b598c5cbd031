"""Deterministic, engine-portable sampling and dataset splitting.

Training pipelines need train/val/test assignment that is (a) stable
across runs, partitionings, cluster sizes and engines — `df.sample()`
and `rand()` are none of those — and (b) keyed, so the same document
lands in the same split even when the corpus is re-processed.
The primitive here is a HASH BUCKET over the key columns:

    bucket = conv(substr(md5(key || seed), 1, 8), 16, 10) % n_buckets

md5 (not xxhash64) is deliberate: every engine in the stack computes an
identical value (Spark ``F.md5``/``F.conv``, DuckDB
``md5``/``CAST('0x…' AS BIGINT)``), so split assignment is oracle-
checkable and portable to whatever reads the data next. The first 8 hex
chars = 32 uniform bits, plenty for split thresholds at 1e-4 granularity.

Everything is a pure projection/filter: no shuffle, no sampling pass,
pushdown-transparent (a filter on the bucket reaches the scan).
The reference has no sampling surface; this is an engine extension in
the training-data family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(cols: Sequence[str], seed: int = 42, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from the key columns.

    NULL key components are skipped by concat_ws (two keys differing
    only in NULL-vs-absent collide — use distinct seeds per purpose, and
    non-null keys where identity matters).
    """
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in cols], F.lit(str(seed))
    )
    return F.pmod(F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), F.lit(n_buckets))


def hash_sample(
    df: DataFrame, fraction: float, cols: Sequence[str], seed: int = 42
) -> DataFrame:
    """Keyed deterministic sample of ~``fraction`` of distinct keys."""
    if not 0.0 <= fraction <= 1.0:
        # a percent-vs-fraction typo (25 instead of 0.25) would otherwise
        # return the whole table as a plausible-looking "sample"
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(cols, seed) < int(round(fraction * N_BUCKETS)))


def split_column(weights: dict[str, float], cols: Sequence[str], seed: int = 42) -> Column:
    """A 'split' label column from cumulative weight thresholds.

    Weights must sum to ~1; assignment order is the dict's insertion
    order (make it explicit and stable at the call site).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(cols, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * N_BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame, weights: dict[str, float], cols: Sequence[str], seed: int = 42
) -> DataFrame:
    """Adds a deterministic 'split' column (train/val/test...)."""
    return df.withColumn("split", split_column(weights, cols, seed))


def stratified_quota(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    order_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Exact per-stratum quota sample: deterministically keep (up to)
    ``n_per_stratum`` rows from every ``strata`` group.

    `sampleBy` gives *approximate* per-stratum fractions and depends on
    partition order; training-data curation wants EXACT caps ("at most
    50k docs per language/domain") that are stable across runs, cluster
    sizes and engines. Selection order is the md5 hash of
    ``order_cols`` (ties broken by the key itself) — a deterministic
    uniform shuffle any engine can reproduce, so the picked set is
    oracle-checkable.

    Scale shape: ONE hash shuffle on the strata columns; the per-group
    sort is bounded by ``row_number`` early-stop inside each partition
    (window TopK — Spark inserts a WindowGroupLimit for rank <= n
    predicates, so no full per-group sort materializes at 100 TB).
    """
    from pyspark.sql import Window

    rank_key = hash_bucket(order_cols, seed=seed, n_buckets=1 << 31)
    w = Window.partitionBy(*strata).orderBy(
        rank_key.asc(), *[F.col(c).asc() for c in order_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )
