"""Curation operators — the reference's pandas clean/fix phase, Spark-first.

Each function maps one operator from SURVEY.md section 2.2 (P1-P10) /
2.4 (A1-A3) / 2.7 (U2): the reference implements these eagerly in pandas
(PyOrchDB/main.py:276-291, utilities/tools.py:136-221); here every one is
a metadata-only projection or a declarative transform Catalyst can push
into the scan.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_unnamed_columns(df: DataFrame, pattern: str = r"^Unnamed") -> DataFrame:
    """P1 — drop columns matching a regex (reference: pandas index spills,
    PyOrchDB/main.py:279). Metadata-only: no job runs."""
    rx = re.compile(pattern)
    return df.select(*[c for c in df.columns if not rx.match(c)])


def drop_empty_columns(df: DataFrame) -> DataFrame:
    """P2/A3 — drop all-null columns (reference main.py:288 via pydbsmgr).

    One aggregate over non-null counts (Catalyst rewrites ``count(col)``
    into a single pass), then a projection.
    """
    counts = df.agg(*[F.count(F.col(c)).alias(c) for c in df.columns]).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)


def drop_columns(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P3 — config-driven column drop (reference tools.py:210-221)."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P4 — config-driven rename (reference main.py:339)."""
    return df.withColumnsRenamed(mapping)


def normalize_column_names(df: DataFrame, snake_case: bool = True) -> DataFrame:
    """P5 — snake_case + dedupe column names (reference's StandardColumns /
    ColumnsCheck, main.py:200-209,289-290 [ext]). Metadata-only."""

    def norm(name: str) -> str:
        n = name.strip()
        if snake_case:
            n = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", n)
            n = re.sub(r"[^0-9a-zA-Z]+", "_", n).strip("_").lower()
        return n or "col"

    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        n = norm(c)
        if n in seen:
            seen[n] += 1
            n = f"{n}_{seen[n]}"
        else:
            seen[n] = 0
        out.append(n)
    return df.toDF(*out)


def filter_contains(df: DataFrame, col: str, needle: str, lowercase: bool = False) -> DataFrame:
    """P6 — keep rows whose ``col`` contains ``needle`` (tools.py:151-167)."""
    c = F.lower(F.col(col)) if lowercase else F.col(col)
    return df.filter(c.contains(needle.lower() if lowercase else needle))


def filter_not_contains(df: DataFrame, col: str, needle: str) -> DataFrame:
    """P7 — drop rows whose ``col`` contains ``needle`` (tools.py:170-180,
    used to exclude the catalog file at main.py:384)."""
    return df.filter(~F.col(col).contains(needle))


def insert_period(df: DataFrame, source_col: str, out_col: str = "periodo") -> DataFrame:
    """P8 — extract a date (else a year) from a name column and inject it
    as a constant-per-row column (reference tools.py:183-207). The
    reference parses the *file name* in Python; here it is one
    ``regexp_extract`` chain over the column, codegen'd."""
    if out_col in df.columns:
        return df
    date = F.regexp_extract(F.col(source_col), r"(\d{4}-\d{2}-\d{2})", 1)
    year = F.regexp_extract(F.col(source_col), r".*([1-2][0-9]{3})", 1)
    # Reference inserts "" (not NULL) when neither regex matches
    # (tools.py:202) — keep that contract so downstream group-bys see one
    # empty-string bucket instead of a null bucket.
    return df.withColumn(
        out_col,
        F.when(date != "", date).otherwise(F.when(year != "", year).otherwise(F.lit(""))),
    )


# P9 — general value cleaning (reference clean_db → LightCleaner.clean_frame,
# PyOrchDB/main.py:267-274 [ext]): accents/whitespace/case normalization over
# string cells. Pure built-ins (translate + regexp_replace + lower) — one
# codegen'd projection, no UDF, no per-row Python.
_ACCENTS_FROM = "áàâäãåÁÀÂÄÃÅéèêëÉÈÊËíìîïÍÌÎÏóòôöõÓÒÔÖÕúùûüÚÙÛÜñÑçÇýÿÝ"
_ACCENTS_TO = "aaaaaaAAAAAAeeeeEEEEiiiiIIIIoooooOOOOOuuuuUUUUnNcCyyY"


def clean_string_values(
    df: DataFrame,
    cols: Iterable[str] | None = None,
    *,
    strip_accents: bool = True,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """P9 — normalize string cell values across the table.

    The reference delegates to pydbsmgr's LightCleaner (eager pandas over
    every cell); here it is a single projection Catalyst fuses into the
    scan: translate() for Latin accent folding, lower(), trim +
    whitespace collapse.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    exprs = {}
    for c in cols:
        e = F.col(c)
        if strip_accents:
            e = F.translate(e, _ACCENTS_FROM, _ACCENTS_TO)
        if lowercase:
            e = F.lower(e)
        if collapse_whitespace:
            e = F.regexp_replace(F.trim(e), r"\s+", " ")
        exprs[c] = e
    return df.withColumns(exprs)


def align_schemas(dfs: Sequence[DataFrame]) -> list[DataFrame]:
    """Pre-union type alignment: columns sharing a name but not a type are
    widened (integral+fractional → double, anything else → string) so
    ``unionByName`` cannot fail on per-file inference drift (VERDICT
    round 1, missing #6; reference re-infers dtypes before load,
    tools.py:108-109). Metadata-only — casts fuse into the scan."""
    from collections import defaultdict

    types: dict[str, set] = defaultdict(set)
    for df in dfs:
        for f in df.schema.fields:
            types[f.name].add(f.dataType.simpleString())
    NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
    target: dict[str, str] = {}
    for name, ts in types.items():
        if len(ts) > 1:
            base = {t.split("(")[0] for t in ts}
            target[name] = "double" if base <= NUMERIC else "string"
    out = []
    for df in dfs:
        casts = {
            f.name: F.col(f.name).cast(target[f.name])
            for f in df.schema.fields
            if f.name in target and f.dataType.simpleString() != target[f.name]
        }
        out.append(df.withColumns(casts) if casts else df)
    return out


def coerce_inferable_types(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """Re-infer narrow types for string columns after a widening union
    (reference tools.py:108-109 re-infers dtypes before load).

    ONE aggregate computes, per column, how many non-blank values survive
    try_cast to bigint / double / timestamp; a column is coerced only when
    every non-blank value casts. Blank strings become NULL either way.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    cols = list(cols)
    if not cols:
        return df
    aggs = []
    for c in cols:
        v = F.nullif(F.trim(F.col(c)), F.lit(""))
        aggs.append(F.count(v).alias(f"{c}__n"))
        for t in ("bigint", "double", "timestamp"):
            aggs.append(F.count(v.try_cast(t)).alias(f"{c}__{t}"))
    stats = df.agg(*aggs).first()
    casts = {}
    for c in cols:
        n = stats[f"{c}__n"]
        if n == 0:
            continue
        v = F.nullif(F.trim(F.col(c)), F.lit(""))
        for t in ("bigint", "double", "timestamp"):
            if stats[f"{c}__{t}"] == n:
                casts[c] = v.try_cast(t)
                break
    return df.withColumns(casts) if casts else df


def filter_nonempty_tables(dfs: Sequence[DataFrame], names: Sequence[str]):
    """P10 — drop empty DataFrames from a processing list (main.py:141)."""
    pairs = [(d, n) for d, n in zip(dfs, names) if not d.isEmpty()]
    return [p[0] for p in pairs], [p[1] for p in pairs]


def distinct_directories(df: DataFrame, path_col: str = "path", level: int = 0) -> DataFrame:
    """A1 — unique path segments at a depth (reference tools.py:136-148).
    One distinct over a 1-column projection — pruned scan + partial agg."""
    return (
        df.select(F.split(F.col(path_col), "/").getItem(level).alias("directory"))
        .distinct()
    )


def union_similar_tables(dfs: Sequence[DataFrame]) -> DataFrame:
    """A2/U2 — unify structurally-similar tables into one (reference's
    merge_by_similarity, main.py:162-168 [ext]): ``unionByName`` with
    missing columns null-filled — also the schema-evolution union."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
