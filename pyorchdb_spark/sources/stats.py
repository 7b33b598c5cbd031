"""Table column statistics — the ANALYZE TABLE analogue.

Generalizes the reference's per-column EDA (null counts over an eager
pandas frame — SURVEY.md A3) into a catalog artifact: one aggregation
job over a table snapshot computes per-column row/null/approx-distinct
counts and min/max, stored as versioned JSON beside the lake manifest.
This is the metadata a cost-based planner, a data-quality monitor, or a
skew diagnosis reads without touching the data again — the
Iceberg/Delta column-stats shape, at table granularity.

Scale shape: ONE whole-stage-codegen aggregate pass (count / sum-of-
isnull / approx_count_distinct HLL / min / max fused per column into a
single physical aggregate); driver receives one row regardless of table
size. ``approx_count_distinct`` keeps the pass single-shuffle — an
exact NDV would need a distinct per column.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, rsd: float = 0.02) -> dict:
    """Per-column stats in ONE aggregate job:
    {col: {count, nulls, approx_distinct, min, max}} plus ``_rows``."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for f in df.schema.fields:
        c = f.name
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__ndv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).first()
    out: dict = {"_rows": row["_rows"]}
    for f in df.schema.fields:
        c = f.name
        out[c] = {
            "type": f.dataType.simpleString(),
            "count": row["_rows"] - (row[f"{c}__nulls"] or 0),
            "nulls": row[f"{c}__nulls"] or 0,
            "approx_distinct": row[f"{c}__ndv"],
            "min": _jsonable(row[f"{c}__min"]),
            "max": _jsonable(row[f"{c}__max"]),
        }
    return out


def _jsonable(v):
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)  # timestamps, decimals, binary reprs


def analyze_table(lake, version: int | None = None, rsd: float = 0.02) -> dict:
    """ANALYZE: compute column stats for a table version's live snapshot
    and persist them as ``stats/v{version}.json`` under the table root
    (atomic tmp+rename — re-analyzing a version overwrites in place,
    stats are derived data, not a commit)."""
    m = lake.manifest(version)
    if m is None:
        raise ValueError("table has no commits")
    stats = column_stats(lake.snapshot(version=m.version), rsd=rsd)
    stats["_version"] = m.version
    sdir = os.path.join(lake.root, "stats")
    os.makedirs(sdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=sdir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, os.path.join(sdir, f"v{m.version:08d}.json"))
    return stats


def read_stats(lake, version: int | None = None) -> dict | None:
    """Stored stats for a version (default: the table's current one);
    None when that version was never analyzed."""
    m = lake.manifest(version)
    if m is None:
        return None
    path = os.path.join(lake.root, "stats", f"v{m.version:08d}.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)
