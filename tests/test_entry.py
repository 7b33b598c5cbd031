"""Mimic the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.01 — row count, column names, and (order-insensitive)
values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm(rows, cols):
    """Sort columns by name, normalize floats, return sorted row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def fix(v):
        if isinstance(v, float):
            return round(v, 9) if not math.isnan(v) else "nan"
        return v

    return sorted((tuple(fix(r[i]) for i in order) for r in rows), key=repr)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _norm(srows, scols) == _norm(drows, dcols), f"{name}: values differ"


def test_every_query_runs_and_entry_smoke(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # queries without an oracle still must run and return rows
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF)
        assert df.count() >= 0, name
    out = entrymod.entry(spark)
    assert out.count() > 0


def test_analytics_plan_shapes(spark):
    """Scale-shape assertions on the physical plans of the join-heavy
    analytics queries: dimension filter pushed into the scan, columns
    pruned, and small dimensions broadcast."""
    import re

    sf = "/root/testdata/sf0.001"
    q3 = entrymod.q3_shipping_priority(spark, sf)
    plan3 = q3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan3
    # the BUILDING filter reaches the customer parquet scan
    assert re.search(r"FileScan parquet.*c_mktsegment[^\n]*DataFilters:[^\n]*c_mktsegment", plan3)

    q1 = entrymod.q1_pricing_summary(spark, sf)
    plan1 = q1._jdf.queryExecution().executedPlan().toString()
    scan = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*DataFilters: \[([^\]]*)\]", plan1)
    assert scan, plan1
    # column pruning: the 16-col lineitem scan reads only the 6 needed
    assert len(scan.group(1).split(",")) <= 6
    # shipdate predicate pushed below the aggregation into the scan
    assert "l_shipdate" in scan.group(2)

    # q6: every predicate reaches the lineitem scan; only 4 columns read
    q6 = entrymod.q6_forecast_revenue(spark, sf)
    plan6 = q6._jdf.queryExecution().executedPlan().toString()
    scan6 = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*DataFilters: \[([^\]]*)\]", plan6)
    assert scan6, plan6
    assert len(scan6.group(1).split(",")) <= 4
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in scan6.group(2)

    # q4: the EXISTS is planned as a semi join, never a cartesian/NLJ
    q4 = entrymod.q4_order_priority(spark, sf)
    plan4 = q4._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan4
    assert "Cartesian" not in plan4

    # q2: the decorrelated min-cost lookup stays all-broadcast — no
    # sort-merge exchange anywhere in a dimension-only join tree
    q2 = entrymod.q2_min_cost_supplier(spark, sf)
    plan2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan2
    assert "Cartesian" not in plan2
    assert plan2.count("BroadcastHashJoin") >= 4

    # q11: the uncorrelated scalar total is a 1-row broadcast nested
    # loop (Catalyst's own scalar-subquery shape), not a shuffle
    q11 = entrymod.q11_important_parts(spark, sf)
    plan11 = q11._jdf.queryExecution().executedPlan().toString()
    assert plan11.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan11

    # q16: the complaints exclusion is a broadcast ANTI join
    q16 = entrymod.q16_supplier_count(spark, sf)
    plan16 = q16._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan16 and "BroadcastHashJoin" in plan16
