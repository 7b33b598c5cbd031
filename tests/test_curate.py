from __future__ import annotations

from pyorchdb_spark.operators.curate import (
    distinct_directories,
    drop_empty_columns,
    drop_unnamed_columns,
    filter_contains,
    filter_not_contains,
    insert_period,
    normalize_column_names,
    rename_columns,
    union_similar_tables,
)


def test_drop_unnamed_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "y", None)],
        "`Unnamed: 0` long, `Col A` string, empty string",
    )
    out = drop_empty_columns(drop_unnamed_columns(df))
    assert out.columns == ["Col A"]


def test_normalize_and_rename(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["First Name", "firstName", "first-name"])
    out = normalize_column_names(df)
    assert out.columns == ["first_name", "first_name_1", "first_name_2"]
    out2 = rename_columns(out, {"first_name": "fn"})
    assert out2.columns[0] == "fn"


def test_filters_and_period(spark):
    df = spark.createDataFrame(
        [("data/sales_2024-01-15.csv",), ("data/catalog.csv",), ("other/report_1999.xlsx",)],
        ["path"],
    )
    assert filter_contains(df, "path", "SALES", lowercase=True).count() == 1
    assert filter_not_contains(df, "path", "catalog").count() == 2
    per = {r["path"]: r["periodo"] for r in insert_period(df, "path").collect()}
    assert per["data/sales_2024-01-15.csv"] == "2024-01-15"
    assert per["other/report_1999.xlsx"] == "1999"
    # reference inserts "" (not NULL) when neither regex matches (tools.py:202)
    assert per["data/catalog.csv"] == ""


def test_distinct_directories(spark):
    df = spark.createDataFrame([("a/x.csv",), ("a/y.csv",), ("b/z.csv",)], ["path"])
    assert {r["directory"] for r in distinct_directories(df).collect()} == {"a", "b"}


def test_union_similar_tables_schema_evolution(spark):
    t1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    t2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "name", "score"])
    out = union_similar_tables([t1, t2])
    assert set(out.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in out.collect()}
    assert rows[1] is None and rows[2] == 9.5
