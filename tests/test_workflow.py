"""F3 fixture (FIXTURES.md): the reference-shaped messy-raw flow,
end-to-end through the ETLWorkflow facade."""

from __future__ import annotations

import os

from pyorchdb_spark.workflow import ETLWorkflow, WorkflowConfig


def _write_messy_csvs(tmp_path):
    d = tmp_path / "rawdata"
    os.makedirs(d, exist_ok=True)
    (d / "sales_jan_2024-01-15.csv").write_text(
        "Unnamed: 0,Product Name,Qty,Region,ghost\n0,widget,3,north,\n1,gadget,5,south,\n"
    )
    # near-identical name, one column missing (schema drift)
    (d / "sales_feb_2024-02-15.csv").write_text(
        "Unnamed: 0,Product Name,Qty,ghost\n0,widget,7,\n1,sprocket,2,\n"
    )
    # unrelated table
    (d / "inventory_1999.csv").write_text("Item,Count\nwidget,10\n")
    return [str(d / f) for f in sorted(os.listdir(d))]


def test_build_curate_load_upload(spark, tmp_path):
    paths = _write_messy_csvs(tmp_path)
    wf = ETLWorkflow(spark, WorkflowConfig(columns_to_rename={"qty": "quantity"}))
    wf.build(paths).curate()

    assert set(wf.tables) == {"sales_feb", "inventory"}  # jan/feb clustered (rep = first name)
    sales = wf.tables["sales_feb"]
    assert "unnamed_0" not in [c.lower().replace(": ", "_") for c in sales.columns]
    assert "ghost" not in sales.columns  # all-null column dropped
    assert {"product_name", "quantity", "periodo"} <= set(sales.columns)
    assert sales.count() == 4  # unioned with missing 'region' null-filled
    per = {r["periodo"] for r in sales.select("periodo").distinct().collect()}
    assert per == {"2024-01-15", "2024-02-15"}
    region_nulls = sales.filter("region is null").count()
    assert region_nulls == 2

    out = wf.load(str(tmp_path / "processed"))
    assert set(out) == {"sales_feb", "inventory"}
    assert spark.read.parquet(out["sales_feb"]).count() == 4

    rows = wf.upload(str(tmp_path / "lake"), keys=["product_name", "periodo"])
    assert rows["sales_feb"] == 4
    # idempotent: re-upload skips committed batch
    rows2 = wf.upload(str(tmp_path / "lake"), keys=["product_name", "periodo"])
    assert rows2 == rows
