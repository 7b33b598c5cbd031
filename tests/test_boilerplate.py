"""operators/boilerplate.py: C4-style line-level boilerplate removal."""

from __future__ import annotations

from pyorchdb_spark.operators.boilerplate import boilerplate_lines, remove_boilerplate_lines

HDR = "GENERATED - DO NOT EDIT"


def _docs(spark):
    rows = [
        (1, f"{HDR}\nunique body one\n\nfooter"),
        (2, f"{HDR}\nunique body two\nfooter"),
        (3, f"{HDR}\nunique body three\nfooter"),
        (4, "all alone doc"),
        (5, f"{HDR}\nfooter"),  # pure boilerplate -> disappears
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_df_threshold(spark):
    got = {r["line"]: r["df"] for r in boilerplate_lines(_docs(spark), 3).collect()}
    assert got == {HDR: 4, "footer": 4}
    # threshold respected: bodies (df=1) never qualify
    got2 = {r["line"] for r in boilerplate_lines(_docs(spark), 5).collect()}
    assert got2 == set()


def test_remove_boilerplate_preserves_order_and_blanks(spark):
    out = {r["id"]: r["clean_text"] for r in remove_boilerplate_lines(_docs(spark), 3).collect()}
    # boilerplate gone, original line order and the blank line kept
    assert out[1] == "unique body one\n"
    assert out[2] == "unique body two"
    assert out[4] == "all alone doc"
    assert 5 not in out  # all-boilerplate doc removed entirely
