"""Line-level boilerplate removal — the C4-style corpus cleaning pass.

Lines that recur across many documents (nav bars, license headers,
"GENERATED FILE" banners, cookie notices) are template noise, not
content; C4/Dolma-style pipelines drop a line when its document
frequency crosses a threshold. The reference has no text-content ops
(its cleaning is cell-level accent/case normalization); this is an
engine extension in the training-data family.

Scale shape (100 TB of documents):

    1. posexplode the line split — (id, idx, line) rows, one scan;
    2. document frequency per line: groupBy(line).agg(countDistinct(id))
       — ONE shuffle keyed by the line string, partial map-side;
       the surviving boilerplate set (df >= threshold) is tiny by
       definition (only template lines repeat across documents);
    3. anti-join lines against the boilerplate set (AQE broadcasts it
       from statistics — it is small by construction, but not hinted:
       a pathological corpus of pure duplicates degrades to a shuffle
       join instead of an OOM);
    4. reassemble per doc: collect the kept (idx, line) structs,
       array_sort restores original order deterministically (collect_list
       order is not), concat_ws rejoins.

No UDFs anywhere; every step is whole-stage-codegen built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(
    docs: DataFrame,
    min_doc_frequency: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(line, df) for every non-blank line appearing in at least
    ``min_doc_frequency`` DISTINCT documents."""
    lines = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    return (
        lines.filter(F.trim("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_doc_frequency)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_frequency: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop boilerplate lines from every document; returns
    (id, clean_text) for documents with at least one surviving line
    (a document that was ALL boilerplate disappears — the curation
    outcome C4 intends for pure-template pages).

    Blank lines are never counted as boilerplate and survive (they are
    layout, and counting them would nuke every paragraph break in the
    corpus once ``min_doc_frequency`` documents contain one).
    """
    boiler = boilerplate_lines(docs, min_doc_frequency, text_col, id_col)
    kept = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
        )
        .join(boiler.select("line"), "line", "left_anti")
    )
    return (
        kept.groupBy("id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text")
        )
    )
