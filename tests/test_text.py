from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.functions.text import (
    bpe_token_count,
    content_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    winnow_fingerprint,
)


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "  Hello,   world! 42 "), (2, ""), (3, None)], "id long, text string")
    out = df.select("id", token_count("text").alias("tc"), bpe_token_count("text").alias("bc")).collect()
    d = {r["id"]: (r["tc"], r["bc"]) for r in out}
    assert d[1] == (3, 5)  # ws: [Hello,; world!; 42]; bpe: [Hello , world ! 42]
    assert d[2][0] == 0


def test_lang_id_and_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro y la casa de los gatos para todos"),
            (3, "der hund ist mit der katze und das haus"),
            (4, "xyzzy qwerty asdf"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "und"}
    sw = df.filter("id = 1").select(stopword_ratio("text", "en").alias("r")).first()["r"]
    assert sw == pytest.approx(5 / 8)


def test_quality_and_punct(spark):
    good = "This is a perfectly reasonable sentence with enough words to pass the filters."
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    out = {r["id"]: (r["q"], r["p"]) for r in df.select(
        "id", quality_score("text").alias("q"), punct_ratio("text").alias("p")
    ).collect()}
    assert out[1][0] > out[2][0]
    assert out[2][1] > 0.5 and out[1][1] < 0.1


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh stable prefix"), (2, "abcdefgh stable prefix"), (3, "totally different")],
        "id long, text string",
    )
    fp = df.select("id", content_fingerprint("text").alias("f"), winnow_fingerprint("text").alias("w")).collect()
    d = {r["id"]: (r["f"], r["w"]) for r in fp}
    assert d[1] == d[2] and d[1] != d[3]
    assert all(isinstance(v[1], int) and v[1] >= 0 for v in d.values())


def test_text_ops_on_driver_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        "doc_id",
        token_count("text").alias("tc"),
        quality_score("text").alias("q"),
        lang_id("text").alias("lid"),
    )
    row = out.agg(F.min("q"), F.max("q"), F.sum("tc")).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0 and row[2] > 0


def test_scrub_pii_patterns(spark):
    from pyorchdb_spark.functions.text import scrub_pii

    rows = [
        (1, "mail me at alice.smith+x@sub.example.co.uk today"),
        (2, "server at 192.168.1.254 went down"),
        (3, "call +1 (555) 010-9987 or 555 123 4567 now"),
        (4, "nothing sensitive here, just v1.2 and value 42"),
        (5, "combo bob@x.io from 10.0.0.1 phone +44 20 7946 0958"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["id"]: r["c"] for r in df.select("id", scrub_pii(F.col("t")).alias("c")).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server at <IP> went down"
    assert "<PHONE>" in out[3] and "555" not in out[3]
    assert out[4] == "nothing sensitive here, just v1.2 and value 42"
    assert "<EMAIL>" in out[5] and "<IP>" in out[5] and "<PHONE>" in out[5]


def test_ngram_contamination_semantics(spark):
    from pyorchdb_spark.operators.dedup_docs import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),        # fully contained
            (2, "the quick brown cat sleeps well"),  # partial: 1 of 4 shingles
            (3, "completely unrelated words here"),  # zero overlap
            (4, "   "),                              # token-less: no row
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in ngram_contamination(docs, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["contamination"] == 1.0 and out[1]["n_grams"] == 3
    assert out[2]["n_grams"] == 4 and out[2]["n_contaminated"] == 1
    assert out[3]["n_contaminated"] == 0 and out[3]["contamination"] == 0.0


def test_repetition_stats_known_values(spark):
    from pyorchdb_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),              # 2-grams: ab, ba, ab -> top 2/3; one line, no dup
            (2, "x\nx\ny"),              # 3 lines, 2 distinct -> dup 1/3; grams: 'x x','x y'
            (3, "solo"),                  # <2 tokens -> 0.0 grams
            (4, ""),                      # empty: one empty line, no grams
            (5, None),                    # NULL text -> both 0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert abs(got[1]["top_2gram_frac"] - 2 / 3) < 1e-9
    assert got[1]["dup_line_frac"] == 0.0
    assert abs(got[2]["dup_line_frac"] - 1 / 3) < 1e-9
    assert got[2]["top_2gram_frac"] == 0.5  # 'x x' and 'x y' once each -> 1/2
    assert got[3]["top_2gram_frac"] == 0.0 and got[3]["dup_line_frac"] == 0.0
    assert got[4]["top_2gram_frac"] == 0.0 and got[4]["dup_line_frac"] == 0.0
    assert got[5]["top_2gram_frac"] == 0.0 and got[5]["dup_line_frac"] == 0.0
