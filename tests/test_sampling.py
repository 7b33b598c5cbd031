"""operators/sampling.py: deterministic md5-bucket sampling/splitting."""

from __future__ import annotations

import hashlib

import pytest

from pyorchdb_spark.operators.sampling import hash_bucket, hash_sample, hash_split


def _docs(spark, n=400):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _py_bucket(key: str, seed: int = 42, n: int = 10_000) -> int:
    return int(hashlib.md5(f"{key}\x1f{seed}".encode()).hexdigest()[:8], 16) % n


def test_hash_bucket_matches_python_md5(spark):
    rows = _docs(spark, 50).select(
        "doc_id", hash_bucket(["doc_id"]).alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == _py_bucket(str(r["doc_id"]))


def test_hash_split_deterministic_and_proportional(spark):
    df = _docs(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {(r["doc_id"], r["split"]) for r in hash_split(df, w, ["doc_id"]).collect()}
    s2 = {(r["doc_id"], r["split"])
          for r in hash_split(df.repartition(7), w, ["doc_id"]).collect()}
    assert s1 == s2  # partitioning-independent
    counts = {}
    for _, sp in s1:
        counts[sp] = counts.get(sp, 0) + 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] / 400 - 0.8) < 0.08  # ~binomial tolerance
    # different seed -> different assignment
    s3 = {(r["doc_id"], r["split"])
          for r in hash_split(df, w, ["doc_id"], seed=7).collect()}
    assert s1 != s3


def test_hash_sample_is_subset_and_stable(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(df, 0.25, ["doc_id"]).collect()}
    b = {r["doc_id"] for r in hash_sample(df, 0.5, ["doc_id"]).collect()}
    assert a <= b  # nested samples: smaller fraction is a subset
    assert abs(len(a) / 400 - 0.25) < 0.08
    again = {r["doc_id"] for r in hash_sample(df, 0.25, ["doc_id"]).collect()}
    assert a == again


def test_split_weights_validated():
    from pyorchdb_spark.operators.sampling import split_column

    with pytest.raises(ValueError, match="sum to 1"):
        split_column({"a": 0.5, "b": 0.2}, ["x"])


def test_stratified_quota_exact_caps_and_partition_invariance(spark, sf_dir):
    """Every stratum is capped at EXACTLY min(n, stratum size), and the
    picked set is identical however the input is partitioned."""
    from pyorchdb_spark.operators.sampling import stratified_quota

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    sizes = {r["lang"]: r["c"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    out = stratified_quota(docs, strata=["lang"], n_per_stratum=10, order_cols=["doc_id"])
    got = {r["lang"]: r["c"] for r in out.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    assert got == {lang: min(10, n) for lang, n in sizes.items()}

    picked1 = {(r["doc_id"], r["lang"]) for r in out.collect()}
    picked2 = {
        (r["doc_id"], r["lang"])
        for r in stratified_quota(
            docs.repartition(13), strata=["lang"], n_per_stratum=10, order_cols=["doc_id"]
        ).collect()
    }
    assert picked1 == picked2
