from __future__ import annotations

import numpy as np

from pyorchdb_spark.operators.similarity import brute_force_topk, lsh_topk, recall_at_k


def _vecs(spark, n=60, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.standard_normal(dim).astype(np.float32).tolist(), int(i % 3)) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_matches_numpy(spark):
    df = _vecs(spark).cache()
    try:
        queries = df.limit(4)
        got = brute_force_topk(df, queries, k=3).collect()
        rows = df.collect()
        mat = np.stack([np.array(r["embedding"]) for r in rows])
        ids = [r["vec_id"] for r in rows]
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = norm @ norm.T
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"], r["cos_sim"]))
        for q in [r["vec_id"] for r in queries.collect()]:
            qi = ids.index(q)
            order = [
                ids[j]
                for j in sorted(range(len(ids)), key=lambda j: (-sims[qi, j], ids[j]))
                if ids[j] != q
            ][:3]
            got_order = [cid for _, cid, _ in sorted(by_q[q])]
            assert got_order == order
    finally:
        df.unpersist()


def _clustered_vecs(spark, n_clusters=30, per_cluster=4, dim=8, seed=7):
    """Near-dup-shaped corpus: tight clusters of perturbed copies — the
    regime SRP-LSH is built for (true neighbors have cosine ~0.99)."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((vid, v.astype(np.float32).tolist(), c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_lsh_topk_recall(spark):
    df = _clustered_vecs(spark).cache()
    try:
        queries = df.limit(6)
        exact = brute_force_topk(df, queries, k=3)
        approx = lsh_topk(df, queries, k=3, n_bits=8, dim=8, multi_probe=True)
        r = recall_at_k(exact, approx, k=3)
        assert r >= 0.8  # cluster-mates share SRP buckets w.h.p.
        # approximate results are real corpus vectors with correct scores
        assert approx.filter("cos_sim > 1.0001 or cos_sim < -1.0001").isEmpty()
    finally:
        df.unpersist()


def test_ann_on_driver_testdata(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(3)
    out = brute_force_topk(emb, queries, k=5)
    assert out.groupBy("query_id").count().filter("count != 5").isEmpty()


def test_embedding_neardup_exact_vs_numpy(spark):
    from pyorchdb_spark.operators.similarity import embedding_neardup_pairs

    df = _vecs(spark, n=80)
    got = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, threshold=0.3, exact=True).collect()}
    rows = df.collect()
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    ids = [r["vec_id"] for r in rows]
    exp = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.3
    }
    assert got == exp


def test_embedding_neardup_lsh_subset_with_recall(spark):
    from pyorchdb_spark.operators.similarity import embedding_neardup_pairs

    df = _clustered_vecs(spark).cache()
    try:
        exact = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, threshold=0.9, exact=True).collect()}
        lsh = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, threshold=0.9, exact=False, n_bits=6).collect()}
        assert lsh <= exact  # verified candidates: no false positives
        assert exact and len(lsh) / len(exact) >= 0.5  # cluster-mates mostly share buckets
    finally:
        df.unpersist()


def test_ivf_topk_recall(spark):
    from pyorchdb_spark.operators.similarity import ivf_topk

    df = _clustered_vecs(spark, n_clusters=20, per_cluster=5).cache()
    try:
        queries = df.limit(6)
        exact = brute_force_topk(df, queries, k=3)
        approx = ivf_topk(df, queries, k=3, n_cells=10, n_probe=3)
        assert recall_at_k(exact, approx, k=3) >= 0.8
    finally:
        df.unpersist()


def test_ivf_corpus_assignment_is_projection_no_vector_exchange(spark):
    """VERDICT r2 #2: IVF cell assignment must be a pure projection —
    centroid array literals + argmax — so no Exchange anywhere in the
    plan carries the embedding vectors (the old shape shuffled a
    n_cells-x-expanded corpus through a per-id window)."""
    import io
    from contextlib import redirect_stdout

    from pyorchdb_spark.operators.similarity import ivf_topk

    df = _vecs(spark, n=80).cache()
    try:
        plan_df = ivf_topk(df, df.limit(4), k=3, n_cells=8, n_probe=2)
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan_df.explain("formatted")
        txt = buf.getvalue()
        blocks = [b for b in txt.split("\n\n") if b.strip()]
        exchanges = [b for b in blocks if ") Exchange" in b.splitlines()[0]]
        # corpus vectors (c_vec) must never ride an exchange; query-side
        # exchanges (q_vec) are bounded by the query set — fine
        for b in exchanges:
            assert "c_vec" not in b, b
        # and no window keyed by corpus_id (the old per-row argmax shape)
        assert "windowspecdefinition(corpus_id" not in txt.lower()
    finally:
        df.unpersist()
