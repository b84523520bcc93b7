"""Numpy-vectorized top-k vs the expression-fold version."""

from __future__ import annotations

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.operators import similarity

from .conftest import SF_DIR


def test_np_topk_matches_expression_topk(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qids = (0, 1, 2, 3, 4)
    expr = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(emb, query_ids=qids, k=5).collect()
    }
    vec = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk_np(emb, query_ids=qids, k=5).collect()
    }
    assert expr.keys() == vec.keys()
    for key, (nid, cos) in expr.items():
        nid2, cos2 = vec[key]
        assert nid == nid2, (key, nid, nid2)
        # BLAS vs sequential-fold summation order: tiny float drift only
        assert abs(cos - cos2) < 1e-9


def test_topk_facade_dispatches_to_np(spark):
    """similarity.topk (the library default) is the numpy kernel."""
    emb = load_table(spark, SF_DIR, "embeddings")
    qids = (0, 1, 2)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.topk(emb, query_ids=qids, k=3).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk_np(emb, query_ids=qids, k=3).collect()
    }
    assert got == want


def test_near_dup_lsh_recall_vs_exact(spark):
    """LSH blocking is a strict subset of exact pairs with recall >= 0.9.

    2 planes x 6 tables at the fixture's dup band (cos 0.35-0.7,
    theta 55-70 deg) predicts recall 0.94-0.97; measured 261/271 at
    sf0.01. Every emitted pair must be a true pair with the exact
    cosine (blocking changes WHICH pairs surface, never their values).
    """
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators import similarity

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dup_pairs(emb).collect()
    }
    truth = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.embedding_near_dup_pairs_exact(emb).collect()
    }
    assert set(got) <= set(truth)
    for pair, cos in got.items():
        assert cos == truth[pair]
    assert len(got) / len(truth) >= 0.9


def test_kmeans_fit_recovers_planted_clusters(spark):
    """Three tight planted groups around near-orthogonal directions:
    two Lloyd rounds must co-assign each group, deterministically."""
    from etl_portofolio_spark.caching import release_cached
    from etl_portofolio_spark.operators.similarity import kmeans_fit

    base = {0: [10.0, 0.0, 0.0, 1.0], 1: [0.0, 10.0, 0.0, 1.0], 2: [0.0, 0.0, 10.0, 1.0]}
    rows = []
    for vid in range(30):
        g = vid % 3
        jitter = [0.01 * ((vid * 7 + d) % 5) for d in range(4)]
        rows.append((vid, [b + j for b, j in zip(base[g], jitter)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_fit(emb, k=3, iterations=2).collect()
    }
    release_cached()
    assert len(got) == 30
    # every planted group lands in exactly one cluster
    for g in range(3):
        assert len({got[v] for v in range(30) if v % 3 == g}) == 1
    # and the three groups are in three distinct clusters
    assert len({got[0], got[1], got[2]}) == 3

    got2 = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_fit(emb, k=3, iterations=2).collect()
    }
    release_cached()
    assert got2 == got


def test_pq_codes_in_range_and_recall_floor(spark):
    """PQ codes are valid centroid indexes and ADC recall@5 against
    exact L2 is materially better than random (random recall for k=5
    of 500 is ~1%; require >= 20% mean)."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators import similarity

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    codes = similarity.pq_encode(emb)
    stats = codes.selectExpr(
        "min(code_0) a", "max(code_0) b", "min(code_3) c", "max(code_3) d"
    ).first()
    assert 0 <= stats.a and stats.b <= similarity.PQ_CENTROIDS - 1
    assert 0 <= stats.c and stats.d <= similarity.PQ_CENTROIDS - 1

    from etl_portofolio_spark.plans.round5d_queries import q_ann_pq_recall

    rec = q_ann_pq_recall(spark, SF_DIR).collect()
    assert rec and all(0 <= r.n_hits <= r.k for r in rec)
    mean_recall = sum(r.n_hits / r.k for r in rec) / len(rec)
    assert mean_recall >= 0.2, f"PQ recall collapsed: {mean_recall}"


def test_pq_encode_np_matches_expression_path(spark):
    """The BLAS encode must produce the SAME codes as the oracle-exact
    expression encode on the fixture corpus (ulp-level summation
    differences must not flip any argmin here)."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators import similarity

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = similarity.pq_seed_codebook(emb)
    a = similarity.pq_encode(emb, cb).collect()
    b = similarity.pq_encode_np(emb, cb).collect()
    ka = {r.vec_id: tuple(r)[1:] for r in a}
    kb = {r.vec_id: tuple(r)[1:] for r in b}
    assert ka == kb


def test_pq_search_facade_matches_expression_search(spark):
    """The BLAS-encode facade must return exactly the expression
    search's rows (codes are test-identical, LUT/rerank shared)."""
    import time

    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators import similarity

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = similarity.pq_seed_codebook(emb)
    t0 = time.time()
    fast = {tuple(r) for r in similarity.pq_search(emb, codebook=cb).collect()}
    t_fast = time.time() - t0
    t0 = time.time()
    slow = {tuple(r) for r in similarity.pq_search_topk(emb, codebook=cb).collect()}
    t_slow = time.time() - t0
    assert fast == slow and len(fast) > 0
    # informational: the facade should not be slower by more than noise
    assert t_fast < t_slow * 2


def test_cosine_fold_pd_bit_identical_to_expression_fold(spark):
    """The Arrow-vectorized sequential fold must equal the expression
    fold BIT-FOR-BIT (==, not approx): it accumulates per dimension in
    the same left-to-right IEEE order, so any drift means the kernel
    stopped replaying the fold the DuckDB oracles replay."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    docs = emb.select(
        F.col("vec_id").alias("id"), similarity._dvec("embedding").alias("v")
    )
    probes = docs.where(F.col("id") < 3).select(
        F.col("id").alias("pid"), F.col("v").alias("qv")
    )
    both = (
        docs.join(F.broadcast(probes), F.col("id") != F.col("pid"))
        .select(
            "pid",
            "id",
            similarity.cosine(F.col("qv"), F.col("v")).alias("c_expr"),
            similarity.cosine_fold_pd(F.col("qv"), F.col("v")).alias("c_pd"),
        )
        .collect()
    )
    assert len(both) > 0
    for r in both:
        assert r["c_expr"] == r["c_pd"], (r["pid"], r["id"], r["c_expr"], r["c_pd"])
