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
