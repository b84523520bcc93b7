"""Salted aggregation / join equivalence with plain formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.operators.skew import salted_aggregate, salted_join

from .conftest import SF_DIR


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "qty_c", F.round(F.col("l_quantity") * 100, 0).cast("long")
    )
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs=[
            ("qty_c", "sum", "sum_qty"),
            ("l_orderkey", "count", "n"),
            ("qty_c", "min", "min_qty"),
            ("qty_c", "max", "max_qty"),
        ],
        salt_from="l_orderkey",
        num_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("qty_c").alias("sum_qty"),
        F.count("l_orderkey").alias("n"),
        F.min("qty_c").alias("min_qty"),
        F.max("qty_c").alias("max_qty"),
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    salted = salted_join(li, orders, "o_orderkey", salt_from="l_quantity", num_salts=4)
    plain = li.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_outer(spark):
    import pytest

    from etl_portofolio_spark.operators.skew import salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left only"):
        salted_join(a, b, key="k", salt_from="k", how="full")


def test_mg_candidates_containment_guarantee(spark):
    """Misra-Gries candidates must contain EVERY key with global
    frequency > N/k (no false negatives), on a skewed synthetic frame
    spread across many partitions."""
    from etl_portofolio_spark.operators import skew

    rows = (
        [("hot",)] * 4000
        + [("warm",)] * 1500
        + [(f"cold{i}",) for i in range(4500)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(16)
    k = 8  # threshold N/k = 10000/8 = 1250
    cands = {r.k for r in skew.mg_candidates(df, "k", k).collect()}
    assert {"hot", "warm"} <= cands  # both above threshold

    exact = skew.heavy_hitters_exact_via_sketch(df, "k", k)
    got = {(r.k, r.n_rows) for r in exact.collect()}
    assert got == {("hot", 4000), ("warm", 1500)}


def test_lsh_hot_bucket_splits_under_aqe(spark):
    """VERDICT r5 #8: the MinHash band self-join under ONE hot bucket
    (500 byte-identical docs -> the same (band_id, band_hash) in every
    band) must let AQE's skew-join split the hot partition.  Thresholds
    are scaled far down as the local proxy for the 100 TB shapes where
    the defaults (256 MB) trigger: the hot bucket's shuffle blocks are
    highly repetitive, so LZ4 compresses them to a few KB at test
    scale.  coalescePartitions is disabled so the skew detector sees
    raw partition sizes, and forceOptimizeSkewedJoin allows the split
    even though the candidate pipeline reshuffles downstream (the
    production posture for dedup: an extra small shuffle beats one
    straggler task).  Cross-checked: the split changes the schedule,
    never the answer (pair count is the copies' full clique)."""
    from pyspark.sql import functions as F

    from etl_portofolio_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures_from_shingles,
        shingled_docs,
    )

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
        # plenty of partitions: the ~16 hot band-keys occupy a few,
        # the rest stay tiny, keeping the MEDIAN partition small
        "spark.sql.shuffle.partitions": "64",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot_text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(10_000 + i, hot_text) for i in range(500)] + [
            (i, f"unique document {i} alpha{i} beta{i * 7} gamma{i * 13}")
            for i in range(50)
        ]
        docs_df = spark.createDataFrame(rows, "doc_id long, text string")
        docs = shingled_docs(docs_df, "doc_id", "text")
        sig = minhash_signatures_from_shingles(docs, "doc_id", 64)
        bands = minhash_bands(sig, "doc_id", 64, 4)
        a, b = bands.alias("a"), bands.alias("b")
        joined = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        # drive execution through an agg over THIS plan (collecting the
        # ~2M raw candidate rows would be driver-side waste)
        agg = joined.agg(F.count(F.lit(1)).alias("n"))
        n = agg.collect()[0]["n"]
        # 16 bands x the hot clique, plus nothing from the unique docs
        assert n == 16 * (500 * 499 // 2)
        final = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
