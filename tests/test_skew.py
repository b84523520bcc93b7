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
