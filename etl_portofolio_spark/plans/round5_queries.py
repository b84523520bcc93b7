"""Round-5 wave: scale-safe exact equi-depth, plus this round's new
analytics / pipeline queries.

Same contract as the sibling plan modules: pure DataFrame plans over
``catalog.load_table`` with exact DuckDB oracles, cross-engine
determinism rules throughout (integer cents, DuckDB sums cast to
BIGINT, double outputs only from identical expression trees over
exact integers, or rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.plans.analytics_queries import cents
from etl_portofolio_spark.plans.round4_queries import (
    _N_DEPTH_BUCKETS,
    ORACLE_EQUI_DEPTH,
)
from etl_portofolio_spark.session import apply_runtime_confs

# --- exact equi-depth without a global sort ----------------------------------

#: Pre-bin count for the scalable equi-depth path. Plays the role of
#: the shuffle partition count: each pre-bin is sorted independently,
#: so the widest bin bounds the largest single task.
_DEPTH_PREBINS = 32


def q_equi_depth_exact_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram with NO single-task global sort.

    The scale path for ``equi_depth_histogram``'s global ``ntile``
    (which funnels every row through one task): rows are pre-binned by
    a deterministic monotone key split — integer interpolation between
    the global min/max price — then each pre-bin independently sorts
    and row-numbers (one hash exchange, parallel across bins), and the
    global position of a row is its per-bin rank plus the exclusive
    running total of bin counts. Bucket assignment replays ntile's
    exact fill rule (first N mod B buckets take one extra row), so the
    result is byte-identical to the ntile plan — same oracle SQL.

    The bin-count frame is |bins| rows (metadata scale); its running
    total comes from a triangular broadcast self-join so the plan
    contains NO SinglePartition exchange anywhere (plan-asserted).
    Pre-bins are equi-width, so a pathological value distribution can
    skew bin sizes — at production scale the split points would come
    from a sampled sketch instead; the monotone-key + offset machinery
    is identical either way. Deterministic under recompute: the bin id
    is a pure function of the row and the (deterministic) min/max agg,
    never of physical partitioning.
    """
    apply_runtime_confs(spark)
    B = _N_DEPTH_BUCKETS
    P = _DEPTH_PREBINS
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("price_c")
    )
    bounds = orders.agg(
        F.min("price_c").alias("lo"), F.max("price_c").alias("hi")
    )
    # monotone integer split: bin = (price-lo)*P div (hi-lo+1) ∈ [0,P)
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        "price_c",
        (
            (F.col("price_c") - F.col("lo"))
            * F.lit(P)
            / (F.col("hi") - F.col("lo") + F.lit(1))
        )
        .cast("long")
        .alias("bin"),
    )
    w = Window.partitionBy("bin").orderBy(
        F.col("price_c").asc(), F.col("o_orderkey").asc()
    )
    pos = binned.withColumn("rn", F.row_number().over(w))
    cnts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    lower = cnts.select(F.col("bin").alias("lbin"), F.col("cnt").alias("lcnt"))
    offsets = (
        cnts.join(F.broadcast(lower), F.col("lbin") < F.col("bin"), "left")
        .groupBy("bin")
        .agg(F.coalesce(F.sum("lcnt"), F.lit(0)).alias("offset"))
    )
    total = cnts.agg(F.sum("cnt").alias("n_total"))
    pos0 = F.col("offset") + F.col("rn") - F.lit(1)  # 0-indexed global rank
    q = F.col("n_total") / F.lit(B)  # integral floor below
    q_floor = F.floor(q).cast("long")
    r = F.col("n_total") % F.lit(B)
    fat = r * (q_floor + F.lit(1))  # rows living in the first r fat buckets
    bucket = (
        F.when(pos0 < fat, F.floor(pos0 / (q_floor + F.lit(1))))
        .otherwise(r + F.floor((pos0 - fat) / q_floor))
        .cast("int")
        + F.lit(1)
    )
    return (
        pos.join(F.broadcast(offsets), "bin")
        .crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("price_c").alias("lo_c"),
            F.max("price_c").alias("hi_c"),
            F.sum("price_c").alias("sum_c"),
        )
    )


#: dict the registry splices in: name -> (query fn, oracle sql or None)
ROUND5_QUERIES: dict = {
    "equi_depth_exact_scalable": (q_equi_depth_exact_scalable, ORACLE_EQUI_DEPTH),
}
