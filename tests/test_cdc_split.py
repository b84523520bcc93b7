"""Unit tests for the round-3 second wave: CDC snapshot diff and the
deterministic dataset split. Oracle parity for the registered queries
lives in tools/check_oracle.py; these pin semantics on hand-built
inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portofolio_spark.functions.hashing import h32
from etl_portofolio_spark.operators.cdc import snapshot_diff


def _log(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "k long, v long, s string")
    new = spark.createDataFrame(new_rows, "k long, v long, s string")
    return {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ("k",), ("v", "s")).collect()
    }


def test_snapshot_diff_classifies_all_four_types(spark):
    got = _log(
        spark,
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        [(1, 10, "a"), (2, 21, "b"), (4, 40, "d")],
    )
    assert got == {1: "unchanged", 2: "update", 3: "delete", 4: "insert"}


def test_snapshot_diff_null_safe_compare(spark):
    # NULL -> NULL is unchanged; NULL -> value and value -> NULL are updates
    got = _log(
        spark,
        [(1, None, "a"), (2, None, "b"), (3, 30, "c")],
        [(1, None, "a"), (2, 5, "b"), (3, None, "c")],
    )
    assert got == {1: "unchanged", 2: "update", 3: "update"}


def test_snapshot_diff_carries_old_and_new_values(spark):
    old = spark.createDataFrame([(2, 20, "b")], "k long, v long, s string")
    new = spark.createDataFrame([(2, 21, "b")], "k long, v long, s string")
    row = snapshot_diff(old, new, ("k",), ("v", "s")).collect()[0]
    assert (row["v_old"], row["v_new"]) == (20, 21)
    assert (row["s_old"], row["s_new"]) == ("b", "b")


def test_snapshot_diff_rejects_empty_keys(spark):
    df = spark.createDataFrame([(1, 1, "a")], "k long, v long, s string")
    try:
        snapshot_diff(df, df, (), ("v",))
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for empty keys")


def test_split_buckets_are_stable_and_partition_the_corpus(spark):
    # The split bucket is a pure function of doc_id: recomputing over a
    # different partitioning/order yields the identical assignment.
    ids = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    bucket = h32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 1000
    a = {r["doc_id"]: r["b"] for r in ids.select("doc_id", bucket.alias("b")).collect()}
    b = {
        r["doc_id"]: r["b"]
        for r in ids.repartition(7)
        .sort(F.col("doc_id").desc())
        .select("doc_id", bucket.alias("b"))
        .collect()
    }
    assert a == b
    assert all(0 <= v < 1000 for v in a.values())
    # rough mass balance: train ~90%, val ~5%, test ~5%
    train = sum(1 for v in a.values() if v < 900)
    assert 0.85 <= train / len(a) <= 0.95
