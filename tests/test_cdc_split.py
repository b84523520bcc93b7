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


def _state(spark, path):
    df = spark.read.parquet(path)
    return {
        r["k"]: (r["v"], r["s"]) for r in df.select("k", "v", "s").collect()
    }


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v long, s string, op string, seq long"
    )


def test_apply_changes_upsert_delete_and_collapse(spark, tmp_path):
    from etl_portofolio_spark.operators.cdc import apply_changes

    tgt = str(tmp_path / "state")
    apply_changes(
        spark,
        _changes(spark, [(1, 10, "a", "insert", 1), (2, 20, "b", "insert", 2)]),
        tgt,
        ("k",),
        n_buckets=4,
    )
    assert _state(spark, tgt) == {1: (10, "a"), 2: (20, "b")}
    # second batch: update k=1 twice (later seq wins), delete k=2, insert k=3
    apply_changes(
        spark,
        _changes(
            spark,
            [
                (1, 11, "a", "update", 3),
                (1, 12, "a", "update", 4),
                (2, 0, "b", "delete", 5),
                (3, 30, "c", "insert", 6),
            ],
        ),
        tgt,
        ("k",),
        n_buckets=4,
    )
    assert _state(spark, tgt) == {1: (12, "a"), 3: (30, "c")}


def test_apply_changes_replay_is_idempotent(spark, tmp_path):
    from etl_portofolio_spark.operators.cdc import apply_changes

    tgt = str(tmp_path / "state")
    b1 = [(1, 10, "a", "insert", 1), (2, 20, "b", "insert", 2)]
    b2 = [(2, 0, "b", "delete", 3), (3, 30, "c", "insert", 4)]
    apply_changes(spark, _changes(spark, b1), tgt, ("k",), n_buckets=4)
    apply_changes(spark, _changes(spark, b2), tgt, ("k",), n_buckets=4)
    once = _state(spark, tgt)
    apply_changes(spark, _changes(spark, b2), tgt, ("k",), n_buckets=4)
    assert _state(spark, tgt) == once == {1: (10, "a"), 3: (30, "c")}


def test_apply_changes_clears_emptied_bucket(spark, tmp_path):
    """Deleting the last key of a bucket must remove its partition —
    dynamic overwrite alone would leave the dead rows in place."""
    from etl_portofolio_spark.operators.cdc import apply_changes

    tgt = str(tmp_path / "state")
    # n_buckets=1: every key in one bucket; delete all of them
    apply_changes(
        spark,
        _changes(spark, [(1, 10, "a", "insert", 1)]),
        tgt,
        ("k",),
        n_buckets=1,
    )
    apply_changes(
        spark,
        _changes(spark, [(1, 0, "a", "delete", 2)]),
        tgt,
        ("k",),
        n_buckets=1,
    )
    try:
        n = spark.read.parquet(tgt).count()
    except Exception:
        n = 0  # whole state gone is also correct
    assert n == 0


def test_cdc_stream_apply_end_to_end(spark, tmp_path):
    """A file-sourced CDC stream applied via foreachBatch converges to
    the collapsed state (availableNow catch-up run)."""
    from etl_portofolio_spark.operators.cdc import cdc_apply_sink

    src = str(tmp_path / "changes")
    tgt = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _changes(
        spark,
        [
            (1, 10, "a", "insert", 1),
            (2, 20, "b", "insert", 2),
            (1, 11, "a", "update", 3),
            (2, 0, "b", "delete", 4),
            (3, 30, "c", "insert", 5),
        ],
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(cdc_apply_sink(spark, tgt, ("k",), n_buckets=4))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _state(spark, tgt) == {1: (11, "a"), 3: (30, "c")}


def test_violations_report_counts_and_null_hostility(spark):
    from etl_portofolio_spark.operators.contracts import violations_report

    df = spark.createDataFrame(
        [(1, 5, "a"), (2, 60, "a"), (3, None, "b"), (4, 7, "b")],
        "k long, q long, g string",
    )
    rules = {
        "q_small": F.col("q") < 50,  # row 2 violates; row 3 NULL -> violates
        "k_pos": F.col("k") > 0,  # nobody violates
    }
    rows = {
        r["g"]: r for r in violations_report(df, rules, group_by=("g",)).collect()
    }
    assert rows["a"]["n_rows"] == 2 and rows["a"]["v_q_small"] == 1
    assert rows["a"]["v_k_pos"] == 0 and rows["a"]["n_bad"] == 1
    assert rows["b"]["v_q_small"] == 1 and rows["b"]["n_bad"] == 1
    # global (ungrouped) variant
    g = violations_report(df, rules).collect()[0]
    assert g["n_rows"] == 4 and g["n_bad"] == 2
    try:
        violations_report(df, {})
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for empty rules")
