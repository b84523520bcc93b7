"""Unit tests for the bucketized range join, decontamination, and
repetition features — hand-built inputs with by-inspection expected
output (the oracle-parity suite covers the registered queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portofolio_spark.operators.dedup import decontaminate
from etl_portofolio_spark.operators.rangejoin import bucketed_range_join
from etl_portofolio_spark.operators.text import repetition_features, tokens


def test_range_join_boundaries_and_bucket_spans(spark):
    # interval [5, 25] spans buckets 0..2 at width 10; points probe the
    # exact boundaries, the interior, and both outsides
    points = spark.createDataFrame(
        [(1, 4.0), (2, 5.0), (3, 15.0), (4, 25.0), (5, 26.0)], "pid long, x double"
    )
    intervals = spark.createDataFrame([(100, 5, 25)], "iid long, lo long, hi long")
    got = sorted(
        r["pid"]
        for r in bucketed_range_join(
            points, intervals, "x", "lo", "hi", bucket_width=10.0
        ).collect()
    )
    assert got == [2, 3, 4]


def test_range_join_no_duplicate_matches(spark):
    # a point matching an interval that spans several buckets must match
    # exactly once (the match is found only in the point's own bucket)
    points = spark.createDataFrame([(1, 15.0)], "pid long, x double")
    intervals = spark.createDataFrame([(100, 0, 100)], "iid long, lo long, hi long")
    rows = bucketed_range_join(
        points, intervals, "x", "lo", "hi", bucket_width=10.0
    ).collect()
    assert len(rows) == 1


def test_range_join_overlapping_intervals(spark):
    points = spark.createDataFrame([(1, 10.0)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(100, 5, 15), (200, 8, 12), (300, 11, 20)], "iid long, lo long, hi long"
    )
    got = sorted(
        r["iid"]
        for r in bucketed_range_join(
            points, intervals, "x", "lo", "hi", bucket_width=10.0
        ).collect()
    )
    assert got == [100, 200]


def test_decontaminate_drops_only_gram_sharers(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # shares the full 3-gram "beta gamma delta" -> contaminated
            (1, "zzz beta gamma delta yyy"),
            # shares words but no 3-gram -> clean
            (2, "beta alpha delta gamma"),
            # disjoint -> clean
            (3, "one two three four"),
            # too short for any 3-gram -> clean
            (4, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, eval_df, "doc_id", "text", k=3).collect()
    )
    assert kept == [2, 3, 4]


def test_decontaminate_corpus_releases_gram_cache(spark):
    # The single-pass form persists the gram stream internally; that
    # cache must be dropped before the call returns, not leak for the
    # rest of the session (ADVICE r2). localCheckpoint RDDs are not in
    # the cache manager, so an empty manager proves the unpersist ran.
    from pyspark.sql import functions as F

    from etl_portofolio_spark.operators.dedup import decontaminate_corpus

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(20)],
        "doc_id long, text string",
    )
    out = decontaminate_corpus(docs, "doc_id", "text", F.col("doc_id") >= 18, k=2)
    assert out.count() > 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_blocked_fuzzy_pairs_semantics(spark):
    from etl_portofolio_spark.operators.er import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [("acme corp",), ("acme corp",), ("acme class",), ("acme co",), ("zenith co",)],
        "name string",
    )
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(
            df, "name", block=F.split(F.col("name"), " ")[0], max_dist=3
        ).collect()
    }
    # same block, within distance; duplicate rows deduped before pairing;
    # zenith is in another block so never compared
    assert got == {("acme co", "acme corp"): 2}


def test_repetition_features_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z")], "doc_id long, text string"
    )
    toked = df.select("doc_id", tokens("text").alias("__toks"))
    feats = repetition_features(F.col("__toks"))
    rows = {
        r["doc_id"]: r
        for r in toked.select(
            "doc_id", *[c.alias(n) for n, c in feats.items()]
        ).collect()
    }
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct"] == 2
    assert abs(rows[1]["repetition_ratio"] - 0.5) < 1e-12
    assert abs(rows[1]["top_token_ratio"] - 0.75) < 1e-12
    assert rows[2]["repetition_ratio"] == 0.0
    assert abs(rows[2]["top_token_ratio"] - 0.25) < 1e-12
