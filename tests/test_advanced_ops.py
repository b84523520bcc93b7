"""Unit tests for round-3 operators: chunk dedup, date spine, trailing
range windows. Oracle parity for the registered queries lives in
tools/check_oracle.py; these pin semantics on hand-built inputs."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from etl_portofolio_spark.operators.dedup import chunk_dedup_docs
from etl_portofolio_spark.operators.timeseries import (
    date_spine,
    gapfill_daily,
    trailing_range_sum,
)


def test_chunk_dedup_drops_repeated_chunk_keeps_first(spark):
    # chunk size 2: doc 1 = [a b][c d], doc 2 = [a b][x y] — doc 2's
    # first chunk is a corpus-wide repeat and must be dropped
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in chunk_dedup_docs(df, "doc_id", "text", chunk_words=2).collect()
    }
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 2
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 1
    assert rows[1]["kept_hash"] is not None


def test_chunk_dedup_fully_duplicate_doc_has_null_hash(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in chunk_dedup_docs(df, "doc_id", "text", chunk_words=2).collect()
    }
    assert rows[1]["n_kept"] == 1
    assert rows[2]["n_kept"] == 0 and rows[2]["kept_hash"] is None


def test_date_spine_inclusive_and_empty(spark):
    df = spark.createDataFrame(
        [(date(2024, 1, 1),), (date(2024, 1, 5),)], "d date"
    )
    got = sorted(r["d"] for r in date_spine(df, "d").collect())
    assert got[0] == date(2024, 1, 1) and got[-1] == date(2024, 1, 5)
    assert len(got) == 5
    assert date_spine(df.where(F.lit(False)), "d").count() == 0


def test_gapfill_flags_and_zero_fills(spark):
    daily = spark.createDataFrame(
        [(date(2024, 1, 1), 3), (date(2024, 1, 3), 7)], "d date, n long"
    )
    spine = date_spine(daily, "d")
    rows = {r["d"]: r for r in gapfill_daily(daily, spine, "d", ["n"]).collect()}
    assert rows[date(2024, 1, 2)]["n"] == 0
    assert rows[date(2024, 1, 2)]["was_gap"] is True
    assert rows[date(2024, 1, 3)]["n"] == 7
    assert rows[date(2024, 1, 3)]["was_gap"] is False


def test_trailing_range_sum_includes_same_day_peers(spark):
    # two orders on day 10 are peers: BOTH rows see both (RANGE frame)
    df = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 50), (1, 16, 10), (1, 17, 1)],
        "k long, day int, v long",
    )
    out = trailing_range_sum(
        df, "k", F.col("day").cast("long"), F.col("v"), 7, "trail"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["day"], []).append(r["trail"])
    assert by[10] == [150, 150]
    assert by[16] == [160]  # day 10 within 7-day window of day 16
    assert by[17] == [11]  # day 10 fell out; day 16 still in


def test_operator_argument_guards(spark):
    """Degenerate arguments fail loudly at plan-build time instead of
    silently corrupting results (dropped LSH bands, empty chunk grids,
    inverted window frames)."""
    import pytest

    from etl_portofolio_spark.operators.dedup import minhash_bands
    from etl_portofolio_spark.operators.rangejoin import bucketed_range_join
    from etl_portofolio_spark.operators.skew import salt_column

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_words"):
        chunk_dedup_docs(df, "doc_id", "text", chunk_words=0)
    with pytest.raises(ValueError, match="multiple"):
        minhash_bands(df, "doc_id", num_hashes=16, rows=5)
    with pytest.raises(ValueError, match="bucket_width"):
        bucketed_range_join(df, df, "doc_id", "doc_id", "doc_id", 0.0)
    with pytest.raises(ValueError, match="days"):
        trailing_range_sum(df, "doc_id", F.col("doc_id"), F.col("doc_id"), 0, "x")
    with pytest.raises(ValueError, match="num_salts"):
        salt_column("doc_id", 0)


def test_approx_distinct_audit_bounds_hold(spark):
    """HLL error stays inside 3x rsd on every fixture cardinality class
    (150 users, ~10k event ids) — the evidence that licenses the sketch
    swap at scale."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators.util import approx_distinct_audit

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    for col in ("user_id", "event_id", "event_type"):
        row = approx_distinct_audit(ev, col, rsd=0.05).first()
        assert row["within_bound"], (col, row["rel_err"])
        assert row["exact"] > 0
    # tiny domains are exact (HLL stores them losslessly)
    assert approx_distinct_audit(ev, "event_type").first()["rel_err"] == 0.0
