"""Read-side data skipping: zonemap pruning over clustered layouts.

The contract under test is the one that matters at 100 TB: a range
predicate on the cluster column must READ fewer files than the table
holds (pruning happens), and the pruned read must return byte-identical
rows to the unpruned filter (pruning never changes answers).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.sinks.writer import write_range_clustered
from etl_portofolio_spark.sources import skipping
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "events_clustered")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    write_range_clustered(ev, path, "event_id", n_files=8)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_footer_zonemap_covers_all_files_disjointly(spark, clustered):
    zmap = skipping.footer_zonemap(clustered, "event_id")
    assert len(zmap) == 8
    assert all(rows > 0 for _, _, _, rows in zmap)
    spans = sorted((lo, hi) for _, lo, hi, _ in zmap)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # the writer's disjoint-envelope property


def test_build_zonemap_matches_footer_stats(spark, clustered):
    zmap_scan = {
        r["file"].removeprefix("file://"): (r["zmin"], r["zmax"], r["n_rows"])
        for r in skipping.build_zonemap(spark, clustered, "event_id").collect()
    }
    zmap_footer = {
        f: (lo, hi, rows)
        for f, lo, hi, rows in skipping.footer_zonemap(clustered, "event_id")
    }
    assert zmap_scan == zmap_footer


def test_skipping_scan_prunes_to_few_files_and_matches_full_filter(
    spark, clustered
):
    ids = spark.read.parquet(clustered).agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).first()
    # a narrow range around the low end of the key space
    lo = ids["lo"]
    hi = lo + (ids["hi"] - ids["lo"]) // 20
    pruned = skipping.skipping_scan(spark, clustered, "event_id", lo, hi)
    # proof of pruning: the physical read touches a strict subset of files
    assert 0 < len(pruned.inputFiles()) < 8
    full = spark.read.parquet(clustered).where(
        (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
    )
    assert _rows(pruned) == _rows(full)


def test_point_lookup_reads_one_file(spark, clustered):
    some_id = spark.read.parquet(clustered).agg(F.max("event_id")).first()[0]
    pruned = skipping.skipping_scan(
        spark, clustered, "event_id", some_id, some_id
    )
    assert len(pruned.inputFiles()) == 1
    assert pruned.count() >= 1


def test_open_ended_and_empty_ranges(spark, clustered):
    ids = spark.read.parquet(clustered).agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    ).first()
    # half-open: everything above the midpoint
    mid = (ids["lo"] + ids["hi"]) // 2
    upper = skipping.skipping_scan(spark, clustered, "event_id", lo=mid)
    full = spark.read.parquet(clustered).where(F.col("event_id") >= mid)
    assert upper.count() == full.count()
    assert len(upper.inputFiles()) < 8
    # impossible range: zero files, empty frame, schema intact
    nothing = skipping.skipping_scan(
        spark, clustered, "event_id", ids["hi"] + 1000, ids["hi"] + 2000
    )
    assert nothing.count() == 0
    assert nothing.columns == ["event_id", "user_id", "value"]


def test_unclustered_layout_degrades_gracefully(spark, tmp_path):
    """On an unsorted layout pruning keeps everything (envelopes all
    overlap) — skipping may be useless, never wrong."""
    path = str(tmp_path / "unclustered")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    ev.repartition(4).write.parquet(path)  # hash layout: overlapping ranges
    ids = ev.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).first()
    mid = (ids["lo"] + ids["hi"]) // 2
    pruned = skipping.skipping_scan(spark, path, "event_id", ids["lo"], mid)
    full = ev.where((F.col("event_id") >= ids["lo"]) & (F.col("event_id") <= mid))
    assert pruned.count() == full.count()


def test_prune_files_keeps_stat_less_files():
    zmap = [("a", 0, 10, 5), ("b", None, None, 7), ("c", 20, 30, 5)]
    assert skipping.prune_files(zmap, 12, 18) == ["b"]
    assert skipping.prune_files(zmap, None, 5) == ["a", "b"]
    assert skipping.prune_files(zmap, 25, None) == ["b", "c"]
