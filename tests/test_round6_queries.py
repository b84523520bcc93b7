"""Round-6 registry queries: the read-path evidence closers.

`zonemap_pruned_scan` must physically read fewer files than the
clustered fixture holds (VERDICT r5 #4: the inputFiles() assertion),
and `wap_time_travel_delta` must actually time-travel (old version ≠
live pointer) while staying idempotent across repeated invocations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portofolio_spark.plans.round6_queries import (
    _fixture_dir,
    q_wap_time_travel_delta,
    q_zonemap_pruned_scan,
)
from tests.conftest import SF_DIR


def test_zonemap_pruned_scan_reads_strict_file_subset(spark):
    df = q_zonemap_pruned_scan(spark, SF_DIR)
    # the builder itself raises when pruning regresses; pin it here too
    assert 0 < len(df.inputFiles()) < 8
    # and the pruned result equals the unpruned filter over the fixture
    path = _fixture_dir(SF_DIR, "events_clustered")
    full = spark.read.parquet(path)
    hi = df.agg(F.max("event_id")).first()[0]
    expect = full.where(F.col("event_id") <= hi).count()
    assert df.count() == expect > 0


def test_wap_time_travel_delta_travels_and_is_idempotent(spark):
    from etl_portofolio_spark.sinks.writer import read_snapshot, snapshot_versions

    first = sorted(tuple(r) for r in q_wap_time_travel_delta(spark, SF_DIR).collect())
    root = _fixture_dir(SF_DIR, "wap_orders")
    versions = snapshot_versions(spark, root)
    assert len(versions) == 2  # publish happened exactly once
    old = read_snapshot(spark, root, version=versions[-2])
    cur = read_snapshot(spark, root)
    # time travel is real: the old version is a strict subset rollup
    assert old.count() < cur.count()
    # repeated invocation republishes nothing and returns identical rows
    second = sorted(tuple(r) for r in q_wap_time_travel_delta(spark, SF_DIR).collect())
    assert snapshot_versions(spark, root) == versions
    assert first == second
    # months present only in the new snapshot carry their full revenue
    grew = [r for r in first if r[1] == 0]
    assert grew and all(r[3] == r[2] for r in grew)
