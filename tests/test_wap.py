"""Write-audit-publish protocol: atomic versioned publication.

Pins the contract overwrite-in-place cannot give: a failed audit (or a
failed job) never moves the live pointer, readers always resolve a
complete snapshot, and retention keeps a bounded time-travel tail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_portofolio_spark.sinks.writer import (
    AuditError,
    publish_snapshot,
    read_snapshot,
    snapshot_versions,
)


def _frame(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, v int")


def test_publish_and_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v = publish_snapshot(spark, _frame(spark, [1, 2, 3]), root)
    assert v == 1
    got = read_snapshot(spark, root)
    assert sorted(r["v"] for r in got.collect()) == [1, 2, 3]


def test_new_version_replaces_atomically_and_old_is_time_travelable(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(spark, _frame(spark, [1, 2]), root)
    publish_snapshot(spark, _frame(spark, [10, 20, 30]), root)
    assert sorted(r["v"] for r in read_snapshot(spark, root).collect()) == [10, 20, 30]
    # the retired-but-kept version stays readable (time travel)
    assert sorted(r["v"] for r in read_snapshot(spark, root, version=1).collect()) == [1, 2]


def test_failed_audit_leaves_live_pointer_and_removes_staging(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(spark, _frame(spark, [1, 2]), root)
    with pytest.raises(AuditError, match="v_positive"):
        publish_snapshot(
            spark,
            _frame(spark, [5, -1]),
            root,
            audits={"positive": F.col("v") > 0},
        )
    # live table untouched, failed staging directory gone
    assert sorted(r["v"] for r in read_snapshot(spark, root).collect()) == [1, 2]
    assert snapshot_versions(spark, root) == [1]


def test_empty_snapshot_refused_by_default(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(spark, _frame(spark, [7]), root)
    empty = _frame(spark, [1]).where(F.lit(False))
    with pytest.raises(AuditError, match="rows=0"):
        publish_snapshot(spark, empty, root)
    assert [r["v"] for r in read_snapshot(spark, root).collect()] == [7]
    # explicit opt-in publishes it
    assert publish_snapshot(spark, empty, root, min_rows=0) == 2
    assert read_snapshot(spark, root).count() == 0


def test_retention_keeps_newest_k_versions(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(5):
        publish_snapshot(spark, _frame(spark, [i]), root, keep_versions=2)
    assert snapshot_versions(spark, root) == [4, 5]
    assert [r["v"] for r in read_snapshot(spark, root).collect()] == [4]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)


def test_audit_runs_against_staged_files_not_input_frame(spark, tmp_path):
    # The audit pass must read back what was WRITTEN: n_rows in the
    # error comes from the staged parquet, proving the read-back path.
    root = str(tmp_path / "tbl")
    df = _frame(spark, [1, 2, 3]).where(F.col("v") > 2)  # writes 1 row
    with pytest.raises(AuditError, match="rows=1"):
        publish_snapshot(spark, df, root, min_rows=2)
    assert snapshot_versions(spark, root) == []


def test_curate_corpus_published_mode_matches_direct_write(spark, tmp_path):
    """The job's --publish path: snapshots carry the same rows as the
    overwrite path, a rerun publishes a NEW version with the old one
    readable as rollback, and the pointer always resolves complete."""
    from etl_portofolio_spark.jobs import curate_corpus
    from tests.conftest import SF_DIR

    direct = str(tmp_path / "direct")
    wap = str(tmp_path / "wap")
    c1 = curate_corpus.run(spark, SF_DIR, direct)
    c2 = curate_corpus.run(spark, SF_DIR, wap, publish=True)
    assert c1 == c2

    snap = read_snapshot(spark, f"{wap}/docs_snapshots")
    plain = spark.read.parquet(f"{direct}/docs")
    assert snap.count() == plain.count()
    assert sorted(snap.columns) == sorted(plain.columns)
    assert snapshot_versions(spark, f"{wap}/docs_snapshots") == [1]
    # inner partition layout preserved inside the version dir
    assert (tmp_path / "wap" / "docs_snapshots" / "v=1" / "split=train").exists()

    curate_corpus.run(spark, SF_DIR, wap, publish=True)
    assert snapshot_versions(spark, f"{wap}/docs_snapshots") == [1, 2]
    assert read_snapshot(spark, f"{wap}/docs_snapshots").count() == c1["docs"]
    assert (
        read_snapshot(spark, f"{wap}/docs_snapshots", version=1).count()
        == c1["docs"]
    )


def test_vacuum_removes_only_crashed_staging(spark, tmp_path):
    from etl_portofolio_spark.sinks.writer import vacuum_snapshots

    root = str(tmp_path / "tbl")
    # nothing published yet: vacuum must not touch an in-flight staging
    _frame(spark, [9]).write.parquet(f"{root}/v=1")
    assert vacuum_snapshots(spark, root) == []
    assert snapshot_versions(spark, root) == [1]

    publish_snapshot(spark, _frame(spark, [1]), root)  # becomes v=2
    # simulate a publish that wrote v=3 then died before the flip
    _frame(spark, [3]).write.parquet(f"{root}/v=3")
    assert snapshot_versions(spark, root) == [1, 2, 3]
    assert vacuum_snapshots(spark, root) == [3]
    # live + retired versions untouched, next publish reuses the slot
    assert snapshot_versions(spark, root) == [1, 2]
    assert [r["v"] for r in read_snapshot(spark, root).collect()] == [1]
    assert publish_snapshot(spark, _frame(spark, [4]), root) == 3


def test_maintenance_vacuums_snapshot_roots(spark, tmp_path):
    from etl_portofolio_spark.jobs.maintain_tables import run_maintenance

    root = str(tmp_path / "snaps")
    publish_snapshot(spark, _frame(spark, [1]), root)
    _frame(spark, [2]).write.parquet(f"{root}/v=2")  # crashed publish
    # maintenance target table (empty dir is fine for the sweep steps)
    tbl = tmp_path / "tbl"
    tbl.mkdir()
    summary = run_maintenance(spark, str(tbl), snapshot_roots=(root,))
    assert summary["vacuumed"] == {root: [2]}
    assert snapshot_versions(spark, root) == [1]
