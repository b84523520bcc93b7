"""Batch incremental runner — the reference's micro-batch loops, reusable.

The reference drives all three jobs with a driver ``while`` loop slicing
wall-clock time into fixed windows and using "max ``ds=`` partition of
the target table" as the watermark (`Ingestion Data (MySQL).py:23-31,
99-130`; `Processing Data.py:97-120`). This module packages that as:

- :func:`latest_partition` — S7/A2: watermark from the partition layout
  itself (no state store; the table IS the state).
- :func:`time_windows` — the ``[t, t+delta)`` window iterator.
- :class:`IncrementalRunner` — per-window batch: source(window) →
  transform → idempotent per-partition overwrite (K4 semantics), so any
  window can be re-run safely.

At scale each window's write touches only its own ``ds`` partitions
(dynamic overwrite), and re-running a failed window replaces rather
than duplicates — the reference's truncate+append, made atomic.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_portofolio_spark.sinks.writer import write_partitioned

DS_FORMAT = "%Y%m%d"  # the reference's yyyyMMdd string partition key


def latest_partition(path: str, partition_col: str = "ds") -> str | None:
    """Max partition value from the directory layout (the watermark).

    The reference runs ``SHOW PARTITIONS`` + sort + collect
    (`Ingestion Data (MySQL).py:23-31`); for path tables the partition
    values are directory names — an O(#partitions) driver-side listing,
    no Spark job at all.
    """
    if not os.path.isdir(path):
        return None
    prefix = f"{partition_col}="
    values = [
        d[len(prefix) :]
        for d in os.listdir(path)
        if d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
    ]
    return max(values) if values else None


def time_windows(
    start: datetime, end: datetime, delta: timedelta
) -> Iterator[tuple[datetime, datetime]]:
    """Tumbling ``[t, t+delta)`` windows covering [start, end)."""
    t = start
    while t < end:
        yield t, min(t + delta, end)
        t += delta


@dataclass
class WindowResult:
    window_start: datetime
    window_end: datetime
    rows: int
    skipped_empty: bool


class IncrementalRunner:
    """Window-at-a-time incremental pipeline with idempotent writes.

    ``source`` maps a (start, end) window to a DataFrame (a JDBC
    pushdown read, an HTTP fetch, or a filtered table scan);
    ``transform`` is the per-batch logic; the sink is a ``ds``-
    partitioned parquet path written with dynamic partition overwrite.

    Empty batches are skipped without writing — the reference's
    ``df.count() == 0`` gate (`Ingestion Data (MySQL).py:175-178`) done
    with ``isEmpty()`` (scans at most one partition instead of counting
    everything).
    """

    def __init__(
        self,
        spark: SparkSession,
        source: Callable[[datetime, datetime], DataFrame],
        target_path: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        partition_col: str = "ds",
    ) -> None:
        self.spark = spark
        self.source = source
        self.transform = transform or (lambda df: df)
        self.target_path = target_path
        self.partition_col = partition_col
        #: partitions already (re)written by THIS run — first touch of a
        #: partition overwrites it (the reference's day-rollover
        #: truncate), later windows of the same partition append.
        self._seen: set = set()

    def watermark(self) -> str | None:
        return latest_partition(self.target_path, self.partition_col)

    def _write(self, batch: DataFrame, mode: str) -> None:
        """Sink one partition-subset of a batch; overridden by the
        catalog-table runner."""
        write_partitioned(batch, self.target_path, self.partition_col, mode=mode)

    def run_window(self, start: datetime, end: datetime) -> WindowResult:
        """Run one window standalone: rewrites the partitions it touches."""
        self._seen = set()
        return self._window(start, end)

    def _window(self, start: datetime, end: datetime) -> WindowResult:
        """One window within the current run.

        Windows can be FINER than the partition key (hourly windows into
        daily ``ds``): a per-window blanket dynamic overwrite would then
        clobber the same day's earlier hours. Instead, rows landing in a
        partition this run has not touched yet are written with dynamic
        overwrite (truncating whatever an older run left there — K4
        semantics); rows for partitions this run already wrote are
        appended.
        """
        batch = self.transform(self.source(start, end))
        if batch.isEmpty():
            return WindowResult(start, end, 0, skipped_empty=True)
        # Cache: the batch is consumed three times (count + ds probe +
        # write). The reference instead re-read its JDBC source for
        # every count (`Ingestion Data (MySQL).py:172,175`).
        batch = batch.persist()
        rows = batch.count()
        pc = self.partition_col
        ds_vals = {r[0] for r in batch.select(pc).distinct().collect()}
        fresh = ds_vals - self._seen
        if fresh:
            self._write(batch.where(F.col(pc).isin(*fresh)), mode="overwrite")
        stale = ds_vals & self._seen
        if stale:
            self._write(batch.where(F.col(pc).isin(*stale)), mode="append")
        self._seen |= ds_vals
        batch.unpersist()
        return WindowResult(start, end, rows, skipped_empty=False)

    def run(
        self, start: datetime, end: datetime, delta: timedelta
    ) -> list[WindowResult]:
        """Run all windows in [start, end); re-running the whole range is
        idempotent (each partition's first window truncates it)."""
        self._seen = set()
        return [self._window(s, e) for s, e in time_windows(start, end, delta)]

    def run_from_watermark(
        self, end: datetime, delta: timedelta, default_start: datetime
    ) -> list[WindowResult]:
        """Resume after the watermark partition (re-running its day is safe:
        dynamic overwrite replaces, never duplicates).

        Coordinate convention: window datetimes are wall-clock in the
        SAME timezone the ``ds`` key is derived in (UTC+7 for the
        reference jobs), so ``strptime(ds)`` IS the partition's exact
        start boundary. Sources that need absolute epochs must convert
        with their configured offset (``JdbcWindowSource._epoch``) —
        host-local ``datetime.timestamp()`` would silently shift the
        resume off the partition edge on non-UTC+7 hosts.
        """
        wm = self.watermark()
        start = (
            datetime.strptime(wm, DS_FORMAT) if wm is not None else default_start
        )
        return self.run(start, end, delta)


class TableIncrementalRunner(IncrementalRunner):
    """IncrementalRunner sinking into a NAMED catalog table.

    The reference's actual surface: `saveAsTable` + `SHOW PARTITIONS`
    watermark + per-partition truncate (`Ingestion Data
    (MySQL).py:23-31, 58-65, 142-149`). Same idempotent window
    semantics as the path runner — only the sink and watermark probe
    differ (metastore metadata instead of directory listing).
    """

    def __init__(
        self,
        spark: SparkSession,
        source: Callable[[datetime, datetime], DataFrame],
        target_table: str,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        partition_col: str = "ds",
    ) -> None:
        super().__init__(
            spark, source, target_path="", transform=transform,
            partition_col=partition_col,
        )
        self.target_table = target_table

    def watermark(self) -> str | None:
        from etl_portofolio_spark.sinks.writer import latest_table_partition

        return latest_table_partition(
            self.spark, self.target_table, self.partition_col
        )

    def _write(self, batch: DataFrame, mode: str) -> None:
        from etl_portofolio_spark.sinks.writer import write_partitioned_table

        write_partitioned_table(
            batch, self.target_table, self.partition_col, mode=mode
        )
