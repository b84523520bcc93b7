"""JDBC ingestion source with query pushdown + parallel range reads (S4).

The reference reads one hour of the Zabbix ``history`` table through a
derived-table subquery so the range filter (and an ORDER BY for index
use) run inside MySQL — but on a SINGLE connection
(`Ingestion Data (MySQL).py:156-169`). This module keeps the pushdown
subquery and adds what the reference lacked: ``partitionColumn`` /
``lowerBound`` / ``upperBound`` / ``numPartitions`` so executors fetch
disjoint ``clock`` stripes concurrently, plus ``fetchsize`` (the MySQL
driver otherwise streams row-at-a-time).

The read path executes in tests against embedded Derby (bundled with
Spark's jars): pushdown subquery, parallel stripes, and the full
hour-windowed ingest job all run against a live JDBC database — see
``tests/test_io_streaming.py`` (``test_jdbc_read_window_executes_*``).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from etl_portofolio_spark.functions.timeparts import DEFAULT_TZ_OFFSET_HOURS

MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"


def pushdown_subquery(
    table: str, clock_col: str, lo: int, hi: int, order_desc: bool = True
) -> str:
    """The reference's derived-table pushdown
    (`Ingestion Data (MySQL).py:156-160`): range filter executes in the
    database, using the (itemid, clock) index."""
    order = f" ORDER BY {clock_col} DESC" if order_desc else ""
    return (
        f"(SELECT * FROM {table} WHERE {clock_col} >= {lo} AND {clock_col} < {hi}"
        f"{order}) AS final"
    )


@dataclass
class JdbcWindowSource:
    """Config for one incremental JDBC read window."""

    url: str
    table: str
    user: str
    password: str
    clock_col: str = "clock"
    driver: str = MYSQL_DRIVER
    num_partitions: int = 8
    fetch_size: int = 10000
    #: IncrementalRunner windows (and the ds partition key derived from
    #: clock) are wall-clock in THIS fixed offset; epoch conversion must
    #: use it explicitly — never host-local ``datetime.timestamp()``.
    tz_offset_hours: int = DEFAULT_TZ_OFFSET_HOURS
    extra_options: dict[str, str] = field(default_factory=dict)

    def _epoch(self, dt: datetime) -> int:
        """ds-timezone wall-clock (naive) → epoch seconds, host-tz-proof.

        A naive datetime here is a UTC+offset LOCAL instant (the
        coordinate system of the ``ds`` key and the runner's watermark
        resume); tz-aware datetimes convert exactly. Using host-local
        ``timestamp()`` instead shifted the resume boundary off the ds
        partition edge on any host not running at UTC+offset — the first
        fresh window then dynamic-overwrote the watermark partition with
        a partial day (ADVICE r1).
        """
        if dt.tzinfo is not None:
            return int(dt.timestamp())
        return calendar.timegm(dt.timetuple()) - self.tz_offset_hours * 3600

    def options_for(self, start: datetime, end: datetime) -> dict[str, str]:
        """Full reader-option map for [start, end) epoch-seconds window."""
        lo, hi = self._epoch(start), self._epoch(end)
        return {
            "driver": self.driver,
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "dbtable": pushdown_subquery(self.table, self.clock_col, lo, hi),
            # parallel stripes over the same range predicate
            "partitionColumn": self.clock_col,
            "lowerBound": str(lo),
            "upperBound": str(hi),
            "numPartitions": str(self.num_partitions),
            "fetchsize": str(self.fetch_size),
            **self.extra_options,
        }

    def read_window(
        self, spark: SparkSession, start: datetime, end: datetime
    ) -> DataFrame:
        """`spark.read.format("jdbc")` with the window's options —
        plugs directly into IncrementalRunner as its ``source``."""
        reader = spark.read.format("jdbc")
        for k, v in self.options_for(start, end).items():
            reader = reader.option(k, v)
        return reader.load()
