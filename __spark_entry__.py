"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``etl_portofolio_spark.plans``; this module only
assembles the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_portofolio_spark.plans.reference_queries import REFERENCE_QUERIES

_ALL: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
_ALL.update(REFERENCE_QUERIES)

try:
    from etl_portofolio_spark.plans.analytics_queries import ANALYTICS_QUERIES

    _ALL.update(ANALYTICS_QUERIES)
except ImportError:
    pass

try:
    from etl_portofolio_spark.plans.pipeline_queries import PIPELINE_QUERIES

    _ALL.update(PIPELINE_QUERIES)
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_portofolio_spark.plans.reference_queries import (
        q_flagship_throughput_pivot,
    )

    return q_flagship_throughput_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: fn for name, (fn, _oracle) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    return {name: oracle for name, (_fn, oracle) in _ALL.items() if oracle is not None}
