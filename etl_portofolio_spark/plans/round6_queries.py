"""Round-6 query wave.

Each entry: name -> (builder(spark, sf_dir) -> DataFrame, DuckDB oracle SQL).
Same determinism contract as every other wave: md5-based hashing only,
DECIMAL accumulators for money, round-to-6 before any ranking on
transcendentals, column aliases identical between Spark plan and oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ROUND6_QUERIES: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {}
