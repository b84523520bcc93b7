"""Physical-layout helpers shared by the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure per-row CPU-heavy work is spread across all cores.

    Small fixture tables arrive as a single parquet row-group (one input
    split), which would serialize expensive per-row expressions (shingle
    construction, 16-way minhash, per-token hashing) onto one core. At
    production scale a 100 TB scan already has thousands of splits, so
    this is a no-op there: we only repartition when the scan has fewer
    partitions than the session's parallelism.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
