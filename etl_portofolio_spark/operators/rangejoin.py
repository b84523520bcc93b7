"""Bucketized range (interval) join: point BETWEEN lo AND hi as an
equi-join.

Spark plans a raw ``p.join(iv, point BETWEEN lo AND hi)`` as a
BroadcastNestedLoopJoin (or a cartesian product when neither side is
broadcastable) — O(|points|·|intervals|) comparisons, the classic
100 TB scale-killer for range predicates. The standard fix, used by
every interval-join engine (GenomicsDB/Databricks range-join hints):
overlay a fixed-width bucket grid, explode each interval into the
buckets it covers, and equi-join on the bucket id. Each (point,
interval) match is discovered in exactly ONE bucket (the point's), so
no dedup pass is needed; a residual BETWEEN filter removes same-bucket
non-overlaps.

Cost: the interval side inflates by ``ceil(len/width) + 1`` rows —
pick ``bucket_width`` near the typical interval length so the blow-up
is ~2x. The join itself becomes a hash join (broadcast when the
exploded interval side is small, shuffle otherwise) and AQE handles
bucket skew like any other equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__range_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join rows of ``points`` to rows of ``intervals`` where
    ``lo_col <= point_col <= hi_col`` — via a bucket-grid equi-join.

    The interval side is exploded to one row per covered bucket, so
    callers should bound interval length relative to ``bucket_width``.
    Inner join only: an outer variant would need a row-identity key to
    re-attach unmatched points, which belongs to the caller.
    """
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    p = points.withColumn(
        BUCKET_COL, F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    in_range = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    return p.join(iv, [BUCKET_COL]).where(in_range).drop(BUCKET_COL)
