"""Scalar function library (SURVEY.md §2.7 F1–F13).

Thin, named Column-building helpers over ``pyspark.sql.functions`` —
everything stays JVM-side inside whole-stage codegen; no Python UDFs.
"""

from etl_portofolio_spark.functions.timeparts import (
    date_parts,
    ds_from_ts,
    epoch_to_ts_utc7,
    minute_bucket,
    shift_hours,
)
from etl_portofolio_spark.functions.extract import (
    composite_key,
    direction_from_key,
    paren_description,
    prefix_before,
)

__all__ = [
    "date_parts",
    "ds_from_ts",
    "epoch_to_ts_utc7",
    "minute_bucket",
    "shift_hours",
    "composite_key",
    "direction_from_key",
    "paren_description",
    "prefix_before",
]
