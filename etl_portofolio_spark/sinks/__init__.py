"""Sink operators: partitioned parquet writers (SURVEY.md §2.2 K1-K5)."""

from etl_portofolio_spark.sinks.writer import (
    overwrite_table,
    refresh_path,
    write_partitioned,
)

__all__ = ["write_partitioned", "overwrite_table", "refresh_path"]
