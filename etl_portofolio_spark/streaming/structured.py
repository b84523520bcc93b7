"""Structured Streaming mode — the reference's loops as a real stream.

Maps the hand-rolled concepts (SURVEY.md §2.8) onto Spark primitives:

- micro-batch trigger (driver `while` + 5-min cursor) → file/rate
  ``readStream`` with ``Trigger.AvailableNow`` (catch-up batch mode) or
  ``Trigger.ProcessingTime``.
- per-iteration ``[t, t+delta)`` bounds → tumbling ``F.window(ts, dur)``.
- "data outside the fetched window never arrives" → ``withWatermark``
  with an explicit lateness bound (the reference silently drops late
  data; here it is a declared, tunable contract).
- truncate-partition-then-append sink → ``foreachBatch`` + dynamic
  partition overwrite (idempotent per micro-batch replay, which is
  exactly the exactly-once-ish contract the reference hand-built).

State (offsets, window partials) lives in the checkpoint dir — replacing
the reference's "max ds= partition" watermark probe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_portofolio_spark.sinks.writer import write_partitioned


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (each dropped file becomes a micro-batch)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    lateness: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window aggregation with a late-data watermark.

    The streaming twin of the reference's per-window batch aggregation;
    the same plan also runs in batch mode (tests compare the two).
    """
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            *keys,
            "n_events",
            "value_cents",
        )
    )


def start_dynamic_overwrite_sink(
    df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    partition_col: str = "ds",
    ds_from: str = "w_start",
    available_now: bool = True,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """foreachBatch sink: derive ``ds`` and dynamically overwrite partitions.

    Micro-batch replays (after failure/restart) rewrite the same
    partitions instead of appending duplicates — K4 semantics carried
    into streaming.
    """

    def _sink(batch: DataFrame, _batch_id: int) -> None:
        out = batch.withColumn(
            partition_col, F.date_format(F.col(ds_from), "yyyyMMdd")
        )
        if transform is not None:
            out = transform(out)
        if not out.isEmpty():
            write_partitioned(out, target_path, partition_col)

    writer = df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
