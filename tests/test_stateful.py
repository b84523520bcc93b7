"""applyInPandasWithState sessionization vs its batch twin."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

from .conftest import SF_DIR


def test_sessionize_batch_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (1, "2024-01-01 11:30:00"),  # > 30 min gap: new session
            (2, "2024-01-01 09:00:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in sessionize_batch(df, 30).collect()
    }
    assert out == {
        (1, "2024-01-01 10:00:00", 2),
        (1, "2024-01-01 11:30:00", 1),
        (2, "2024-01-01 09:00:00", 1),
    }


def test_sessionize_stream_matches_batch_minus_open_sessions(spark, tmp_path):
    """Stream emits every session except each user's trailing open one."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    src_dir = str(tmp_path / "src")
    ev.write.parquet(src_dir)

    stream = spark.readStream.schema(spark.read.parquet(src_dir).schema).parquet(
        src_dir
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    target = str(tmp_path / "out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(target)
    batch = sessionize_batch(ev, gap_minutes=30)
    # drop each user's last session (still open in the state store)
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    expected = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .drop("__rn")
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_throttle_stream_matches_batch(spark, tmp_path):
    """Streaming gap-throttle == batch throttle row-for-row: state (last
    raw ts per key) crosses micro-batches, keeps emit immediately so no
    trailing flush is needed. Two time-split files -> two in-order
    micro-batches."""
    from etl_portofolio_spark.operators.throttle import (
        throttle_events,
        throttle_stream,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    cut = ev.agg(F.percentile_approx("ts", 0.5)).first()[0]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    # two files written in time order => two micro-batches, in order
    ev.where(F.col("ts") <= cut).coalesce(1).write.parquet(str(src_dir / "f0"))
    ev.where(F.col("ts") > cut).coalesce(1).write.parquet(str(src_dir / "f1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    kept = throttle_stream(stream, min_gap_seconds=300)
    target = str(tmp_path / "out")
    q = (
        kept.writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(target).select(
        "event_id", "user_id", "event_type", "gap_s"
    )
    expected = throttle_events(
        ev, keys=("user_id", "event_type"), ts_col="ts",
        tiebreak_col="event_id", min_gap_seconds=300,
    ).select("event_id", "user_id", "event_type", "gap_s")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_throttle_stream_flags_out_of_order_arrivals(spark, tmp_path):
    """A late arrival (event time behind the key's max) silently
    diverges from the batch twin — the state must make it observable:
    max_s tracked, ooo_count incremented, both readable back from the
    checkpoint via the state data source."""
    from etl_portofolio_spark.operators.throttle import throttle_stream

    rows_f0 = [(1, 7, "click", "2024-01-01 10:00:00"),
               (2, 7, "click", "2024-01-01 10:20:00")]
    rows_f1 = [(3, 7, "click", "2024-01-01 10:10:00"),  # LATE: behind 10:20
               (4, 7, "click", "2024-01-01 10:40:00")]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i, rows in enumerate((rows_f0, rows_f1)):
        spark.createDataFrame(
            [(a, b, c, __import__("datetime").datetime.fromisoformat(d))
             for a, b, c, d in rows],
            schema,
        ).coalesce(1).write.parquet(str(src_dir / f"f{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        throttle_stream(stream, min_gap_seconds=300)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    state = spark.read.format("statestore").load(ckpt)
    st = state.select(
        "value.groupState.prev_s",
        "value.groupState.max_s",
        "value.groupState.ooo_count",
    ).collect()
    assert len(st) == 1
    row = st[0]
    # max seen is 10:40 even though the last-raw path went through 10:10
    assert row["max_s"] == int(
        __import__("datetime").datetime.fromisoformat("2024-01-01 10:40:00")
        .timestamp()
    )
    assert row["ooo_count"] == 1, "the 10:10 late arrival must be counted"
