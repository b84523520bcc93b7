"""StreamingQueryListener observability: progress events collected,
totals consistent with what the sink received."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.streaming.monitor import attach_monitor

from .conftest import SF_DIR


def test_monitor_collects_progress_and_counts_rows(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)

    mon = attach_monitor(spark)
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName("mon_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async — give the bus a moment to drain
        deadline = time.time() + 30
        while time.time() < deadline:
            if (
                mon.summary()["total_input_rows"] == ev.count()
                and mon.terminated
            ):
                break
            time.sleep(0.5)
        s = mon.summary()
        assert s["n_batches"] >= 3  # one per input file at least
        assert s["total_input_rows"] == ev.count()
        assert s["max_state_rows"] >= 1  # the aggregation carries state
        assert mon.started and mon.terminated
    finally:
        spark.streams.removeListener(mon)
