"""Daily join/pivot processing job — the reference's `Processing Data.py`.

Day-windowed incremental transform: join the fact to the dim chain,
minute-bucket, pivot the direction column, derive totals/date parts, and
write the day's partition idempotently. The per-day loop, source/target
watermark logic (`Processing Data.py:97-120`) and TRUNCATE-on-rollover
(`:140-149`) collapse into IncrementalRunner + dynamic overwrite.

The transform itself is the engine's flagship plan
(`plans/reference_queries.q_flagship_throughput_pivot`): one batch per
day, with the fact scan pruned to that day's data by the runner's window
predicate (partition pruning on a ds-partitioned production table).
"""

from __future__ import annotations

import argparse
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_portofolio_spark.session import build_session
from etl_portofolio_spark.streaming.incremental import DS_FORMAT, IncrementalRunner


def build_runner(
    spark: SparkSession, source_sf_dir: str, target_path: str
) -> IncrementalRunner:
    """Runner producing one flagship-transform batch per day window."""
    from etl_portofolio_spark.plans.reference_queries import (
        q_flagship_throughput_pivot,
    )

    def source(s: datetime, e: datetime) -> DataFrame:
        # The window predicate on the bucketed minute prunes the fact
        # scan (Catalyst pushes it through the pivot down to the events
        # read; on a ds-partitioned production table this is partition
        # pruning, the reference's `d.ds='...'` at Processing Data.py:182).
        out = q_flagship_throughput_pivot(spark, source_sf_dir)
        return out.where(
            (F.col("menit_ts") >= F.lit(s)) & (F.col("menit_ts") < F.lit(e))
        )

    return IncrementalRunner(spark, source, target_path)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source-dir", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--default-start", required=True, help="YYYYmmdd")
    p.add_argument("--end", default=None, help="YYYYmmdd (default: now)")
    args = p.parse_args()
    spark = build_session("process-daily")
    runner = build_runner(spark, args.source_dir, args.target)
    end = (
        datetime.strptime(args.end, DS_FORMAT) if args.end else datetime.now()
    )
    results = runner.run_from_watermark(
        end=end,
        delta=timedelta(days=1),
        default_start=datetime.strptime(args.default_start, DS_FORMAT),
    )
    print(f"windows: {len(results)}, rows: {sum(r.rows for r in results)}")


if __name__ == "__main__":
    main()
