"""Per-stage profile of one registry query: run it once (noop sink)
with the UI enabled and dump completed-stage metrics from the REST API
— executor run time, shuffle read/write bytes, task counts — so the
expensive stage of a multi-stage plan is identified by measurement,
not guesswork (guide §1.1/§7.1).

Usage: python tools/stage_profile.py <query> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from etl_portofolio_spark.caching import release_cached  # noqa: E402
from etl_portofolio_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = build_session(
        "stage-profile",
        **{"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = contract.queries()[name]

    def run():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    run()  # warmup
    release_cached()
    spark.catalog.clearCache()
    tracker = spark.sparkContext.statusTracker()
    first_new = max(tracker.getJobIdsForGroup() or [-1]) + 1
    t0 = time.perf_counter()
    for _ in range(passes):
        run()
    wall = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4050/api/v1/applications/{app_id}/stages?status=COMPLETE"
    stages = json.loads(urllib.request.urlopen(url).read())
    # keep only stages submitted after the warmup
    stages = [s for s in stages if s.get("firstTaskLaunchedTime")]
    stages.sort(key=lambda s: s["submissionTime"])
    cutoff = None
    # find wall-clock start of the measured run
    print(f"query={name} wall={wall:.3f}s passes={passes}")
    print(
        f"{'stage':>6} {'tasks':>5} {'execRun(s)':>10} {'cpu(s)':>8} "
        f"{'shRead(MB)':>10} {'shWrite(MB)':>11} {'input(MB)':>9}  name"
    )
    from datetime import datetime, timezone

    def ts(s):
        return datetime.strptime(
            s["submissionTime"], "%Y-%m-%dT%H:%M:%S.%f%Z"
        ).replace(tzinfo=timezone.utc)

    measured_start = time.time() - wall
    for s in stages:
        sub = ts(s).timestamp()
        if sub < measured_start - 1:
            continue
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{s['executorRunTime'] / 1e3:>10.2f} "
            f"{s['executorCpuTime'] / 1e9:>8.2f} "
            f"{s['shuffleReadBytes'] / 1e6:>10.1f} "
            f"{s['shuffleWriteBytes'] / 1e6:>11.1f} "
            f"{s['inputBytes'] / 1e6:>9.1f}  {s['name'][:60]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
