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

    def _stages() -> list[dict]:
        app_id = spark.sparkContext.applicationId
        url = (
            f"http://localhost:4050/api/v1/applications/{app_id}"
            "/stages?status=COMPLETE"
        )
        return json.loads(urllib.request.urlopen(url).read())

    # Filter by stageId, not wall-clock (ADVICE r10: REST submissionTime
    # parsing vs local time.time() can include/drop warmup stages when
    # clocks or formats drift): everything with stageId above the max
    # warmup stageId belongs to the measured run.
    max_warmup_stage = max((s["stageId"] for s in _stages()), default=-1)
    release_cached()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    for _ in range(passes):
        run()
    wall = time.perf_counter() - t0
    stages = [
        s
        for s in _stages()
        if s["stageId"] > max_warmup_stage and s.get("firstTaskLaunchedTime")
    ]
    stages.sort(key=lambda s: s["stageId"])
    print(f"query={name} wall={wall:.3f}s passes={passes}")
    print(
        f"{'stage':>6} {'tasks':>5} {'execRun(s)':>10} {'cpu(s)':>8} "
        f"{'shRead(MB)':>10} {'shWrite(MB)':>11} {'input(MB)':>9}  name"
    )
    for s in stages:
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
