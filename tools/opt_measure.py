"""Round-10 optimization harness: per-query timing + plan capture.

Times individual registry queries exactly the way bench.py does (noop
sink, warmup pass, cache cleared between measured passes, min/median
reported) and optionally dumps `.explain("formatted")` to
plans/r10/<name>_<tag>.txt so before/after plan claims are auditable.

Usage:
    python tools/opt_measure.py [--passes N] [--explain TAG] query [query ...]

Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (core count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from etl_portofolio_spark.caching import release_cached  # noqa: E402
from etl_portofolio_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_TAG", "r11"),
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--explain",
        default=None,
        help="dump explain('formatted') to plans/r10/<query>_<TAG>.txt",
    )
    args = ap.parse_args()

    spark = build_session("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = contract.queries()
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = queries.get(name)
        if fn is None:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt[{name}] warmup")
        _force(fn(spark, SF_DIR))
        if args.explain:
            os.makedirs(PLAN_DIR, exist_ok=True)
        samples = []
        for i in range(args.passes):
            release_cached()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt[{name}] pass {i}")
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = samples
        release_cached()
        spark.catalog.clearCache()
        if args.explain:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(PLAN_DIR, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"   plan -> {path}", file=sys.stderr)
            release_cached()
            spark.catalog.clearCache()
        s = sorted(samples)
        print(
            f"{name}: min={s[0]:.3f} med={s[len(s) // 2]:.3f} "
            f"max={s[-1]:.3f} all={samples}"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
