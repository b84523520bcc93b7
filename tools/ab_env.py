"""Drift-controlled A/B: alternate an env-var switch inside ONE Spark
session so ambient host load hits both variants equally.

Usage: python tools/ab_env.py <query> <ENV_VAR> <rounds>
Variant A = env var set to "1", variant B = "0"; alternated per round.
"""
import os
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import __spark_entry__ as contract  # noqa: E402
from etl_portofolio_spark.caching import release_cached  # noqa: E402
from etl_portofolio_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
name, var, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])

spark = build_session("ab-env")
spark.sparkContext.setLogLevel("ERROR")
fn = contract.queries()[name]


def run_once(val: str) -> float:
    os.environ[var] = val
    release_cached()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"ab[{name}] {var}={val}")
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# warmup both variants
run_once("1")
run_once("0")
a, b = [], []
for i in range(rounds):
    a.append(run_once("1"))
    b.append(run_once("0"))
for tag, xs in (("on(1)", a), ("off(0)", b)):
    s = sorted(xs)
    print(
        f"{name} {var}={tag}: min={s[0]:.3f} med={s[len(s) // 2]:.3f} "
        f"all={[round(x, 3) for x in xs]}"
    )
os.environ.pop(var, None)
spark.stop()
