"""Measured scaling curve: time representative registry queries across
fixture scales and report the per-decade growth factor.

A query whose plan is scale-sound grows ~linearly in fact rows (growth
factor ~10 per decade, often less while fixed costs dominate); a
quadratic or collect-bound plan shows >>10. This turns SCALE.md's
design claims into measured numbers.

Usage: python tools/scale_curve.py DIR [DIR ...] [--queries=a,b,c]
Prints one JSON line per query: {"query", "dirs", "secs", "ratios"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "flagship_throughput_pivot",
    "agg_pricing_summary",
    "join_region_revenue",
    "window_top_orders",
    "sessionize_events",
    "anova_oneway_quantity",
    "ann_brute_force_topk",
    "gram_matrix_block",
    "good_turing_smoothing",
    "rolling_7d_distinct_users",
)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for d in args:
        if not os.path.isdir(d):
            raise SystemExit(
                f"not a fixture dir: {d!r} (flags use --queries=a,b,c)"
            )
    names = list(DEFAULT_QUERIES)
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")
    from etl_portofolio_spark.caching import release_cached
    from etl_portofolio_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("scale-curve", master="local[32]")
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        secs = []
        for d in args:
            fn(spark, d).collect()  # warm (JIT + page cache)
            release_cached()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).collect()
                best = min(best, time.time() - t0)
                release_cached()
            secs.append(round(best, 3))
        ratios = [
            round(secs[i + 1] / secs[i], 2) if secs[i] > 0 else None
            for i in range(len(secs) - 1)
        ]
        print(
            json.dumps(
                {"query": name, "dirs": args, "secs": secs, "ratios": ratios}
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
