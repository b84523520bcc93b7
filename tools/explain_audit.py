"""Plan audit: formatted-explain summaries for the headline queries.

Prints, per query: parquet scans with their pushed filters and read
schemas, join strategies, and exchange (shuffle) counts — the things
that decide whether a plan survives a 100x scale-up. Run after any
operator change:

    python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "agg_pricing_summary",
    "join_region_revenue",
    "join_shipping_priority",
    "direction_pivot_groupby",
    "flagship_throughput_pivot",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "ann_lsh_topk",
    "sessionize_events",
    "range_join_quantity_bands",
    "decontaminate_ngram",
    "dedup_incremental_novel",
    "nation_volume_pairs",
    "disjunctive_pred_revenue",
    "dedup_paragraph_chunks",
    "date_spine_gapfill",
    "market_share_by_year",
    "dedup_containment_pairs",
    "unigram_logprob_score",
    "ann_lsh_recall",
    "doc_chunk_overlap",
    "equi_depth_histogram",
    "forecast_revenue_delta",
    "late_order_priorities",
    "sole_late_supplier",
    "idle_customer_balance",
    "token_pmi_pairs",
    "interval_overlap_campaigns",
    "ann_pq_adc_topk",
    "semantic_cluster_prune",
    "geo_proximity_pairs",
    "heavy_hitters_sketch",
    "bm25_topk",
    "daily_revenue_anomaly",
    "cohort_retention",
    "user_state_scd2",
    "pit_state_at_purchase",
    "hard_negative_mining",
    "supplier_concentration_hhi",
    "seasonal_decomposition",
)


def main() -> None:
    import __spark_entry__ as contract
    from etl_portofolio_spark.session import build_session

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or DEFAULT_QUERIES

    spark = build_session("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        scans = plan.count("Scan parquet")
        joins = [
            kind
            for kind in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
            if kind in plan
        ]
        # tree section only (before the "(1) ..." detail list) for counts
        tree = plan.split("\n(1)")[0]
        exchanges = tree.count("Exchange")
        print(f"== {name}: scans={scans} exchanges={exchanges} joins={joins}")
        for line in plan.splitlines():
            s = line.strip()
            if s.startswith("PushedFilters") or s.startswith("ReadSchema"):
                print(f"   {s[:160]}")
    spark.stop()


if __name__ == "__main__":
    main()
