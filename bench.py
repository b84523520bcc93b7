"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line (the LAST line of stdout — the driver keeps only a
~2,000-char tail, so the line is budgeted to always fit whole):
    {"metric": "headline_total", "value": N, "unit": "sec",
     "n_queries": N, "sf": 0.1, "passes": N,
     "queries": {name: sec, ...},   # the most expensive entries, greedily
                                    # filled to a fixed character budget —
                                    # NOT the full map (see
                                    # render_contract_line)
     "top10": [name, ...]}
The full per-query min/median/max spread for every entry is printed on
the preceding ``headline_detail`` line for human triage.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect overhead, no output IO skew).

Measurement protocol: every query is executed once unmeasured (JVM
codegen/JIT warmup — a fixed per-plan cost that amortizes to nothing
against production-scale data), then the session data cache is cleared
and the measured run executes with warm JIT but cold data. This reports
steady-state compute, not first-call plan-compilation overhead, while
operator-internal persist() still pays its own materialization cost
inside the measured run.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as contract  # noqa: E402
from etl_portofolio_spark.caching import release_cached  # noqa: E402
from etl_portofolio_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: one per operator family (scan+agg, shuffle join,
#: multi-join, pivot, window, as-of, distinct, dedup x2, ANN, text,
#: the reference's flagship transform, and the stateful path).
HEADLINE = (
    "agg_pricing_summary",
    "join_shipping_priority",
    "join_region_revenue",
    "direction_pivot_groupby",
    "window_top_orders",
    "asof_last_click_before_signup",
    "agg_distinct_users",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "ann_brute_force_topk",
    "text_quality",
    "flagship_throughput_pivot",
    "sessionize_events",
    "range_join_quantity_bands",
    "decontaminate_ngram",
    "dedup_paragraph_chunks",
    "trailing_7d_revenue",
    "multimodal_pixel_stats",
    "cdc_snapshot_diff",
    "dataset_split_manifest",
    "market_share_by_year",
    "text_token_entropy",
    "unigram_logprob_score",
    "dedup_containment_pairs",
    "kl_divergence_score",
    "embedding_int8_quantize",
    "equi_depth_exact_scalable",
    "sole_late_supplier",
    "token_pmi_pairs",
    "bigram_surprise_score",
    "ann_pq_adc_topk",
    "interval_overlap_campaigns",
    "forecast_revenue_delta",
    "promo_revenue_share",
    "bm25_topk",
    "embedding_norm_audit",
    "daily_revenue_anomaly",
    "cohort_retention",
    "histogram_drift_psi",
    "event_transition_matrix",
    "supplier_concentration_hhi",
    "seasonal_decomposition",
    "unicode_normalization_audit",
    "revenue_gini",
    "theilsen_revenue_trend",
    # round-6 additions: skyline, cross-doc boilerplate, proration,
    # EWMA, weighted median, and the two pruned-read paths
    "pareto_frontier_customers",
    "boilerplate_gram_report",
    "prorated_revenue_by_shipmode",
    "ewma_daily_revenue",
    "weighted_median_price",
    "zonemap_pruned_scan",
    "bloom_pruned_lookup",
    # round-7 additions: DSIR scoring, survival curve, blocked edit-
    # distance verify, the 2-D Morton pruned read, and the sequential
    # Holt fold (Arrow kernel over the calendar frame)
    "dsir_importance_weights",
    "km_time_to_return",
    "edit_distance_verify",
    "zorder_pruned_scan_2d",
    "holt_trend_forecast",
    # real execution-engine paths: an actual structured-streaming drain
    # (availableNow, memory sink) and the co-located bucketed join
    "streaming_tumbling_oracle",
    "bucketed_join_colocated",
    # round-7b additions: portable HLL registers, retrieval evals
    # (MRR, MMR), the sink/runner write-path readbacks, and the two
    # reference ingestion faces (XML-API DataSource, JDBC stripes)
    "hll_register_sketch",
    "mrr_label_retrieval",
    "mmr_diversified_topk",
    "sink_partition_roundtrip",
    "xml_api_window_ingest",
    "jdbc_stripe_ingest",
    "source_shingle_overlap",
    "event_path_mining",
    "winsorized_mean_price",
    "loo_target_encoding",
    "incremental_runner_ingest",
    "ivf_cell_balance",
    "tombstone_delete_audit",
    "lag_feature_frame",
    "session_gap_histogram",
    "token_length_percentiles_by_source",
    "event_burstiness",
    "hierarchy_rollup_prefix",
    "conformal_interval_calibration",
    "roc_auc_exact",
    "calibration_bins_report",
    "multiple_testing_bh",
    "pinball_loss_quantile_eval",
    "item_cf_cosine_topk",
    "graph_modularity_partition",
    "metadata_file_audit",
    "snapshot_expiry_audit",
    "groupwise_cv_folds",
    "feature_hashing_projection",
    "gains_capture_curve",
    # embedding_mutual_knn is registry-gated but not benched: like
    # embedding_near_dup it is interpreted-HOF-bound at this tiny
    # corpus (5k vectors), which measures lambda overhead, not the
    # plan (its candidate generation is the same banded equi-join)
    "partition_evolution_union",
    "weighted_shortest_path",
    "rake_keyword_extraction",
    "stratified_ate_estimate",
    "lateral_topk_per_nation",
    "ranking_overlap_curve",
    "nelson_aalen_hazard",
    "order_fill_rate_sla",
    "malformed_json_quarantine",
    "dau_mau_stickiness",
    "session_funnel_ordered",
    "cohort_ltv_curve",
    "t_closeness_report",
    "shapley_channel_attribution",
    "ucb_arm_ranking",
    "rendezvous_shard_rebalance",
    # round-9 additions: sequence packing, systematic sampling, the
    # partial-state merge contract, skew/backfill audits, merkle
    # reconciliation, and the double-histogram MAD census.
    # semdedup_lsh_prune is registry-gated but NOT benched, same
    # rationale as embedding_near_dup: the fixture's dup band sits at
    # cos 0.35-0.7, and hyperplane LSH at that low a threshold admits
    # ~80% of all pairs as candidates BY DESIGN (2-bit keys are the
    # recall requirement, not a bug) — benching it measures fixture
    # candidate volume (15 s at sf0.1), not plan quality; real corpora
    # semantically dedup at cos >= 0.9 where the same code is cheap.
    "token_packing_chunks",
    "systematic_weighted_sample",
    "partial_agg_state_merge",
    "table_profile_report",
    "shuffle_key_skew_audit",
    "late_arrival_backfill_audit",
    "merkle_replica_diff",
    "mad_outlier_flags",
    # round-9b additions: link analysis, CBO audit, Apriori triples,
    # Cramer OLS, graded ranking eval, Brier decomposition, KN
    # continuation counts, shard mixing, format roundtrips, balanced
    # sampling, lead-lag correlogram, HLL set algebra.
    "hits_two_step_scores",
    "join_cardinality_estimate",
    "frequent_triple_itemsets",
    "ols_cramer_two_feature",
    "ndcg_at_k_eval",
    "brier_decomposition",
    "kneser_ney_continuation",
    "shard_mixing_entropy",
    "orc_sink_roundtrip",
    "jsonl_sink_roundtrip",
    "class_balance_downsample",
    "lead_lag_xcorr",
    "hll_intersection_estimate",
    # round-9c additions: ops analytics + training mechanics.
    "error_budget_burn",
    "session_entry_exit_report",
    "order_aging_buckets",
    "woe_information_value",
    "mann_kendall_trend",
    "decision_stump_split",
    "edge_triangle_support",
    "churn_label_frame",
    "embedding_centroid_drift",
    "transition_by_step",
    "kmv_distinct_sketch",
    "countmin_point_estimates",
    "dedup_sorted_neighborhood",
    "phrase_match_positions",
    "ohlc_downsample",
    "checkpoint_resume_equivalence",
    "encoding_size_estimate",
    "walk_forward_cv_folds",
    "grace_hash_join_plan",
    "anova_oneway_quantity",
    "brown_forsythe_quantity",
    "logrank_return_priority",
    "yule_walker_ar2",
    "gram_matrix_block",
    "mutual_information_discount_return",
    "good_turing_smoothing",
    "cohens_kappa_heuristics",
    "jpeg_pixel_stats",
    "mcnemar_paired_flags",
    "cochran_q_heuristics",
    "rouge_ngram_overlap",
    "bleu_ngram_precision",
    "winnowing_fingerprints",
    "jensen_shannon_source_drift",
    "runs_test_revenue",
    "ks_wasserstein_quantity",
    "theil_index_nations",
    "gumbel_block_maxima",
    "simpson_diversity_sources",
    "hill_tail_index",
)


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


#: Character budget for the contract line. The driver keeps a ~2,000-char
#: stdout tail; staying under this leaves slack for a stray trailing
#: newline or log frame. Enforced by construction (the per-query map is
#: filled greedily up to the budget) and unit-tested at 400 queries.
_CONTRACT_LINE_BUDGET = 1780


def render_contract_line(timings: dict[str, float], sf: float, passes: int) -> str:
    """Render the FINAL stdout line the driver parses into BENCH_r{N}.json.

    The driver keeps only a ~2,000-char tail of stdout, so this line must
    always fit whole regardless of how many queries the headline set
    grows to. Round 7 learned this the hard way (the full per-query map
    pushed the line out of the tail and BENCH_r07 recorded parsed:null);
    rounds 7-10 swung to names-only ``top10``, which left the driver's
    round-over-round PERF comparison with an empty per-query map
    (PERF_r10: ``per_query: {}``, ``geomean: null``). This round's shape
    is the middle ground (r10 verdict item #2): scalars + ``top10`` names
    as before, PLUS a ``queries`` map of the MOST EXPENSIVE entries
    filled greedily by descending cost until the rendered line reaches
    ``_CONTRACT_LINE_BUDGET`` chars — bounded by construction at any
    registry size (~40 entries at current name lengths, covering the
    entire cost tier that dominates the total; the 0.2-0.5 s tail lives
    only in the preceding headline_detail line). Unit-tested to stay
    under 1,800 chars at 400 queries (tests/test_bench_contract.py).
    """
    def _short(name: str) -> str:
        # per-name truncation keeps the line bounded, but a plain
        # prefix cut makes two queries sharing a 40-char prefix
        # indistinguishable in the driver artifact — keep a short
        # content hash suffix so truncated names stay unique
        if len(name) <= 40:
            return name
        digest = hashlib.md5(name.encode()).hexdigest()[:5]
        return name[:34] + "~" + digest

    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    top10 = [_short(name) for name, _ in by_cost[:10]]

    def _render(qmap: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "passes": passes,
                "queries": qmap,
                "top10": top10,
            },
            separators=(",", ":"),
        )

    # Greedy fill by descending cost: add entries while the rendered
    # line stays inside the budget. Deterministic (cost-then-name order)
    # and safe at any registry size — the map can only ever shrink as
    # names grow, never push the line out of the driver's tail.
    qmap: dict[str, float] = {}
    line = _render(qmap)
    for name, sec in by_cost:
        trial = dict(qmap)
        trial[_short(name)] = sec
        trial_line = _render(trial)
        if len(trial_line) > _CONTRACT_LINE_BUDGET:
            break
        qmap, line = trial, trial_line
    return line


def _force(df) -> None:
    """Execute the full plan without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _cdc_apply_once(spark, workdir: str) -> float:
    """One timed CDC merge: rebuild keyed state (unmeasured), then apply
    an update/delete/insert batch touching ~16% of keys (measured).

    The write path has no queries() twin (it mutates state), so it gets
    its own bench entry here for round-over-round tracking."""
    import shutil

    from pyspark.sql import functions as F

    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators.cdc import apply_changes

    tgt = os.path.join(workdir, "cdc_state")
    shutil.rmtree(tgt, ignore_errors=True)
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    base = cust.withColumn("op", F.lit("insert")).withColumn("seq", F.lit(1))
    apply_changes(spark, base, tgt, ("c_custkey",), n_buckets=32)
    batch = (
        cust.where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1)
        .withColumn("op", F.lit("update"))
        .unionByName(
            cust.where(F.col("c_custkey") % 17 == 0).withColumn("op", F.lit("delete"))
        )
        .withColumn("seq", F.lit(2))
    )
    t0 = time.perf_counter()
    apply_changes(spark, batch, tgt, ("c_custkey",), n_buckets=32)
    return time.perf_counter() - t0


def _lsh_skew_df(spark):
    """Deliberately skewed dedup input: the sf documents plus 500
    byte-identical copies of one document under fresh ids.  Every copy
    lands in the SAME (band_id, band_hash) bucket in every band — the
    one-hot-bucket shape `lsh_bucket_skew_audit` cost-models.  This
    entry MEASURES the candidate join under that hot bucket
    (VERDICT r5 #8): ~125k candidate pairs from one bucket, verified
    exactly, wall-clock tracked round-over-round."""
    from pyspark.sql import functions as F

    from etl_portofolio_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    hot = docs.orderBy("doc_id").limit(1).select(F.col("text").alias("t"))
    copies = (
        spark.range(500)
        .crossJoin(F.broadcast(hot))
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"), F.col("t").alias("text")
        )
    )
    return docs.unionByName(copies)


def _lsh_skew_once(spark) -> float:
    from etl_portofolio_spark.operators.dedup import minhash_candidate_pairs

    t0 = time.perf_counter()
    _force(
        minhash_candidate_pairs(_lsh_skew_df(spark), "doc_id", "text", 0.7)
    )
    return time.perf_counter() - t0


def _pq_serve_df(spark):
    """The PQ serving facade (`similarity.pq_search`: BLAS encode +
    expression ADC/rerank) — the entry point callers use, benched
    beside its oracle-exact expression twin `ann_pq_adc_topk` so both
    paths get round-over-round tracking."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.operators.similarity import pq_search

    return pq_search(load_table(spark, SF_DIR, "embeddings"))


def main() -> None:
    load_before = os.getloadavg()
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = contract.queries()

    # Pass 1 (unmeasured): compile/JIT every headline plan.
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is not None:
            _force(fn(spark, SF_DIR))

    # Passes 2..N+1 (measured): warm JIT, cold data cache. Per-query
    # MEDIAN over N passes — single-pass numbers on this machine swing
    # with background load; the median is what round-over-round
    # comparisons should read.
    #
    # QUERY-major, not pass-major (r6 protocol fix): interleaving 50+
    # other plans between a query's passes evicts/deoptimizes its JITed
    # code, so every pass re-paid compilation — measured 2x on
    # theilsen (3.0 s after ten other heavy plans vs 1.4 s back-to-
    # back, cache cleared both times). Back-to-back passes measure the
    # steady-state compute the docstring promises; at cluster scale
    # task time dwarfs JIT and the distinction vanishes.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        for _ in range(n_passes):
            release_cached()  # drop scoped persists from the previous run
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            samples.setdefault(name, []).append(time.perf_counter() - t0)
    _lsh_skew_once(spark)  # warmup
    for _ in range(n_passes):
        release_cached()
        spark.catalog.clearCache()
        samples.setdefault("dedup_minhash_skewed", []).append(
            _lsh_skew_once(spark)
        )

    _force(_pq_serve_df(spark))  # warmup
    for _ in range(n_passes):
        release_cached()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _force(_pq_serve_df(spark))
        samples.setdefault("ann_pq_serve", []).append(time.perf_counter() - t0)

    import tempfile

    with tempfile.TemporaryDirectory() as workdir:
        _cdc_apply_once(spark, workdir)  # warmup
        for _ in range(n_passes):
            spark.catalog.clearCache()
            samples.setdefault("cdc_apply_changes", []).append(
                _cdc_apply_once(spark, workdir)
            )

    timings = {
        name: round(sorted(ts)[len(ts) // 2], 3) for name, ts in samples.items()
    }
    spread = {
        name: [round(min(ts), 3), round(sorted(ts)[len(ts) // 2], 3), round(max(ts), 3)]
        for name, ts in samples.items()
    }

    # Two lines, detail FIRST and the contract line LAST: the driver
    # captures only the tail of stdout (BENCH_r05 lost the total because
    # the long line led). The final line is the compact headline JSON
    # the driver parses; the preceding detail line carries the per-query
    # min/median/max spread for human triage.
    print(
        json.dumps(
            {
                "metric": "headline_detail",
                # Machine-context evidence: timings on this box swing 2-3x
                # with background load (SCALE.md). A recorded value is only
                # comparable round-over-round when loadavg was low and the
                # per-query spread is tight; readers should prefer `min`
                # from `spread` when loadavg_before/after disagree.
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                "passes": n_passes,
                "spread": spread,
            }
        )
    )
    sys.stdout.flush()
    # the contract line stays LAST and compact: the driver keeps only
    # a ~2000-char tail of stdout, so this line must fit in it whole.
    # Round 7 regression: embedding the per-query map here grew the line
    # past the tail and BENCH_r07.json recorded parsed:null — the map
    # now lives ONLY in the preceding headline_detail line (its spread
    # medians), and render_contract_line() is unit-tested to stay under
    # 1,800 chars even at 400 registered queries.
    print(render_contract_line(timings, _sf_from_dir(SF_DIR), n_passes))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
