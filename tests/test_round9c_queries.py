"""Round-9c wave: algorithmic cross-checks beyond the oracle hash —
the stump split re-scored brute-force in exact rationals, triangle
support against a networkx-free adjacency replay, Mann–Kendall S from
a direct pair loop, burn-rate alert logic, churn census totals, and
session-census conservation laws."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_error_budget_burn_alert_iff_both_windows(spark):
    from etl_portofolio_spark.plans.round9c_queries import q_error_budget_burn

    rows = q_error_budget_burn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["page_alert"] == (
            r["burn_1d_permille"] >= 1000 and r["burn_7d_permille"] >= 1000
        )
        assert r["err"] <= r["n"]


def test_session_census_conservation(spark):
    """Entries, exits and bounces each sum to session-level truths:
    Σentries = Σexits = total sessions; bounces ≤ entries per type."""
    from etl_portofolio_spark.plans.round9c_queries import (
        q_session_entry_exit_report,
        _sessions_with_steps,
    )

    rows = q_session_entry_exit_report(spark, SF_DIR).collect()
    n_sessions = (
        _sessions_with_steps(spark, SF_DIR)
        .select("user_id", "sid")
        .distinct()
        .count()
    )
    assert sum(r["n_entries"] for r in rows) == n_sessions
    assert sum(r["n_exits"] for r in rows) == n_sessions
    for r in rows:
        assert r["n_bounces"] <= min(r["n_entries"], r["n_exits"])


def test_aging_buckets_cover_all_open_orders(spark):
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9c_queries import q_order_aging_buckets

    rows = q_order_aging_buckets(spark, SF_DIR).collect()
    n_open = (
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_orderstatus") == "O")
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == n_open
    assert 990 <= sum(r["share_permille"] for r in rows) <= 1000


def test_woe_iv_signs_consistent(spark):
    """WOE > 0 exactly when the bin's good-share exceeds its bad-share,
    and every IV contribution is non-negative (it is a product of two
    same-signed factors)."""
    from etl_portofolio_spark.plans.round9c_queries import (
        q_woe_information_value,
    )

    rows = q_woe_information_value(spark, SF_DIR).collect()
    G = sum(r["g"] for r in rows)
    B = sum(r["b"] for r in rows)
    for r in rows:
        gs = Fraction(r["g"], G)
        bs = Fraction(r["b"], B)
        if gs > bs:
            assert r["woe"] > 0
        elif gs < bs:
            assert r["woe"] < 0
        assert r["iv_contrib"] >= -1e-9


def test_mann_kendall_s_from_direct_pair_loop(spark):
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9c_queries import q_mann_kendall_trend

    row = q_mann_kendall_trend(spark, SF_DIR).collect()[0]
    daily = sorted(
        (r["day"], r["v"])
        for r in load_table(spark, SF_DIR, "lineitem")
        .select(
            F.to_date("l_shipdate").alias("day"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("v"))
        .collect()
    )
    vs = [v for _, v in daily]
    s = sum(
        (0 if vs[j] == vs[i] else (1 if vs[j] > vs[i] else -1))
        for i in range(len(vs))
        for j in range(i + 1, len(vs))
    )
    assert row["s"] == s
    assert row["n"] == len(vs)
    n = len(vs)
    ties = defaultdict(int)
    for v in vs:
        ties[v] += 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    assert row["var18"] == n * (n - 1) * (2 * n + 5) - tie_term


def test_stump_split_is_argmin_by_exact_rationals(spark):
    """Re-rank every candidate split with Fraction-exact weighted Gini
    and confirm the plan picked the minimizer per feature."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9c_queries import q_decision_stump_split

    got = {
        r["feature"]: r for r in q_decision_stump_split(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_size")
    rows = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.round("l_quantity", 0).cast("long").alias("qty"),
            F.round(F.col("l_discount") * 1000, 0).cast("long").alias("disc"),
            F.col("p_size").cast("long").alias("size"),
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
        )
        .collect()
    )
    for feat in ("qty", "disc", "size"):
        hist = defaultdict(lambda: [0, 0])
        for r in rows:
            h = hist[r[feat]]
            h[0] += 1
            h[1] += r["y"]
        vals = sorted(hist)
        nt = sum(h[0] for h in hist.values())
        pt = sum(h[1] for h in hist.values())
        best = None
        tl = posl = 0
        for v in vals[:-1]:
            tl += hist[v][0]
            posl += hist[v][1]
            tr, posr = nt - tl, pt - posl
            al = posl * posl + (tl - posl) * (tl - posl)
            ar = posr * posr + (tr - posr) * (tr - posr)
            gini = (nt - (Fraction(al, tl) + Fraction(ar, tr))) / nt
            if best is None or gini < best[0]:
                best = (gini, v)
        assert got[feat]["split_at"] == best[1], feat
        assert abs(float(best[0]) - got[feat]["gini_weighted"]) < 2e-6


def test_triangle_support_matches_adjacency_replay(spark):
    from etl_portofolio_spark.plans.round9c_queries import (
        q_edge_triangle_support,
    )

    rows = q_edge_triangle_support(spark, SF_DIR).collect()
    adj = defaultdict(set)
    edge_set = set()
    for r in rows:
        a, b = r["brand_a"], r["brand_b"]
        adj[a].add(b)
        adj[b].add(a)
        edge_set.add((a, b))
    for r in rows:
        tri = len(adj[r["brand_a"]] & adj[r["brand_b"]])
        assert r["tri_count"] == tri
        assert r["in_truss4"] == (tri >= 2)
        assert r["in_truss5"] == (tri >= 3)


def test_churn_census_covers_every_pre_cutoff_customer(spark):
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9c_queries import (
        _CHURN_HORIZON_DAYS,
        q_churn_label_frame,
    )

    rows = q_churn_label_frame(spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    maxd = orders.agg(F.max("od")).collect()[0][0]
    import datetime

    cut = maxd - datetime.timedelta(days=_CHURN_HORIZON_DAYS)
    n_before = (
        orders.where(F.col("od") <= F.lit(cut)).select("o_custkey").distinct()
    ).count()
    assert sum(r["n_customers"] for r in rows) == n_before
    assert all(1 <= r["orders_bucket"] <= 5 for r in rows)


def test_centroid_drift_zero_on_identical_halves(spark):
    """Sanity: drift of a label against itself is 0; the emitted drift
    for real halves is non-negative and finite."""
    from etl_portofolio_spark.plans.round9c_queries import (
        q_embedding_centroid_drift,
    )

    rows = q_embedding_centroid_drift(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["drift_permicro"] >= 0
        assert r["ca"] + r["cb"] > 0


def test_transition_steps_shares_sum_to_permille(spark):
    from etl_portofolio_spark.plans.round9c_queries import (
        _STEP_MAX,
        q_transition_by_step,
    )

    rows = q_transition_by_step(spark, SF_DIR).collect()
    per_step = defaultdict(int)
    for r in rows:
        assert 1 <= r["step"] <= _STEP_MAX
        per_step[r["step"]] += r["share_permille"]
    for s, tot in per_step.items():
        assert 900 <= tot <= 1000, (s, tot)


def test_kmv_estimator_replay(spark):
    """Replay the k-th-minimum estimator from the raw hashes: h_k must
    be the 32nd smallest distinct md5-60 value and the estimate the
    exact integer division."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9c_queries import (
        _KMV_K,
        _KMV_SCALE,
        q_kmv_distinct_sketch,
    )
    import hashlib

    rows = {
        r["o_orderpriority"]: r
        for r in q_kmv_distinct_sketch(spark, SF_DIR).collect()
    }
    pairs = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_custkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    hs = defaultdict(list)
    for r in pairs:
        h = int(
            hashlib.md5(f"kmv:{r['o_custkey']}".encode()).hexdigest()[:15], 16
        )
        hs[r["o_orderpriority"]].append(h)
    for prio, lst in hs.items():
        lst.sort()
        row = rows[prio]
        assert row["n_exact"] == len(lst)
        assert row["h_k"] == lst[_KMV_K - 1]
        est = ((_KMV_K - 1) * _KMV_SCALE) // lst[_KMV_K - 1]
        assert row["kmv_est"] == est
        assert row["err_permille"] == (1000 * abs(est - len(lst))) // len(lst)
