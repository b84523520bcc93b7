"""Round-9b wave: algorithmic cross-checks beyond the oracle hash —
HITS path counts replayed edge-by-edge, the CBO estimate re-derived
from first principles, Apriori's losslessness against a brute-force
triple census, Cramer OLS against an exact-rational solve, the Brier
decomposition reassembled into the direct score, and structural
invariants for NDCG, balanced sampling, and HLL set algebra."""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction
from itertools import combinations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _edges(spark):
    from etl_portofolio_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "p_brand")
        .distinct()
        .collect()
    )


def test_hits_two_step_matches_python_replay(spark):
    """Replay both HITS propagation steps with plain dict arithmetic
    over the collected edge list and compare every brand's auth1/auth2
    exactly (the scores are integer path counts)."""
    from etl_portofolio_spark.plans.round9b_queries import q_hits_two_step_scores

    rows = {r["p_brand"]: r for r in q_hits_two_step_scores(spark, SF_DIR).collect()}
    edges = [(r["o_custkey"], r["p_brand"]) for r in _edges(spark)]
    auth1 = Counter(b for _, b in edges)
    hub1 = defaultdict(int)
    for c, b in edges:
        hub1[c] += auth1[b]
    auth2 = defaultdict(int)
    for c, b in edges:
        auth2[b] += hub1[c]
    assert set(rows) == set(auth1)
    for b in auth1:
        assert rows[b]["auth1"] == auth1[b]
        assert rows[b]["auth2"] == auth2[b]
    ranks = [r["auth_rank"] for r in rows.values()]
    assert sorted(ranks) == list(range(1, len(rows) + 1))


def test_join_cardinality_estimate_first_principles(spark):
    """The actual_rows column must equal a real join's count, and the
    estimate must equal n1*n2 // max(d1,d2) recomputed here."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9b_queries import (
        q_join_cardinality_estimate,
    )

    rows = {
        r["join_family"]: r
        for r in q_join_cardinality_estimate(spark, SF_DIR).collect()
    }
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    real = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    r = rows["orders_lineitem"]
    assert r["actual_rows"] == real
    assert r["est_rows"] == (r["n1"] * r["n2"]) // max(r["d1"], r["d2"])
    assert r["err_permille"] == (
        1000 * abs(r["est_rows"] - r["actual_rows"])
    ) // r["actual_rows"]
    # an FK join's ndv on the PK side equals its row count
    assert r["n1"] == r["d1"]


def test_frequent_triples_apriori_is_lossless(spark):
    """The level-1-pruned map-side expansion must produce exactly the
    set a brute-force basket census produces — Apriori pruning drops
    only candidates that could never pass the threshold."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9b_queries import (
        _TRIPLE_MINSUP_PERMILLE,
        q_frequent_triple_itemsets,
    )

    got = {
        (r["brand_a"], r["brand_b"], r["brand_c"]): r["support"]
        for r in q_frequent_triple_itemsets(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    baskets = defaultdict(set)
    for r in li.join(part, li.l_partkey == part.p_partkey).collect():
        baskets[r["l_orderkey"]].add(r["p_brand"])
    census = Counter()
    for bs in baskets.values():
        for t in combinations(sorted(bs), 3):
            census[t] += 1
    n = len(baskets)
    want = {
        t: s
        for t, s in census.items()
        if s * 1000 >= n * _TRIPLE_MINSUP_PERMILLE
    }
    assert got == want


def test_ols_cramer_matches_exact_rational_solve(spark):
    """Solve the 3x3 normal equations with Fraction arithmetic from the
    exact integer moment sums and compare each emitted beta within the
    round-6 emission tolerance."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9b_queries import q_ols_cramer_two_feature

    got = {
        r["l_returnflag"]: r
        for r in q_ols_cramer_two_feature(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem").collect()
    sums = defaultdict(lambda: [0] * 9)  # n,s1,s2,s11,s12,s22,sy,s1y,s2y
    for r in li:
        x1 = round(r["l_quantity"])
        x2 = round(r["l_discount"] * 1000)
        y = round(r["l_extendedprice"] * 100)
        s = sums[r["l_returnflag"]]
        for i, v in enumerate(
            (1, x1, x2, x1 * x1, x1 * x2, x2 * x2, y, x1 * y, x2 * y)
        ):
            s[i] += v
    for flag, (n, s1, s2, s11, s12, s22, sy, s1y, s2y) in sums.items():
        det = Fraction(
            n * (s11 * s22 - s12 * s12)
            - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)
        )
        det0 = (
            sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y)
        )
        det1 = (
            n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2)
        )
        det2 = (
            n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2)
        )
        row = got[flag]
        assert row["n_items"] == n
        for col, num in (
            ("beta_intercept_c", det0),
            ("beta_qty_c", det1),
            ("beta_disc_permille_c", det2),
        ):
            exact = Fraction(num) / det
            assert abs(float(exact) - row[col]) < 5e-6, (flag, col)


def test_ndcg_bounded_and_ideal_is_upper_bound(spark):
    from etl_portofolio_spark.plans.round9b_queries import q_ndcg_at_k_eval

    rows = q_ndcg_at_k_eval(spark, SF_DIR).collect()
    assert rows, "nation panel must not be empty"
    for r in rows:
        assert 0 <= r["dcg"] <= r["idcg"]
        if r["idcg"] > 0:
            assert 0 <= r["ndcg_permille"] <= 1000


def test_brier_decomposition_reassembles_direct_score(spark):
    """rel/N - res/N + unc must reproduce the directly-computed mean
    Brier score to float tolerance (Murphy's identity)."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9b_queries import q_brier_decomposition

    rows = q_brier_decomposition(spark, SF_DIR).collect()
    n_tot = sum(r["n_lines"] for r in rows)
    r_tot = sum(r["n_returned"] for r in rows)
    rel = sum(r["reliability_term"] for r in rows) / n_tot
    res = sum(r["resolution_term"] for r in rows) / n_tot
    obar = r_tot / n_tot
    unc = obar * (1 - obar)
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.round(F.col("l_discount") * 1000, 0).cast("long").alias("f"),
        (F.col("l_returnflag") == "R").cast("int").alias("o"),
    ).collect()
    direct = sum((r["f"] / 1000 - r["o"]) ** 2 for r in li) / len(li)
    assert abs((rel - res + unc) - direct) < 1e-6


def test_balanced_downsample_is_balanced_and_deterministic(spark):
    from etl_portofolio_spark.plans.round9b_queries import (
        q_class_balance_downsample,
    )

    rows = q_class_balance_downsample(spark, SF_DIR).collect()
    keeps = {r["n_kept"] for r in rows}
    assert len(keeps) == 1
    assert keeps.pop() == min(r["n_total"] for r in rows)
    again = {
        r["label"]: r["id_checksum"]
        for r in q_class_balance_downsample(spark, SF_DIR).collect()
    }
    assert again == {r["label"]: r["id_checksum"] for r in rows}


def test_hll_intersection_sane(spark):
    """Structural sketch-algebra invariants: the union estimate is at
    least each side's estimate (register-wise max can only grow a
    sketch) and every estimate lands within the generous 64-register
    error band of its exact count."""
    from etl_portofolio_spark.plans.round9b_queries import (
        q_hll_intersection_estimate,
    )

    r = q_hll_intersection_estimate(spark, SF_DIR).collect()[0]
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
    for est, exact in (
        ("est_a", "n_a_exact"),
        ("est_b", "n_b_exact"),
    ):
        assert 0.4 * r[exact] <= r[est] <= 2.5 * r[exact], (est, r)
    assert (
        abs(r["est_intersection"] - r["n_both_exact"])
        <= max(80.0, 0.8 * r["n_both_exact"])
    )


def test_kneser_ney_continuation_is_distinct_context_count(spark):
    """Re-derive the top word's continuation count from raw bigrams."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round9b_queries import (
        q_kneser_ney_continuation,
    )

    rows = q_kneser_ney_continuation(spark, SF_DIR).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    top = rows[0]
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    contexts = set()
    n_types = set()
    for d in docs:
        toks = d["text"].strip().lower().split()
        for a, b in zip(toks, toks[1:]):
            n_types.add((a, b))
            if b == top["word"]:
                contexts.add(a)
    assert top["cont_count"] == len(contexts)
    assert top["p_cont_permicro"] == (1_000_000 * len(contexts)) // len(n_types)


def test_lead_lag_xcorr_symmetric_window(spark):
    from etl_portofolio_spark.plans.round9b_queries import (
        _XCORR_MAXLAG,
        q_lead_lag_xcorr,
    )

    rows = q_lead_lag_xcorr(spark, SF_DIR).collect()
    assert [r["lag"] for r in rows] == list(
        range(-_XCORR_MAXLAG, _XCORR_MAXLAG + 1)
    )
    for r in rows:
        assert -1.0 <= r["corr_xy"] <= 1.0
        assert r["n_days"] > 0
