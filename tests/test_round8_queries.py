"""Round-8 wave: algorithmic cross-checks beyond the oracle hash —
AUC re-derived by a different algorithm, BH step-up replayed with
exact rationals, calibration-bin invariants, and the pinball/MAE
identity at the median."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_roc_auc_matches_sorted_sweep(spark):
    """Recompute AUC from the raw (score, label) rows with a sorted
    sweep (count positives below each negative) — a genuinely different
    algorithm from the plan's histogram identity — and compare the
    doubled numerator exactly."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round8_queries import q_roc_auc_exact

    row = q_roc_auc_exact(spark, SF_DIR).collect()[0]

    li = load_table(spark, SF_DIR, "lineitem")
    rows = li.select(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    ).collect()
    pairs = sorted((r["s"], r["y"]) for r in rows)
    auc2 = 0
    neg_below = 0
    i = 0
    while i < len(pairs):
        j = i
        pos_t = neg_t = 0
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            pos_t += pairs[j][1]
            neg_t += 1 - pairs[j][1]
            j += 1
        auc2 += pos_t * (2 * neg_below + neg_t)
        neg_below += neg_t
        i = j
    pos_n = sum(y for _, y in pairs)
    neg_n = len(pairs) - pos_n
    assert row["auc2_num"] == auc2
    assert row["pos_n"] == pos_n and row["neg_n"] == neg_n
    assert row["auc_permille"] == (1000 * auc2) // (2 * pos_n * neg_n)


def test_bh_stepup_matches_exact_rational_replay(spark):
    """Replay Benjamini-Hochberg with Fraction arithmetic on the
    panel's exact (p_num, p_den) and assert the plan's rejection set —
    the cross-multiplied integer comparisons must agree with true
    rational p <= k*alpha/m at every k."""
    from etl_portofolio_spark.plans.round8_queries import (
        _BH_ALPHA_DEN,
        _BH_ALPHA_NUM,
        q_multiple_testing_bh,
    )

    out = q_multiple_testing_bh(spark, SF_DIR).collect()
    m = len(out)
    alpha = Fraction(_BH_ALPHA_NUM, _BH_ALPHA_DEN)
    panel = []
    for r in out:
        p_num = 2 * min(r["u1"], r["n1"] * r["n0"] - r["u1"])
        panel.append((r["k"], Fraction(p_num, r["n1"] * r["n0"]), r["rejected"]))
    panel.sort()
    k_max = 0
    for k, p, _ in panel:
        if p <= Fraction(k, m) * alpha:
            k_max = k
    for k, _, rejected in panel:
        assert rejected == (1 if k <= k_max else 0)
    # rejections are a prefix of the k order by construction
    flags = [rej for _, _, rej in panel]
    assert flags == sorted(flags, reverse=True)


def test_calibration_bins_partition_and_bound(spark):
    """Bins partition the scan (counts sum to the table) and each
    bin's mean predicted score lies inside the bin's score range."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.round8_queries import (
        q_calibration_bins_report,
    )

    out = q_calibration_bins_report(spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r["n"] for r in out) == total
    for r in out:
        lo = r["bin"] * 100
        hi = 1000 if r["bin"] == 9 else r["bin"] * 100 + 99
        assert lo <= r["pred_permille"] <= hi
        assert 0 <= r["emp_permille"] <= 1000
        assert r["gap_permille"] == abs(r["pred_permille"] - r["emp_permille"])


def test_pinball_median_is_half_mae(spark):
    """At q10=5 the pinball loss is exactly 5*|err| per day — compare
    against an independently computed sum of absolute errors."""
    from etl_portofolio_spark.catalog import load_table
    from etl_portofolio_spark.plans.analytics_queries import cents
    from etl_portofolio_spark.plans.round8_queries import (
        q_pinball_loss_quantile_eval,
    )

    out = {r["q10"]: r for r in q_pinball_loss_quantile_eval(spark, SF_DIR).collect()}
    assert set(out) == {1, 5, 9}
    assert len({r["n_days"] for r in out.values()}) == 1

    li = load_table(spark, SF_DIR, "lineitem")
    daily = sorted(
        (r["d"], r["rev_c"])
        for r in li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(cents("l_extendedprice")).cast("long").alias("rev_c"))
        .collect()
    )
    series = [c for _, c in daily]
    abs_err = sum(abs(series[i] - series[i - 7]) for i in range(7, len(series)))
    assert out[5]["pinball_decicents"] == 5 * abs_err
    assert out[5]["n_days"] == len(series) - 7
