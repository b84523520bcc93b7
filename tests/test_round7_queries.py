"""Round-7 wave: algorithmic cross-checks that go beyond the oracle
hash — PAVA equivalence for the minimax isotonic fit, KM survival
sanity, and attribution conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _pava(ys: list[float], ws: list[int]) -> list[float]:
    """Reference pool-adjacent-violators: (level, weight) stack merge."""
    blocks: list[tuple[float, float]] = []  # (weighted sum, weight)
    for y, w in zip(ys, ws):
        s, ww = y * w, float(w)
        while blocks and blocks[-1][0] / blocks[-1][1] > s / ww:
            ps, pw = blocks.pop()
            s, ww = s + ps, ww + pw
        blocks.append((s, ww))
    return [(s / ww, ww) for s, ww in blocks]


def test_isotonic_minimax_equals_pava(spark):
    """The declarative minimax fit must equal the sequential PAVA
    solution level-for-level (same weighted means, monotone)."""
    from etl_portofolio_spark.plans.round7_queries import q_isotonic_price_curve

    rows = sorted(
        (r["v"], r["w"], r["mean_r4"], r["iso_r4"])
        for r in q_isotonic_price_curve(spark, SF_DIR).collect()
    )
    vs = [r[0] for r in rows]
    ws = [r[1] for r in rows]
    means = [r[2] for r in rows]
    iso = [r[3] for r in rows]
    # monotone non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # expand PAVA block levels back onto the domain
    levels = _pava(means, ws)
    expanded: list[float] = []
    i = 0
    for level, bw in levels:
        covered = 0.0
        while covered + 1e-6 < bw:
            covered += ws[i]
            expanded.append(level)
            i += 1
    assert len(expanded) == len(iso)
    for a, b in zip(expanded, iso):
        assert abs(a - b) < 1e-3, (a, b)


def test_time_decay_attribution_conserves_permille(spark):
    """Every purchase's shares must sum to exactly 1000."""
    from etl_portofolio_spark.plans.round7_queries import (
        q_time_decay_attribution,
    )

    df = q_time_decay_attribution(spark, SF_DIR)
    bad = (
        df.groupBy("purchase_id")
        .agg(F.sum("share_permille").alias("tot"))
        .where(F.col("tot") != 1000)
        .count()
    )
    assert bad == 0


def test_km_log_survival_monotone_nonincreasing(spark):
    """Log-survival must be non-increasing in duration (each factor
    ln(1 - d/n) is <= 0)."""
    from etl_portofolio_spark.plans.round7_queries import q_km_time_to_return

    rows = sorted(
        (r["dur"], r["log_surv_r6"])
        for r in q_km_time_to_return(spark, SF_DIR).collect()
    )
    surv = [s for _, s in rows]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
