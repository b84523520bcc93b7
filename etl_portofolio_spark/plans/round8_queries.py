"""Round-8 query wave — model-evaluation operators (the metrics every
training-data pipeline computes downstream of the features this engine
already builds): exact tie-aware ROC AUC, score-calibration bins,
Benjamini-Hochberg multiple-testing control, and quantile (pinball)
forecast loss.

Each entry: name -> (builder(spark, sf_dir) -> DataFrame, DuckDB oracle
SQL).  Same determinism contract as every other wave: integers end to
end — AUC as an exact rational scaled to permille by integer ``div``,
calibration gaps in permille, BH rejection decided by cross-multiplied
integer comparison (never a float p-value), pinball loss in
deci-cents.  No engine ever rounds a float at unsafe magnitude.

Scale theme of the wave: REDUCE TO A BOUNDED PANEL FIRST.  Every
metric here aggregates fact rows into a domain-bounded frame (score
histogram <= 11 rows, 10 calibration bins, 25 brand tests, ~2.4k
calendar days) with one map-side-combinable pass, and only then runs
the order-sensitive step (cumulative ranks, BH step-up, sweep) on that
tiny frame — the window never partitions over fact-row cardinalities,
so the plan is one scan + one shuffle at any scale factor.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.plans.analytics_queries import cents
from etl_portofolio_spark.plans.oracle_types import oracle_bigint
from etl_portofolio_spark.session import apply_runtime_confs

ROUND8_QUERIES: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {}


# ---------------------------------------------------------------------------
# roc_auc_exact — tie-aware ROC AUC as an exact rank statistic
# ---------------------------------------------------------------------------


def q_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the "discount predicts return" scorer, with the
    average-rank tie convention — the metric every binary classifier
    eval reports, computed as the Mann-Whitney identity rather than a
    trapezoid over float thresholds.

    Score = discount in integer percent (11 distinct values), label =
    ``l_returnflag = 'R'``.  With ties, AUC = [sum_t pos_t * (2 *
    neg_below_t + neg_t)] / (2 * P * N) where ``neg_below_t`` counts
    negatives at strictly lower scores; the numerator (``auc2_num``)
    and an ``auc_permille = (1000 * num) div (2*P*N)`` are emitted as
    BIGINTs, so nothing floating ever crosses an engine.

    Scale design: one map-side-combinable groupBy collapses fact rows
    to the <= 11-row score histogram; the cumulative-negatives window
    runs on that bounded frame only (single partition over 11 rows by
    construction, never over fact rows).  The 2*P*N denominator stays
    under 2^63 up to ~2*10^9 rows per class; beyond that the same plan
    emits per-score partials and the division moves to the caller.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("score"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("score")
        .agg(
            F.sum("is_pos").alias("pos_t"),
            F.sum(1 - F.col("is_pos")).alias("neg_t"),
        )
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    terms = hist.withColumn(
        "neg_below", F.coalesce(F.sum("neg_t").over(w), F.lit(0))
    )
    return terms.agg(
        F.sum("pos_t").cast("long").alias("pos_n"),
        F.sum("neg_t").cast("long").alias("neg_n"),
        F.sum(
            F.col("pos_t") * (2 * F.col("neg_below") + F.col("neg_t"))
        ).cast("long").alias("auc2_num"),
    ).select(
        "pos_n",
        "neg_n",
        "auc2_num",
        F.expr("(1000 * auc2_num) div (2 * pos_n * neg_n)")
        .cast("long")
        .alias("auc_permille"),
    )


_AUC_SQL = oracle_bigint(
    """
WITH hist AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS score,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos_t,
         SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS neg_t
  FROM lineitem GROUP BY 1
), terms AS (
  SELECT pos_t, neg_t,
         COALESCE(SUM(neg_t) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM hist
), agg AS (
  SELECT SUM(pos_t) AS pos_n, SUM(neg_t) AS neg_n,
         SUM(pos_t * (2 * neg_below + neg_t)) AS auc2_num
  FROM terms
)
SELECT pos_n, neg_n, auc2_num,
       (1000 * auc2_num) // (2 * pos_n * neg_n) AS auc_permille
FROM agg
""",
    "pos_n",
    "neg_n",
    "auc2_num",
    "auc_permille",
)

ROUND8_QUERIES["roc_auc_exact"] = (q_roc_auc_exact, _AUC_SQL)


# ---------------------------------------------------------------------------
# calibration_bins_report — reliability diagram in exact permille
# ---------------------------------------------------------------------------


def q_calibration_bins_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a deterministic return-probability
    scorer: predicted permille = 10 * discount-percent * tax-percent
    bounded to [0, 1000] — a monotone pseudo-model whose point is the
    CALIBRATION MACHINERY, not the scorer.  Per decile bin of the
    predicted score: support, mean predicted permille, empirical
    positive permille, and the absolute gap — the per-bin terms of
    expected calibration error, all by integer ``div``.

    Scale design: binning is a map-side expression, the groupBy keys on
    <= 10 bins, and every emitted ratio divides two BIGINT sums — a
    single combinable aggregation over the scan, nothing downstream of
    it larger than 10 rows.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    scored = li.select(
        F.least(
            F.lit(1000),
            (
                F.round(F.col("l_discount") * 100, 0).cast("long")
                * F.round(F.col("l_tax") * 100, 0).cast("long")
                * 10
            ),
        ).alias("p_hat"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
    ).withColumn("bin", F.least(F.lit(9), F.expr("p_hat div 100")).cast("long"))
    agg = scored.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("p_hat").cast("long").alias("sum_p"),
        F.sum("is_pos").cast("long").alias("n_pos"),
    )
    return agg.select(
        "bin",
        "n",
        F.expr("sum_p div n").cast("long").alias("pred_permille"),
        F.expr("(1000 * n_pos) div n").cast("long").alias("emp_permille"),
        F.abs(F.expr("sum_p div n") - F.expr("(1000 * n_pos) div n"))
        .cast("long")
        .alias("gap_permille"),
    ).orderBy("bin")


_CALIB_SQL = oracle_bigint(
    """
WITH scored AS (
  SELECT LEAST(1000,
           CAST(round(l_discount * 100, 0) AS BIGINT)
           * CAST(round(l_tax * 100, 0) AS BIGINT) * 10) AS p_hat,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_pos
  FROM lineitem
), binned AS (
  SELECT LEAST(9, p_hat // 100) AS bin, p_hat, is_pos FROM scored
), agg AS (
  SELECT bin, COUNT(*) AS n, SUM(p_hat) AS sum_p, SUM(is_pos) AS n_pos
  FROM binned GROUP BY bin
)
SELECT bin, n,
       sum_p // n AS pred_permille,
       (1000 * n_pos) // n AS emp_permille,
       ABS(sum_p // n - (1000 * n_pos) // n) AS gap_permille
FROM agg ORDER BY bin
""",
    "bin",
    "n",
    "pred_permille",
    "emp_permille",
    "gap_permille",
)

ROUND8_QUERIES["calibration_bins_report"] = (
    q_calibration_bins_report,
    _CALIB_SQL,
)


# ---------------------------------------------------------------------------
# multiple_testing_bh — Benjamini-Hochberg step-up, cross-multiplied
# ---------------------------------------------------------------------------

_BH_ALPHA_NUM, _BH_ALPHA_DEN = 1, 4  # alpha = 0.25 (surrogate p's are coarse)


def q_multiple_testing_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across a 25-brand panel of
    two-sample tests — the multiple-testing step every per-segment
    drift/lift screen needs before acting on its "significant" cells.

    Per brand, the test statistic is the exact Mann-Whitney U of
    returned-vs-kept quantity distributions, and the surrogate p-value
    is the exact rational ``2 * min(U, n1*n2 - U) / (n1*n2)`` — the
    midrank-displacement measure (1 when the distributions' ranks
    interleave perfectly, small when they separate).  It is coarse but
    EXACT, which is the point: the BH machinery (ascending sort,
    largest k with p_(k) <= k*alpha/m, reject 1..k) is evidenced with
    every comparison cross-multiplied into BIGINTs — ``p_num * m *
    alpha_den <= k * alpha_num * p_den`` — so no float p-value ever
    crosses an engine.  Production swaps in a real CDF at the same
    seam.

    Scale design: U comes from per-(brand, quantity) histogram counts
    (bounded 25 x 50 frame) via the tie-corrected rank-sum identity;
    the step-up runs on the 25-row panel.  One scan, one shuffle.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    hist = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.col("l_quantity").cast("long").alias("q"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        )
        .groupBy("p_brand", "q")
        .agg(
            F.sum("g").cast("long").alias("c1"),
            F.sum(1 - F.col("g")).cast("long").alias("c0"),
        )
    )
    # Tie-aware rank sum for group 1 on the bounded (brand, q) frame:
    # ranksum1 = sum_q c1_q * (below_q + (t_q + 1) / 2) with t = c0+c1;
    # doubled to stay integral. U1 = ranksum1 - n1(n1+1)/2.
    wb = Window.partitionBy("p_brand").orderBy("q").rowsBetween(
        Window.unboundedPreceding, -1
    )
    u = (
        hist.withColumn("t", F.col("c0") + F.col("c1"))
        .withColumn("below", F.coalesce(F.sum("t").over(wb), F.lit(0)))
        .groupBy("p_brand")
        .agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c0").cast("long").alias("n0"),
            F.sum(F.col("c1") * (2 * F.col("below") + F.col("t") + 1))
            .cast("long")
            .alias("ranksum1_x2"),
        )
        .select(
            "p_brand",
            "n1",
            "n0",
            F.expr("(ranksum1_x2 - n1 * (n1 + 1)) div 2")
            .cast("long")
            .alias("u1"),
        )
        .where((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    m_w = Window.partitionBy(F.lit(1))
    # permicro integer sort key: a float ratio here could order two
    # near-equal p's differently across engines; integer div cannot
    k_w = Window.partitionBy(F.lit(1)).orderBy(
        F.expr("(p_num * 1000000) div p_den"),
        F.col("p_brand"),
    )
    panel = (
        u.select(
            "p_brand",
            "n1",
            "n0",
            "u1",
            (2 * F.least(F.col("u1"), F.col("n1") * F.col("n0") - F.col("u1")))
            .cast("long")
            .alias("p_num"),
            (F.col("n1") * F.col("n0")).cast("long").alias("p_den"),
        )
        .withColumn("m", F.count("*").over(m_w).cast("long"))
        .withColumn("k", F.row_number().over(k_w).cast("long"))
    )
    # step-up: reject 1..k_max where k_max = max k with
    # p_num * m * alpha_den <= k * alpha_num * p_den
    flagged = panel.withColumn(
        "le",
        F.when(
            F.col("p_num") * F.col("m") * F.lit(_BH_ALPHA_DEN)
            <= F.col("k") * F.lit(_BH_ALPHA_NUM) * F.col("p_den"),
            F.col("k"),
        ).otherwise(F.lit(0)),
    ).withColumn("k_max", F.max("le").over(m_w))
    return flagged.select(
        "p_brand",
        "n1",
        "n0",
        "u1",
        F.expr("(1000 * p_num) div p_den").cast("long").alias("p_permille"),
        "k",
        F.when(F.col("k") <= F.col("k_max"), 1)
        .otherwise(0)
        .cast("long")
        .alias("rejected"),
    ).orderBy("k")


_BH_SQL = oracle_bigint(
    f"""
WITH hist AS (
  SELECT p_brand, CAST(l_quantity AS BIGINT) AS q,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS c0
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, c1, c0, c0 + c1 AS t,
         COALESCE(SUM(c0 + c1) OVER (PARTITION BY p_brand ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM hist
), u AS (
  SELECT p_brand, SUM(c1) AS n1, SUM(c0) AS n0,
         (SUM(c1 * (2 * below + t + 1)) - SUM(c1) * (SUM(c1) + 1)) // 2 AS u1
  FROM ranked GROUP BY p_brand
  HAVING SUM(c1) > 0 AND SUM(c0) > 0
), panel AS (
  SELECT p_brand, n1, n0, u1,
         2 * LEAST(u1, n1 * n0 - u1) AS p_num,
         n1 * n0 AS p_den,
         COUNT(*) OVER () AS m,
         ROW_NUMBER() OVER (ORDER BY
           (2 * LEAST(u1, n1 * n0 - u1) * 1000000) // (n1 * n0),
           p_brand) AS k
  FROM u
), flagged AS (
  SELECT *, MAX(CASE WHEN p_num * m * {_BH_ALPHA_DEN}
                      <= k * {_BH_ALPHA_NUM} * p_den
                THEN k ELSE 0 END) OVER () AS k_max
  FROM panel
)
SELECT p_brand, n1, n0, u1,
       (1000 * p_num) // p_den AS p_permille,
       k,
       CASE WHEN k <= k_max THEN 1 ELSE 0 END AS rejected
FROM flagged ORDER BY k
""",
    "n1",
    "n0",
    "u1",
    "p_permille",
    "k",
    "rejected",
)

ROUND8_QUERIES["multiple_testing_bh"] = (q_multiple_testing_bh, _BH_SQL)


# ---------------------------------------------------------------------------
# pinball_loss_quantile_eval — quantile-forecast loss in deci-cents
# ---------------------------------------------------------------------------


def q_pinball_loss_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecaster —
    y_hat(d) = the daily-revenue series 7 OBSERVATIONS back (row-based
    lag; the ship-date calendar is dense in this corpus, and a gapped
    one would go through ``date_spine_gapfill`` first) — at
    q = 0.1 / 0.5 / 0.9,
    the metric quantile forecasts are actually scored with (q = 0.5 is
    exactly MAE/2).  Loss is kept integral by working in DECI-CENTS:
    10*loss = q10*(y - yhat) when y >= yhat else (q10 - 10)*(y -
    yhat), with q10 the quantile in tenths.

    Scale design: fact rows collapse to the calendar-bounded daily
    series (one combinable pass); the lag-7 self-alignment and the
    3-quantile explode both run on that ~2.4k-row frame.  The daily
    window orders a calendar axis, not fact rows.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(cents("l_extendedprice")).cast("long").alias("rev_c"))
    )
    w = Window.orderBy("d")
    aligned = (
        daily.withColumn("yhat_c", F.lag("rev_c", 7).over(w))
        .where(F.col("yhat_c").isNotNull())
        .withColumn("err_c", F.col("rev_c") - F.col("yhat_c"))
    )
    q = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("q10")
    )
    return (
        aligned.crossJoin(F.broadcast(q))
        .groupBy("q10")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(
                F.when(
                    F.col("err_c") >= 0, F.col("q10") * F.col("err_c")
                ).otherwise((F.col("q10") - 10) * F.col("err_c"))
            )
            .cast("long")
            .alias("pinball_decicents"),
        )
        .select(
            F.col("q10").cast("long").alias("q10"),
            "n_days",
            "pinball_decicents",
            F.expr("pinball_decicents div n_days")
            .cast("long")
            .alias("mean_decicents"),
        )
        .orderBy("q10")
    )


_PINBALL_SQL = oracle_bigint(
    """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY 1
), aligned AS (
  SELECT rev_c - yhat_c AS err_c FROM (
    SELECT rev_c, LAG(rev_c, 7) OVER (ORDER BY d) AS yhat_c FROM daily
  ) WHERE yhat_c IS NOT NULL
)
SELECT q10, COUNT(*) AS n_days,
       SUM(CASE WHEN err_c >= 0 THEN q10 * err_c
                ELSE (q10 - 10) * err_c END) AS pinball_decicents,
       SUM(CASE WHEN err_c >= 0 THEN q10 * err_c
                ELSE (q10 - 10) * err_c END) // COUNT(*) AS mean_decicents
FROM aligned CROSS JOIN (SELECT UNNEST([1, 5, 9]) AS q10)
GROUP BY q10 ORDER BY q10
""",
    "q10",
    "n_days",
    "pinball_decicents",
    "mean_decicents",
)

ROUND8_QUERIES["pinball_loss_quantile_eval"] = (
    q_pinball_loss_quantile_eval,
    _PINBALL_SQL,
)
