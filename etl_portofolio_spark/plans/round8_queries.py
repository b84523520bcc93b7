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


# ---------------------------------------------------------------------------
# item_cf_cosine_topk — item-item collaborative filtering neighbors
# ---------------------------------------------------------------------------

_CF_PANEL = 10  # most-popular items whose neighbor lists are emitted
_CF_K = 3  # neighbors per item


def q_item_cf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering neighbors at PART grain — the
    co-occurrence/cosine recommender primitive ("customers who bought X
    also bought Y").  For the %(panel)d most-popular parts, the top-%(k)d
    neighbor parts by cosine similarity over order baskets, where
    cos^2(a,b) = c_ab^2 / (n_a * n_b) is ranked in exact parts-per-
    million (squaring is monotone for non-negative cosines, so the
    ranking is the cosine ranking with no sqrt crossing an engine).

    Scale design: the pair fan-out is a self-join on the order key
    AFTER distinct (order, part) projection — bounded by basket size
    squared (TPC-H <= 7 lines), linear in orders, never item-quadratic.
    Item supports join back via the part-keyed frame (broadcastable at
    dimension scale; a billion-item catalog shuffles on partkey — both
    equi-joins).  The neighbor window partitions by item.  simsq fits
    BIGINT while c < ~3e6 baskets per pair (beyond that, rank on
    c^2 * 10^6 div (n_a * n_b) with the constant moved down).
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.caching import scoped_persist

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        # explicit NOT-NULL on the keys (the TPC-H columns are NOT NULL
        # by spec, so this drops nothing): the optimizer infers these
        # filters on the JOIN branches only, which de-canonicalizes the
        # shared distinct subtree and forked it into FOUR separate
        # scans+exchanges (r10 plan audit). Stating the filter once
        # restores one shared exchange via ReuseExchange.
        .where(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
    )
    # NOT persisted, deliberately: the distinct feeds n_i and both
    # self-join sides, but all three references share one physical
    # shuffle via ReuseExchange — an explicit persist was A/B'd this
    # round and lost (cache materialization + cached-read cost ~2.5x
    # the reused shuffle-file reads it replaced; r10 stage profiles).
    # spread_by(l_orderkey) parallelizes the one-row-group test scan
    # AND makes the distinct partition-local (hash(ok) satisfies the
    # (ok, part) clustering) with the self-join co-partitioned on ok —
    # one keyed exchange where the old plan paid three.
    from etl_portofolio_spark.operators.util import spread_by

    op = spread_by(li, "l_orderkey").distinct()
    n_i = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    panel = (
        n_i.orderBy(F.col("n").desc(), F.col("l_partkey").asc())
        .limit(_CF_PANEL)
        .select(F.col("l_partkey").alias("ia"), F.col("n").alias("n_a"))
    )
    # Panel pre-filter BEFORE the self-join (guide §3.2: reduce the big
    # side before shuffling it): only pairs anchored at a panel item
    # survive downstream, so the probe side drops to the panel items'
    # basket rows via a broadcast equi-join — the pair stream then
    # shrinks from every co-purchase pair (26 MB exchange at sf0.1, the
    # query's dominant shuffle; r10 stage profile) to the panel
    # neighborhood, absorbed map-side by the census combiner. Pair
    # counts are unchanged: the filter is per pair KEY (anchor item),
    # never per co-occurrence instance; n_a rides along to skip the
    # former re-join of the panel onto the census.
    a = op.join(F.broadcast(panel), op.l_partkey == panel.ia).select(
        F.col("l_orderkey").alias("ok"), "ia", "n_a"
    )
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("ib"))
    sym = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("ia") != F.col("ib")))
        .groupBy("ia", "n_a", "ib")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = sym.join(
        n_i.select(F.col("l_partkey").alias("ib"), F.col("n").alias("n_b")),
        "ib",
    ).withColumn(
        "simsq_ppm",
        F.expr("(1000000 * c * c) div (n_a * n_b)").cast("long"),
    )
    w = Window.partitionBy("ia").orderBy(
        F.col("simsq_ppm").desc(), F.col("c").desc(), F.col("ib").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _CF_K)
        .select(
            F.col("ia").alias("item"),
            F.col("rk").cast("long").alias("rk"),
            F.col("ib").alias("neighbor"),
            F.col("c").cast("long").alias("cooc"),
            "simsq_ppm",
        )
        .orderBy("item", "rk")
    )


_CF_SQL = oracle_bigint(
    f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_i AS (
  SELECT l_partkey, COUNT(*) AS n FROM op GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS ia, b.l_partkey AS ib, COUNT(*) AS c
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), sym AS (
  SELECT ia, ib, c FROM pairs
  UNION ALL
  SELECT ib AS ia, ia AS ib, c FROM pairs
), panel AS (
  SELECT l_partkey AS ia, n AS n_a FROM n_i
  ORDER BY n DESC, l_partkey ASC LIMIT {_CF_PANEL}
), scored AS (
  SELECT s.ia, s.ib, s.c, p.n_a, nb.n AS n_b,
         (1000000 * s.c * s.c) // (p.n_a * nb.n) AS simsq_ppm
  FROM sym s JOIN panel p ON s.ia = p.ia
  JOIN n_i nb ON s.ib = nb.l_partkey
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ia
    ORDER BY simsq_ppm DESC, c DESC, ib ASC) AS rk
  FROM scored
)
SELECT ia AS item, rk, ib AS neighbor, c AS cooc, simsq_ppm
FROM ranked WHERE rk <= {_CF_K}
ORDER BY item, rk
""",
    "rk",
    "cooc",
    "simsq_ppm",
)

ROUND8_QUERIES["item_cf_cosine_topk"] = (q_item_cf_cosine_topk, _CF_SQL)


# ---------------------------------------------------------------------------
# graph_modularity_partition — integer modularity of a labeled partition
# ---------------------------------------------------------------------------


def q_graph_modularity_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the brand-family partition (community = the
    digit block in ``Brand#XY`` -> X) over the weighted brand
    co-purchase graph — the quality score every community-detection
    run (label propagation, Louvain) is judged by, computed EXACTLY:
    Q * 4m^2 = sum_c (4 * m * in_c - d_c^2) with integer edge weights,
    m total weight, in_c intra-community weight, d_c community degree.
    Emitted per community with ``q_permille = (1000 * sum_terms) div
    (4 m^2)`` repeated as the panel verdict.

    Scale design: edges come from the bounded basket self-join (same
    shape as item CF); everything after the pair aggregation lives on
    a <= 300-row edge frame and a 5-row community panel.  The windows
    run on those bounded frames only.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # spread_by(l_orderkey): parallelizes the one-row-group test scan
    # and its partitioning satisfies BOTH the (ok, brand) distinct and
    # the ok-keyed self-join below — one keyed exchange instead of a
    # distinct shuffle plus two join-side exchanges (no-op at
    # production split counts; see operators/util.spread_by)
    from etl_portofolio_spark.operators.util import spread_by

    ob = (
        spread_by(li, "l_orderkey")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("ba"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("bb"))
    edges = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("ba") < F.col("bb")))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    comm = lambda c: F.substring(c, 7, 1)  # noqa: E731 — Brand#XY -> X
    # single endpoint-explode pass instead of union(deg)+filter(intra):
    # each edge fans into its two community endpoints map-side; an
    # intra edge contributes w at BOTH endpoints, so the intra sum is
    # recovered exactly as (sum of intra endpoint weight) div 2 — the
    # edge frame (and the basket self-join above it) is scanned once
    ep = edges.select(
        F.explode(F.array(comm(F.col("ba")), comm(F.col("bb")))).alias(
            "community"
        ),
        "w",
        F.when(comm(F.col("ba")) == comm(F.col("bb")), F.col("w"))
        .otherwise(F.lit(0))
        .alias("w_intra_ep"),
    )
    panel = (
        ep.groupBy("community")
        .agg(
            F.sum("w").cast("long").alias("deg_w"),
            F.expr("sum(w_intra_ep) div 2").cast("long").alias("in_w"),
        )
        .withColumn("m", F.expr("sum(deg_w) over () div 2").cast("long"))
        .withColumn(
            "q_term",
            (4 * F.col("m") * F.col("in_w") - F.col("deg_w") * F.col("deg_w"))
            .cast("long"),
        )
    )
    return panel.select(
        "community",
        "in_w",
        "deg_w",
        "q_term",
        F.expr(
            "(1000 * sum(q_term) over ()) div (4 * m * m)"
        ).cast("long").alias("q_permille"),
    ).orderBy("community")


_MODULARITY_SQL = oracle_bigint(
    """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), edges AS (
  SELECT a.p_brand AS ba, b.p_brand AS bb, COUNT(*) AS w
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
), deg AS (
  SELECT substr(brand, 7, 1) AS community, SUM(w) AS deg_w FROM (
    SELECT ba AS brand, w FROM edges
    UNION ALL SELECT bb AS brand, w FROM edges
  ) GROUP BY 1
), intra AS (
  SELECT substr(ba, 7, 1) AS community, SUM(w) AS in_w
  FROM edges WHERE substr(ba, 7, 1) = substr(bb, 7, 1)
  GROUP BY 1
), panel AS (
  SELECT d.community, COALESCE(i.in_w, 0) AS in_w, d.deg_w,
         SUM(d.deg_w) OVER () // 2 AS m
  FROM deg d LEFT JOIN intra i ON d.community = i.community
), terms AS (
  SELECT community, in_w, deg_w,
         4 * m * in_w - deg_w * deg_w AS q_term, m
  FROM panel
)
SELECT community, in_w, deg_w, q_term,
       (1000 * SUM(q_term) OVER ()) // (4 * m * m) AS q_permille
FROM terms ORDER BY community
""",
    "in_w",
    "deg_w",
    "q_term",
    "q_permille",
)

ROUND8_QUERIES["graph_modularity_partition"] = (
    q_graph_modularity_partition,
    _MODULARITY_SQL,
)


# ---------------------------------------------------------------------------
# metadata_file_audit — the hidden _metadata column vs a layout contract
# ---------------------------------------------------------------------------

_META_BUCKETS = 8


def q_metadata_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition file/row audit read through Spark's hidden
    ``_metadata`` column — the file-level observability surface every
    lakehouse health check uses (small-file detection, partition row
    balance) without a separate filesystem listing pass.

    A content-keyed fixture writes events into ``bucket = event_id % 8``
    partitions, one file per partition by construction (each bucket is
    hashed to exactly one task by ``repartition(bucket)``).  The query
    reads it back and answers ONLY from ``_metadata.file_path`` plus
    the partition column: rows per bucket and distinct files per
    bucket.  The oracle recomputes rows-per-bucket from the source
    table and pins the one-file-per-bucket layout contract the writer
    guarantees — so a layout regression (e.g. a future writer change
    splitting buckets across files) fails the gate, which is the audit
    working.

    Scale design: ``_metadata`` is populated by the scan (no extra
    listing job); the aggregation keys on the partition value.  The
    only shuffle is the 8-key groupBy.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.fixtures import ensure_fixture

    def _build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", (F.col("event_id") % _META_BUCKETS).alias("bucket")
        )
        ev.repartition(_META_BUCKETS, "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(tmp)

    def _ready(p: str) -> bool:
        # no _SUCCESS under this session's committer config: complete
        # means every bucket directory materialized (the build writes
        # all of them or raises; the atomic publish keeps it all-or-none)
        import os

        try:
            dirs = {d for d in os.listdir(p) if d.startswith("bucket=")}
        except FileNotFoundError:
            return False
        return len(dirs) == _META_BUCKETS

    path = ensure_fixture(sf_dir, "events_bucketdirs", _build, ready=_ready)
    df = spark.read.parquet(path).select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("_metadata.file_path").alias("fp"),
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("fp").cast("long").alias("n_files"),
        )
        .orderBy("bucket")
    )


_META_SQL = oracle_bigint(
    f"""
SELECT event_id % {_META_BUCKETS} AS bucket,
       COUNT(*) AS n_rows,
       1 AS n_files
FROM events GROUP BY 1 ORDER BY 1
""",
    "bucket",
    "n_rows",
    "n_files",
)

ROUND8_QUERIES["metadata_file_audit"] = (q_metadata_file_audit, _META_SQL)


# ---------------------------------------------------------------------------
# snapshot_expiry_audit — retention window of the WAP snapshot store
# ---------------------------------------------------------------------------

#: snapshot k covers orders strictly before cutoff k (growing history)
_SNAP_CUTOFFS = ("1998-01-01", "1999-01-01", "2000-01-01", "2001-01-01")
_SNAP_KEEP = 2


def q_snapshot_expiry_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention audit of the WAP store: publish a growing
    history of monthly order rollups (4 versions, ``keep_versions=2``)
    and answer from what SURVIVES retention — the expire-snapshots
    step every table format runs to bound time-travel storage.

    Emits one row per retained version (oldest-first rank): months
    covered, order count, and how many versions retention retired.
    The oracle recomputes both retained snapshots straight from
    ``orders`` with the same date cutoffs — a retention bug that
    drops the wrong version (or serves a retired one) changes the
    covered window and fails the hash.  A liveness audit additionally
    compares the newest snapshot's total against a recompute and
    raises rather than serve drift.

    Scale design: snapshots are month-grain rollups (calendar-bounded);
    publish/retire is O(#versions) pointer and directory work, never
    data rewrites; the audit aggregate is one combinable pass.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.fixtures import ensure_fixture
    from etl_portofolio_spark.sinks.writer import (
        publish_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    def _build(tmp: str) -> None:
        orders = load_table(spark, sf_dir, "orders")
        for cutoff in _SNAP_CUTOFFS:
            snap = (
                orders.where(
                    F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
                )
                .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            )
            publish_snapshot(spark, snap, tmp, keep_versions=_SNAP_KEEP)

    root = ensure_fixture(
        sf_dir,
        "wap_retention",
        _build,
        ready=lambda p: len(snapshot_versions(spark, p)) >= _SNAP_KEEP,
    )
    versions = snapshot_versions(spark, root)
    if len(versions) != _SNAP_KEEP:
        raise AssertionError(
            f"retention kept {len(versions)} versions, expected {_SNAP_KEEP}"
        )
    n_expired = len(_SNAP_CUTOFFS) - len(versions)
    # liveness audit: newest snapshot must equal a recompute
    newest_cut = _SNAP_CUTOFFS[-1]
    live_total = (
        read_snapshot(spark, root).agg(F.sum("n_orders")).first()[0]
    )
    true_total = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(newest_cut).cast("timestamp"))
        .count()
    )
    if live_total != true_total:
        raise AssertionError(
            f"wap_retention live snapshot is stale: {live_total} != "
            f"{true_total} — delete the fixture cache instead of serving drift"
        )
    frames = []
    for rank, v in enumerate(versions, start=1):
        snap = read_snapshot(spark, root, version=v)
        frames.append(
            snap.agg(
                F.count(F.lit(1)).cast("long").alias("n_months"),
                F.sum("n_orders").cast("long").alias("n_orders"),
            ).select(
                F.lit(rank).cast("long").alias("rank"),
                "n_months",
                "n_orders",
                F.lit(n_expired).cast("long").alias("n_expired"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.union(f)
    return out.orderBy("rank")


_SNAP_SQL = oracle_bigint(
    f"""
SELECT rank, n_months, n_orders, {len(_SNAP_CUTOFFS) - _SNAP_KEEP} AS n_expired
FROM (
  SELECT 1 AS rank,
         COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
         COUNT(*) AS n_orders
  FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_CUTOFFS[-2]}'
  UNION ALL
  SELECT 2 AS rank,
         COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
         COUNT(*) AS n_orders
  FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_CUTOFFS[-1]}'
) ORDER BY rank
""",
    "rank",
    "n_months",
    "n_orders",
    "n_expired",
)

ROUND8_QUERIES["snapshot_expiry_audit"] = (
    q_snapshot_expiry_audit,
    _SNAP_SQL,
)


# ---------------------------------------------------------------------------
# groupwise_cv_folds — leakage-safe group k-fold assignment + audit
# ---------------------------------------------------------------------------

_CV_FOLDS = 5


def q_groupwise_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment over events: every USER (the leakage
    group) hashes to one of 5 folds — the split discipline that keeps
    a user's rows out of both train and validation at once.  Emits the
    per-fold manifest (users, events, event share in permille) plus
    the leakage audit column: the maximum number of distinct folds any
    single user occupies, which a correct group split pins at 1 (a
    row-hashed split would show >1 and fail the gate).

    Scale design: fold is a map-side md5 expression; the manifest is a
    5-key aggregation; the audit aggregates the per-user fold count
    (one combinable pass keyed by user, then a 5-row max) — no window
    over fact rows anywhere.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.functions.hashing import h32

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (h32(F.concat(F.lit("fold:"), F.col("user_id").cast("string")))
         % _CV_FOLDS).alias("fold"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("fold").alias("nf"),
        F.first("fold").alias("fold"),
        F.count(F.lit(1)).cast("long").alias("n_ev"),
    )
    # bounded: 5-row fold manifest
    w = Window.partitionBy(F.lit(1))
    return (
        per_user.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_ev").cast("long").alias("n_events"),
            F.max("nf").cast("long").alias("max_folds_per_user"),
        )
        .withColumn(
            "event_share_permille",
            # bounded: over () on the 5-row fold manifest
            F.expr(
                "(1000 * n_events) div (sum(n_events) over ())"
            ).cast("long"),
        )
        .withColumn(
            "max_folds_per_user", F.max("max_folds_per_user").over(w)
        )
        .select(
            F.col("fold").cast("long").alias("fold"),
            "n_users",
            "n_events",
            "event_share_permille",
            "max_folds_per_user",
        )
        .orderBy("fold")
    )


from etl_portofolio_spark.functions.hashing import h32_sql  # noqa: E402

_CV_SQL = oracle_bigint(
    f"""
WITH ev AS (
  SELECT user_id,
         {h32_sql("'fold:' || CAST(user_id AS VARCHAR)")} % {_CV_FOLDS} AS fold
  FROM events
), per_user AS (
  SELECT user_id, COUNT(DISTINCT fold) AS nf, MIN(fold) AS fold,
         COUNT(*) AS n_ev
  FROM ev GROUP BY user_id
), manifest AS (
  SELECT fold, COUNT(*) AS n_users, SUM(n_ev) AS n_events,
         MAX(nf) AS mfold
  FROM per_user GROUP BY fold
)
SELECT fold, n_users, n_events,
       (1000 * n_events) // (SUM(n_events) OVER ()) AS event_share_permille,
       MAX(mfold) OVER () AS max_folds_per_user
FROM manifest ORDER BY fold
""",
    "fold",
    "n_users",
    "n_events",
    "event_share_permille",
    "max_folds_per_user",
)

ROUND8_QUERIES["groupwise_cv_folds"] = (q_groupwise_cv_folds, _CV_SQL)


# ---------------------------------------------------------------------------
# feature_hashing_projection — the hashing-trick featurizer, per source
# ---------------------------------------------------------------------------

_FH_DIMS = 16


def q_feature_hashing_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): every token
    routes to ``h32('fh:'||tok) % 16`` with a sign bit from an
    independent hash, and each source's documents fold into one
    16-dimensional signed-count vector — the fixed-width, vocab-free
    text featurizer used when a learned vocabulary is too expensive
    (or too mutable) at corpus scale.

    Emits the (source x dim) matrix: signed sum, total tokens routed,
    distinct tokens routed.  The signed sum is what a linear model
    consumes; the distinct count audits routing balance (a skewed
    register means a poor hash, not a poor corpus).

    Scale design: tokenize + route + sign are all map-side JVM
    expressions over one scan (explode fans out tokens but carries two
    small columns); the aggregation keys on (source, dim) <= 80 cells.
    Nothing Python-side, nothing quadratic, no vocabulary state.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.functions.hashing import h32
    from etl_portofolio_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    routed = tok.select(
        "source",
        (h32(F.concat(F.lit("fh:"), F.col("tok"))) % _FH_DIMS).alias("dim"),
        F.when(
            h32(F.concat(F.lit("fhs:"), F.col("tok"))) % 2 == 1, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
        "tok",
    )
    return (
        routed.groupBy("source", "dim")
        .agg(
            F.sum("sgn").cast("long").alias("signed_sum"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("tok").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            F.col("dim").cast("long").alias("dim"),
            "signed_sum",
            "n_tokens",
            "n_distinct",
        )
        .orderBy("source", "dim")
    )


_FH_SQL = oracle_bigint(
    f"""
WITH tok AS (
  SELECT source, t.tok
  FROM documents,
       LATERAL unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
), routed AS (
  SELECT source,
         {h32_sql("'fh:' || tok")} % {_FH_DIMS} AS dim,
         CASE WHEN {h32_sql("'fhs:' || tok")} % 2 = 1 THEN 1 ELSE -1 END AS sgn,
         tok
  FROM tok
)
SELECT source, dim, SUM(sgn) AS signed_sum, COUNT(*) AS n_tokens,
       COUNT(DISTINCT tok) AS n_distinct
FROM routed GROUP BY source, dim ORDER BY source, dim
""",
    "dim",
    "signed_sum",
    "n_tokens",
    "n_distinct",
)

ROUND8_QUERIES["feature_hashing_projection"] = (
    q_feature_hashing_projection,
    _FH_SQL,
)


# ---------------------------------------------------------------------------
# gains_capture_curve — cumulative gains (CAP) points over score groups
# ---------------------------------------------------------------------------


def q_gains_capture_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains (CAP) curve of the return scorer: walking the
    population from highest to lowest predicted score, what share of
    all positives has been captured at each distinct score — the
    "target the top X%" question every campaign/triage model answers.
    One point per distinct score value: population share and captured-
    positive share, both in exact permille.

    Scale design: fact rows collapse to the bounded score histogram
    (the calibration scorer has < 100 distinct values) in one
    combinable pass; the cumulative window walks that frame only.
    """
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.least(
                F.lit(1000),
                (
                    F.round(F.col("l_discount") * 100, 0).cast("long")
                    * F.round(F.col("l_tax") * 100, 0).cast("long")
                    * 10
                ),
            ).alias("score"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("is_pos").cast("long").alias("n_pos"),
        )
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy(F.lit(1))
    return (
        hist.withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_pos", F.sum("n_pos").over(w))
        .select(
            "score",
            "n",
            "n_pos",
            F.expr("(1000 * cum_n) div (sum(n) over ())")
            .cast("long")
            .alias("pop_permille"),
            F.expr(
                "(1000 * cum_pos) div (sum(n_pos) over ())"
            )
            .cast("long")
            .alias("captured_permille"),
        )
        .orderBy(F.col("score").desc())
    )


_GAINS_SQL = oracle_bigint(
    """
WITH hist AS (
  SELECT LEAST(1000,
           CAST(round(l_discount * 100, 0) AS BIGINT)
           * CAST(round(l_tax * 100, 0) AS BIGINT) * 10) AS score,
         COUNT(*) AS n,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_pos
  FROM lineitem GROUP BY 1
), walked AS (
  SELECT score, n, n_pos,
         SUM(n) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         SUM(n_pos) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         SUM(n) OVER () AS tot_n,
         SUM(n_pos) OVER () AS tot_pos
  FROM hist
)
SELECT score, n, n_pos,
       (1000 * cum_n) // tot_n AS pop_permille,
       (1000 * cum_pos) // tot_pos AS captured_permille
FROM walked ORDER BY score DESC
""",
    "score",
    "n",
    "n_pos",
    "pop_permille",
    "captured_permille",
)

ROUND8_QUERIES["gains_capture_curve"] = (q_gains_capture_curve, _GAINS_SQL)


# ---------------------------------------------------------------------------
# streaming_session_oracle — REAL streaming session windows under the gate
# ---------------------------------------------------------------------------

_SESS_GAP = "30 minutes"
_SESS_SENTINEL = "2024-06-01 00:00:00"  # >> max event + gap + lateness


def q_streaming_session_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming SESSION WINDOWS executed for real inside
    the correctness gate — the fourth genuine streaming run in the
    registry, and the one that exercises merge-on-arrival session
    state: events arrive as time-ordered file micro-batches, each
    user's open session merges rows landing within the 30-minute gap,
    and APPEND mode emits a session only after the watermark passes
    its end (the finalize path, unlike the complete-mode tumbling
    oracle which re-emits open state).

    The last file carries a far-future sentinel row (user_id = -1):
    its arrival advances the watermark past every real session's end,
    so append mode finalizes ALL of them before availableNow drains —
    the sentinel's own session never closes and is therefore never
    emitted (and is filtered defensively).  Files are time-ranged,
    time-sorted, and mtime-pinned so micro-batch order is the time
    order — no record arrives behind the watermark.

    The oracle is the batch islands sessionization (gap splits on
    >= 30 minutes, end = last event + gap — Spark's convention), so
    streaming state merge + watermark finalize must reproduce the
    batch answer bit-for-bit.

    100 TB: this IS the production shape for sessionization-on-arrival
    — keyed session state bounded by the watermark horizon, file-source
    catch-up via availableNow; the sentinel trick is how batch-drain
    jobs flush trailing state deterministically.
    """
    apply_runtime_confs(spark)
    import hashlib
    import os

    from etl_portofolio_spark.fixtures import ensure_fixture
    from etl_portofolio_spark.streaming.structured import (
        read_file_stream,
        session_counts,
    )

    def _build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
        sentinel = spark.range(1).select(
            F.lit(-1).cast("long").alias("user_id"),
            F.lit(_SESS_SENTINEL).cast("timestamp").alias("ts"),
            F.lit(0.0).alias("value"),
        )
        (
            ev.unionByName(sentinel)
            .repartitionByRange(2, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # pin micro-batch order: the file source orders by (mtime, path);
        # same-job part files share an mtime, and the SENTINEL file must
        # be read last or the watermark drops every real event as late
        parts = sorted(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        base = 1_700_000_000
        for i, f in enumerate(parts):
            os.utime(os.path.join(tmp, f), (base + 60 * i, base + 60 * i))

    path = ensure_fixture(sf_dir, "events_stream_sessions", _build)
    stream = read_file_stream(
        spark,
        path,
        schema="user_id bigint, ts timestamp, value double",
        max_files_per_trigger=1,
    )
    agg = session_counts(stream, gap=_SESS_GAP, lateness="1 day")
    sink = f"r8_sess_sink_{hashlib.md5(path.encode()).hexdigest()[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .where(F.col("user_id") >= 0)
        .select(
            F.date_format("s_start", "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format("s_end", "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "user_id",
            "n_events",
            "value_cents",
        )
    )


_SESS_STREAM_SQL = oracle_bigint(
    """
WITH flagged AS (
  SELECT user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS vc,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
), islands AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
       strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS s_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(SUM(vc) AS BIGINT) AS value_cents
FROM islands
GROUP BY user_id, sid
""",
    "n_events",
    "value_cents",
)

ROUND8_QUERIES["streaming_session_oracle"] = (
    q_streaming_session_oracle,
    _SESS_STREAM_SQL,
)


# ---------------------------------------------------------------------------
# embedding_mutual_knn — mutual nearest neighbors inside LSH blocks
# ---------------------------------------------------------------------------


def q_embedding_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest-neighbor pairs over the embedding corpus: vector
    pairs that are each other's TOP-1 candidate — the high-precision
    alignment/dedup primitive (bitext mining, entity matching) that
    survives where one-directional kNN drags in hubs.

    Candidates come from the same OR-amplified hyperplane LSH blocking
    as the near-dup operator (equi-join on (table, bucket), never
    all-pairs); each vector ranks its candidates by the sequential-fold
    cosine (bit-identical in both engines) with the id breaking exact
    ties, and the mutual join keeps pairs where both directions picked
    each other.

    Scale design: candidate generation is the proven banded equi-join;
    the per-vector top-1 window partitions by vector id over candidate
    rows (bounded by bucket occupancy); the mutual check is an
    equi-join of two id-keyed single-row-per-id frames.  Nothing
    quadratic in the corpus anywhere.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.caching import scoped_persist
    from etl_portofolio_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    # 8-bit bucket keys (256 values), not the near-dup op's 2-bit ones:
    # mutual-top-1 only needs the true neighbor to SHARE a bucket, and
    # 2-bit keys at corpus scale make every bucket a quadratic hotspot
    # (the round-2 LSH lesson: 202 s -> ~2 s at sf0.1 from this knob).
    pairs = scoped_persist(
        similarity.embedding_near_dup_pairs(
            emb,
            threshold=-1.0,
            dim=64,
            num_planes=8,
            num_tables=6,
            # Arrow-vectorized sequential-fold cosine (bit-identical to
            # the expression form and the oracle's list_reduce): the
            # candidate volume here made interpreted HOFs the bottleneck
            # (r7 verdict item #5).
            cosine_fn=similarity.cosine_fold_pd,
        )
    )
    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    ).union(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    top1 = (
        directed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("src", "dst", "cosine")
    )
    a, b = top1.alias("a"), top1.alias("b")
    return (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.src"))
            & (F.col("b.dst") == F.col("a.src"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .select(
            F.col("a.src").alias("id_a"),
            F.col("a.dst").alias("id_b"),
            F.col("a.cosine").alias("cosine"),
        )
        .orderBy("id_a")
    )


def _sql_mutual_knn() -> str:
    from etl_portofolio_spark.operators import similarity
    from etl_portofolio_spark.plans.pipeline_queries import (
        _SQL_DOT,
        _sql_cosine,
    )

    planes_all = similarity.hyperplane_matrix(48, 64)
    values = ", ".join(
        f"({r // 8}, {r % 8}, {[float(w) for w in planes_all[r]]})"
        for r in range(48)
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), planes(t, plane_id, w) AS (
  SELECT * FROM (VALUES {values})
), bucketed AS (
  SELECT v.vec_id, v.v, planes.t,
         CAST(sum(CASE WHEN {_SQL_DOT.format(a='v.v', b='planes.w')} > 0
                  THEN 1 << plane_id ELSE 0 END) AS BIGINT) AS b
  FROM v, planes GROUP BY v.vec_id, v.v, planes.t
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         {_sql_cosine('a.v', 'b.v')} AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id
), directed AS (
  SELECT id_a AS src, id_b AS dst, cosine FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst, cosine FROM cand
), top1 AS (
  SELECT src, dst, cosine FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src
      ORDER BY cosine DESC, dst ASC) AS rk
    FROM directed
  ) WHERE rk = 1
)
SELECT a.src AS id_a, a.dst AS id_b, a.cosine AS cosine
FROM top1 a JOIN top1 b
  ON a.dst = b.src AND b.dst = a.src AND a.src < b.src
ORDER BY id_a
"""


ROUND8_QUERIES["embedding_mutual_knn"] = (
    q_embedding_mutual_knn,
    _sql_mutual_knn(),
)


# ---------------------------------------------------------------------------
# partition_evolution_union — reading across a partition-layout migration
# ---------------------------------------------------------------------------

_EVO_SPLIT = "2024-01-16 00:00:00"  # old layout before, new layout after


def q_partition_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One logical table across a partition-layout migration: the old
    generation is a flat unpartitioned parquet dir (ds only derivable
    from the timestamp), the new generation is ``ds=``-partitioned —
    the exact mid-migration state every lakehouse table passes through
    when retrofitting partitioning.  The query reads both generations,
    normalizes the schema (deriving ds for old rows, reading it from
    the directory key for new rows), unions by NAME, and answers a
    daily rollup that spans the migration boundary.

    Scale design: the new generation's daily reads prune on the ds
    directory key; the old generation is scanned once (that is the
    migration's cost, and why backfills rewrite it eventually).  The
    union is a plan-level concat — no shuffle beyond the rollup's own.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.fixtures import ensure_fixture

    def _build(tmp: str) -> None:
        import os

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value"
        )
        cut = F.lit(_EVO_SPLIT).cast("timestamp")
        ev.where(F.col("ts") < cut).coalesce(4).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "gen1"))
        (
            ev.where(F.col("ts") >= cut)
            .withColumn("ds", F.date_format("ts", "yyyyMMdd"))
            .repartition(8, "ds")
            .write.mode("overwrite")
            .partitionBy("ds")
            .parquet(os.path.join(tmp, "gen2"))
        )

    def _ready(p: str) -> bool:
        import os

        return os.path.isdir(os.path.join(p, "gen1")) and any(
            d.startswith("ds=")
            for d in (
                os.listdir(os.path.join(p, "gen2"))
                if os.path.isdir(os.path.join(p, "gen2"))
                else []
            )
        )

    path = ensure_fixture(sf_dir, "events_partition_evolution", _build, ready=_ready)
    old = (
        spark.read.parquet(f"{path}/gen1")
        .withColumn("ds", F.date_format("ts", "yyyyMMdd"))
    )
    new = spark.read.parquet(f"{path}/gen2")  # ds from the directory key
    both = old.unionByName(new.select(*old.columns))
    return (
        both.groupBy("ds")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents"
            ),
        )
        .orderBy("ds")
    )


_EVO_SQL = oracle_bigint(
    """
SELECT strftime(ts, '%Y%m%d') AS ds,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       SUM(CAST(round(value * 100, 0) AS BIGINT)) AS value_cents
FROM events GROUP BY 1 ORDER BY 1
""",
    "n_events",
    "n_users",
    "value_cents",
)

ROUND8_QUERIES["partition_evolution_union"] = (
    q_partition_evolution_union,
    _EVO_SQL,
)


# ---------------------------------------------------------------------------
# weighted_shortest_path — bounded-round Bellman-Ford, integer weights
# ---------------------------------------------------------------------------

_WSP_ROUNDS = 3
# Sparsification threshold min_co = n_baskets*4 // 1000 + 1, kept in
# INTEGER arithmetic on BOTH engines (r7 ADVICE): the previous float
# form diverged — Python int(n*0.004) truncates while DuckDB
# CAST(n*0.004 AS BIGINT) rounds to nearest, so any n with
# frac(n*0.004) >= 0.5 filtered different edge sets.
_WSP_MIN_CO_NUM, _WSP_MIN_CO_DEN = 4, 1000


def q_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path distances from the lexicographically
    first brand over the strong co-purchase graph, edge weight =
    ``1000000 div co`` (stronger ties are cheaper) — the relaxation
    counterpart of `brand_bfs_hops`: BFS proves frontier expansion,
    this proves VALUE iteration (a path of two strong edges can beat
    one weak edge, so min-dist is not hop count).

    Three unrolled Bellman-Ford rounds: dist_{k+1} = min(dist_k,
    min over edges(dist_k[src] + w)) — each an equi-join on the brand
    key plus a min-aggregation, localCheckpointed per round so the
    plan does not double (the PCA lesson).  The oracle replays the
    SAME three rounds as unrolled CTEs — not a recursive CTE, because
    Bellman-Ford must re-relax already-seen nodes, which UNION-based
    recursion cannot express directly.  Integer weights make min()
    deterministic in both engines.

    The sparsification threshold and the seed brand are 1-row FRAMES
    folded into the plan via broadcast cross-joins (r7 verdict item #4)
    — zero scalar driver actions; the only driver-side jobs are the
    three per-round localCheckpoints, which are the iteration hygiene.

    Scale design: each round shuffles frontier x degree rows keyed on
    brand; state is domain-bounded (brands).  At a billion-node graph
    the same loop runs with the distance frame disk-backed — the
    structure is Pregel's, expressed in joins.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.caching import scoped_persist

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Per-order SORTED distinct-brand sets: ONE fact-scale shuffle (on
    # the order key) replaces the former distinct + self-join pair of
    # fact-scale shuffles — co-purchase pairs then expand MAP-SIDE from
    # each tiny set (<= 7 lineitems/order => <= 7 brands). The sorted
    # array is materialized as a column BEFORE the pair lambda reads it
    # (the interpreted-HOF rule: never re-evaluate an expression tree
    # per element position).
    from etl_portofolio_spark.operators.util import spread_by

    # spread_by(l_orderkey): the sf fixture is one parquet row group, so
    # the scan is ONE task and the broadcast-join probe + collect_set
    # partial aggregation of the whole fact table serialized on it
    # (measured 0.9 s single-task stage). One keyed exchange at the
    # scan spreads everything downstream across cores and already
    # satisfies the groupBy's distribution; no-op at production split
    # counts.
    sets = scoped_persist(
        spread_by(li, "l_orderkey")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("sb"))
    )
    # 1-row max-weight threshold frame: w_max = 1000000 div min_co,
    # min_co = n*NUM div DEN + 1 in pure BIGINT arithmetic.
    w_max = sets.agg(F.count(F.lit(1)).alias("n")).select(
        F.expr(
            f"1000000 div (n * {_WSP_MIN_CO_NUM} div {_WSP_MIN_CO_DEN} + 1)"
        ).alias("w_max")
    )
    pair_expr = (
        "flatten(transform(sb, (x, i) -> "
        "transform(slice(sb, i + 2, size(sb)), "
        "y -> struct(x AS src, y AS dst))))"
    )
    # persist the PAIR CENSUS, not the undirected union built from it:
    # the union's two branches are separate plan subtrees (Spark does no
    # cross-branch CSE), so persisting only the union ran the map-side
    # pair expansion + census aggregation TWICE — measured as the two
    # dominant stages of the query (10.8 s + 10.6 s executor time of a
    # 34 s total at sf0.1; r10 stage profile). The census output is
    # domain-bounded (≤ C(|brands|, 2) rows), so this persist is tiny at
    # any corpus scale while the saved expansion pass is fact-scale.
    und = scoped_persist(
        sets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.expr("1000000 div count(1)").cast("long").alias("w"))
        .join(F.broadcast(w_max))
        .where(F.col("w") <= F.col("w_max"))
        .drop("w_max")
    )
    edges = und.select("src", "dst", "w").unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    dist = sets.agg(
        F.min(F.element_at("sb", 1)).alias("brand")
    ).select("brand", F.lit(0).cast("long").alias("dist_w"))
    for _ in range(_WSP_ROUNDS):
        relaxed = (
            # edges is domain-bounded (≤ 2·C(|brands|,2) rows at any
            # corpus size) — broadcast it explicitly so the relaxation
            # never plans a shuffle join off the cached union's unknown
            # estimate (measured: 65-task shuffle-join stages per round)
            dist.join(F.broadcast(edges), dist["brand"] == edges["src"])
            .select(
                F.col("dst").alias("brand"),
                (F.col("dist_w") + F.col("w")).alias("dist_w"),
            )
            .unionAll(dist)
            .groupBy("brand")
            .agg(F.min("dist_w").alias("dist_w"))
        )
        # coalesce(1) before the checkpoint: the distance frame is
        # domain-bounded (≤ |brands| rows at ANY corpus size), but a
        # checkpoint inherits the union's full partitioning — measured
        # 65-task stages per relaxation round whose executor time was
        # pure scheduling overhead (r10 stage profile). One partition
        # keeps every round's join + re-aggregation a 1-task stage.
        # (A fully LAZY 3-round unroll — checkpoint only the seed — was
        # A/B'd and is ~1.8x SLOWER: each round references dist twice,
        # so the un-cut plan re-evaluates earlier rounds 2^k times,
        # rebuilding their broadcasts and exchanges per reference.)
        dist = relaxed.coalesce(1).localCheckpoint()
    return dist.orderBy("brand")


def _wsp_oracle() -> str:
    rounds = []
    prev = "d0"
    for k in range(1, _WSP_ROUNDS + 1):
        rounds.append(
            f"""d{k} AS (
  SELECT brand, MIN(dist_w) AS dist_w FROM (
    SELECT e.dst AS brand, {prev}.dist_w + e.w AS dist_w
    FROM {prev} JOIN edges e ON e.src = {prev}.brand
    UNION ALL
    SELECT brand, dist_w FROM {prev}
  ) GROUP BY brand
)"""
        )
        prev = f"d{k}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), nb AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
), und AS (
  SELECT a.p_brand AS src, b.p_brand AS dst,
         1000000 // COUNT(*) AS w
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING 1000000 // COUNT(*)
         <= 1000000 // ((SELECT n FROM nb) * {_WSP_MIN_CO_NUM} // {_WSP_MIN_CO_DEN} + 1)
), edges AS (
  SELECT src, dst, w FROM und UNION ALL SELECT dst, src, w FROM und
), d0 AS (
  SELECT (SELECT MIN(p_brand) FROM baskets) AS brand, CAST(0 AS BIGINT) AS dist_w
),
{rounds_sql}
SELECT brand, CAST(dist_w AS BIGINT) AS dist_w FROM {prev} ORDER BY brand
"""


ROUND8_QUERIES["weighted_shortest_path"] = (
    q_weighted_shortest_path,
    _wsp_oracle(),
)


# ---------------------------------------------------------------------------
# rake_keyword_extraction — degree/frequency keyword scores
# ---------------------------------------------------------------------------

_RAKE_TOP = 20


def q_rake_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyword scoring over the corpus: phrases are maximal
    stopword-free token runs, a word's degree is the summed length of
    every phrase it appears in, and score = degree/frequency favors
    words that live in long multi-word phrases — the classic
    model-free keyword extractor, run corpus-wide.

    Emits the top-20 words by the exact rational score (ranked via
    ``(1000 * deg) div freq`` with the word breaking ties) plus the
    integer deg/freq evidence.  Stopwords are the embedded ``en`` list
    (lexicon quality is not the contract; the machinery is).

    Scale design: tokenize + position explode map-side; the phrase-id
    assignment is a running count of stopword boundaries — a window
    PARTITIONED BY doc (parallel key), the same shape as the span-
    dedup islands; phrase lengths and word stats are two combinable
    aggregations.  The top-20 is a TakeOrderedAndProject.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.operators.text import LANG_STOPWORDS, tokens

    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
        .where(F.col("tok") != "")
        .withColumn("is_stop", F.array_contains(stop, F.col("tok")))
    )
    wd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    phrased = (
        pos.withColumn(
            "pid", F.sum(F.col("is_stop").cast("int")).over(wd)
        )
        .where(~F.col("is_stop"))
        .select("doc_id", "pid", "tok")
    )
    plen = phrased.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("plen")
    )
    return (
        phrased.join(plen, ["doc_id", "pid"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn(
            "score_permille", F.expr("(1000 * deg) div freq").cast("long")
        )
        .orderBy(F.col("score_permille").desc(), F.col("tok").asc())
        .limit(_RAKE_TOP)
    )


def _rake_oracle() -> str:
    from etl_portofolio_spark.operators.text import LANG_STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH toked AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
), pos AS (
  SELECT doc_id, u.i AS pos, toks[u.i] AS tok,
         toks[u.i] IN ({stoplist}) AS is_stop
  FROM toked, LATERAL unnest(generate_series(1, len(toks))) AS u(i)
  WHERE toks[u.i] <> ''
), phrased AS (
  SELECT doc_id, tok,
         SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS pid,
         is_stop
  FROM pos
), words AS (
  SELECT doc_id, pid, tok FROM phrased WHERE NOT is_stop
), plen AS (
  SELECT doc_id, pid, COUNT(*) AS plen FROM words GROUP BY 1, 2
)
SELECT w.tok, COUNT(*) AS freq, SUM(p.plen) AS deg,
       (1000 * SUM(p.plen)) // COUNT(*) AS score_permille
FROM words w JOIN plen p ON w.doc_id = p.doc_id AND w.pid = p.pid
GROUP BY w.tok
ORDER BY score_permille DESC, tok ASC
LIMIT {_RAKE_TOP}
"""


ROUND8_QUERIES["rake_keyword_extraction"] = (
    q_rake_keyword_extraction,
    oracle_bigint(_rake_oracle(), "freq", "deg", "score_permille"),
)


# ---------------------------------------------------------------------------
# stratified_ate_estimate — stratified average treatment effect
# ---------------------------------------------------------------------------


def q_stratified_ate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimate: treatment =
    urgent order priority, outcome = order value in cents, strata =
    the customer's market segment — the discrete-covariate special
    case where inverse-propensity weighting collapses to the exact
    stratification identity ATE = sum_s (n_s / n) * (mean1_s -
    mean0_s).  Per-stratum means and diffs by integer ``div``; the
    pooled ATE cross-multiplies the stratum weights so no float
    propensity ever exists.

    Scale design: one broadcast dim join (customer -> segment), one
    combinable aggregation to the 5-stratum panel; everything after is
    5-row arithmetic.  This is the causal-analysis twin of the CUPED
    and diff-in-diff entries.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    panel = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("stratum"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("t"),
            cents("o_totalprice").alias("y_c"),
        )
        .groupBy("stratum")
        .agg(
            F.sum("t").cast("long").alias("n1"),
            F.sum(1 - F.col("t")).cast("long").alias("n0"),
            F.sum(F.col("t") * F.col("y_c")).cast("long").alias("sum1_c"),
            F.sum((1 - F.col("t")) * F.col("y_c")).cast("long").alias("sum0_c"),
        )
    )
    # bounded: stratum panel (bounded value domain)
    w = Window.partitionBy(F.lit(1))
    return (
        panel.withColumn(
            "diff_c",
            F.expr("sum1_c div n1 - sum0_c div n0").cast("long"),
        )
        .withColumn(
            "ate_c",
            # bounded: over () on the stratum panel (bounded value domain)
            F.expr(
                # bounded: same stratum panel
                "sum((n1 + n0) * (sum1_c div n1 - sum0_c div n0)) over ()"
                " div sum(n1 + n0) over ()"
            ).cast("long"),
        )
        .select("stratum", "n1", "n0", "diff_c", "ate_c")
        .orderBy("stratum")
    )


_ATE_SQL = oracle_bigint(
    """
WITH panel AS (
  SELECT c_mktsegment AS stratum,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END) AS n0,
         SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  ELSE 0 END) AS sum1_c,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0
                  ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  END) AS sum0_c
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT stratum, n1, n0,
       sum1_c // n1 - sum0_c // n0 AS diff_c,
       SUM((n1 + n0) * (sum1_c // n1 - sum0_c // n0)) OVER ()
         // SUM(n1 + n0) OVER () AS ate_c
FROM panel ORDER BY stratum
""",
    "n1",
    "n0",
    "diff_c",
    "ate_c",
)

ROUND8_QUERIES["stratified_ate_estimate"] = (
    q_stratified_ate_estimate,
    _ATE_SQL,
)


# ---------------------------------------------------------------------------
# lateral_topk_per_nation — correlated LATERAL subquery surface
# ---------------------------------------------------------------------------


def q_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by account balance expressed as a
    correlated LATERAL subquery (ORDER BY + LIMIT inside the lateral)
    — the SQL surface users reach for before they learn window
    functions, and one Spark must plan correctly: Catalyst rewrites
    the correlated limit into a partitioned rank filter, so the
    executed plan is the same shuffle a window top-k produces, not a
    per-nation re-scan.

    Scale design: after decorrelation this is one hash partition by
    nation key + per-group limit; the lateral FORM adds no execution
    cost over the window form (asserted in tests) — the point is API
    parity.
    """
    apply_runtime_confs(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("r8_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("r8_customer")
    return spark.sql(
        """
SELECT n.n_name, t.c_name, t.bal_c
FROM r8_nation n,
LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM r8_customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_c DESC, c_name ASC
  LIMIT 2
) t
ORDER BY n.n_name, t.bal_c DESC, t.c_name
"""
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.bal_c
FROM nation n,
LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_c DESC, c_name ASC
  LIMIT 2
) t
ORDER BY n.n_name, t.bal_c DESC, t.c_name
"""

ROUND8_QUERIES["lateral_topk_per_nation"] = (
    q_lateral_topk_per_nation,
    _LATERAL_SQL,
)


# ---------------------------------------------------------------------------
# ranking_overlap_curve — overlap@d between two retrieval rankings
# ---------------------------------------------------------------------------

_RANK_QUERY = ("table", "spark", "sort")
_RANK_K = 20


def q_ranking_overlap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement curve between two retrieval scorers over the same
    corpus and query — the eval that decides whether a cheaper ranker
    can replace an expensive one: overlap@d (shared docs among both
    top-d lists) for d = 1..20, in exact permille.

    Scorer A is raw query-term frequency; scorer B is df-weighted
    term frequency (tf * (1000000 div df)) — both pure integers, both
    tie-broken by doc_id, so the two rankings are bit-deterministic in
    either engine.  overlap@d comes from the rank-pair identity: a doc
    in both top-20s contributes to every d >= max(rank_a, rank_b), so
    the curve is a cumulative count over that max — no per-d list
    intersection.

    Scale design: term stats reduce map-side (query terms are a
    3-literal array filter); both top-20s are TakeOrderedAndProject;
    the curve math runs on a <= 20-row matched frame against a 20-row
    depth spine.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    qterms = F.array(*[F.lit(t) for t in _RANK_QUERY])
    tf = (
        docs.select(
            "doc_id", F.explode(tokens("text")).alias("tok")
        )
        .where(F.array_contains(qterms, F.col("tok")))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    from etl_portofolio_spark.caching import scoped_persist

    tf = scoped_persist(tf)
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    a_rank = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("score_a"))
        .orderBy(F.col("score_a").desc(), F.col("doc_id").asc())
        .limit(_RANK_K)
        .select(
            "doc_id",
            F.row_number()
            .over(
                # bounded: top-_RANK_K panel
                Window.orderBy(F.col("score_a").desc(), F.col("doc_id").asc())
            )
            .alias("ra"),
        )
    )
    b_rank = (
        tf.join(F.broadcast(df_t), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("tf * (1000000 div df)")).cast("long").alias("score_b")
        )
        .orderBy(F.col("score_b").desc(), F.col("doc_id").asc())
        .limit(_RANK_K)
        .select(
            "doc_id",
            F.row_number()
            .over(
                # bounded: top-_RANK_K panel
                Window.orderBy(F.col("score_b").desc(), F.col("doc_id").asc())
            )
            .alias("rb"),
        )
    )
    matched = a_rank.join(b_rank, "doc_id").select(
        F.greatest("ra", "rb").alias("m")
    )
    depths = spark.range(1, _RANK_K + 1).select(F.col("id").alias("d"))
    return (
        depths.join(F.broadcast(matched), F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("m").cast("long").alias("overlap"))
        .select(
            "d",
            "overlap",
            F.expr("(1000 * overlap) div d").cast("long").alias(
                "agreement_permille"
            ),
        )
        .orderBy("d")
    )


def _rank_overlap_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _RANK_QUERY)
    return f"""
WITH tf AS (
  SELECT doc_id, t.tok, COUNT(*) AS tf
  FROM documents,
       LATERAL unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(tok)
  WHERE t.tok IN ({terms})
  GROUP BY 1, 2
), df_t AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
), a_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_a DESC, doc_id ASC) AS ra
  FROM (SELECT doc_id, SUM(tf) AS score_a FROM tf GROUP BY 1)
  ORDER BY score_a DESC, doc_id ASC LIMIT {_RANK_K}
), b_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_b DESC, doc_id ASC) AS rb
  FROM (
    SELECT tf.doc_id, SUM(tf.tf * (1000000 // d.df)) AS score_b
    FROM tf JOIN df_t d ON tf.tok = d.tok GROUP BY 1
  )
  ORDER BY score_b DESC, doc_id ASC LIMIT {_RANK_K}
), matched AS (
  SELECT GREATEST(a.ra, b.rb) AS m
  FROM a_rank a JOIN b_rank b ON a.doc_id = b.doc_id
), depths AS (
  SELECT UNNEST(generate_series(1, {_RANK_K})) AS d
)
SELECT d,
       (SELECT COUNT(*) FROM matched WHERE m <= d) AS overlap,
       (1000 * (SELECT COUNT(*) FROM matched WHERE m <= d)) // d
         AS agreement_permille
FROM depths ORDER BY d
"""


ROUND8_QUERIES["ranking_overlap_curve"] = (
    q_ranking_overlap_curve,
    oracle_bigint(_rank_overlap_oracle(), "d", "overlap", "agreement_permille"),
)


# ---------------------------------------------------------------------------
# nelson_aalen_hazard — cumulative hazard, the KM curve's twin
# ---------------------------------------------------------------------------


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for time from order placement to
    first returned shipment — the estimator survival pipelines use
    when they need the HAZARD scale (additive, comparable across
    cohorts) rather than KM's survival product.  Same right-censoring
    setup as `km_time_to_return`: return-free orders censor at the
    corpus' last ship date.

    Per event time: risk set n, events d, and the cumulative hazard as
    a running sum of integer permicro terms ``(1000000 * d) div n`` —
    a DEFINED integer algorithm (identical in both engines, no float
    summation order anywhere), which brackets the real Σ d/n within
    1e-6 per term.

    Scale design: identical to KM — everything after the first-return
    collapse runs on the calendar-bounded duration frame.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("odate")
    )
    li = load_table(spark, sf_dir, "lineitem")
    first_ret = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.min(F.to_date("l_shipdate")).alias("ret_date"))
    )
    gmax = li.agg(F.max(F.to_date("l_shipdate")).alias("gmax_date"))
    per_order = (
        orders.join(first_ret, orders.o_orderkey == first_ret.l_orderkey, "left")
        .crossJoin(F.broadcast(gmax))
        .select(
            F.when(
                F.col("ret_date").isNotNull(), F.datediff("ret_date", "odate")
            )
            .otherwise(F.datediff("gmax_date", "odate"))
            .alias("dur"),
            F.col("ret_date").isNotNull().cast("int").alias("observed"),
        )
    )
    at_dur = per_order.groupBy("dur").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    w_after = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    return (
        at_dur.withColumn(
            "n",
            F.sum("leaving").over(tot)
            - F.coalesce(F.sum("leaving").over(w_after), F.lit(0)),
        )
        .withColumn("h_term", F.expr("(1000000 * d) div n").cast("long"))
        .withColumn(
            "cum_hazard_permicro",
            F.sum("h_term").over(w_cum).cast("long"),
        )
        .where(F.col("d") > 0)
        .select("dur", "n", "d", "cum_hazard_permicro")
        .orderBy("dur")
    )


_NA_SQL = oracle_bigint(
    """
WITH first_ret AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ret_date
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
), gmax AS (
  SELECT MAX(CAST(l_shipdate AS DATE)) AS gmax_date FROM lineitem
), per_order AS (
  SELECT CASE WHEN r.ret_date IS NOT NULL
              THEN datediff('day', CAST(o.o_orderdate AS DATE), r.ret_date)
              ELSE datediff('day', CAST(o.o_orderdate AS DATE),
                            (SELECT gmax_date FROM gmax)) END AS dur,
         CASE WHEN r.ret_date IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM orders o LEFT JOIN first_ret r ON o.o_orderkey = r.l_orderkey
), at_dur AS (
  SELECT dur, SUM(observed) AS d, COUNT(*) AS leaving
  FROM per_order GROUP BY dur
), risk AS (
  SELECT dur, d, leaving,
         SUM(leaving) OVER () -
         COALESCE(SUM(leaving) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
  FROM at_dur
), terms AS (
  SELECT dur, n, d, (1000000 * d) // n AS h_term
  FROM risk
)
SELECT dur, n, d,
       SUM(h_term) OVER (ORDER BY dur
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cum_hazard_permicro
FROM terms
QUALIFY d > 0
ORDER BY dur
""",
    "dur",
    "n",
    "d",
    "cum_hazard_permicro",
)

ROUND8_QUERIES["nelson_aalen_hazard"] = (q_nelson_aalen_hazard, _NA_SQL)


# ---------------------------------------------------------------------------
# order_fill_rate_sla — first-shipment SLA attainment by month
# ---------------------------------------------------------------------------

_SLA_DAYS = 30


def q_order_fill_rate_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly SLA attainment: the share of orders whose FIRST
    shipment left within 30 days of placement — the fill-rate /
    on-time KPI every operations rollup carries.  First-event-per-
    group, threshold flag, share in exact permille; orders with no
    shipments at all count against the SLA (the honest denominator).

    Scale design: the first-shipment collapse is one combinable
    aggregation on the order key; the month rollup keys on the
    calendar.  A left join keeps shipmentless orders in the
    denominator — an inner join would silently inflate attainment.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("odate"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    first_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.to_date("l_shipdate")).alias("sdate"))
    )
    return (
        orders.join(
            first_ship, orders.o_orderkey == first_ship.l_orderkey, "left"
        )
        .select(
            "month",
            F.when(
                F.col("sdate").isNotNull()
                & (F.datediff("sdate", "odate") <= _SLA_DAYS),
                1,
            )
            .otherwise(0)
            .alias("met"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("met").cast("long").alias("n_met"),
        )
        .withColumn(
            "sla_permille",
            F.expr("(1000 * n_met) div n_orders").cast("long"),
        )
        .orderBy("month")
    )


_SLA_SQL = oracle_bigint(
    f"""
WITH first_ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS sdate
  FROM lineitem GROUP BY 1
), flagged AS (
  SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
         CASE WHEN s.sdate IS NOT NULL
                   AND datediff('day', CAST(o.o_orderdate AS DATE), s.sdate)
                       <= {_SLA_DAYS}
              THEN 1 ELSE 0 END AS met
  FROM orders o LEFT JOIN first_ship s ON o.o_orderkey = s.l_orderkey
)
SELECT month, COUNT(*) AS n_orders, SUM(met) AS n_met,
       (1000 * SUM(met)) // COUNT(*) AS sla_permille
FROM flagged GROUP BY month ORDER BY month
""",
    "n_orders",
    "n_met",
    "sla_permille",
)

ROUND8_QUERIES["order_fill_rate_sla"] = (q_order_fill_rate_sla, _SLA_SQL)


# ---------------------------------------------------------------------------
# streaming_interval_join_oracle — FIFTH real streaming run: stream-stream
# ---------------------------------------------------------------------------


def q_streaming_interval_join_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join executed for real inside the gate —
    the fifth genuine streaming run, and the one that exercises
    DOUBLE-SIDED join state: clicks and purchases arrive as two
    independent file-source streams (each time-ordered, mtime-pinned),
    and every purchase must find the same user's clicks from the
    preceding 10 minutes even when the sides land in different
    micro-batches.  The range bound in the condition is what lets
    Spark expire click state (clicks older than purchase-watermark
    minus the window drop out of the store) — the plan is built by the
    SAME ``time_bounded_join`` function as the oracle-checked batch
    twin ``time_bounded_attribution``.

    Inner-join results emit as matches arrive (append mode needs no
    watermark wait for inner joins), so no sentinel is needed; the
    30-minute lateness ≥ the 10-minute window guarantees no state is
    evicted before its cross-batch partner can arrive on these ordered
    files.

    100 TB: this is the production attribution shape — two keyed
    streams, bounded state, availableNow catch-up.
    """
    apply_runtime_confs(spark)
    import hashlib
    import os

    from etl_portofolio_spark.fixtures import ensure_fixture
    from etl_portofolio_spark.streaming.structured import (
        read_file_stream,
        time_bounded_join,
    )

    def _build(tmp: str) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        (
            ev.where(F.col("event_type") == "click")
            .repartitionByRange(2, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "clicks"))
        )
        (
            ev.where(F.col("event_type") == "purchase")
            .coalesce(1)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "purchases"))
        )
        base = 1_700_000_000
        for sub in ("clicks", "purchases"):
            parts = sorted(
                f
                for f in os.listdir(os.path.join(tmp, sub))
                if f.endswith(".parquet")
            )
            for i, f in enumerate(parts):
                t = base + 60 * i
                os.utime(os.path.join(tmp, sub, f), (t, t))

    def _ready(p: str) -> bool:
        import os as _os

        return all(
            _os.path.isdir(_os.path.join(p, s))
            and any(
                f.endswith(".parquet")
                for f in _os.listdir(_os.path.join(p, s))
            )
            for s in ("clicks", "purchases")
        )

    path = ensure_fixture(sf_dir, "events_stream_cp", _build, ready=_ready)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    clicks = read_file_stream(
        spark, f"{path}/clicks", schema=schema, max_files_per_trigger=1
    )
    purchases = read_file_stream(
        spark, f"{path}/purchases", schema=schema, max_files_per_trigger=1
    )
    joined = time_bounded_join(
        clicks, purchases, window_minutes=10, lateness="30 minutes"
    )
    sink = f"r8_ssj_sink_{hashlib.md5(path.encode()).hexdigest()[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        "user_id",
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts"),
    )


_SSJ_SQL = """
SELECT p.user_id AS user_id,
       p.event_id AS purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       c.event_id AS click_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL '10 minutes'
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

ROUND8_QUERIES["streaming_interval_join_oracle"] = (
    q_streaming_interval_join_oracle,
    _SSJ_SQL,
)


# ---------------------------------------------------------------------------
# malformed_json_quarantine — dead-letter accounting on a dirty feed
# ---------------------------------------------------------------------------

_DIRTY_MOD = 7  # event_id % 7 == 0 rows are corrupted in the fixture


def q_malformed_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue accounting over a deliberately dirty JSON
    feed: a content-keyed fixture corrupts the ``props`` payload of
    every 7th event (truncated JSON), and the reader must parse with
    ``from_json``, quarantine unparseable rows instead of failing the
    job, and report per-type good/bad counts plus the aggregate of the
    parsed field over GOOD rows only — the permissive-ingest contract
    every production feed needs (one malformed record must never kill
    a 100 TB backfill).

    The oracle recomputes from the CLEAN source by applying the same
    corruption rule arithmetically — so a parser that silently
    accepts the truncated payload (or quarantines a valid one) fails
    the hash.

    Scale design: parse + null-check are map-side; the rollup keys on
    event types.  One scan, one small shuffle.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.fixtures import ensure_fixture

    def _build(tmp: str) -> None:
        src = load_table(spark, sf_dir, "events")
        # Fixture invariant the gate depends on (r7 ADVICE): every CLEAN
        # props must parse to a non-null BIGINT k, or the plan's
        # parse-keyed `bad` and the oracle's rule-keyed `bad` diverge.
        # Asserted here at build time so a fixture change fails loudly
        # instead of silently flipping the differential.
        n_bad_clean = (
            src.where(F.col("event_id") % _DIRTY_MOD != 0)
            .where(F.from_json("props", "k BIGINT")["k"].isNull())
            .count()
        )
        if n_bad_clean:
            raise ValueError(
                f"events fixture broke the quarantine invariant: "
                f"{n_bad_clean} clean rows lack an integer props.k"
            )
        ev = src.select(
            "event_id",
            "event_type",
            F.when(
                F.col("event_id") % _DIRTY_MOD == 0, F.lit('{"k": ')
            )
            .otherwise(F.col("props"))
            .alias("props"),
        )
        ev.coalesce(4).write.mode("overwrite").parquet(tmp)

    def _ready(p: str) -> bool:
        import os

        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    path = ensure_fixture(sf_dir, "events_dirty_json", _build, ready=_ready)
    # k BIGINT, matching the oracle's CAST(... AS BIGINT): an INT parse
    # would quarantine a valid row whose k exceeds INT32 range.
    df = spark.read.parquet(path).withColumn(
        "parsed", F.from_json("props", "k BIGINT")
    )
    return (
        df.select(
            "event_type",
            F.when(
                F.col("parsed").isNull() | F.col("parsed.k").isNull(), 1
            )
            .otherwise(0)
            .alias("bad"),
            F.coalesce(F.col("parsed.k"), F.lit(0)).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bad").cast("long").alias("n_quarantined"),
            F.sum(F.when(F.col("bad") == 0, F.col("k")).otherwise(0))
            .cast("long")
            .alias("sum_k_good"),
        )
        .withColumn(
            "bad_permille",
            F.expr("(1000 * n_quarantined) div n").cast("long"),
        )
        .orderBy("event_type")
    )


_DLQ_SQL = oracle_bigint(
    f"""
SELECT event_type, COUNT(*) AS n,
       SUM(CASE WHEN event_id % {_DIRTY_MOD} = 0 THEN 1 ELSE 0 END)
         AS n_quarantined,
       SUM(CASE WHEN event_id % {_DIRTY_MOD} <> 0
                THEN CAST(json_extract(props, '$.k') AS BIGINT)
                ELSE 0 END) AS sum_k_good,
       (1000 * SUM(CASE WHEN event_id % {_DIRTY_MOD} = 0 THEN 1 ELSE 0 END))
         // COUNT(*) AS bad_permille
FROM events GROUP BY event_type ORDER BY event_type
""",
    "n",
    "n_quarantined",
    "sum_k_good",
    "bad_permille",
)

ROUND8_QUERIES["malformed_json_quarantine"] = (
    q_malformed_json_quarantine,
    _DLQ_SQL,
)


# ---------------------------------------------------------------------------
# dau_mau_stickiness — rolling 30-day distinct actives per day
# ---------------------------------------------------------------------------

_MAU_WINDOW = 30


def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / MAU / stickiness per observed day — the engagement
    headline metric.  MAU(d) counts distinct users active in the
    trailing 30 days; a naive per-day recount is 30 scans, a
    count-distinct window is unsupported, so the scalable identity is
    COVERAGE EXPLODE: each distinct (user, active_day) contributes
    membership to the next 30 days map-side, a (user, covered_day)
    dedup collapses multi-activity, and one groupBy counts — constant
    30x blowup of the (already reduced) user-day frame, one shuffle.
    DuckDB has no sequence-explode idiom for this, so the oracle
    states the same set as a range join — two different algorithms,
    one answer.

    Emitted only for OBSERVED days (days with any event), stickiness
    in exact permille.
    """
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    from etl_portofolio_spark.caching import scoped_persist

    ud = scoped_persist(ud)
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), _MAU_WINDOW - 1),
                )
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    return (
        dau.join(cover, "day")  # inner: only observed days emit
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.expr("(1000 * dau) div mau").cast("long").alias(
                "stickiness_permille"
            ),
        )
        .orderBy("day")
    )


_DAU_SQL = oracle_bigint(
    f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1
), mau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
  FROM (SELECT DISTINCT day FROM ud) d
  JOIN ud u
    ON u.day BETWEEN d.day - INTERVAL {_MAU_WINDOW - 1} DAY AND d.day
  GROUP BY 1
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
       (1000 * dau.dau) // mau.mau AS stickiness_permille
FROM dau JOIN mau ON dau.day = mau.day
ORDER BY day
""",
    "dau",
    "mau",
    "stickiness_permille",
)

ROUND8_QUERIES["dau_mau_stickiness"] = (q_dau_mau_stickiness, _DAU_SQL)


# ---------------------------------------------------------------------------
# session_funnel_ordered — strictly-ordered view->click->purchase funnel
# ---------------------------------------------------------------------------

_FUNNEL_GAP = "30 minutes"


def q_session_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ORDERED funnel within behavioral sessions: a session
    converts a step only if the event happens AFTER the previous
    step's first occurrence (view, then click, then purchase) — the
    semantics product funnels actually need, where a purchase before
    any view must not count.  Unordered "session contains all three"
    overcounts; this is the sequential-min composition.

    The step timestamps are STACKED WINDOWS over the session key —
    ``first_view = min(view struct) over sid``, then ``first_click =
    min(click struct > first_view) over sid`` reading the previous
    window's column — so the whole funnel is one shuffle to the
    session key, two Window nodes on that same partitioning, a
    groupBy(sid) that reuses it (no extra exchange), and a 1-row
    rollup.  The former 3-groupBy + 2-join form measured 2.36 s at
    sf0.1; this is 1.04 s (min of passes, equal load), identical
    results.  Sessionization is the same >= 30-minute-gap islands
    convention as the streaming session oracle; ties on the boundary
    resolve by (second, event_id) never by raw sub-second timestamps.

    Scale design: islands window partitions by user (parallel key);
    everything after keys on session id (uniform); the output is one
    row and no fact row crosses more than two exchanges.
    """
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("tsec"),
        "event_id",
    )
    wu = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    sess = (
        ev.withColumn("prev", F.lag("tsec").over(wu))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.col("tsec") - F.col("prev") >= 1800),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.concat_ws(
                ":",
                F.col("user_id"),
                F.sum("new_s").over(
                    wu.rowsBetween(Window.unboundedPreceding, 0)
                ),
            ),
        )
        .select("sid", "event_type", "tsec", "event_id")
    )
    # Stacked windows on the session key (zero joins, zero driver
    # actions): first_view is a whole-partition min; first_click reads
    # it from the same partitioning; the groupBy(sid) reuses the window
    # exchange. The permille ratios use `div nullif` so an empty step
    # yields NULL exactly as the oracle's `// NULLIF(...)` does.
    wsid = Window.partitionBy("sid")
    st = F.struct("tsec", "event_id")
    stepped = sess.withColumn(
        "first_v",
        F.min(F.when(F.col("event_type") == "view", st)).over(wsid),
    ).withColumn(
        "first_c",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (st > F.col("first_v")),
                st,
            )
        ).over(wsid),
    )
    flags = stepped.groupBy("sid").agg(
        F.max(F.col("first_v").isNotNull().cast("int")).alias("hv"),
        F.max(F.col("first_c").isNotNull().cast("int")).alias("hc"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (st > F.col("first_c"))
            ).cast("int")
        ).alias("hp"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("hv").cast("long").alias("n_view"),
        F.sum("hc").cast("long").alias("n_click"),
        F.sum("hp").cast("long").alias("n_purchase"),
    ).select(
        "n_sessions",
        "n_view",
        "n_click",
        "n_purchase",
        F.expr("1000 * n_click div nullif(n_view, 0)").alias(
            "click_after_view_permille"
        ),
        F.expr("1000 * n_purchase div nullif(n_click, 0)").alias(
            "purchase_after_click_permille"
        ),
    )


_FUNNEL_SQL = oracle_bigint(
    """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_id
  FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(tsec) OVER w IS NULL
                      OR tsec - lag(tsec) OVER w >= 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
), sess AS (
  SELECT user_id || ':' || SUM(new_s) OVER (PARTITION BY user_id
           ORDER BY tsec, event_id ROWS UNBOUNDED PRECEDING) AS sid,
         event_type, tsec, event_id
  FROM flagged
), t_view AS (
  SELECT sid, MIN(ROW(tsec, event_id)) AS v
  FROM sess WHERE event_type = 'view' GROUP BY sid
), t_click AS (
  SELECT s.sid, MIN(ROW(s.tsec, s.event_id)) AS c
  FROM sess s JOIN t_view tv ON s.sid = tv.sid
  WHERE s.event_type = 'click' AND ROW(s.tsec, s.event_id) > tv.v
  GROUP BY s.sid
), t_purchase AS (
  SELECT s.sid
  FROM sess s JOIN t_click tc ON s.sid = tc.sid
  WHERE s.event_type = 'purchase' AND ROW(s.tsec, s.event_id) > tc.c
  GROUP BY s.sid
)
SELECT (SELECT COUNT(DISTINCT sid) FROM sess) AS n_sessions,
       (SELECT COUNT(*) FROM t_view) AS n_view,
       (SELECT COUNT(*) FROM t_click) AS n_click,
       (SELECT COUNT(*) FROM t_purchase) AS n_purchase,
       (1000 * (SELECT COUNT(*) FROM t_click))
         // NULLIF((SELECT COUNT(*) FROM t_view), 0)
         AS click_after_view_permille,
       (1000 * (SELECT COUNT(*) FROM t_purchase))
         // NULLIF((SELECT COUNT(*) FROM t_click), 0)
         AS purchase_after_click_permille
""",
    "n_sessions",
    "n_view",
    "n_click",
    "n_purchase",
    "click_after_view_permille",
    "purchase_after_click_permille",
)

ROUND8_QUERIES["session_funnel_ordered"] = (
    q_session_funnel_ordered,
    _FUNNEL_SQL,
)


# ---------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue per cohort-age
# ---------------------------------------------------------------------------


def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curve by acquisition cohort: customers
    cohort by their FIRST order month, and each cohort reports
    cumulative revenue per month-age — the payback-period table every
    growth model reads.  Emitted for ages 0..5 as integer cents plus
    per-customer cumulative LTV (cents div cohort size).

    Scale design: first-order collapse is one combinable aggregation
    on the customer key; the (cohort, age) rollup is calendar-bounded;
    the cumulative window walks ages inside each cohort partition.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("cohort")
    )
    sized = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    aged = (
        orders.join(first, "o_custkey")
        .select(
            "cohort",
            (
                (
                    F.year("o_orderdate") * 12 + F.month("o_orderdate")
                )
                - (
                    F.substring("cohort", 1, 4).cast("int") * 12
                    + F.substring("cohort", 6, 2).cast("int")
                )
            ).alias("age"),
            cents("o_totalprice").alias("rev_c"),
        )
        .where(F.col("age") <= 5)
        .groupBy("cohort", "age")
        .agg(F.sum("rev_c").cast("long").alias("rev_c"))
    )
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        aged.withColumn("cum_rev_c", F.sum("rev_c").over(wc).cast("long"))
        .join(F.broadcast(sized), "cohort")
        .select(
            "cohort",
            F.col("age").cast("long").alias("age"),
            "rev_c",
            "cum_rev_c",
            "cohort_users",
            F.expr("cum_rev_c div cohort_users").cast("long").alias(
                "ltv_per_user_c"
            ),
        )
        .orderBy("cohort", "age")
    )


_LTV_SQL = oracle_bigint(
    """
WITH first AS (
  SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) AS cohort
  FROM orders GROUP BY 1
), sized AS (
  SELECT cohort, COUNT(*) AS cohort_users FROM first GROUP BY 1
), aged AS (
  SELECT f.cohort,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))
         - (CAST(substr(f.cohort, 1, 4) AS INT) * 12
            + CAST(substr(f.cohort, 6, 2) AS INT)) AS age,
         SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS rev_c
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
  WHERE (year(o.o_orderdate) * 12 + month(o.o_orderdate))
        - (CAST(substr(f.cohort, 1, 4) AS INT) * 12
           + CAST(substr(f.cohort, 6, 2) AS INT)) <= 5
  GROUP BY 1, 2
)
SELECT a.cohort, a.age, a.rev_c,
       SUM(a.rev_c) OVER (PARTITION BY a.cohort ORDER BY a.age
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev_c,
       s.cohort_users,
       SUM(a.rev_c) OVER (PARTITION BY a.cohort ORDER BY a.age
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         // s.cohort_users AS ltv_per_user_c
FROM aged a JOIN sized s ON a.cohort = s.cohort
ORDER BY a.cohort, a.age
""",
    "age",
    "rev_c",
    "cum_rev_c",
    "cohort_users",
    "ltv_per_user_c",
)

ROUND8_QUERIES["cohort_ltv_curve"] = (q_cohort_ltv_curve, _LTV_SQL)


# ---------------------------------------------------------------------------
# t_closeness_report — ordered-domain EMD per quasi-identifier group
# ---------------------------------------------------------------------------


def q_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (the step past k-anonymity and l-diversity,
    both already gated): for each quasi-identifier group (market
    segment), the earth-mover's distance between the group's
    sensitive-attribute distribution (order priority, an ORDERED
    5-value domain) and the global one — scaled into exact integers by
    cross-multiplying the two denominators: EMD_scaled = sum over
    prefixes |cum_g * N - cum_all * n_g|, and t_permille =
    (1000 * EMD_scaled) div (n_g * N * (k-1)), the unit-distance
    normalization.  A group with t above threshold leaks the sensitive
    attribute through its quasi-identifier.

    Scale design: one (group x value) aggregation (25 cells), prefix
    cumsum windows on that bounded frame, one 5-row report.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    observed = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("grp"),
            F.col("o_orderpriority").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from etl_portofolio_spark.caching import scoped_persist

    observed = scoped_persist(observed)
    # Densify on the full grp x v spine (r7 ADVICE): a group with zero
    # rows for some sensitive value must still contribute that value's
    # prefix term (with c=0) or its EMD is understated — the prefix
    # walk below is only correct over the complete ordered domain.
    spine = observed.select("grp").distinct().crossJoin(
        observed.select("v").distinct()
    )
    cells = spine.join(observed, ["grp", "v"], "left").select(
        "grp", "v", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    wg = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wv = Window.partitionBy("v")
    tot = Window.partitionBy(F.lit(1))
    k = 5  # ordered sensitive-domain size
    prefixed = (
        cells.withColumn("cum_g", F.sum("c").over(wg))
        .withColumn("n_g", F.sum("c").over(Window.partitionBy("grp")))
        .withColumn("c_all", F.sum("c").over(wv))
        .withColumn("n_all", F.sum("c").over(tot))
    )
    wga = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        prefixed.withColumn("cum_all", F.sum("c_all").over(wga))
        .groupBy("grp")
        .agg(
            F.max("n_g").alias("n_g"),
            F.max("n_all").alias("n_all"),
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n_all")
                    - F.col("cum_all") * F.col("n_g")
                )
            )
            .cast("long")
            .alias("emd_scaled"),
        )
        .select(
            "grp",
            F.col("n_g").cast("long").alias("n_g"),
            "emd_scaled",
            F.expr(f"(1000 * emd_scaled) div (n_g * n_all * {k - 1})")
            .cast("long")
            .alias("t_permille"),
        )
        .orderBy("grp")
    )


_TCLOSE_SQL = oracle_bigint(
    """
WITH observed AS (
  SELECT c_mktsegment AS grp, o_orderpriority AS v, COUNT(*) AS c
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), cells AS (
  -- densified grp x v spine: zero-count cells still contribute their
  -- prefix term, so sparse groups' EMD is not understated
  SELECT s.grp, s.v, COALESCE(o.c, 0) AS c
  FROM (SELECT g.grp, d.v
        FROM (SELECT DISTINCT grp FROM observed) g
        CROSS JOIN (SELECT DISTINCT v FROM observed) d) s
  LEFT JOIN observed o ON s.grp = o.grp AND s.v = o.v
), prefixed AS (
  SELECT grp, v, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
         SUM(c) OVER (PARTITION BY grp) AS n_g,
         SUM(c) OVER (PARTITION BY v) AS c_all,
         SUM(c) OVER () AS n_all
  FROM cells
), walked AS (
  SELECT *, SUM(c_all) OVER (PARTITION BY grp ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
  FROM prefixed
)
SELECT grp, MAX(n_g) AS n_g,
       SUM(ABS(cum_g * n_all - cum_all * n_g)) AS emd_scaled,
       (1000 * SUM(ABS(cum_g * n_all - cum_all * n_g)))
         // (MAX(n_g) * MAX(n_all) * 4) AS t_permille
FROM walked GROUP BY grp ORDER BY grp
""",
    "n_g",
    "emd_scaled",
    "t_permille",
)

ROUND8_QUERIES["t_closeness_report"] = (q_t_closeness_report, _TCLOSE_SQL)


# ---------------------------------------------------------------------------
# shapley_channel_attribution — exact 2-channel Shapley values
# ---------------------------------------------------------------------------


def q_shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution for the two-channel case,
    computed EXACTLY from coalition conversion rates — the
    game-theoretic answer to "how much credit do view and click
    exposure each deserve for conversion", free of last-touch bias.
    Units are user-days; a day's coalition is which of {view, click}
    occurred, conversion is any purchase that day.  With two players
    Shapley closes over 4 coalitions: phi_view = ((r_V - r_0) +
    (r_VC - r_C)) / 2, each rate first emitted as a DEFINED permicro
    integer ``(1e6 * conv) div n`` so the whole computation is engine-
    exact integer arithmetic (no float probability anywhere).

    Emits the 4 coalition rows (n, conversions, rate) with the two
    Shapley values as panel columns.

    Scale design: one combinable user-day aggregation (presence flags
    + conversion flag via max), a 4-key rollup, 4-row arithmetic.
    """
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("has_v"),
            F.max((F.col("event_type") == "click").cast("int")).alias("has_c"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "conv"
            ),
        )
    )
    co = ud.groupBy("has_v", "has_c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("conversions"),
    ).withColumn(
        "rate_permicro",
        F.expr("(1000000 * conversions) div n").cast("long"),
    )
    # bounded: channel panel
    w = Window.partitionBy(F.lit(1))
    r_of = lambda v, c: F.max(  # noqa: E731
        F.when((F.col("has_v") == v) & (F.col("has_c") == c), F.col("rate_permicro"))
    ).over(w)
    # numerators as columns first so the halving is integer `div` on
    # both engines — a float /2 would TRUNCATE in Spark but ROUND in
    # DuckDB's CAST whenever the numerator is odd
    return (
        co.withColumn(
            "num_view",
            (r_of(1, 0) - r_of(0, 0)) + (r_of(1, 1) - r_of(0, 1)),
        )
        .withColumn(
            "num_click",
            (r_of(0, 1) - r_of(0, 0)) + (r_of(1, 1) - r_of(1, 0)),
        )
        .withColumn(
            "shap_view_permicro", F.expr("num_view div 2").cast("long")
        )
        .withColumn(
            "shap_click_permicro", F.expr("num_click div 2").cast("long")
        )
        .select(
            F.col("has_v").cast("long").alias("has_v"),
            F.col("has_c").cast("long").alias("has_c"),
            "n",
            "conversions",
            "rate_permicro",
            "shap_view_permicro",
            "shap_click_permicro",
        )
        .orderBy("has_v", "has_c")
    )


_SHAP_SQL = oracle_bigint(
    """
WITH ud AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_v,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), co AS (
  SELECT has_v, has_c, COUNT(*) AS n, SUM(conv) AS conversions,
         (1000000 * SUM(conv)) // COUNT(*) AS rate_permicro
  FROM ud GROUP BY 1, 2
), rates AS (
  SELECT *,
    MAX(CASE WHEN has_v = 1 AND has_c = 0 THEN rate_permicro END) OVER () AS r10,
    MAX(CASE WHEN has_v = 0 AND has_c = 0 THEN rate_permicro END) OVER () AS r00,
    MAX(CASE WHEN has_v = 1 AND has_c = 1 THEN rate_permicro END) OVER () AS r11,
    MAX(CASE WHEN has_v = 0 AND has_c = 1 THEN rate_permicro END) OVER () AS r01
  FROM co
)
SELECT has_v, has_c, n, conversions, rate_permicro,
       ((r10 - r00) + (r11 - r01)) // 2 AS shap_view_permicro,
       ((r01 - r00) + (r11 - r10)) // 2 AS shap_click_permicro
FROM rates ORDER BY has_v, has_c
""",
    "has_v",
    "has_c",
    "n",
    "conversions",
    "rate_permicro",
    "shap_view_permicro",
    "shap_click_permicro",
)

ROUND8_QUERIES["shapley_channel_attribution"] = (
    q_shapley_channel_attribution,
    _SHAP_SQL,
)


# ---------------------------------------------------------------------------
# ucb_arm_ranking — UCB1 exploration scores at a fixed decision point
# ---------------------------------------------------------------------------


def q_ucb_arm_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit scores over the order-priority arms at the current
    observation count — the explore/exploit ranking a bandit scheduler
    would act on next: score = mean_reward + sqrt(2 ln N / n), reward
    = the order finished (status 'F').

    Float discipline per the repo's transcendental rule: ln is NOT
    correctly rounded across engines, so ln(N) rounds to 9 decimals
    BEFORE entering the bonus; division and sqrt of identical doubles
    ARE bit-deterministic (IEEE correctly-rounded), and the score is
    emitted as an INTEGER permicro (round(score * 1e6) cast BIGINT,
    r7 ADVICE) so neither the ranking tie-break nor the differential
    hash ever touches a repr-sensitive double — Spark round(x, 6)
    HALF_UPs the exact decimal expansion while DuckDB rounds in
    floating point, and at a 5e-7 boundary they can disagree.

    Scale design: one combinable 5-arm aggregation; everything after
    is 5-row arithmetic.
    """
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders")
    arms = orders.groupBy(F.col("o_orderpriority").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("o_orderstatus") == "F").cast("int"))
        .cast("long")
        .alias("wins"),
    )
    # bounded: arm panel
    w = Window.partitionBy(F.lit(1))
    scored = (
        arms.withColumn("big_n", F.sum("n").over(w))
        .withColumn("ln_n", F.round(F.log(F.col("big_n")), 9))
        .withColumn(
            "ucb_permicro",
            F.round(
                (
                    F.col("wins") / F.col("n")
                    + F.sqrt(F.lit(2.0) * F.col("ln_n") / F.col("n"))
                )
                * F.lit(1_000_000.0),
                0,
            ).cast("long"),
        )
    )
    # bounded: arm panel
    wr = Window.orderBy(F.col("ucb_permicro").desc(), F.col("arm").asc())
    return scored.select(
        "arm",
        "n",
        "wins",
        F.expr("(1000 * wins) div n").cast("long").alias("mean_permille"),
        "ucb_permicro",
        F.row_number().over(wr).cast("long").alias("rk"),
    ).orderBy("rk")


_UCB_SQL = oracle_bigint(
    """
WITH arms AS (
  SELECT o_orderpriority AS arm, COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS wins
  FROM orders GROUP BY 1
), scored AS (
  SELECT *,
         CAST(round((CAST(wins AS DOUBLE) / n
               + sqrt(2.0 * round(ln(SUM(n) OVER ()), 9) / n))
               * 1000000) AS BIGINT) AS ucb_permicro
  FROM arms
)
SELECT arm, n, wins,
       (1000 * wins) // n AS mean_permille,
       ucb_permicro,
       ROW_NUMBER() OVER (ORDER BY ucb_permicro DESC, arm ASC) AS rk
FROM scored ORDER BY rk
""",
    "n",
    "wins",
    "mean_permille",
    "ucb_permicro",
    "rk",
)

ROUND8_QUERIES["ucb_arm_ranking"] = (q_ucb_arm_ranking, _UCB_SQL)


# ---------------------------------------------------------------------------
# rendezvous_shard_rebalance — HRW sharding vs mod-N under node addition
# ---------------------------------------------------------------------------

_HRW_NODES = 5


def q_rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment audit: each
    customer key routes to the node with the greatest
    ``h32(node:key)``, and the query measures what a cluster resize
    actually costs — when node 5 joins, HRW moves ONLY the keys whose
    new node wins (~1/(N+1) of them), while mod-N reassignment moves
    ~N/(N+1).  The audit every partition-aware storage layer runs
    before choosing its placement function.

    Emits per-node: keys under 5 nodes, keys under 6, arrivals to the
    new node, and the moved-share permille for both schemes as panel
    columns.  All md5 integers; the argmax is a greatest-of-structs,
    engine-exact.

    Scale design: both assignments are map-side expressions over one
    scan of the key set; the rollup keys on <= 6 nodes.
    """
    apply_runtime_confs(spark)
    from etl_portofolio_spark.functions.hashing import h32

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k"),
        F.col("c_custkey").alias("key"),
    )

    def hrw(n_nodes: int) -> F.Column:
        entries = [
            F.struct(
                h32(F.concat(F.lit(f"node{i}:"), F.col("k"))).alias("h"),
                F.lit(i).alias("node"),
            )
            for i in range(n_nodes)
        ]
        return F.greatest(*entries)["node"]

    assigned = cust.select(
        "key",
        hrw(_HRW_NODES).alias("n5"),
        hrw(_HRW_NODES + 1).alias("n6"),
        (F.col("key") % _HRW_NODES).alias("m5"),
        (F.col("key") % (_HRW_NODES + 1)).alias("m6"),
    )
    # bounded: <= 7 node rollup rows
    w = Window.partitionBy(F.lit(1))
    return (
        assigned.groupBy(F.col("n6").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("keys_after"),
            F.sum((F.col("n5") == F.col("n6")).cast("int"))
            .cast("long")
            .alias("kept"),
            F.sum((F.col("n5") != F.col("n6")).cast("int"))
            .cast("long")
            .alias("moved_hrw"),
            F.sum((F.col("m5") != F.col("m6")).cast("int"))
            .cast("long")
            .alias("moved_mod"),
        )
        .withColumn(
            "hrw_moved_permille",
            # bounded: over () on the <= 7 node rollup rows
            F.expr(
                "(1000 * sum(moved_hrw) over ()) div sum(keys_after) over ()"
            ).cast("long"),
        )
        .withColumn(
            "mod_moved_permille",
            # bounded: same node rollup
            F.expr(
                "(1000 * sum(moved_mod) over ()) div sum(keys_after) over ()"
            ).cast("long"),
        )
        .select(
            F.col("node").cast("long").alias("node"),
            "keys_after",
            "kept",
            "moved_hrw",
            "hrw_moved_permille",
            "mod_moved_permille",
        )
        .orderBy("node")
    )


def _hrw_oracle() -> str:
    from etl_portofolio_spark.functions.hashing import h32_sql

    def hrw_sql(n_nodes: int) -> str:
        # DuckDB greatest() rejects structs; argmax via struct-list sort
        parts = []
        for i in range(n_nodes):
            h = h32_sql(f"'node{i}:' || k")
            parts.append(f"{{'h': {h}, 'n': {i}}}")
        return "(list_sort([" + ", ".join(parts) + "], 'DESC'))[1].n"

    return f"""
WITH cust AS (
  SELECT CAST(c_custkey AS VARCHAR) AS k, c_custkey AS key FROM customer
), assigned AS (
  SELECT key,
         CAST({hrw_sql(_HRW_NODES)} AS BIGINT) AS n5,
         CAST({hrw_sql(_HRW_NODES + 1)} AS BIGINT) AS n6,
         key % {_HRW_NODES} AS m5,
         key % {_HRW_NODES + 1} AS m6
  FROM cust
), rolled AS (
  SELECT n6 AS node, COUNT(*) AS keys_after,
         SUM(CASE WHEN n5 = n6 THEN 1 ELSE 0 END) AS kept,
         SUM(CASE WHEN n5 <> n6 THEN 1 ELSE 0 END) AS moved_hrw,
         SUM(CASE WHEN m5 <> m6 THEN 1 ELSE 0 END) AS moved_mod
  FROM assigned GROUP BY 1
)
SELECT node, keys_after, kept, moved_hrw,
       (1000 * SUM(moved_hrw) OVER ()) // SUM(keys_after) OVER ()
         AS hrw_moved_permille,
       (1000 * SUM(moved_mod) OVER ()) // SUM(keys_after) OVER ()
         AS mod_moved_permille
FROM rolled ORDER BY node
"""


ROUND8_QUERIES["rendezvous_shard_rebalance"] = (
    q_rendezvous_shard_rebalance,
    oracle_bigint(
        _hrw_oracle(),
        "node",
        "keys_after",
        "kept",
        "moved_hrw",
        "hrw_moved_permille",
        "mod_moved_permille",
    ),
)
