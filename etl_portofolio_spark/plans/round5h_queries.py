"""Round-5 fourth wave: product-analytics shapes (cohorts, funnels).

The two classic event-analytics operators the registry still lacked:
a weekly cohort-retention triangle (the growth team's canonical
matrix) and a strict-order conversion funnel (view → click →
purchase, each stage after the previous user-stage timestamp).  Both
are pure keyed DataFrame compositions — no windows over the full
event stream, no driver loops — and both carry exact DuckDB oracles.

Determinism: timestamps compare exactly (no float epochs on the join
path), counts are integers, shares are one rounded double from
integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.session import apply_runtime_confs

#: week index anchor — a constant DATE, so the week bucketing is plain
#: integer datediff arithmetic in both engines
_COHORT_EPOCH = "2024-01-01"


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by first-active
    week, share still active k weeks later — the growth-analytics
    matrix every event warehouse serves.

    Shape at scale: first-active week is one combinable groupBy on
    user (min over ts); the activity set dedups to (user, week) pairs
    BEFORE any join (shrinking the fact stream to its distinct
    behavioral grain); the cohort join is an equi-join on user_id —
    key-partitioned all the way, the triangle itself is
    O(weeks²) rows.  Cohort sizes attach by a second tiny equi-join
    on the cohort week (broadcast — it is |weeks| rows).
    Week index = days-since-anchor DIV 7: integer arithmetic, no
    calendar-week convention to disagree on.
    """
    apply_runtime_confs(spark)
    events = load_table(spark, sf_dir, "events")
    week = (
        F.datediff(F.to_date("ts"), F.lit(_COHORT_EPOCH).cast("date")) / 7
    ).cast("long")
    user_weeks = events.select(
        "user_id", week.alias("week")
    ).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    cohort_sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    active = (
        user_weeks.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        active.join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"),
                6,
            ).alias("retention"),
        )
    )


ORACLE_COHORT_RETENTION = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '{_COHORT_EPOCH}', CAST(ts AS DATE)) // 7
              AS BIGINT) AS week
  FROM events
), cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_week, count(*) AS n_cohort FROM cohorts GROUP BY cohort_week
), active AS (
  SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
         count(DISTINCT uw.user_id) AS n_active
  FROM uw JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.n_cohort,
       round(CAST(a.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 6)
         AS retention
FROM active a JOIN sizes s USING (cohort_week)
"""


# ---------------------------------------------------------------------------
# Strict-order conversion funnel
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view → click → purchase: a user converts a
    stage only with an event STRICTLY AFTER their previous-stage
    timestamp (the ordering constraint that separates a funnel from
    three independent counts — a purchase before the first view does
    not count).

    Per stage: one conditional min-aggregate on user_id, then a
    same-key equi-join back to the deduped (user, type, ts) stream for
    the next stage's "first after" — k stages cost k keyed
    aggregations on the SAME key (AQE coalesces the exchanges; nothing
    re-partitions), never a per-user sort of full history.  Output is
    the |stages|-row summary: entrants, converts, conversion shares.
    """
    apply_runtime_confs(spark)
    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", "ts").where(
        F.col("event_type").isin(*_FUNNEL_STAGES)
    )
    # stage 1: first view per user
    t1 = ev.where(F.col("event_type") == _FUNNEL_STAGES[0]).groupBy(
        "user_id"
    ).agg(F.min("ts").alias("t1"))
    # stage 2: first click strictly after t1
    t2 = (
        ev.where(F.col("event_type") == _FUNNEL_STAGES[1])
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    # stage 3: first purchase strictly after t2
    t3 = (
        ev.where(F.col("event_type") == _FUNNEL_STAGES[2])
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = t1.agg(F.count(F.lit(1)).alias("n"))
    n2 = t2.agg(F.count(F.lit(1)).alias("n"))
    n3 = t3.agg(F.count(F.lit(1)).alias("n"))
    stage = lambda i, nm, df: df.select(  # noqa: E731
        F.lit(i).alias("stage_idx"), F.lit(nm).alias("stage"), F.col("n")
    )
    counts = (
        stage(1, _FUNNEL_STAGES[0], n1)
        .unionByName(stage(2, _FUNNEL_STAGES[1], n2))
        .unionByName(stage(3, _FUNNEL_STAGES[2], n3))
    )
    first = n1.select(F.col("n").alias("n_entered"))
    return counts.crossJoin(F.broadcast(first)).select(
        "stage_idx",
        "stage",
        F.col("n").alias("n_users"),
        F.round(
            F.col("n").cast("double") / F.col("n_entered").cast("double"), 6
        ).alias("share_of_entrants"),
    )


ORACLE_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, event_type, ts FROM events
  WHERE event_type IN ('{_FUNNEL_STAGES[0]}', '{_FUNNEL_STAGES[1]}',
                       '{_FUNNEL_STAGES[2]}')
), t1 AS (
  SELECT user_id, min(ts) AS t1 FROM ev
  WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY user_id
), t2 AS (
  SELECT ev.user_id, min(ts) AS t2 FROM ev JOIN t1 USING (user_id)
  WHERE event_type = '{_FUNNEL_STAGES[1]}' AND ts > t1 GROUP BY ev.user_id
), t3 AS (
  SELECT ev.user_id, min(ts) AS t3 FROM ev JOIN t2 USING (user_id)
  WHERE event_type = '{_FUNNEL_STAGES[2]}' AND ts > t2 GROUP BY ev.user_id
), counts AS (
  SELECT 1 AS stage_idx, '{_FUNNEL_STAGES[0]}' AS stage,
         (SELECT count(*) FROM t1) AS n_users
  UNION ALL
  SELECT 2, '{_FUNNEL_STAGES[1]}', (SELECT count(*) FROM t2)
  UNION ALL
  SELECT 3, '{_FUNNEL_STAGES[2]}', (SELECT count(*) FROM t3)
)
SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST((SELECT count(*) FROM t1) AS DOUBLE), 6)
         AS share_of_entrants
FROM counts
"""


#: dict the registry splices in: name -> (query fn, oracle sql or None)
ROUND5H_QUERIES: dict = {
    "cohort_retention": (q_cohort_retention, ORACLE_COHORT_RETENTION),
    "funnel_conversion": (q_funnel_conversion, ORACLE_FUNNEL),
}
