"""Time-series primitives: date spines, gap filling, trailing windows.

The reference's pipelines are daily-partitioned (`ds`) ingests; a
complete calendar spine is what turns "days that happened to have
rows" into "every day, with explicit zeros" — the shape reporting and
training-data curricula need (missing days must be visible, not
silently absent).

Scale notes (100 TB): the spine is built from a SINGLE-ROW min/max
aggregate exploded into |days| rows — thousands of rows regardless of
fact size — so it is always the broadcast side of the gap-fill join.
The daily aggregate shuffles once on the date key with map-side
partials. No driver loop, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def date_spine(df: DataFrame, date_col: Column | str, out_col: str = "d") -> DataFrame:
    """One row per calendar day spanning min..max of ``date_col``.

    ``sequence(lo, hi)`` over dates steps one day and is inclusive on
    both ends (matching DuckDB/Postgres ``generate_series``). Empty
    input => empty spine (the min/max aggregate yields NULL bounds and
    ``sequence`` of NULL is NULL => explode drops it).
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    bounds = df.agg(F.min(c).alias("__lo"), F.max(c).alias("__hi"))
    # explode of a NULL array emits no rows, so empty input => empty spine
    return bounds.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(out_col)
    )


def gapfill_daily(
    daily: DataFrame,
    spine: DataFrame,
    date_col: str,
    fill_zero: list[str],
) -> DataFrame:
    """Left-join a daily aggregate onto a calendar spine, zero-filling
    the named measure columns and flagging synthesized rows.

    The spine is tiny (|days| rows) and explicitly broadcast; the join
    is therefore map-side on the daily aggregate — no extra shuffle at
    any scale.
    """
    # Alias both sides: the spine is usually DERIVED from the same frame
    # as the daily aggregate, so unqualified refs would be ambiguous
    # under failAmbiguousSelfJoin.
    joined = F.broadcast(spine.alias("__spine")).join(
        daily.alias("__daily"), date_col, "left"
    )
    return joined.select(
        date_col,
        *[F.coalesce(F.col(f"__daily.{m}"), F.lit(0)).alias(m) for m in fill_zero],
        F.col(f"__daily.{fill_zero[0]}").isNull().alias("was_gap"),
    )


def trailing_range_sum(
    df: DataFrame,
    partition_col: str,
    day_col: Column,
    value_col: Column,
    days: int,
    out_col: str,
) -> DataFrame:
    """Trailing ``days``-day windowed sum via a RANGE frame.

    RANGE (not ROWS) so all peer rows on the same day are always in
    frame — deterministic under ties, and identical to the SQL
    ``RANGE BETWEEN n PRECEDING AND CURRENT ROW`` on an integer day
    number. One shuffle on the partition key; the frame is evaluated
    in a single pass over each partition's sorted run.
    """
    if days < 1:
        raise ValueError(f"days must be >= 1, got {days}")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col("__day"))
        .rangeBetween(-(days - 1), 0)
    )
    return (
        df.withColumn("__day", day_col)
        .withColumn(out_col, F.sum(value_col).over(w))
        .drop("__day")
    )


def holt_linear_cents(
    daily: DataFrame, day_col: str = "day", value_col: str = "rev_c"
) -> DataFrame:
    """Holt's linear (double-exponential) smoother with α = β = 1/2 in
    EXACT integer arithmetic: per step,
    ``level' = floor((x + level + trend)/2)``,
    ``trend' = floor((level' - level + trend)/2)``, forecast = level' +
    trend'.  The floor-div fixpoint makes the recursion bit-identical
    across engines — no float state, no rounding-mode ambiguity (floor
    of an IEEE halving of integers < 2^53 is exact everywhere).

    A genuinely SEQUENTIAL fold (each step consumes the previous
    state), so it runs as one Arrow-batched pandas group over the
    CALENDAR-bounded daily frame — thousands of rows regardless of
    fact-table size; the fact scan collapses map-side before this
    kernel ever sees data.  The declarative twin is a recursive CTE
    (the DuckDB oracle of ``holt_trend_forecast``).
    """
    import pandas as pd

    out_schema = (
        f"{day_col} date, level_c long, trend_c long, forecast_next_c long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        days = pdf[day_col].tolist()
        xs = [int(v) for v in pdf[value_col].tolist()]
        rows = []
        level = trend = 0
        for i, (d, x) in enumerate(zip(days, xs)):
            if i == 0:
                level, trend = x, 0
            else:
                new_level = (x + level + trend) // 2
                trend = (new_level - level + trend) // 2
                level = new_level
            rows.append((d, level, trend, level + trend))
        return pd.DataFrame(
            rows, columns=[day_col, "level_c", "trend_c", "forecast_next_c"]
        )

    return (
        daily.select(day_col, value_col)
        .groupBy(F.lit(1).alias("_g"))
        .applyInPandas(lambda _, pdf: fold(pdf), out_schema)
    )
