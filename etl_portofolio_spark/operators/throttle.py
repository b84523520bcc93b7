"""Gap-based event throttling — the batch twin of a streaming rate
limiter / duplicate-click suppressor.

An event is kept iff the gap to its RAW predecessor (same key group,
(ts, tiebreak) order) exceeds ``min_gap_seconds``. Although the gap is
measured to the raw predecessor (one lag window — no iteration), the
kept set still satisfies the rate-limit contract: for consecutive kept
events K1 < K2, K2's raw predecessor P satisfies K2 − P > gap and
P ≥ K1, hence K2 − K1 > gap. One shuffle on the key columns; key
cardinality is user-scale, so no salting needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle_events(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    min_gap_seconds: int = 300,
) -> DataFrame:
    """Keep events whose gap to the previous raw event (per key group)
    exceeds ``min_gap_seconds``; the first event per group is kept.

    Adds a ``gap_s`` column (NULL for each group's first event). Ties
    on the timestamp are ordered by ``tiebreak_col`` when given — pass
    a unique id to make the kept set deterministic under equal
    timestamps.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    return df.withColumn("gap_s", gap).where(
        F.col("gap_s").isNull() | (F.col("gap_s") > min_gap_seconds)
    )
