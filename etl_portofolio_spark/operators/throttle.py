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

from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


#: streaming output: the kept event's identity + its gap to the raw
#: predecessor (NULL for each key's first event, as in the batch twin)
THROTTLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("gap_s", T.LongType()),
    ]
)

#: state row: epoch-seconds of the key's last RAW (kept or dropped)
#: event, the max event time ever seen, and how many arrivals came in
#: BEHIND that max (out-of-order across micro-batches). prev_s drives
#: the throttle decision; max_s/ooo_count exist so silent divergence
#: from the batch twin is observable (read them back with the state
#: data source: spark.read.format("statestore").load(checkpoint)).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("prev_s", T.LongType()),
        T.StructField("max_s", T.LongType()),
        T.StructField("ooo_count", T.LongType()),
    ]
)


def throttle_stream(
    events: DataFrame,
    min_gap_seconds: int = 300,
) -> DataFrame:
    """Streaming twin of :func:`throttle_events` via
    ``applyInPandasWithState``: per (user_id, event_type), keep an
    event iff its gap to the previous RAW event exceeds the limit.

    State is one epoch-seconds long per key — the last raw event time,
    kept or dropped — so the decision matches the batch lag semantics
    exactly and output needs no trailing flush (keeps emit
    immediately; state never holds back rows the way open sessions
    do). Given per-key in-order delivery across micro-batches (the
    standard file-stream/watermark contract), stream output == batch
    output row-for-row.

    A LATE arrival (event time behind the key's max seen — possible
    when upstream files interleave) silently diverges from the batch
    twin, which would have sorted it into place. That divergence is a
    documented tradeoff, but it is made OBSERVABLE (r4 ADVICE): state
    tracks the max event time and counts arrivals behind it, and the
    checkpoint can be audited after any run via the state data
    source — ``spark.read.format("statestore").load(ckpt)`` — so an
    operator alarms on ``ooo_count > 0`` instead of trusting blindly.
    """
    import pandas as pd

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        user, etype = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        ts_s = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        ).tolist()
        prev, max_s, ooo = (state.get if state.exists else (None, None, 0))
        keep_idx: list[int] = []
        gaps: list[int | None] = []
        for i, t in enumerate(ts_s):
            if max_s is not None and t < max_s:
                ooo += 1  # late arrival: decision may diverge from batch
            gap = None if prev is None else t - prev
            if gap is None or gap > min_gap_seconds:
                keep_idx.append(i)
                gaps.append(gap)
            prev = t
            max_s = t if max_s is None else max(max_s, t)
        state.update((prev, max_s, ooo))
        if keep_idx:
            kept = rows.iloc[keep_idx]
            yield pd.DataFrame(
                {
                    "event_id": kept["event_id"].astype("int64").values,
                    "user_id": pd.Series([user] * len(keep_idx), dtype="int64"),
                    "event_type": [etype] * len(keep_idx),
                    "ts": kept["ts"].values,
                    "gap_s": pd.array(gaps, dtype="Int64"),
                }
            )

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        outputStructType=THROTTLE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
