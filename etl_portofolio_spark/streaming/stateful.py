"""Custom stateful operator: gap-based sessionization.

The canonical "operator Spark lacks" (SURVEY.md §2.9 — the reference has
no UDFs at all, so this whole module is a labeled engine extension):
group events into per-user sessions that close when the gap between
consecutive events exceeds a threshold.

Two implementations with identical semantics:

- :func:`sessionize_batch` — pure DataFrame composition (lag → gap flag
  → running session index), one shuffle on user_id; has an exact DuckDB
  oracle (gaps-and-islands SQL).
- :func:`sessionize_stream` — ``applyInPandasWithState`` for unbounded
  streams: per-user state carries the open session across micro-batches;
  a session is emitted when a later event arrives more than ``gap``
  after it ends. The trailing open session stays in state (in batch
  replays of the same data, the stream output == batch output minus each
  user's final session).

At scale both shuffle once on user_id; the streaming state store holds
one small record per active user.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: state row: (session_start_epoch_us, session_end_epoch_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessions via gaps-and-islands: lag → new-session flag → running sum.

    Two window passes over the same (user, ts) ordering — Catalyst plans
    them in one sort within one shuffle of user_id partitions.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev)) > gap_s)
    ).cast("long")
    sess = events.withColumn("__new", is_new).withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(user_col, "__sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )


def oracle_sessionize_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin of :func:`sessionize_batch` over the events view."""
    gap_s = gap_minutes * 60
    return f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {gap_s}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
), numbered AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, sid
"""


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    flush_timeout: bool = False,
) -> DataFrame:
    """Streaming sessionization with explicit per-user state.

    Emits a session as soon as an event more than ``gap`` later shows up
    for that user; the open session rides in the state store across
    micro-batches.

    ``flush_timeout=True`` adds a ProcessingTimeTimeout that force-emits
    abandoned users' open sessions in a LIVE stream. Leave it off for
    catch-up (``availableNow``) runs: a pending timeout keeps the query
    triggering empty micro-batches until every timer fires, so an
    availableNow query would not terminate for gap_minutes of wall time.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user,) = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        # normalize to epoch microseconds regardless of pandas ts unit
        ts_us = (
            rows[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield _sess_pdf(pd, user, [(s, e, n)])
            return

        # the fold itself lives in ONE place (streaming/tws.py::
        # fold_sessions) shared by all three twins — batch, this
        # applyInPandasWithState path, and transformWithStateInPandas;
        # tests/test_properties.py pins the parity by property
        from etl_portofolio_spark.streaming.tws import fold_sessions

        closed, open_sess = fold_sessions(
            ts_us, state.get if state.exists else None, gap_us
        )
        if open_sess is not None:
            state.update(tuple(open_sess))
        if flush_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield _sess_pdf(pd, user, closed)

    def _sess_pdf(pd, user, triples):
        return pd.DataFrame(
            {
                "user_id": pd.Series([user] * len(triples), dtype="int64"),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in triples
                ],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in triples],
                "n_events": pd.Series([n for _, _, n in triples], dtype="int64"),
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
