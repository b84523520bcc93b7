"""Sessionization on the Spark 4 ``transformWithStateInPandas`` runtime.

The third implementation of the engine's canonical custom stateful
operator (SURVEY.md §2.9), semantically identical to
``stateful.sessionize_batch`` / ``stateful.sessionize_stream`` but on
the NEW arbitrary-state API (SPARK-45939, GA in Spark 4): an object
with named, schema-declared state slots instead of one opaque
``GroupState`` tuple.

Why carry a third twin: ``applyInPandasWithState`` is the legacy
surface; ``transformWithState`` is where new state features land
(state TTL, composite List/Map state, state-reader introspection,
initial-state bootstrap) — a production migration path needs the same
operator proven on both runtimes, with the batch twin as the oracle.
Scale behavior is unchanged: one shuffle on the grouping key, one
small value-state row per ACTIVE user in the state store, sessions
emitted as soon as a later-by-more-than-gap event arrives.

Chunking note: ``rows`` arrives as an ITERATOR of pandas batches for
one key; a user's events can span batches, so the fold seeds from the
value state and updates it after the last batch — never assume one
batch per key (the >10k-events-per-key case at real scale).

Environment seam (same class as the compressed-codec gate in
``operators/multimodal.py``): the transformWithState Python runtime
speaks a protobuf state protocol, so executing it requires the public
``protobuf`` package (``google.protobuf``) next to pyspark. This
container ships without it — the runtime test skips with a marker and
the session fold (the operator's entire semantics) is unit-tested
directly via :func:`fold_sessions`, which both the processor and the
test share. On a real cluster with protobuf present the operator runs
unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame

from etl_portofolio_spark.streaming.stateful import SESSION_SCHEMA, _STATE_SCHEMA

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def fold_sessions(
    ts_us_sorted: list[int],
    cur: tuple[int, int, int] | None,
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """The sessionization fold both stream twins implement: consume
    sorted event times, close a session whenever the next event is
    more than ``gap_us`` after the open session's end.

    Returns ``(closed_sessions, open_session)`` — the open session is
    what rides in the state store; each tuple is
    (start_us, end_us, n_events).
    """
    cur_start, cur_end, cur_n = cur if cur is not None else (None, None, None)
    closed: list[tuple[int, int, int]] = []
    for t in ts_us_sorted:
        if cur_start is None:
            cur_start, cur_end, cur_n = t, t, 1
        elif t - cur_end > gap_us:
            closed.append((cur_start, cur_end, cur_n))
            cur_start, cur_end, cur_n = t, t, 1
        else:
            cur_end, cur_n = max(cur_end, t), cur_n + 1
    open_sess = (
        (int(cur_start), int(cur_end), int(cur_n))
        if cur_start is not None
        else None
    )
    return closed, open_sess


def sessionize_stream_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization via ``transformWithStateInPandas``.

    Contract (same as ``sessionize_stream``): emits every CLOSED
    session (a later event arrived > gap after the session end); each
    user's trailing open session rides in the value state across
    micro-batches. On a bounded replay, output == batch twin minus
    each user's final session — the property the test asserts
    row-for-row.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._open = handle.getValueState("open_session", _STATE_SCHEMA)

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            (user,) = key
            cur = self._open.get() if self._open.exists() else None
            if cur is not None:
                cur = (int(cur[0]), int(cur[1]), int(cur[2]))
            # a key's events may arrive as SEVERAL pandas chunks with no
            # cross-chunk ordering guarantee: gather, then one sorted fold
            # (same as the legacy twin's concat+sort_values)
            chunks = [
                pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1000
                for pdf in rows
            ]
            ts_all = (
                pd.concat(chunks, ignore_index=True).sort_values().tolist()
                if chunks
                else []
            )
            closed, open_sess = fold_sessions(ts_all, cur, gap_us)
            if open_sess is not None:
                self._open.update(open_sess)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": pd.Series(
                            [user] * len(closed), dtype="int64"
                        ),
                        "session_start": [
                            pd.Timestamp(s, unit="us") for s, _, _ in closed
                        ],
                        "session_end": [
                            pd.Timestamp(e, unit="us") for _, e, _ in closed
                        ],
                        "n_events": pd.Series(
                            [n for _, _, n in closed], dtype="int64"
                        ),
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
