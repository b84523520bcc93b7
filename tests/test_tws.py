"""transformWithStateInPandas sessionizer vs the batch twin.

The session FOLD (the operator's entire semantics) is unit-tested
directly and cross-checked against ``sessionize_batch`` on fixture
data. The end-to-end streaming runs are gated on the public
``protobuf`` package: the transformWithState Python runtime speaks a
protobuf state protocol, and this container ships without it (the
documented environment seam in ``streaming/tws.py``). On a cluster
with protobuf installed the runtime tests execute unchanged.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.streaming.stateful import sessionize_batch
from etl_portofolio_spark.streaming.tws import fold_sessions, sessionize_stream_tws

from .conftest import SF_DIR

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False

_M = 60 * 1_000_000  # one minute in microseconds
_GAP = 30 * _M


def test_fold_closes_on_gap_and_keeps_open_tail():
    ts = [0, 10 * _M, 20 * _M, 120 * _M, 125 * _M]
    closed, open_sess = fold_sessions(ts, None, _GAP)
    assert closed == [(0, 20 * _M, 3)]
    assert open_sess == (120 * _M, 125 * _M, 2)


def test_fold_seeds_from_state_across_batches():
    """A session spanning a micro-batch boundary closes as ONE session."""
    _, open1 = fold_sessions([0, 10 * _M], None, _GAP)
    closed, open2 = fold_sessions([20 * _M, 120 * _M], open1, _GAP)
    assert closed == [(0, 20 * _M, 3)]
    assert open2 == (120 * _M, 120 * _M, 1)


def test_fold_empty_batch_preserves_state():
    closed, open_sess = fold_sessions([], (0, 5 * _M, 2), _GAP)
    assert closed == [] and open_sess == (0, 5 * _M, 2)


def test_fold_matches_batch_twin_on_fixture(spark):
    """Per-user fold over the real events table == sessionize_batch:
    the semantics the streaming runtime carries, proven without it."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    per_user: dict[int, list[int]] = {}
    for r in ev.collect():
        per_user.setdefault(r["user_id"], []).append(
            int(r["ts"].timestamp() * 1_000_000)
        )
    got = set()
    for user, ts in per_user.items():
        closed, open_sess = fold_sessions(sorted(ts), None, _GAP)
        for s, e, n in closed + [open_sess]:
            got.add((user, s, e, n))
    expected = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    assert got == expected


def test_tws_plan_builds_without_protobuf(spark, tmp_path):
    """Pins the env-gated skip below to exactly the runtime seam: the
    transformWithStateInPandas PLAN (processor wiring, output schema,
    state spec) must construct without google.protobuf — only batch
    EXECUTION speaks the protobuf state protocol.  If this test ever
    fails, the 1-skip is hiding an API regression in our code, not an
    environment gap."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    src_dir = str(tmp_path / "src")
    ev.limit(10).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)
    sessions = sessionize_stream_tws(stream, gap_minutes=30)
    assert sessions.isStreaming
    assert [f.name for f in sessions.schema.fields] == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
    ]


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState RUNTIME needs google.protobuf (absent in "
    "this container; documented seam in streaming/tws.py). The operator "
    "semantics stay covered unconditionally: fold_sessions kernel tests "
    "+ the batch-twin differential above + plan construction in "
    "test_tws_plan_builds_without_protobuf.",
)
def test_tws_sessionize_matches_batch_minus_open_sessions(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    src_dir = str(tmp_path / "src")
    # multiple files => a key's rows can arrive as several chunks
    ev.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(spark.read.parquet(src_dir).schema).parquet(
        src_dir
    )
    sessions = sessionize_stream_tws(stream, gap_minutes=30)
    target = str(tmp_path / "out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(target)
    batch = sessionize_batch(ev, gap_minutes=30)
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    expected = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .drop("__rn")
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
