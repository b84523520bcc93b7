"""HTTP XML-query API source — distributed, schema-declared (S2/S3/S6).

The reference POSTs a ``GenericClientQuery`` XML body (column list, flow
filter, [start, end) time range, resolution) with basic auth and parses
the CSV response in driver pandas (`Ingestion Data (XML).py:91-132`) —
the whole payload transits driver RAM, its key scalability defect
(SURVEY.md §3.2).

Here the same API shape is a Spark 4 Python ``DataSource``: one input
partition per time window, each EXECUTOR fetches and parses its own
window. The fetch function is pluggable via a ``fetcher`` option naming
a ``module:function`` importable on executors — tests inject a
deterministic fake; production points it at an HTTP client. The response
schema is declared explicitly (the reference's pandas dtype inference
flips types on empty responses — SURVEY.md §1.3).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

#: The reference's request/response columns (`Ingestion Data (XML).py:95-102`,
#: corrected per SURVEY.md §2.11.1: transactions/throughput, not
#: transaksi/trhoughput).
RESPONSE_SCHEMA = (
    "waktu string, appId_String string, clientAddr string, serverAddr string, "
    "transactions double, delay double, throughput double"
)

TIME_FMT = "%Y-%m-%d %H:%M:%S"


def build_query_xml(
    columns: tuple[str, ...],
    flow_filter: str,
    start: datetime,
    end: datetime,
    resolution: str = "FIVE_MINUTE",
) -> str:
    """The ``GenericClientQuery`` request body (shape of
    `Ingestion Data (XML).py:91-120`): column select list, flow filter,
    half-open time range, resolution."""
    cols = "\n".join(f"      <column>{c}</column>" for c in columns)
    return (
        "<GenericClientQuery>\n"
        "  <select>\n"
        f"{cols}\n"
        "  </select>\n"
        f"  <filter>{flow_filter}</filter>\n"
        f"  <startTime>{start.strftime(TIME_FMT)}</startTime>\n"
        f"  <endTime>{end.strftime(TIME_FMT)}</endTime>\n"
        f"  <resolution>{resolution}</resolution>\n"
        "</GenericClientQuery>"
    )


@dataclass
class WindowPartition(InputPartition):
    """One fetch window = one Spark input partition."""

    start: str  # TIME_FMT strings — must be picklable
    end: str


def resolve_fetcher(spec: str) -> Callable[[str, str, str], str]:
    """Import ``module:function`` → callable(url, xml_body, window_id) -> CSV text."""
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


class XmlApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.url = options.get("url", "")
        self.fetcher_spec = options["fetcher"]
        self.columns = tuple(
            options.get(
                "columns",
                "waktu,appId_String,clientAddr,serverAddr,transactions,delay,throughput",
            ).split(",")
        )
        self.flow_filter = options.get("flowfilter", "")
        self.resolution = options.get("resolution", "FIVE_MINUTE")
        self.start = options["starttime"]
        self.end = options["endtime"]
        self.window_minutes = int(options.get("windowminutes", "5"))

    def partitions(self) -> list[WindowPartition]:
        """Tumbling windows over [start, end) — the reference's 5-minute
        driver loop (`Ingestion Data (XML).py:70-75`) became the
        partition plan, so windows fetch in parallel."""
        t0 = datetime.strptime(self.start, TIME_FMT)
        t1 = datetime.strptime(self.end, TIME_FMT)
        delta = timedelta(minutes=self.window_minutes)
        out = []
        while t0 < t1:
            w_end = min(t0 + delta, t1)
            out.append(WindowPartition(t0.strftime(TIME_FMT), w_end.strftime(TIME_FMT)))
            t0 = w_end
        return out

    def read(self, partition: WindowPartition) -> Iterator[tuple]:
        """Executor-side: fetch one window's CSV and parse with explicit
        types (S3's `pd.read_csv(StringIO)` without dtype inference).

        r11 A/B note (keep-or-revert): a pandas-parsed pyarrow
        RecordBatch yield (SPARK_GRAFT_XMLAPI_ARROW=1; row-identical,
        pinned by tests/test_r11_equivalence.py) was tried and LOST —
        in-Spark alternating A/B med 1.380 vs 1.281 s, micro 60 vs
        53 ms/window: Spark's datasource worker already converts the
        tuple stream to Arrow batches in C
        (plan_data_source_read.records_to_arrow_batches), so the
        python-side pandas/pa.array construction only ADDS work at this
        window size (~3.3k rows). The tuple path stays the default; the
        stage is python-worker-startup bound regardless (stage profile:
        11 s executor / 1.4 s CPU over 30 tasks — the blocked time is
        worker fork + imports, not row processing)."""
        import csv
        import io
        import os

        fetch = resolve_fetcher(self.fetcher_spec)
        body = build_query_xml(
            self.columns,
            self.flow_filter,
            datetime.strptime(partition.start, TIME_FMT),
            datetime.strptime(partition.end, TIME_FMT),
            self.resolution,
        )
        text = fetch(self.url, body, partition.start)
        if not text.strip():
            return
        double_cols = {
            f.name for f in self.schema_.fields if f.dataType.typeName() == "double"
        }
        if os.environ.get("SPARK_GRAFT_XMLAPI_ARROW", "0") == "1":
            import pandas as pd
            import pyarrow as pa

            pdf = pd.read_csv(
                io.StringIO(text), dtype=str, keep_default_na=False
            )
            arrays = []
            for f in self.schema_.fields:
                col = (
                    pdf[f.name]
                    if f.name in pdf.columns
                    else pd.Series([None] * len(pdf), dtype=object)
                )
                if f.name in double_cols:
                    arrays.append(
                        pa.array(
                            pd.to_numeric(col.where(col != "", None)),
                            type=pa.float64(),
                            from_pandas=True,
                        )
                    )
                else:
                    arrays.append(pa.array(col, type=pa.string(), from_pandas=True))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in self.schema_.fields]
            )
            return
        reader = csv.DictReader(io.StringIO(text))
        for rec in reader:
            yield tuple(
                (float(rec[f.name]) if rec.get(f.name) not in (None, "") else None)
                if f.name in double_cols
                else rec.get(f.name)
                for f in self.schema_.fields
            )


class XmlApiDataSource(DataSource):
    """``spark.read.format("xmlapi")`` after ``register_xml_api(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "xmlapi"

    def schema(self) -> str:
        return self.options.get("schema", RESPONSE_SCHEMA)

    def reader(self, schema: StructType) -> XmlApiReader:
        return XmlApiReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> "XmlApiStreamReader":
        return XmlApiStreamReader(schema, dict(self.options))


def register_xml_api(spark) -> None:
    spark.dataSource.register(XmlApiDataSource)


class XmlApiStreamReader(DataSourceStreamReader):
    """Structured-Streaming reader for the same API: the reference's
    hand-rolled 5-minute ``while`` loop (`Ingestion Data (XML).py:70-162`)
    as a REAL micro-batch source with checkpointable offsets.

    Offsets are window starts ({"t": "<ts>"}). ``latestOffset``
    reports what the SOURCE has available — ``endtime``, standing in
    for "the last complete window before now" in a live deployment —
    never a function of the committed position (the engine owns that;
    a reader that advances "committed+1" breaks checkpoint recovery,
    where a fresh reader instance must still see all available data).
    Window fetches stay EXECUTOR-side: ``partitions(start, end)``
    plans one InputPartition per window between the offsets and
    ``read`` reuses the batch reader's fetch+parse, so the streaming
    path inherits the distributed-fetch fix over the reference's
    driver-RAM pandas path. Restart semantics (test-pinned): resuming
    the checkpoint with no new data is a no-op; extending ``endtime``
    (new windows became available) reads ONLY the delta windows.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self._batch = XmlApiReader(schema, options)

    def initialOffset(self) -> dict:
        return {"t": self._batch.start}

    def latestOffset(self) -> dict:
        return {"t": self._batch.end}

    def partitions(self, start: dict, end: dict) -> list[WindowPartition]:
        t0 = datetime.strptime(start["t"], TIME_FMT)
        t1 = datetime.strptime(end["t"], TIME_FMT)
        delta = timedelta(minutes=self._batch.window_minutes)
        out = []
        while t0 < t1:
            w_end = min(t0 + delta, t1)
            out.append(
                WindowPartition(t0.strftime(TIME_FMT), w_end.strftime(TIME_FMT))
            )
            t0 = w_end
        return out

    def read(self, partition: WindowPartition) -> Iterator[tuple]:
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass
