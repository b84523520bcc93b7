"""Unit tests for the scalar function library (SURVEY.md §5.2).

Covers the reference-semantics edge cases called out in SURVEY §2.11:
null propagation in the pivot sum (F13), calendar-year vs week-year
minute bucketing (F7), decimal(20,0) overflow headroom (F9), and the
regex extraction patterns (F1/F2).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_portofolio_spark.functions import (
    composite_key,
    date_parts,
    ds_from_ts,
    minute_bucket,
    paren_description,
    prefix_before,
    shift_hours,
)


def test_null_propagating_sum(spark):
    # SURVEY §2.11/F13: after the FULL join, in+out must be NULL when
    # either side is missing (reference semantics) — no coalesce-to-0.
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 2.0), (1.0, None), (None, None)],
        T.StructType(
            [
                T.StructField("a", T.DoubleType()),
                T.StructField("b", T.DoubleType()),
            ]
        ),
    )
    got = [r[0] for r in df.select((F.col("a") + F.col("b")).alias("s")).collect()]
    assert got == [3.0, None, None, None]


def test_minute_bucket_calendar_year_not_week_year(spark):
    # Reference uses 'YYYY-MM-dd HH:mm:00' (week-year) at
    # Processing Data.py:171 — 2024-12-30 falls in ISO week-year 2025.
    # The engine deliberately uses calendar truncation (SURVEY §2.11.6).
    ts = datetime.datetime(2024, 12, 30, 10, 11, 45)
    df = spark.createDataFrame([(ts,)], ["ts"])
    row = df.select(
        minute_bucket("ts").alias("m"), ds_from_ts("ts").alias("ds")
    ).first()
    assert row.m == datetime.datetime(2024, 12, 30, 10, 11, 0)
    assert row.ds == "20241230"


def test_decimal_20_0_headroom(spark):
    # F9: unsigned BIGINT max (2^64-1) must fit in decimal(20,0).
    big = 18446744073709551615
    df = spark.createDataFrame([(str(big),)], ["v"])
    row = df.select(F.col("v").cast(T.DecimalType(20, 0)).alias("d")).first()
    assert row.d == Decimal(big)


def test_paren_description_and_prefix(spark):
    df = spark.createDataFrame(
        [("GigabitEthernet0/1(uplink to core): stats",), ("no-paren",)], ["name"]
    )
    rows = df.select(
        paren_description("name").alias("desc"),
        prefix_before("name").alias("iface"),
    ).collect()
    assert rows[0].desc == "uplink to core"
    assert rows[0].iface == "GigabitEthernet0/1(uplink to core)"
    assert rows[1].desc == ""  # regexp_extract non-match => empty string (P9 gate)


def test_shift_hours_and_date_parts(spark):
    ts = datetime.datetime(2024, 1, 1, 20, 30, 15)
    df = spark.createDataFrame([(ts,)], ["ts"])
    shifted = shift_hours("ts")
    parts = date_parts(shifted)
    row = df.select(
        shifted.alias("s"), *[v.alias(k) for k, v in parts.items()]
    ).first()
    # +7h crosses midnight: 2024-01-02 03:30:15
    assert row.s == datetime.datetime(2024, 1, 2, 3, 30, 15)
    assert (row.tahun, row.bulan, row.tanggal) == ("2024", "01", "02")
    assert (row.jam, row.menit) == ("03", "30")
    assert row.waktu_string == "02-01-2024 03:30:15"


def test_composite_key(spark):
    df = spark.createDataFrame([Row(a="x", b="y", c="z")])
    assert df.select(composite_key("a", "b", "c").alias("k")).first().k == "x - y - z"
