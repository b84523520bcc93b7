"""The engine's scalar function library as Spark 4 SQL UDFs.

``CREATE FUNCTION ... RETURNS ... RETURN <expr>`` (SQL-defined scalar
functions, new in Spark 4) lets SQL-first users call the engine's
deterministic kernel — exact money, md5 hashing, the reference's date
derivations — without touching Python.  The defining property: a SQL
UDF INLINES into the plan at analysis time (it is a macro, not a
black-box), so Catalyst still pushes filters through it, whole-stage
codegen still fires, and the 100 TB cost model is identical to writing
the expression by hand.  Contrast a Python UDF, which fences the
optimizer out and serializes every row.

Each definition mirrors the Column-API twin in `functions/` and the
oracle conventions (cents == `plans/analytics_queries.cents`, h32/h60
== `functions/hashing`), so SQL text using these functions is
oracle-checkable like everything else.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name -> (signature, return type, body) — bodies are pure SQL
#: expressions over the arguments, never subqueries (inlining contract)
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # exact integer money — plans/analytics_queries.cents
    "cents": ("x DOUBLE", "BIGINT", "CAST(round(x * 100, 0) AS BIGINT)"),
    # deterministic unsigned-32/60-bit md5 hashes — functions/hashing
    "h32": (
        "s STRING",
        "BIGINT",
        "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)",
    ),
    "h60": (
        "s STRING",
        "BIGINT",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)",
    ),
    # the reference's ds/date derivations — functions/timeparts
    "ds_of": ("ts TIMESTAMP", "STRING", "date_format(ts, 'yyyyMMdd')"),
    "minute_bucket": (
        "ts TIMESTAMP, minutes INT",
        "TIMESTAMP",
        "timestamp_seconds(CAST(floor(unix_timestamp(ts) / (minutes * 60)) "
        "AS BIGINT) * minutes * 60)",
    ),
    # floor-division week bucket (ADVICE r5: cast truncates toward zero)
    "week_bucket": (
        "d DATE, epoch DATE",
        "BIGINT",
        "CAST(floor(datediff(d, epoch) / 7) AS BIGINT)",
    ),
    # null-propagating add — the reference's F13 semantics
    "nn_add": ("a DOUBLE, b DOUBLE", "DOUBLE", "a + b"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every library function as a TEMPORARY SQL UDF on this
    session; returns the registered names.  Idempotent (OR REPLACE)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
