"""JSONL corpus source with corrupt-record quarantine.

The standard LLM-corpus interchange format (one JSON doc per line,
usually gzipped at rest) read the way a 100 TB ingest has to be read:

- schema DECLARED, never inferred (inference is a full extra pass over
  the data and races against schema drift);
- PERMISSIVE mode with a ``_corrupt_record`` column — a broken line
  quarantines as data instead of killing the job (corrupt rates are
  never zero at corpus scale);
- good/quarantine split returned as two frames off one scan, so the
  caller writes accepted docs and a quarantine audit without re-reading.

Spark's JSON reader retains ONLY the corrupt column for quarantined
lines (all declared fields null), so the split predicate is just
``_corrupt_record IS NULL`` — no heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> DataFrame:
    """Read JSONL with the declared ``schema`` plus the quarantine column.

    ``schema`` is the DDL of the EXPECTED fields; the corrupt column is
    appended automatically. Extra fields in valid lines are dropped
    (projection, not an error); missing fields read as null — the
    permissive contract a heterogeneous corpus needs.
    """
    full_schema = f"{schema}, {CORRUPT_COL} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """(accepted, quarantined) split off one JSONL scan.

    ``accepted`` carries the declared columns; ``quarantined`` carries
    ``raw_line`` (the offending text, for audit/replay) alongside the
    declared columns — all null for corrupt rows, but KEPT on purpose:
    Spark refuses a query whose only scan reference is the internal
    corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), and the documented cache() workaround is a non-starter at
    ingest scale. Both frames are lazy projections of the same read.
    """
    raw = read_jsonl(spark, path, schema)
    accepted = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantined = raw.where(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_line"
    )
    return accepted, quarantined
