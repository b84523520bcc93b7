"""Schema-evolution reads: old files, new contract, one frame.

A long-lived table's parquet files were written under different schema
versions (columns added, columns retired, types widened).  The
reference re-creates tables wholesale; a 100 TB warehouse cannot — it
reads ALL vintages through the CURRENT contract:

- ``mergeSchema`` unions the per-file schemas at planning time (one
  footer pass, no data read);
- the declared target schema then projects that union: columns absent
  from old vintages surface as NULL (never an error), retired columns
  drop, and numeric widening (int→long, float→double, and decimal
  scale growth) applies by explicit cast;
- anything else — a type NARROWING or an incompatible change — raises
  loudly at plan time.  Silent coercion is how a string-typed `id`
  corrupts a join three jobs downstream; the contract check belongs at
  the read boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: permitted source→target numeric widenings (lossless)
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double"},
    "smallint": {"int", "bigint", "double"},
    "int": {"bigint", "double"},
    "bigint": {"double"},  # documented lossy-above-2^53; standard practice
    "float": {"double"},
    "date": {"timestamp"},
}


class SchemaEvolutionError(TypeError):
    """The on-disk schema cannot reach the target contract losslessly."""


def _compatible(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    s, d = src.simpleString(), dst.simpleString()
    if d in _WIDENINGS.get(s, ()):
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        # scale/precision may only grow, and integer digits must fit
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    return False


def _project_to_target(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project one frame to the target contract: NULL-fill added
    columns, drop retired ones, cast widenings, raise on narrowing."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            # column added after old vintages were written: NULL-fill
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        src = have[field.name]
        if not _compatible(src, field.dataType):
            raise SchemaEvolutionError(
                f"column '{field.name}': on-disk {src.simpleString()} cannot "
                f"losslessly become {field.dataType.simpleString()} — "
                "narrowing/incompatible changes need an explicit migration"
            )
        cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def _read_vintages_grouped(
    spark: SparkSession, path: str, target: T.StructType
) -> DataFrame:
    """Cross-vintage TYPE-change path: ``mergeSchema`` itself refuses
    to merge int-vs-bigint footers, so group the files by physical
    schema (footer metadata only — no data pages), read each group
    with its own exact schema, cast every group to the target contract,
    and union.  Group count is bounded by the number of schema
    VERSIONS ever deployed (a handful), not by file count, so the plan
    is a union of a few ordinary pruned scans — 100 TB-safe.
    """
    import pyarrow.parquet as pq

    from etl_portofolio_spark.sources.skipping import _data_files

    groups: dict[str, list[str]] = {}
    for f in _data_files(path):
        key = str(pq.ParquetFile(f).schema_arrow)
        groups.setdefault(key, []).append(f)
    if not groups:
        raise SchemaEvolutionError(f"no parquet data files under {path}")
    parts = [
        _project_to_target(
            spark.read.option("basePath", path).parquet(*files), target
        )
        for files in groups.values()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_with_evolution(
    spark: SparkSession, path: str, target_schema: T.StructType | str
) -> DataFrame:
    """Read every file vintage under ``path`` projected to the target
    contract (see module docstring for the rules)."""
    target = (
        T.StructType.fromDDL(target_schema)
        if isinstance(target_schema, str)
        else target_schema
    )
    try:
        merged = spark.read.option("mergeSchema", "true").parquet(path)
        return _project_to_target(merged, target)
    except SchemaEvolutionError:
        raise
    except Exception as exc:
        # Spark's own footer merge refuses numeric type changes
        # ("Failed to merge fields") before our contract check can run;
        # fall back to per-vintage reads and apply the contract there.
        if "merge" not in str(exc).lower():
            raise
        return _read_vintages_grouped(spark, path, target)
