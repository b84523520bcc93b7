"""Schema-evolution reads: vintages unify under the current contract."""

from __future__ import annotations

import pytest

from etl_portofolio_spark.sources.evolving import (
    SchemaEvolutionError,
    read_with_evolution,
)


@pytest.fixture()
def vintaged(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # v1: before `lang` and `quality` existed; has a retired col `tmp_flag`
    spark.createDataFrame(
        [(1, "alpha", True), (2, "beta", False)],
        "id int, text string, tmp_flag boolean",
    ).write.mode("append").parquet(path)
    # v2: columns added, id still int
    spark.createDataFrame(
        [(3, "gamma", "en", 0.5)],
        "id int, text string, lang string, quality double",
    ).write.mode("append").parquet(path)
    return path


def test_vintages_project_to_contract(spark, vintaged):
    df = read_with_evolution(
        spark, vintaged, "id bigint, text string, lang string, quality double"
    )
    assert df.schema.simpleString() == (
        "struct<id:bigint,text:string,lang:string,quality:double>"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3}
    # old vintages NULL-fill the added columns; retired column is gone
    assert rows[1]["lang"] is None and rows[1]["quality"] is None
    assert rows[3]["lang"] == "en" and rows[3]["quality"] == 0.5
    assert "tmp_flag" not in df.columns
    # int -> bigint widening applied
    assert isinstance(rows[1]["id"], int)


def test_narrowing_raises_at_plan_time(spark, vintaged):
    with pytest.raises(SchemaEvolutionError, match="text"):
        read_with_evolution(spark, vintaged, "id bigint, text bigint")


def test_decimal_rules(spark, tmp_path):
    path = str(tmp_path / "dec")
    spark.sql("SELECT CAST(1.50 AS DECIMAL(10,2)) AS amt").write.parquet(path)
    ok = read_with_evolution(spark, path, "amt decimal(20,4)")
    assert ok.first()["amt"] is not None
    with pytest.raises(SchemaEvolutionError):
        read_with_evolution(spark, path, "amt decimal(10,1)")  # scale shrink


def test_cross_vintage_type_change_falls_back_to_grouped_reads(spark, tmp_path):
    """mergeSchema itself refuses int-vs-bigint footers; the fallback
    reads each vintage with its own schema and casts to the contract
    (ADVICE r5: the advertised widening contract must actually run)."""
    path = str(tmp_path / "tychange")
    spark.createDataFrame([(1, "a")], "id int, text string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame([(2**40, "b")], "id bigint, text string").write.mode(
        "append"
    ).parquet(path)
    df = read_with_evolution(spark, path, "id bigint, text string")
    assert df.schema.simpleString() == "struct<id:bigint,text:string>"
    assert {r["id"] for r in df.collect()} == {1, 2**40}


def test_cross_vintage_type_change_still_rejects_narrowing(spark, tmp_path):
    path = str(tmp_path / "tynarrow")
    spark.createDataFrame([(1, "a")], "id int, text string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame([(2**40, "b")], "id bigint, text string").write.mode(
        "append"
    ).parquet(path)
    with pytest.raises(SchemaEvolutionError, match="id"):
        # target int: the bigint vintage cannot narrow losslessly
        read_with_evolution(spark, path, "id int, text string")
