"""SQL UDF library: definitions inline as macros (no Python evaluator,
codegen intact) and agree with their Column-API twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portofolio_spark.catalog import load_table
from etl_portofolio_spark.functions.sqludf import register_sql_functions
from tests.conftest import SF_DIR


def test_registration_idempotent_and_callable(spark):
    names = register_sql_functions(spark)
    names2 = register_sql_functions(spark)  # OR REPLACE: no error
    assert names == names2 and "cents" in names
    r = spark.sql(
        "SELECT cents(12.345) AS c, h32('abc') AS h, h60('abc') AS h6, "
        "ds_of(TIMESTAMP '2024-01-02 03:04:05') AS d, "
        "week_bucket(DATE '2023-12-25', DATE '2024-01-01') AS w, "
        "minute_bucket(TIMESTAMP '2024-01-02 03:04:05', 5) AS mb, "
        "nn_add(1.5, NULL) AS na"
    ).first()
    assert r["c"] == 1235
    assert r["w"] == -1  # floor division: pre-epoch lands one week EARLY
    assert r["na"] is None  # null propagates


def test_sql_udf_matches_column_twin(spark):
    from etl_portofolio_spark.functions.hashing import h32, h60
    from etl_portofolio_spark.plans.analytics_queries import cents

    register_sql_functions(spark)
    orders = load_table(spark, SF_DIR, "orders").limit(500)
    orders.createOrReplaceTempView("o_sqludf_twin")
    via_sql = spark.sql(
        "SELECT o_orderkey, cents(o_totalprice) AS c, "
        "h32(CAST(o_custkey AS STRING)) AS h, "
        "h60(CAST(o_custkey AS STRING)) AS h6 FROM o_sqludf_twin"
    )
    via_col = orders.select(
        "o_orderkey",
        cents("o_totalprice").alias("c"),
        h32(F.col("o_custkey").cast("string")).alias("h"),
        h60(F.col("o_custkey").cast("string")).alias("h6"),
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_col.collect())
    )


def test_sql_udf_inlines_no_python_node(spark):
    """The macro contract: the analyzed plan contains NO Python/Batch
    eval node and the filter through a UDF still reaches the scan."""
    register_sql_functions(spark)
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("o_inline")
    df = spark.sql(
        "SELECT ds_of(o_orderdate) AS ds, cents(o_totalprice) AS c "
        "FROM o_inline WHERE cents(o_totalprice) > 1000"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # codegen stages carry the `*` prefix in formatted mode, and the
    # macro body is visibly inlined into the projection
    assert "* Project" in plan and "* Filter" in plan
    assert "cast(round((o_totalprice" in plan
