"""Python UDTF surface: xml_records from SQL with LATERAL fan-out."""

from __future__ import annotations

from etl_portofolio_spark.functions.udtfs import register_udtfs


def test_xml_records_lateral_flatten_and_quarantine(spark):
    register_udtfs(spark)
    payloads = spark.createDataFrame(
        [
            (
                1,
                "<resp><row a='1'>x</row><row a='2'>y</row>"
                "<meta source='api'/></resp>",
            ),
            (2, "<resp></resp>"),          # empty: zero records
            (3, "<resp><unterminated>"),   # malformed: quarantine row
        ],
        "id long, xml string",
    )
    payloads.createOrReplaceTempView("payloads")
    rows = spark.sql(
        "SELECT p.id, x.idx, x.tag, x.text, x.attrs "
        "FROM payloads p, LATERAL xml_records(p.xml) x "
        "ORDER BY p.id, x.idx"
    ).collect()
    got = [(r["id"], r["idx"], r["tag"], r["text"], r["attrs"]) for r in rows]
    assert got[0] == (1, 0, "row", "x", '{"a": "1"}')
    assert got[1] == (1, 1, "row", "y", '{"a": "2"}')
    assert got[2] == (1, 2, "meta", "", '{"source": "api"}')
    # malformed payload quarantines as one observable row, never an error
    assert [g for g in got if g[0] == 3] == [
        (3, -1, "__corrupt__", got[-1][3], "{}")
    ]
    assert "not well-formed" in got[-1][3] or "no element found" in got[-1][3]
    # empty doc yields nothing (lateral drops the row)
    assert not [g for g in got if g[0] == 2]


def test_xml_records_reregistration_is_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)  # no error on re-register
    n = spark.sql(
        "SELECT count(*) AS n FROM (SELECT 1) , "
        "LATERAL xml_records('<r><a/><b/></r>')"
    ).first()["n"]
    assert n == 2
