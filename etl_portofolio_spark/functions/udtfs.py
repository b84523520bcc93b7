"""Python UDTFs (Spark 4 table functions) — the §2.9 surface.

The reference's XML idiom (`Ingestion Data (XML).py:91-132`) parses
API payloads in driver pandas; the engine's primary replacement is the
executor-side Python DataSource (``sources/http_xml.py``).  This
module adds the TABLE-FUNCTION form of the same capability: a
registered UDTF makes payload explosion available to the SQL-string
surface — ``SELECT p.id, x.* FROM payloads p, LATERAL
xml_records(p.xml) x`` — so ad-hoc SQL users flatten semi-structured
blobs without a Python pipeline.  Each input row is parsed once on an
executor; fan-out is per-payload records, never a driver loop.

Quarantine contract (same philosophy as ``sources/jsonl.py``): a
malformed payload yields exactly one row tagged ``__corrupt__``
carrying the parser error — the read never dies, bad rows stay
observable and routable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: output schema of xml_records — declared once, stable for SQL users
XML_RECORDS_SCHEMA = "idx int, tag string, text string, attrs string"


@udtf(returnType=XML_RECORDS_SCHEMA)
class XmlRecords:
    """Flatten the child elements of an XML document into rows:
    (index, tag name, text content, attributes as a JSON object)."""

    def eval(self, xml: str):  # noqa: D102 - UDTF contract
        import json
        import xml.etree.ElementTree as ET

        if xml is None:
            return
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as e:
            yield -1, "__corrupt__", str(e), "{}"
            return
        for i, child in enumerate(root):
            yield (
                i,
                child.tag,
                (child.text or "").strip(),
                json.dumps(dict(child.attrib), sort_keys=True),
            )


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's table functions on a session (idempotent);
    after this, ``xml_records`` is callable from SQL."""
    spark.udtf.register("xml_records", XmlRecords)
