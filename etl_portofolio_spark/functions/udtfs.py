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


#: output schema of token_runs — (1-based start index, token, run length)
TOKEN_RUNS_SCHEMA = "start_idx int, token string, run_len int"


@udtf(returnType=TOKEN_RUNS_SCHEMA)
class TokenRuns:
    """Maximal runs of consecutive identical whitespace tokens with
    length >= 2 — the repeated-token spans a repetition filter inspects.

    Genuinely imperative row expansion (one linear pass, state = the
    open run); the declarative twin is a gaps-and-islands window chain,
    which is exactly what the DuckDB oracle of ``udtf_token_runs``
    uses — the UDTF and the islands SQL must agree row-for-row.
    """

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        toks = [t for t in text.split(" ") if t != ""]
        i = 0
        for j in range(1, len(toks) + 1):
            if j == len(toks) or toks[j] != toks[i]:
                if j - i >= 2:
                    yield i + 1, toks[i], j - i
                i = j


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's table functions on a session (idempotent);
    after this, ``xml_records`` and ``token_runs`` are callable from SQL."""
    spark.udtf.register("xml_records", XmlRecords)
    spark.udtf.register("token_runs", TokenRuns)
