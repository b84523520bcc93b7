"""Runnable job equivalents of the reference's three scripts.

| reference script | job here | cadence |
|---|---|---|
| `Ingestion Data (XML).py` | :mod:`ingest_xml` | 5-minute windows |
| `Ingestion Data (MySQL).py` | :mod:`ingest_jdbc` | 1-hour windows |
| `Processing Data.py` | :mod:`process_daily` | 1-day windows |

Each job wires engine pieces (sources → transforms → partitioned sink)
through the idempotent IncrementalRunner; configuration comes from env
vars / CLI flags the way the reference reads `os.getenv` (`Ingestion
Data (MySQL).py:89-93`).
"""
