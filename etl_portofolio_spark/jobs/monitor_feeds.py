"""Feed-health monitoring job — the nightly audit composition.

The engine ships the individual audit queries (anomaly z-scores,
referential integrity, schema/distribution drift, FD contracts,
per-source dup rates); a platform team schedules them TOGETHER and
pages on a single verdict.  This job is that composition: run the
audit set against one scale-factor directory, reduce each result to a
pass/alert verdict with its evidence rows, and return the summary a
scheduler logs or routes to an alert channel.

Scale shape: each audit is one of the registry's bounded-output
queries (reports are O(bands)/O(stages)/O(sources) rows no matter the
fact-table size), so the job's driver memory is bounded by report
sizes, never data.  Audits run sequentially in one session — at
100 TB each is its own Spark job; nothing here holds executor
resources between audits.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_portofolio_spark.session import build_session


def _alert_anomaly(df: DataFrame) -> tuple[bool, list]:
    """daily_revenue_anomaly: alert on any |z| > 3 day (2-3 is watch)."""
    rows = df.where(F.abs(F.col("zscore")) > 3.0).collect()
    return (len(rows) > 0, rows)


def _alert_integrity(df: DataFrame) -> tuple[bool, list]:
    """referential_integrity_report: alert on any orphan count > 0."""
    rows = [r for r in df.collect() if r["n_orphans"] > 0]
    return (len(rows) > 0, rows)


def _alert_psi(df: DataFrame) -> tuple[bool, list]:
    """histogram_drift_psi: alert when total PSI exceeds 0.25 (the
    classic re-train / investigate threshold; 0.1-0.25 is watch)."""
    total = df.agg(F.sum(F.abs(F.col("psi_term"))).alias("psi")).first()["psi"]
    return (total is not None and total > 0.25, [("total_psi", total)])


def _alert_fd(df: DataFrame) -> tuple[bool, list]:
    """fd_violation_audit: alert when a contract-marked FD (the key FD)
    shows ANY violations; measured FDs report but don't page."""
    rows = [
        r
        for r in df.collect()
        if r["fd"] == "partkey_determines_brand" and r["n_violating_keys"] > 0
    ]
    return (len(rows) > 0, rows)


def _alert_dup_rate(df: DataFrame, threshold: float = 0.5) -> tuple[bool, list]:
    """dedup_rate_by_source: alert on any source above the dup-share
    threshold — that feed's ingest budget is mostly waste."""
    rows = [r for r in df.collect() if r["dup_share"] > threshold]
    return (len(rows) > 0, rows)


#: audit name -> (query name in the registry, verdict reducer)
_AUDITS: dict[str, tuple[str, Callable[[DataFrame], tuple[bool, list]]]] = {
    "revenue_anomaly": ("daily_revenue_anomaly", _alert_anomaly),
    "referential_integrity": ("referential_integrity_report", _alert_integrity),
    "distribution_drift": ("histogram_drift_psi", _alert_psi),
    "fd_contracts": ("fd_violation_audit", _alert_fd),
    "source_dup_rate": ("dedup_rate_by_source", _alert_dup_rate),
}


def run_monitor(spark: SparkSession, sf_dir: str) -> dict[str, Any]:
    """Run the audit set; returns {audit: {alert, evidence, error}}.

    A failing AUDIT never kills the run — it reports as its own alert
    with the error attached (a monitoring job that dies on its first
    broken check leaves every later check dark)."""
    import __spark_entry__ as entry

    queries = entry.queries()
    out: dict[str, Any] = {}
    for audit, (qname, reduce_fn) in _AUDITS.items():
        try:
            df = queries[qname](spark, sf_dir)
            alert, evidence = reduce_fn(df)
            out[audit] = {
                "alert": alert,
                "evidence": [tuple(e) for e in evidence],
                "error": None,
            }
        except Exception as e:  # noqa: BLE001 - monitoring must not die
            out[audit] = {"alert": True, "evidence": [], "error": repr(e)}
    out["any_alert"] = any(
        v["alert"] for k, v in out.items() if isinstance(v, dict)
    )
    return out


def main() -> None:  # pragma: no cover - thin CLI wrapper
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    args = ap.parse_args()
    spark = build_session("monitor_feeds")
    print(run_monitor(spark, args.sf_dir))


if __name__ == "__main__":  # pragma: no cover
    main()
