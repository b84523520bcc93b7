"""Feed-health monitor job: audit composition with fault isolation."""

from __future__ import annotations

from etl_portofolio_spark.jobs.monitor_feeds import run_monitor

from .conftest import SF_DIR


def test_monitor_runs_all_audits_and_summarizes(spark):
    out = run_monitor(spark, SF_DIR)
    audits = {k for k in out if k != "any_alert"}
    assert audits == {
        "revenue_anomaly",
        "referential_integrity",
        "distribution_drift",
        "fd_contracts",
        "source_dup_rate",
    }
    # no audit errored on the healthy fixture
    assert all(out[a]["error"] is None for a in audits), out
    # the fixture is referentially intact and the key FD holds
    assert out["referential_integrity"]["alert"] is False
    assert out["fd_contracts"]["alert"] is False
    assert isinstance(out["any_alert"], bool)
    assert out["any_alert"] == any(out[a]["alert"] for a in audits)


def test_monitor_survives_a_broken_audit(spark, monkeypatch):
    """A failing audit reports itself as an alert with the error —
    the rest of the audits still run."""
    import etl_portofolio_spark.jobs.monitor_feeds as m

    broken = dict(m._AUDITS)
    broken["revenue_anomaly"] = (
        "daily_revenue_anomaly",
        lambda df: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    monkeypatch.setattr(m, "_AUDITS", broken)
    out = m.run_monitor(spark, SF_DIR)
    assert out["revenue_anomaly"]["alert"] is True
    assert "boom" in out["revenue_anomaly"]["error"]
    assert out["referential_integrity"]["error"] is None
    assert out["any_alert"] is True
