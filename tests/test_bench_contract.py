"""Bench contract-line guard (VERDICT r7 item #1).

The driver keeps only a ~2,000-char tail of stdout and parses the LAST
line as the bench headline. Round 7 lost its headline (`BENCH_r07.json`
parsed:null) because the contract line embedded the full per-query map.
These tests pin the fixed-size-scalars-only shape so registry growth can
never push the line past the tail again.
"""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    # Names at the long end of the real registry's distribution
    # (e.g. "dedup_incremental_novel", "shapley_channel_attribution").
    return {f"very_long_query_name_number_{i:04d}_extra": 1.234 for i in range(n)}


def test_contract_line_fits_driver_tail_at_400_queries():
    line = bench.render_contract_line(_fake_timings(400), sf=0.1, passes=3)
    assert len(line) < 1800, f"contract line {len(line)} chars — driver tail is ~2000"


def test_contract_line_per_query_map_is_budgeted():
    """r10 verdict item #2: the line carries a per-query map again — but
    budgeted (most-expensive-first, greedy fill), never the full map, so
    registry growth can never push the line out of the driver tail."""
    rec = json.loads(bench.render_contract_line(_fake_timings(400), sf=0.1, passes=3))
    assert rec["metric"] == "headline_total"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["passes"] == 3
    assert rec["n_queries"] == 400
    assert isinstance(rec["value"], float)
    # map present, non-trivial, but NOT the full 400 entries
    assert isinstance(rec["queries"], dict)
    assert 10 <= len(rec["queries"]) < 400
    assert all(isinstance(v, float) for v in rec["queries"].values())


def test_contract_line_queries_map_covers_cost_tier_in_order():
    """The budgeted map is filled by DESCENDING cost, so the expensive
    tier (what PERF's round-over-round geomean needs) is always in it."""
    timings = {f"q{i:03d}": float(i) for i in range(100)}
    rec = json.loads(bench.render_contract_line(timings, sf=0.1, passes=3))
    kept = rec["queries"]
    assert kept["q099"] == 99.0
    dropped = [v for k, v in timings.items() if k not in kept]
    # the kept set is exactly the top-|kept| by cost
    if dropped:
        assert min(kept.values()) >= max(dropped)


def test_contract_line_value_is_sum_of_medians():
    timings = {"a": 1.0, "b": 2.5, "c": 0.25}
    rec = json.loads(bench.render_contract_line(timings, sf=0.01, passes=1))
    assert rec["value"] == 3.75
    assert rec["n_queries"] == 3


def test_bench_compare_noise_floor_and_threshold():
    """A sub-second fixture query swinging 2x but under the absolute
    floor must NOT flag; a real multi-second regression must."""
    import tools.bench_compare as bc

    def rec(spread):
        return {
            "metric": "headline_detail",
            "loadavg_before": [0.5, 0.5, 0.5],
            "spread": spread,
        }

    old = rec({"tiny": [0.10, 0.11, 0.12], "big": [2.0, 2.1, 2.2]})
    new = rec({"tiny": [0.19, 0.20, 0.21], "big": [3.5, 3.6, 3.7]})
    out = bc.compare(old, new, threshold=1.5)
    flagged = {f["query"]: f["verdict"] for f in out["flags"]}
    assert "tiny" not in flagged  # 1.9x ratio but 0.09 s absolute: noise
    assert flagged["big"].startswith("REGRESSION")
    assert out["hard_regression"] is True


def test_contract_line_top10_names_only_fixed_count():
    """The cost-tier hint is NAMES ONLY (no times), capped at 10 with
    per-name truncation — fixed-size by construction."""
    timings = {f"q{i}": float(i) for i in range(20)}
    timings["x" * 100] = 99.0
    rec = json.loads(bench.render_contract_line(timings, sf=0.1, passes=3))
    assert len(rec["top10"]) == 10
    # most expensive: truncated to 34-char prefix + ~ + 5-hex digest
    assert rec["top10"][0].startswith("x" * 34 + "~")
    assert len(rec["top10"][0]) == 40
    assert rec["top10"][1:4] == ["q19", "q18", "q17"]
    assert all(isinstance(n, str) for n in rec["top10"])


def test_contract_line_top10_truncation_stays_unique():
    """Two queries sharing a 40-char prefix must remain distinguishable
    in the driver artifact (r9-advice): the hash suffix disambiguates."""
    shared = "shared_prefix_" + "a" * 40
    timings = {shared + "_one": 9.0, shared + "_two": 8.0}
    rec = json.loads(bench.render_contract_line(timings, sf=0.1, passes=1))
    assert len(set(rec["top10"])) == 2
    assert all(len(n) == 40 for n in rec["top10"])


def test_bench_compare_drift_canary_gates_phantom_flags():
    """r9 verdict item #3: when the never-touched canary queries move
    >25% between records, every REGRESSION verdict downgrades to a
    re-bench annotation and the exit stays 0 — no more hand-adjudicating
    phantom flags from ambient host drift."""
    import tools.bench_compare as bc

    def rec(spread):
        return {
            "metric": "headline_detail",
            "loadavg_before": [0.5, 0.5, 0.5],
            "spread": spread,
        }

    canary = bc.CANARIES[0]
    old = rec({canary: [0.50, 0.55, 0.60], "big": [2.0, 2.1, 2.2]})
    # canary +60% on untouched code => drift; big's 1.75x must not be hard
    new = rec({canary: [0.80, 0.85, 0.90], "big": [3.5, 3.6, 3.7]})
    out = bc.compare(old, new, threshold=1.5)
    assert out["canary"]["drifted"] is True
    assert out["load_gated"] is False
    assert out["gated"] is True
    assert out["hard_regression"] is False
    flagged = {f["query"]: f["verdict"] for f in out["flags"]}
    assert "canary drift" in flagged["big"]

    # stable canaries: the same regression IS hard
    new_stable = rec({canary: [0.51, 0.56, 0.61], "big": [3.5, 3.6, 3.7]})
    out2 = bc.compare(old, new_stable, threshold=1.5)
    assert out2["canary"]["drifted"] is False
    assert out2["hard_regression"] is True
