"""Compare two bench JSON records on min-of-passes under a loadavg gate.

The round-4 lesson (VERDICT r4): a bench recorded under machine load
showed 2-10x "regressions" in code nobody touched. And the r6->r7
lesson (VERDICT r7 item #6): even MEDIANS drift +15% round-over-round
from ambient load alone. This tool is the triage step, and its primary
signal is the MIN of the recorded passes — the least-contended pass —
under an explicit loadavg annotation, so the next reader doesn't have
to re-derive "that +15% was load":

- per-query r-over-r ratios computed from `spread` MINIMA for every
  common query (medians reported alongside for context);
- both records' loadavg carried into the output, plus a `load_gate`
  verdict when either record was captured on a busy box (1-min
  loadavg > 25% of the bench's 32 CPUs) — ratios from a gated record
  are annotated as untrustworthy rather than silently compared;
- a DRIFT CANARY (r9 verdict item #3): three never-touched control
  queries are ratio-checked first; if any moves >25% the host drifted
  BETWEEN captures (thermal/clock drift the at-capture loadavg gate
  cannot see) and the record is annotated drift-untrusted instead of
  emitting phantom flags;
- exits 1 only on a hard regression: the min-of-passes ratio exceeds
  the threshold AND the comparison is neither load-gated nor
  canary-drifted.

Accepts three record shapes: the bench's `headline_detail` line (has
`spread`), the legacy contract line (has `queries` medians), and the
driver's BENCH_r*.json wrapper (`parsed`).

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]\n(flags additionally require >= 0.25 s absolute min-of-passes movement)
"""

from __future__ import annotations

import argparse
import json

#: 1-min loadavg above this marks a record as load-gated (25% of the
#: 32-thread bench box — beyond it, pass minima still co-ran with
#: other work and even they can't be trusted).
LOAD_GATE = 8.0


def _per_query(rec: dict) -> tuple[dict[str, float], dict[str, float]]:
    """(minima, medians) per query from a bench record.

    Prefers `spread` ([min, median, max] per query, the detail line);
    falls back to `queries` (medians only, the legacy contract line),
    where min == median is the best available estimate.
    """
    spread = rec.get("spread")
    if spread:
        return (
            {q: s[0] for q, s in spread.items()},
            {q: s[1] for q, s in spread.items()},
        )
    qs = rec.get("queries", {})
    return dict(qs), dict(qs)


def _load_gated(rec: dict) -> bool:
    la = rec.get("loadavg_before")
    return bool(la) and la[0] > LOAD_GATE


#: sub-second floor: a ratio flag needs at least this much ABSOLUTE
#: movement in the min-of-passes — 0.2 s swings on 0.3 s fixture-cache
#: queries are scheduler noise, not plan changes (r9b triage lesson)
MIN_ABS_DELTA_S = 0.25

#: drift canaries (r9 verdict item #3): stable, never-touched control
#: queries whose code has not changed since round 2. When their
#: min-of-passes moves more than CANARY_TOL between the two records,
#: the HOST drifted between captures (the loadavg gate only sees load
#: present AT capture time, not a slower-clocked / thermally-throttled
#: window) — the whole comparison is annotated drift-untrusted instead
#: of flagging phantom regressions a human then has to adjudicate.
CANARIES = ("agg_pricing_summary", "window_top_orders", "join_region_revenue")
CANARY_TOL = 0.25


def _canary_verdict(
    old_min: dict[str, float], new_min: dict[str, float]
) -> dict:
    moves = {}
    for q in CANARIES:
        if q in old_min and q in new_min and old_min[q] > 0:
            moves[q] = round(new_min[q] / old_min[q], 3)
    drifted = any(abs(r - 1.0) > CANARY_TOL for r in moves.values())
    return {
        "queries": moves,
        "tolerance": CANARY_TOL,
        "drifted": drifted,
        "note": (
            "canary min-of-passes moved >25% on untouched code — "
            "host conditions differ between records; ratios are "
            "drift-untrusted" if drifted else "canaries stable"
        ),
    }


def compare(old: dict, new: dict, threshold: float) -> dict:
    old_min, old_med = _per_query(old)
    new_min, new_med = _per_query(new)
    canary = _canary_verdict(old_min, new_min)
    load_gated = _load_gated(old) or _load_gated(new)
    gated = load_gated or canary["drifted"]
    common = sorted(set(old_min) & set(new_min))
    ratios: dict[str, float] = {}
    flags: list[dict] = []
    hard = False
    for q in common:
        if old_min[q] <= 0:
            continue
        min_ratio = new_min[q] / old_min[q]
        ratios[q] = round(min_ratio, 3)
        if 1 / threshold < min_ratio < threshold:
            continue
        if abs(new_min[q] - old_min[q]) < MIN_ABS_DELTA_S:
            continue  # ratio trips but the absolute delta is noise-scale
        regressed = min_ratio >= threshold
        flags.append(
            {
                "query": q,
                "min_ratio": round(min_ratio, 3),
                "old_min": old_min[q],
                "new_min": new_min[q],
                "old_median": old_med.get(q),
                "new_median": new_med.get(q),
                "verdict": (
                    "REGRESSION (min-of-passes)"
                    if regressed and not gated
                    else (
                        (
                            "regression? (canary drift — re-bench under "
                            "matched conditions)"
                            if canary["drifted"]
                            else "regression? (record load-gated, re-bench idle)"
                        )
                        if regressed
                        else "improvement"
                    )
                ),
            }
        )
        if regressed and not gated:
            hard = True
    return {
        "old_loadavg": old.get("loadavg_before"),
        "new_loadavg": new.get("loadavg_before"),
        "load_gate": LOAD_GATE,
        "load_gated": load_gated,
        "canary": canary,
        # either gate (loadavg at capture, or canary drift between
        # captures) downgrades REGRESSION verdicts to "re-bench"
        "gated": gated,
        # a record without `spread` degrades to median==min — its
        # ratios lose the load robustness the min signal provides
        "old_has_spread": bool(old.get("spread")),
        "new_has_spread": bool(new.get("spread")),
        "n_common": len(common),
        "min_of_passes_ratios": ratios,
        "flags": flags,
        "hard_regression": hard,
    }


def _load(path: str) -> dict:
    """Load a bench record from any of its shapes.

    Handles a single JSON object (idle artifact or driver BENCH_r*.json
    wrapper with `parsed`) and raw captured stdout (Spark log noise +
    the headline_detail and contract JSON lines) — all JSON lines found
    are merged, so `spread` and `queries` both survive when present.
    """
    with open(path) as fh:
        text = fh.read()
    try:
        rec = json.loads(text)
    except ValueError:
        rec = {}
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict):
                rec.update(obj)
        if not rec:
            raise SystemExit(f"{path}: no JSON object or JSON lines found")
    # driver BENCH_r*.json wraps the bench line under "parsed"
    if "parsed" in rec and "queries" not in rec and "spread" not in rec:
        return rec["parsed"] or {}
    return rec


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    report = compare(_load(args.old), _load(args.new), args.threshold)
    print(json.dumps(report, indent=2))
    return 1 if report["hard_regression"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
