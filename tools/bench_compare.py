"""Compare two bench JSON records with load/spread awareness.

The round-4 lesson (VERDICT r4): a bench recorded under machine load
showed 2-10x "regressions" in code nobody touched. This tool is the
triage step that distinguishes a real regression from a noisy record:

- per-query delta of the MEDIANS, flagged only beyond a threshold;
- each flag annotated with both runs' (min, median, max) spread and
  loadavg, because a max >> median spread or a high loadavg_before
  marks the RECORD as untrustworthy, not the code;
- exits 1 only if a flagged query is NOT explainable by spread/load
  (its min — the least-contended pass — also regressed).

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
"""

from __future__ import annotations

import argparse
import json


def compare(old: dict, new: dict, threshold: float) -> tuple[list[dict], bool]:
    flags: list[dict] = []
    hard = False
    common = sorted(set(old["queries"]) & set(new["queries"]))
    for q in common:
        o, n = old["queries"][q], new["queries"][q]
        if o <= 0:
            continue
        ratio = n / o
        if ratio < threshold and ratio > 1 / threshold:
            continue
        o_spread = old.get("spread", {}).get(q, [o, o, o])
        n_spread = new.get("spread", {}).get(q, [n, n, n])
        # the least-contended pass is the load-robust signal: if NEW's
        # min also regressed past threshold vs OLD's min, load can't
        # explain it away
        min_ratio = n_spread[0] / o_spread[0] if o_spread[0] > 0 else ratio
        explainable = ratio > 1 and min_ratio < threshold
        flags.append(
            {
                "query": q,
                "old_median": o,
                "new_median": n,
                "ratio": round(ratio, 3),
                "old_spread": o_spread,
                "new_spread": n_spread,
                "min_ratio": round(min_ratio, 3),
                "verdict": (
                    "noise (min pass unregressed)"
                    if explainable
                    else ("improvement" if ratio < 1 else "REGRESSION")
                ),
            }
        )
        if not explainable and ratio > 1:
            hard = True
    return flags, hard


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    def load(path: str) -> dict:
        with open(path) as fh:
            rec = json.load(fh)
        # driver BENCH_r*.json wraps the bench line under "parsed"
        return rec["parsed"] if "parsed" in rec and "queries" not in rec else rec

    old = load(args.old)
    new = load(args.new)
    flags, hard = compare(old, new, args.threshold)
    print(
        json.dumps(
            {
                "old_loadavg": old.get("loadavg_before"),
                "new_loadavg": new.get("loadavg_before"),
                "n_common": len(set(old["queries"]) & set(new["queries"])),
                "flags": flags,
                "hard_regression": hard,
            },
            indent=2,
        )
    )
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
