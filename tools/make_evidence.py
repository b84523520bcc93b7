"""One-command verification ladder → a single tracked evidence JSON.

Runs, in subprocesses (each with its own Spark session, matching how
the driver invokes the contract):

1. full oracle differential at sf0.01 (the driver's gate scale),
2. full oracle differential at sf0.1 (the 10× scale discipline),
3. altered-layout robustness (local[5], 7 shuffle partitions),
4. the same with AQE disabled,
5. optionally the full pytest suite (``--pytest``),
6. optionally the idle bench (``--bench``; refuses when loadavg is
   high — a load-poisoned bench is worse than none, the r4 lesson).

Writes ``EVIDENCE_<tag>.json`` with pass/fail, durations, loadavg and
the tail of any failing run — the artifact a round commits next to its
code so verdict claims are reviewable as diffs.

Usage: python tools/make_evidence.py [tag] [--pytest] [--bench]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str, cmd: list[str], env: dict | None = None) -> tuple[dict, str]:
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run(
        cmd, cwd=REPO, env=e, capture_output=True, text=True, timeout=3600
    )
    out = proc.stdout + proc.stderr
    ok = proc.returncode == 0 and (
        "ALL OK" in out or "passed" in out or name == "bench"
    )
    rec = {
        "ok": ok,
        "seconds": round(time.time() - t0, 1),
        "returncode": proc.returncode,
    }
    if not ok:
        rec["tail"] = out[-2000:]
    if name == "bench":
        line = [l for l in out.splitlines() if l.startswith('{"metric"')]
        rec["bench"] = json.loads(line[-1]) if line else None
        rec["ok"] = bool(line)
    print(f"  {name}: {'OK' if rec['ok'] else 'FAIL'} ({rec['seconds']}s)")
    return rec, out


def _bench_compare_block(tag: str, bench_out: str) -> dict:
    """Persist the fresh bench's JSON lines as this round's idle
    artifact and compare it (min-of-passes, load-gated) against the
    newest PREVIOUSLY committed idle artifact — the round-over-round
    zero-regression claim as data inside the evidence file, not prose
    in SCALE.md (r8 verdict item #4)."""
    import glob

    sys.path.insert(0, REPO)
    from tools.bench_compare import compare, _load

    # baseline selection: the committed bench_builder_LATEST pointer
    # (stable across clones — file mtimes are checkout artifacts and a
    # glob-by-mtime can silently pick an ancient baseline on a fresh
    # clone); mtime ordering is only the bootstrap fallback
    artifact = os.path.join(REPO, f"bench_builder_{tag}_idle.json")
    pointer = os.path.join(REPO, "bench_builder_LATEST")
    against = None
    if os.path.exists(pointer):
        cand = os.path.join(REPO, open(pointer).read().strip())
        if os.path.exists(cand) and os.path.abspath(cand) != os.path.abspath(
            artifact
        ):
            against = cand
    if against is None:
        prior = sorted(
            (
                p
                for p in glob.glob(os.path.join(REPO, "bench_builder_*.json"))
                if os.path.abspath(p) != os.path.abspath(artifact)
            ),
            key=os.path.getmtime,
        )
        against = prior[-1] if prior else None
    lines = [
        l for l in bench_out.splitlines() if l.strip().startswith("{")
    ]
    with open(artifact, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    if against is None:
        with open(pointer, "w") as fh:
            fh.write(os.path.basename(artifact) + "\n")
        return {"against": None, "note": "no prior idle artifact found"}
    # compare BEFORE repointing LATEST: a corrupt prior artifact must
    # surface as a failed block, not crash the ladder after the pointer
    # already moved (r9-advice)
    try:
        report = compare(_load(against), _load(artifact), threshold=1.5)
    except Exception as exc:  # noqa: BLE001 — any parse/shape failure
        return {
            "against": os.path.basename(against),
            "artifact": os.path.basename(artifact),
            "ok": False,
            "error": f"{type(exc).__name__}: {exc}",
        }
    with open(pointer, "w") as fh:
        fh.write(os.path.basename(artifact) + "\n")
    return {
        "against": os.path.basename(against),
        "artifact": os.path.basename(artifact),
        **report,
    }


def main() -> int:
    args = sys.argv[1:]
    tag = next((a for a in args if not a.startswith("--")), "local")
    results: dict = {"loadavg_start": list(os.getloadavg())}
    py = sys.executable

    results["oracle_sf001"], _ = _run(
        "oracle_sf001", [py, "tools/check_oracle.py", "/root/testdata/sf0.01"]
    )
    results["oracle_sf01"], _ = _run(
        "oracle_sf01", [py, "tools/check_oracle.py", "/root/testdata/sf0.1"]
    )
    results["robustness"], _ = _run(
        "robustness", [py, "tools/robustness_check.py", "/root/testdata/sf0.01"]
    )
    results["robustness_aqe_off"], _ = _run(
        "robustness_aqe_off",
        [py, "tools/robustness_check.py", "/root/testdata/sf0.01"],
        env={"SPARK_GRAFT_ROBUST_AQE": "off"},
    )
    if "--pytest" in args:
        results["pytest"], _ = _run(
            "pytest", [py, "-m", "pytest", "tests/", "-q"]
        )
    if "--bench" in args:
        # the pytest/oracle stages leave the 1-min loadavg elevated for
        # a few minutes; wait for the box to go idle (a load-poisoned
        # bench is worse than none — r4 lesson) rather than skip-fail
        waited = 0
        while os.getloadavg()[0] > 2.0 and waited < 900:
            time.sleep(30)
            waited += 30
        if os.getloadavg()[0] > 2.0:
            # a skip is NEUTRAL for all_ok (external load isn't a code
            # failure) but must be self-evident: the bench stage records
            # only {skipped, reason, waited_s} — no "ok" key, so the
            # all_ok fold never counts a stage that did not run — plus
            # the top-level `skipped` list and all_ok_note (r9-advice)
            print(
                f"  bench: SKIPPED (loadavg {os.getloadavg()[0]:.1f} after "
                f"{waited}s wait — external load, not ours; neutral result)"
            )
            # no "ok" key at all: a stage that never ran is NEITHER
            # green nor red — the all_ok fold skips ok-less dicts and
            # the top-level `skipped` list + all_ok_note carry the story
            results["bench"] = {"skipped": True, "reason": "loadavg", "waited_s": waited}
            results.setdefault("skipped", []).append("bench")
        else:
            if waited:
                print(f"  bench: waited {waited}s for loadavg to settle")
            results["bench"], bench_out = _run("bench", [py, "bench.py"])
            if results["bench"]["ok"]:
                results["bench_compare"] = _bench_compare_block(tag, bench_out)
                # an untrusted (load-gated) comparison isn't a failure,
                # but a hard min-of-passes regression on an idle box is
                results["bench_compare"]["ok"] = not results[
                    "bench_compare"
                ].get("hard_regression", False)
                n_flags = len(results["bench_compare"].get("flags", []))
                print(
                    f"  bench_compare: "
                    f"{'OK' if results['bench_compare']['ok'] else 'REGRESSION'}"
                    f" vs {results['bench_compare'].get('against')}"
                    f" ({n_flags} flags)"
                )
    results["all_ok"] = all(
        v.get("ok")
        for k, v in results.items()
        if isinstance(v, dict) and "ok" in v  # skipped stages carry no ok
    )
    if results.get("skipped"):
        # keep the headline honest: a ladder with skipped stages is
        # "green except <stages>", never plain green
        results["all_ok_note"] = (
            "all_ok covers only the stages that RAN; skipped: "
            + ", ".join(results["skipped"])
        )
    out = os.path.join(REPO, f"EVIDENCE_{tag}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"{'ALL OK' if results['all_ok'] else 'FAILURES'} -> {out}")
    return 0 if results["all_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
