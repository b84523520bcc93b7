"""Audit every unpartitioned (single-partition) window call site.

A `Window.orderBy(...)` without `partitionBy`, a
`Window.partitionBy(F.lit(1))`, or an `OVER ()` inside a Spark
`F.expr` string plans as a WindowExec with ONE partition — fine when
the operand frame is domain-bounded (days, arms, brands, score
panels: cardinality fixed by the domain, not the fact volume),
a scale killer when the operand grows with the data. Spark warns
`WindowExec: No Partition Defined` at runtime; this tool turns that
warning into a reviewable inventory so each site is either documented
or flagged. Two documentation classes:

- **bounded** — the operand's cardinality is fixed by the DOMAIN
  (days, arms, brands, top-N panels, value histograms), not the fact
  volume: the word "bounded" in the enclosing function docstring, or a
  `# bounded: <operand>` comment within two lines above the call.
- **documented-global** — the window IS a deliberate global sort whose
  cost the docstring owns (exact reporting forms with a sketch-based
  scale twin, write-time clustering): a `# global-window: <reason>`
  comment within two lines above the call.

Skipped as non-Spark: `OVER ()` hits inside docstrings, inside a call
to an `oracle_*` helper (e.g. `oracle_bigint(...)` — DuckDB executes
those strings, not Spark), or inside an assignment to a `*_SQL` /
`*_ORACLE`-named constant. The exemption is SPAN-based, not
name-based: an `F.expr("... OVER ()")` is always audited even inside
an exempt span or a function whose name merely contains "sql", and a
module-level `F.expr` constant no longer evades the gate (review
finding r9-advice).

Usage:
  python tools/window_audit.py            # markdown table to stdout
  python tools/window_audit.py --check    # exit 1 on undocumented sites

tests/test_window_audit.py runs --check mode, so a new global window
cannot land without stating its bound.
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "etl_portofolio_spark")

#: call-site patterns that plan as a single-partition WindowExec,
#: matched over the WHOLE FILE TEXT (not per line — a multi-line
#: `Window.partitionBy(\n F.lit(1))` or `Window\n .orderBy(` must not
#: evade the gate; review finding r9):
#: - `Window.orderBy(` directly on the Window class (a chained
#:   `partitionBy(...).orderBy(` never matches — it is preceded by `)`)
#: - `Window.partitionBy(F.lit(1))` in any whitespace layout
#: - SQL `OVER ()` and `OVER (ORDER BY ...)` (ordered but
#:   partitionless) inside Spark F.expr strings, any case
_PATTERNS = (
    re.compile(r"Window\s*\.\s*orderBy\s*\("),
    re.compile(r"Window\s*\.\s*partitionBy\s*\(\s*F\.lit\(\s*1\s*\)\s*\)"),
    re.compile(r"OVER\s*\(\s*\)", re.IGNORECASE),
    re.compile(r"OVER\s*\(\s*ORDER\s+BY", re.IGNORECASE),
)


def _enclosing(tree: ast.Module, lineno: int):
    """Innermost function/class def containing lineno, or None."""
    best = None
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and node.lineno <= lineno <= (node.end_lineno or node.lineno):
            if best is None or node.lineno > best.lineno:
                best = node
    return best


def _in_docstring(fn, lineno: int) -> bool:
    """True when lineno falls inside fn's docstring literal (prose that
    merely MENTIONS a window pattern is not a call site)."""
    if fn is None or not fn.body:
        return False
    first = fn.body[0]
    if isinstance(first, ast.Expr) and isinstance(first.value, ast.Constant):
        return first.lineno <= lineno <= (first.end_lineno or first.lineno)
    return False


def _spans(tree: ast.Module) -> tuple[list, list]:
    """(fexpr_spans, oracle_spans): line ranges of Spark `expr(...)`
    calls (always audited) vs DuckDB-oracle contexts (exempt) — calls
    to `oracle_*` helpers and assignments to `*_SQL`/`*_ORACLE` names."""
    fexpr, oracle = [], []
    #: oracle-builder FUNCTION names: leading/trailing oracle/sql
    #: segments only — `_oracle_bm25`, `_hrw_oracle`, `build_sql` match;
    #: `_build_sql_expr` (sql mid-name) does NOT
    oracle_fn = re.compile(r"^_*(oracle|sql)_|_(oracle|sql)$", re.IGNORECASE)
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fname = (
                node.func.attr
                if isinstance(node.func, ast.Attribute)
                else node.func.id if isinstance(node.func, ast.Name) else None
            )
            if fname == "expr":
                fexpr.append((node.lineno, node.end_lineno or node.lineno))
            elif fname and fname.startswith("oracle"):
                oracle.append((node.lineno, node.end_lineno or node.lineno))
        elif isinstance(node, ast.Assign):
            # oracle-SQL CONSTANT names: a leading/trailing SQL or
            # ORACLE segment (ORACLE_EQUI_DEPTH, _MCNEMAR_SQL, …)
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            if any(
                n.upper().split("_")[0] in ("SQL", "ORACLE")
                or n.upper().strip("_").split("_")[0] in ("SQL", "ORACLE")
                or n.upper().endswith(("SQL", "ORACLE"))
                for n in names
            ):
                oracle.append((node.lineno, node.end_lineno or node.lineno))
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if oracle_fn.search(node.name):
                oracle.append((node.lineno, node.end_lineno or node.lineno))
    return fexpr, oracle


def _in_spans(spans: list, lineno: int) -> bool:
    return any(lo <= lineno <= hi for lo, hi in spans)


def _sites():
    out = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            src = open(path).read()
            lines = src.splitlines()
            try:
                tree = ast.parse(src)
            except SyntaxError:
                continue
            module_doc = ast.get_docstring(tree) or ""
            fexpr_spans, oracle_spans = _spans(tree)
            hits: dict[int, bool] = {}  # line -> is_over (SQL-text hit)
            for pi, p in enumerate(_PATTERNS):
                for m in p.finditer(src):
                    ln = src.count("\n", 0, m.start()) + 1
                    hits[ln] = hits.get(ln, False) or pi >= 2
            for i in sorted(hits):
                line = lines[i - 1]
                is_over = hits[i]
                fn = _enclosing(tree, i)
                # OVER hits in DuckDB-side SQL aren't Spark plans —
                # but the exemption is SPAN-based: a hit inside an
                # `expr(...)` call is Spark and is ALWAYS audited; only
                # hits inside oracle_*(...) calls or *_SQL/*_ORACLE
                # assignments are skipped. Module level and "sql"-named
                # helpers get no blanket pass (review finding r9-advice).
                if _in_docstring(fn, i):
                    continue
                # module docstring prose (fn is None): same non-call rule
                if fn is None and tree.body and isinstance(
                    tree.body[0], ast.Expr
                ) and isinstance(tree.body[0].value, ast.Constant) and (
                    tree.body[0].lineno
                    <= i
                    <= (tree.body[0].end_lineno or tree.body[0].lineno)
                ):
                    continue
                if is_over and not _in_spans(fexpr_spans, i) and _in_spans(
                    oracle_spans, i
                ):
                    continue
                doc = (ast.get_docstring(fn) or "") if fn else module_doc
                near = "\n".join(lines[max(0, i - 3) : i]).lower()
                if "# global-window:" in near:
                    kind = "documented-global"
                elif "bounded" in doc.lower() or "# bounded:" in near:
                    kind = "bounded"
                else:
                    kind = None
                out.append(
                    {
                        "file": os.path.relpath(path, REPO),
                        "line": i,
                        "function": fn.name if fn else "<module>",
                        "documented": kind is not None,
                        "kind": kind or "UNDOCUMENTED",
                        "code": line.strip()[:72],
                    }
                )
    return out


def main() -> int:
    sites = _sites()
    undocumented = [s for s in sites if not s["documented"]]
    if "--check" in sys.argv:
        for s in undocumented:
            print(
                f"UNDOCUMENTED global window: {s['file']}:{s['line']} "
                f"({s['function']}) — state the operand bound "
                "('bounded' in the docstring or a '# bounded:' comment)"
            )
        print(f"{len(sites)} sites, {len(undocumented)} undocumented")
        return 1 if undocumented else 0
    print("| file:line | function | class | call |")
    print("|---|---|---|---|")
    for s in sites:
        print(
            f"| {s['file']}:{s['line']} | {s['function']} | "
            f"{s['kind']} | `{s['code']}` |"
        )
    print(f"\n{len(sites)} sites, {len(undocumented)} undocumented")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
