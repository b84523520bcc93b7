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

Skipped as non-Spark: `OVER ()` hits inside function docstrings and
inside oracle-SQL builder functions (name contains `oracle`/`sql` —
DuckDB executes those strings, not Spark).

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
            hits: dict[int, bool] = {}  # line -> is_over (SQL-text hit)
            for pi, p in enumerate(_PATTERNS):
                for m in p.finditer(src):
                    ln = src.count("\n", 0, m.start()) + 1
                    hits[ln] = hits.get(ln, False) or pi >= 2
            for i in sorted(hits):
                line = lines[i - 1]
                is_over = hits[i]
                fn = _enclosing(tree, i)
                # OVER hits in DuckDB-side SQL aren't Spark plans: skip
                # module-level *_SQL constants (no enclosing function)
                # and oracle-SQL builder functions; Spark F.expr OVER ()
                # inside a query builder is always audited
                if is_over and fn is None:
                    continue
                if _in_docstring(fn, i):
                    continue
                if is_over and fn is not None and (
                    "oracle" in fn.name.lower() or "sql" in fn.name.lower()
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
