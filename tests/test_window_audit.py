"""Every unpartitioned-window call site must state its operand bound —
tools/window_audit.py --check is the gate, so a new global window
cannot land without a documented bound (or an explicit
documented-global dispensation). See SCALE.md "Global-window audit"."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_undocumented_global_windows():
    proc = subprocess.run(
        [sys.executable, "tools/window_audit.py", "--check"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def _audit_source(tmp_path, source: str) -> list[dict]:
    """Run the audit over a single crafted module and return its sites."""
    sys.path.insert(0, _REPO)
    from tools import window_audit

    (tmp_path / "crafted.py").write_text(source)
    old_pkg = window_audit.PKG
    window_audit.PKG = str(tmp_path)
    try:
        return window_audit._sites()
    finally:
        window_audit.PKG = old_pkg


def test_module_level_fexpr_over_is_flagged(tmp_path):
    """r9-advice evasion: a Spark OVER () inside a module-level F.expr
    constant must be audited — module level is no longer a blanket pass."""
    sites = _audit_source(
        tmp_path,
        "from pyspark.sql import functions as F\n"
        'RANKER = F.expr("row_number() OVER (ORDER BY x)")\n',
    )
    assert any(s["kind"] == "UNDOCUMENTED" for s in sites), sites


def test_sql_mid_name_helper_is_flagged(tmp_path):
    """r9-advice evasion: a helper with 'sql' mid-name building a Spark
    F.expr must be audited — the name-based pass is gone."""
    sites = _audit_source(
        tmp_path,
        "from pyspark.sql import functions as F\n"
        "def _build_sql_expr():\n"
        '    return F.expr("sum(x) OVER ()")\n',
    )
    assert any(s["kind"] == "UNDOCUMENTED" for s in sites), sites


def test_oracle_constant_and_builder_stay_exempt(tmp_path):
    """DuckDB-side strings keep their exemption: *_SQL / ORACLE_*
    assignments and _oracle_* builder functions are not Spark plans."""
    sites = _audit_source(
        tmp_path,
        'ORACLE_RANKED = """SELECT row_number() OVER (ORDER BY x) FROM t"""\n'
        '_THING_SQL = "SELECT sum(x) OVER () FROM t"\n'
        "def _oracle_ranked():\n"
        "    return \"SELECT rank() OVER (ORDER BY y) FROM t\"\n",
    )
    assert sites == [], sites
