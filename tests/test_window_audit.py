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
