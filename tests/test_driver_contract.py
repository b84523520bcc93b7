"""The driver harness imports __spark_entry__ in a FRESH process with a
plain SparkSession — none of build_session's runtime confs. Any query
that silently depends on our session factory (nanos-timestamp conf,
partition-inference conf, excluded optimizer rules) passes the normal
suite but dies at the gate. This test reproduces the driver's setup in
a subprocess (two SparkSessions cannot share one JVM)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import json
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m
names = list(m.queries())
# first registry entry + one per heavy family (events-ts handling,
# pandas boundary, SQL interface, flagship)
sample = [names[0], "flagship_throughput_pivot", "tumbling_window_events",
          "multimodal_pixel_stats", "sql_interface_report"]
out = {}
for n in sample:
    out[n] = m.queries()[n](spark, "/root/testdata/sf0.001").count()
out["entry"] = len(m.entry(spark).collect())
out["n_queries"] = len(m.queries())
out["n_oracles"] = len(m.oracle_sql())
print("RESULT " + json.dumps(out))
"""


def test_registry_runs_under_plain_driver_session():
    r = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    assert lines, r.stdout[-2000:]
    vals = json.loads(lines[0][len("RESULT "):])
    assert vals["entry"] > 0
    assert vals["n_queries"] == vals["n_oracles"] >= 100
    assert all(v >= 0 for v in vals.values())


# VERDICT r5 #2: a silent ImportError in one plans module must not
# shrink the registry. Pin the exact size (update per wave) and assert
# the import-error ledger is empty; a deliberately broken module is
# exercised below to prove the failure is loud.
EXPECTED_QUERIES = 390


def test_registry_size_pinned_and_imports_clean():
    sys.path.insert(0, _REPO)
    import __spark_entry__ as m

    assert m._IMPORT_ERRORS == [], m._IMPORT_ERRORS
    assert len(m.queries()) == EXPECTED_QUERIES, (
        f"registry has {len(m.queries())} queries, expected "
        f"{EXPECTED_QUERIES} — update EXPECTED_QUERIES when adding a "
        "wave; a shrink means a plans module failed to import"
    )


def test_broken_plan_module_fails_loudly(tmp_path):
    """A typo'd plans module must raise at queries() time, not shrink."""
    probe = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __spark_entry__ as m\n"
        "m._IMPORT_ERRORS.append('fake_module: ImportError: boom')\n"
        "try:\n"
        "    m.queries()\n"
        "except ImportError as e:\n"
        "    assert 'fake_module' in str(e)\n"
        "    print('LOUD_OK')\n"
    ) % _REPO
    r = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "LOUD_OK" in r.stdout

# VERDICT r7 #7: the never-checked backlog must not silently regrow
# past the driver's 50-slot window. Every query must appear in at least
# one committed CORRECTNESS_r*.json within 2 driver rounds of its
# registration. The registration round of each plans module is pinned
# here (update when adding a wave — a missing entry fails loudly).
_MODULE_REGISTRATION_ROUND = {
    "reference_queries": 1,
    "analytics_queries": 1,
    "pipeline_queries": 1,
    "advanced_queries": 3,
    "extension_queries": 3,
    "round4_queries": 4,
    "round5_queries": 5,
    "round5b_queries": 5,
    "round5c_queries": 5,
    "round5d_queries": 5,
    "round5e_queries": 5,
    "round5f_queries": 5,
    "round5g_queries": 6,
    "round5h_queries": 6,
    "round6_queries": 6,
    "round7_queries": 7,
    "round7b_queries": 7,
    "round8_queries": 7,
    "round9_queries": 8,
    "round9b_queries": 8,
    "round9c_queries": 8,
    "round9d_queries": 8,
    "round10_queries": 8,
    "round11_queries": 9,
    "round12_queries": 10,
}


def test_every_query_driver_checked_within_two_rounds_of_registration():
    import glob
    import importlib

    sys.path.insert(0, _REPO)
    import __spark_entry__ as m

    mod_queries = {"reference_queries": set(m.REFERENCE_QUERIES)}
    for mod_name, attr in m._PLAN_MODULES:
        short = mod_name.rsplit(".", 1)[1]
        mod_queries[short] = set(getattr(importlib.import_module(mod_name), attr))

    missing_reg = sorted(set(mod_queries) - set(_MODULE_REGISTRATION_ROUND))
    assert not missing_reg, (
        f"plans module(s) {missing_reg} lack a registration round — add "
        "them to _MODULE_REGISTRATION_ROUND so the backlog guard covers them"
    )

    checked: set[str] = set()
    latest = 0
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        latest = max(latest, rnd)
        with open(path) as fh:
            checked.update(json.load(fh))

    overdue = []
    for short, names in mod_queries.items():
        reg = _MODULE_REGISTRATION_ROUND[short]
        if reg + 2 > latest:
            continue  # still within its 2-round grace window
        overdue.extend(sorted(n for n in names if n not in checked))
    assert not overdue, (
        f"{len(overdue)} queries past their 2-round evidence deadline "
        f"(latest driver round {latest}): {overdue[:10]} — the rotation "
        "must clear never-checked queries before new waves push them out"
    )
