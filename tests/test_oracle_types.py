"""Static output-type gate over every registered DuckDB oracle.

CORRECTNESS_r06 postmortem: all 8 driver hash failures — and only
those 8 among the driver-checked queries — had HUGEINT output columns
(DuckDB widens SUM(BIGINT); Arrow surfaces it as decimal128(38,0),
which the driver's repr-sensitive hash formats differently from
Spark's plain long).  The DB-API description reports those columns as
the generic 'NUMBER', so the runtime hazard check never saw them.

This test binds every oracle with ``DESCRIBE`` (exact type names, no
data scanned) and fails on any hazard output type, so the whole class
of bug is structurally dead: a new oracle with an uncast SUM fails CI
before it can fail the driver.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from etl_portofolio_spark.plans.oracle_types import (
    DUCK_HAZARD_TYPES,
    oracle_bigint,
)
from tests.conftest import SF_DIR as _SF_DIR
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{_SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_hazard_output_types_in_any_oracle(con):
    bad: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in desc:
            if any(h in str(typ).upper() for h in DUCK_HAZARD_TYPES):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle output columns with hash-unstable DuckDB types "
        "(wrap with plans.oracle_types.oracle_bigint):\n  "
        + "\n  ".join(bad)
    )


def test_oracle_bigint_pins_named_columns_only(con):
    sql = oracle_bigint(
        "SELECT o_orderstatus AS st, SUM(o_orderkey) AS s, COUNT(*) AS c "
        "FROM orders GROUP BY 1",
        "s",
    )
    desc = {c: t for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall()}
    assert desc["s"] == "BIGINT"  # pinned (was HUGEINT)
    assert desc["st"] == "VARCHAR"  # untouched
    # column ORDER is preserved too — the driver compares sorted-by-name,
    # but check_oracle prints in emitted order; keep both stable
    cols = [c for c, *_ in con.execute(f"DESCRIBE {sql}").fetchall()]
    assert cols == ["st", "s", "c"]


def test_oracle_bigint_values_unchanged(con):
    raw = "SELECT SUM(o_orderkey) AS s FROM orders"
    wrapped = oracle_bigint(raw, "s")
    assert (
        con.execute(wrapped).fetchall() == con.execute(raw).fetchall()
    )


def test_oracle_bigint_requires_columns():
    with pytest.raises(ValueError):
        oracle_bigint("SELECT 1 AS x")


#: Known-safe high-precision roundings: every entry is a value with
#: |x| <= ~1e3 (ranks/shares <=1, embedding components ~1, cosine and
#: covariance partials <=~100, idf/log terms <=~1e3), far under the
#: round(x,k) reproducibility bound |x| < 4.5e(15-k) (4.5e6 at k=9,
#: 4.5e3 at k=12 — the k=12 entries are all |x|<=~1 products).
#: Snippets are whitespace-normalized match texts.
_HIGH_K_ROUND_ALLOWLIST = {
    ("advanced_queries.py", 'round(F.col("n").cast("double") / total.cast("double"), 9)'),
    ("advanced_queries.py", "round(F.cume_dist().over(w), 9)"),
    ("advanced_queries.py", "round(F.percent_rank().over(w), 9)"),
    ("advanced_queries.py", "round(corr, 9)"),
    ("advanced_queries.py", "round(cume_dist() OVER w, 9)"),
    ("advanced_queries.py", "round(percent_rank() OVER w, 9)"),
    ("round5g_queries.py", "round(F.sqrt(sumsq), 9)"),
    ("round5g_queries.py", "round(idf * norm, 9)"),
    ("round5h_queries.py", "round(CAST(embedding[i] AS DOUBLE), 12)"),
    ("round5h_queries.py", 'round(F.col("ca") * F.col("ca"), 12)'),
    ("round5h_queries.py", 'round(F.col("ca") * F.col("cb"), 12)'),
    ("round5h_queries.py", 'round(F.col("cb") * F.col("cb"), 12)'),
    ("round5h_queries.py", 'round(F.col("x").cast("double"), 12)'),
    ("round5h_queries.py", "round(a.c * a.c, 12)"),
    ("round5h_queries.py", "round(a.c * b.c, 12)"),
    ("round5h_queries.py", "round(b.c * b.c, 12)"),
    ("round6_queries.py", "round(CAST(embedding[i] AS DOUBLE), 12)"),
    ("round6_queries.py", "round(COALESCE(dup_tokens, 0) / CAST(n_tokens AS DOUBLE), 9)"),
    ("round6_queries.py", 'round(F.col("xf").cast("double"), 12)'),
    ("round7_queries.py", "round(CAST(embedding[u.i] AS DOUBLE), 12)"),
    ("round7_queries.py", "round(CAST(x AS DOUBLE) * {_SPRT_LA!r} + CAST(n - x AS DOUBLE) * ({_SPRT_LB!r}), 9)"),
    ("round7_queries.py", 'round(F.col("c") * F.col("v"), 12)'),
    ("round7_queries.py", 'round(F.col("w") * F.col("w"), 12)'),
    ("round7_queries.py", 'round(F.col("w") / F.col("nrm"), 9)'),
    ("round7_queries.py", 'round(F.col("x") * F.col("p"), 12)'),
    ("round7_queries.py", 'round(F.col("x") * F.col("x"), 12)'),
    ("round7_queries.py", 'round(F.col("xf").cast("double"), 12)'),
    ("round7_queries.py", "round(c.c * p.v, 12)"),
    ("round7_queries.py", "round(e.x * e.x, 12)"),
    ("round7_queries.py", "round(e.x * p.p, 12)"),
    ("round7_queries.py", "round(w * w, 12)"),
    ("round7_queries.py", "round(w / nrm, 9)"),
    # shard_mixing_entropy: |ln(count)| <= ~40 at any scale factor
    ("round9b_queries.py", "round(ln c, 9)"),
    ("round9b_queries.py", "round(ln,9)"),
}


def test_high_precision_roundings_are_allowlisted():
    """Static tripwire for the round-magnitude rule (VERDICT r6 #3):
    round(x, k>=7) is only cross-engine reproducible while
    |x| < 4.5e(15-k) — ~4.5e6 at k=9, the bound the r6
    time_weighted_value violated at |x|~1e7.  Any NEW high-k rounding
    must be added here with its magnitude argument, or emitted as
    integer units instead."""
    import glob
    import os
    import re

    plans = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "etl_portofolio_spark",
        "plans",
    )
    found = set()
    # one level of nested parens so round(SUM(x), 9) / round(CAST(...))
    # forms are visible — the original [^()]* pattern was blind to them
    pat = re.compile(r"round\((?:[^()]|\([^()]*\))*,\s*(\d+)\)")
    for path in glob.glob(os.path.join(plans, "*.py")):
        src = open(path).read()
        for m in pat.finditer(src):
            if int(m.group(1)) >= 7:
                snip = re.sub(r"\s+", " ", m.group(0))
                found.add((os.path.basename(path), snip))
    # drop the known docstring PROSE mention of the rule itself
    # ("round(x,9)" in the time_weighted_value postmortem); real calls
    # reference a column or alias, never a bare x
    found = {f for f in found if f[1] != "round(x,9)"}
    new = found - _HIGH_K_ROUND_ALLOWLIST
    gone = _HIGH_K_ROUND_ALLOWLIST - found
    assert not new, (
        "new round(x, k>=7) emission(s) — verify |x| < 4.5e(15-k) and "
        f"allowlist, or emit integer units: {sorted(new)}"
    )
    assert not gone, f"stale allowlist entries: {sorted(gone)}"


def test_sig_digit_audit_flags_overflowing_round():
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from check_oracle import _sig_digits, float_hazards

    assert _sig_digits(1.5) == 2
    assert _sig_digits(12345678.123456789) > 15
    assert _sig_digits(0.000125) == 3
    # a round(x, 9) emission at |x|~1e7: 17 significant digits -> flagged
    rows = [(1.0, 12345678.123456789), (2.0, 3.5)]
    errs = float_hazards("q", rows, ["a", "b"])
    assert len(errs) == 1 and "b" in errs[0]
    # in-range doubles pass
    assert float_hazards("q", [(1.5, 2.25)], ["a", "b"]) == []
    # raw IEEE-deterministic doubles at small magnitude pass even with a
    # full mantissa (norms, divisions — the embedding_quality_check case)
    assert float_hazards("q", [(1.0000001086789103,)], ["n"]) == []
    # integral-valued big doubles pass (exact in both engines)
    assert float_hazards("q", [(1.23e12,)], ["n"]) == []
