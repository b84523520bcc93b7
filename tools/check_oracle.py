"""Differential checker mirroring the driver's correctness gate.

Runs each `__spark_entry__.queries()` entry and its `oracle_sql()` twin
(DuckDB) at a given sf dir, then compares row count, column names, and
order-insensitive values — exact equality, like a value hash would be.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Strict on purpose: the driver's value hash does NOT forgive Decimal
    # scale/exponent differences or tz-awareness, so neither do we
    # (VERDICT r1: six queries passed a normalize()/tz-strip checker but
    # failed the driver hash).
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sortkey(row):
    return tuple((x is None, str(x)) for x in row)


# Type classes that cross the driver's engine→hash boundary unstably even
# when Python values compare equal (learned from CORRECTNESS_r01: DuckDB
# sum(BIGINT)→HUGEINT, DECIMAL on either side, TIMESTAMPTZ vs naive).
_SPARK_HAZARDS = ("decimal",)
_DUCK_HAZARDS = ("DECIMAL", "HUGEINT", "UHUGEINT", "TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ")


def type_hazards(name, spark_df, duck_types) -> list[str]:
    errs = []
    for f in spark_df.schema.fields:
        if any(h in f.dataType.simpleString() for h in _SPARK_HAZARDS):
            errs.append(
                f"{name}: HAZARD spark column {f.name} is {f.dataType.simpleString()} "
                "(emit BIGINT/STRING/DOUBLE instead — driver hash is repr-sensitive)"
            )
    for col, t in duck_types:
        if any(h in str(t).upper() for h in _DUCK_HAZARDS):
            errs.append(
                f"{name}: HAZARD duck column {col} is {t} "
                "(CAST to BIGINT/VARCHAR/DOUBLE/naive TIMESTAMP in the oracle)"
            )
    return errs


def compare(name, spark_df, duck_rows, duck_cols) -> list[str]:
    errs: list[str] = []
    s_cols = list(spark_df.columns)
    if sorted(s_cols) != sorted(duck_cols):
        errs.append(f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(duck_cols)}")
        return errs
    order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = [tuple(_norm(r[i]) for i in order) for r in spark_df.collect()]
    d_rows = [tuple(_norm(r[i]) for i in d_order) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_rows.sort(key=_sortkey)
    d_rows.sort(key=_sortkey)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            errs.append(f"{name}: first value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}")
            break
    return errs


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from etl_portofolio_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  {name}: NO ORACLE (rows-only) rows={n}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_types = [(d[0], d[1]) for d in rel.description]
            duck_rows = rel.fetchall()
            errs = type_hazards(name, sdf, duck_types)
            errs += compare(name, sdf, duck_rows, duck_cols)
        except Exception as e:  # noqa: BLE001
            errs = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            failures.extend(errs)
            print(f"  {name}: FAIL")
            for e in errs:
                print(f"    {e}")
        else:
            print(f"  {name}: OK ({len(duck_rows)} rows)")

    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
