"""Oracle-differential tests: every queries() entry vs its DuckDB oracle.

This is the same comparison the driver's correctness gate performs
(row count + column names + order-insensitive exact values), run at
sf0.001 for speed; tools/check_oracle.py covers sf0.01.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tools.check_oracle import compare

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = _QUERIES[name]
    sdf = fn(spark, SF_DIR)
    if name not in _ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert sdf.count() >= 0
        return
    rel = duck.execute(_ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    errs = compare(name, sdf, duck_rows, duck_cols)
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 5
