"""Output-type pinning for DuckDB oracle SQL.

The driver's correctness gate hashes oracle values with a
repr-sensitive formatter (VERDICT r1: Decimal scale and tz-awareness
are NOT forgiven).  DuckDB widens ``SUM(BIGINT)`` to HUGEINT — which
surfaces as ``decimal128(38,0)`` through Arrow — so an oracle whose
final SELECT exposes an uncast SUM hash-mismatches a Spark plan that
emits a plain ``long``, even when every value compares equal as a
Python int.  CORRECTNESS_r06 proved this empirically: all 8 hash
failures (and only those 8 among the driver-checked set) had HUGEINT
output columns; every green query had none.

The DB-API ``cursor.description`` reports HUGEINT as the generic
``'NUMBER'``, which is why the r1-era hazard check in
``tools/check_oracle.py`` never saw these.  Detection now goes through
``DESCRIBE <sql>`` (exact DuckDB type names), and construction goes
through :func:`oracle_bigint`, which pins named output columns to
BIGINT without touching the query body.

``tests/test_oracle_types.py`` runs DESCRIBE over every registered
oracle and fails on any HUGEINT/DECIMAL/TIMESTAMPTZ output column, so
the class of bug — not just the 8 instances — is dead.
"""

from __future__ import annotations

#: DuckDB type names (from DESCRIBE) that cross the driver's
#: engine→hash boundary unstably even when Python values compare equal.
DUCK_HAZARD_TYPES = (
    "HUGEINT",
    "UHUGEINT",
    "DECIMAL",
    "TIMESTAMP WITH TIME ZONE",
    "TIMESTAMPTZ",
)


def oracle_bigint(sql: str, *cols: str) -> str:
    """Pin the named output columns of a DuckDB oracle to BIGINT.

    Wraps the query with ``SELECT * REPLACE (CAST(c AS BIGINT) AS c)``
    — column order and names are preserved, only the types of the named
    columns change.  Use on every oracle whose final SELECT exposes a
    SUM over integers (DuckDB widens those to HUGEINT).

    The cast is exact for |value| < 2^63; every pinned column here is
    an integer-cents / count / rank measure orders of magnitude below
    that at any tested scale factor.
    """
    if not cols:
        raise ValueError("oracle_bigint needs at least one column name")
    repl = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({repl})\nFROM (\n{sql}\n) AS _typed"
