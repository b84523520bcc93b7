"""Build key-offset replicas of the sf0.1 fixtures for scaling runs.

The driver ships sf0.001/0.01/0.1; the scale claims in SCALE.md are
about 10x-100x beyond that. This tool manufactures /tmp stress dirs by
replicating the FACT tables K times with offset primary keys (orders/
lineitem share the order-key offset so join semantics are preserved)
while DIMENSION tables stay fixed — the realistic growth shape (facts
grow, dims don't). Text/embedding payloads replicate as-is: token and
vector distributions scale linearly, which is what the timing curves
measure. Pairwise dedup operators are NOT meaningful on replicated
text (every doc gains K exact twins — a quadratic artifact of the
replication, not of the operator); for those, pass --salt-docs:
replica i > 0 gets every token suffixed with '~i' (n_chars updated),
so each replica is a DISTINCT corpus with the same statistical shape —
within-replica dup/co-occurrence structure is preserved exactly,
cross-replica shingles never match, and pair counts scale linearly
the way genuinely new content would.

Usage: python tools/make_scale_stress.py K OUT_DIR [SRC_DIR] [--salt-docs]
  e.g. python tools/make_scale_stress.py 10  /tmp/scale_stress/sf1
       python tools/make_scale_stress.py 100 /tmp/scale_stress/sf10
       python tools/make_scale_stress.py 10  /tmp/scale_stress/sf1salt --salt-docs
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"

#: table -> columns to offset by replica_index * OFFSET
_OFFSET_COLS = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

#: far above any fixture key at sf0.1 (max orderkey ~6e5, event_id ~2e5)
OFFSET = 100_000_000

_DIMS = ("region", "nation", "customer", "supplier", "part")


def _salted_documents_sql(src: str, k: int) -> str:
    """K distinct-corpus replicas: replica 0 verbatim; replica i > 0
    suffixes every whitespace token with '~i' (and recomputes n_chars),
    so cross-replica n-grams/shingles never match."""
    salted = (
        "array_to_string(list_transform("
        "regexp_split_to_array(s.text, '\\s+'), t -> t || '~' || r.i), ' ')"
    )
    return (
        f"SELECT s.* REPLACE (s.doc_id + r.i * {OFFSET} AS doc_id, "
        f"CASE WHEN r.i = 0 THEN s.text ELSE {salted} END AS text, "
        f"CASE WHEN r.i = 0 THEN s.n_chars "
        f"ELSE length({salted}) END AS n_chars) "
        f"FROM read_parquet('{src}/documents.parquet') s, range({k}) r(i)"
    )


def main() -> int:
    salt_docs = "--salt-docs" in sys.argv
    argv = [a for a in sys.argv if a != "--salt-docs"]
    k = int(argv[1])
    out = argv[2]
    src = argv[3] if len(argv) > 3 else SRC_DEFAULT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, cols in _OFFSET_COLS.items():
        if t == "documents" and salt_docs:
            con.execute(
                f"COPY ({_salted_documents_sql(src, k)}) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{t}: {n} rows (x{k}, salted)")
            continue
        for c in cols:
            mx = con.execute(
                f"SELECT MAX({c}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            if mx >= OFFSET:
                raise SystemExit(
                    f"{t}.{c} max {mx} >= OFFSET {OFFSET}: replicas would "
                    "collide (don't chain the tool on its own output)"
                )
        repl = ", ".join(
            f"{c} + r.i * {OFFSET} AS {c}" for c in cols
        )
        con.execute(
            f"COPY (SELECT s.* REPLACE ({repl}) "
            f"FROM read_parquet('{src}/{t}.parquet') s, range({k}) r(i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows (x{k})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
