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
replication, not of the operator); use the skew stress benches for
those.

Usage: python tools/make_scale_stress.py K OUT_DIR [SRC_DIR]
  e.g. python tools/make_scale_stress.py 10  /tmp/scale_stress/sf1
       python tools/make_scale_stress.py 100 /tmp/scale_stress/sf10
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


def main() -> int:
    k = int(sys.argv[1])
    out = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else SRC_DEFAULT
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, cols in _OFFSET_COLS.items():
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
