"""Change-data-capture between table snapshots.

The reference's daily jobs overwrite whole partitions (Ingestion Data
(MySQL).py:58-65 — truncate + append); a CDC diff is the incremental
twin: compare yesterday's snapshot with today's and emit only the
changed rows. At 100 TB the diff is ONE co-partitioned full-outer join
on the primary key — with both snapshots bucketed/partitioned the same
way the join is shuffle-free, and partition-level change metadata
(counts/checksums per ds) prunes untouched partitions before any row
is read.

Pure DataFrame plan: null-safe column compares (`eqNullSafe`) stay in
whole-stage codegen; no UDFs, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: change_type values emitted by :func:`snapshot_diff`.
CHANGE_TYPES = ("insert", "delete", "update", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
) -> DataFrame:
    """Row-level change log between two snapshots of the same table.

    Returns one row per key present in either snapshot with columns
    ``*keys``, ``change_type`` ('insert' | 'delete' | 'update' |
    'unchanged'), and the tracked columns' old/new values
    (``<col>_old`` / ``<col>_new``).

    * insert — key only in ``new``
    * delete — key only in ``old``
    * update — key in both, any tracked column differs (null-safe)
    * unchanged — key in both, all tracked columns equal
    """
    if not keys:
        raise ValueError("snapshot_diff: keys must be non-empty")
    o = old.select(*keys, *tracked)
    n = new.select(*keys, *tracked)
    for c in tracked:
        o = o.withColumnRenamed(c, f"{c}_old")
        n = n.withColumnRenamed(c, f"{c}_new")
    # Join on the key equality list, not USING, so each side's key
    # nullability is observable for the insert/delete classification.
    o_k = o.select(*[F.col(k).alias(f"__ok_{k}") for k in keys], *[f"{c}_old" for c in tracked])
    n_k = n.select(*[F.col(k).alias(f"__nk_{k}") for k in keys], *[f"{c}_new" for c in tracked])
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = o_k.join(n_k, cond, "full_outer")

    differs: Column | None = None
    for c in tracked:
        d = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        differs = d if differs is None else (differs | d)

    change = (
        F.when(F.col(f"__ok_{keys[0]}").isNull(), F.lit("insert"))
        .when(F.col(f"__nk_{keys[0]}").isNull(), F.lit("delete"))
        .when(differs if differs is not None else F.lit(False), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k) for k in keys
    ]
    return joined.select(
        *out_keys,
        change.alias("change_type"),
        *[F.col(f"{c}_old") for c in tracked],
        *[F.col(f"{c}_new") for c in tracked],
    )
