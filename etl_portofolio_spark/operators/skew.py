"""Skew mitigation: salted aggregation and salted broadcast-free joins.

AQE's skew-join splitting (enabled engine-wide in session.py) handles
skewed SORT-MERGE JOIN partitions at runtime, but two cases still need
explicit salting at 100 TB:

- **aggregation hot keys** — AQE never splits a single groupBy key; a
  key holding 1% of 100 TB lands 1 TB on one reducer. Two-stage salted
  aggregation bounds any reducer's input to ~1/num_salts of the hot key.
- **static skew joins** where the runtime stats arrive too late (first
  stage already spilled) or the join is not sort-merge.

Salting here is deterministic (hash-mod over a row-unique column, never
``rand()``) so reruns, retries, and oracle checks are stable.

Results are bit-identical to the unsalted plans — salting only changes
the physical key space. Tests assert equality against the plain
formulations; the ``skew_salted_agg`` registry query proves it against
a plain-SQL DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16

#: partial-combine / final-merge expression pairs per algebraic aggregate
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(unique_col: Column | str, num_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt in [0, num_salts): hash-mod of a row-unique col."""
    if num_salts < 1:
        raise ValueError(f"num_salts must be >= 1, got {num_salts}")
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.hash(c), F.lit(num_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_from: str,
    num_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage aggregation immune to group-key skew.

    ``aggs`` is a list of (column, fn, alias) with fn in sum/count/min/
    max (algebraic — partials merge losslessly). Stage 1 aggregates on
    (keys + salt): the hot key's rows spread over ``num_salts`` reducers.
    Stage 2 merges the ≤num_salts partials per key — trivially small.
    Equivalent to ``df.groupBy(keys).agg(...)`` for these functions.
    """
    partials = []
    finals = []
    for col, fn, alias in aggs:
        partial_fn, merge_fn = _MERGE[fn]
        partials.append(partial_fn(F.col(col)).alias(f"__p_{alias}"))
        finals.append(merge_fn(F.col(f"__p_{alias}")).alias(alias))
    stage1 = (
        df.withColumn("__salt", salt_column(salt_from, num_salts))
        .groupBy(*keys, "__salt")
        .agg(*partials)
    )
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    num_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over salted buckets.

    The big side gets a deterministic salt per row; the small side is
    replicated ``num_salts``× (explode of a literal range — fine when
    small ≪ big). The join key becomes (key, salt): a hot key's rows now
    hash to ``num_salts`` different reducers instead of one.

    Use when the small side is too big to broadcast but the big side's
    key histogram is badly skewed and AQE can't save the stage.

    Only ``inner`` and ``left`` are equivalent to the unsalted join:
    the small side is replicated ``num_salts``×, so right/full outer
    would emit each UNMATCHED small-side row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the "
            f"replicated small side would duplicate unmatched rows "
            f"{num_salts}x under right/full outer"
        )
    big_s = big.withColumn("__salt", salt_column(salt_from, num_salts))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = big_s.join(small_r, [key, "__salt"], how)
    return joined.drop("__salt")


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Misra-Gries candidate keys with O(k) memory PER PARTITION.

    Each Arrow batch folds into at most k counters (add batch counts,
    then repeatedly subtract the smallest counter and drop zeros until
    <= k survive — the summary-merge form of MG decrements). Pigeonhole
    + the MG undercount bound give the containment guarantee this
    operator exists for: any key with GLOBAL frequency > N/k has
    frequency > n_p/k in at least one partition and therefore survives
    that partition's summary. Output is the ≤ |partitions|·k candidate
    keys — the bounded-memory alternative to a full groupBy when the
    key domain itself doesn't fit (billions of distinct keys at 100 TB,
    where the exact count's shuffle IS the bottleneck).

    False positives are expected (and cheap — the verifier exact-counts
    only candidates); false negatives are impossible, which is what
    makes the two-phase result exact.
    """
    import pandas as pd

    out_schema = df.select(key_col).schema

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            while len(counters) > k:
                m = min(counters.values())
                counters = {
                    kk: c - m for kk, c in counters.items() if c - m > 0
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(fold, schema=out_schema).distinct()


def heavy_hitters_exact_via_sketch(
    df: DataFrame, key_col: str, denom: int
) -> DataFrame:
    """Keys with frequency > N/denom, computed WITHOUT a full-domain
    groupBy: MG candidates first (bounded memory, no shuffle of the
    domain), then an exact count of candidate keys only (broadcast
    semi-join prunes the scan side before its aggregation).

    The MG containment guarantee makes the output exactly equal to the
    brute-force HAVING query — the sketch only prunes work, never
    changes the answer — which is why this carries a plain-SQL oracle.
    """
    cands = mg_candidates(df, key_col, denom)
    total = df.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_rows") * F.lit(denom) > F.col("n_total"))
        .select(key_col, "n_rows")
    )
