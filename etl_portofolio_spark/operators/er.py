"""Entity resolution: blocked fuzzy matching over an entity column.

The standard ER shape for catalogs/vendors/addresses at scale:
``distinct`` the entity strings (the match universe is the value
space, not the row space), attach a cheap deterministic blocking key,
pair WITHIN blocks only (equi-join — one shuffle on the block key,
never an all-pairs cross join), and score candidates with an exact
edit distance. Like every blocking scheme, recall is bounded by the
block choice (entities differing in the blocking key are never
compared) — that is the documented, tunable trade; precision is exact
because the residual filter recomputes true Levenshtein on each
candidate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    entities: DataFrame,
    text_col: str,
    block: Column,
    max_dist: int = 3,
) -> DataFrame:
    """(name_a, name_b, block, dist) pairs with Levenshtein <= max_dist,
    compared within ``block`` only. ``entities`` rows are deduped on
    ``text_col`` first, so the quadratic term is distinct-values per
    block, not rows per block.
    """
    # block is functionally dependent on the entity string, so a
    # distinct over (name, block) equals a distinct over name alone —
    # and lets the block expression reference the original column.
    vals = entities.select(
        F.col(text_col).alias("name"), block.alias("block")
    ).distinct()
    a, b = vals.alias("a"), vals.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.block").alias("block"),
            dist.cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
