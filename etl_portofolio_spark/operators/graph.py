"""Iterative graph algorithms as DataFrame fixpoint loops.

The companion to ``dedup.connected_components`` (min-label fixpoint):
weighted-propagation algorithms where each round is one shuffle join +
one aggregation over the edge list, with ``localCheckpoint`` lineage
truncation so iteration N's plan does not replay rounds 1..N-1 — the
GraphX/Pregel discipline expressed on DataFrames. Nothing here ever
collects the graph or builds a quadratic stage; at 100 TB the per-round
cost is |edges| shuffled on the destination key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_portofolio_spark.caching import scoped_persist


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    weight: str | None = None,
) -> DataFrame:
    """PageRank over an edge list; returns ``(node, rank)``.

    Each iteration shuffles contributions on the destination key
    (join ranks → edges, aggregate by ``dst``) — never materializes an
    adjacency matrix, never touches the driver. Designed for the
    symmetric edge sets our dedup/co-purchase graphs produce: every
    node appears as both ``src`` and ``dst``, so out-degrees are
    defined everywhere and no rank mass dangles.

    ``weight`` names an edge-weight column: contributions split
    proportionally to weight instead of uniformly (rank·w/Σw over the
    source's out-edges). Unweighted is the weight≡1 special case —
    same plan, the degree becomes a weight sum.

    ``checkpoint_every=k`` eagerly ``localCheckpoint``s the rank vector
    every k rounds, truncating lineage so plan depth stays bounded at
    any iteration count (the ``connected_components`` discipline —
    without it the plan nests one join+agg per round and analysis cost
    grows superlinearly). ``checkpoint_every=0`` keeps the whole loop
    lazy — the unrolled plan the fixed-iteration oracle query wants.

    Edge and degree frames feed every round, so both are persisted via
    the scoped-cache registry; the caller releases them with
    ``caching.release_cached()`` after consuming the result.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    w = F.col(weight) if weight else F.lit(1)
    edges = scoped_persist(
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
    )
    deg = scoped_persist(edges.groupBy("src").agg(F.sum("w").alias("deg")))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))
    for i in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                "dst",
                (F.col("rank") * F.col("w") / F.col("deg")).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (F.lit(1 - damping) + F.lit(damping) * F.sum("c")).alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
