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


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "u",
    dst: str = "v",
    rounds: int | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling; returns the surviving
    ``(node, degree)`` frame — degree measured in the final subgraph.

    Input is an undirected edge list (one row per edge, src < dst).
    Each peel round is one symmetrize + one degree aggregation + one
    semi-join filter of the edge list — |edges| shuffled per round on
    the node key, the Pregel-style cost model; ``localCheckpoint``
    truncates lineage so round N never replays rounds 1..N-1.

    ``rounds`` runs EXACTLY that many peels (deterministic plan depth —
    the oracle-checkable form); ``rounds=None`` peels to the fixpoint
    (the true k-core) and raises after ``max_iters`` instead of
    spinning forever on a bug — the ``connected_components``
    discipline.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    n_iters = rounds if rounds is not None else max_iters
    for _ in range(n_iters):
        sym = e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        deg = sym.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("n")
        e2 = (
            e.join(keep, F.col("u") == F.col("n"), "left_semi")
            .join(keep, F.col("v") == F.col("n"), "left_semi")
            .localCheckpoint(eager=True)
        )
        if rounds is None:
            before = e.count()
            if e2.count() == before:
                e = e2
                break
            e = e2
        else:
            e = e2
    else:
        if rounds is None:
            raise RuntimeError(
                f"kcore failed to converge within {max_iters} peels"
            )
    sym = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    )
    return sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
