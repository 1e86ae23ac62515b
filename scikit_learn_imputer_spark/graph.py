"""Distributed graph analytics on DataFrames — power-iteration PageRank.

Together with ``dedup/cluster.py`` (connected components) this covers the
iterative-fixpoint family: per iteration ONE equi join (ranks onto edges)
and ONE aggregate (contributions per destination) — both hash-partitioned
on vertex id, no driver-side graph, lineage truncated per round with an
eager ``localCheckpoint`` (the standard Spark iterative pattern; without
it the plan tree doubles every iteration).

Scale notes: the join can be co-partitioned by pre-bucketing edges and
ranks on vertex id so iterations reuse the partitioning without
re-shuffling the (static) edge side; rank state is O(vertices) and never
collected. This is the classic Spark PageRank shape (fixed iteration
count; dangling-vertex mass is dropped as in the canonical example, so
ranks are comparable within a run rather than a normalized distribution —
documented contract, matching common practice for dedup-graph centrality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Return (id, rank) after ``iters`` rounds of power iteration over
    the DIRECTED edge list. Deterministic for a fixed edge set."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col(src).alias("from")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    links = (
        edges.select(F.col(src).alias("from"), F.col(dst).alias("to"))
        .join(out_deg, on="from")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            links.join(ranks, links["from"] == ranks["id"])
            .select(
                F.col("to").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, on="id", how="left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
