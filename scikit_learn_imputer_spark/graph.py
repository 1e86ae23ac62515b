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


def pagerank_snapped(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank_micro): power-iteration PageRank in EXACT integer
    micro-units — the oracle-checkable twin of ``pagerank`` (same
    pattern as minhash_candidates_md5 next to the xxhash64 production
    hasher). Doubles make ``pagerank`` engine-divergent at the last ulp
    (partition-order contribution sums, 8 iterations of amplification);
    here the rank state is a BIGINT:

        r0        = floor(1e6 / N + 0.5)
        contrib   = floor(damping * r(u) / deg(u))   (per out-edge)
        r_next(v) = floor((1-damping) * 1e6 / N + 0.5) + Σ contrib

    Every step is integer arithmetic or a single deterministic double
    op (one product, one division, one floor — identical expression
    tree on both engines), so ranks are exact and partitioning-
    invariant. The floor() in the contribution loses < 1 micro-unit per
    edge per iteration — centrality ORDER is what dedup survivor
    selection consumes, and that is unaffected. Same distributed shape
    as ``pagerank``: one equi join + one aggregate per iteration,
    lineage truncated per round."""
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("bigint"))
    import math

    r0 = int(math.floor(1e6 / n + 0.5))
    base = int(math.floor((1.0 - damping) * 1e6 / n + 0.5))
    out_deg = edges.groupBy(F.col(src).alias("from")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    links = (
        edges.select(F.col(src).alias("from"), F.col(dst).alias("to"))
        .join(out_deg, on="from")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank_micro", F.lit(r0).cast("bigint"))
    for _ in range(iters):
        contribs = (
            links.join(ranks, links["from"] == ranks["id"])
            .select(
                F.col("to").alias("id"),
                F.floor(
                    F.lit(damping)
                    * F.col("rank_micro").cast("double")
                    / F.col("deg")
                )
                .cast("bigint")
                .alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        ranks = (
            nodes.join(contribs, on="id", how="left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.coalesce(F.col("s"), F.lit(0).cast("bigint"))
                )
                .cast("bigint")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
