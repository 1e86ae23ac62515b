"""Near-duplicate CLUSTERS from candidate pairs — distributed connected
components.

Pair-level dedup (minhash/simhash/ngram/embedding modules) emits edges;
keep-one-per-cluster policies need the transitive closure: if A≈B and
B≈C, one survivor for {A,B,C}. This is connected components over the
candidate graph, computed with hash-to-min label propagation:

- every vertex starts labeled with its own id;
- each round, a vertex takes the min of its label and its neighbors'
  labels (one shuffle join + one aggregate per round);
- converges in O(graph diameter) rounds — near-dup graphs are unions of
  small cliques/chains, so the diameter is tiny in practice.

Scale notes (the 100 TB path): per round the work is one equi join on
vertex id and one min-aggregate — both hash-partitioned, no global
structure, no driver-side graph. Driver state is ONE changed-row count
per round (O(1)); lineage is truncated each round with an eager
``localCheckpoint`` so the plan doesn't grow with iterations (the
standard Spark iterative-algorithm pattern). ``max_iter`` bounds the
worst case; the loop exits early on convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, label) where ``label`` is the minimum vertex id in the
    component — a canonical, deterministic cluster id. Only vertices that
    appear in ``edges`` are returned (singletons have no near-dup)."""
    # Materialize the symmetric edge list ONCE: ``edges`` may be an
    # expensive upstream plan (the exact gram-join baseline fans out to
    # billions of intermediate rows on a shared-vocabulary corpus), and
    # without truncation every label-propagation round would recompute
    # it from scratch — O(rounds × candidate-join) instead of
    # O(candidate-join + rounds × |edges|). The checkpoint is O(edges),
    # the same tiny frame the rounds join.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["a"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"], F.coalesce(F.col("nlabel"), labels["label"])
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cluster_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min",
    quality=None,
    text_col: str = "text",
) -> DataFrame:
    """Keep-one-per-cluster survivor selection over a ``(id, label)``
    clusters frame (``connected_components`` output): every singleton
    (doc absent from ``clusters``) survives, plus one member per
    cluster — the min-id member (``keep='min'``) or the highest-quality
    member with ties to min id (``keep='quality'``; ``quality`` is any
    per-row Column, defaulting to the composite q_score rounded to 6 dp
    for deterministic cross-engine ties).

    Scale design: ``clusters`` is O(duplicates) and broadcastable; for
    the quality policy the score is computed ONLY for clustered docs
    (broadcast join restricts first), and the per-cluster argmax is a
    map-side-combinable ``min(struct(-q, id))`` — no window, and the
    full document text never shuffles."""
    cl = clusters.withColumnRenamed("id", id_col)
    if keep == "min":
        losers = cl.filter(F.col("label") != F.col(id_col)).select(id_col)
    elif keep == "quality":
        from scikit_learn_imputer_spark.functions.text import quality_score_col

        q = quality if quality is not None else F.round(
            quality_score_col(F.col(text_col)), 6
        )
        clustered_q = docs.join(F.broadcast(cl), on=id_col).select(
            "label", F.col(id_col), (-q).alias("__negq")
        )
        winners = (
            clustered_q.groupBy("label")
            .agg(
                F.min(
                    F.struct(F.col("__negq"), F.col(id_col).alias("__kid"))
                ).alias("__m")
            )
            .select(F.col("__m.__kid").alias(id_col))
        )
        losers = cl.select(id_col).join(winners, on=id_col, how="left_anti")
    else:
        raise ValueError(f"keep must be 'min' or 'quality', got {keep!r}")
    return docs.join(F.broadcast(losers), on=id_col, how="left_anti")
