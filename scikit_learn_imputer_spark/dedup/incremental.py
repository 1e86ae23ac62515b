"""Incremental (cross-batch) deduplication against a persisted
fingerprint store.

A production crawl pipeline never re-deduplicates the whole corpus per
ingest: it keeps a STORE of content fingerprints already accepted and, for
each new batch, (1) collapses the batch to one row per distinct content
(min-id survivor policy, same as ``exact.exact_dedup``), then (2)
anti-joins the batch's fingerprints against the store, then (3) appends
the accepted fingerprints back to the store. Build once, probe per batch.

Scale design: the store is parquet of 32-char md5 digests only, and it is
NEVER broadcast or shuffled — the probe streams the store through a semi
join whose build side is the batch's distinct digests (bounded by
micro-batch size), then anti-joins the batch against the resulting
collision set (also batch-bounded). Nothing ever shuffles document text —
the batch reduces to (id, digest) before any join. The store append is an
append-mode parquet write, no rewrite of history; duplicate digests across
appends are harmless (the probe is a semi/anti join, set semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.text import fingerprint_col


def build_fingerprint_store(
    docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Initialize the store: distinct fingerprints of everything already
    in the corpus. Overwrites ``path``."""
    (
        docs.select(fingerprint_col(F.col(text_col)).alias("fingerprint"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def incremental_dedup(
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``batch`` that survive dedup against BOTH the batch itself
    (min-id per distinct content) and the persisted store.

    Returns the surviving rows with their ``fingerprint`` attached (the
    caller appends exactly these fingerprints via ``append_to_store`` —
    one lineage, no recompute)."""
    spark = batch.sparkSession
    store = spark.read.parquet(store_path)
    fp = batch.withColumn("__fp", fingerprint_col(F.col(text_col)))
    # Within-batch survivor: min id per distinct content (deterministic).
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    survivors = fp.join(keep, on=[id_col, "__fp"], how="left_semi")
    # Cross-batch: drop anything the store has already accepted. A naive
    # ``survivors LEFT ANTI store`` puts the STORE on the build side (a
    # left-anti join can only broadcast its right side) — wrong way round
    # at scale, where the store dwarfs the batch. Instead probe the store
    # with the batch's distinct digests via a semi join (store streamed,
    # batch-digest side built/broadcast — bounded by micro-batch size),
    # which yields a collision set no bigger than the batch; the final
    # anti join's build side is that small set. The store is never
    # broadcast and never shuffled, at any store size.
    batch_fps = fp.select(F.col("__fp").alias("fingerprint")).distinct()
    collisions = store.join(batch_fps, on="fingerprint", how="left_semi")
    return (
        survivors.join(
            collisions,
            survivors["__fp"] == collisions["fingerprint"],
            how="left_anti",
        )
        .withColumnRenamed("__fp", "fingerprint")
    )


def append_to_store(survivors: DataFrame, store_path: str) -> None:
    """Append the accepted batch's fingerprints to the store (append-only;
    no rewrite of history)."""
    survivors.select("fingerprint").distinct().write.mode("append").parquet(
        store_path
    )


def incremental_dedup_and_commit(
    batch: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe + commit in one call. The survivors frame is the return
    value; its fingerprints are already appended (materialized once via
    the write, so returning it does not recompute the join)."""
    survivors = incremental_dedup(batch, store_path, id_col, text_col)
    append_to_store(survivors, store_path)
    return survivors


def stream_dedup_ingest(
    docs_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous ingest-with-dedup: each micro-batch is deduplicated
    within itself AND against the persisted fingerprint store, survivors
    land in ``out_path`` parquet, and their fingerprints commit to the
    store — the streaming form of the hourly crawl-ingest pipeline.

    ``foreachBatch`` is the right tool here (not a stateful operator):
    the dedup state is the UNBOUNDED all-history fingerprint set, which
    belongs in a persisted, join-able store — not in per-executor
    streaming state that a watermark would have to bound. Exactly-once
    note: foreachBatch can re-run a batch on failure; the survivor WRITE
    is idempotent per batch only if re-run against the same store state,
    so the store append happens AFTER the output write (worst case a
    replayed batch's docs are dropped as dups — dedup is naturally
    re-entrant: false-drop-free requires the store append to be atomic
    with the output, which an ACID table format would provide)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        survivors = incremental_dedup(batch, store_path, id_col, text_col)
        survivors.persist()
        try:
            survivors.write.mode("append").parquet(out_path)
            append_to_store(survivors, store_path)
        finally:
            survivors.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
