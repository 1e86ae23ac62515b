"""The full corpus-ingest pipeline as ONE streaming operator.

``corpus_preprocess_pipeline`` (plans/queries.py) is the batch form a
data run executes per crawl snapshot; this module is the continuous
form: every arriving micro-batch is PII-scrubbed, quality-gated,
deduplicated against the persisted all-history fingerprint store, and
decontaminated against a static benchmark — survivors land in the
output sink and their fingerprints commit to the store.

Stage order follows the batch pipeline (scrub before anything reads the
text; the cheap map-only gate before the store probe; decontamination
last so a contaminated doc's fingerprint is NOT committed — its future
exact duplicates re-probe clean and are re-dropped by decontamination,
never falsely accepted).

foreachBatch, not stateful operators: the only cross-batch state is the
unbounded fingerprint store (persisted, join-able) and the static
benchmark digest set (computed once, persisted, reused per batch).
Output is exactly-once via the batch_id-keyed idempotent sink
(streaming/sinks.py): a replayed batch overwrites its own subdir; the
store append stays at-least-once by design (duplicate digests are
harmless under the probe's set semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.exact import benchmark_gram_digests
from scikit_learn_imputer_spark.dedup.incremental import (
    append_to_store,
    incremental_dedup,
)
from scikit_learn_imputer_spark.functions.pii import scrub_pii_col
from scikit_learn_imputer_spark.functions.text import quality_features, word_ngrams_col
from scikit_learn_imputer_spark.streaming.sinks import idempotent_batch_sink


def ingest_batch(
    batch: DataFrame,
    store_path: str,
    bench_grams: DataFrame,
    min_q_score: float = 0.5,
    min_tokens: int = 20,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One batch through scrub → gate → store-dedup → decontaminate.
    Factored out of the stream so the batch==stream test (and any batch
    backfill job) runs EXACTLY the code the stream runs."""
    clean = batch.withColumn(text_col, scrub_pii_col(F.col(text_col)))
    scored = quality_features(clean, text_col)
    gated = clean.join(
        scored.filter(
            (F.round("q_score", 6) >= min_q_score)
            & (F.col("q_tokens") >= min_tokens)
        ).select(id_col),
        on=id_col,
        how="left_semi",
    )
    survivors = incremental_dedup(gated, store_path, id_col, text_col)
    contaminated = (
        survivors.select(
            F.col(id_col),
            F.explode(word_ngrams_col(F.col(text_col), n)).alias("__g"),
        )
        .select(id_col, F.md5("__g").alias("__cg"))
        .join(bench_grams, F.col("__cg") == F.col("__bg"), "left_semi")
        .select(id_col)
        .distinct()
    )
    return survivors.join(contaminated, on=id_col, how="left_anti")


def stream_corpus_ingest(
    docs_stream: DataFrame,
    benchmark: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    min_q_score: float = 0.5,
    min_tokens: int = 20,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous corpus ingest: the batch pipeline per micro-batch.
    Benchmark digests build once (persisted, eagerly materialized);
    accepted docs' fingerprints commit AFTER the output write."""
    bench_grams = benchmark_gram_digests(benchmark, n, text_col).persist()
    bench_grams.count()

    def process(batch: DataFrame, batch_id: int) -> None:
        accepted = ingest_batch(
            batch,
            store_path,
            bench_grams,
            min_q_score,
            min_tokens,
            n,
            id_col,
            text_col,
        )
        accepted.persist()
        try:
            idempotent_batch_sink(accepted.drop("fingerprint"), out_path, batch_id)
            append_to_store(accepted, store_path)
        finally:
            accepted.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_mixture_monitor_ingest(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    source_col: str = "source",
    text_col: str = "text",
):
    """Ingest-time mixture monitor: every micro-batch lands its
    per-source (n_docs, n_tokens) delta via the exactly-once
    batch_id-keyed sink; reading the sink back and summing gives the
    CUMULATIVE realized mixture at any point of the ingest — the live
    dashboard that tells an operator whether arriving data tracks the
    mixture_epoch_plan targets. Per batch this is one map-side
    aggregate to O(#sources) rows (nothing document-sized lands), no
    cross-batch state, so cumulative-read-back == the batch answer
    exactly — which is what the driver oracle checks."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.streaming.sinks import (
        idempotent_batch_sink,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        t = F.trim(F.col(text_col))
        n = (
            F.when(F.length(t) == 0, F.lit(0))
            .otherwise(F.size(F.split(t, "\\s+")))
            .cast("bigint")
        )
        delta = (
            batch.select(F.col(source_col), n.alias("__n"))
            .groupBy(source_col)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("__n").cast("bigint").alias("n_tokens"),
            )
        )
        idempotent_batch_sink(delta, out_path, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_event_counts_ingest(
    events_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Ingest-time event-rate accountant (the streaming half of the
    event_rate_anomalies monitor): every micro-batch lands its
    (event_type, hour) count delta via the exactly-once batch_id-keyed
    sink. Reading the sink back and summing reconstructs the exact
    hourly bucket frame at any point of the ingest, so the trailing
    z-score detector can run over live data with NO cross-batch
    streaming state — late events simply add to their hour's bucket on
    the next read-back, which windowed streaming aggregation state
    would have to hold memory for. Per batch: one map-side aggregate
    to O(types x hours-in-batch) rows."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.streaming.sinks import (
        idempotent_batch_sink,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        delta = batch.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour_ts"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        idempotent_batch_sink(delta, out_path, batch_id)

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_bm25_index_ingest(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous retrieval indexing: every arriving micro-batch of
    documents appends into the persisted BM25 index via the summable
    delta contract (functions/retrieval.py:append_bm25_index) — new
    postings land in their term-bucket directories, df/stats/doclens
    land as delta files the loader folds, nothing already indexed is
    re-read. Because deltas are pure sums, the folded index after the
    stream drains equals a from-scratch build over everything that
    arrived, whatever the batch boundaries were — the batch==stream
    contract, checked by the driver oracle. EXACTLY-ONCE under replays
    (ADVICE r11): the append is keyed by the batch_id — postings land
    under (term_bucket, ingest_batch=stream-<id>) via dynamic partition
    overwrite (pruning on term_bucket is unaffected) and df/stats/
    doclens land in batch-keyed subdirs — so a foreachBatch replay
    after a crash overwrites its own partitions instead of inflating
    tf/df, the same idempotent_batch_sink contract as
    stream_event_counts_ingest."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        append_bm25_index,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        append_bm25_index(batch, index_path, id_col=id_col,
                          text_col=text_col,
                          append_id=f"stream-{batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
