"""Structured Streaming over the ``events`` table.

The reference has no streaming constructs (SURVEY.md §2.10); this is the
driver's north-star extension. The same windowed aggregation is exposed
twice:

- ``windowed_event_counts``: a transformation applicable to a STREAMING
  DataFrame (readStream → watermark → window agg → writeStream), with a
  watermark bounding state for late data;
- ``windowed_event_counts_batch``: the identical logical plan on a batch
  frame — Structured Streaming's batch/stream unification means one
  function body serves both, and the batch twin is what the DuckDB oracle
  checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (one-file-per-trigger so tests see
    deterministic micro-batches). Schema comes from a batch peek — parquet
    streams require an explicit schema. ``ts`` has shipped as both int64
    nanos and timestamp[us]; normalization is dtype-driven and shared with
    the batch loader (sources/tables.py:normalize_events_ts)."""
    from ..sources.tables import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a DIRECTORY; narrow it to the events
    # file with a glob filter (schema is pinned explicitly above).
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/overlapping) window counts +
    value sums per event_type with a watermark for late-data state eviction.
    Works on both batch and streaming frames (watermark is a no-op in batch
    mode). With a slide of window/k each event lands in exactly k windows —
    state grows k×, which the watermark still bounds."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = (
        F.window(F.col("ts"), window, slide) if slide
        else F.window(F.col("ts"), window)
    )
    return (
        src.groupBy(
            win.alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def windowed_event_counts_batch(
    spark: SparkSession, sf_dir: str, window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Batch twin of the streaming aggregation (oracle-checkable)."""
    from scikit_learn_imputer_spark.sources.tables import load_table

    return windowed_event_counts(
        load_table(spark, sf_dir, "events"), window, slide=slide
    )


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once view of an at-least-once event stream: drop duplicate
    event ids. Streaming uses ``dropDuplicatesWithinWatermark`` so the
    dedup state is BOUNDED (ids older than the watermark are evicted —
    unbounded-state dropDuplicates would OOM a long-running stream); batch
    uses plain dropDuplicates. Duplicates are full-row copies (redelivery),
    so which copy survives is immaterial."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def stream_events_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
):
    """Checkpointed file sink: the end-to-end exactly-once pattern
    (replayable file source + checkpointed offsets + atomic file-manifest
    commit). ``availableNow`` drains everything pending and stops —
    re-running after completion writes NOTHING new (the checkpoint
    remembers committed offsets), which is the restart-safety contract a
    production ingest relies on. Returns the StreamingQuery."""
    ev = stream_events_from_parquet(spark, sf_dir)
    return (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_to_partitioned_parquet(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: str = "event_type",
):
    """Streaming ingest into a HIVE-PARTITIONED table: the built-in file
    sink with ``partitionBy`` keeps exactly-once semantics (checkpointed
    offsets + atomic file-manifest commit — append-only files, so batch
    replay never clobbers earlier batches, unlike a foreachBatch dynamic
    overwrite) while laying out ``<out>/<key>=.../part-*.parquet`` so
    downstream batch readers partition-prune. The streaming twin of the
    batch incremental-ingest pattern; pair with compact_parquet for the
    small-files maintenance the appends eventually need."""
    ev = stream_events_from_parquet(spark, sf_dir)
    return (
        ev.writeStream.format("parquet")
        .partitionBy(partition_by)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def purchase_error_pairs(
    events: DataFrame,
    window_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join (or its batch twin when ``events`` is a
    batch frame): pair every error with the same user's purchases in the
    preceding ``window_minutes``.

    Streaming semantics: both sides carry a watermark and the join
    condition bounds event time on both sides, so Spark can expire join
    state — the state store holds only the last watermark+window of each
    side (bounded memory at any throughput). Without the time bound the
    state would grow forever; this is THE canonical watermarked
    stream-stream join shape.

    Batch semantics: identical plan modulo state — the same function
    builds the oracle-checked batch query (`purchase_error_join`).
    """
    is_streaming = events.isStreaming
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    if is_streaming:
        p = p.withWatermark("p_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (
            F.col("e_ts")
            <= F.col("p_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return p.join(e, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "p_ts",
        "e_ts",
        "purchase_value",
    )


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_stream: str = "user_id",
    on_dim: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment", "c_nationkey"),
) -> DataFrame:
    """Stream-STATIC enrichment join: attach dimension attributes to a
    stream (the standard fact-enrichment pattern).

    The static side needs no watermark and holds no state — Spark
    re-plans it per micro-batch (so a dim table refreshed on disk is
    picked up batch-over-batch) and broadcasts it when small, which is
    the common case for dims. Left join keeps stream rows whose key has
    no dim match (late-arriving dimension members) rather than dropping
    events."""
    from pyspark.sql import functions as F

    d = dim.select(F.col(on_dim).alias(on_stream), *dim_cols)
    return events.join(d, on=on_stream, how="left")
