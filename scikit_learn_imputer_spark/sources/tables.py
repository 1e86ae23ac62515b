"""Parquet loaders for the driver testdata star schema (TESTDATA.md).

SURVEY.md §2.1 S1/S6: the reference's only scan is ``pd.read_csv`` of a 19-row
fixture (tests.py:31). The engine's default source is columnar parquet so that
Catalyst gets predicate pushdown / column pruning / partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one star-schema table.

    ``events.ts`` has shipped under two physical encodings across testdata
    generations: TIMESTAMP(NANOS) int64 (which Spark's parquet reader only
    surfaces via legacy ``nanosAsLong``) and plain ``timestamp[us]``. The
    conversion is therefore conditional on the *scanned* dtype, so a
    driver-side regeneration can't break every events consumer again:

    - ``bigint``  → legacy nanos; integer-divide to micros (float division
      would round-trip ~1.7e18 nanos through a double's 53-bit mantissa and
      drift by ±1µs) and ``timestamp_micros``.
    - ``timestamp``/``timestamp_ntz`` → pass through, cast to session-tz
      TIMESTAMP (session tz is pinned UTC, so the cast is value-preserving
      and keeps one stable output dtype for watermarks & oracles).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # nanosAsLong only affects files that physically store nanos; it is
        # harmless for micros files, and must be set BEFORE the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_events_ts(raw: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-tz TIMESTAMP whatever the scanned
    dtype (shared by the batch loader above and the streaming source in
    ``streaming/events.py`` — round 3 broke because they each hard-coded
    one encoding)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` plans against them
    with the same names the DuckDB oracle uses."""
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV scan (S1). With an explicit schema when determinism matters."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def write_csv_report(df: DataFrame, path: str) -> None:
    """CSV sink for small report tables (S2) — coalesce(1) is safe because
    reports are per-column/per-model summaries, never data-sized."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines scan. Pass an explicit schema in pipelines — schema
    inference reads the data twice and infers the union of keys, both of
    which are wrong at scale."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line, splittable for re-ingest)."""
    df.write.mode("overwrite").json(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    tmp_suffix: str = "__compact_tmp",
) -> int:
    """Small-file compaction (the maintenance op every long-lived ingest
    needs): rewrite a parquet directory into ``target_files`` files via
    coalesce (narrow — no shuffle), staging into a sibling tmp dir and
    swapping only after the rewrite succeeds. Returns the file count
    before compaction. Not concurrency-safe against writers — run it like
    any table-maintenance job, exclusively."""
    import shutil

    before = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    tmp = path.rstrip("/") + tmp_suffix
    spark.read.parquet(path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(before)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Data-sized parquet sink, hive-partitioned on low-cardinality keys so
    downstream readers get PARTITION pruning (directory-level skip) on top
    of row-group pruning. ``maxRecordsPerFile`` caps file size without a
    repartition; never coalesce(1) a data-sized frame."""
    writer = df.write.mode("overwrite").partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def upsert_partitions(
    updates: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Partition-level upsert into a hive-partitioned parquet table:
    rewrite ONLY the partitions present in ``updates``, leave every other
    partition's files untouched (Spark's dynamic partitionOverwriteMode —
    the standard incremental-ingest pattern for a table no one wants to
    rewrite end-to-end at 100 TB).

    Semantics: each touched partition is REPLACED by its rows in
    ``updates`` (partition-granular, not row-granular — for row-level
    merge use operators/update.py:scatter_update and rewrite the touched
    partitions with the merged frame). The overwrite mode is set
    per-write via the writer option, not session-wide."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )
