"""Idempotent parquet output for foreachBatch streams.

Structured Streaming's foreachBatch contract is at-least-once: a crash
after the sink write but before the checkpoint commit replays the batch
with the SAME batch_id. A blind ``mode("append")`` therefore duplicates
that batch's rows in the output (ADVICE r6 — and for the store-backed
dedup ingests the "replay re-drops as dup" argument only covered the
case where the store append had already succeeded; the gate-only sinks
had no protection at all).

The standard fix (Spark's own docs recommend it for foreachBatch): key
the write by batch_id. Each micro-batch OWNS the hive-style partition
directory ``ingest_batch_id=<batch_id>`` and overwrites exactly that
directory on replay, so the sink output is exactly-once regardless of
where the crash landed. Readers of the output root see an extra
``ingest_batch_id`` bigint partition column via parquet partition
discovery — harmless provenance (which micro-batch landed a row), and
partition-prunable if ever filtered on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def idempotent_batch_sink(df: DataFrame, out_path: str, batch_id: int) -> None:
    """Write one micro-batch's output exactly-once: overwrite the
    batch's own ``ingest_batch_id=<batch_id>`` subdirectory under
    ``out_path``. Replaying the batch rewrites the same directory with
    the same deterministic content instead of appending duplicates."""
    df.write.mode("overwrite").parquet(
        f"{out_path.rstrip('/')}/ingest_batch_id={batch_id}"
    )
