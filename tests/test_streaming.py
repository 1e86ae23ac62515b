"""Structured Streaming tests: the windowed event aggregation must produce
the same result through readStream (memory sink, processing until done) as
through the batch twin."""

from scikit_learn_imputer_spark.streaming.events import (
    stream_events_from_parquet,
    windowed_event_counts,
    windowed_event_counts_batch,
)


def test_stream_matches_batch(spark, sf_smoke):
    stream = stream_events_from_parquet(spark, sf_smoke)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    query = (
        agg.writeStream.format("memory")
        .queryName("ev_counts")
        .outputMode("complete")
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in spark.table("ev_counts").collect()
        }
    finally:
        query.stop()

    batch = windowed_event_counts_batch(spark, sf_smoke, "1 hour")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == expected
    assert len(expected) > 0


def test_sliding_stream_matches_batch(spark, sf_smoke):
    """1h/30m sliding windows: every event in exactly two windows, stream
    result equals the batch twin (and the events_sliding oracle query)."""
    stream = stream_events_from_parquet(spark, sf_smoke)
    agg = windowed_event_counts(
        stream, window="1 hour", watermark="2 hours", slide="30 minutes"
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("ev_sliding")
        .outputMode("complete")
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in spark.table("ev_sliding").collect()
        }
    finally:
        query.stop()

    batch = windowed_event_counts_batch(
        spark, sf_smoke, "1 hour", slide="30 minutes"
    )
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == expected
    tumbling = windowed_event_counts_batch(spark, sf_smoke, "1 hour")
    # each event contributes to exactly 2 sliding windows
    n_sliding = sum(v[0] for v in expected.values())
    n_events = sum(r["n_events"] for r in tumbling.collect())
    assert n_sliding == 2 * n_events


def test_stream_dedup_exactly_once(spark, sf_smoke):
    """At-least-once redelivery (every event twice) deduped back to
    exactly-once, with watermark-bounded state in the streaming path."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.streaming.events import deduped_events

    def doubled(df):
        return df.withColumn(
            "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
        ).drop("__copy")

    stream = doubled(stream_events_from_parquet(spark, sf_smoke))
    out = deduped_events(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("ev_dedup")
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        got = sorted(r["event_id"] for r in spark.table("ev_dedup").collect())
    finally:
        query.stop()

    from scikit_learn_imputer_spark.sources.tables import load_table

    batch = load_table(spark, sf_smoke, "events")
    expected = sorted(r["event_id"] for r in batch.select("event_id").collect())
    assert got == expected


def test_stream_to_parquet_exactly_once_across_restart(spark, sf_smoke, tmp_path):
    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.events import (
        stream_events_to_parquet,
    )

    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = stream_events_to_parquet(spark, sf_smoke, out, cp)
    q.awaitTermination(120)
    n_batch = load_table(spark, sf_smoke, "events").count()
    assert spark.read.parquet(out).count() == n_batch

    # Restart against the same checkpoint: nothing new to commit.
    q2 = stream_events_to_parquet(spark, sf_smoke, out, cp)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_batch


def test_stream_stream_join_matches_batch(spark, sf_smoke):
    """Watermarked stream-stream self-join (purchase↔error pairs): the
    append-mode streaming result must equal the batch twin once the
    source drains — the watermark bounds state, not results, for a finite
    replay."""
    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.events import (
        purchase_error_pairs,
        stream_events_from_parquet,
    )

    batch = {
        (r["user_id"], r["p_ts"], r["e_ts"])
        for r in purchase_error_pairs(
            load_table(spark, sf_smoke, "events"), window_minutes=60
        ).collect()
    }

    stream = stream_events_from_parquet(spark, sf_smoke)
    q = (
        purchase_error_pairs(stream, window_minutes=60)
        .writeStream.format("memory")
        .queryName("pe_pairs")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["p_ts"], r["e_ts"])
            for r in spark.table("pe_pairs").collect()
        }
    finally:
        q.stop()

    assert len(batch) > 0
    assert got == batch
