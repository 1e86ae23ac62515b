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


def test_watermark_drops_late_beyond_bound_keeps_within(spark, tmp_path):
    """Late-data semantics around the watermark (VERDICT r3 #8): a row
    older than watermark − whose window is already finalized − is DROPPED;
    a late-arriving row still within the lateness bound is KEPT. Built on a
    synthetic 3-file source (maxFilesPerTrigger=1, mtime-ordered) so the
    watermark trajectory is deterministic:

    - batch 0: 10:00, 13:30 → watermark advances to 11:30 for batch 1
    - batch 1: 12:00 — during this batch window [10,11) is evicted and
      emitted (count 1). Eviction is what makes later arrivals "too late":
      a late row landing in the SAME batch that evicts its window would
      still be absorbed (verified empirically), so the drop case needs its
      own later batch.
    - batch 2: 10:30 → beyond the bound, state already gone → DROPPED (no
      duplicate [10,11) emission, count stays 1); 11:45 → late but within
      the bound ([11,12) not yet evicted) → KEPT.
    - batch 3: 16:30 → watermark 14:30 finalizes the remaining windows.
    """
    import os
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.sources.tables import normalize_events_ts

    def ts(h, m):
        return datetime(2024, 1, 1, h, m)

    batches = [
        [(1, ts(10, 0)), (2, ts(13, 30))],
        [(7, ts(12, 0))],
        [(3, ts(10, 30)), (5, ts(11, 45))],
        [(6, ts(16, 30))],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), type=pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        f = src / f"batch{i}.parquet"
        pq.write_table(tbl, str(f))
        os.utime(f, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    schema = spark.read.parquet(str(src)).schema
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    query = (
        agg.writeStream.format("memory")
        .queryName("ev_late")
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        rows = spark.table("ev_late").collect()
        got = {
            r["window_start"].strftime("%H:%M"): r["n_events"] for r in rows
        }
    finally:
        query.stop()

    assert len(rows) == len(got), "a window was emitted twice"
    assert got == {
        "10:00": 1,  # late 10:30 row dropped — NOT 2, and emitted only once
        "11:00": 1,  # 11:45 arrived late but within the 2h bound — kept
        "12:00": 1,
        "13:00": 1,
        # 16:00 window never finalized (no later watermark advance) — absent
    }


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


def test_stream_to_partitioned_parquet_layout_and_restart(spark, sf_smoke, tmp_path):
    """Streaming partitioned ingest: hive layout on disk, row counts match
    the batch source, partition pruning works for batch readers, and a
    restart against the same checkpoint commits nothing new."""
    import os

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.events import (
        stream_events_to_partitioned_parquet,
    )

    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = stream_events_to_partitioned_parquet(spark, sf_smoke, out, cp)
    q.awaitTermination(120)

    ev = load_table(spark, sf_smoke, "events")
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    subdirs = sorted(
        d for d in os.listdir(out) if d.startswith("event_type=")
    )
    assert subdirs == [f"event_type={t}" for t in types]

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    plan = (
        back.filter(F.col("event_type") == types[0])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan

    q2 = stream_events_to_partitioned_parquet(spark, sf_smoke, out, cp)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == ev.count()


def test_stream_dedup_ingest_dedups_across_batches(spark, tmp_path):
    """Streaming ingest-with-dedup: micro-batches are deduped within
    themselves and against the persisted store; survivors accumulate in
    the output parquet, and a doc repeated in a LATER batch is dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        stream_dedup_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(1, "alpha document"), (2, "beta document"), (3, "alpha document")],
        [(4, "alpha  DOCUMENT"), (5, "gamma document")],  # 4 = normalized dup of 1
        [(6, "beta document"), (7, "delta document")],  # 6 = dup of 2
    ]
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(tbl, str(src / f"b{i}.parquet"))

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    # empty initial store
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    build_fingerprint_store(empty, store)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = stream_dedup_ingest(stream, store, out, cp).start()
    q.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # maxFilesPerTrigger=1 keeps file order, so min-id survivors are
    # deterministic: 1 (alpha), 2 (beta), 5 (gamma), 7 (delta).
    assert kept == [1, 2, 5, 7]


def test_stream_static_enrichment_matches_batch(spark, sf_smoke):
    """Stream-static join: streaming enrichment produces exactly the
    batch join's result — dim attributes attached, unmatched stream keys
    kept with nulls."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.events import (
        enrich_stream_with_dim,
        stream_events_from_parquet,
    )

    dim = load_table(spark, sf_smoke, "customer")
    stream = stream_events_from_parquet(spark, sf_smoke)
    enriched = enrich_stream_with_dim(stream, dim)
    # countDistinct is unsupported on streams; max(user_id) is a cheap
    # deterministic stand-in that still exercises the joined key.
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("user_id").alias("max_user"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("enriched_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["c_mktsegment"]: (r["n"], r["max_user"])
            for r in spark.table("enriched_counts").collect()
        }
    finally:
        q.stop()

    ev = load_table(spark, sf_smoke, "events")
    want = {
        r["c_mktsegment"]: (r["n"], r["max_user"])
        for r in enrich_stream_with_dim(ev, dim)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("user_id").alias("max_user"),
        )
        .collect()
    }
    assert got == want and len(want) >= 2


def test_stream_dedup_ingest_restart_from_checkpoint(spark, tmp_path):
    """VERDICT r5 #7: kill-and-restart the dedup ingest from its
    checkpoint — the restarted query skips already-processed files, and
    survivors + fingerprint store equal the uninterrupted run's."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        stream_dedup_ingest,
    )

    batches = [
        [(1, "alpha document"), (2, "beta document"), (3, "alpha document")],
        [(4, "alpha  DOCUMENT"), (5, "gamma document")],
        [(6, "beta document"), (7, "delta document")],
    ]

    def write_file(src, i):
        rows = batches[i]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
        pq.write_table(tbl, str(src / f"b{i}.parquet"))

    def drain(src, store, out, cp):
        schema = "doc_id bigint, text string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(src))
        )
        q = stream_dedup_ingest(stream, store, out, cp).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    empty = spark.createDataFrame([], "doc_id bigint, text string")

    # interrupted: file 0, stop, files 1+2 arrive, restart from same cp
    src = tmp_path / "src"
    src.mkdir()
    store, out, cp = (str(tmp_path / p) for p in ("store", "out", "cp"))
    build_fingerprint_store(empty, store)
    write_file(src, 0)
    drain(src, store, out, cp)
    write_file(src, 1)
    write_file(src, 2)
    drain(src, store, out, cp)

    # uninterrupted twin
    src2 = tmp_path / "src2"
    src2.mkdir()
    store2, out2, cp2 = (str(tmp_path / p) for p in ("store2", "out2", "cp2"))
    build_fingerprint_store(empty, store2)
    for i in range(3):
        write_file(src2, i)
    drain(src2, store2, out2, cp2)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert kept == kept2 == [1, 2, 5, 7]
    fp = lambda p: sorted(r["fingerprint"] for r in spark.read.parquet(p).collect())
    assert fp(store) == fp(store2)


def test_stream_quality_gate_matches_batch(spark, sf_smoke, tmp_path):
    """Within-document signals are batch-invariant: the streamed Gopher
    gate (foreachBatch, maxFilesPerTrigger split) emits exactly the
    batch gate's survivor set."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.repetition import (
        repetition_signals,
        stream_quality_gate,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    def gate(batch):
        rep = repetition_signals(batch)
        return rep.filter(
            F.col("n_tokens").between(30, 95) & (F.col("top2_frac") <= 0.12)
        ).select("doc_id", "n_tokens")

    docs = load_table(spark, sf_smoke, "documents")
    want = sorted(r["doc_id"] for r in gate(docs).collect())

    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)  # several files -> several batches
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(*docs.columns)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = stream_quality_gate(stream, out, ck, gate).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == want and len(got) > 0


def test_stream_decontaminate_ingest_matches_batch(spark, sf_smoke, tmp_path):
    """Streaming n-gram decontamination: draining the file stream through
    stream_decontaminate_ingest yields exactly the one-shot batch
    decontaminate_ngram result (the gate is a pure per-doc function of a
    STATIC benchmark), across micro-batch boundaries."""
    from scikit_learn_imputer_spark.dedup.exact import (
        decontaminate_ngram,
        stream_decontaminate_ingest,
    )

    bench = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id bigint, text string"
    )
    corpus_rows = [
        (1, "prefix one two three four five suffix"),   # embedded bench gram
        (2, "totally clean document with fresh words"),
        (3, "six five four three two one"),              # reversed: no gram hit
        (4, "xx two three four five six yy"),            # second bench gram
        (5, "another clean words here indeed today"),
        (6, "short"),                                    # < n tokens
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    want = sorted(r["doc_id"] for r in decontaminate_ngram(corpus, bench).collect())
    assert want == [2, 3, 5, 6]  # the gate is non-vacuous in both directions

    src = str(tmp_path / "src")
    corpus.repartition(3).write.parquet(src)  # several files -> several batches
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(*corpus.columns)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = stream_decontaminate_ingest(stream, bench, out, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == want


def test_stream_corpus_ingest_full_pipeline(spark, tmp_path):
    """The streaming corpus-ingest capstone: scrub -> quality gate ->
    store-dedup -> decontaminate per micro-batch, across batch
    boundaries; drained output equals the sequential per-batch run of
    the SAME ingest_batch code, and each planted failure mode is dropped
    by its intended stage."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.dedup.exact import benchmark_gram_digests
    from scikit_learn_imputer_spark.dedup.incremental import (
        append_to_store,
        build_fingerprint_store,
    )
    from scikit_learn_imputer_spark.streaming.ingest import (
        ingest_batch,
        stream_corpus_ingest,
    )

    good = (
        "the quick brown fox jumps over the lazy dog while many other words "
        "keep this document comfortably above the twenty token minimum today "
        "with plenty of plain english filler text"
    )
    good2 = good.replace("quick", "rapid").replace("lazy", "idle")
    bench_text = "secret benchmark phrase alpha beta gamma delta epsilon"
    contaminated = good2 + " secret benchmark phrase alpha beta gamma delta epsilon"
    low_quality = "x" * 400  # no tokens/stopwords: fails the gate
    batches = [
        [(1, good), (2, low_quality)],
        [(3, good), (4, contaminated), (5, good2)],  # 3 dups 1 cross-batch
    ]
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id bigint, text string"
    )
    schema = "doc_id bigint, text string"

    def write_src(root):
        src = root / "src"
        src.mkdir()
        for i, rows in enumerate(batches):
            p = str(src / f"b{i}.parquet")
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "text": pa.array([r[1] for r in rows]),
                    }
                ),
                p,
            )
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        return src

    empty = spark.createDataFrame([], schema)

    # streaming run
    s_root = tmp_path / "stream"
    s_root.mkdir()
    src = write_src(s_root)
    store, out, cp = (str(s_root / p) for p in ("store", "out", "cp"))
    build_fingerprint_store(empty, store)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = stream_corpus_ingest(stream, bench, store, out, cp).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # 1 kept; 2 quality-dropped; 3 dup of 1; 4 contaminated; 5 kept
    assert got == [1, 5]

    # sequential twin through the SAME ingest_batch code
    b_root = tmp_path / "batchwise"
    b_root.mkdir()
    store2 = str(b_root / "store")
    build_fingerprint_store(empty, store2)
    bg = benchmark_gram_digests(bench)
    kept = []
    for rows in batches:
        batch = spark.createDataFrame(rows, schema)
        acc = ingest_batch(batch, store2, bg)
        kept += [r["doc_id"] for r in acc.select("doc_id").collect()]
        append_to_store(acc, store2)
    assert sorted(kept) == got


def test_stream_corpus_ingest_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-restart the corpus ingest from its checkpoint: the
    restarted query skips processed files, and accepted docs equal the
    uninterrupted run's."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
    )
    from scikit_learn_imputer_spark.streaming.ingest import stream_corpus_ingest

    good = (
        "the quick brown fox jumps over the lazy dog while many other words "
        "keep this document comfortably above the twenty token minimum today "
        "with plenty of plain english filler text"
    )
    alt = good.replace("fox", "owl").replace("dog", "cat")
    batches = [
        [(1, good)],
        [(2, good), (3, alt)],   # 2 dups 1 across the restart boundary
        [(4, alt)],              # dups 3
    ]
    bench = spark.createDataFrame(
        [(100, "secret benchmark phrase alpha beta gamma delta epsilon")],
        "doc_id bigint, text string",
    )
    schema = "doc_id bigint, text string"
    empty = spark.createDataFrame([], schema)

    def write_file(src, i):
        rows = batches[i]
        p = str(src / f"b{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    def drain(src, store, out, cp):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(src))
        )
        q = stream_corpus_ingest(stream, bench, store, out, cp).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # interrupted: file 0, stop, files 1+2 arrive, restart from same cp
    src = tmp_path / "src"
    src.mkdir()
    store, out, cp = (str(tmp_path / p) for p in ("store", "out", "cp"))
    build_fingerprint_store(empty, store)
    write_file(src, 0)
    drain(src, store, out, cp)
    write_file(src, 1)
    write_file(src, 2)
    drain(src, store, out, cp)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())

    # uninterrupted twin
    src2 = tmp_path / "src2"
    src2.mkdir()
    store2, out2, cp2 = (str(tmp_path / p) for p in ("store2", "out2", "cp2"))
    build_fingerprint_store(empty, store2)
    for i in range(3):
        write_file(src2, i)
    drain(src2, store2, out2, cp2)
    want = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())

    assert got == want == [1, 3]


def test_idempotent_batch_sink_replay_no_duplicates(spark, tmp_path):
    """A replayed foreachBatch (same batch_id) overwrites its own subdir
    instead of appending duplicates; distinct batch_ids accumulate."""
    from scikit_learn_imputer_spark.streaming.sinks import idempotent_batch_sink

    out = str(tmp_path / "out")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(3, "c")], "doc_id bigint, text string")
    idempotent_batch_sink(b0, out, 0)
    idempotent_batch_sink(b0, out, 0)  # replay: same batch_id
    idempotent_batch_sink(b1, out, 1)
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 2, 3]
    # provenance partition column rides along and is prunable
    assert "ingest_batch_id" in back.columns


def test_stream_pack_ingest_replay_after_commit_is_skipped(spark, tmp_path):
    """The pack ingest's offset commit records last_batch_id so a replay
    arriving AFTER the commit is detected and skipped — a blind re-pack
    against the advanced offsets would emit wrong positions (ADVICE r6)."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        commit_offsets,
        incremental_pack,
        last_committed_batch_id,
    )

    schema = "doc_id bigint, source string, text string"
    store = str(tmp_path / "store")
    empty = spark.createDataFrame([], schema)
    build_offset_store(empty, store, seq_len=8)
    assert last_committed_batch_id(spark, store) == -1

    batch = spark.createDataFrame(
        [(1, "s", "one two three four five"), (2, "s", "six seven eight")],
        schema,
    )
    packed = incremental_pack(batch, store, seq_len=8)
    want = sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"]) for r in packed.collect()
    )
    commit_offsets(packed, store, seq_len=8, batch_id=0)
    assert last_committed_batch_id(spark, store) == 0

    # Replay after commit: the guard says "already processed"; a blind
    # re-pack would have produced different (rebased-again) offsets.
    replay = incremental_pack(batch, store, seq_len=8)
    got = sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"]) for r in replay.collect()
    )
    assert got != want  # proves the guard is necessary
    # seq_len validation still works with the batch-id column present
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seq_len"):
        incremental_pack(batch, store, seq_len=16)


def test_stream_mixture_monitor_multibatch_matches_batch(
    spark, sf_smoke, tmp_path
):
    """The monitor's cumulative read-back equals the one-shot batch
    aggregate even when the corpus arrives as several micro-batches
    (per-batch deltas are pure map-side partials of a sum)."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.ingest import (
        stream_mixture_monitor_ingest,
    )

    docs = load_table(spark, sf_smoke, "documents")
    t = F.trim(F.col("text"))
    n = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    want = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in docs.select("source", n.alias("__n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }

    src = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(*docs.columns)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = stream_mixture_monitor_ingest(stream, out, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    landed = spark.read.parquet(out)
    # several batches actually landed (the sink is partitioned by batch)
    n_batches = landed.select("ingest_batch_id").distinct().count()
    assert n_batches >= 2
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in landed.groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    assert got == want


def test_stream_dedup_ingest_quality_override(spark, tmp_path):
    """ADVICE r8: stream_dedup_ingest must pass the `quality` column
    override through to incremental_dedup — the streaming 'quality'
    path was locked to the default q_score. A custom score column picks
    a within-batch survivor min-id never would."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        stream_dedup_ingest,
    )

    src = tmp_path / "src"
    src.mkdir()
    # 1 and 3 are exact duplicates; the custom score column ranks 3 above
    # 1 (min-id AND default q_score would both keep 1 — identical text).
    rows = [
        (1, "alpha document", 0.1),
        (2, "beta document", 0.5),
        (3, "alpha document", 0.9),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "score": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(tbl, str(src / "b0.parquet"))

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    build_fingerprint_store(empty, store)

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_dedup_ingest(
        stream, store, out, cp, keep="quality", quality=F.col("score")
    ).start()
    q.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [2, 3]
