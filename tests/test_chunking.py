"""Chunking/packing operator semantics (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)


def test_chunk_documents_window_grid_and_edges(spark):
    words = " ".join(str(i) for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [
            (1, words),            # 10 tokens, chunk 8 / overlap 4 -> starts 0, 4
            (2, "a b c"),          # shorter than one chunk -> one chunk
            (3, ""),               # empty -> no chunks
            (4, "   "),            # whitespace-only -> no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_size=8, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(by_doc) == [1, 2]
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    # starts = 0, 4 (start 8 would add no new tokens beyond doc 10's tail
    # minus overlap and is excluded by the n-overlap-1 bound)
    assert [(r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"]) for r in c1] == [
        (0, 0, 8),
        (1, 4, 6),
    ]
    assert c1[0]["chunk_text"] == " ".join(str(i) for i in range(8))
    assert c1[1]["chunk_text"] == " ".join(str(i) for i in range(4, 10))
    [c2] = by_doc[2]
    assert (c2["chunk_id"], c2["chunk_start"], c2["n_chunk_tokens"]) == (0, 0, 3)
    # every token of every doc is covered by at least one chunk
    assert set(c1[0]["chunk_text"].split() + c1[1]["chunk_text"].split()) == set(
        words.split()
    )


def test_chunk_documents_validates_params(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)


def test_pack_sequences_offsets_cuts_and_straddles(spark):
    def doc(i, n, src="web"):
        return (i, src, " ".join("t" * 1 for _ in range(n)))

    df = spark.createDataFrame(
        [doc(1, 6), doc(2, 3), doc(3, 5), (4, "web", ""), doc(10, 9, "code")],
        ["doc_id", "source", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=8, shard_col="source").collect()
    }
    # web shard stream: doc1 tokens 0-5, doc2 6-8 (straddles the cut at 8),
    # doc4 empty at 9, doc3 9-13
    assert (out[1]["seq_id"], out[1]["seq_offset"], out[1]["straddles"]) == (0, 0, False)
    assert (out[2]["seq_id"], out[2]["seq_offset"], out[2]["straddles"]) == (0, 6, True)
    assert (out[3]["seq_id"], out[3]["seq_offset"], out[3]["straddles"]) == (1, 1, False)
    assert out[4]["n_tokens"] == 0 and out[4]["straddles"] is False
    # shards pack independently
    assert (out[10]["seq_id"], out[10]["seq_offset"], out[10]["straddles"]) == (
        0, 0, True,
    )
    # conservation: per shard, cum of n_tokens equals last doc's offset math
    web_total = sum(out[i]["n_tokens"] for i in (1, 2, 3, 4))
    assert web_total == 14


def test_pack_sequences_window_is_shard_partitioned(spark, sf_smoke):
    """Scale guard: the running sum must partition by the shard key —
    no SinglePartition window over the whole corpus."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    df = pack_sequences(docs, seq_len=512)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan


def test_incremental_pack_sequential_equals_global(spark, sf_smoke, tmp_path):
    """Packing batch-by-batch against the offset store must produce
    EXACTLY the (seq_id, offset, straddles) a single global
    pack_sequences run assigns — for any batch split that respects
    per-shard doc_id order."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        commit_offsets,
        incremental_pack,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    store = str(tmp_path / "offsets")
    build_offset_store(docs.limit(0), store, seq_len=512)
    golden = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["straddles"])
        for r in pack_sequences(docs, 512).collect()
    }
    got = {}
    for lo, hi in ((0, 170), (170, 340), (340, 10**9)):
        b = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        p = incremental_pack(b, store, 512)
        p.persist()
        for r in p.collect():
            got[r["doc_id"]] = (r["seq_id"], r["seq_offset"], r["straddles"])
        commit_offsets(p, store, 512)
        p.unpersist()
    assert got == golden
    # empty batch: a no-op that must not corrupt the store
    empty = incremental_pack(docs.filter(F.col("doc_id") < 0), store, 512)
    empty.persist()
    assert empty.count() == 0
    commit_offsets(empty, store, 512)
    empty.unpersist()
    after = {
        (r["source"], r["cum_tokens"])
        for r in spark.read.parquet(store).collect()
    }
    assert len(after) == 20 and all(c > 0 for _, c in after)


def test_stream_pack_ingest_matches_batch(spark, sf_smoke, tmp_path):
    """The foreachBatch streaming form packs the drained stream exactly
    like one global batch run (availableNow drain, offsets committed per
    micro-batch)."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        stream_pack_ingest,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    golden = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["straddles"])
        for r in pack_sequences(docs, 512).collect()
    }
    store = str(tmp_path / "offsets")
    out = str(tmp_path / "packed")
    ck = str(tmp_path / "ck")
    build_offset_store(docs.limit(0), store, seq_len=512)
    # file stream source needs a DIRECTORY; narrow to the documents file
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_smoke)
        .select(*docs.columns)
    )
    q = stream_pack_ingest(stream, store, out, ck, seq_len=512).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["straddles"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == golden


def test_chunk_documents_partition_property_no_overlap(spark):
    """With overlap=0 the chunks PARTITION the token stream: chunk
    texts concatenate back to the normalized document, token counts sum
    exactly, and chunk_starts form the arithmetic grid — across a
    seeded corpus of adversarial shapes (unicode, repeated/weird
    whitespace, lengths straddling the chunk size)."""
    import random

    rng = random.Random(1234)
    words = ["a", "bb", "ccc", "Ω≈ç", "étude", "x" * 17, "0"]
    rows = []
    for i in range(40):
        n = rng.choice([0, 1, 7, 8, 9, 15, 16, 17, 40])
        sep = rng.choice([" ", "  ", "\t", " \t "])
        rows.append((i, sep.join(rng.choice(words) for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=8, overlap=0).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        toks = text.split()
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert chunks == []
            continue
        assert [r["chunk_start"] for r in chunks] == [
            8 * j for j in range(len(chunks))
        ]
        assert sum(r["n_chunk_tokens"] for r in chunks) == len(toks)
        assert " ".join(r["chunk_text"] for r in chunks) == " ".join(toks)


def test_chunk_documents_overlap_coverage_property(spark):
    """With overlap>0 every token is covered, consecutive chunks share
    exactly `overlap` tokens (except a short final chunk), and no chunk
    is a subset of its predecessor."""
    import random

    rng = random.Random(99)
    rows = [
        (i, " ".join(f"t{rng.randint(0, 5)}" for _ in range(n)))
        for i, n in enumerate([1, 4, 5, 6, 10, 11, 12, 23, 24, 25, 37])
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c, ov = 12, 4
    out = chunk_documents(df, chunk_size=c, overlap=ov).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in rows:
        toks = text.split()
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            covered |= set(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
        assert covered == set(range(len(toks))), f"doc {i} gap"
        for p, q in zip(chunks, chunks[1:]):
            assert q["chunk_start"] == p["chunk_start"] + (c - ov)
            assert q["n_chunk_tokens"] >= 1


def test_offset_store_seq_len_mismatch_fails_fast(spark, tmp_path):
    """ADVICE r5: the store persists seq_len; incremental_pack/commit
    against a different seq_len raise instead of silently mis-packing."""
    import pytest

    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        commit_offsets,
        incremental_pack,
    )

    path = str(tmp_path / "store")
    hist = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "d e", "s2")], ["doc_id", "text", "source"]
    )
    build_offset_store(hist, path, seq_len=8)
    batch = spark.createDataFrame([(3, "f g h", "s1")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="seq_len"):
        incremental_pack(batch, path, seq_len=16)
    packed = incremental_pack(batch, path, seq_len=8)
    with pytest.raises(ValueError, match="seq_len"):
        commit_offsets(packed, path, seq_len=16)
    commit_offsets(packed, path, seq_len=8)  # matching: round-trips
    # seq_len survives the commit rewrite.
    assert [r[0] for r in spark.read.parquet(path).select("seq_len").distinct().collect()] == [8]


def test_pack_sequences_pluggable_token_count(spark):
    """token_count_col packs by a precomputed count instead of the
    whitespace tokenizer — cuts land on the supplied budget."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    rows = [(1, "ignored", "s", 6), (2, "ignored", "s", 3), (3, "ignored", "s", 4)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "n_custom"])
    out = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"], r["straddles"])
        for r in pack_sequences(df, seq_len=8, token_count_col="n_custom").collect()
    }
    assert out[1] == (6, 0, 0, False)
    assert out[2] == (3, 0, 6, True)   # 6+3 > 8: straddles the cut
    assert out[3] == (4, 1, 1, False)  # continues in sequence 1


def test_seeded_global_shuffle_is_exact_permutation(spark):
    """Positions are exactly 1..N; the order is the md5(seed:key) order;
    identical across partitionings, bucket widths, and re-runs; seed
    changes the permutation."""
    import hashlib

    from scikit_learn_imputer_spark.operators.shuffle import seeded_global_shuffle

    rows = [(s, i) for s in ("s1", "s2", "s3") for i in range(40)]
    df = spark.createDataFrame(rows, ["source", "seq_id"])

    def run(parts, chars, seed):
        out = seeded_global_shuffle(
            df.repartition(parts), ["source", "seq_id"], seed=seed, bucket_chars=chars
        ).collect()
        return {(r["source"], r["seq_id"]): r["position"] for r in out}

    a = run(1, 2, 7)
    assert sorted(a.values()) == list(range(1, 121))
    # expected order straight from hashlib
    want = sorted(rows, key=lambda r: (hashlib.md5(f"7:{r[0]}:{r[1]}".encode()).hexdigest(), r))
    assert [k for k, _ in sorted(a.items(), key=lambda kv: kv[1])] == want
    assert run(16, 2, 7) == a
    assert run(4, 1, 7) == a
    assert run(4, 3, 7) == a
    b = run(4, 2, 8)
    assert sorted(b.values()) == list(range(1, 121))
    assert b != a


def test_seeded_global_shuffle_validation(spark):
    import pytest

    from scikit_learn_imputer_spark.operators.shuffle import seeded_global_shuffle

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError):
        seeded_global_shuffle(df, [])
    with pytest.raises(ValueError):
        seeded_global_shuffle(df, ["x"], bucket_chars=0)
    with pytest.raises(ValueError):
        seeded_global_shuffle(df, ["x"], bucket_chars=9)


def test_stream_pack_ingest_restart_from_checkpoint(spark, sf_smoke, tmp_path):
    """VERDICT r5 #7: stop the ingest query, add data, restart a NEW
    query from the SAME checkpoint — only unseen files process, and the
    final output + offset store equal an uninterrupted run's."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        stream_pack_ingest,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    phase1 = docs.filter(F.col("doc_id") < 250)
    phase2 = docs.filter(F.col("doc_id") >= 250)

    def drain(src, store, out, ck):
        schema = docs.schema
        stream = spark.readStream.schema(schema).parquet(src).select(*docs.columns)
        q = stream_pack_ingest(stream, store, out, ck, seq_len=512).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # interrupted run: phase 1, stop, phase 2 arrives, restart
    src = str(tmp_path / "src")
    store, out, ck = (str(tmp_path / p) for p in ("store", "out", "ck"))
    build_offset_store(docs.limit(0), store, seq_len=512)
    phase1.write.mode("append").parquet(src)
    drain(src, store, out, ck)
    phase2.write.mode("append").parquet(src)
    drain(src, store, out, ck)  # same checkpoint: processes ONLY phase 2

    # uninterrupted twin
    src2 = str(tmp_path / "src2")
    store2, out2, ck2 = (str(tmp_path / p) for p in ("store2", "out2", "ck2"))
    build_offset_store(docs.limit(0), store2, seq_len=512)
    docs.write.mode("append").parquet(src2)
    drain(src2, store2, out2, ck2)

    key = lambda p: {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["straddles"])
        for r in spark.read.parquet(p).collect()
    }
    got, want = key(out), key(out2)
    assert got == want and len(got) == docs.count()
    st = lambda p: sorted(
        (r["source"], r["cum_tokens"]) for r in spark.read.parquet(p).collect()
    )
    assert st(store) == st(store2)


def test_training_shards_contiguous_ranges(spark):
    from scikit_learn_imputer_spark.operators.shuffle import (
        seeded_global_shuffle,
        training_shards,
    )

    df = spark.createDataFrame([(f"s{i}", i) for i in range(37)], ["source", "seq_id"])
    sh = seeded_global_shuffle(df, ["source", "seq_id"], seed=1)
    got = {
        r["shard_id"]: (r["n_sequences"], r["first_position"], r["last_position"])
        for r in training_shards(sh, shard_size=10).collect()
    }
    assert got == {0: (10, 1, 10), 1: (10, 11, 20), 2: (10, 21, 30), 3: (7, 31, 37)}
    import pytest

    with pytest.raises(ValueError):
        training_shards(sh, 0)


def test_write_training_shards_physical_layout(spark, tmp_path):
    """The physical shard writer's layout contract: one parquet file per
    shard directory (repartition-on-shard-key before partitionBy — the
    round-6 file-explosion lesson), rows inside each file sorted by
    position, and the read-back manifest equal to training_shards'."""
    import os

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.operators.shuffle import (
        seeded_global_shuffle,
        training_shards,
        write_training_shards,
    )

    rows = [(i, f"src{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "seq bigint, source string")
    shuffled = seeded_global_shuffle(df, ["seq"], seed=7)
    out = str(tmp_path / "shards")
    write_training_shards(shuffled, out, shard_size=8)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(shard_dirs) == 13  # ceil(100 / 8)
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
        pos = [
            r["position"]
            for r in spark.read.parquet(os.path.join(out, d, files[0]))
            .select("position")
            .collect()
        ]
        assert pos == sorted(pos)  # in-file training order

    back = spark.read.parquet(out)
    got = {
        r["shard_id"]: (r["n"], r["lo"], r["hi"])
        for r in back.groupBy(F.col("shard_id").cast("bigint").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("position").alias("lo"),
            F.max("position").alias("hi"),
        )
        .collect()
    }
    want = {
        r["shard_id"]: (r["n_sequences"], r["first_position"], r["last_position"])
        for r in training_shards(shuffled, shard_size=8).collect()
    }
    assert got == want


def test_repack_after_delete_equals_full_repack(spark):
    """Deletion propagation == full re-pack of the survivors, with
    untouched shards passing through and the offset store continuing
    correctly after adjustment (delete-then-continue end-to-end)."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.operators.chunking import (
        adjust_offsets_after_delete,
        build_offset_store,
        incremental_pack,
        pack_sequences,
        repack_after_delete,
    )

    rows = [
        (i, f"s{i % 3}", " ".join(["w"] * (3 + (i * 7) % 11))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    packed = pack_sequences(docs, seq_len=16)
    # delete docs from sources s0 and s1 only; s2 untouched
    deleted = spark.createDataFrame(
        [(0,), (9,), (12,), (22,)], "doc_id bigint"
    )
    got = repack_after_delete(packed, deleted, seq_len=16)
    want = pack_sequences(
        docs.join(deleted, "doc_id", "left_anti"), seq_len=16
    )
    key = lambda r: (r["doc_id"], r["source"], r["n_tokens"],  # noqa: E731
                     r["seq_id"], r["seq_offset"], r["straddles"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))

    # untouched shard s2: rows byte-identical to the original packing
    orig_s2 = sorted(map(key, packed.filter(F.col("source") == "s2").collect()))
    new_s2 = sorted(map(key, got.filter(F.col("source") == "s2").collect()))
    assert orig_s2 == new_s2

    # deleting nothing is the identity
    none = spark.createDataFrame([], "doc_id bigint")
    same = repack_after_delete(packed, none, seq_len=16)
    assert sorted(map(key, same.collect())) == sorted(map(key, packed.collect()))


def test_adjust_offsets_after_delete_continues_correctly(spark, tmp_path):
    """Offset-store half: after deleting history docs, repacking, and
    adjusting the store, the NEXT incremental batch packs exactly where
    a full re-pack of (survivors + new batch) would place it."""
    from scikit_learn_imputer_spark.operators.chunking import (
        adjust_offsets_after_delete,
        build_offset_store,
        incremental_pack,
        pack_sequences,
        repack_after_delete,
    )

    schema = "doc_id bigint, source string, text string"
    hist = spark.createDataFrame(
        [
            (1, "a", "one two three four five"),
            (2, "a", "six seven eight nine"),
            (3, "b", "ten eleven twelve"),
            (4, "a", "thirteen fourteen"),
        ],
        schema,
    )
    store = str(tmp_path / "store")
    build_offset_store(hist, store, seq_len=8)

    deleted = spark.createDataFrame([(2,)], "doc_id bigint")
    packed_hist = pack_sequences(hist, seq_len=8)
    packed_deleted = packed_hist.join(deleted, "doc_id", "left_semi")
    adjust_offsets_after_delete(packed_deleted, store, seq_len=8)

    nxt = spark.createDataFrame(
        [(10, "a", "alpha beta gamma"), (11, "b", "delta epsilon")], schema
    )
    got = incremental_pack(nxt, store, seq_len=8)

    full = pack_sequences(
        hist.join(deleted, "doc_id", "left_anti").unionByName(nxt), seq_len=8
    ).join(nxt.select("doc_id"), "doc_id", "left_semi")
    key = lambda r: (r["doc_id"], r["source"], r["n_tokens"],  # noqa: E731
                     r["seq_id"], r["seq_offset"], r["straddles"])
    assert sorted(map(key, got.collect())) == sorted(map(key, full.collect()))


def test_adjust_offsets_preserves_last_batch_id(spark, tmp_path):
    """ADVICE r7: the delete adjustment rewrites the offset store; the
    streaming replay guard (last_batch_id) must survive the rewrite or a
    committed-but-uncheckpointed batch replays undetected and
    double-advances the offsets."""
    from scikit_learn_imputer_spark.operators.chunking import (
        adjust_offsets_after_delete,
        build_offset_store,
        commit_offsets,
        incremental_pack,
        last_committed_batch_id,
        pack_sequences,
    )

    schema = "doc_id bigint, source string, text string"
    hist = spark.createDataFrame(
        [(1, "a", "one two three four five"), (2, "a", "six seven eight")],
        schema,
    )
    store = str(tmp_path / "store")
    build_offset_store(hist.limit(0), store, seq_len=8)
    packed = incremental_pack(hist, store, seq_len=8)
    commit_offsets(packed, store, seq_len=8, batch_id=3)
    assert last_committed_batch_id(spark, store) == 3

    deleted = spark.createDataFrame([(2,)], "doc_id bigint")
    packed_deleted = pack_sequences(hist, seq_len=8).join(
        deleted, "doc_id", "left_semi"
    )
    adjust_offsets_after_delete(packed_deleted, store, seq_len=8)
    assert last_committed_batch_id(spark, store) == 3

    # pre-streaming store (no batch column): the rewrite must not invent one
    store2 = str(tmp_path / "store2")
    build_offset_store(hist, store2, seq_len=8)
    adjust_offsets_after_delete(
        pack_sequences(hist, seq_len=8).join(deleted, "doc_id", "left_semi"),
        store2,
        seq_len=8,
    )
    assert last_committed_batch_id(spark, store2) == -1


def test_stream_pack_ingest_store_ahead_of_stream_raises(spark, tmp_path):
    """ADVICE r7: batch ids restart at 0 under a cleared checkpoint; a
    store already committed PAST the incoming batch is a
    checkpoint/store mismatch and must raise, not silently drop every
    early batch."""
    import pytest as _pytest
    from pyspark.errors import StreamingQueryException

    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        commit_offsets,
        incremental_pack,
        stream_pack_ingest,
    )

    schema = "doc_id bigint, source string, text string"
    docs = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", "four five")], schema
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    store = str(tmp_path / "store")
    build_offset_store(docs.limit(0), store, seq_len=8)
    # advance the store to batch 5 as if an earlier stream committed it
    commit_offsets(
        incremental_pack(docs, store, seq_len=8), store, seq_len=8, batch_id=5
    )

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_pack_ingest(
        stream,
        store,
        str(tmp_path / "out"),
        str(tmp_path / "ck_fresh"),  # fresh checkpoint -> batch ids restart at 0
        seq_len=8,
    ).start()
    try:
        with _pytest.raises(StreamingQueryException, match="out of sync"):
            q.processAllAvailable()
    finally:
        q.stop()
