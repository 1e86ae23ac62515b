"""Token-ID materialization (functions/bpe.py:bpe_encode +
operators/tokenized.py) — the corpus -> trainer handoff emits the ids a
loader reads (VERDICT r7 #1)."""

import collections
import glob
import os

import pytest
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.bpe import (
    DEFAULT_BPE_VOCAB,
    bpe_encode,
    count_word_tokens,
    encode_word_ids,
    vocab_ids,
    with_bpe_token_counts,
)
from scikit_learn_imputer_spark.operators.tokenized import (
    tokenized_sequences,
    write_tokenized_shards,
)

ROWS = [
    (1, "a", "query table customer spark value"),
    (2, "a", "fast hash line order group window"),
    (3, "b", "key agg row aaa zz"),
    (4, "a", ""),
    (5, "b", "customer order   query "),
    (6, "b", "naïve café — mixed unicode ¤ text"),
]
SCHEMA = "doc_id bigint, source string, text string"


def _ref_doc_ids(text: str) -> list[int]:
    ids = vocab_ids(DEFAULT_BPE_VOCAB)
    lens = tuple(sorted({len(v) for v in DEFAULT_BPE_VOCAB}, reverse=True))
    out: list[int] = []
    for w in text.split():
        out.extend(encode_word_ids(w, ids, lens, len(DEFAULT_BPE_VOCAB)))
    return out


def test_bpe_encode_matches_reference_and_count(spark):
    """The distributed encoder equals the sequential reference per doc,
    and len(ids) == the counting UDF's n_bpe_tokens (one segmentation,
    two outputs)."""
    docs = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        r["doc_id"]: (r["token_ids"], r["n_bpe_tokens"])
        for r in with_bpe_token_counts(bpe_encode(docs)).collect()
    }
    for doc_id, _, text in ROWS:
        want = _ref_doc_ids(text)
        assert got[doc_id][0] == want
        assert len(want) == got[doc_id][1]  # encode/count share segmentation


def test_encode_word_ids_unknown_chars_byte_fallback():
    """Unknown characters emit unk_base + codepoint — deterministic,
    outside the vocab id range, unicode-safe."""
    ids = vocab_ids(DEFAULT_BPE_VOCAB)
    lens = tuple(sorted({len(v) for v in DEFAULT_BPE_VOCAB}, reverse=True))
    base = len(DEFAULT_BPE_VOCAB)
    assert encode_word_ids("query", ids, lens, base) == [
        ids["que"], ids["ry"]
    ]
    assert encode_word_ids("é", ids, lens, base) == [base + 0xE9]
    # greedy longest prefix: 'a' in vocab, 'q' unknown mid-word
    got = encode_word_ids("aqua", ids, lens, base)
    assert got == [ids["a"], base + ord("q"), base + ord("u"), ids["a"]]
    # every id is count-consistent
    vs = frozenset(DEFAULT_BPE_VOCAB)
    for w in ["query", "aqua", "ζζzz", "x"]:
        assert len(encode_word_ids(w, ids, lens, base)) == count_word_tokens(
            w, vs, lens
        )


def test_tokenized_sequences_matches_sequential_packing(spark):
    """Per shard: concat docs in doc_id order, cut every seq_len —
    sequence contents equal the sequential reference exactly; every
    sequence except a shard's last is exactly full."""
    docs = spark.createDataFrame(ROWS, SCHEMA)
    seq_len = 7
    got = {
        (r["source"], r["seq_id"]): r["token_ids"]
        for r in tokenized_sequences(docs, seq_len=seq_len).collect()
    }
    streams = collections.defaultdict(list)
    for doc_id, source, text in sorted(ROWS):
        streams[source].extend(_ref_doc_ids(text))
    want = {
        (s, q // seq_len): st[q : q + seq_len]
        for s, st in streams.items()
        for q in range(0, len(st), seq_len)
    }
    assert got == want
    for (s, q), ids in got.items():
        last = max(k[1] for k in got if k[0] == s)
        assert len(ids) == seq_len or q == last
    with pytest.raises(ValueError, match="seq_len"):
        tokenized_sequences(docs, seq_len=0)


def test_write_tokenized_shards_layout_and_roundtrip(spark, tmp_path):
    """partitionBy(source, shard_id) layout with ONE file per shard dir
    (repartition-before-partitionBy discipline) and byte-identical id
    arrays after the disk round trip."""
    docs = spark.createDataFrame(ROWS, SCHEMA)
    seqs = tokenized_sequences(docs, seq_len=7)
    path = str(tmp_path / "tok")
    write_tokenized_shards(seqs, path, shard_size=2)
    for d in glob.glob(os.path.join(path, "source=*", "shard_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {files}"
    back = spark.read.parquet(path)
    want = {
        (r["source"], r["seq_id"]): r["token_ids"] for r in seqs.collect()
    }
    got = {
        (r["source"], r["seq_id"]): r["token_ids"] for r in back.collect()
    }
    assert got == want
    # shard key is derivable from seq_id
    assert back.filter(
        F.col("shard_id") != F.floor(F.col("seq_id") / 2)
    ).count() == 0
    with pytest.raises(ValueError, match="shard_size"):
        write_tokenized_shards(seqs, path, shard_size=0)


def test_stream_tokenized_ingest_matches_batch(spark, tmp_path):
    """Streaming token-ID materialization == the batch run: slices from
    multiple micro-batches assemble into exactly the sequences
    tokenized_sequences produces over the whole corpus."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        assemble_tokenized_sequences,
        stream_tokenized_ingest,
    )

    docs = spark.createDataFrame(ROWS, SCHEMA)
    golden = {
        (r["source"], r["seq_id"]): r["token_ids"]
        for r in tokenized_sequences(docs, seq_len=7).collect()
    }
    src = str(tmp_path / "src")
    # two files -> availableNow drains them as separate micro-batches
    import os

    # pin distinct mtimes AFTER EACH WRITE so batches arrive in doc
    # order (round-6 lesson). Pinning must go by write, not by sorted
    # filename: part-file names embed a random UUID, so name order is a
    # coin flip vs batch order (was a 50% flake).
    docs.filter(F.col("doc_id") <= 3).coalesce(1).write.parquet(src)
    first = {f for f in os.listdir(src) if f.endswith(".parquet")}
    docs.filter(F.col("doc_id") > 3).coalesce(1).write.mode("append").parquet(src)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        t = 1_700_000_000 if f in first else 1_700_000_001
        os.utime(os.path.join(src, f), (t, t))

    store = str(tmp_path / "offsets")
    out = str(tmp_path / "slices")
    ck = str(tmp_path / "ck")
    build_offset_store(docs.limit(0), store, seq_len=7)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_tokenized_ingest(stream, store, out, ck, seq_len=7).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["source"], r["seq_id"]): r["token_ids"]
        for r in assemble_tokenized_sequences(
            spark.read.parquet(out)
        ).collect()
    }
    assert got == golden
    # sequences straddling the micro-batch boundary were stitched from
    # slices of BOTH batches
    back = spark.read.parquet(out)
    assert back.select("ingest_batch_id").distinct().count() >= 2


def test_tokenized_repack_delta_matches_assembled_sequences(spark, sf_smoke):
    """The counts-only delta equals ground truth from actually
    assembling both snapshots' sequences: per source, n_seqs_unchanged
    counts exactly the leading run of byte-identical sequences, and
    n_seqs_rewritten the remainder of the after-state."""
    import collections

    from scikit_learn_imputer_spark.plans.queries import QUERIES
    from scikit_learn_imputer_spark.sources.tables import load_table

    delta = {
        r["source"]: r
        for r in QUERIES["tokenized_repack_delta"](spark, sf_smoke).collect()
    }
    d = load_table(spark, sf_smoke, "documents")
    a = d.filter(F.col("doc_id") % 7 != 0)
    b = d.filter(
        F.md5(
            F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))
        ).substr(1, 1)
        != "0"
    )
    seq_a = collections.defaultdict(dict)
    for r in tokenized_sequences(a, seq_len=512).collect():
        seq_a[r["source"]][r["seq_id"]] = r["token_ids"]
    seq_b = collections.defaultdict(dict)
    for r in tokenized_sequences(b, seq_len=512).collect():
        seq_b[r["source"]][r["seq_id"]] = r["token_ids"]
    for src, row in delta.items():
        sa, sb = seq_a.get(src, {}), seq_b.get(src, {})
        assert row["n_seqs_before"] == len(sa)
        assert row["n_seqs_after"] == len(sb)
        # leading run of identical sequences
        run = 0
        while run in sa and run in sb and sa[run] == sb[run]:
            run += 1
        # identical-prefix ground truth: every counted-unchanged sequence
        # must actually be identical (the count is a safe lower bound —
        # a change can coincidentally reproduce identical later content)
        assert row["n_seqs_unchanged"] <= run
        assert (
            row["n_seqs_rewritten"]
            == row["n_seqs_after"] - row["n_seqs_unchanged"]
        )


def _seqs_map(df):
    return {
        (r["source"], r["seq_id"]): list(r["token_ids"])
        for r in df.collect()
    }


def _file_inventory(path):
    inv = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                inv[p] = os.path.getmtime(p)
    return inv


def _read_back(spark, path):
    return spark.read.parquet(path).select("source", "seq_id", "token_ids")


def test_incremental_rewrite_append_only_touches_tail(spark, tmp_path):
    """Appending documents at the end of each source's doc-id order must
    rewrite ONLY the final (partial) shard onward: every earlier shard
    keeps its exact on-disk files, and the result equals a full rewrite
    of the after-snapshot."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
    )

    base = [(i, "a", f"doc number {i} query table value") for i in range(1, 30)]
    extra = [(i, "a", f"appended doc {i} fast hash") for i in range(30, 36)]
    A = spark.createDataFrame(base, SCHEMA)
    B = spark.createDataFrame(base + extra, SCHEMA)
    path = str(tmp_path / "shards")
    write_tokenized_shards(
        tokenized_sequences(A, seq_len=8), path, shard_size=2
    )
    inv = _file_inventory(path)
    man = rewrite_tokenized_shards_incremental(
        A, B, path, shard_size=2, seq_len=8
    )
    assert _seqs_map(_read_back(spark, path)) == _seqs_map(
        tokenized_sequences(B, seq_len=8)
    )
    # boundary: first rewritten shard = the shard holding A's last seq
    n_a = sum(
        r["n_bpe_tokens"]
        for r in with_bpe_token_counts(A).select("n_bpe_tokens").collect()
    )
    first = (n_a // 8) // 2
    assert man["a"]["first_rewritten_shard"] == first
    untouched = [
        p
        for p, m in inv.items()
        if os.path.exists(p) and os.path.getmtime(p) == m
    ]
    # every shard strictly below the boundary kept its exact files
    for p in inv:
        sid = int(p.split("shard_id=")[1].split("/")[0])
        if sid < first:
            assert p in untouched, p


def test_incremental_rewrite_truncates_stale_shards(spark, tmp_path):
    """A shrinking mutation (mass takedown) must delete trailing shard
    dirs the after-snapshot no longer fills, and a fully-removed source
    loses its directory."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
    )

    rows = [
        (i, "a", f"doc number {i} query table value") for i in range(1, 30)
    ] + [(i, "b", f"other {i} source row") for i in range(100, 110)]
    A = spark.createDataFrame(rows, SCHEMA)
    B = spark.createDataFrame(
        [r for r in rows if r[1] == "a" and r[0] <= 5], SCHEMA
    )
    path = str(tmp_path / "shards")
    write_tokenized_shards(
        tokenized_sequences(A, seq_len=8), path, shard_size=2
    )
    man = rewrite_tokenized_shards_incremental(
        A, B, path, shard_size=2, seq_len=8
    )
    assert _seqs_map(_read_back(spark, path)) == _seqs_map(
        tokenized_sequences(B, seq_len=8)
    )
    assert not os.path.isdir(os.path.join(path, "source=b"))
    assert man["b"]["deleted_shards"], "source b's shards must be deleted"


def test_incremental_rewrite_no_change_is_noop(spark, tmp_path):
    """Identical snapshots: no shard rewritten, no file touched, no
    deletion — the manifest says so and the bytes prove it."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
    )

    rows = [(i, "a", f"doc number {i} query") for i in range(1, 20)]
    A = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "shards")
    write_tokenized_shards(
        tokenized_sequences(A, seq_len=8), path, shard_size=2
    )
    inv = _file_inventory(path)
    man = rewrite_tokenized_shards_incremental(
        A, A, path, shard_size=2, seq_len=8
    )
    assert man["a"]["first_rewritten_shard"] is None
    assert man["a"]["deleted_shards"] == []
    assert _file_inventory(path) == inv


def test_incremental_rewrite_hive_escaped_shard_key(spark, tmp_path):
    """ADVICE r8 (medium): shard keys with Hive-escaped characters
    (':' -> '%3A' in the partition directory name) must survive the
    truncation walk. The old dir-name parse missed the boundary dict and
    defaulted total=0, deleting every shard of a LIVE key."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
    )

    rows = [
        (i, "cc:web/2024", f"doc number {i} query table value")
        for i in range(1, 20)
    ] + [(i, "plain", f"other {i} source row") for i in range(100, 108)]
    A = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "shards")
    write_tokenized_shards(
        tokenized_sequences(A, seq_len=8), path, shard_size=2
    )
    # the directory really is escaped — the precondition of the bug
    escaped = [
        d for d in os.listdir(path) if d.startswith("source=cc%3Aweb")
    ]
    assert escaped, os.listdir(path)

    # identical snapshots: nothing may be rewritten and NOTHING deleted
    inv = _file_inventory(path)
    man = rewrite_tokenized_shards_incremental(
        A, A, path, shard_size=2, seq_len=8
    )
    assert man["cc:web/2024"]["first_rewritten_shard"] is None
    assert man["cc:web/2024"]["deleted_shards"] == []
    assert _file_inventory(path) == inv

    # a real mutation on the escaped key still round-trips
    B = spark.createDataFrame(
        [r for r in rows if not (r[1].startswith("cc") and r[0] > 10)],
        SCHEMA,
    )
    rewrite_tokenized_shards_incremental(A, B, path, shard_size=2, seq_len=8)
    assert _seqs_map(_read_back(spark, path)) == _seqs_map(
        tokenized_sequences(B, seq_len=8)
    )


def test_incremental_rewrite_refuses_foreign_shard_dir(spark, tmp_path):
    """A shard-key directory the boundary computation never saw must
    raise, never be silently truncated (ADVICE r8)."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
    )

    rows = [(i, "a", f"doc number {i} query") for i in range(1, 12)]
    A = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "shards")
    write_tokenized_shards(
        tokenized_sequences(A, seq_len=8), path, shard_size=2
    )
    os.makedirs(os.path.join(path, "source=foreign", "shard_id=0"))
    with pytest.raises(RuntimeError, match="foreign"):
        rewrite_tokenized_shards_incremental(
            A, A, path, shard_size=2, seq_len=8
        )


def test_incremental_slices_encode_runs_once(spark, tmp_path):
    """ADVICE r8: incremental_tokenized_slices must materialize the
    Arrow encode ONCE per micro-batch — the returned slices/packed
    lineages must not carry a Python UDF stage that each consumer
    re-executes. localCheckpoint truncates the lineage, so neither
    returned plan may contain an Arrow eval node."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        assemble_tokenized_sequences,
        incremental_tokenized_slices,
    )

    batch = spark.createDataFrame(ROWS, SCHEMA)
    store = str(tmp_path / "offsets")
    build_offset_store(batch.limit(0), store, seq_len=7)
    slices, packed = incremental_tokenized_slices(batch, store, seq_len=7)
    for df in (slices, packed):
        plan = df._jdf.queryExecution().analyzed().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    # and the output is still correct (batch == assembled slices)
    got = {
        (r["source"], r["seq_id"]): list(r["token_ids"])
        for r in assemble_tokenized_sequences(slices).collect()
    }
    want = _seqs_map(tokenized_sequences(batch, seq_len=7))
    assert got == want


def test_shard_integrity_audit_flags_corruption(spark, tmp_path):
    """VERDICT r10 #5 done-condition: a pristine write audits all-ok;
    swapping one shard's parquet file flags exactly that shard as
    digest_mismatch; a vanished shard reads missing_shard; a stray
    shard dir reads unexpected_shard — and every other shard stays ok
    throughout."""
    import shutil

    from scikit_learn_imputer_spark.operators.tokenized import (
        shard_integrity_audit,
        write_tokenized_shards_with_manifest,
    )

    docs = spark.createDataFrame(ROWS, SCHEMA)
    seqs = tokenized_sequences(docs, seq_len=7)
    path = str(tmp_path / "tok")
    write_tokenized_shards_with_manifest(seqs, path, shard_size=2)

    clean = shard_integrity_audit(spark, path).collect()
    assert len(clean) > 3
    assert {r["status"] for r in clean} == {"ok"}
    assert all(r["expected_md5"] == r["actual_md5"] for r in clean)

    dirs = sorted(glob.glob(os.path.join(path, "source=*", "shard_id=*")))
    assert len(dirs) >= 3

    def key(d):
        src = d.split("source=")[1].split(os.sep)[0]
        return (src, int(d.split("shard_id=")[1]))

    # digest_mismatch: replace shard A's file with shard B's (B from a
    # different digest), counts preserved in the manifest
    a, b = dirs[0], dirs[1]
    fa = glob.glob(os.path.join(a, "*.parquet"))[0]
    fb = glob.glob(os.path.join(b, "*.parquet"))[0]
    # swap the file WITH its matching .crc sidecar so the corruption is
    # semantic (wrong content), not a Hadoop checksum failure
    os.remove(fa)
    crc_a = os.path.join(a, "." + os.path.basename(fa) + ".crc")
    if os.path.exists(crc_a):
        os.remove(crc_a)
    shutil.copyfile(fb, os.path.join(a, os.path.basename(fb)))
    crc_b = os.path.join(b, "." + os.path.basename(fb) + ".crc")
    if os.path.exists(crc_b):
        shutil.copyfile(
            crc_b, os.path.join(a, "." + os.path.basename(fb) + ".crc")
        )
    # missing_shard: remove shard C's directory outright
    c = dirs[2]
    shutil.rmtree(c)
    # unexpected_shard: clone shard B under an id the manifest never wrote
    src_dir = os.path.dirname(b)
    stray = os.path.join(src_dir, "shard_id=999")
    shutil.copytree(b, stray)

    got = {
        (r["source"], r["shard_id"]): r["status"]
        for r in shard_integrity_audit(spark, path).collect()
    }
    assert got[key(a)] == "digest_mismatch"
    assert got[key(c)] == "missing_shard"
    assert got[(key(b)[0], 999)] == "unexpected_shard"
    flagged = {k for k, v in got.items() if v != "ok"}
    assert flagged == {key(a), key(c), (key(b)[0], 999)}


def test_shuffled_sequences_agree_with_spans(spark):
    """Round-11 chain coherence: the materialized shuffled sequences
    (shuffled_tokenized_sequences) and the BPE-unit loss-mask manifest
    (shuffled_sequence_doc_spans with the BPE count column) describe the
    SAME placement — every span indexes into its sequence's id array and
    the doc's spans, stitched across sequences in order, reproduce the
    doc's full id array."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        bpe_encode_udf,
        with_bpe_token_counts,
    )
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffled_sequence_doc_spans,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        shuffled_tokenized_sequences,
    )

    docs = spark.createDataFrame(ROWS, SCHEMA)
    seqs = {
        r["seq_id"]: r["token_ids"]
        for r in shuffled_tokenized_sequences(
            docs, seq_len=7, seed=7
        ).collect()
    }
    # full stream tiles exactly: all but the last sequence are full
    assert seqs
    last = max(seqs)
    assert all(len(v) == 7 for k, v in seqs.items() if k != last)
    assert 1 <= len(seqs[last]) <= 7

    counted = with_bpe_token_counts(docs, DEFAULT_BPE_VOCAB, "text")
    spans = shuffled_sequence_doc_spans(
        counted, seq_len=7, seed=7, token_count_col="n_bpe_tokens"
    ).collect()
    enc = bpe_encode_udf(DEFAULT_BPE_VOCAB)
    doc_ids = {
        r["doc_id"]: r["__ids"]
        for r in docs.select("doc_id", enc(F.col("text")).alias("__ids")).collect()
    }
    # stitch every doc back out of the sequences via its spans
    rebuilt: dict[int, list] = {}
    for r in spans:
        for part in r["spans"].split(" "):
            did, start, ln = (int(x) for x in part.split(":"))
            seg = seqs[r["seq_id"]][start:start + ln]
            rebuilt.setdefault(did, []).append((r["seq_id"], start, seg))
    for did, parts in rebuilt.items():
        flat = [t for _, _, seg in sorted(parts) for t in seg]
        assert flat == list(doc_ids[did]), f"doc {did} mis-stitched"
    # every nonzero-count doc is covered
    want = {d for d, ids in doc_ids.items() if len(ids) > 0}
    assert set(rebuilt) == want
