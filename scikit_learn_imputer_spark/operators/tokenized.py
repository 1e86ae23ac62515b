"""Token-ID sequence materialization — the last step of the
corpus -> trainer handoff (VERDICT r7 #1).

``pack_sequences`` (operators/chunking.py) places every DOCUMENT into
the per-shard stream of ``seq_len``-token training sequences;
``functions/bpe.py:bpe_encode`` materializes each document's token ids.
This module assembles the SEQUENCES themselves: one row per
(shard, seq_id) holding the ``array<int>`` a training loader reads,
plus the physical ``partitionBy`` shard writer.

Scale design — ids move as ARRAYS, never as per-token rows:

1. encode: map-only Arrow UDF, one id array per document;
2. place: the same per-shard running-total window ``pack_sequences``
   uses (one shuffle on the shard key), computed over ``size(ids)`` so
   encode runs ONCE per row — the window shuffles each document's id
   array exactly once, which is the inherent cost of writing a
   tokenized copy of the corpus;
3. split: a document spanning k sequences explodes into k (doc, seq)
   SLICES via ``F.sequence`` + ``F.slice`` — rows grow by #sequences,
   not by #tokens;
4. assemble: groupBy (shard, seq_id), order slices by their global
   token position, flatten. Map-side combine applies; each sequence's
   payload is bounded by ``seq_len`` ids.

No reference counterpart (the reference is a single-node imputer);
this extends the training-data surface of SURVEY §2's M5 frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.bpe import (
    DEFAULT_BPE_VOCAB,
    bpe_count_udf,
    bpe_encode_udf,
)


def tokenized_sequences(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    out_col: str = "token_ids",
) -> DataFrame:
    """One row per training sequence: ``(shard, seq_id, n_ids,
    token_ids)`` under the exact ``pack_sequences`` placement (per-shard
    doc-id order, concat-and-cut every ``seq_len`` tokens). The final
    sequence of each shard may be shorter than ``seq_len``; every other
    sequence is exactly full — ``sum(n_ids)`` equals the corpus BPE
    token count by construction (segmentation shared with
    ``bpe_token_counts``)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    encoder = bpe_encode_udf(vocab)
    # the Arrow encode is the expensive per-row stage: give it the
    # fan_out parallelism floor (a small parquet file scans as ONE
    # partition and would run the whole encode on a single core; no-op
    # at real corpus scale, and the shard window below re-shuffles by
    # shard_col anyway so placement is unaffected)
    from scikit_learn_imputer_spark.functions.skew import fan_out

    enc = fan_out(df).select(
        F.col(id_col),
        F.col(shard_col),
        encoder(F.col(text_col)).alias("__ids"),
    ).withColumn("__n", F.size("__ids").cast("bigint"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = enc.withColumn(
        "__cum_prev",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
    ).filter(F.col("__n") > 0)
    return _assemble_slices(
        _slice_by_sequence(placed, seq_len, shard_col), shard_col, out_col
    )


def _slice_by_sequence(
    placed: DataFrame, seq_len: int, shard_col: str
) -> DataFrame:
    """(shard, seq_id, __g, __slice) from a placed frame carrying
    ``__ids`` / ``__n`` / ``__cum_prev``: a document spanning k
    sequences explodes into k array SLICES; ``__g`` is the slice's
    global token position (the assembly sort key)."""
    first_seq = F.floor(F.col("__cum_prev") / seq_len)
    last_seq = F.floor((F.col("__cum_prev") + F.col("__n") - 1) / seq_len)
    spans = placed.select(
        shard_col,
        "__ids",
        "__n",
        "__cum_prev",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    # this doc's contribution to this sequence, in GLOBAL token positions
    g_start = F.greatest(F.col("seq_id") * seq_len, F.col("__cum_prev"))
    g_end = F.least(
        (F.col("seq_id") + 1) * seq_len, F.col("__cum_prev") + F.col("__n")
    )
    return spans.select(
        shard_col,
        F.col("seq_id").cast("bigint").alias("seq_id"),
        g_start.alias("__g"),
        F.slice(
            "__ids",
            (g_start - F.col("__cum_prev") + 1).cast("int"),
            (g_end - g_start).cast("int"),
        ).alias("__slice"),
    )


def _assemble_slices(
    slices: DataFrame, shard_col: str, out_col: str = "token_ids"
) -> DataFrame:
    """(shard, seq_id, n_ids, ids) from position-keyed slices: order by
    global position, flatten. Map-side combine applies; each sequence's
    payload is bounded by seq_len ids."""
    assembled = F.flatten(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__g", "__slice"))),
            lambda s: s["__slice"],
        )
    )
    return (
        slices.groupBy(shard_col, "seq_id")
        .agg(assembled.alias(out_col))
        .select(
            shard_col,
            "seq_id",
            F.size(out_col).cast("bigint").alias("n_ids"),
            out_col,
        )
    )


def shuffled_tokenized_sequences(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    out_col: str = "token_ids",
) -> DataFrame:
    """Materialize the SHUFFLED pack: one row per training sequence
    ``(seq_id, n_ids, token_ids)`` of the seeded-md5-permuted GLOBAL
    token stream — the ids a loader actually reads after
    shuffle-before-pack, completing the round-10/11 chain
    (pack_shuffled_sequences places, shuffled_sequence_doc_spans masks,
    THIS materializes). Placement is pack_shuffled_sequences with the
    BPE token counts (one bucketed global prefix sum, O(16^2)-row
    global window); ids then move as per-document ARRAYS sliced at
    sequence boundaries — the tokenized_sequences slice/assemble
    machinery with a single global stream instead of per-source
    shards. One Arrow encode pass, one narrow placement join on id,
    one bounded explode, one (seq) aggregate."""
    from scikit_learn_imputer_spark.functions.skew import fan_out
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    encoder = bpe_encode_udf(vocab)
    enc = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.col(source_col),
            encoder(F.col(text_col)).alias("__ids"),
        )
        .withColumn("__n", F.size("__ids").cast("bigint"))
    )
    placed = pack_shuffled_sequences(
        enc,
        seq_len=seq_len,
        seed=seed,
        id_col=id_col,
        source_col=source_col,
        token_count_col="__n",
    ).select(
        id_col,
        (F.col("seq_id") * seq_len + F.col("seq_offset")).alias(
            "__cum_prev"
        ),
    )
    joined = (
        enc.join(placed, id_col)
        .filter(F.col("__n") > 0)
        .withColumn("__stream", F.lit("shuffled"))
    )
    sliced = _slice_by_sequence(joined, seq_len, "__stream")
    return _assemble_slices(sliced, "__stream", out_col).drop("__stream")


def write_tokenized_shards(
    seqs: DataFrame,
    path: str,
    shard_size: int,
    shard_col: str = "source",
) -> None:
    """Write the physical tokenized shards: every sequence row (with its
    ``array<int>`` ids) lands under ``<shard>/shard_id=<seq_id //
    shard_size>/`` in parquet, sorted by ``seq_id`` within each file so
    a loader streams a shard in training order. Same layout discipline
    as ``operators/shuffle.py:write_training_shards``: repartition on
    the partition keys BEFORE ``partitionBy`` so each shard directory
    is owned by one task (one file per directory), which holds at any
    scale where shards >> tasks."""
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    shard = F.floor(F.col("seq_id") / shard_size).cast("bigint")
    # explicit partition count: without it AQE coalesces the tiny
    # keyed exchange to ONE task, which then pays the per-directory
    # committer overhead for every shard dir serially (98 dirs ≈ 4s at
    # bench SF); with it the dirs commit in parallel. At cluster scale
    # the byte sizes prevent the coalesce anyway — this pins the same
    # plan at toy scale.
    n_part = seqs.sparkSession.sparkContext.defaultParallelism
    (
        seqs.withColumn("shard_id", shard)
        .repartition(n_part, shard_col, "shard_id")
        .sortWithinPartitions(shard_col, "shard_id", "seq_id")
        .write.mode("overwrite")
        .partitionBy(shard_col, "shard_id")
        .parquet(path)
    )


def write_tokenized_shards_readback(
    seqs: DataFrame,
    shard_size: int,
    shard_col: str = "source",
) -> DataFrame:
    """Round-trip proof of the tokenized-shard writer: write to a
    per-invocation temp dir (unique path — no cross-run race), read the
    shards back, and return the read-back frame LAZILY with the ids
    serialized to a string (arrays hash unreliably across engines). The
    temp dir is registered for atexit cleanup rather than deleted here,
    because the returned plan still reads it; it is a few MB of
    verification artifact at correctness scale, not a production
    output — the production path is ``write_tokenized_shards`` to a
    caller-owned location."""
    import atexit
    import shutil
    import tempfile

    spark = seqs.sparkSession
    tmp = tempfile.mkdtemp(prefix="sli_tokenized_shards_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = tmp + "/shards"
    write_tokenized_shards(seqs, path, shard_size, shard_col)
    back = spark.read.parquet(path)
    ids_str = F.concat_ws(
        " ", F.transform("token_ids", lambda x: x.cast("string"))
    )
    return back.select(
        F.col(shard_col).cast("string").alias(shard_col),
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.col("shard_id").cast("bigint").alias("shard_id"),
        F.col("n_ids").cast("bigint").alias("n_ids"),
        ids_str.alias("ids"),
    )


def shard_content_digests(
    back: DataFrame,
    shard_col: str = "source",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Per-(shard_col, shard_id) content digest of a tokenized-shard
    frame: sequence count, token count, and an ORDER-KEYED md5 over the
    space-joined id strings concatenated by '|' in seq_id order — the
    ``tokenized_incremental_rewrite`` oracle digest, so any reordering,
    truncation, or bit flip in any sequence's ids changes the digest.
    One groupBy; the payload per shard row is O(shard bytes) only
    transiently inside the aggregate."""
    ids_str = F.concat_ws(
        " ", F.transform(ids_col, lambda x: x.cast("string"))
    )
    rows = back.select(
        F.col(shard_col).cast("string").alias(shard_col),
        F.col("shard_id").cast("bigint").alias("shard_id"),
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.col("n_ids").cast("bigint").alias("n_ids"),
        ids_str.alias("__ids"),
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("seq_id", "__ids"))),
        lambda s: s["__ids"],
    )
    return rows.groupBy(shard_col, "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
        F.sum("n_ids").cast("bigint").alias("n_ids"),
        F.md5(F.array_join(ordered, "|")).alias("ids_md5"),
    )


def write_tokenized_shards_with_manifest(
    seqs: DataFrame,
    path: str,
    shard_size: int,
    shard_col: str = "source",
) -> None:
    """``write_tokenized_shards`` plus a checksummed shard manifest
    (VERDICT r10 #5): after the shards land, read them BACK from disk
    and write the per-shard content digests to ``<path>/_manifest`` —
    so the manifest certifies the bytes that actually hit storage, not
    the plan that produced them. The underscore prefix hides the
    manifest from Spark's recursive parquet reader, so
    ``spark.read.parquet(path)`` still returns only sequence rows.
    ``shard_integrity_audit`` recomputes and diffs before a training
    run touches the data. Manifest is O(#shards) rows."""
    spark = seqs.sparkSession
    write_tokenized_shards(seqs, path, shard_size, shard_col)
    manifest = shard_content_digests(spark.read.parquet(path), shard_col)
    manifest.repartition(1).write.mode("overwrite").parquet(
        path + "/_manifest"
    )


def shard_integrity_audit(
    spark,
    path: str,
    shard_col: str = "source",
) -> DataFrame:
    """Detect corrupted / truncated / missing / stray tokenized shards
    BEFORE a training run (VERDICT r10 #5): recompute every shard's
    order-keyed content digest from the files on disk and diff against
    the checksummed manifest ``write_tokenized_shards_with_manifest``
    wrote. One row per shard key seen on either side:
    ``(shard, shard_id, n_seqs, n_ids, expected_md5, actual_md5,
    status)`` with status ∈ ok / digest_mismatch / missing_shard
    (manifest row with no surviving data) / unexpected_shard (data with
    no manifest row). Distributed recompute (one groupBy over the shard
    scan) + an O(#shards) equi full-outer join — nothing driver-side."""
    manifest = spark.read.parquet(path + "/_manifest").select(
        F.col(shard_col).cast("string").alias(shard_col),
        F.col("shard_id").cast("bigint").alias("shard_id"),
        F.col("n_seqs").alias("m_seqs"),
        F.col("n_ids").alias("m_ids"),
        F.col("ids_md5").alias("expected_md5"),
    )
    actual = shard_content_digests(
        spark.read.parquet(path), shard_col
    ).select(
        shard_col,
        "shard_id",
        F.col("n_seqs").alias("a_seqs"),
        F.col("n_ids").alias("a_ids"),
        F.col("ids_md5").alias("actual_md5"),
    )
    joined = manifest.join(actual, [shard_col, "shard_id"], "full_outer")
    status = (
        F.when(F.col("expected_md5").isNull(), F.lit("unexpected_shard"))
        .when(F.col("actual_md5").isNull(), F.lit("missing_shard"))
        .when(
            F.col("expected_md5") != F.col("actual_md5"),
            F.lit("digest_mismatch"),
        )
        .otherwise(F.lit("ok"))
    )
    return joined.select(
        shard_col,
        "shard_id",
        F.coalesce(F.col("m_seqs"), F.lit(0)).cast("bigint").alias("n_seqs"),
        F.coalesce(F.col("m_ids"), F.lit(0)).cast("bigint").alias("n_ids"),
        "expected_md5",
        "actual_md5",
        status.alias("status"),
    )


def sequence_doc_spans(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per training sequence, the DOCUMENT BOUNDARY spans a trainer
    needs for attention masking / loss weighting in packed sequences:
    ``(shard, seq_id, n_docs, spans)`` where ``spans`` is the ordered
    ``"doc_id:start:len"`` list (start 0-based within the sequence,
    BPE-token units — the same placement ``tokenized_sequences`` cuts
    ids by, so spans index directly into its arrays).

    Cheaper than materializing ids: only token COUNTS flow through the
    shard window; the per-(doc, seq) explode is bounded by #sequences,
    and the payload per sequence row is O(docs-in-sequence) short
    strings."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    counts = with_bpe_token_counts(
        df.select(id_col, shard_col, text_col), vocab, text_col
    ).select(id_col, shard_col, F.col("n_bpe_tokens").alias("__n"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = counts.withColumn(
        "__cum",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
    ).filter(F.col("__n") > 0)
    first_seq = F.floor(F.col("__cum") / seq_len)
    last_seq = F.floor((F.col("__cum") + F.col("__n") - 1) / seq_len)
    spans = placed.select(
        id_col,
        shard_col,
        "__n",
        "__cum",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    g_start = F.greatest(F.col("seq_id") * seq_len, F.col("__cum"))
    g_end = F.least(
        (F.col("seq_id") + 1) * seq_len, F.col("__cum") + F.col("__n")
    )
    rows = spans.select(
        shard_col,
        F.col("seq_id").cast("bigint").alias("seq_id"),
        g_start.alias("__g"),
        F.concat_ws(
            ":",
            F.col(id_col).cast("string"),
            (g_start - F.col("seq_id") * seq_len).cast("string"),
            (g_end - g_start).cast("string"),
        ).alias("__span"),
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("__g", "__span"))),
        lambda s: s["__span"],
    )
    return (
        rows.groupBy(shard_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(ordered, " ").alias("spans"),
        )
        .select(shard_col, "seq_id", "n_docs", "spans")
    )


def token_position_lookup(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    stride: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """INVERSE provenance: map global token positions back to the
    document that owns them — the "loss-spike forensics" lookup. Given
    the per-shard token stream that ``tokenized_sequences`` packs, every
    position that is a multiple of ``stride`` is resolved to
    ``(shard, position, seq_id, doc_id, token_offset_in_doc,
    offset_in_seq)``: which document a trainer was reading at that
    position, and where inside the packed sequence it sat.

    The naive formulation is a RANGE join (positions x doc cumulative
    intervals) — quadratic-ish and unsortable at corpus scale. This
    implementation inverts it: each document ENUMERATES the stride
    multiples inside its own [cum, cum + n) interval via a bounded
    ``F.sequence`` explode, so the cost is one counts-only shard window
    (identical to ``sequence_doc_spans``) plus O(total_tokens / stride)
    output rows. No join at all; document text never shuffles."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    counts = with_bpe_token_counts(
        df.select(id_col, shard_col, text_col), vocab, text_col
    ).select(id_col, shard_col, F.col("n_bpe_tokens").alias("__n"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = counts.withColumn(
        "__cum",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
    ).filter(F.col("__n") > 0)
    # First / last stride multiple inside [cum, cum + n).
    k0 = F.floor((F.col("__cum") + stride - 1) / stride)
    k1 = F.floor((F.col("__cum") + F.col("__n") - 1) / stride)
    hits = placed.filter(k1 >= k0).select(
        id_col,
        shard_col,
        "__cum",
        F.explode(F.sequence(k0, k1)).alias("__k"),
    )
    pos = F.col("__k") * stride
    return hits.select(
        shard_col,
        pos.cast("bigint").alias("position"),
        F.floor(pos / seq_len).cast("bigint").alias("seq_id"),
        id_col,
        (pos - F.col("__cum")).cast("bigint").alias("token_offset_in_doc"),
        (pos % seq_len).cast("bigint").alias("offset_in_seq"),
    )


def sequence_quality_weights(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-sequence LOSS WEIGHTS for packed training sequences: the
    token-mass-weighted mean document quality of everything inside each
    (shard, seq_id) — what a trainer multiplies into the loss when
    packing mixes documents of uneven quality (the sequence-level
    aggregate of per-doc loss weighting).

    Quality is the repo's composite q_score (functions/text.py), snapped
    to integer micro-units per document so the weighted mean is exact
    integer arithmetic until the final division. Dataflow is identical
    to ``sequence_doc_spans``: quality + BPE count in ONE map pass over
    the corpus, a counts-only shard window, a bounded (doc, seq)
    explode, one (shard, seq) aggregate — document text never shuffles.

    Returns ``(shard, seq_id, n_docs, n_tokens, weight)`` where
    ``n_tokens`` is the sequence's occupied token mass (== seq_len
    except the shard tail) and ``weight`` = sum(L_d * q_d) / sum(L_d)
    rounded to 6 places."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.functions.text import quality_features

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    base = quality_features(
        with_bpe_token_counts(
            df.select(id_col, shard_col, text_col), vocab, text_col
        ),
        text_col=text_col,
    ).select(
        id_col,
        shard_col,
        F.col("n_bpe_tokens").alias("__n"),
        F.round(F.round("q_score", 6) * 1e6).cast("bigint").alias("__qm"),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.withColumn(
        "__cum",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
    ).filter(F.col("__n") > 0)
    first_seq = F.floor(F.col("__cum") / seq_len)
    last_seq = F.floor((F.col("__cum") + F.col("__n") - 1) / seq_len)
    spans = placed.select(
        shard_col,
        "__qm",
        "__cum",
        "__n",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    overlap = F.least(
        (F.col("seq_id") + 1) * seq_len, F.col("__cum") + F.col("__n")
    ) - F.greatest(F.col("seq_id") * seq_len, F.col("__cum"))
    return (
        spans.select(
            shard_col,
            F.col("seq_id").cast("bigint").alias("seq_id"),
            overlap.alias("__L"),
            "__qm",
        )
        .groupBy(shard_col, "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__L").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("__L") * F.col("__qm"))
                / F.sum("__L")
                / 1e6,
                6,
            ).alias("weight"),
        )
    )


def incremental_tokenized_slices(
    batch: DataFrame,
    store_path: str,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> tuple[DataFrame, DataFrame]:
    """The streaming unit of token-ID materialization: this batch's
    sequence SLICES, stream positions continued from the persisted
    offset store — a micro-batch boundary can cut mid-sequence, so the
    streaming form emits (shard, seq_id, pos, token_ids) PIECES and
    ``assemble_tokenized_sequences`` compacts them into full sequences
    (slices from different batches meet in the same (shard, seq_id)
    group; the identical _assemble_slices path batch mode uses).

    Returns ``(slices, packed)``: ``packed`` is the doc-level placement
    frame to feed ``commit_offsets`` — one lineage, no recompute."""
    from scikit_learn_imputer_spark.operators.chunking import incremental_pack

    encoder = bpe_encode_udf(vocab)
    enc = batch.select(
        F.col(id_col),
        F.col(shard_col),
        encoder(F.col(text_col)).alias("__ids"),
    ).withColumn("__n", F.size("__ids").cast("bigint"))
    # materialize ONCE: enc feeds both the incremental_pack lineage and
    # the placement re-join, and the caller actions slices and packed
    # separately — without this the Arrow encode re-runs per consumer
    # (ADVICE r8). localCheckpoint truncates lineage and its blocks are
    # reclaimed by the context cleaner; sized O(micro-batch tokens).
    enc = enc.localCheckpoint(eager=True)
    packed = incremental_pack(
        enc, store_path, seq_len, id_col, text_col="__ids",
        shard_col=shard_col, token_count_col="__n",
    )
    placed = (
        packed.select(
            id_col,
            (F.col("seq_id") * seq_len + F.col("seq_offset")).alias(
                "__cum_prev"
            ),
        )
        .join(enc.select(id_col, shard_col, "__ids", "__n"), id_col)
        .filter(F.col("__n") > 0)
    )
    slices = _slice_by_sequence(placed, seq_len, shard_col).select(
        shard_col,
        "seq_id",
        (F.col("__g") - F.col("seq_id") * seq_len).cast("int").alias("pos"),
        F.col("__slice").alias("token_ids"),
    )
    return slices, packed


def assemble_tokenized_sequences(
    slices: DataFrame, shard_col: str = "source", out_col: str = "token_ids"
) -> DataFrame:
    """Compact streamed slices (possibly from many micro-batches) into
    full training sequences — identical output to ``tokenized_sequences``
    over the same corpus (batch == stream, pinned by test)."""
    renamed = slices.select(
        shard_col,
        "seq_id",
        F.col("pos").cast("bigint").alias("__g"),
        F.col("token_ids").alias("__slice"),
    )
    return _assemble_slices(renamed, shard_col, out_col)


def stream_tokenized_ingest(
    docs_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
):
    """Continuous token-ID materialization: each micro-batch encodes,
    continues its shards' streams from the offset store, lands its
    sequence slices in ``out_path``, and commits offsets — the streaming
    form of ``tokenized_sequences`` + ``write_tokenized_shards``.

    Exactly-once discipline inherited from stream_pack_ingest: the
    slice write is batch_id-keyed and idempotent; offsets commit AFTER
    the write with ``last_batch_id``; a replay after its own commit is
    skipped on equality and a store AHEAD of the stream raises (cleared
    checkpoint / shared store — ADVICE r7)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from scikit_learn_imputer_spark.operators.chunking import (
            commit_offsets,
            last_committed_batch_id,
        )
        from scikit_learn_imputer_spark.streaming.sinks import (
            idempotent_batch_sink,
        )

        last = last_committed_batch_id(batch.sparkSession, store_path)
        if last == batch_id:
            return
        if last > batch_id:
            raise RuntimeError(
                f"offset store at {store_path} committed batch {last} but "
                f"stream delivered batch {batch_id}; checkpoint and offset "
                "store are out of sync"
            )
        slices, packed = incremental_tokenized_slices(
            batch, store_path, vocab, seq_len, id_col, text_col, shard_col
        )
        slices.persist()
        packed.persist()
        try:
            idempotent_batch_sink(slices, out_path, batch_id)
            commit_offsets(packed, store_path, seq_len, shard_col, batch_id)
        finally:
            slices.unpersist()
            packed.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def _shard_boundaries(
    before: DataFrame,
    after: DataFrame,
    vocab: tuple[str, ...],
    seq_len: int,
    shard_size: int,
    id_col: str,
    text_col: str,
    shard_col: str,
) -> DataFrame:
    """Per-shard-key rewrite boundary between two corpus snapshots that
    share document content (membership mutations: ingest / takedown).
    Counts-only — the same two running windows ``tokenized_repack_delta``
    uses, never an id materialization. Returns one row per shard key in
    EITHER snapshot: ``start_seq`` (first sequence of the first shard
    any rewrite touches; null when the snapshots agree on this key) and
    ``n_total_after`` (B's token mass, for stale-shard truncation)."""
    counter = bpe_count_udf(vocab)

    def counted(df: DataFrame) -> DataFrame:
        # explicit string cast: the boundary frame is rebuilt downstream
        # with a hardcoded `__k string` schema and compared against
        # partition DIRECTORY names — a non-string shard_col must not
        # reach either silently typed (ADVICE r8)
        c = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(shard_col).cast("string").alias("__k"),
            counter(F.col(text_col)).cast("bigint").alias("__n"),
        )
        w = (
            Window.partitionBy("__k")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return c.withColumn(
            "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint"))
        )

    ca, cb = counted(before), counted(after)
    a_ids = ca.select("doc_id")
    b_ids = cb.select("doc_id")
    removed = (
        ca.join(b_ids, "doc_id", "left_anti")
        .groupBy("__k")
        .agg(F.min("__cum").alias("__rm"))
    )
    added = (
        cb.join(a_ids, "doc_id", "left_anti")
        .groupBy("__k")
        .agg(F.min("__cum").alias("__am"))
    )
    tot_b = cb.groupBy("__k").agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_total_after")
    )
    keys = (
        ca.select("__k")
        .union(cb.select("__k"))
        .distinct()
        .join(removed, "__k", "left")
        .join(added, "__k", "left")
        .join(tot_b, "__k", "left")
    )
    first_change = F.least(
        F.coalesce(F.col("__rm"), F.col("__am")),
        F.coalesce(F.col("__am"), F.col("__rm")),
    )
    start_seq = (
        F.floor(F.floor(first_change / seq_len) / shard_size) * shard_size
    ).cast("bigint")
    return keys.select(
        "__k",
        start_seq.alias("start_seq"),
        F.coalesce(F.col("n_total_after"), F.lit(0))
        .cast("bigint")
        .alias("n_total_after"),
    )


def rewrite_tokenized_shards_incremental(
    before: DataFrame,
    after: DataFrame,
    path: str,
    shard_size: int,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> dict:
    """Physically apply a corpus mutation (``before`` -> ``after``,
    membership changes only) to an existing ``write_tokenized_shards``
    layout at ``path`` — the execution half of
    ``tokenized_repack_delta``'s planning half. Every shard whose
    sequences are all strictly below the first membership change's
    stream position is left untouched ON DISK (same files, same bytes);
    only shards at or after the boundary are re-encoded and rewritten,
    via Spark dynamic partition overwrite; trailing shards of
    ``before`` that ``after`` no longer fills are deleted.

    Scale shape: the boundary is counts-only (two windows + two
    anti-join mins); the expensive Arrow ENCODE pass runs only over
    documents overlapping rewritten shards — a takedown touching the
    tail of each shard stream re-encodes the tail, not the corpus. The
    boundary frame is O(#shard-keys) and broadcast. Stale-dir cleanup
    is an O(#stale shards) filesystem walk (a metastore/manifest op on
    a real deployment; local-fs here).

    Returns a manifest dict: per shard key, the first rewritten shard
    (or None), shards deleted. Caller must pass the SAME seq_len /
    shard_size / vocab the layout was written with."""
    import os
    import shutil

    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    spark = after.sparkSession
    bounds = _shard_boundaries(
        before, after, vocab, seq_len, shard_size,
        id_col, text_col, shard_col,
    )
    rows = bounds.collect()  # O(#shard-keys): sources, not documents
    boundary = {
        r["__k"]: (r["start_seq"], r["n_total_after"]) for r in rows
    }

    changed = {k: v for k, v in boundary.items() if v[0] is not None}
    manifest = {
        k: {"first_rewritten_shard": (v[0] // shard_size if v[0] is not None else None),
            "deleted_shards": []}
        for k, v in boundary.items()
    }
    if changed:
        bk = spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(k, int(v[0])) for k, v in changed.items()], 1
            ),
            "__k string, __start_seq long",
        )
        encoder = bpe_encode_udf(vocab)
        counter = bpe_count_udf(vocab)
        from scikit_learn_imputer_spark.functions.skew import fan_out

        # the Arrow COUNT pass touches the whole after-corpus: floor its
        # parallelism (1-partition scans serialize it; no-op at scale)
        counted = fan_out(after).select(
            F.col(id_col).alias("doc_id"),
            # same string cast as _shard_boundaries — the broadcast join
            # against bk (`__k string`) must not rely on implicit casts
            F.col(shard_col).cast("string").alias("__k"),
            F.col(text_col).alias("__text"),
            counter(F.col(text_col)).cast("bigint").alias("__n"),
        )
        w = (
            Window.partitionBy("__k")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        placed_counts = counted.withColumn(
            "__cum_prev",
            F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
        )
        # encode ONLY documents overlapping a rewritten shard
        todo = (
            placed_counts.join(F.broadcast(bk), "__k")
            .filter(
                (F.col("__cum_prev") + F.col("__n"))
                > F.col("__start_seq") * seq_len
            )
            .filter(F.col("__n") > 0)
        )
        placed = todo.select(
            F.col("__k").alias(shard_col),
            encoder(F.col("__text")).alias("__ids"),
            "__n",
            "__cum_prev",
            "__start_seq",
        )
        slices = _slice_by_sequence(placed, seq_len, shard_col)
        # _slice_by_sequence drops extra columns; re-join the per-key
        # boundary (broadcast, O(#keys)) to trim slices of the
        # unchanged-prefix sequences a straddling document also feeds
        slices = slices.join(
            F.broadcast(
                bk.select(F.col("__k").alias(shard_col), "__start_seq")
            ),
            shard_col,
        ).filter(F.col("seq_id") >= F.col("__start_seq"))
        seqs = _assemble_slices(
            slices.select(shard_col, "seq_id", "__g", "__slice"), shard_col
        )
        out = seqs.withColumn(
            "shard_id",
            F.floor(F.col("seq_id") / shard_size).cast("bigint"),
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # explicit count: AQE otherwise coalesces the small keyed
            # exchange to one task and the per-dir committer overhead
            # serializes (see write_tokenized_shards)
            n_part = spark.sparkContext.defaultParallelism
            (
                out.repartition(n_part, shard_col, "shard_id")
                .sortWithinPartitions(shard_col, "shard_id", "seq_id")
                .write.mode("overwrite")
                .partitionBy(shard_col, "shard_id")
                .parquet(path)
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
    # truncate: delete shard dirs past B's last shard (and keys gone)
    root = path[len("file:"):] if path.startswith("file:") else path
    if os.path.isdir(root):
        from urllib.parse import unquote

        for kdir in os.listdir(root):
            if not kdir.startswith(f"{shard_col}="):
                continue
            # Spark Hive-escapes partition values in directory names
            # (':' -> '%3A', null -> __HIVE_DEFAULT_PARTITION__);
            # unescape before the boundary lookup, and REFUSE to treat
            # an unknown key as empty — defaulting to total=0 would
            # delete every shard of a live key (ADVICE r8, medium)
            raw = kdir[len(shard_col) + 1:]
            key = (
                None if raw == "__HIVE_DEFAULT_PARTITION__" else unquote(raw)
            )
            if key not in boundary:
                raise RuntimeError(
                    f"shard directory {kdir!r} at {root} does not match any "
                    f"{shard_col} key in either corpus snapshot; refusing to "
                    "truncate a layout the boundary computation never saw"
                )
            total = boundary[key][1]
            n_seqs = -(-total // seq_len) if total else 0
            last_shard = (n_seqs - 1) // shard_size if n_seqs else -1
            for sdir in os.listdir(os.path.join(root, kdir)):
                if not sdir.startswith("shard_id="):
                    continue
                sid = int(sdir[len("shard_id="):])
                if sid > last_shard:
                    shutil.rmtree(os.path.join(root, kdir, sdir))
                    manifest.setdefault(
                        key,
                        {"first_rewritten_shard": None,
                         "deleted_shards": []},
                    )["deleted_shards"].append(sid)
            if not any(
                s.startswith("shard_id=")
                for s in os.listdir(os.path.join(root, kdir))
            ):
                shutil.rmtree(os.path.join(root, kdir))
    return manifest


def sequence_fingerprints(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Post-packing exact dedup — in TOKEN space, the representation a
    trainer actually repeats: every materialized training sequence gets
    an md5 fingerprint of its id payload, duplicate fingerprints group,
    and the lexicographically-first (shard, seq_id) member keeps. Packing
    can manufacture duplicate sequences out of distinct documents
    (repeated boilerplate runs aligning on sequence boundaries), which
    document-level dedup by construction cannot see — this is the last
    dedup gate before the loader.

    Returns one row per sequence: ``(shard, seq_id, n_ids, fingerprint,
    n_copies, is_kept)``. Shuffle shape: ids collapse to a 16-byte
    digest map-side; the group/keeper join is digest-keyed
    (min(struct)) — the exact_dup_groups shape, never an id shuffle."""
    seqs = tokenized_sequences(
        df, vocab, seq_len, id_col, text_col, shard_col
    ).select(
        shard_col,
        "seq_id",
        "n_ids",
        F.md5(
            F.concat_ws(
                " ", F.transform("token_ids", lambda x: x.cast("string"))
            )
        ).alias("fingerprint"),
    )
    groups = seqs.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min(
            F.struct(F.col(shard_col).alias("__s"), F.col("seq_id").alias("__q"))
        ).alias("__keep"),
    )
    return seqs.join(groups, "fingerprint").select(
        shard_col,
        "seq_id",
        "n_ids",
        "fingerprint",
        "n_copies",
        (
            (F.col("__keep.__s") == F.col(shard_col))
            & (F.col("__keep.__q") == F.col("seq_id"))
        ).alias("is_kept"),
    )


def sequence_holdout_taint(
    df: DataFrame,
    vocab: tuple[str, ...] = DEFAULT_BPE_VOCAB,
    seq_len: int = 512,
    salt: str = "holdout:",
    train_cut: float = 0.98,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Eval-hygiene audit of the PACKING stage: if the whole corpus is
    naively packed (holdout docs never physically removed before
    chunking — a real pipeline-ordering bug), which training sequences
    carry heldout (val/test) tokens, and how much mass? Split membership
    is the standard salted-md5 assignment (same salt/cut as
    corpus_holdout_split, so this audits that split's interaction with
    pack_sequences). Counts-only dataflow — the sequence_doc_spans chain
    with a split tag: one shard window over token counts, a bounded
    (doc, seq) explode, then per-source aggregates. Returns one row per
    shard key: total sequences, tainted sequences, heldout token mass,
    and the tainted-sequence rate."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    h = uniform_hash_col(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    counts = (
        with_bpe_token_counts(
            df.select(id_col, shard_col, text_col), vocab, text_col
        )
        .select(
            id_col,
            shard_col,
            F.col("n_bpe_tokens").alias("__n"),
            (h >= train_cut).cast("int").alias("__held"),
        )
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = counts.withColumn(
        "__cum",
        F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint")),
    ).filter(F.col("__n") > 0)
    first_seq = F.floor(F.col("__cum") / seq_len)
    last_seq = F.floor((F.col("__cum") + F.col("__n") - 1) / seq_len)
    spans = placed.select(
        shard_col,
        "__n",
        "__cum",
        "__held",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    overlap = F.least(
        (F.col("seq_id") + 1) * seq_len, F.col("__cum") + F.col("__n")
    ) - F.greatest(F.col("seq_id") * seq_len, F.col("__cum"))
    per_seq = spans.groupBy(shard_col, "seq_id").agg(
        F.sum(overlap * F.col("__held")).cast("bigint").alias("__held_mass")
    )
    return (
        per_seq.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
            F.sum((F.col("__held_mass") > 0).cast("int"))
            .cast("bigint")
            .alias("n_tainted_seqs"),
            F.sum("__held_mass").cast("bigint").alias("heldout_token_mass"),
        )
        .select(
            shard_col,
            "n_seqs",
            "n_tainted_seqs",
            "heldout_token_mass",
            F.round(
                F.col("n_tainted_seqs").cast("double") / F.col("n_seqs"), 6
            ).alias("seq_taint_rate"),
        )
    )
