"""BM25 full-text retrieval over the documents corpus.

The reference engine has no retrieval operator; this is north-star
surface for a training-data pipeline (sourcing domain-relevant documents,
retrieval-based contamination triage, RAG corpus construction). The
design is the inverted-index shape expressed relationally:

- the postings list is ``explode(split(text))`` — one row per
  (doc, term) occurrence, aggregated map-side to term frequencies;
- only postings for the (bounded, broadcast) query-term set survive the
  first join, so corpus-wide work is a semi-filtered linear pass —
  at 100 TB the scan touches every document once but the shuffled
  volume is O(matching postings), never O(all tokens);
- document frequency and corpus statistics (N, avgdl) are O(|query|)
  and 1-row aggregates respectively, both broadcast back;
- the final top-k goes through Spark's ``orderBy().limit(k)`` which
  compiles to TakeOrderedAndProject (per-partition heap + driver merge
  of k rows per partition) — no global sort, no data-sized window.

Scoring is textbook Okapi BM25 with the Lucene positive-idf variant:

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)   = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

so the DuckDB oracle can reproduce every value with the same ``ln``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document containing at least one query term.

    Returns (id_col, score DOUBLE un-rounded, n_terms_matched BIGINT).
    The caller rounds for presentation; keeping the raw double here lets
    downstream top-k tie-break on the rounded value + id deterministically.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    spark = docs.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(query_terms))],
                              "term string")

    words = F.filter(F.split(F.trim(F.col(text_col)), " "), lambda w: w != "")
    base = docs.select(
        F.col(id_col), words.alias("__words")
    ).withColumn("__dl", F.size("__words").cast("double"))

    # 1-row corpus-statistics frame, broadcast (tfidf_top_terms precedent).
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )

    postings = base.select(
        id_col, "__dl", F.explode("__words").alias("term")
    ).join(F.broadcast(q), on="term")
    tf = postings.groupBy(id_col, "term", "__dl").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    # Document frequency per QUERY term only — an O(|query|) frame.
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )

    scored = (
        tf.join(F.broadcast(df_t), on="term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            bm25_weight(
                F.col("__tf"),
                F.col("__df"),
                F.col("__n"),
                F.col("__dl"),
                F.col("__avgdl"),
                k1,
                b,
            ).alias("__w"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__w").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
    )


def bm25_oracle_sql(
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    where: str = "",
) -> str:
    """DuckDB twin of :func:`bm25_scores` (same idf/tf formula, same
    tokenizer) producing (doc_id, score, n_terms_matched). ``where``
    restricts the corpus (takedown oracle: the index after erasure must
    equal an index that never saw the erased docs)."""
    terms = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    clause = f"WHERE {where}" if where else ""
    return f"""
WITH q(term) AS (VALUES {terms}),
base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), w -> w <> '') AS words
  FROM documents {clause}
),
lens AS (SELECT doc_id, CAST(len(words) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM lens),
postings AS (
  SELECT b.doc_id, t.term
  FROM base b, unnest(b.words) AS u(term) JOIN q t USING (term)
),
tf AS (
  SELECT p.doc_id, p.term, l.dl, CAST(count(*) AS DOUBLE) AS tf
  FROM postings p JOIN lens l USING (doc_id)
  GROUP BY 1, 2, 3
),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
w AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * ({k1} + 1))
           / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / s.avgdl)) AS w
  FROM tf JOIN dfq USING (term), stats s
)
SELECT doc_id, sum(w) AS score,
       CAST(count(*) AS BIGINT) AS n_terms_matched
FROM w GROUP BY doc_id
"""


# ---------------------------------------------------------------------
# Persisted inverted index: build once, query many.
# ---------------------------------------------------------------------

N_TERM_BUCKETS = 64


def term_bucket_expr(term: "F.Column"):
    """md5-derived term bucket (0..N_TERM_BUCKETS-1) — the index's
    physical partition key, computable in Spark, DuckDB, and plain
    python (int(md5(term)[:8], 16) % N), so a query planner on ANY
    engine can name the index partitions its terms live in."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("bigint")
        % N_TERM_BUCKETS
    ).cast("int")


def python_term_bucket(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % N_TERM_BUCKETS


def bm25_weight(tf, df, n, dl, avgdl, k1: float, b: float):
    """The one BM25 weight expression (Lucene positive-idf variant),
    shared by the from-scratch scorer and the persisted-index probe so
    "probe scores == fresh scores" is structural, not a convention."""
    return (
        F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))
        * (tf * (k1 + 1.0))
        / (tf + k1 * (1.0 - b + b * dl / avgdl))
    )


def build_bm25_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Materialize the four index frames: postings (term_bucket, term,
    doc_id, tf, dl), document frequencies (term, df), the 1-row corpus
    stats (n_docs, sum_dl), and per-doc lengths (doc_id, dl) — the
    norms sidecar a takedown needs to correct stats for documents whose
    text produced NO postings (empty/whitespace-only docs count toward
    n_docs). All are plain aggregates of one tokenization pass."""
    words = F.filter(F.split(F.trim(F.col(text_col)), " "), lambda w: w != "")
    base = docs.select(F.col(id_col), words.alias("__words")).withColumn(
        "__dl", F.size("__words").cast("double")
    )
    postings = (
        base.select(id_col, "__dl", F.explode("__words").alias("term"))
        .groupBy("term", id_col, "__dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .select(
            term_bucket_expr(F.col("term")).alias("term_bucket"),
            "term",
            id_col,
            F.col("__dl").alias("dl"),
            "tf",
        )
    )
    dfs = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    doclens = base.select(id_col, F.col("__dl").alias("dl"))
    # Summable moments, not the average: (n_docs, sum_dl) add across
    # incremental index deltas, and avgdl = sum_dl / n_docs is the
    # EXACT same double (dl values are integers, sums stay < 2^53).
    # Derived from doclens (one row per doc, identical dl values), not
    # from base: dfs hangs off postings and stats off doclens, so a
    # save that persists those two frames writes all four outputs from
    # TWO tokenization passes instead of four (guide §1.2).
    stats = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0.0)).alias("sum_dl"),
    )
    return postings, dfs, stats, doclens


def save_bm25_index(
    postings: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    doclens: DataFrame,
    path: str,
) -> None:
    """Write the base index: postings parquet PARTITIONED BY
    (term_bucket, ingest_batch) — a query touches |query| buckets of 64
    (the scan prunes the rest at planning time), and the second-level
    ingest key is what makes every later append/replay idempotent
    (ADVICE r11; ``ingest_batch='base'`` for the full build). df/stats
    land as small DELTA frames (load sums them, so incremental appends
    need no read-modify-write), plus the per-doc length sidecar.

    The four writes go to four disjoint directories with no ordering
    contract between them (idempotency is per-subdir overwrite, and an
    index is not expected to be readable mid-save), so they are
    submitted CONCURRENTLY from a driver thread pool (guide §2.6): the
    small df/stats/doclens jobs back-fill executors the postings job's
    tail leaves idle, and the four scans of the source share the OS
    page cache. Measured at sf0.1: 2.3-2.5 s sequential → 1.3-1.5 s
    pooled, identical outputs. (A persist-the-postings variant was
    tried first and measured WORSE — 22 s for the postings write alone:
    writing a partitionBy frame from an InMemoryRelation loses AQE's
    exchange coalescing, so every cached partition opens a file per
    term-bucket directory. Guide §1.1's gotcha loop, documented in
    OPTIMIZATION_r14.md.)"""
    _write_index_frames(postings, dfs, stats, doclens, path, "base", False)


def _write_index_frames(
    postings: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    doclens: DataFrame,
    path: str,
    key: str,
    dynamic: bool,
) -> None:
    """Shared 4-frame index writer (see save_bm25_index's docstring for
    the concurrent-write rationale); ``dynamic`` selects dynamic
    partition overwrite for incremental appends."""
    from concurrent.futures import ThreadPoolExecutor

    def write_postings() -> None:
        w = postings.withColumn("ingest_batch", F.lit(key)).write.mode(
            "overwrite"
        )
        if dynamic:
            w = w.option("partitionOverwriteMode", "dynamic")
        w.partitionBy("term_bucket", "ingest_batch").parquet(
            f"{path}/postings"
        )

    sub = "base" if not dynamic else f"append-{key}"
    jobs = [
        write_postings,
        lambda: dfs.write.mode("overwrite").parquet(f"{path}/dfs/{sub}"),
        lambda: stats.write.mode("overwrite").parquet(
            f"{path}/stats/{sub}"
        ),
        lambda: doclens.write.mode("overwrite").parquet(
            f"{path}/doclens/{sub}"
        ),
    ]
    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        for f in [pool.submit(j) for j in jobs]:
            f.result()


def append_bm25_index(
    delta_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    append_id: str | None = None,
) -> None:
    """Incrementally index NEW documents into a persisted index without
    touching the already-indexed corpus: the delta's postings land
    under their term-bucket directories keyed by this append's
    ``ingest_batch`` (dynamic partition overwrite — only the
    (bucket, this-append) partitions are written, pruning is
    unaffected), and df/stats/doclens land as delta SUBDIRECTORIES the
    loader folds. With an explicit ``append_id`` the whole append is
    IDEMPOTENT (ADVICE r11): a replay after a crash overwrites exactly
    its own partitions/subdirs instead of appending duplicates — the
    idempotent_batch_sink contract; streaming ingest passes its
    batch_id here. Without one, a fresh uuid keeps the old
    at-least-once semantics for ad-hoc appends. One pass over NEW
    documents; nothing already indexed is read. Assumes delta doc ids
    are new (dedup/decontam run upstream; a previously taken-down id
    must NOT be re-ingested under the same id)."""
    import uuid

    key = append_id if append_id is not None else uuid.uuid4().hex[:16]
    postings, dfs, stats, doclens = build_bm25_index(
        delta_docs, id_col=id_col, text_col=text_col
    )
    _write_index_frames(postings, dfs, stats, doclens, path, key, True)


def _read_deltas(spark, path: str) -> DataFrame:
    """Fold-ready read of a delta directory tree (base file(s) at the
    root and/or keyed subdirectories): recursiveFileLookup reads every
    delta file without hive-partition inference, so append/takedown
    subdirs and legacy root files coexist."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(path)
    )


def load_bm25_index(spark, path: str):
    """Read the index back, folding any incremental deltas: df sums per
    term, stats sums to one row and derives avgdl = sum_dl / n_docs
    (exact — integer-valued doubles)."""
    dfs = (
        _read_deltas(spark, f"{path}/dfs")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    stats = (
        _read_deltas(spark, f"{path}/stats")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
        )
        .select(
            "n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl")
        )
    )
    return spark.read.parquet(f"{path}/postings"), dfs, stats


def bm25_scores_from_index(
    postings: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Score a query against the PERSISTED index: the term filter and
    the python-computed bucket filter both reach the parquet scan, so
    only the query's postings partitions are read — the corpus text is
    never touched again. Identical scores to :func:`bm25_scores`.
    ``tombstones`` (from :func:`load_bm25_tombstones`) anti-joins
    taken-down documents out of the hit set before scoring."""
    terms = sorted(set(query_terms))
    buckets = sorted({python_term_bucket(t) for t in terms})
    hit = postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    if tombstones is not None:
        hit = hit.join(F.broadcast(tombstones), id_col, "left_anti")
    scored = (
        hit.join(F.broadcast(dfs.filter(F.col("term").isin(terms))), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            bm25_weight(
                F.col("tf"),
                F.col("df"),
                F.col("n_docs"),
                F.col("dl"),
                F.col("avgdl"),
                k1,
                b,
            ).alias("__w"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__w").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
    )


def takedown_bm25_index(
    spark,
    path: str,
    doc_ids: DataFrame,
    *,
    id_col: str = "doc_id",
    request_id: str | None = None,
) -> None:
    """Propagate a takedown/right-to-erasure request through the
    persisted index WITHOUT a rebuild — deletion is just the negative
    delta: the victims' ids land in a tombstone frame (probes anti-join
    it), and their df / corpus-stats contributions land as NEGATIVE
    delta files that the loader's existing sums fold away. Corrections
    come from the doclens sidecar (so zero-posting documents still
    decrement n_docs) plus one semi-join over the affected term
    buckets; untouched buckets are never read.

    CRASH-ATOMIC idempotency (ADVICE r11 — the old append-then-tombstone
    order double-subtracted if a crash landed between the writes and
    the request replayed): every artifact of one request is keyed by a
    ``request_id`` (caller-supplied, or content-derived as the md5 of
    the sorted victim id set — identical on any replay) and written
    with OVERWRITE into its own subdirectory, so a replay at ANY crash
    point rewrites the same files with the same deterministic content
    instead of appending. Overlapping DISTINCT requests still never
    double-subtract: ids tombstoned by OTHER requests are excluded
    before deltas are computed (a request's own prior partial writes
    are deliberately NOT excluded — that is what makes its replay
    recompute, not no-op into a half-applied state). The tombstone
    subdir is written LAST: a request becomes visible to probes only
    once its stat corrections are fully on disk. Takedown requests are
    bounded (legal/erasure batches — already broadcast in every join
    here), so the content digest is one O(request) driver aggregate.
    Physical purge of the tombstoned posting rows is a later
    bucket-local compaction (the dedup/incremental.py compaction
    contract); the index answers as-if-deleted the moment this
    returns.

    REPLAY ACROSS COMPACTION (ADVICE r12 medium): compaction clears the
    tombstones after purging, so a late replay of a fully-applied
    request used to recompute its negative df delta from the PURGED
    postings (empty) and overwrite the request's correction away —
    permanently inflating idf for every victim term. Two guards close
    that: (1) the replay short-circuits when the request's OWN
    tombstone rows are present (tombstones are written last, so their
    presence proves the request fully applied); (2) an ``applied/``
    ledger — one request-keyed marker, written LAST here and
    (re)written by :func:`compact_bm25_index` for every request it
    clears — makes that proof survive the tombstone clear, so a
    post-compaction replay no-ops too. A ``request_id`` therefore names
    an IMMUTABLE victim set: replaying an applied id with different ids
    is a caller error (the default content-derived key makes that
    impossible). Known residual limitation (documented, not silently
    wrong): a DIFFERENT request listing an already-purged victim after
    compaction re-subtracts that victim's doclens contribution — the
    cross-request exclusion reads tombstones, which compaction clears;
    a permanent id ledger would instead make re-ingested docs
    untakedownable, so fixing it needs erasure epochs (future work)."""
    ids = doc_ids.select(id_col).distinct()
    if request_id is None:
        # Content-addressed request key: same victim set -> same key on
        # replay. One 1-row aggregate over the (bounded) request frame.
        row = ids.agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(F.col(id_col).cast("string"))
                    ),
                )
            ).alias("k")
        ).collect()[0]
        request_id = (row["k"] or "empty")[:16]
    existing = _read_tombstones_raw(spark, path)
    if _takedown_fully_applied(spark, path, request_id, existing):
        return
    if existing is not None:
        others = (
            existing.filter(F.col("__req") != request_id)
            .select(id_col)
            .distinct()
        )
        ids = ids.join(F.broadcast(others), id_col, "left_anti")
    postings = spark.read.parquet(f"{path}/postings")
    victim = postings.join(F.broadcast(ids), id_col, "left_semi")
    neg_df = victim.groupBy("term").agg(
        (-F.count(F.lit(1)).cast("double")).alias("df")
    )
    victim_lens = (
        _read_deltas(spark, f"{path}/doclens")
        .join(F.broadcast(ids), id_col, "left_semi")
    )
    neg_stats = victim_lens.agg(
        (-F.count(F.lit(1)).cast("double")).alias("n_docs"),
        (-F.coalesce(F.sum("dl"), F.lit(0.0))).alias("sum_dl"),
    )
    neg_df.write.mode("overwrite").parquet(
        f"{path}/dfs/takedown-{request_id}"
    )
    neg_stats.write.mode("overwrite").parquet(
        f"{path}/stats/takedown-{request_id}"
    )
    ids.withColumn("__req", F.lit(request_id)).write.mode(
        "overwrite"
    ).parquet(f"{path}/tombstones/takedown-{request_id}")
    _mark_takedown_applied(spark, path, request_id)


def _takedown_fully_applied(
    spark, path: str, request_id: str, tombstones: DataFrame | None
) -> bool:
    """True iff this request already ran to completion: its own
    tombstone rows are present (written last at takedown time) or its
    applied-ledger marker exists (written after the tombstone, and
    rewritten by compaction before it clears the tombstones). Either
    proof makes a replay a safe no-op; absence of both means the
    request never completed, so the replay recomputes from the
    (necessarily unpurged — compaction only runs on completed
    tombstones) postings. O(#requests) checks on bounded frames."""
    if tombstones is not None:
        own = tombstones.filter(F.col("__req") == request_id).limit(1)
        if own.count() > 0:
            return True
    applied = _read_applied_raw(spark, path)
    if applied is not None:
        mark = applied.filter(F.col("__req") == request_id).limit(1)
        if mark.count() > 0:
            return True
    return False


def _mark_takedown_applied(spark, path: str, request_id: str) -> None:
    """Request-keyed 1-row marker in the ``applied/`` ledger; OVERWRITE
    into its own subdir, so replays and compaction rewrites are
    idempotent."""
    spark.createDataFrame([(request_id,)], "__req string").write.mode(
        "overwrite"
    ).parquet(f"{path}/applied/takedown-{request_id}")


def _read_applied_raw(spark, path: str) -> DataFrame | None:
    """(__req) marker rows across all applied-request subdirs, or None
    when no takedown has ever completed."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("recursiveFileLookup", "true").parquet(
            f"{path}/applied"
        )
    except AnalysisException:
        return None


def _read_tombstones_raw(spark, path: str) -> DataFrame | None:
    """(id_col, __req) tombstone rows across all request subdirs, or
    None when no takedown has ever run. Existence is probed with a
    Spark read (not the driver's local filesystem), so object-store
    index paths behave like local ones."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("recursiveFileLookup", "true").parquet(
            f"{path}/tombstones"
        )
    except AnalysisException:
        return None


def load_bm25_tombstones(
    spark, path: str, *, id_col: str = "doc_id"
) -> DataFrame | None:
    """Read the tombstone id set for probe anti-joins, or None when no
    takedown has run yet."""
    tomb = _read_tombstones_raw(spark, path)
    if tomb is None:
        return None
    return tomb.select(id_col).distinct()


def compact_bm25_index(spark, path: str, *, id_col: str = "doc_id") -> list:
    """Physically purge tombstoned postings, bucket-locally — the
    deferred half of :func:`takedown_bm25_index`. Only term-bucket
    directories that actually contain victim rows are rewritten (their
    survivors land in a sibling tmp dir, then swap in); the other
    buckets are never read or touched, so compaction cost is
    O(affected buckets), not O(index). Crash-safe by construction, no
    marker needed: a crash mid-swap leaves some buckets purged and the
    tombstones still in place, and anti-joining a tombstone whose rows
    are already gone is a no-op — the index answers correctly in every
    intermediate state. Tombstones clear (empty overwrite) only after
    every bucket swap completes. The df/stats deltas written at
    takedown time stay untouched — they were corrected then and purging
    rows does not change them. Returns the list of purged buckets.

    Directory swaps use local-filesystem moves (the incremental-store
    compaction contract); an object-store index would swap via its
    rename primitive instead."""
    import os
    import shutil
    import tempfile

    tomb = load_bm25_tombstones(spark, path, id_col=id_col)
    if tomb is None:
        return []
    postings = spark.read.parquet(f"{path}/postings")
    victims = postings.join(F.broadcast(tomb), id_col, "left_semi")
    affected = sorted(
        r["term_bucket"]
        for r in victims.select("term_bucket").distinct().collect()
    )  # bounded: <= N_TERM_BUCKETS rows, driver-side by contract
    if not affected:
        # Nothing physical to purge (e.g. all victims were zero-posting
        # docs); still clear the tombstones so probes drop the anti-join.
        _mark_cleared_requests_applied(spark, path)
        _clear_bm25_tombstones(spark, path, id_col)
        return []
    tmp = tempfile.mkdtemp(prefix="sli_bm25_compact_")
    (
        postings.filter(F.col("term_bucket").isin(affected))
        .join(F.broadcast(tomb), id_col, "left_anti")
        # Survivors re-land under their original ingest_batch so the
        # two-level (term_bucket, ingest_batch) layout stays uniform.
        .write.mode("overwrite")
        .partitionBy("term_bucket", "ingest_batch")
        .parquet(f"{tmp}/postings")
    )
    for b in affected:
        dst = f"{path}/postings/term_bucket={b}"
        src = f"{tmp}/postings/term_bucket={b}"
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            shutil.move(src, dst)
        # A bucket whose every row was a victim has no survivor dir —
        # removing the old dir IS the compaction for it.
    shutil.rmtree(tmp, ignore_errors=True)
    # Markers BEFORE the clear: once the tombstones are gone, the
    # applied ledger is the only surviving proof that these requests
    # completed — without it a late replay would recompute its negative
    # df delta from the now-purged postings (empty) and erase the
    # request's correction (ADVICE r12 medium). A crash between the two
    # writes leaves both proofs present — still a no-op replay.
    _mark_cleared_requests_applied(spark, path)
    _clear_bm25_tombstones(spark, path, id_col)
    return affected


def _mark_cleared_requests_applied(spark, path: str) -> None:
    """(Re)write the applied-ledger marker for every request whose
    tombstone is about to clear. O(#requests) driver loop over the
    bounded request set (legal/erasure batches); each marker is an
    idempotent per-request overwrite."""
    tomb = _read_tombstones_raw(spark, path)
    if tomb is None:
        return
    reqs = [
        r["__req"]
        for r in tomb.select("__req").distinct().collect()  # O(#requests)
        if r["__req"] is not None
    ]
    for req in reqs:
        _mark_takedown_applied(spark, path, req)


def _clear_bm25_tombstones(spark, path: str, id_col: str) -> None:
    # Overwrite of the ROOT removes every request subdir; the schema
    # matches the per-request tombstone frames so later recursive reads
    # never mix column sets.
    empty = spark.createDataFrame([], f"{id_col} long, __req string")
    empty.write.mode("overwrite").parquet(f"{path}/tombstones")
