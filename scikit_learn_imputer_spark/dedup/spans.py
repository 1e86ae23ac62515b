"""Cross-document boilerplate span removal.

Exact/near duplicate detection drops whole documents; real corpora also
carry REPEATED SPANS inside otherwise-unique documents — headers,
footers, navigation text, license blurbs. Production pipelines scrub
the span, not the document: find word n-grams whose document frequency
exceeds a threshold, and delete every occurrence of those n-grams from
every document, keeping the surrounding text.

Dataflow (all built-ins, no UDF):

1. tokenize once per document (shared whitespace tokenizer);
2. emit (doc_id, start, gram) for every word n-gram WITH its position —
   a map-only explode, rows carry 16-byte gram digests downstream;
3. document frequency per gram digest: one map-side-combinable
   aggregate (``countDistinct(doc_id)`` — the shuffle carries digests,
   never text);
4. boilerplate grams (df >= min_df) semi-join back against the
   positioned grams — the boilerplate set is small (that is what a
   threshold is for) so AQE broadcasts it at runtime (no forced hint:
   a pathological threshold must be allowed to shuffle — ADVICE r4);
5. per document, collect the covered starts (bounded by the document's
   own gram count — O(doc length), never corpus-scale state) and
   rebuild the text with one array expression: keep token i unless some
   boilerplate start s satisfies s <= i < s+n.

Two shuffles total (gram-digest aggregate, per-doc start collection) —
both on keys with corpus-proportional cardinality, no skew hazard
beyond a hyper-common gram's DF group, which the partial aggregate
absorbs map-side.

No reference counterpart (single-node imputer); this is part of the
training-data preparation surface. Published precedent: the C4 /
RefinedWeb cleaning stages (span-level dedup against frequent n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def positioned_ngrams(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, __start, __gram) for every word n-gram, 0-based token start.
    Documents with fewer than n tokens emit nothing."""
    t = F.trim(F.col(text_col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )
    starts = F.sequence(F.lit(0), F.size(F.col("__toks")) - n)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(
            id_col,
            F.explode(
                F.transform(
                    starts,
                    lambda s: F.struct(
                        s.alias("start"),
                        F.array_join(
                            F.slice(F.col("__toks"), s + 1, n), " "
                        ).alias("gram"),
                    ),
                )
            ).alias("__sg"),
        )
        .select(id_col, F.col("__sg.start").alias("__start"), F.col("__sg.gram").alias("__gram"))
    )


def boilerplate_grams(
    df: DataFrame,
    n: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(__gram_fp, df) for word n-grams appearing in >= min_df distinct
    documents — the digest aggregate, text never shuffles."""
    return (
        positioned_ngrams(df, n, id_col, text_col)
        .select(id_col, F.md5("__gram").alias("__gram_fp"))
        .groupBy("__gram_fp")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
    )


def remove_boilerplate_spans(
    df: DataFrame,
    n: int = 3,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens_before, n_tokens_after, scrubbed_text): every
    occurrence of a boilerplate n-gram (document frequency >= min_df)
    is deleted; untouched documents pass through with their normalized
    (whitespace-collapsed) token stream."""
    return _remove_covered(
        df, n=n, id_col=id_col, text_col=text_col, distinct_docs=True, threshold=min_df
    )


def remove_exact_substrings(
    df: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"): delete every token that lies inside
    a repeated substring of >= ``min_len`` tokens occurring >=
    ``min_count`` times ANYWHERE in the corpus — including multiple
    occurrences within one document, which ``remove_boilerplate_spans``'
    distinct-document frequency deliberately ignores.

    Distributed shape (no suffix array): a token sits inside a repeated
    substring of length >= L iff it is covered by some length-L shingle
    whose TOTAL occurrence count is >= min_count — every L-subgram of a
    repeated span repeats wherever the span does, and a repeated
    L-gram is itself a repeated span. So arbitrary-length repeated
    substrings reduce EXACTLY to the fixed-L covered-start union: the
    covered-start sets of overlapping repeated shingles merge into the
    maximal repeated spans a suffix array would report, with the same
    cost shape as the boilerplate pass (one digest aggregate + one
    per-doc start collection; text never shuffles). The reference has
    no counterpart (single-node imputer); this is the span-level exact
    dedup family used on real LM corpora.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    return _remove_covered(
        df,
        n=min_len,
        id_col=id_col,
        text_col=text_col,
        distinct_docs=False,
        threshold=min_count,
    )


def _remove_covered(
    df: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    distinct_docs: bool,
    threshold: int,
) -> DataFrame:
    """Shared covered-start scrubber: flag n-grams by either distinct-doc
    frequency (boilerplate) or total occurrence count (ExactSubstr),
    union the flagged starts per document, drop covered tokens."""
    # ONE positioned-gram pass feeds both the DF aggregate and the
    # covered-start join; persisting it avoids re-scanning + re-exploding
    # the corpus for the second consumer (at 100 TB this persist is a
    # digest-only parquet checkpoint, same rationale as the composite's
    # deduped-survivor persist). The cache is released before returning:
    # ``covered`` — the ONLY consumer of both gram uses, and small
    # (O(docs containing boilerplate) rows of int arrays) — is eagerly
    # localCheckpoint-ed, after which the gram cache is dead weight and
    # is unpersisted here rather than leaking until ContextCleaner GC
    # (ADVICE r5).
    grams = (
        positioned_ngrams(df, n, id_col, text_col)
        .select(id_col, "__start", F.md5("__gram").alias("__gram_fp"))
        .persist()
    )
    try:
        freq = (
            F.countDistinct(id_col) if distinct_docs else F.count(F.lit(1))
        ).alias("df")
        bad = (
            grams.groupBy("__gram_fp")
            .agg(freq)
            .filter(F.col("df") >= threshold)
        )
        covered = (
            grams.join(bad.select("__gram_fp"), "__gram_fp", "left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("__start").alias("__starts"))
            .localCheckpoint(eager=True)
        )
    finally:
        grams.unpersist()
    return _scrub_with_covered(df, covered, n, id_col, text_col)


def _scrub_with_covered(
    df: DataFrame, covered: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Rebuild each document without the tokens covered by the per-doc
    flagged start sets (``covered``: id -> array of n-gram starts) — one
    left join plus array expressions, text never shuffles."""
    t = F.trim(F.col(text_col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(F.col("__toks"), lambda x, i: F.struct(x.alias("tok"), i.alias("i"))),
        lambda s: ~F.exists(
            starts, lambda st: (st <= s["i"]) & (s["i"] < st + n)
        ),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .join(covered, id_col, "left")
        .select(
            id_col,
            F.size("__toks").cast("bigint").alias("n_tokens_before"),
            F.size(kept).cast("bigint").alias("n_tokens_after"),
            F.array_join(F.transform(kept, lambda s: s["tok"]), " ").alias(
                "scrubbed_text"
            ),
        )
    )


def scrub_benchmark_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination: delete from every corpus document the
    token spans covered by word n-grams THAT APPEAR IN THE BENCHMARK,
    keeping the rest of the document — the surgical alternative to
    whole-document dropping (``dedup/exact.py:decontaminate_ngram``)
    when eval leakage is a quoted snippet inside an otherwise-clean
    page. Overlapping benchmark grams merge into maximal leaked spans
    via the same covered-start union as the boilerplate/ExactSubstr
    scrubbers.

    Scale shape: benchmark grams collapse to a distinct digest set
    (small by construction — it is an eval set); the corpus side is one
    positioned-gram explode semi-joined against those digests (AQE
    broadcasts the benchmark side), then the per-doc covered-start
    rebuild. The corpus text never shuffles."""
    bench_fp = (
        positioned_ngrams(benchmark, n, id_col, text_col)
        .select(F.md5("__gram").alias("__gram_fp"))
        .distinct()
    )
    covered = (
        positioned_ngrams(corpus, n, id_col, text_col)
        .select(id_col, "__start", F.md5("__gram").alias("__gram_fp"))
        .join(bench_fp, "__gram_fp", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__start").alias("__starts"))
    )
    return _scrub_with_covered(corpus, covered, n, id_col, text_col)


def repeated_substring_spans(
    df: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal repeated spans per document — the report a suffix-array
    ExactSubstr pass would emit: ``(id, span_start, span_len)`` where
    each row is one MAXIMAL run of tokens covered by repeated
    ``min_len``-shingles (total corpus occurrences >= ``min_count``).
    Overlapping/adjacent repeated shingles merge: flagged starts s and
    s' coalesce when ``s' <= s + min_len`` (their [s, s+L) windows
    touch), classic gaps-and-islands over a PER-DOCUMENT window —
    bounded by the document's own token count, never corpus-scale
    state.

    ``remove_exact_substrings`` deletes these spans; this operator
    reports them (audit / targeted review before destructive scrubbing
    — the span inventory Lee et al. build from the suffix array)."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    from pyspark.sql import Window

    grams = positioned_ngrams(df, min_len, id_col, text_col).select(
        id_col, "__start", F.md5("__gram").alias("__gram_fp")
    ).persist()
    try:
        bad = (
            grams.groupBy("__gram_fp")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= min_count)
        )
        flagged = grams.join(bad.select("__gram_fp"), "__gram_fp", "left_semi")
        w = Window.partitionBy(id_col).orderBy("__start")
        prev = F.lag("__start").over(w)
        island = F.sum(
            F.when(prev.isNull() | (F.col("__start") > prev + min_len), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = (
            flagged.withColumn("__island", island)
            .groupBy(id_col, "__island")
            .agg(
                F.min("__start").cast("bigint").alias("span_start"),
                (F.max("__start") + min_len - F.min("__start"))
                .cast("bigint")
                .alias("span_len"),
            )
            .drop("__island")
            .localCheckpoint(eager=True)
        )
    finally:
        grams.unpersist()
    return out
