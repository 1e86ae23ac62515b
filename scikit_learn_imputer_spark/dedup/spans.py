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
    # ONE positioned-gram pass feeds both the DF aggregate and the
    # covered-start join; persisting it avoids re-scanning + re-exploding
    # the corpus for the second consumer (at 100 TB this persist is a
    # digest-only parquet checkpoint, same rationale as the composite's
    # deduped-survivor persist).
    grams = (
        positioned_ngrams(df, n, id_col, text_col)
        .select(id_col, "__start", F.md5("__gram").alias("__gram_fp"))
        .persist()
    )
    bad = (
        grams.groupBy("__gram_fp")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    covered = (
        grams.join(bad.select("__gram_fp"), "__gram_fp", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__start").alias("__starts"))
    )
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
