"""Corpus-wide paragraph/line deduplication (RefinedWeb/Falcon line
dedup; VERDICT r6 #2).

The spans module (``dedup/spans.py``) removes repeated token n-grams;
this operator removes NATURAL units — newline-separated paragraphs or
lines — that occur too often across the corpus (navigation chrome,
boilerplate headers, cookie banners). Penedo et al. 2023 (RefinedWeb)
remove every occurrence of any line duplicated corpus-wide; that is the
semantics here: a paragraph whose normalized form appears in >=
``min_count`` (doc, position) slots is deleted from EVERY document.

Scale design — document text never shuffles:

1. explode to (doc, pos, digest): md5 of the normalized paragraph,
   paragraph text dropped immediately after hashing (map-side);
2. corpus-wide digest counts: map-side-combinable count over 16-byte
   digests (empty/whitespace paragraphs excluded from counting — they
   would all be trivially "duplicates" — and always preserved);
3. removal positions: (doc, pos) for digests over threshold — a join
   that carries digests and two ints, never text;
4. rebuild: the per-doc removed-position set (bounded by the doc's own
   paragraph count) joins back to the ORIGINAL row and a pure array
   expression re-splits, index-filters, and re-joins the text — one
   projection, no per-paragraph shuffle of content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _regex_literal(sep: str) -> str:
    """Quote ``sep`` for Java-regex ``F.split`` (Pattern.quote
    algorithm). ``F.split`` treats its pattern as a regex while
    ``array_join`` re-joins literally; an unquoted metacharacter
    separator ('.', '|') would split and rejoin inconsistently and
    corrupt rebuilt text (ADVICE r7)."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def paragraph_digests(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(id, pos, digest, is_empty) per paragraph: 0-based position and
    the md5 of the lower-cased whitespace-collapsed paragraph. Paragraph
    text is hashed and dropped in the same projection."""
    norm = F.md5(F.regexp_replace(F.lower(F.trim(F.col("__para"))), "\\s+", " "))
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), _regex_literal(sep))
            ).alias("pos", "__para"),
        )
        .select(
            id_col,
            F.col("pos").cast("int").alias("pos"),
            norm.alias("digest"),
            (F.length(F.trim(F.col("__para"))) == 0).alias("is_empty"),
        )
    )


def duplicated_paragraphs(
    df: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(digest, n_occurrences) for every non-empty normalized paragraph
    occurring in >= ``min_count`` paragraph slots corpus-wide — the
    removal set, and on its own the corpus-boilerplate report."""
    return (
        paragraph_digests(df, id_col, text_col, sep)
        .filter(~F.col("is_empty"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def dedup_paragraphs(
    df: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Remove every occurrence of every corpus-duplicated paragraph:
    original columns with ``text_col`` scrubbed (paragraph order and the
    untouched paragraphs preserved, separators re-joined with ``sep``)
    plus ``n_paragraphs_removed``. Empty paragraphs are never removed.

    Idempotent: after one pass no surviving paragraph has corpus count
    >= min_count, so a second pass removes nothing (property-tested)."""
    paras = paragraph_digests(df, id_col, text_col, sep)
    hot = duplicated_paragraphs(df, min_count, id_col, text_col, sep).select(
        "digest"
    )
    removed = (
        paras.filter(~F.col("is_empty"))
        .join(hot, on="digest", how="left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__rm"))
    )
    rm = F.coalesce(F.col("__rm"), F.array().cast("array<int>"))
    parts = F.split(F.col(text_col), _regex_literal(sep))
    kept = F.filter(parts, lambda x, i: ~F.array_contains(rm, i.cast("int")))
    out_cols = [
        F.array_join(kept, sep).alias(c) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(removed, on=id_col, how="left")
        .select(
            *out_cols,
            F.size(rm).cast("bigint").alias("n_paragraphs_removed"),
        )
    )
