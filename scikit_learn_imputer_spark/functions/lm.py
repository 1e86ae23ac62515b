"""Char-bigram language-model quality scoring — the "train a tiny filter
model on the corpus, score every document with it" pipeline stage (the
cheap stand-in for a KenLM/perplexity filter; same dataflow shape).

Two passes, both scale-shaped:

1. TRAIN: char-bigram counts over the (lowercased) corpus. The group-by
   key space is |alphabet|² — map-side partial aggregation collapses each
   partition to at most that many rows, so the shuffle is O(alphabet²)
   per partition regardless of corpus size, and the resulting count table
   is always broadcastable.
2. SCORE: explode each document into (doc_id, bigram), broadcast-join the
   count table, and sum per-document add-one-smoothed log-probabilities:
   ln((c(b) + 1) / (c(prefix) + V)), V = distinct observed chars.

Determinism note (this is what makes the score ORACLE-CHECKABLE): the
per-term log-prob is snapped to integer MICRO-nats
(``round(ln(...) * 1e6)`` as BIGINT) before the per-document sum, so the
aggregate is exact integer arithmetic — invariant to partitioning and
addition order, where a double sum would drift between engines. The
snap costs < 1e-6 nats/term of precision, far below filtering
resolution. The final mean divides once, in double."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(text_col: str):
    """array of char bigrams of lower(text) — JVM higher-order exprs.
    Short docs short-circuit to [] (Spark's sequence(1, 0) DESCENDS
    rather than being empty — see functions/text.py:word_ngrams_col)."""
    t = f"lower({text_col})"
    return F.expr(
        f"CASE WHEN length({t}) >= 2 THEN"
        f" transform(sequence(1, length({t}) - 1),"
        f" i -> substring({t}, i, 2))"
        f" ELSE array() END"
    )


def char_bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, c) counts over the corpus, plus implied prefix totals:
    the TRAIN pass. O(alphabet²) output."""
    return (
        docs.select(F.explode(_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, lm_score): mean add-one-smoothed bigram log-prob
    per document (higher = more typical of the corpus; filter the low
    tail). Documents with < 2 chars score NULL."""
    counts = char_bigram_counts(docs, text_col)
    prefix = counts.withColumn(
        "prefix", F.substring("bigram", 1, 1)
    ).groupBy("prefix").agg(F.sum("c").alias("pc"))
    vocab = counts.select(
        F.countDistinct(F.substring("bigram", 2, 1)).alias("v")
    )

    terms = docs.select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("bigram")
    )
    joined = (
        terms.join(F.broadcast(counts), on="bigram", how="left")
        .withColumn("prefix", F.substring("bigram", 1, 1))
        .join(F.broadcast(prefix), on="prefix", how="left")
        .crossJoin(F.broadcast(vocab))
    )
    micro = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col("pc"), F.lit(0)) + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("bigint")
    return (
        joined.select(id_col, micro.alias("m"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("m").alias("sm"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("sm").cast("double") / F.col("n_bigrams") / 1e6).alias(
                "lm_score"
            ),
        )
    )
