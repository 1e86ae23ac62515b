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

    Built as zip_with over two shifted slices of the char split: O(len)
    per document. (A transform over sequence(1, len-1) with
    substring(lower(text), i, 2) re-evaluates lower(text) per ELEMENT —
    O(len²)/doc, ~4× the whole query's wall clock at bench SF — and
    Spark's sequence(1, 0) DESCENDS rather than being empty, so short
    docs must short-circuit to []. Same lessons as
    functions/text.py:word_ngrams_col.)"""
    chars = F.split(F.lower(F.col(text_col)), "")
    k = F.greatest(F.size(chars) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(chars, 1, k),
        F.slice(chars, 2, k),
        lambda a, b: F.concat(a, b),
    )
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def char_bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, c) counts over the corpus, plus implied prefix totals:
    the TRAIN pass. O(alphabet²) output."""
    from scikit_learn_imputer_spark.functions.skew import fan_out

    return (
        fan_out(docs).select(F.explode(_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_map_entries: int = 65536,
    carry_cols: tuple = (),
    with_sum_micro: bool = False,
) -> DataFrame:
    """(id, *carry_cols, n_bigrams, lm_score): mean add-one-smoothed
    bigram log-prob per document (higher = more typical of the corpus;
    filter the low tail). Documents with < 2 chars produce no row (no
    bigrams). ``carry_cols`` are passed through unchanged (they must be
    functionally dependent on ``id_col``, e.g. ``source``);
    ``with_sum_micro`` appends the exact integer micro-nat sum
    (``sum_micro`` BIGINT) so downstream GROUP aggregates (per-domain
    mean NLL, DoReMi reweighting) stay exact integer math instead of
    re-averaging doubles.

    Two scoring paths, chosen by observed alphabet size:

    - LITERAL-MAP (alphabet² ≤ ``max_map_entries``, the realistic case):
      the count table is collected (it is O(alphabet²) — bounded
      regardless of corpus size, the same justified tiny-collect as IVF
      centroids) and embedded as literal maps, so the score pass is a
      PURE PROJECTION over each doc's bigram array — zero joins, zero
      shuffles, pipelines with the scan.
    - JOIN (exotic alphabets): explode + broadcast-join the count table,
      integer micro-nat sum per doc — one doc-keyed shuffle.

    Both paths produce identical results (integer micro-nat snapping
    before the sum makes the aggregate exact and order-invariant)."""
    counts = char_bigram_counts(docs, text_col)
    rows = counts.limit(max_map_entries + 1).collect()
    if len(rows) <= max_map_entries:
        c = {r["bigram"]: r["c"] for r in rows}
        if not c:
            return docs.sparkSession.createDataFrame(
                [], f"{id_col} bigint, n_bigrams bigint, lm_score double"
            )
        n_bg, sm = _literal_score_exprs(c, text_col)
        from scikit_learn_imputer_spark.functions.skew import fan_out

        cols = [
            F.col(id_col),
            *[F.col(cc) for cc in carry_cols],
            n_bg.alias("n_bigrams"),
            (sm.cast("double") / n_bg / 1e6).alias("lm_score"),
        ]
        if with_sum_micro:
            cols.append(sm.alias("sum_micro"))
        return fan_out(docs).select(*cols).filter(F.col("n_bigrams") > 0)
    return _bigram_lm_scores_join(
        docs, counts, id_col, text_col, carry_cols, with_sum_micro
    )


def _literal_score_exprs(c: dict, text_col: str):
    """``(n_bigrams, sum_micro)`` column expressions from a COLLECTED
    bigram count table — the literal-map scoring projection shared by
    ``bigram_lm_scores`` and ``bigram_lm_inline``. Values are identical
    to the join path's (same per-instance micro-nat snapping)."""
    import math

    pc: dict[str, int] = {}
    for bg, n in c.items():
        pc[bg[0]] = pc.get(bg[0], 0) + n
    v = len({bg[1] for bg in c})
    micro = {
        bg: int(round(math.log((n + 1) / (pc[bg[0]] + v)) * 1e6))
        for bg, n in c.items()
    }
    bgmap = F.create_map(
        *[x for bg, m in sorted(micro.items()) for x in (F.lit(bg), F.lit(m))]
    )
    pmap = F.create_map(
        *[x for p, n in sorted(pc.items()) for x in (F.lit(p), F.lit(n))]
    )
    bg = _bigrams(text_col)
    # unseen bigram (scoring docs outside the train corpus): c=0, so
    # ln(1 / (prefix_total + V)) — same formula the join path yields.
    unseen = lambda g: F.round(  # noqa: E731
        F.log(
            1.0
            / (
                F.coalesce(
                    F.element_at(pmap, F.substring(g, 1, 1)), F.lit(0)
                )
                + F.lit(v)
            ).cast("double")
        )
        * 1e6
    ).cast("bigint")
    terms = F.transform(
        bg, lambda g: F.coalesce(F.element_at(bgmap, g), unseen(g))
    )
    sm = F.aggregate(
        terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    n_bg = F.size(bg).cast("bigint")
    return n_bg, sm


def bigram_lm_inline(
    docs_train: DataFrame,
    text_col: str = "text",
    max_map_entries: int = 65536,
):
    """Train the corpus bigram LM and return a BUILDER of inline score
    columns, or None when the literal-map path does not apply (alphabet²
    beyond ``max_map_entries``, or an empty corpus — callers fall back
    to the join shape).

    The builder maps a text column name to ``(n_bigrams, lm_score)``
    column expressions — the SAME expressions ``bigram_lm_scores``'
    literal path projects, so values are bit-identical. Use it when the
    score feeds a projection that already scans the text: the per-doc
    equi-join against a separate score frame (one doc-keyed shuffle)
    disappears, the scorer becomes one more column in the existing map
    pass (guide §2.4). The count-table collect is the same bounded
    O(alphabet²) driver action ``bigram_lm_scores`` performs."""
    counts = char_bigram_counts(docs_train, text_col)
    rows = counts.limit(max_map_entries + 1).collect()
    if not rows or len(rows) > max_map_entries:
        return None
    c = {r["bigram"]: r["c"] for r in rows}

    def build(col_name: str):
        n_bg, sm = _literal_score_exprs(c, col_name)
        return n_bg, (sm.cast("double") / n_bg / 1e6)

    return build


def _bigram_lm_scores_join(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple = (),
    with_sum_micro: bool = False,
) -> DataFrame:
    """Broadcast-join scoring path (see ``bigram_lm_scores``)."""
    prefix = counts.withColumn(
        "prefix", F.substring("bigram", 1, 1)
    ).groupBy("prefix").agg(F.sum("c").alias("pc"))
    vocab = counts.select(
        F.countDistinct(F.substring("bigram", 2, 1)).alias("v")
    )

    from scikit_learn_imputer_spark.functions.skew import fan_out

    terms = fan_out(docs).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(_bigrams(text_col)).alias("bigram"),
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
    out_cols = [
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("n_bigrams"),
        (F.col("sm").cast("double") / F.col("n_bigrams") / 1e6).alias(
            "lm_score"
        ),
    ]
    if with_sum_micro:
        out_cols.append(F.col("sm").alias("sum_micro"))
    return (
        joined.select(id_col, *carry_cols, micro.alias("m"))
        .groupBy(id_col, *carry_cols)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("m").alias("sm"),
        )
        .select(*out_cols)
    )
