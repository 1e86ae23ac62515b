"""Within-document repetition signals (Gopher-style quality filters).

Rae et al. 2021 (Gopher, §A1.1) filter documents by repetition: the
fraction of content consumed by the single most frequent word n-gram
(n = 2..4) and the fraction covered by ALL duplicated word n-grams
(n = 5..10). RefinedWeb and Dolma reuse the same signals. These are
WITHIN-document statistics — complementary to the corpus-level dedup
family (``dedup/``): a document can be corpus-unique yet internally
degenerate (keyword stuffing, navigation loops).

Engine divergence, documented: fractions here are TOKEN-denominated
(covered tokens / total tokens) rather than character-denominated —
deterministic, whitespace-normalization-independent, and exactly
reproducible in SQL, which keeps the operator oracle-able. The
threshold semantics (filter docs above a fraction) are unchanged.

Dataflow (scales like the span scrubber):

- ``top_frac(n)``: one explode + one map-side-combinable count per
  (doc, gram digest), max per doc — top fraction = max_count * n /
  n_tokens. Shuffle key cardinality ~ corpus grams, uniform.
- ``dup_frac(n)``: grams occurring >= 2 times IN THE SAME DOC keep
  their start positions (collected in the SAME aggregate — no second
  pass); per-doc covered-token union via one array expression, state
  bounded by the document's own length.

Overlapping occurrences count (standard for these filters): "aaaa"
has three overlapping "aa" bigrams.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positioned_gram_counts(
    df: DataFrame, n: int, id_col: str, text_col: str, with_starts: bool = True
):
    """(id, __cnt[, __starts]) per (doc, n-gram): occurrence count and —
    only when ``with_starts`` — the 0-based token starts, one explode +
    one aggregate. The top-fraction branches consume only ``__cnt``, so
    they pass ``with_starts=False`` and the aggregate is a pure map-side
    combinable count with no list state (ADVICE r6)."""
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
                        F.md5(
                            F.array_join(F.slice(F.col("__toks"), s + 1, n), " ")
                        ).alias("fp"),
                    ),
                )
            ).alias("__sg"),
        )
        .groupBy(id_col, F.col("__sg.fp").alias("__fp"))
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *(
                [F.collect_list("__sg.start").alias("__starts")]
                if with_starts
                else []
            ),
        )
    )


def repetition_signals(
    df: DataFrame,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5, 8),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per document: ``n_tokens``, ``top{n}_frac`` for each n in
    ``top_ns`` (tokens inside occurrences of the most frequent n-gram /
    total tokens, occurrences counted overlapping so the fraction can
    exceed what disjoint coverage would give — the standard definition),
    and ``dup{n}_frac`` for each n in ``dup_ns`` (tokens covered by the
    UNION of all n-grams repeated within the document / total tokens).
    Documents shorter than n score 0.0 for that signal."""
    for n in (*top_ns, *dup_ns):
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
    t = F.trim(F.col(text_col))
    n_tokens = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    base = df.select(F.col(id_col), n_tokens.alias("n_tokens"))

    parts = [base]
    for n in top_ns:
        gc = _positioned_gram_counts(df, n, id_col, text_col, with_starts=False)
        parts.append(
            gc.groupBy(id_col).agg(
                (F.max("__cnt") * n).cast("bigint").alias(f"__toptok_{n}")
            )
        )
    for n in dup_ns:
        gc = _positioned_gram_counts(df, n, id_col, text_col)
        covered = F.array_distinct(
            F.flatten(
                F.transform(
                    F.flatten(F.collect_list("__starts")),
                    lambda s: F.sequence(s, s + n - 1),
                )
            )
        )
        parts.append(
            gc.filter(F.col("__cnt") >= 2)
            .groupBy(id_col)
            .agg(F.size(covered).cast("bigint").alias(f"__duptok_{n}"))
        )
    joined = reduce(lambda a, b: a.join(b, id_col, "left"), parts)
    cols = [F.col(id_col), F.col("n_tokens")]
    for n in top_ns:
        cols.append(
            F.round(
                F.coalesce(F.col(f"__toptok_{n}"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                9,
            ).alias(f"top{n}_frac")
        )
    for n in dup_ns:
        cols.append(
            F.round(
                F.coalesce(F.col(f"__duptok_{n}"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                9,
            ).alias(f"dup{n}_frac")
        )
    return joined.select(*cols)


def stream_quality_gate(
    docs_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    gate,
):
    """Streaming form of a document-quality gate: ``gate`` is any
    batch-DataFrame -> batch-DataFrame filter built from WITHIN-document
    signals (``repetition_signals``-style) — per-doc statistics are
    batch-invariant, so the drained stream output equals one batch run
    exactly (pinned by the batch==stream test). foreachBatch because the
    signals are multi-aggregate per doc, not an incremental stateful op;
    each micro-batch gates independently. Output is exactly-once via the
    batch_id-keyed idempotent sink (streaming/sinks.py) — this sink has
    no store whose state would mask a replay (ADVICE r6)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from scikit_learn_imputer_spark.streaming.sinks import (
            idempotent_batch_sink,
        )

        idempotent_batch_sink(gate(batch), out_path, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
