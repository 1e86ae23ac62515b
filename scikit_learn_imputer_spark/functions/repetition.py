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

Dataflow (optimization round 14, guide §2.4/§4.2): every signal is a
function of ONE document's own token array, so the operator is
MAP-ONLY — a single Arrow-batched pass computes the four integer
token masses per document (O(L) dict counting per doc, state bounded
by the document itself — the bound any engine already accepts by
holding the text column in a row), and the fraction arithmetic
(integer mass / token count, rounded) stays in Spark SQL so the
emitted doubles are bit-identical to the previous form. The previous
shape exploded the corpus to (doc, gram-digest) rows and aggregated
per n: 4 corpus text scans, 8 doc-gram shuffles and a 5-way
doc-keyed join chain for statistics that never cross document
boundaries. At 100 TB this is one map pass over the corpus instead
of four read+shuffle rounds; at bench SF it removes every Exchange
from the operator's plan. (A pure JVM higher-order-function
projection was tried first and rejected: the per-column sort/scan
expression trees get re-inlined at every downstream column reference
and Catalyst's optimizer walks them combinatorially — planning alone
exceeded the old execution time. One opaque Arrow node keeps the
plan a single narrow projection.)

Overlapping occurrences count (standard for these filters): "aaaa"
has three overlapping "aa" bigrams.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Java-regex-faithful whitespace: Spark's ``split(trim(text), '\\s+')``
#: runs Java ``\s`` = ``[ \t\n\x0B\f\r]`` (ASCII-only — Python's
#: unicode-aware ``\s`` would additionally split on NBSP-class chars and
#: silently diverge from the SQL twin), and ``trim`` strips the space
#: character only.
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def _java_tokens(t: str | None) -> list[str]:
    """Tokens exactly as the SQL twin produces them: trim spaces, split
    on Java ``\\s+`` keeping leading/trailing empties (Spark's split
    uses limit -1, as does ``re.split``), empty array for empty/None
    text."""
    if t is None:
        return []
    s = t.strip(" ")
    if s == "":
        return []
    return _JAVA_WS.split(s)


def repetition_masses_udf(top_ns: tuple[int, ...], dup_ns: tuple[int, ...]):
    """Arrow-batched ``text -> array<bigint>`` of the integer token
    masses [top mass per n in top_ns..., dup-covered mass per n in
    dup_ns...]: ``max occurrence count of any n-gram * n`` and ``tokens
    covered by the union of n-grams occurring >= 2 times``. Pure O(L)
    per-doc dict counting; grams are compared as raw strings — exactly
    the oracle's ``GROUP BY doc_id, g`` (the old md5-digest shuffle keys
    matched it only up to hash collisions)."""

    @F.pandas_udf("array<bigint>")
    def _masses(texts: pd.Series) -> pd.Series:
        def doc(t):
            toks = _java_tokens(t)
            L = len(toks)
            out: list[int] = []
            for n in top_ns:
                best = 0
                if L >= n:
                    cnt: dict[str, int] = {}
                    for i in range(L - n + 1):
                        g = " ".join(toks[i : i + n])
                        c = cnt.get(g, 0) + 1
                        cnt[g] = c
                        if c > best:
                            best = c
                out.append(best * n)
            for n in dup_ns:
                mass = 0
                if L >= n:
                    pos: dict[str, list[int]] = {}
                    for i in range(L - n + 1):
                        g = " ".join(toks[i : i + n])
                        pos.setdefault(g, []).append(i)
                    covered: set[int] = set()
                    for starts in pos.values():
                        if len(starts) >= 2:
                            for s in starts:
                                covered.update(range(s, s + n))
                    mass = len(covered)
                out.append(mass)
            return out

        return texts.map(doc)

    return _masses


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
    Documents shorter than n score 0.0 for that signal.

    Map-only, one Arrow pass, no shuffle (see module docstring). Values
    are bit-identical to the former explode+aggregate form: the same
    integer occurrence counts and coverage unions feed the same SQL
    division and rounding."""
    for n in (*top_ns, *dup_ns):
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
    t = F.trim(F.col(text_col))
    n_tokens = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    # asNondeterministic (guide §4.4): the optimizer otherwise clones
    # the Arrow node into every consumer of the signal columns — the
    # lazy waterfall planned SIX ArrowEvalPython evaluations of this
    # one call. Marking it non-reorderable pins exactly one evaluation
    # per reference site; the masses are of course a pure function of
    # the text, so results are unchanged.
    masses = repetition_masses_udf(tuple(top_ns), tuple(dup_ns)).asNondeterministic()
    # Parallelism floor (r15): one Arrow pass over a one-partition scan
    # is one CORE; fan_out no-ops at scale and on fanned inputs.
    from scikit_learn_imputer_spark.functions.skew import fan_out

    tmp = fan_out(df).select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        masses(F.col(text_col)).alias("__m"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    cols = [F.col(id_col), F.col("n_tokens")]
    for j, n in enumerate((*top_ns, *dup_ns)):
        name = (
            f"top{n}_frac" if j < len(top_ns) else f"dup{n}_frac"
        )
        cols.append(
            F.round(
                F.coalesce(
                    F.element_at(F.col("__m"), j + 1), F.lit(0)
                ).cast("double")
                / denom,
                9,
            ).alias(name)
        )
    return tmp.select(*cols)


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
