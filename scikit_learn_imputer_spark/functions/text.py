"""Text-analysis functions for large-scale training-data pipelines.

These extend the reference's surface (it has no text ops) with the
document-pipeline staples: token counting, quality scoring, language ID,
fingerprinting. All are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen friendly, no Python UDFs in the hot path —
and each has an exact ANSI/DuckDB-SQL twin for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker-word sets for the heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "los", "y", "es", "una"),
    "zh": ("的", "是", "了", "在", "和"),
}

# A BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-alphanumeric non-space symbol.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_col(text: Column) -> Column:
    """Whitespace token count (JVM split, no UDF)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )


def bpe_token_count_col(text: Column) -> Column:
    """Count of BPE-ish regex tokens."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def stopword_count_col(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Number of whitespace tokens that are in ``stopwords``."""
    toks = F.split(F.trim(text), "\\s+")
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char count, token count, average token
    length, stopword ratio, punctuation ratio, and a composite 0-1 quality
    score (heuristic linear blend). Pure projection — pipelined with the scan.
    """
    t = F.col(text_col)
    n_tokens = token_count_col(t)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    n_stop = stopword_count_col(t, LANG_MARKERS["en"])
    avg_tok = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)).cast("double") / n_tokens)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0)
    # Heuristic quality: alphabetic and reasonably stopworded, not
    # punctuation-heavy, tokens of plausible length.
    score = (
        0.4 * alpha_ratio
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    # Parallelism floor (r15): the regex/split feature battery is the
    # CPU-bound per-doc stage, and a small parquet corpus scans as ONE
    # partition — without the floor every caller's quality pass
    # serializes on a single core (no-op at real corpus scale and on
    # already-fanned inputs; functions/skew.py:fan_out).
    from scikit_learn_imputer_spark.functions.skew import fan_out

    df = fan_out(df)
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        avg_tok.alias("q_avg_token_len"),
        stop_ratio.alias("q_stopword_ratio"),
        punct_ratio.alias("q_punct_ratio"),
        score.alias("q_score"),
    )


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID: count marker words per language, pick the
    arg-max (ties broken by language-code order, 'en' first as prior).

    argmax is expressed as array_max over (score, priority, lang) structs —
    a single projection, no shuffle.
    """
    langs = list(LANG_MARKERS)
    entries = []
    for i, lang in enumerate(langs):
        score = stopword_count_col(text, LANG_MARKERS[lang])
        entries.append(
            F.struct(
                score.alias("s"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    return F.array_max(F.array(*entries)).getField("lang")


def fingerprint_col(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the lower-cased,
    whitespace-collapsed text. Engine-portable (md5 agrees everywhere)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))


def rolling_hash_expr(text_col_name: str, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash h = Σ base^i·code(c_i) mod m — JVM
    higher-order function, no UDF. Folds over ``split(text, '')`` so each
    character is visited once: ``substring(text, i, 1)`` per sequence
    element is an O(i) UTF-8 seek, i.e. O(len²) per document (~2× the
    query's wall clock at bench SF). Empty text hashes to 0 either way."""
    return F.expr(
        f"aggregate(split({text_col_name}, ''), 0L, "
        f"(acc, c) -> (acc * {base} + ascii(c)) % {mod})"
    )


def word_ngrams_col(text: Column, n: int = 3) -> Column:
    """Whitespace-token n-grams as an array<string>. Pure higher-order
    expressions, JVM-side, no UDF.

    Built by folding zip_with over n shifted slices: O(words) work with a
    constant number of `words` evaluations. (A transform over
    sequence(1, k) with element_at re-evaluates the split per ELEMENT —
    O(words²) per doc, ~30× slower at bench SF — and sequence(1, 0)
    DESCENDS rather than being empty, so short docs must short-circuit
    to [].)"""
    words = F.split(F.trim(text), "\\s+")
    return array_ngrams_col(words, n)


def array_ngrams_col(arr: Column, n: int) -> Column:
    """n-grams of ANY array column as space-joined ``array<string>``
    (elements cast to string) — the ``word_ngrams_col`` fold generalized
    to token-ID arrays and other sequences; same O(len) zip_with shape,
    same short-doc short-circuit."""
    strs = F.transform(arr, lambda x: x.cast("string"))
    k = F.size(strs) - (n - 1)
    grams = F.slice(strs, n, k)
    for off in range(n - 1, 0, -1):
        grams = F.zip_with(
            F.slice(strs, off, k),
            grams,
            lambda a, rest: F.concat_ws(" ", a, rest),
        )
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(grams)


def word_trigrams_col(text: Column) -> Column:
    """Whitespace-token 3-grams — the unit of the Gopher-style
    within-document repetition signal."""
    return word_ngrams_col(text, 3)


def dup_trigram_ratio_col(text: Column) -> Column:
    """Within-document repetition: 1 − distinct/total over word 3-grams
    (the Gopher/C4-family "duplicate n-gram fraction" quality filter;
    high values flag boilerplate and degenerate repetition). 0.0 for
    documents shorter than one full trigram."""
    tg = word_trigrams_col(text)
    return F.when(
        F.size(tg) <= 0, F.lit(0.0)
    ).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(tg)).cast("double")
        / F.size(tg).cast("double")
    )


def uniform_hash_col(key: Column) -> Column:
    """Deterministic, engine-portable uniform [0,1) draw from a key:
    first 8 hex digits of md5 → uint32 / 2³². The seed-free analogue of
    rand() that DuckDB/any engine reproduces bit-for-bit — the primitive
    under deterministic Bernoulli sampling."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def quality_score_col(text: Column) -> Column:
    """Composite 0-1 quality score (same formula the text_quality query
    reports: alpha ratio, stopword density, punctuation penalty).

    Empty / whitespace-only documents score 0·alpha + 0·stop + 0.3·(1-0)
    via the same zero-guards ``quality_features`` uses — never null/inf."""
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    n_stop = stopword_count_col(text, LANG_MARKERS["en"])
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    return (
        0.4 * alpha_ratio
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
