"""PII scrubbing — the redaction pass a training-data pipeline runs
before anything else sees the text.

Pure map-side column expressions (regexp_count / regexp_replace — no
UDF, no shuffle): at 100 TB this pipelines with the scan and costs one
pass. Patterns are deliberately written in the regex subset that Java
(Spark) and RE2 (DuckDB) treat identically — character classes,
non-capturing groups, bounded repetition, ``\\b`` word boundaries — so
the scrub is engine-portable and oracle-checkable.

The pattern set is the standard starter trio (emails, IPv4s, long digit
runs covering phone/card/SSN shapes); a production deployment extends
``PII_PATTERNS`` per policy. Order matters: emails are redacted before
digit runs so a digit-bearing local-part isn't double-hit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    # 9+ digit runs, optionally dash/space-separated triples+ — phones,
    # SSNs, card numbers; deliberately NOT matching short quantities.
    ("longnum", "\\b[0-9][0-9 -]{7,}[0-9]\\b", "<NUM>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-pattern match counts (cheap: regexp_count, no replacement)."""
    return {
        name: F.regexp_count(text, F.lit(rx)) for name, rx, _ in PII_PATTERNS
    }


def scrub_pii_col(text: Column) -> Column:
    """The scrubbed text: every pattern replaced, in declaration order."""
    out = text
    for _, rx, repl in PII_PATTERNS:
        out = F.regexp_replace(out, rx, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_<pattern>`` count columns and a ``clean_text`` column.

    Counts are computed on the ORIGINAL text (before any replacement) so
    they report what was found, not what a prior pattern left behind."""
    t = F.col(text_col)
    counts = pii_counts(t)
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
    return out.withColumn("clean_text", scrub_pii_col(t))
