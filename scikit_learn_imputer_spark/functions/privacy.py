"""Re-identification-risk audits for tabular training data.

PII scrubbing (functions/pii.py) removes direct identifiers from text;
this module measures the orthogonal risk the reference never touches:
QUASI-identifier combinations in structured columns that single out
individuals even after direct identifiers are gone (Sweeney's
k-anonymity, Machanavajjhala's l-diversity). A curation pipeline runs
this audit before releasing a tabular extract or joining user-level
features into a training set.

Everything is two hash aggregates — equivalence classes keyed by the
quasi-identifier tuple (map-side combinable), then an O(#class-sizes)
histogram — so the audit is one shuffle on the QI key at any scale and
the report frame is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def k_anonymity_histogram(
    df: DataFrame,
    qi_cols: list[str | Column],
    *,
    k: int = 5,
    sensitive_col: str | Column | None = None,
) -> DataFrame:
    """Class-size histogram of the quasi-identifier equivalence classes.

    Returns one row per observed class size:
      class_size BIGINT, n_classes BIGINT, n_rows BIGINT,
      risky INT (1 when class_size < k — those rows are re-identifiable
      within a group smaller than k), and, when ``sensitive_col`` is
      given, min_distinct_sensitive BIGINT (the worst l-diversity among
      classes of that size — a k-anonymous class with a single sensitive
      value still leaks the attribute).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("bigint").alias("__l")
        )
    classes = df.groupBy(*qi_cols).agg(*aggs)
    out_aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
    ]
    if sensitive_col is not None:
        out_aggs.append(
            F.min("__l").cast("bigint").alias("min_distinct_sensitive")
        )
    return classes.groupBy("class_size").agg(*out_aggs).select(
        "class_size",
        "n_classes",
        "n_rows",
        (F.col("class_size") < F.lit(k)).cast("int").alias("risky"),
        *([F.col("min_distinct_sensitive")] if sensitive_col is not None
          else []),
    )
