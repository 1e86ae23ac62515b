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


def _dp_key_part(col: Column) -> Column:
    """NULL-safe, injection-safe key token for one class column:
    length-prefixed value (``5:BUILD``) or the bare NULL marker ``~``
    (real tokens always start with a digit, so NULL can never collide
    with a value, and the length prefix means a value containing the
    joiner can never alias a different class tuple). ADVICE r12:
    ``concat_ws`` silently SKIPS NULL parts, so ``(NULL,'x')`` and
    ``('x',NULL)`` used to hash to the same key and draw correlated
    noise for distinct classes."""
    s = col.cast("string")
    return F.when(s.isNull(), F.lit("~")).otherwise(
        F.concat(F.length(s).cast("string"), F.lit(":"), s)
    )


def dp_laplace_release(
    df: DataFrame,
    group_cols: list[str],
    *,
    secret_seed: str,
    release_epoch: str,
    eps: float = 1.0,
) -> DataFrame:
    """PRODUCTION differential-privacy histogram release: per-class
    counts with Laplace(sensitivity/eps) noise (count queries have
    sensitivity 1), releasing ONLY the noised integer — never the true
    count or the noise (ADVICE r11: emitting those lets anyone subtract
    the noise back out, and a noise draw keyed by the public class
    alone is recomputable by an attacker, i.e. zero actual privacy).
    The draw is the md5-uniform of ``secret_seed || release_epoch ||
    class`` pushed through the Laplace inverse CDF — deterministic
    GIVEN (seed, epoch) so the data owner can audit their own release,
    unpredictable without the seed.

    ONE (seed, epoch) PAIR PER RELEASE (ADVICE r12): the noise is a
    pure function of the key, so re-releasing an EVOLVING dataset under
    the same pair leaks exact true-count deltas — ``released_t2 -
    released_t1 == true_t2 - true_t1``, zero privacy for the delta.
    ``release_epoch`` is therefore a required parameter (a date, a
    sequence number — anything never reused with the same seed); each
    epoch draws fresh independent noise. Class columns are encoded
    NULL-safely and length-prefixed (see ``_dp_key_part``) so distinct
    class tuples can never share a draw.

    The registered ``dp_release_calibration`` query is this pipeline
    with a KNOWN seed and the diagnostic columns kept, for
    oracle/utility checking only; ``dp_histogram_release`` is the
    release-shaped registered twin. Cost: one O(#classes) aggregate +
    a pure projection."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not secret_seed:
        raise ValueError("secret_seed must be non-empty")
    if not release_epoch:
        raise ValueError("release_epoch must be non-empty")
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__true")
    )
    key = F.concat_ws(
        "|",
        _dp_key_part(F.lit(secret_seed)),
        _dp_key_part(F.lit(str(release_epoch))),
        *[_dp_key_part(F.col(c)) for c in group_cols],
    )
    v = uniform_hash_col(key) - F.lit(0.5)
    noise = (
        -F.signum(v)
        * F.log(
            F.greatest(
                F.lit(1.0) - 2 * F.abs(v), F.lit(2.3283064365386963e-10)
            )
        )
        / F.lit(float(eps))
    )
    return counts.select(
        *group_cols,
        F.greatest(
            F.round(F.col("__true") + noise, 0).cast("bigint"), F.lit(0)
        ).alias("released_count"),
    )
