"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
north-star extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB twins with identical column names/rounding;
entries absent here get the driver's weaker rows-only check (documented in
the query docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the missing_metrics report
    (the reference's most query-shaped operator, SURVEY.md M1) over the
    null-injected customer table."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    return QUERIES["missing_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from scikit_learn_imputer_spark.plans.queries import ORACLE

    return dict(ORACLE)
