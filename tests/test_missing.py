"""Golden-frame tests for missingness operators — the reference's own unit
fixtures (FIXTURES.md F4, reference tests.py:116-168)."""

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scikit_learn_imputer_spark.operators.missing import (
    missing_indicator,
    missing_metrics,
)

SCHEMA_AB = StructType(
    [
        StructField("id", LongType(), False),
        StructField("a", StringType(), True),
        StructField("b", DoubleType(), True),
    ]
)


def test_missing_indicator_golden(spark):
    df = spark.createDataFrame(
        [(0, "A", 1.0), (1, None, None), (2, "B", 2.0)], SCHEMA_AB
    )
    out = missing_indicator(df, ["a", "b"], keep=["id"])
    rows = {r["id"]: (r["a_flag"], r["b_flag"]) for r in out.collect()}
    assert rows == {0: (False, False), 1: (True, True), 2: (False, False)}


def test_missing_indicator_nondefault_ids(spark):
    """Reference tests.py:139-151: flags must be joinable on non-0..n ids —
    catches positional-vs-key bugs."""
    df = spark.createDataFrame(
        [(101, "A", 1.0), (102, None, 2.0), (103, "B", None)], SCHEMA_AB
    )
    out = missing_indicator(df, ["a", "b"], keep=["id"])
    joined = df.join(out, on="id").collect()
    assert len(joined) == 3
    by_id = {r["id"]: r for r in joined}
    assert by_id[102]["a_flag"] is True and by_id[102]["b_flag"] is False
    assert by_id[103]["b_flag"] is True


def test_missing_metrics_golden(spark):
    """Reference tests.py:160-168: expected (variable, observed, missing,
    total, imputation_rate) = ('a',3,1,4,0.25), ('b',2,2,4,0.5)."""
    df = spark.createDataFrame(
        [(0, "A", 1.0), (1, None, None), (2, "B", None), (3, "C", 4.0)],
        SCHEMA_AB,
    )
    out = missing_metrics(df, ["a", "b"])
    rows = {
        r["variable"]: (r["observed"], r["missing"], r["total"], r["imputation_rate"])
        for r in out.collect()
    }
    assert rows == {"a": (3, 1, 4, 0.25), "b": (2, 2, 4, 0.5)}
