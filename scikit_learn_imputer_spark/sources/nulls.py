"""Deterministic null injection for correctness fixtures.

The star-schema testdata has no missing values, but the engine's core queries
are about missingness (FIXTURES.md F5). Nulls are injected with pure modular
arithmetic on the row key so that the Spark plan and the DuckDB oracle SQL
agree bit-for-bit — no engine-specific hash functions involved.

Each rule is (column, key_expr, modulus, remainder): the column is NULLed on
rows where ``key_expr % modulus == remainder``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_RULES: dict[str, list[tuple[str, str, int, int]]] = {
    # ~14% nulls in the continuous col, ~9% in the categorical col — the
    # F1 "territories" shape (mixed-type imputation) at star-schema scale.
    "customer": [
        ("c_acctbal", "c_custkey", 7, 3),
        ("c_mktsegment", "c_custkey", 11, 5),
    ],
    "orders": [
        ("o_totalprice", "o_orderkey", 7, 3),
        ("o_orderpriority", "o_orderkey", 11, 5),
    ],
    # lineitem's composite (orderkey, linenumber) is NOT unique in this
    # corpus (the generator emits ~20% duplicate pairs) — fine for the
    # modular null injection (a pure function of the expression), but do
    # NOT use it as a fill/window ORDER key (round-11 sf1 finding; the
    # ffill_bfill query orders by the unique o_orderkey instead).
    "lineitem": [
        ("l_quantity", "l_orderkey * 10 + l_linenumber", 19, 7),
        ("l_discount", "l_orderkey * 10 + l_linenumber", 23, 11),
    ],
}


def with_nulls(df: DataFrame, table: str) -> DataFrame:
    """Spark side: apply the table's null rules, preserving column order."""
    rules = {c: (k, m, r) for c, k, m, r in NULL_RULES[table]}
    cols = []
    for c in df.columns:
        if c in rules:
            key, mod, rem = rules[c]
            cols.append(
                F.when(F.expr(key) % mod == rem, F.lit(None))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def nulls_cte(table: str) -> str:
    """Oracle side: the same injection as a SELECT over the pre-registered
    DuckDB view of ``table``. ``SELECT * REPLACE`` (DuckDB dialect — the
    oracle's dialect) keeps untouched columns without enumerating the schema.
    Callers interpolate it as ``WITH {table}_nulls AS ({nulls_cte(table)})``.
    """
    cases = ", ".join(
        f"CASE WHEN ({k}) % {m} = {r} THEN NULL ELSE {c} END AS {c}"
        for c, k, m, r in NULL_RULES[table]
    )
    return f"SELECT * REPLACE ({cases}) FROM {table}"
