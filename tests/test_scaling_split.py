"""Scaling-law subset manifests and holdout-leakage audit semantics.

Value-vs-DuckDB checks live in test_oracle_parity.py; these pin the
operator INVARIANTS: subset nesting, full-fraction identity, grid
completeness, and leakage-rate bounds.
"""

from collections import defaultdict

from scikit_learn_imputer_spark.plans.queries import QUERIES
from scikit_learn_imputer_spark.sources.tables import load_table


def test_scaling_subsets_nested_and_complete(spark, sf_smoke):
    rows = QUERIES["scaling_law_subsets"](spark, sf_smoke).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    docs = load_table(spark, sf_smoke, "documents")
    n_sources = docs.select("source").distinct().count()
    # complete frac × source grid, zero rows included
    assert len(rows) == 4 * n_sources
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["frac"])
        assert [r["frac"] for r in rs] == [0.1, 0.25, 0.5, 1.0]
        # NESTED: monotone doc and token mass in the fraction
        for a, b in zip(rs, rs[1:]):
            assert a["n_docs"] <= b["n_docs"]
            assert a["n_tokens"] <= b["n_tokens"]
        # frac=1.0 is the whole source, so token_frac is exactly 1
        assert rs[-1]["token_frac"] == 1.0 or rs[-1]["n_tokens"] == 0
    # frac=1.0 doc counts reconcile with the raw table
    raw = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    for src, rs in by_src.items():
        assert max(r["n_docs"] for r in rs) == raw[src]


def test_split_leakage_bounds_and_splits(spark, sf_smoke):
    rows = QUERIES["split_leakage_audit"](spark, sf_smoke).collect()
    got = {r["split"]: r for r in rows}
    assert set(got) <= {"val", "test"}
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_docs"]
        assert abs(r["leak_rate"] - round(r["n_leaked"] / r["n_docs"], 6)) < 1e-9
