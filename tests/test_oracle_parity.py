"""In-repo replica of the driver's correctness gate: run every registered
Spark query AND its DuckDB oracle on the same parquet tables, compare
row-count + schema-shape + order-insensitive values.

Runs at sf0.001 for speed (the driver runs sf0.01); any mismatch here would
fail the driver's CORRECTNESS check too.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from scikit_learn_imputer_spark.plans.queries import ORACLE, QUERIES
from scikit_learn_imputer_spark.sources.tables import TABLES


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, then sort rows — order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [c for c in sorted(columns)], out


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_smoke, name):
    sdf = QUERIES[name](spark, sf_smoke)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_smoke)
    res = con.execute(ORACLE[name])
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    s_colnames, s_norm = normalize(s_rows, s_cols)
    d_colnames, d_norm = normalize(d_rows, d_cols)

    assert s_colnames == d_colnames, f"{name}: column names differ"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs oracle {len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if not _rows_equal(a, b)
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"
    )


#: DuckDB result types that serialize identically to a Spark column type.
#: Anything outside this set (HUGEINT, UINTEGER, DECIMAL, lists, structs)
#: can pass the value-level compare below while failing the driver's
#: *typed* hash — see round-4 VERDICT #3 (token_budget_sample HUGEINT).
PORTABLE_DUCK_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_result_types_portable(sf_smoke, name):
    """Every oracle column must land in the portable type set so the
    driver's typed value-hash can't diverge from Spark on type alone."""
    con = duck_con(sf_smoke)
    rel = con.sql(f"SELECT * FROM ({ORACLE[name]}) __q LIMIT 0")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in PORTABLE_DUCK_TYPES
    ]
    assert not bad, (
        f"{name}: non-portable oracle result types {bad}; cast them in the "
        f"oracle SQL (Spark side must match)"
    )


def test_every_query_oracled_or_anchored():
    """Registry invariant (VERDICT r4 #6): every registered query has a
    DuckDB oracle or names an in-repo anchor test, and every named anchor
    resolves to a real test function — no driver-invisible queries, no
    rotted anchor names."""
    import os
    import re

    from scikit_learn_imputer_spark.plans.queries import ANCHORS

    unanchored = set(QUERIES) - set(ORACLE) - set(ANCHORS)
    assert not unanchored, sorted(unanchored)
    assert not set(ANCHORS) & set(ORACLE), "anchor on an oracled query"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, anchor in ANCHORS.items():
        path, _, testname = anchor.partition("::")
        full = os.path.join(repo, path)
        assert os.path.exists(full), f"{name}: anchor file {path} missing"
        src = open(full).read()
        assert re.search(rf"^def {re.escape(testname)}\b", src, re.M), (
            f"{name}: anchor test {anchor} not found"
        )


def _rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def test_all_queries_return_rows(spark, sf_smoke):
    """Every registered query (oracled or not) must run and be non-empty —
    except pair-finding queries that may legitimately be empty at tiny SF."""
    may_be_empty = {
        "ngram_jaccard_pairs",
        "embedding_near_pairs",
        "embedding_near_pairs_blas",
        "minhash_candidates",
        # Hamming<=3 dHash pairs need near-identical docs; the corpus
        # plants its first exact-dup text groups at sf0.1 (8 pairs there,
        # verified against the oracle), none below.
        "image_near_pairs",
    }
    for name, fn in QUERIES.items():
        if name == "spark_imputer_e2e":
            continue  # exercised in test_imputer.py end-to-end
        df = fn(spark, sf_smoke)
        n = df.count()
        if name not in may_be_empty:
            assert n > 0, f"{name} returned 0 rows"


#: Queries with external state (temp paths, persisted indexes/stores),
#: seeded randomness, or caching — the ones a re-run could plausibly
#: change. The driver may execute the registry any number of times in
#: one session; results must be bit-stable.
RERUN_SENSITIVE = [
    "csv_roundtrip",
    "orc_roundtrip",
    "sorted_layout_scan",
    "zorder_layout_scan",
    "incremental_dedup_batch",
    "incremental_pack_batch",
    "schema_evolution_scan",
    "split_modulo",
    "quality_weighted_sample",
    "stratified_sample",
    "cosine_topk_lsh",
    "embedding_near_pairs_brp",
    "near_pairs_cells",
    "minhash_candidates",
    "simhash_near_pairs_md5",
    "ann_ivf_topk",
    "ann_ivf_persisted_topk",
    "group_split",
]


@pytest.mark.parametrize("name", RERUN_SENSITIVE)
def test_rerun_is_deterministic(spark, sf_smoke, name):
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    def snap():
        df = QUERIES[name](spark, sf_smoke)
        cols = sorted(df.columns)
        return sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )

    first = snap()
    second = snap()
    assert first == second, f"{name}: results changed across re-runs"
    assert len(first) > 0, f"{name}: vacuous (0 rows)"


def test_register_rejects_duplicate_query_names():
    """A silent dict overwrite leaves the earlier registration dead while
    its tests keep passing against the later one (the round-5
    user_sessions_native shadowing bug) — duplicates must raise."""
    import pytest as _pytest

    from scikit_learn_imputer_spark.plans.queries import QUERIES, register

    before = dict(QUERIES)
    with _pytest.raises(ValueError, match="already registered"):
        register("missing_metrics", oracle="SELECT 1")
    assert QUERIES == before


def test_docs_carry_current_registry_counts():
    """VERDICT r5 #4: README/COVERAGE 'Correctness' counts must track the
    registry — stale numbers misreport the verified surface."""
    import os

    from scikit_learn_imputer_spark.plans.queries import ANCHORS, ORACLE, QUERIES

    root = os.path.join(os.path.dirname(__file__), "..")
    claim = f"{len(ORACLE)} of {len(QUERIES)} queries"
    readme = open(os.path.join(root, "README.md")).read()
    assert claim in readme, f"README Correctness section out of date: want {claim!r}"
    assert f"The {len(ANCHORS)} rows-only entries" in readme
    cov = open(os.path.join(root, "COVERAGE.md")).read()
    assert f"{len(QUERIES)} registered queries, {len(ORACLE)} DuckDB-oracled" in cov
