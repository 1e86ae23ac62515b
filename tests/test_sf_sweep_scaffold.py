"""The sf-sweep oracle scaffolds must be EXACT rewrites: the chunked
per-word-bucket BPE encode (tools/sf_oracle_sweep.py) has to reproduce
the in-query recursive encode bit-for-bit, else the sweep would compare
Spark against a different oracle than the driver does."""

from __future__ import annotations

import duckdb
import pytest


@pytest.mark.parametrize("name", ["training_loader_funnel",
                                  "funnel_budget_sweep"])
def test_chunked_bpe_oracle_equals_unchunked(sf_smoke, name):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from sf_oracle_sweep import _build_ewids, _chunked_bpe_rewrite

    from scikit_learn_imputer_spark.plans.queries import ORACLE

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/{t}.parquet')"
        )
    plain = con.execute(ORACLE[name]).fetchall()
    _build_ewids(con, sf_smoke, n_buckets=4)
    chunked = con.execute(_chunked_bpe_rewrite(ORACLE[name])).fetchall()
    assert chunked == plain


def test_chunked_rewrite_fails_loudly_on_drift():
    """If the registered oracle no longer embeds the exact
    _bpe_encode_ctes() expansion, the rewrite must refuse (silently
    running the un-rewritten OOM form would be worse)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from sf_oracle_sweep import _chunked_bpe_rewrite

    with pytest.raises(AssertionError, match="drifted"):
        _chunked_bpe_rewrite("SELECT 1")


def test_same_rejects_column_count_drift():
    """r13 review: a trailing extra column on one side must never
    compare as MATCH (zip truncates silently)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from sf_oracle_sweep import _same

    assert _same([(1, 2)], [(1, 2)])
    assert not _same([(1, 2)], [(1, 2, 3)])
    assert not _same([(1, 2, 3)], [(1, 2)])
