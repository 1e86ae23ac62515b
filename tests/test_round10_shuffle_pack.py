"""Round-10 operators: shuffle-before-pack and epoch-seed independence
(VERDICT r9 #5/#6). Behavior pinned against pure-python brute forces of
the md5 permutation + concat-and-cut placement."""

import hashlib

import pytest


def _brute_place(rows, seed, seq_len):
    """Python twin of pack_shuffled_sequences: rows = [(id, src, n)]."""
    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(), r[0])
    )
    out, cum = {}, 0
    for pos, (did, src, n) in enumerate(order, start=1):
        out[did] = (
            src,
            pos,
            n,
            cum // seq_len,
            cum % seq_len,
            (cum % seq_len + n) > seq_len,
        )
        cum += n
    return out


def test_pack_shuffled_sequences_matches_brute_force(spark):
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    rows = [(i, f"s{i % 3}", "tok " * (i % 5 + 1)) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {
        r["doc_id"]: (
            r["source"],
            r["position"],
            r["n_tokens"],
            r["seq_id"],
            r["seq_offset"],
            r["straddles"],
        )
        for r in pack_shuffled_sequences(df, seq_len=7, seed=7).collect()
    }
    want = _brute_place([(i, s, i % 5 + 1) for i, s, _ in rows], 7, 7)
    assert got == want
    # invariant across partitionings and bucket widths
    for parts, chars in ((16, 1), (4, 3)):
        again = {
            r["doc_id"]: (
                r["source"],
                r["position"],
                r["n_tokens"],
                r["seq_id"],
                r["seq_offset"],
                r["straddles"],
            )
            for r in pack_shuffled_sequences(
                df.repartition(parts), seq_len=7, seed=7, bucket_chars=chars
            ).collect()
        }
        assert again == got
    # a different seed moves placements
    other = {
        r["doc_id"]: r["position"]
        for r in pack_shuffled_sequences(df, seq_len=7, seed=8).collect()
    }
    assert other != {k: v[1] for k, v in got.items()}
    with pytest.raises(ValueError):
        pack_shuffled_sequences(df, seq_len=0)
    # precomputed token-count column path
    df2 = df.selectExpr("doc_id", "source", "doc_id % 5 + 1 AS n_custom")
    custom = pack_shuffled_sequences(
        df2, seq_len=7, seed=7, token_count_col="n_custom"
    ).collect()
    assert {r["doc_id"]: r["n_tokens"] for r in custom} == {
        i: i % 5 + 1 for i in range(1, 61)
    }


def test_pack_shuffled_sequences_disperses_sources(spark):
    """The point of shuffle-before-pack: the doc order feeding the cut is
    mixed (ratio ~ 1), where pack_sequences' per-source id order would
    read as pure curriculum (ratio ~ #sources)."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
        shuffle_dispersion,
    )

    rows = [(i, f"s{i % 4}", "a b c") for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    placed = pack_shuffled_sequences(df, seq_len=16, seed=5)
    r = shuffle_dispersion(placed).collect()[0]
    assert r["n_sequences"] == 200
    assert 0.5 < r["mixing_ratio"] < 1.5


def test_epoch_seed_independence_matches_brute_force(spark):
    from scikit_learn_imputer_spark.operators.shuffle import (
        epoch_seed_independence,
    )

    n = 200
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")

    def perm(seed):
        order = sorted(
            range(n),
            key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i),
        )
        return {did: pos for pos, did in enumerate(order, start=1)}

    pa, pb = perm(11), perm(12)
    sum_d2 = sum((pa[i] - pb[i]) ** 2 for i in range(n))
    rho = 1.0 - 6.0 * sum_d2 / (n * (n * n - 1.0))

    got = epoch_seed_independence(df, ["doc_id"], seed_a=11, seed_b=12).collect()[0]
    assert got["n_items"] == n
    assert got["sum_d2"] == sum_d2
    assert abs(got["spearman_rho"] - rho) < 1e-6
    assert got["perm_a_total"] is True and got["perm_b_total"] is True
    # independent seeds decorrelate
    assert abs(got["spearman_rho"]) < 0.3
    # same seed = perfectly correlated epochs (the failure this audit
    # exists to catch)
    same = epoch_seed_independence(df, ["doc_id"], seed_a=11, seed_b=11).collect()[0]
    assert same["sum_d2"] == 0 and same["spearman_rho"] == 1.0


def test_pack_sequences_id_bucket_width_is_byte_identical(spark, sf_correct):
    """VERDICT r9 #8: the two-level (shard, id-bucket) prefix sum is a
    physical re-plan only — placement equal to the single per-shard
    window on the full sf0.01 documents table, and on a literal frame
    with sparse/clustered ids (buckets of unequal mass, empty buckets)."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents")

    def key(df):
        return {
            r["doc_id"]: (r["source"], r["n_tokens"], r["seq_id"],
                          r["seq_offset"], r["straddles"])
            for r in df.collect()
        }

    base = key(pack_sequences(docs, seq_len=512))
    assert key(pack_sequences(docs, seq_len=512, id_bucket_width=1000)) == base
    assert key(pack_sequences(docs, seq_len=512, id_bucket_width=7)) == base

    sparse = spark.createDataFrame(
        [(i, "s", "x " * (i % 4 + 1)) for i in (1, 2, 900, 901, 5000, 5001)],
        "doc_id bigint, source string, text string",
    )
    assert key(pack_sequences(sparse, seq_len=5, id_bucket_width=10)) == key(
        pack_sequences(sparse, seq_len=5)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(sparse, seq_len=5, id_bucket_width=0)
