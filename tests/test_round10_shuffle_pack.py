"""Round-10 operators: shuffle-before-pack and epoch-seed independence
(VERDICT r9 #5/#6). Behavior pinned against pure-python brute forces of
the md5 permutation + concat-and-cut placement."""

import hashlib

import pytest
from pyspark.sql import functions as F


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


def test_pack_mixing_histogram_separates_shuffled_from_curriculum(spark):
    """Naive per-source packing -> every sequence n_sources = 1; the
    shuffled pack -> multi-doc sequences mix sources. Exact counts
    pinned against a brute force of the placement."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_mixing_histogram,
        pack_shuffled_sequences,
    )

    rows = [(i, f"s{i % 4}", "a b c") for i in range(1, 41)]  # 3 tokens each
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    placed = pack_shuffled_sequences(df, seq_len=6, seed=5)
    got = {
        r["n_sources"]: (r["n_sequences"], r["n_docs"])
        for r in pack_mixing_histogram(placed, seq_len=6).collect()
    }
    # brute force from the placement itself
    spans = {}
    for r in placed.collect():
        first, last = r["seq_id"], r["seq_id"] + (r["seq_offset"] + r["n_tokens"] - 1) // 6
        for s in range(first, last + 1):
            spans.setdefault(s, []).append(r["source"])
    want = {}
    for srcs in spans.values():
        k = len(set(srcs))
        n_seq, n_docs = want.get(k, (0, 0))
        want[k] = (n_seq + 1, n_docs + len(srcs))
    assert got == want
    assert any(k > 1 for k in got)  # the shuffle actually mixes
    # curriculum twin: positions in (source, doc_id) order -> no mixing
    # beyond source boundaries; with 40 docs x 3 tokens in 4 sources of
    # 30 tokens each (seq_len 6 divides 30), every sequence is pure
    from pyspark.sql import Window as W

    cur = (
        df.withColumn(
            "position",
            F.row_number().over(W.orderBy("source", "doc_id")).cast("long"),
        )
        .withColumn("n_tokens", F.lit(3).cast("bigint"))
        .withColumn("__cum", (F.col("position") - 1) * 3)
        .select(
            "doc_id",
            "source",
            "position",
            "n_tokens",
            (F.col("__cum") / 6).cast("bigint").alias("seq_id"),
            (F.col("__cum") % 6).cast("bigint").alias("seq_offset"),
            F.lit(False).alias("straddles"),
        )
    )
    pure = {
        r["n_sources"]: r["n_sequences"]
        for r in pack_mixing_histogram(cur, seq_len=6).collect()
    }
    assert pure == {1: 20}


def test_loader_resume_state_mid_stream_and_exhausted(spark):
    from scikit_learn_imputer_spark.operators.shuffle import (
        loader_resume_state,
        seeded_global_shuffle,
    )

    df = spark.createDataFrame(
        [(f"s{i}", i) for i in range(37)], ["source", "seq_id"]
    )
    sh = seeded_global_shuffle(df, ["source", "seq_id"], seed=1)
    # shards: 0..3 with (10,10,10,7) sequences; workers: w0 {0,3}=17,
    # w1 {1}=10, w2 {2}=10 (positions are contiguous ranges per shard)
    got = {
        r["worker_id"]: (
            r["consumed"],
            r["resume_shard"],
            r["resume_offset"],
            r["resume_position"],
            r["exhausted"],
        )
        for r in loader_resume_state(
            sh, shard_size=10, num_workers=3, global_step=12
        ).collect()
    }
    assert got == {
        0: (12, 3, 2, 33, False),   # into shard 3 (positions 31-37)
        1: (10, -1, -1, -1, True),  # ran dry at its 10
        2: (10, -1, -1, -1, True),
    }
    fresh = {
        r["worker_id"]: (r["consumed"], r["resume_shard"], r["resume_offset"])
        for r in loader_resume_state(
            sh, shard_size=10, num_workers=3, global_step=0
        ).collect()
    }
    assert fresh == {0: (0, 0, 0), 1: (0, 1, 0), 2: (0, 2, 0)}
    with pytest.raises(ValueError):
        loader_resume_state(sh, 10, 3, -1)
    with pytest.raises(ValueError):
        loader_resume_state(sh, 10, 0, 1)


def test_epoch_source_fairness_flags_front_loaded_source(spark):
    """Fairness ratios from real epoch shuffles match a python brute
    force and hover near 1; a hand-built front-loaded 'permutation'
    (one source occupying positions 1..n) reads ratio << 1 for it."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        epoch_source_fairness,
    )

    n = 120
    rows = [(i, f"s{i % 3}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {
        (r["epoch"], r["source"]): (r["n_docs"], r["sum_pos"], r["fairness_ratio"])
        for r in epoch_source_fairness(
            df, ["doc_id"], base_seed=100, epochs=2
        ).collect()
    }
    assert len(got) == 6
    for e in (0, 1):
        order = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"{100 + e}:{r[0]}".encode()).hexdigest(),
                r[0],
            ),
        )
        sums = {}
        for pos, (_, src) in enumerate(order, start=1):
            sums[src] = sums.get(src, 0) + pos
        for src in ("s0", "s1", "s2"):
            nd, sp, fr = got[(e, src)]
            assert nd == 40 and sp == sums[src]
            want = 2.0 * sp / (40 * (n + 1))
            assert abs(fr - want) < 1e-6
            assert 0.7 < fr < 1.3  # a real shuffle is near-fair
    # totality: each epoch's positions sum to n(n+1)/2
    for e in (0, 1):
        assert sum(got[(e, s)][1] for s in ("s0", "s1", "s2")) == n * (n + 1) // 2


def test_mixture_shuffled_pack_audit_shares(spark, sf_smoke):
    """The end-to-end audit's internal consistency on real testdata:
    shares sum to 1, achieved tracks target within the Bernoulli noise
    of the sample, straddles/touched are sane."""
    from scikit_learn_imputer_spark.plans.queries import QUERIES

    rows = QUERIES["mixture_shuffled_pack_audit"](spark, sf_smoke).collect()
    assert len(rows) > 1
    ach = sum(r["achieved_share"] for r in rows)
    tgt = sum(r["target_share"] for r in rows)
    # achieved shares are over KEPT tokens -> sum to 1 exactly; target
    # shares cover ALL corpus sources, so the reported (surviving-
    # source) rows can sum slightly below 1 when a source drew zero
    # Bernoulli keeps
    assert abs(ach - 1.0) < 1e-4
    assert 0.85 < tgt <= 1.0001
    for r in rows:
        assert r["kept_docs"] > 0 and r["kept_tokens"] > 0
        assert 0 <= r["n_straddles"] <= r["kept_docs"]
        assert r["n_seqs_touched"] >= 1
        # budget 5000 tokens over the sf0.001 corpus: the sampler evens
        # shares hard; packed stream must not drift grossly from target
        assert abs(r["achieved_share"] - r["target_share"]) < 0.25


def _brute_spans(rows, seed, seq_len):
    """Python twin of shuffled_sequence_doc_spans: rows = [(id, src, n)].
    Returns {seq_id: (n_docs, n_sources, spans_str)}."""
    order = sorted(
        rows, key=lambda r: (hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(), r[0])
    )
    per_seq = {}
    cum = 0
    for did, src, n in order:
        if n > 0:
            for sq in range(cum // seq_len, (cum + n - 1) // seq_len + 1):
                g_start = max(sq * seq_len, cum)
                g_end = min((sq + 1) * seq_len, cum + n)
                per_seq.setdefault(sq, []).append(
                    (g_start, src, f"{did}:{g_start - sq * seq_len}:{g_end - g_start}")
                )
        cum += n
    return {
        sq: (
            len(items),
            len({s for _, s, _ in items}),
            " ".join(sp for _, _, sp in sorted(items)),
        )
        for sq, items in per_seq.items()
    }


def test_shuffled_sequence_doc_spans_matches_brute_force(spark):
    """VERDICT r10 #3 done-condition: spans pinned against a python
    brute force of the md5 permutation + concat-and-cut placement,
    including zero-token docs (no span) and multi-sequence straddlers."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffled_sequence_doc_spans,
    )

    # i % 7 == 0 -> empty text (zero tokens, must occupy no span);
    # i % 11 == 0 -> long doc (straddles several 7-token sequences)
    def n_tok(i):
        return 0 if i % 7 == 0 else (23 if i % 11 == 0 else i % 5 + 1)

    rows = [
        (i, f"s{i % 3}", "tok " * n_tok(i) if n_tok(i) else "  ")
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {
        r["seq_id"]: (r["n_docs"], r["n_sources"], r["spans"])
        for r in shuffled_sequence_doc_spans(df, seq_len=7, seed=7).collect()
    }
    want = _brute_spans([(i, f"s{i % 3}", n_tok(i)) for i in range(1, 61)], 7, 7)
    assert got == want
    # span lengths tile each sequence exactly (full seq_len except the tail)
    total = sum(n_tok(i) for i in range(1, 61))
    for sq, (_, _, spans) in got.items():
        lens = [int(p.split(":")[2]) for p in spans.split(" ")]
        starts = [int(p.split(":")[1]) for p in spans.split(" ")]
        assert starts[0] == 0 or sq == min(got)  # interior seqs start at 0
        expect = 7 if sq < total // 7 else total % 7
        assert sum(lens) == expect
    # partitioning-independence (same bucketed placement contract)
    again = {
        r["seq_id"]: (r["n_docs"], r["n_sources"], r["spans"])
        for r in shuffled_sequence_doc_spans(
            df.repartition(16), seq_len=7, seed=7, bucket_chars=1
        ).collect()
    }
    assert again == got
    # the shuffle mixes sources at span granularity: some sequence holds
    # docs from >1 source
    assert max(ns for _, ns, _ in got.values()) > 1


def test_shuffled_cu_seqlens_matches_spans(spark):
    """cu_seqlens is the boundary-vector packaging of the spans
    manifest: 0 followed by each span's in-sequence end, strictly
    increasing, last == seq_total, n_docs+1 entries — and identical
    under repartitioning (same bucketed placement contract)."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffled_cu_seqlens,
        shuffled_sequence_doc_spans,
    )

    def n_tok(i):
        return 0 if i % 7 == 0 else (23 if i % 11 == 0 else i % 5 + 1)

    rows = [
        (i, f"s{i % 3}", "tok " * n_tok(i) if n_tok(i) else "  ")
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    cu = {r["seq_id"]: r for r in shuffled_cu_seqlens(df, seq_len=7, seed=7).collect()}
    spans = {
        r["seq_id"]: r
        for r in shuffled_sequence_doc_spans(df, seq_len=7, seed=7).collect()
    }
    assert set(cu) == set(spans)
    total = sum(n_tok(i) for i in range(1, 61))
    for sq, r in cu.items():
        vals = [int(x) for x in r["cu_seqlens"].split(" ")]
        assert vals[0] == 0
        assert all(a < b for a, b in zip(vals, vals[1:]))
        expect_total = 7 if sq < total // 7 else total % 7
        assert vals[-1] == r["seq_total"] == expect_total
        assert r["n_docs"] == len(vals) - 1 == spans[sq]["n_docs"]
        parts = spans[sq]["spans"].split(" ")
        starts = [int(p.split(":")[1]) for p in parts]
        lens = [int(p.split(":")[2]) for p in parts]
        assert vals == [0] + [s + ln for s, ln in zip(starts, lens)]
    again = {
        r["seq_id"]: (r["n_docs"], r["seq_total"], r["cu_seqlens"])
        for r in shuffled_cu_seqlens(
            df.repartition(16), seq_len=7, seed=7, bucket_chars=1
        ).collect()
    }
    assert again == {
        sq: (r["n_docs"], r["seq_total"], r["cu_seqlens"]) for sq, r in cu.items()
    }


def test_shard_source_mix_conserves_token_mass(spark):
    """Per-shard shares sum to 1, total token mass equals the corpus
    token count, and the per-source totals match the corpus per-source
    counts (the shuffle moves mass between shards, never creates it)."""
    from scikit_learn_imputer_spark.operators.shuffle import shard_source_mix

    def n_tok(i):
        return 0 if i % 7 == 0 else (23 if i % 11 == 0 else i % 5 + 1)

    rows = [
        (i, f"s{i % 3}", "tok " * n_tok(i) if n_tok(i) else "  ")
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = shard_source_mix(df, seq_len=7, shard_size=4, seed=7).collect()
    total = sum(n_tok(i) for i in range(1, 61))
    assert sum(r["n_tokens"] for r in got) == total
    per_src = {}
    per_shard = {}
    for r in got:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n_tokens"]
        per_shard.setdefault(r["shard_id"], 0.0)
        per_shard[r["shard_id"]] += r["token_share"]
    want_src = {}
    for i in range(1, 61):
        want_src[f"s{i % 3}"] = want_src.get(f"s{i % 3}", 0) + n_tok(i)
    want_src = {k: v for k, v in want_src.items() if v > 0}
    assert per_src == want_src
    for sh, s in per_shard.items():
        assert abs(s - 1.0) < 1e-5, (sh, s)
    with pytest.raises(ValueError):
        shard_source_mix(df, seq_len=7, shard_size=0, seed=7)


def test_shuffled_repack_delta_formula_matches_stream_diff(spark, tmp_path):
    """The unchanged-sequence count equals the python prefix-run of the
    two shuffled token streams: chunk both snapshots' (doc, token)
    streams into 512-token sequences and count leading equal pairs —
    exactly the sequences a rewrite job may skip."""
    import pyspark.sql.functions as SF

    from scikit_learn_imputer_spark.plans.queries import QUERIES

    rows = [
        (i, f"s{i % 3}", ("t%d " % i) * ((i * 7) % 60 + 1)) for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
    got = QUERIES["shuffled_repack_delta"](spark, sf_dir).collect()[0]

    def n_tok(i):
        return (i * 7) % 60 + 1

    def member_b(i):
        return hashlib.md5(f"takedown:{i}".encode()).hexdigest()[0] != "0"

    def stream(ids):
        order = sorted(ids, key=lambda i: (hashlib.md5(f"7:{i}".encode()).hexdigest(), i))
        return [(i, j) for i in order for j in range(n_tok(i))]

    a_ids = [i for i in range(1, 201) if i % 7 != 0]
    b_ids = [i for i in range(1, 201) if member_b(i)]
    assert set(a_ids) != set(b_ids)  # the delta is non-trivial
    sa, sb = stream(a_ids), stream(b_ids)
    seqs_a = [tuple(sa[k : k + 512]) for k in range(0, len(sa), 512)]
    seqs_b = [tuple(sb[k : k + 512]) for k in range(0, len(sb), 512)]
    run = 0
    for x, y in zip(seqs_a, seqs_b):
        if x != y:
            break
        run += 1
    assert got["n_seqs_before"] == len(seqs_a)
    assert got["n_seqs_after"] == len(seqs_b)
    assert got["n_seqs_unchanged"] == run
    assert got["n_seqs_rewritten"] == len(seqs_b) - run
