"""Named behavior tests for the round-9 audit operators (VERDICT r9 #2)
and the round-10 compaction-marker ordering fix (ADVICE r9).

Each round-9 function gets at least one test that pins BEHAVIOR, not
just oracle parity: dispersion flags a deliberately source-sorted order
and passes a shuffled one; the dataloader assignment covers
shards % workers != 0; taint matches a brute-force per-token recompute
on a literal frame; fingerprints catch a duplicate sequence MANUFACTURED
by packing out of distinct documents; semantic decontam matches a numpy
brute force and honors the zero-norm guard + explicit eval_df.
"""

import hashlib
import math
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _md5_unit(s: str) -> float:
    """Python twin of functions.text.uniform_hash_col."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 4294967296.0


def test_shuffle_dispersion_flags_sorted_order_and_passes_shuffled(spark):
    """A curriculum-sorted 'shuffle' (all of s1, then s2, then s3) must
    show mixing_ratio >> 1; a real seeded shuffle of the same rows must
    land near 1. Integer fields are exact."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        seeded_global_shuffle,
        shuffle_dispersion,
    )

    rows = [(s, i) for s in ("s1", "s2", "s3") for i in range(40)]
    df = spark.createDataFrame(rows, ["source", "seq_id"])

    sorted_pos = df.withColumn(
        "position",
        F.row_number()
        .over(Window.orderBy("source", "seq_id"))
        .cast("long"),
    )
    bad = shuffle_dispersion(sorted_pos).collect()[0]
    assert bad["n_sequences"] == 120
    assert bad["n_adjacent"] == 119
    # only the 2 source boundaries break same-source adjacency
    assert bad["n_same_source"] == 117
    assert bad["expected_rate"] == round(3 * 40 * 39 / (120 * 119), 6)
    assert bad["mixing_ratio"] > 2.5

    good = shuffle_dispersion(
        seeded_global_shuffle(df, ["source", "seq_id"], seed=3)
    ).collect()[0]
    assert good["n_adjacent"] == 119
    assert 0.5 < good["mixing_ratio"] < 1.5
    assert good["mixing_ratio"] < bad["mixing_ratio"]


def test_dataloader_assignment_uneven_shards(spark):
    """37 sequences, shard_size 10 -> shards (10,10,10,7); 3 workers ->
    4 % 3 != 0, so worker 0 carries two shards (17 sequences) and the
    share column reports exactly the imbalance a trainer pads to."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        dataloader_assignment,
        seeded_global_shuffle,
    )

    df = spark.createDataFrame(
        [(f"s{i}", i) for i in range(37)], ["source", "seq_id"]
    )
    sh = seeded_global_shuffle(df, ["source", "seq_id"], seed=1)
    got = {
        r["worker_id"]: (
            r["n_shards"],
            r["n_sequences"],
            r["first_shard"],
            r["last_shard"],
            r["seq_share"],
        )
        for r in dataloader_assignment(
            sh, shard_size=10, num_workers=3
        ).collect()
    }
    assert got == {
        0: (2, 17, 0, 3, round(17 / 37, 6)),
        1: (1, 10, 1, 1, round(10 / 37, 6)),
        2: (1, 10, 2, 2, round(10 / 37, 6)),
    }
    with pytest.raises(ValueError):
        dataloader_assignment(sh, shard_size=10, num_workers=0)


def test_semantic_decontam_eval_df_matches_brute_force(spark):
    """Explicit-benchmark path vs a literal-frame brute force, plus the
    zero-norm guard (ADVICE r9): an all-zero vector neither errors nor
    silently perturbs other rows, on either side of the join."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        semantic_decontam_flags,
    )

    schema = "vec_id bigint, embedding array<double>"
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
            (5, [0.0, 0.0]),  # zero norm: must be guarded out, not NULLed
        ],
        schema,
    )
    bench = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 0.0],)], "embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["n_eval_hits"], r["max_cosine"])
        for r in semantic_decontam_flags(
            df, threshold=0.5, eval_df=bench
        ).collect()
    }
    cos2 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert set(got) == {1, 2}
    assert got[1][0] == 1 and abs(got[1][1] - 1.0) < 1e-9
    assert got[2][0] == 1 and abs(got[2][1] - cos2) < 1e-6


def test_semantic_decontam_split_path_flags_only_train_members(spark):
    """Default (salted-split) path: every flagged id must be a TRAIN
    member under the same md5 assignment, and each flag must agree with
    a python brute force over the split."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        semantic_decontam_flags,
    )

    rows = [(i, [math.cos(i / 7.0), math.sin(i / 7.0)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cut = 0.5
    got = {
        r["vec_id"]: r["n_eval_hits"]
        for r in semantic_decontam_flags(
            df, threshold=0.9, train_cut=cut
        ).collect()
    }
    train = [r for r in rows if _md5_unit(f"holdout:{r[0]}") < cut]
    evals = [r[1] for r in rows if _md5_unit(f"holdout:{r[0]}") >= cut]

    def cos(a, b):
        num = a[0] * b[0] + a[1] * b[1]
        return num / (math.hypot(*a) * math.hypot(*b))

    want = {}
    for i, v in train:
        hits = sum(1 for e in evals if cos(v, e) >= 0.9)
        if hits:
            want[i] = hits
    assert got == want and len(want) > 0


def test_sequence_fingerprints_catch_packing_manufactured_duplicates(spark):
    """Two shards holding DISTINCT documents ('p q'+'r s' vs 'p'+'q r s')
    concatenate to the same token stream; cut at seq_len=2 they emit
    identical sequences — a duplicate doc-level dedup cannot see. The
    digest groups them and keeps the lexicographically-first
    (shard, seq_id) member."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (20, "p q", "src_e"),
            (21, "r s", "src_e"),
            (30, "p", "src_f"),
            (31, "q r s", "src_f"),
            (40, "z z z z", "src_g"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        (r["source"], r["seq_id"]): (
            r["fingerprint"],
            r["n_copies"],
            r["is_kept"],
        )
        for r in sequence_fingerprints(docs, seq_len=2).collect()
    }
    # both shards produced sequences [p,q] and [r,s]
    assert out[("src_e", 0)][0] == out[("src_f", 0)][0]
    assert out[("src_e", 1)][0] == out[("src_f", 1)][0]
    assert out[("src_e", 0)][1] == 2 and out[("src_f", 1)][1] == 2
    # keeper = lexicographically first (shard, seq_id)
    assert out[("src_e", 0)][2] is True and out[("src_f", 0)][2] is False
    assert out[("src_e", 1)][2] is True and out[("src_f", 1)][2] is False
    # src_g: 'z z z z' -> seqs [z,z] and [z,z] — identical sequences
    # manufactured WITHIN one shard by repeated content
    assert out[("src_g", 0)][0] == out[("src_g", 1)][0]
    assert out[("src_g", 0)][2] is True and out[("src_g", 1)][2] is False
    # fingerprints of distinct content differ
    assert out[("src_e", 0)][0] != out[("src_e", 1)][0]


def test_sequence_holdout_taint_matches_per_token_brute_force(spark):
    """Taint audit vs a pure-python per-token recompute: take the real
    BPE token counts, replay pack_sequences placement (per-source doc_id
    order, cut every seq_len tokens), mark each token train/held by the
    md5 split, and compare every output column."""
    from scikit_learn_imputer_spark.functions.bpe import (
        with_bpe_token_counts,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_holdout_taint,
    )

    rows = [
        (i, f"customer order {i} value scan group key row agg", src)
        for i, src in [(n, "a" if n % 2 else "b") for n in range(1, 13)]
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    cut, seq_len = 0.5, 7
    counts = {
        (r["source"], r["doc_id"]): r["n_bpe_tokens"]
        for r in with_bpe_token_counts(docs).collect()
    }

    per_seq: dict[tuple, dict[int, int]] = {}
    for src in ("a", "b"):
        pos = 0
        for did in sorted(d for s, d in counts if s == src):
            n = counts[(src, did)]
            held = _md5_unit(f"holdout:{did}") >= cut
            for t in range(pos, pos + n):
                seq = t // seq_len
                per_seq.setdefault((src, seq), {"n": 0, "held": 0})
                per_seq[(src, seq)]["held"] += int(held)
            pos += n
    want = {}
    for src in ("a", "b"):
        seqs = [v for (s, _), v in per_seq.items() if s == src]
        n_seqs = len(seqs)
        tainted = sum(1 for v in seqs if v["held"] > 0)
        mass = sum(v["held"] for v in seqs)
        want[src] = (n_seqs, tainted, mass, round(tainted / n_seqs, 6))

    got = {
        r["source"]: (
            r["n_seqs"],
            r["n_tainted_seqs"],
            r["heldout_token_mass"],
            r["seq_taint_rate"],
        )
        for r in sequence_holdout_taint(
            docs, seq_len=seq_len, train_cut=cut
        ).collect()
    }
    assert got == want
    # non-vacuous on both sides of the split
    assert any(v[1] > 0 for v in want.values())
    assert any(v[1] < v[0] for v in want.values())


def test_compact_swap_crash_mid_cleanup_leaves_discardable_sibling(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9 (medium): if the process dies mid-rmtree AFTER the
    store overwrite, the sibling must already be marker-less — so the
    next recover_compaction DISCARDS it instead of overwriting the good
    store with a partially-deleted sibling (which would silently shrink
    dedup history)."""
    import shutil

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        compact_fingerprint_store,
        recover_compaction,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id bigint, text string",
    )
    fstore = str(tmp_path / "fstore")
    build_fingerprint_store(docs, fstore)
    want = sorted(
        r["fingerprint"] for r in spark.read.parquet(fstore).collect()
    )

    real_rmtree = shutil.rmtree

    def crash_rmtree(path, *a, **kw):
        raise OSError("simulated crash mid-cleanup")

    monkeypatch.setattr(shutil, "rmtree", crash_rmtree)
    with pytest.raises(OSError, match="simulated crash"):
        compact_fingerprint_store(spark, fstore)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    tmp = fstore + "__compacting"
    assert os.path.isdir(tmp)  # the crash stranded the sibling...
    # ...but the marker was removed FIRST, so recovery discards it
    assert not os.path.isfile(os.path.join(tmp, "_COMPACT_SWAP_OK"))
    assert recover_compaction(spark, fstore) is False
    assert not os.path.exists(tmp)
    got = sorted(
        r["fingerprint"] for r in spark.read.parquet(fstore).collect()
    )
    assert got == want  # the good store was never touched


def test_sequence_dedup_manifest_counts_dropped_mass(spark):
    """Round-10: the action manifest over sequence_fingerprints — the
    same manufactured-duplicate corpus as above, aggregated to the
    per-shard drop/token-mass numbers a shard rewrite would act on."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (20, "p q", "src_e"),
            (21, "r s", "src_e"),
            (30, "p", "src_f"),
            (31, "q r s", "src_f"),
            (40, "z z z z", "src_g"),
        ],
        "doc_id bigint, text string, source string",
    )
    from pyspark.sql import functions as F

    fps = sequence_fingerprints(docs, seq_len=2)
    got = {
        r["source"]: (r["n_seqs"], r["n_dropped"], r["dropped_token_mass"],
                      r["n_unique"])
        for r in fps.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
            F.sum(F.when(F.col("is_kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(~F.col("is_kept"), F.col("n_ids"))), F.lit(0)
            )
            .cast("bigint")
            .alias("dropped_token_mass"),
            F.countDistinct("fingerprint").cast("bigint").alias("n_unique"),
        )
        .collect()
    }
    assert got == {
        "src_e": (2, 0, 0, 2),   # the keepers
        "src_f": (2, 2, 4, 2),   # both sequences are cross-shard dups
        "src_g": (2, 1, 2, 1),   # within-shard manufactured repeat
    }
