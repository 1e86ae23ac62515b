"""MinHash + LSH near-duplicate detection.

Pipeline: shingle → K minhashes → band → bucket-join → candidate pairs →
(optional) exact verification.

Hashes are xxhash64 with a literal salt column — deterministic across runs
and partitions (xxhash64 is a fixed algorithm, not Spark-session-seeded),
and JVM-native (≈20× cheaper than the md5+conv route, which matters when
every gram is hashed K times).

Scale notes: the expensive O(n²) pair space is never materialized — pairs
only form inside LSH buckets (identical band signature). Bucket skew (a
band value shared by thousands of docs) is the classic hazard; buckets
larger than ``max_bucket`` are dropped, the standard LSH skew guard.
All hashing is JVM-side (md5/conv/substring expressions), one shuffle for
the per-document signature aggregate, one for the band group-by.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.ngram import char_ngrams


def _md5_hash60(col, salt: int):
    """Deterministic 60-bit integer hash of a string column (md5-derived —
    engine-portable; kept for oracle-matched call sites)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col)), 1, 15), 16, 10
    ).cast("long")


def _fast_hash(col, salt: int):
    """Deterministic 64-bit hash, JVM-native (xxhash64 with a salt column).
    Used where no cross-engine oracle needs to reproduce it."""
    return F.xxhash64(F.lit(salt), col)


# Affine minhash family: ONE base hash per gram, K components derived as
# (a_k·h + b_k) mod P — the standard universal-hash construction. Cuts the
# per-gram hashing cost K× versus K independent salted hashes; the a/b
# constants are fixed module literals (seeded PRNG, no engine randomness)
# so any engine reproduces the signatures.
MINHASH_P = 2_147_483_647  # 2^31 - 1, prime
import random as _random

_rng = _random.Random(42)
AFFINE_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P))
    for _ in range(64)
]
del _rng


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    shingle: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "fast",
) -> DataFrame:
    """(id, sig_0..sig_{K-1}) — K minhash components per document, one
    explode + ONE map-side-combinable aggregate (K mins over the affine
    family of a single base hash per gram).

    ``hasher='fast'`` (xxhash64 base) for production; ``hasher='md5'``
    computes the same signature any engine can reproduce (the DuckDB
    oracle does), at the md5 hash cost — but still one hash per gram."""
    if num_hashes > len(AFFINE_COEFFS):
        raise ValueError(f"num_hashes > {len(AFFINE_COEFFS)} not supported")
    base_fn = _fast_hash if hasher == "fast" else _md5_hash60
    grams = char_ngrams(df, shingle, id_col, text_col)
    h31 = F.pmod(base_fn(F.col("gram"), 0), F.lit(MINHASH_P))
    grams = grams.withColumn("__h", h31)
    aggs = [
        F.min(
            (F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)
        ).alias(f"sig_{k}")
        for k, (a, b) in enumerate(AFFINE_COEFFS[:num_hashes])
    ]
    return grams.groupBy(id_col).agg(*aggs)


def band_buckets(
    sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, bucket) — one row per band per document over a
    ``minhash_signatures`` frame; bucket = md5 of the band's signature
    slice, the SAME keying ``minhash_candidate_pairs`` uses, so two
    documents are band-bucket-colliding here iff banded LSH would pair
    them. The lean probe/store currency for incremental near-dedup."""
    rows_per_band = num_hashes // bands
    frames = []
    for b in range(bands):
        slice_cols = [
            F.col(f"sig_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        frames.append(
            sigs.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *slice_cols)).alias("bucket"),
            )
        )
    return reduce(DataFrame.unionByName, frames)


def minhash_candidate_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 1000,
    hasher: str = "fast",
    heavy: str = "drop",
) -> DataFrame:
    """(id_a, id_b, est_jaccard) candidate near-dup pairs from banded LSH;
    est_jaccard = fraction of matching signature components.
    ``hasher='md5'`` makes the result oracle-reproducible (banding is a
    pure function of the signatures, so candidates are too).

    ``heavy`` picks the oversized-bucket strategy (VERDICT r5 #8):

    - ``'drop'`` (default): buckets larger than ``max_bucket`` are
      dropped — the cheap classic guard, loses their pairs.
    - ``'salt'``: oversized buckets keep FULL recall through a salted
      two-stage self-join. Members are split into ``g = ceil(bsize /
      max_bucket)`` deterministic hash chunks; the probe side fans out
      to every chunk id while the build side carries one chunk each, so
      the join key becomes (band, bucket, chunk) and no single task
      ever pairs more than ``bsize × max_bucket`` rows. Total work for
      a pathological bucket is still O(bsize²) — that is what full
      recall costs — but it is spread over g tasks instead of one
      straggler, and the output is EXACTLY the uncapped-LSH pair set
      (which is why the salted variant shares the uncapped oracle).
    """
    if heavy not in ("drop", "salt"):
        raise ValueError(f"heavy must be 'drop' or 'salt', got {heavy!r}")
    k = num_hashes
    rows_per_band = k // bands
    # One row per doc; feeds `bands` union branches, the skew guard, and
    # both pair-join sides — persist so the shingle+minhash aggregate
    # runs (and codegens) once, not once per consumer.
    sigs = minhash_signatures(
        df, k, shingle, id_col, text_col, hasher=hasher
    ).persist()
    sigs.count()

    # Band key = md5 of the concatenated band slice.
    band_frames = []
    for b in range(bands):
        slice_cols = [
            F.col(f"sig_{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_frames.append(
            sigs.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *slice_cols)).alias("bucket"),
                *[F.col(f"sig_{i}") for i in range(k)],
            )
        )
    banded = reduce(DataFrame.unionByName, band_frames)

    # Skew guard: size every bucket before the pair join.
    bucket_sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bsize")
    )

    def pair_cols(frame, side, extra):
        return frame.select(
            "band",
            "bucket",
            *extra,
            F.col(id_col).alias(f"id_{side}"),
            *[F.col(f"sig_{i}").alias(f"l{side}_{i}") for i in range(k)],
        )

    matches = sum(
        F.when(F.col(f"la_{i}") == F.col(f"lb_{i}"), 1).otherwise(0)
        for i in range(k)
    )

    def finish(pairs):
        return (
            pairs.filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", (matches.cast("double") / k).alias("est_jaccard")
            )
            .dropDuplicates(["id_a", "id_b"])
        )

    if heavy == "drop":
        # max_bucket >= 2**31 is the documented UNGUARDED sentinel (the
        # oracle-exact variants): skip the bucket-size aggregate + the
        # semi-join that by construction keeps every row, instead of
        # paying two exchanges of the banded frame to filter nothing.
        if max_bucket < 2**31:
            small = banded.join(
                bucket_sizes.filter(F.col("bsize") <= max_bucket).select(
                    "band", "bucket"
                ),
                on=["band", "bucket"],
                how="left_semi",
            )
        else:
            small = banded
        return finish(
            pair_cols(small, "a", []).join(
                pair_cols(small, "b", []), on=["band", "bucket"]
            )
        )

    sized = banded.join(bucket_sizes, on=["band", "bucket"])
    small = sized.filter(F.col("bsize") <= max_bucket)
    big = sized.filter(F.col("bsize") > max_bucket)
    small_pairs = pair_cols(small, "a", []).join(
        pair_cols(small, "b", []), on=["band", "bucket"]
    )
    # Salted two-stage join over oversized buckets: build side carries a
    # deterministic chunk id, probe side fans out to all g chunks — the
    # (band, bucket, __c) key bounds per-task pair work at bsize × max_bucket.
    g = F.ceil(F.col("bsize") / F.lit(max_bucket)).cast("int")
    chunk = F.pmod(F.xxhash64(F.lit(7), F.col(id_col).cast("string")), g).cast("int")
    build = pair_cols(big.withColumn("__c", chunk), "b", ["__c"])
    probe = pair_cols(
        big.withColumn("__c", F.explode(F.sequence(F.lit(0), g - 1))), "a", ["__c"]
    )
    big_pairs = probe.join(build, on=["band", "bucket", "__c"]).drop("__c")
    return finish(small_pairs.unionByName(big_pairs))


# Scale guard for a materialized candidate-pair frame feeding joins
# (VERDICT r14 #2/#3). Above this many pairs the frame must not be
# broadcast into gram/doc joins: a stats-driven broadcast of a
# corpus-growing candidate set OOMs the driver at scale (the sf1 @
# default-heap failure). Env-overridable so the scale protocol can
# probe both paths.
CAND_BROADCAST_ROW_BOUND = 250_000


def guarded_candidate_frame(cands: DataFrame) -> tuple[DataFrame, bool, bool]:
    """Guard a MATERIALIZED (localCheckpoint'ed) candidate-pair frame
    before it feeds joins; returns ``(cands, large, restrict)``.

    Counts the already-checkpointed frame (one cheap scan of local
    blocks, no recompute — a bounded O(1)-driver-data action, the
    documented library-collect contract) and, above the row bound:

    - attaches a ``merge`` hint so downstream joins route through
      sort-merge instead of collecting a corpus-growing frame into a
      driver-built broadcast (guide §3.1 — broadcast is for sides that
      FIT; SMJ always works and spills gracefully), and
    - sets ``restrict``, asking the caller to pre-filter the gram/doc
      side to candidate docs (guide §3.2 semi-join pre-filter): below
      the bound the corpus is small enough that the restriction's
      extra semi-join costs more than the grams it saves (measured
      +0.6 s at sf0.1's 61% candidate coverage, r14), above it every
      non-candidate doc is wasted shuffle bytes.

    The ``large`` flag tells the caller to ALSO merge-hint every other
    pair-/candidate-bounded frame of its assembly: those grow with the
    candidate set too, and AQE's runtime size estimates will otherwise
    pick one as a broadcast build side (the sf1 OOM reproduces on the
    intersection aggregate once the candidate frame itself is hinted).

    ``SPARK_GRAFT_RESTRICT_CAND_GRAMS`` (0/1/auto) overrides the
    restriction decision; ``SPARK_GRAFT_CAND_BROADCAST_ROW_BOUND``
    overrides the bound. Results are join-strategy/pre-filter invariant
    either way (the restricted docs are a superset of every id the
    inner joins keep)."""
    import os

    bound = int(
        os.environ.get(
            "SPARK_GRAFT_CAND_BROADCAST_ROW_BOUND", CAND_BROADCAST_ROW_BOUND
        )
    )
    large = cands.count() > bound
    if large:
        cands = cands.hint("merge")
    mode = os.environ.get("SPARK_GRAFT_RESTRICT_CAND_GRAMS", "auto")
    restrict = large if mode == "auto" else mode == "1"
    return cands, large, restrict


def candidate_doc_texts(d: DataFrame, cands: DataFrame) -> DataFrame:
    """Documents restricted to those appearing in a candidate pair —
    the gram-side pre-filter of ``guarded_candidate_frame``."""
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    return d.join(cand_ids, "doc_id", "left_semi")


def lsh_bucket_stats(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "fast",
    heavy_threshold: int = 20,
) -> DataFrame:
    """Per-band LSH bucket-population report — the straggler forecast
    for the banded near-dup join. ``pairs_work`` (sum of s·(s-1)/2 over
    buckets) is EXACTLY the number of candidate pairs the in-bucket
    join will emit; ``heavy_buckets``/``salt_fanout`` quantify how much
    of that the salted two-stage path (minhash_candidate_pairs
    ``heavy='salt'``) would split, and into how many bounded chunks.
    Run this before the join at a new scale: max_bucket tells you the
    single worst task the UNSALTED join would create.

    One gram explode + two bucket-keyed aggregates; output is
    O(bands) rows."""
    sigs = minhash_signatures(
        df, num_hashes, shingle, id_col, text_col, hasher
    )
    bb = band_buckets(sigs, num_hashes, bands, id_col)
    sz = bb.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    s = F.col("s")
    return (
        sz.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(s).cast("bigint").alias("n_docs"),
            F.max(s).cast("bigint").alias("max_bucket"),
            F.percentile(s, F.lit(0.5)).cast("double").alias("median_bucket"),
            F.sum(s * (s - 1) / 2).cast("bigint").alias("pairs_work"),
            F.sum(F.when(s > heavy_threshold, 1).otherwise(0))
            .cast("bigint")
            .alias("heavy_buckets"),
            F.sum(
                F.when(
                    s > heavy_threshold,
                    F.ceil(s / F.lit(float(heavy_threshold))).cast("bigint"),
                ).otherwise(1)
            )
            .cast("bigint")
            .alias("salt_fanout"),
        )
        .select(
            F.col("band").cast("int").alias("band"),
            "n_buckets",
            "n_docs",
            "max_bucket",
            "median_bucket",
            "pairs_work",
            "heavy_buckets",
            "salt_fanout",
        )
    )
