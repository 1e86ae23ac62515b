"""SimHash near-duplicate fingerprinting.

64-bit (here 60-bit, md5-derived) SimHash: each whitespace token hashes to a
60-bit integer; for every bit position the document sums +1/−1 over its
tokens; the signature sets bit i when the sum is positive. Near-dups are
pairs at small Hamming distance, found without O(n²) comparisons by banding
the signature into 4×15-bit chunks — two signatures within Hamming distance
d < 4 must agree on at least one chunk (pigeonhole).

All JVM expressions: explode tokens → 60 conditional sums in ONE aggregate →
bit reassembly via shiftleft/sum — no Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.minhash import _fast_hash

BITS = 60
CHUNKS = 4
CHUNK_BITS = BITS // CHUNKS


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "fast",
) -> DataFrame:
    """(id, simhash BIGINT) per document. ``hasher='md5'`` gives the
    engine-portable (oracle-reproducible) signature."""
    from scikit_learn_imputer_spark.dedup.minhash import _md5_hash60
    from scikit_learn_imputer_spark.functions.skew import fan_out

    df = fan_out(df)  # parallelism floor for the token-hash fan-out
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("tok"),
    )
    # Materialize the token hash as a CONCRETE column before aggregating:
    # referencing the hash EXPRESSION from all 60 bit sums would inline
    # it into each one — 60 md5s per token instead of 1 (measured ~5x
    # the whole signature pass at bench SF).
    toks = toks.select(
        id_col,
        (_fast_hash if hasher == "fast" else _md5_hash60)(F.col("tok"), 0).alias("__h"),
    )
    h = F.col("__h")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(BITS)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    sig = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(BITS)
        ],
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two BIGINT signatures — popcount of XOR via
    bit_count (JVM builtin)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 1000,
    hasher: str = "fast",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming distance ≤ max_hamming
    (must be < CHUNKS for the pigeonhole guarantee to be exact).
    ``hasher='md5'`` makes the result oracle-reproducible."""
    # The signature frame feeds CHUNKS union branches, the bucket-size
    # guard, and both sides of the pair join — without a persist each
    # consumer recomputes (and re-codegens) the 60-term signature
    # aggregate. One row per doc (MEMORY_AND_DISK, spills at scale).
    sigs = simhash_signatures(df, id_col, text_col, hasher=hasher).persist()
    sigs.count()
    return banded_hamming_pairs(
        sigs,
        id_col=id_col,
        sig_col="simhash",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        bits=BITS,
        chunks=CHUNKS,
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    bits: int = BITS,
    chunks: int = CHUNKS,
) -> DataFrame:
    """Generic pigeonhole banding for ANY BIGINT fingerprint column
    (SimHash, pHash, …): split the ``bits``-bit signature into
    ``chunks`` equal chunks — two signatures within Hamming distance
    d < chunks must agree on at least one chunk, so pairs only form
    inside shared chunk buckets (sub-quadratic) yet the ≤ max_hamming
    result is EXACT. ``max_bucket`` drops degenerate buckets (the
    MinHash skew-guard pattern); ``max_bucket >= 2**31`` is the
    documented UNGUARDED sentinel (the oracle-exact variants) — the
    bucket-size aggregate + semi-join are skipped outright instead of
    computed only to keep every row. Callers persist ``sigs`` if it is
    expensive to recompute (it feeds chunks+1 consumers)."""
    chunk_bits = bits // chunks
    chunk_frames = []
    for c in range(chunks):
        chunk = F.shiftright(F.col(sig_col), c * chunk_bits).bitwiseAND(
            F.lit((1 << chunk_bits) - 1)
        )
        chunk_frames.append(
            sigs.select(
                F.col(id_col),
                F.col(sig_col),
                F.lit(c).alias("chunk"),
                chunk.alias("bucket"),
            )
        )
    banded = reduce(DataFrame.unionByName, chunk_frames)
    if max_bucket < 2**31:
        bucket_sizes = banded.groupBy("chunk", "bucket").agg(
            F.count(F.lit(1)).alias("bsize")
        )
        banded = banded.join(
            bucket_sizes.filter(F.col("bsize") <= max_bucket).select(
                "chunk", "bucket"
            ),
            on=["chunk", "bucket"],
            how="left_semi",
        )
    left = banded.select(
        "chunk", "bucket", F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a")
    )
    right = banded.select(
        "chunk", "bucket", F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b")
    )
    return (
        left.join(right, on=["chunk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            hamming_distance(F.col("sig_a"), F.col("sig_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
