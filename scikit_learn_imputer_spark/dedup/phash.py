"""Perceptual-hash image near-duplicate detection (VERDICT r10 #4 —
LAION-style frame dedup for the multimodal column family).

A dHash (difference hash): "decode" the image payload to a fixed grid
of pixel intensities, then set bit j when pixel j is brighter than
pixel j+1 — the gradient fingerprint is robust to global
brightness/scale shifts, and near-duplicate images land within a small
Hamming distance. Near-dup pairs are found WITHOUT O(n²) comparisons by
the same 4×15-bit-chunk pigeonhole banding SimHash uses
(``dedup/simhash.py:banded_hamming_pairs``): two 60-bit fingerprints
within Hamming distance d < 4 must agree on at least one chunk, so
pairs only form inside shared chunk buckets.

The codec is the repo's deterministic fake (no image libraries in this
container — ``sources/multimodal.py``): a payload born as utf-8 bytes
decodes to its code points, and the "resize to a 61-pixel grid" samples
61 evenly spaced code points. That makes the whole signature a pure JVM
expression (decode → substring → ascii → 60 comparisons, one
whole-stage-codegen projection — no Python in the hot path) AND exactly
reproducible in the DuckDB oracle (``unicode(substr(...))``), the
``minhash_signatures_md5`` oracle-twin precedent. Production swaps the
pixel stage for a PIL/libvips decode + 8×8 DCT inside ``mapInPandas``;
the signature → banding → bucket-join plumbing is unchanged.

Scale shape: signatures are a map-only projection over the payload
column; banding unions 4 narrow frames; the bucket join is equi-keyed
with the MinHash ``max_bucket`` skew guard available. 100 TB of images
never form an all-pairs product.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.simhash import banded_hamming_pairs

BITS = 60
PIXELS = BITS + 1  # 61 samples -> 60 gradient bits
CHUNKS = 4


def phash_signatures(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash BIGINT) per media row — the 60-bit dHash of the
    deterministic fake decode. Rows whose payload decodes to an empty
    (all-whitespace) string carry no signal and are dropped (documented
    in the query oracle's WHERE). Pixels materialize as concrete
    columns BEFORE the bit assembly so each substring/ascii evaluates
    once, not 2× per gradient bit (the simhash hash-materialization
    lesson)."""
    s = F.trim(F.decode(F.col(payload_col), "UTF-8"))
    base = (
        df.select(F.col(id_col), s.alias("__s"))
        .withColumn("__n", F.length("__s").cast("bigint"))
        .filter(F.col("__n") > 0)
    )
    # pixel j = code point at char position floor(j*n/PIXELS)+1 (1-based;
    # j*n/PIXELS < n so the position always lands inside the string)
    px = [
        F.ascii(
            F.substring(
                F.col("__s"),
                (
                    F.floor(F.lit(j).cast("bigint") * F.col("__n") / PIXELS) + 1
                ).cast("int"),
                1,
            )
        ).alias(f"__p{j}")
        for j in range(PIXELS)
    ]
    pixels = base.select(id_col, *px)
    sig = reduce(
        add,
        [
            F.when(
                F.col(f"__p{j}") > F.col(f"__p{j + 1}"),
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(BITS)
        ],
    )
    return pixels.select(F.col(id_col), sig.alias("phash"))


def phash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs at Hamming distance
    ≤ max_hamming (< CHUNKS for the pigeonhole guarantee), via banded
    chunk buckets — never all-pairs. Signatures persist across the
    chunks+1 consumers of the banding."""
    sigs = phash_signatures(df, id_col=id_col, payload_col=payload_col).persist()
    sigs.count()
    return banded_hamming_pairs(
        sigs,
        id_col=id_col,
        sig_col="phash",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
        bits=BITS,
        chunks=CHUNKS,
    )


def phash_signatures_decoded(
    df: DataFrame,
    decode_gray,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash BIGINT) from a REAL codec (VERDICT r12 #6): the same
    61-sample/60-gradient-bit dHash as :func:`phash_signatures`, but
    the pixel stage is ``decode_gray(payload) -> flat grayscale ints``
    (e.g. ``sources/codecs.py:bmp_gray_pixels``, or a PIL decode in
    production) running Arrow-batched inside ``mapInPandas`` — the
    codec-plug-in twin of the pure-JVM fake-decode path. Same
    downstream banding: feed the result straight into
    ``banded_hamming_pairs``. Empty decodes (no pixels) are dropped,
    matching the fake path's empty-string rule."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("phash", LongType(), True),
        ]
    )

    def sig_of(gray: list) -> int | None:
        n = len(gray)
        if n == 0:
            return None
        # pixel j = gray[floor(j * n / PIXELS)] — identical sampling
        # arithmetic to the JVM path's substring positions.
        px = [gray[(j * n) // PIXELS] for j in range(PIXELS)]
        sig = 0
        for j in range(BITS):
            if px[j] > px[j + 1]:
                sig |= 1 << j
        return sig

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                sig_of(decode_gray(bytes(b))) if b is not None else None
                for b in pdf[payload_col]
            ]
            # Nullable Int64, NOT a plain list: pandas promotes a mixed
            # int/None list to float64, which silently ROUNDS every
            # signature above 2^53 — one NULL payload in a batch would
            # corrupt all its neighbours' 60-bit hashes.
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": pd.array(sigs, dtype="Int64"),
                }
            )
            yield out[out["phash"].notna()]

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
