"""Bloom-filter decontamination prefilter.

The exact digest anti join (``dedup/exact.py:decontaminate``) is the
correctness anchor, but its scale behavior depends on the benchmark side
fitting the broadcast threshold: when it does not, AQE falls back to a
shuffle join and EVERY corpus digest crosses the wire. A Bloom filter
breaks that dependency — an m-bit bitmap built once from the benchmark
digests costs m/8 bytes to broadcast REGARDLESS of benchmark
cardinality, and a map-only probe splits the corpus into

- a guaranteed-clean stream (Bloom filters have NO false negatives), and
- a small candidate stream (|corpus| x fpr + true leaks rows)

so only the candidates reach the exact confirming anti join. The final
output EQUALS the exact decontamination result by construction: false
positives are removed by the confirm join, and false negatives cannot
occur — which is why the operator is fully oracle-able against the same
``NOT IN`` SQL as the exact path (``decontaminate_bloom_corpus``).

Engine design (all in-plan, no driver state, no UDF):

- the bitmap is BUILT DISTRIBUTED: explode the k probe positions, group
  by 64-bit word index (the shuffle is at most m/64 rows no matter how
  large the benchmark is, map-side combined via ``bit_or``), then
  assemble the dense ``array<bigint>`` with sequence + map lookup in a
  single-row aggregate;
- the one-row bitmap frame reaches every task through the documented
  one-row-broadcast pattern (cross join with a broadcast 1-row build
  side — whitelisted in tests/test_plan_lint.py);
- the probe is one whole-stage-codegen expression: ``forall`` over the
  k positions, ``bit_get`` on the indexed bitmap word.

Cost shape at 100 TB: two map-only parquet scans of the corpus (clean
branch + candidate branch) and a candidates-only join, traded against
the exact path's corpus-wide digest shuffle when the benchmark outgrows
the broadcast threshold. Columnar re-scan is cheap; a corpus-wide
shuffle is not.

Reference parity: the reference's eval-leakage story is in-memory exact
matching only (pandas ``isin`` semantics, reference imputer.py); the
Bloom split is the Spark-native scale path for the same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.functions.text import fingerprint_col

BLOOM_COL = "__bloom"


def bloom_m_bits(
    expected_digests: int, bits_per_digest: int = 10, floor: int = 1 << 16
) -> int:
    """Bitmap size for an expected benchmark cardinality: ~10 bits per
    digest (fpr ≈ 1% at k=5), rounded up to a multiple of 64, floored at
    64 Ki bits. The r5 advice case: a fixed 1<<16 default saturates
    (fpr→1) past ~13k digests — exactly the large-benchmark regime the
    prefilter targets — so callers that know |benchmark| should size
    from it."""
    if expected_digests < 0:
        raise ValueError(f"expected_digests must be >= 0, got {expected_digests}")
    m = max(floor, expected_digests * bits_per_digest)
    return ((m + 63) // 64) * 64


def _positions(fp: Column, m_bits: int, k: int) -> Column:
    """array<int> of the k probe bit positions for one digest: k
    independent seeded xxhash64 draws mod m (engine-internal — the
    oracle checks the final set, never the bitmap)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(fp, F.lit(seed)), F.lit(m_bits)).cast("int")
            for seed in range(k)
        ]
    )


def bloom_bitmap(
    digests: DataFrame,
    fp_col: str = "fingerprint",
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """One-row DataFrame ``{__bloom: array<bigint>}`` — the dense m-bit
    bitmap over the input digest column, built distributed (shuffle is
    bounded by m/64 word rows, not by the digest count)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_words = m_bits // 64
    words = (
        digests.select(F.explode(_positions(F.col(fp_col), m_bits, k)).alias("__p"))
        .select(
            F.floor(F.col("__p") / 64).cast("int").alias("__w"),
            F.expr("shiftleft(1L, CAST(__p % 64 AS INT))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__m"))
    )
    return words.agg(
        F.map_from_arrays(F.collect_list("__w"), F.collect_list("__m")).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("__wm", i), F.lit(0).cast("bigint")),
        ).alias(BLOOM_COL)
    )


def bloom_hit_col(fp: Column, bloom: Column, m_bits: int, k: int) -> Column:
    """True iff every probe bit for ``fp`` is set in ``bloom`` — a pure
    column expression (whole-stage codegen, no shuffle). Guaranteed true
    for every digest the bitmap was built from (no false negatives)."""
    return F.forall(
        _positions(fp, m_bits, k),
        lambda p: F.bit_get(
            F.element_at(bloom, F.floor(p / 64).cast("int") + 1),
            (p % 64).cast("int"),
        )
        == 1,
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact-result decontamination with a Bloom prefilter: returns
    precisely the rows ``dedup/exact.py:decontaminate`` returns, but the
    corpus-wide work is map-only — only Bloom-positive candidates enter
    the confirming anti join.

    ``m_bits=None`` (default) SIZES THE BITMAP FROM THE BENCHMARK: one
    exact distinct-count over the benchmark digests (a tiny aggregate —
    the benchmark side is the small side by construction), then
    ``bloom_m_bits`` picks ~10 bits per digest. A fixed undersized
    bitmap saturates and the prefilter silently degrades to the exact
    path's cost (output stays correct either way); pass an explicit
    ``m_bits`` to skip the count when the cardinality is known."""
    bench_fp = (
        benchmark.select(fingerprint_col(F.col(text_col)).alias("__bfp")).distinct()
    )
    if m_bits is None:
        m_bits = bloom_m_bits(bench_fp.count())
    bitmap = bloom_bitmap(bench_fp, "__bfp", m_bits, k)
    probed = (
        corpus.withColumn("__fp", fingerprint_col(F.col(text_col)))
        .crossJoin(F.broadcast(bitmap))
        .withColumn("__hit", bloom_hit_col(F.col("__fp"), F.col(BLOOM_COL), m_bits, k))
    )
    aux = ["__fp", "__hit", BLOOM_COL]
    clean_fast = probed.filter(~F.col("__hit")).drop(*aux)
    confirmed_clean = (
        probed.filter(F.col("__hit"))
        .join(bench_fp, F.col("__fp") == F.col("__bfp"), "left_anti")
        .drop(*aux)
    )
    return clean_fast.unionByName(confirmed_clean)
