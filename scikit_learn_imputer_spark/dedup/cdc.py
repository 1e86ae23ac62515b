"""Content-defined chunking (CDC) for sub-document deduplication.

Fixed-size chunking breaks when one word is inserted (every later chunk
shifts); content-defined boundaries — cut where a rolling fingerprint of
the LOCAL content hits a mask, the Rabin/FastCDC idea used by storage
dedup and by training-data pipelines that dedup shard payloads — realign
after an edit, so shared passages between document versions land in
identical chunks. This module implements word-granularity CDC portably:

- a boundary falls AFTER word *w* iff the last hex nibble of ``md5(w)``
  is in the boundary set (default ``{'0'}`` → expected chunk ≈ 16
  words). The decision depends only on the word itself, so both engines
  (and a python brute force) reproduce it exactly;
- chunk index = running count of boundaries strictly before the word —
  a per-document prefix sum, bounded by document length, never a
  data-sized window;
- a chunk's identity is ``md5`` of its space-joined words: identical
  passages collide across documents regardless of position.

Complements the exact / paragraph / n-gram / span families in this
package: paragraphs need delimiters, n-grams are fixed-width; CDC gives
variable-width edit-stable units with one explode + one digest groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window


def cdc_chunks(
    docs: DataFrame,
    *,
    boundary_nibbles: tuple[str, ...] = ("0",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk every document at content-defined word boundaries.

    Returns (id_col, chunk_idx BIGINT, n_words BIGINT,
    chunk_digest STRING). Empty texts produce no rows.
    """
    words = docs.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    is_boundary = F.substring(F.md5(F.col("word")), 32, 1).isin(
        *boundary_nibbles
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = words.withColumn(
        "chunk_idx",
        F.coalesce(F.sum(is_boundary.cast("bigint")).over(w), F.lit(0)),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "word"))),
        lambda s: s["word"],
    )
    return chunked.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.md5(F.array_join(ordered, " ")).alias("chunk_digest"),
    )


CDC_CHUNKS_ORACLE = """
WITH words AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         parts[CAST(i AS INT)] AS word
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS parts
        FROM documents{where}),
       unnest(generate_series(1, len(parts))) AS t(i)
  WHERE parts[CAST(i AS INT)] <> ''
),
marked AS (
  SELECT doc_id, pos, word,
         CASE WHEN substr(md5(word), 32, 1) IN ({nibbles})
              THEN 1 ELSE 0 END AS b
  FROM words
),
chunked AS (
  SELECT doc_id, pos, word,
         CAST(coalesce(sum(b) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS chunk_idx
  FROM marked
)
SELECT doc_id, chunk_idx,
       CAST(count(*) AS BIGINT) AS n_words,
       md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_digest
FROM chunked GROUP BY doc_id, chunk_idx
"""


def cdc_chunks_oracle_sql(
    boundary_nibbles: tuple[str, ...] = ("0",),
    where: str = "",
) -> str:
    """DuckDB twin of :func:`cdc_chunks` over the ``documents`` view.
    ``where`` restricts the chunked corpus (incremental store/batch
    splits)."""
    nibbles = ", ".join(f"'{n}'" for n in boundary_nibbles)
    # Explicit placeholder, not a positional string replace — a reshaped
    # template then fails loudly instead of silently desynchronizing
    # (ADVICE r11).
    sql = CDC_CHUNKS_ORACLE.replace("{nibbles}", nibbles)
    return sql.replace("{where}", f" WHERE {where}" if where else "")


def build_cdc_chunk_store(docs: DataFrame, path: str) -> None:
    """Persist the distinct chunk digests of an already-ingested corpus
    — the all-history store a production pipeline probes per batch
    (the dedup/incremental.py fingerprint-store pattern, at chunk
    granularity). Only 32-char digests land; text never does."""
    cdc_chunks(docs).select("chunk_digest").distinct().write.mode(
        "overwrite"
    ).parquet(path)


def incremental_cdc_report(batch: DataFrame, store_path: str) -> DataFrame:
    """Classify every chunk of an incoming batch against the persisted
    store AND within the batch itself: per document, how many chunks
    are genuinely new (their word mass is the batch's real novelty),
    how many duplicate the store (history), and how many duplicate an
    earlier batch chunk (ordered by (doc_id, chunk_idx) — the min-id
    keeper rule at chunk granularity). One digest equi join against
    the store plus one per-digest window bounded by the duplicate
    count; the report is O(batch docs)."""
    spark = batch.sparkSession
    store = spark.read.parquet(store_path)
    chunks = cdc_chunks(batch)
    marked = chunks.join(
        store.withColumn("__in_store", F.lit(1)),
        "chunk_digest",
        "left",
    )
    w = Window.partitionBy("chunk_digest").orderBy("doc_id", "chunk_idx")
    classified = marked.withColumn("__rn", F.row_number().over(w)).select(
        "doc_id",
        "n_words",
        F.when(F.col("__in_store").isNotNull(), F.lit("dup_store"))
        .when(F.col("__rn") > 1, F.lit("dup_batch"))
        .otherwise(F.lit("new"))
        .alias("cls"),
    )
    big = lambda c: F.coalesce(F.sum(c), F.lit(0)).cast("bigint")  # noqa: E731
    return classified.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        big((F.col("cls") == "new").cast("bigint")).alias("chunks_new"),
        big((F.col("cls") == "dup_store").cast("bigint")).alias(
            "chunks_dup_store"
        ),
        big((F.col("cls") == "dup_batch").cast("bigint")).alias(
            "chunks_dup_batch"
        ),
        big(F.when(F.col("cls") == "new", F.col("n_words"))).alias(
            "new_words"
        ),
    )
