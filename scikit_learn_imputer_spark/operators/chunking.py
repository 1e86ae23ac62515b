"""Document chunking and sequence packing — the two reshape steps between
a cleaned corpus and a training run.

Both are pure column-expression operators (no UDF, no collect):

- ``chunk_documents`` — sliding fixed-size token windows with overlap
  (the RAG/long-doc-training split). MAP-ONLY: tokens, window starts,
  and slices are all per-row expressions; the explode multiplies rows
  ~n/step times but never shuffles, so the operator scales with the
  scan. (The registry's ``doc_chunks_udtf`` is the Python-UDTF twin of
  the non-overlapping case — use that API shape when the per-row
  expansion needs real Python; this expression path is the fast one.) The start grid is ``0, step, 2*step, … <= max(n-overlap-1, 0)``
  (``step = chunk_size - overlap``): every chunk after the first
  contributes at least one new token, the final chunk may be short, and
  empty documents produce no chunks.

- ``pack_sequences`` — GPT-style concat-and-cut packing: documents are
  concatenated in a deterministic per-shard order and cut every
  ``seq_len`` tokens; each document learns its packed location
  (sequence id, offset, straddles-a-cut flag). ONE shuffle on the shard
  key (here ``source``), then a per-shard streaming window — the same
  shape as token_budget_sample; never a global-order single-partition
  window. Real packers work per input shard for exactly this reason.

Tokenization is the whitespace tokenizer shared with
``functions/text.py:token_count_col`` so chunk counts, budgets, and
packing offsets all agree across the pipeline.

No reference counterpart (the reference is a single-node imputer);
these cover the training-data preparation surface the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (document, window): ``(id, chunk_id, chunk_start,
    n_chunk_tokens, chunk_text)``. ``chunk_id`` counts windows from 0;
    ``chunk_start`` is the 0-based token offset (= chunk_id * step)."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if not (0 <= overlap < chunk_size):
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap} for chunk_size {chunk_size}"
        )
    step = chunk_size - overlap
    t = F.trim(F.col(text_col))
    tokens = F.when(
        F.length(t) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(t, "\\s+"))
    n = F.size(tokens)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
    return (
        df.select(F.col(id_col), tokens.alias("__toks"), starts.alias("__starts"))
        .select(id_col, "__toks", F.posexplode("__starts").alias("__cid", "__start"))
        .select(
            id_col,
            F.col("__cid").cast("bigint").alias("chunk_id"),
            F.col("__start").cast("bigint").alias("chunk_start"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Packed location of every document under per-shard concat-and-cut:
    ``(id, shard, n_tokens, seq_id, seq_offset, straddles)`` where
    ``seq_id``/``seq_offset`` place the document's first token in the
    shard's stream of ``seq_len``-token training sequences and
    ``straddles`` marks documents a cut splits across two sequences."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    t = F.trim(F.col(text_col))
    n_tokens = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return (
        df.select(id_col, shard_col, n_tokens.alias("n_tokens"))
        .withColumn("__cum_prev", cum_prev)
        .select(
            id_col,
            shard_col,
            "n_tokens",
            F.floor(F.col("__cum_prev") / seq_len).cast("bigint").alias("seq_id"),
            (F.col("__cum_prev") % seq_len).alias("seq_offset"),
            ((F.col("__cum_prev") % seq_len + F.col("n_tokens")) > seq_len).alias(
                "straddles"
            ),
        )
    )
