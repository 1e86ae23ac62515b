"""DSIR-style importance weighting for training-data selection.

Hashed n-gram importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling", NeurIPS): score every
raw document by the log-likelihood ratio of its hashed word-unigram
features under a TARGET distribution versus the RAW corpus
distribution, then sample the training set with the Gumbel-top-k trick
so selection probability is proportional to the (softmax of the)
importance score — the published scalable recipe for "pick raw web
data that looks like the target domain".

Engine-portable by construction so the driver can hash-compare against
a DuckDB twin:

- the feature hash is the first 8 hex chars of md5 folded mod
  ``n_buckets`` (no engine-native ``hash()``);
- per-bucket log-ratios are snapped to integer MICRO-units
  (``round(ln(...) * 1e6)``) before any per-document summation, so
  document scores are integer arithmetic on both engines;
- the Gumbel perturbation derives from the same md5-uniform primitive
  as every other deterministic sample in this repo
  (functions/text.py:uniform_hash_col).

Scale shape (the 100-TB story): two map-side partial aggregations over
the exploded grams (raw + target histograms, each collapsing to
``n_buckets`` rows), a broadcast join of the tiny distribution table
back onto the gram stream, and one per-doc sum — the corpus text never
shuffles, nothing driver-side ever exceeds O(n_buckets) rows, and the
final selection is a TakeOrdered top-k (O(k) per partition), exactly
how DSIR is run over Pile-scale raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def gram_bucket_col(gram: Column, n_buckets: int) -> Column:
    """Portable feature hash: first 8 hex chars of md5 -> uint32 ->
    mod ``n_buckets`` (DuckDB twin:
    ``('0x' || substr(md5(g), 1, 8))::UBIGINT % n_buckets``)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")


def dsir_scores(
    df: DataFrame,
    target: Column,
    n_buckets: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document DSIR importance scores.

    ``target`` is a boolean Column selecting the rows that define the
    target distribution (an eval-like / in-domain slice); the RAW
    distribution is the whole input. Both distributions are
    Laplace-(+1)-smoothed over ``n_buckets`` hashed word-unigram
    buckets; a document's score is the MEAN per-gram log-likelihood
    ratio ln(p_target / p_raw), in micro-unit integer arithmetic.

    Returns ``(id_col, source_col, n_grams, score)`` for every document
    with at least one whitespace token; ``score`` is the micro-snapped
    double (exactly ``round(sum(m)/n) / 1e6``).
    """
    dist = dsir_dist(df, target, n_buckets, text_col=text_col)
    return dsir_scores_with_dist(
        df,
        dist,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
        source_col=source_col,
    )


def _gram_buckets(
    df: DataFrame, n_buckets: int, text_col: str, keep: list
) -> DataFrame:
    """One row per word occurrence: ``keep`` columns (names or aliased
    Columns) + hashed bucket ``__b``; blank documents drop out."""
    t = F.trim(F.col(text_col))
    return (
        df.filter(F.length(t) > 0)
        .select(*keep, F.explode(F.split(F.lower(t), r"\s+")).alias("__g"))
        .withColumn("__b", gram_bucket_col(F.col("__g"), n_buckets))
        .drop("__g")
    )


def dsir_dist(
    df: DataFrame,
    target: Column,
    n_buckets: int = 128,
    text_col: str = "text",
) -> DataFrame:
    """The DSIR MODEL: the per-bucket micro-unit log-likelihood ratio
    table, COMPLETE over all ``n_buckets`` buckets (buckets unseen at
    fit time carry the smoothed zero-count ratio, so a dist fitted on
    one corpus scores any other without dropped grams). O(n_buckets)
    rows — the artifact you fit once and ship to every scoring pass.
    Columns: ``(bucket, m, n_buckets)``."""
    occ = _gram_buckets(
        df, n_buckets, text_col, [target.alias("__is_target")]
    )
    # Raw + target histograms in ONE pass (conditional count), collapsing
    # the gram stream to <= n_buckets rows map-side.
    hist = occ.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__c_r"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__c_t"),
    )
    spine = (
        df.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("__b"))
    )
    full = (
        spine.join(hist, "__b", "left")
        .select(
            "__b",
            F.coalesce("__c_r", F.lit(0)).alias("__c_r"),
            F.coalesce("__c_t", F.lit(0)).alias("__c_t"),
        )
    )
    totals = full.agg(
        F.sum("__c_r").cast("double").alias("__n_r"),
        F.sum("__c_t").cast("double").alias("__n_t"),
    )
    p_t = (F.col("__c_t") + 1) / (F.col("__n_t") + F.lit(float(n_buckets)))
    p_r = (F.col("__c_r") + 1) / (F.col("__n_r") + F.lit(float(n_buckets)))
    return (
        full.crossJoin(F.broadcast(totals))  # 1-row totals frame
        .select(
            F.col("__b").alias("bucket"),
            F.round(F.log(p_t / p_r) * 1e6).cast("bigint").alias("m"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        )
    )


def save_dsir_dist(dist: DataFrame, path: str) -> None:
    """Persist the fitted dist table (one tiny parquet file)."""
    dist.coalesce(1).write.mode("overwrite").parquet(path)


def load_dsir_dist(spark, path: str) -> DataFrame:
    """Load and validate a persisted dist: exactly one ``n_buckets``
    value and one row per bucket — a truncated/merged store scores
    silently wrong, so fail loudly instead."""
    dist = spark.read.parquet(path)
    meta = dist.agg(
        F.countDistinct("n_buckets").alias("nv"),
        F.first("n_buckets").alias("b"),
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("bucket").alias("distinct_buckets"),
    ).collect()[0]
    if meta["nv"] != 1 or meta["rows"] != meta["b"] or (
        meta["distinct_buckets"] != meta["b"]
    ):
        raise ValueError(
            f"dsir dist at {path} is corrupt: n_buckets values={meta['nv']}, "
            f"rows={meta['rows']}, distinct buckets="
            f"{meta['distinct_buckets']}, expected {meta['b']} of each"
        )
    return dist


def dsir_scores_with_dist(
    df: DataFrame,
    dist: DataFrame,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The SCORING half: per-doc mean micro log-ratio against an
    already-fitted dist table (one broadcast join + one per-doc sum;
    the production pass you run over the full raw corpus — or per
    micro-batch — after fitting once). ``n_buckets`` is read from the
    dist's own column when not given (O(1) collect)."""
    if n_buckets is None:
        n_buckets = dist.select("n_buckets").first()["n_buckets"]
    occ = _gram_buckets(
        df, n_buckets, text_col, [id_col, source_col]
    )
    per_doc = (
        occ.join(
            F.broadcast(dist.select(F.col("bucket").alias("__b"), "m")),
            "__b",
        )
        .groupBy(id_col, source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("m").alias("__sum_m"),
        )
    )
    score_micro = F.round(F.col("__sum_m") / F.col("n_grams")).cast("bigint")
    return per_doc.select(
        id_col,
        source_col,
        "n_grams",
        (score_micro / F.lit(1e6)).alias("score"),
    )


def gumbel_topk(
    scored: DataFrame,
    k: int,
    seed: str = "dsir",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Gumbel-top-k importance resampling: perturb each score with an
    independent Gumbel(0,1) draw (``-ln(-ln(u))`` from the
    deterministic md5 uniform, offset by +0.5/2^32 so u is strictly
    inside (0,1)) and take the k largest keys — a sample WITHOUT
    replacement with inclusion probability softmax(score), per the
    Gumbel-max trick. The key is snapped to micro-units before the
    top-k so last-ulp ln() differences between engines cannot reorder
    the cutoff; ties (astronomically unlikely) break on ``id_col``.

    Physical plan: TakeOrderedAndProject — O(k) heap per partition, no
    global sort materialization.
    """
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{seed}:"), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        )
        / F.lit(4294967296.0)
    )
    gumbel = -F.log(-F.log(u))
    key_micro = (
        F.round((F.col(score_col) + gumbel) * 1e6).cast("bigint")
    )
    return (
        scored.withColumn("__key", key_micro)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("sample_key", (F.col("__key") / F.lit(1e6)))
        .drop("__key")
    )


def embedding_target_select(
    emb: DataFrame,
    target: Column,
    k: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """The embedding-space sibling of DSIR: select the k raw vectors
    closest (cosine) to the TARGET slice's centroid — "keep what looks
    like the target domain" when the signal lives in embeddings rather
    than n-grams (the selection half of SemDeDup-style curation).

    Engine-portable centroid: per-dimension components are snapped to
    integer MICRO-units before summation, so the centroid is exact
    integer arithmetic (no float-association drift between engines);
    the only floats are the final per-vector cosine, with the same
    dot/(norm*norm) sequence the other embedding oracles pin.

    Scale shape: centroid = one tree-aggregated posexplode (d rows
    map-side) collected O(d) to the driver; scoring = MAP-ONLY against
    the literal centroid array (no join, nothing broadcast but d
    doubles inside the plan); selection = TakeOrdered O(k) heap per
    partition. The embedding column is read once.
    """
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.dedup.embedding import cosine

    tgt = (
        emb.filter(target)
        .select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("pos")
        .agg(
            F.sum(F.round(F.col("col") * 1e6).cast("bigint")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not tgt:
        raise ValueError("target slice is empty — no centroid to select by")
    comp = {r["pos"]: r["s"] / (r["n"] * 1e6) for r in tgt}
    centroid = F.array(*[F.lit(comp[i]) for i in sorted(comp)])
    scored = emb.select(
        id_col,
        *extra_cols,
        cosine(centroid, F.col(vec_col).cast("array<double>")).alias("__cos"),
    )
    return (
        scored.orderBy(F.col("__cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            *extra_cols,
            F.round("__cos", 6).alias("cosine"),
        )
    )


def stream_dsir_score_ingest(
    docs_stream: DataFrame,
    dist_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
):
    """Continuous DSIR scoring: the dist is FIT OFFLINE once
    (``dsir_dist`` + ``save_dsir_dist`` — the model artifact, like a
    tokenizer vocab) and every micro-batch of raw documents is scored
    against the persisted table as it arrives. Scoring is per-document
    map-only (one broadcast join), so batch == stream EXACTLY, with no
    cross-batch state at all; output is exactly-once via the
    batch_id-keyed idempotent sink. At scale this is the shape DSIR
    curation takes inside a live ingestion pipeline: score on arrival,
    select downstream."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from scikit_learn_imputer_spark.streaming.sinks import (
            idempotent_batch_sink,
        )

        dist = load_dsir_dist(batch.sparkSession, dist_path)
        scored = dsir_scores_with_dist(
            batch, dist, id_col=id_col, text_col=text_col,
            source_col=source_col,
        )
        idempotent_batch_sink(scored, out_path, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def doremi_domain_weights(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    NeurIPS): one exponentiated-gradient step from the baseline mixture,
    up-weighting domains with EXCESS loss. The published recipe's
    proxy-vs-reference loss gap needs two trained transformers; the
    deterministic, engine-checkable stand-in here is the corpus
    char-bigram LM's per-domain mean NLL versus the corpus-wide mean
    NLL (same "harder than average" signal, same update rule):

        excess_d = max(NLL_d - NLL_corpus, 0)
        w_d ∝ share_d * exp(eta * excess_d),  normalized over domains

    where share_d is the domain's bigram-mass share (the baseline
    mixture a uniform-over-tokens sampler would realize).

    Exactness: per-domain NLLs aggregate the per-term integer micro-nat
    sums from functions/lm.py (never re-averaged doubles — per-source
    means from doubles flip 6th-decimal rounding between engines), and
    the exp() boost is snapped to integer micro-units before
    normalization.

    Scale shape: the corpus is touched once by the LM score pass
    (map-only projection against the broadcast count table); everything
    after is O(#domains) — two 1-row broadcast normalizer frames,
    nothing corpus-sized shuffles.

    Returns (source, n_docs, n_bigrams, bigram_share, excess_nll,
    weight), one row per domain.
    """
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores

    scores = bigram_lm_scores(
        docs,
        id_col=id_col,
        text_col=text_col,
        carry_cols=(source_col,),
        with_sum_micro=True,
    )
    per_src = scores.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.sum("sum_micro").cast("bigint").alias("__s"),
    )
    # O(#domains) rows, but its lineage is the full corpus LM pass —
    # truncate it so the two normalizer aggregates below and the final
    # projection don't each re-scan the corpus (the dedup/cluster.py
    # connected-components lesson).
    per_src = per_src.localCheckpoint(eager=True)
    z = per_src.agg(
        F.sum("n_bigrams").cast("double").alias("__n_all"),
        F.sum("__s").cast("double").alias("__s_all"),
    )
    nll_micro = F.round(
        -F.col("__s").cast("double") / F.col("n_bigrams")
    ).cast("bigint")
    nll_all_micro = F.round(-F.col("__s_all") / F.col("__n_all")).cast(
        "bigint"
    )
    excess_micro = F.greatest(nll_micro - nll_all_micro, F.lit(0))
    boost_micro = F.round(
        F.exp(F.lit(eta) * excess_micro.cast("double") / 1e6) * 1e6
    ).cast("bigint")
    share = F.col("n_bigrams").cast("double") / F.col("__n_all")
    boosted = per_src.crossJoin(F.broadcast(z)).select(
        source_col,
        "n_docs",
        "n_bigrams",
        share.alias("__share"),
        excess_micro.alias("__excess_micro"),
        (share * boost_micro.cast("double")).alias("__raw"),
    )
    norm = boosted.agg(F.sum("__raw").alias("__z_raw"))
    return boosted.crossJoin(F.broadcast(norm)).select(
        source_col,
        "n_docs",
        "n_bigrams",
        F.round(F.col("__share"), 6).alias("bigram_share"),
        F.round(F.col("__excess_micro") / 1e6, 6).alias("excess_nll"),
        F.round(F.col("__raw") / F.col("__z_raw"), 6).alias("weight"),
    )
