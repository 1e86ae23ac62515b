"""Product quantization (PQ) for inner-product / cosine ANN.

The classic memory-side scale lever beyond scalar int8
(``similarity/quantize.py``): split each d-dim vector into m subvectors,
learn a k-centroid codebook per subspace (k <= 256 so a code is one
byte), and store each vector as m bytes — 64x smaller than float64 for
d=64, m=8. Queries score candidates WITHOUT decompression via the
asymmetric distance computation (ADC): per query, precompute the m x k
lookup table of subvector·centroid inner products; a corpus vector's
score is then m table lookups + adds. This is the FAISS ``IVF,PQ``
coarse-score path re-expressed on Spark.

Engine mapping:

- ``train_pq`` — seeded vectorized Lloyd's k-means over a
  guarded-collect training SAMPLE (the FAISS practice: codebooks train
  in memory on a sample; the guard is the KNN ``maxFitRows`` pattern).
  Driver state: the sample during training, then only the m x k x d/m
  codebook (a few KB).
- ``encode_pq`` — vectorized numpy argmin over the broadcast codebook
  inside ``mapInPandas`` (Arrow batches; same pattern as the BLAS and
  packed-int8 scorers). Output: ``array<int>`` of m codes per vector.
- ``pq_topk`` — per Arrow batch: build each query's LUT once (m x k
  numpy), score the batch's code matrix with fancy indexing
  (``lut[j, codes[:, j]]`` summed over j), keep the per-partition
  top-k, and let ONE shuffle of partitions x |Q| x k candidate rows
  pick the global top-k — the cosine_topk_numpy shuffle shape.

Scoring is inner product against the QUERY-NORMALIZED vector: with
corpus norms unknown post-quantization, PQ ranks by reconstructed
inner product (the standard ADC objective). Exactness property used by
the tests: when every subvector of a corpus vector coincides with a
codebook centroid, reconstruction is lossless and ADC scores EQUAL the
exact inner products — so ranking equals brute force by construction.
On real data the codebook is lossy and recall is judged against
``cosine_topk`` (anchored, like the LSH/IVF paths).

No reference counterpart; published precedent: Jégou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011) and the FAISS
IVF-PQ design.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _subspaces(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = dim // m
    return [(j * w, (j + 1) * w) for j in range(m)]


def train_pq(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    max_train_rows: int = 200_000,
) -> list[list[list[float]]]:
    """m x k x (dim/m) codebook.

    PQ codebooks are trained on a bounded SAMPLE of the corpus — FAISS
    practice, and what callers here do (`emb.sample(...)`). The sample
    is therefore collected under an explicit guard (the KNN
    ``maxFitRows`` pattern, estimators.py) and fit with a seeded
    vectorized Lloyd's loop — all m subspaces in one pass over the
    in-memory matrix, no per-iteration Spark job. MLlib KMeans costs
    ~0.3s of fixed job overhead PER ITERATION PER SUBSPACE (measured:
    4 fits x 8 iters ≈ 10s at sf0.1), which is the wrong trade for a
    few-MB training sample; pass a larger ``max_train_rows`` only with
    the driver memory to match, or pre-sample harder."""
    n = corpus.count()
    if n > max_train_rows:
        raise ValueError(
            f"PQ training set has {n} rows > max_train_rows={max_train_rows}; "
            "train on a sample (corpus.sample(...)) — codebooks need only a "
            "representative sample, not the corpus"
        )
    if n < k:
        raise ValueError(f"PQ training set has {n} rows < k={k} centroids")
    spans = _subspaces(dim, m)
    w = dim // m
    X = np.asarray(
        [r[0] for r in corpus.select(F.col(vec_col).cast("array<double>")).collect()],
        dtype=np.float64,
    )
    if X.shape[1] != dim:
        raise ValueError(f"vectors have dim {X.shape[1]}, expected {dim}")
    rng = np.random.RandomState(seed)
    codebook = []
    for j, (lo, hi) in enumerate(spans):
        sub = X[:, lo:hi]
        centers = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(max_iter):
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * sub @ centers.T
                + (centers * centers).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    centers[c] = pts.mean(axis=0)
                # empty cluster: keep the old centroid (deterministic)
        codebook.append([list(map(float, c)) for c in centers])
    assert len(codebook) == m and all(len(c) == k for c in codebook)
    return codebook


def encode_pq(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_codes array<int>) — per subspace, the index of the
    nearest codebook centroid (L2). Vectorized argmin per Arrow batch;
    the codebook travels to executors inside the closure (a few KB)."""
    m = len(codebook)
    k = len(codebook[0])
    w = len(codebook[0][0])
    cb = np.asarray(codebook, dtype=np.float64)  # m x k x w
    out_schema = f"{id_col} long, pq_codes array<int>"

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * w : (j + 1) * w]  # n x w
                # n x k squared L2 via (a-b)^2 expansion
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ cb[j].T
                    + (cb[j] * cb[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "pq_codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(enc, schema=out_schema)


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score, rank): ADC inner-product top-k of
    each query against the PQ-encoded corpus. The corpus never leaves
    its partitions un-reduced: per-partition top-k first, then one
    shuffle of partitions x |Q| x k rows for the global cut."""
    query_id_col = query_id_col or id_col
    m = len(codebook)
    w = len(codebook[0][0])
    cb = np.asarray(codebook, dtype=np.float64)  # m x k x w
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = np.asarray([r["query_id"] for r in qrows])
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)
    Qn[Qn == 0.0] = 1.0
    Qhat = Q / Qn[:, None]  # cosine vs reconstructed = IP vs unit query
    # LUTs: |Q| x m x k — each query subvector against every centroid.
    luts = np.stack(
        [np.stack([cb[j] @ q[j * w : (j + 1) * w] for j in range(m)]) for q in Qhat]
    )

    out_schema = "query_id long, neighbor_id long, score double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf["pq_codes"]), dtype=np.int64)  # n x m
            nid = pdf[id_col].values
            for qi in range(len(qids)):
                s = np.zeros(len(codes))
                for j in range(m):
                    s += luts[qi, j, codes[:, j]]
                mask = nid != qids[qi]
                sm, nm = s[mask], nid[mask]
                if not len(sm):
                    continue
                # lexsort (score desc, neighbor_id asc) — the partition
                # cut must agree with the global window's tie-break, or
                # ties (guaranteed for duplicate vectors sharing PQ
                # codes) make ranked output partitioning-dependent.
                top = np.lexsort((nm, -sm))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(top), qids[qi]),
                        "neighbor_id": nm[top],
                        "score": sm[top],
                    }
                )

    cand = encoded.mapInPandas(score, schema=out_schema)
    wspec = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(wspec))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    assigned_encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """IVF x PQ — the FAISS production composition: coarse cells prune
    CANDIDATES (only the nprobe nearest cells per query are scored),
    PQ codes prune MEMORY (candidates are scored from m-byte codes via
    ADC), and the shortlist is exact-cosine re-ranked.

    ``assigned_encoded``: (id, pq_codes, cell) — ``encode_pq`` output
    joined with the IVF ``cell`` column (``ivf.build_ivf_index``).

    Scale shape: the probed-cell filter is a literal ``isin`` over the
    union of |Q| x nprobe cells, so against the cell-partitioned
    persisted index (``ivf.save_ivf_index``) it becomes partition
    pruning — unprobed cells are never read, unprobed rows of read
    cells are masked per query inside the Arrow batch, and only
    |partitions| x |Q| x shortlist candidate rows ever shuffle."""
    query_id_col = query_id_col or id_col
    cents = np.asarray(centroids, dtype=np.float64)
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = [r["query_id"] for r in qrows]
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    d2 = ((Q * Q).sum(1)[:, None] - 2.0 * Q @ cents.T + (cents * cents).sum(1)[None, :])
    probe = {qid: set(np.argsort(d2[i])[:nprobe].tolist()) for i, qid in enumerate(qids)}
    union_cells = sorted(set().union(*probe.values()))

    m = len(codebook)
    w = len(codebook[0][0])
    cb = np.asarray(codebook, dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)
    Qn[Qn == 0.0] = 1.0
    Qhat = Q / Qn[:, None]
    luts = np.stack(
        [np.stack([cb[j] @ q[j * w : (j + 1) * w] for j in range(m)]) for q in Qhat]
    )

    out_schema = "query_id long, neighbor_id long, score double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf["pq_codes"]), dtype=np.int64)
            nid = pdf[id_col].values
            cell = pdf["cell"].values
            for qi, qid in enumerate(qids):
                mask = (nid != qid) & np.isin(cell, list(probe[qid]))
                if not mask.any():
                    continue
                s = np.zeros(mask.sum())
                cm = codes[mask]
                for j in range(m):
                    s += luts[qi, j, cm[:, j]]
                nm = nid[mask]
                # Same tie-break contract as pq_topk's partition cut.
                top = np.lexsort((nm, -s))[:shortlist]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(top), qid),
                        "neighbor_id": nm[top],
                        "score": s[top],
                    }
                )

    short = (
        assigned_encoded.filter(F.col("cell").isin(union_cells))
        .select(id_col, "pq_codes", "cell")
        .mapInPandas(score, schema=out_schema)
    )
    wspec = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    short = (
        short.withColumn("rank", F.row_number().over(wspec))
        .filter(F.col("rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    from scikit_learn_imputer_spark.dedup.embedding import dot, norm

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    wspec2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wspec2))
        .filter(F.col("rank") <= k)
    )


def pq_topk_rerank(
    encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """The production PQ shape: ADC shortlist (cheap, code-only) then
    EXACT cosine re-rank of the |Q| x shortlist survivors — measured
    recall@10 on the test embeddings: 0.46 raw ADC at k=64 codebooks vs
    0.90 with shortlist=50, 1.00 at k=256 (tests pin the floor). The
    shortlist frame is tiny, so it broadcasts into the corpus join and
    the corpus itself is scanned map-side — full vectors are fetched for
    only |Q| x shortlist rows."""
    from scikit_learn_imputer_spark.dedup.embedding import dot, norm

    query_id_col = query_id_col or id_col
    short = pq_topk(
        encoded,
        queries,
        codebook,
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    wspec = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wspec))
        .filter(F.col("rank") <= k)
    )
