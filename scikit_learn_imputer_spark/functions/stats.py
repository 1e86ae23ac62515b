"""Statistical aggregates (SURVEY.md §2 A5-A8, W3/W4, C9 building blocks).

- Shannon entropy (natural log) of a categorical distribution ↔
  ``scipy.stats.entropy(counts)`` at scikit_learn_imputer.py:28, 574.
- pandas-style average rank ↔ ``Series.rank()`` (ties get the MEAN of their
  positions) at scikit_learn_imputer.py:533-541.
- long-form per-dataset statistics feeding Rubin's-rule between-imputation
  variance ↔ find_imputation_variance at scikit_learn_imputer.py:556-583.

All pure DataFrame aggregates — no UDFs, stays in whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entropy_by_column(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (ln base) of each categorical column's value
    distribution → (variable, entropy). NULLs are excluded (np.unique on a
    Series drops NaN only when absent — the reference computes entropy on
    imputed, null-free data; we mirror by filtering nulls).

    One groupBy per column over a shared scan; the per-column aggregates are
    unioned — each is a map-side-combinable count over a low-cardinality key.
    """
    parts = []
    for c in cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        total = F.sum("__cnt").over(Window.partitionBy())
        p = F.col("__cnt") / total
        ent = counts.select(
            F.lit(c).alias("variable"), (-p * F.log(p)).alias("__term")
        ).groupBy("variable").agg(F.sum("__term").alias("entropy"))
        parts.append(ent)
    return reduce(DataFrame.unionByName, parts)


def avg_rank(
    df: DataFrame,
    col: str,
    ascending: bool = True,
    out_col: str | None = None,
    band_width: float | None = None,
) -> DataFrame:
    """pandas ``Series.rank(ascending=...)`` semantics: ties receive the mean
    of the positions they span; NULLs get NULL rank (pandas NaN).

    rank() gives the MIN position of a tie group; the mean position is
    rank + (tie_count - 1)/2.

    Two physical strategies (VERDICT r11 #3):

    - ``band_width=None``: one global-order window — ONLY for bounded
      report frames (the O(models) model-selection tables), never for
      data-sized input.
    - ``band_width=<w>``: the banded two-pass (operators/shuffle.py:71
      pattern) for DATA-SIZED numeric columns. Ranks are derived on the
      per-VALUE aggregate (one row per distinct value — domain-bounded,
      e.g. 2-decimal balances over a fixed range), windows are
      partitioned by ``band = floor(value / w)`` (order-preserving:
      equal values share a band, higher bands hold strictly larger
      values), and per-band offsets cumulate over the O(#bands)
      bucket-metadata frame before broadcasting back. min_rank =
      band_offset + smaller-values-in-band + 1; avg = min + (n-1)/2 —
      identical arithmetic, no unpartitioned window over the data.
    """
    out_col = out_col or f"{col}_rank"
    nulls = df.filter(F.col(col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    nonnull = df.filter(F.col(col).isNotNull())
    if band_width is None:
        key = F.col(col).asc() if ascending else F.col(col).desc()
        w = Window.orderBy(key)
        tie_cnt = F.count(F.lit(1)).over(Window.partitionBy(F.col(col)))
        r = F.rank().over(w) + (tie_cnt - 1) / 2
        return nonnull.withColumn(out_col, r.cast("double")).unionByName(
            nulls
        )
    if band_width <= 0:
        raise ValueError(f"band_width must be positive, got {band_width}")
    vals = nonnull.groupBy(col).agg(F.count(F.lit(1)).alias("__n"))
    band = F.floor(F.col(col) / F.lit(float(band_width))).alias("__band")
    vals = vals.withColumn("__band", band)
    bands = vals.groupBy("__band").agg(F.sum("__n").alias("__bn"))
    border = F.col("__band").asc() if ascending else F.col("__band").desc()
    woff = Window.orderBy(border).rowsBetween(Window.unboundedPreceding, -1)
    offsets = bands.select(
        "__band",
        F.coalesce(F.sum("__bn").over(woff), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
    )
    vorder = F.col(col).asc() if ascending else F.col(col).desc()
    wloc = Window.partitionBy("__band").orderBy(vorder).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked_vals = (
        vals.join(F.broadcast(offsets), "__band")
        .select(
            col,
            (
                F.col("__off")
                + F.coalesce(F.sum("__n").over(wloc), F.lit(0).cast("bigint"))
                + 1
                + (F.col("__n") - 1) / 2.0
            ).cast("double").alias(out_col),
        )
    )
    return nonnull.join(ranked_vals, on=col).select(*nulls.columns).unionByName(
        nulls
    )


def imputation_variance_long(
    stats_per_dataset: DataFrame,
) -> DataFrame:
    """Given long-form per-dataset statistics (dataset, variable, value),
    return (variable, imputation_variance) where the variance is the SAMPLE
    variance (ddof=1) across datasets — the B term of Rubin's rule
    T = U + (1 + 1/m)B (readme.md:18-23)."""
    return stats_per_dataset.groupBy("variable").agg(
        F.var_samp("value").alias("imputation_variance")
    )


def exact_rank_quantiles(
    df: DataFrame,
    col: str,
    fracs: list[tuple[int, int]],
    names: list[str],
    band_width: float,
    group_cols: tuple[str, ...] = (),
    domain_bound: int | None = None,
) -> DataFrame:
    """DISTRIBUTED exact lower-rank quantile thresholds:
    ``t = sorted(values)[((n - 1) * num) div den]`` per ``(num, den)``
    fraction — pure element selection of existing values, NO
    interpolation. Use for every quantile that feeds a COMPARISON
    (decile bucketing, winsorize clips, top-decile filters): the
    round-12 sf1 sweep caught Spark's interpolating ``percentile`` and
    DuckDB's ``quantile_cont`` disagreeing by one ULP when ``(n-1)*q``
    lands on a data index (0.672022 vs 0.6720220000000001), flipping
    ``s >= t`` for rows whose value EQUALS the threshold. Exact integer
    rank arithmetic + element lookup is bit-identical on any engine.

    Scale shape (VERDICT r12 #1 — replaces the single-task
    ``agg(sort_array(collect_list(v)))`` buffer): the corpus is first
    reduced to a ``(value, count)`` aggregate (values here are
    fixed-precision — 2-decimal balances, 6-decimal scores — so the
    distinct-value frame is DOMAIN-bounded, never corpus-sized), then
    the k-th element is selected by cumulative count using the banded
    two-pass (``avg_rank`` band_width pattern): per-band offsets
    cumulate over the O(#bands) bucket-metadata frame, the per-value
    cumulative window is partitioned by band, and the threshold is the
    unique value whose covered rank range [lo+1, lo+n] contains
    ``k = ((total - 1) * num) div den + 1``. No task ever buffers more
    than one band of DISTINCT values.

    Returns a 1-row frame of threshold columns ``names`` (or one row
    per group when ``group_cols`` is given) — broadcast it into the
    comparison. NULL values are excluded, matching ``list(v) FILTER
    (v IS NOT NULL)`` on the oracle side.

    EAGER: the offsets pass and the rank pass both consume the
    ``(value, count)`` aggregate, and without materialization each
    consumer re-runs the whole UPSTREAM chain (a bigram-LM scoring
    pass, a quality-feature projection) — the r13 bench showed 1.5-4x
    regressions on exactly that shape. The aggregate is persisted for
    the two passes, the tiny result (1 row, or O(#groups)) is
    localCheckpoint-materialized, and the cache is released before
    returning (the quality_model_scores persist lifecycle). Upstream
    therefore evaluates ONCE here — the same traversal count as the
    single-task collect_list form this replaces.

    Known constant: the banded machinery is ~6 small stages + 2 jobs,
    ~2-4 s of pure scheduling latency on local mode at toy SFs
    (measured r13: invariant to input size between 5k and 50k distinct
    values). That constant is the price of every window being
    partitioned; it vanishes against real work at scale, and the
    single-task buffer it replaced was the r12 verdict's #1
    scale-killer.

    DuckDB twin (unchanged from the array form — same values):
    ``(list_sort(list(v) FILTER (v IS NOT NULL)))
    [CAST(((count(v) - 1) * num) // den AS BIGINT) + 1]``.

    ``domain_bound`` — the SMALL-DOMAIN fast path (VERDICT r13 #1: the
    eager banded machinery's ~2-4 s fixed scheduling constant regressed
    every sampler-derived query at toy SF). When the caller can DECLARE
    a hard bound on the number of distinct values per group (a 6-dp
    score in [0, 1] → ≤ 1e6+1 lattice points, a 2-dp balance on a fixed
    range → ≤ 1.1M — bounded at ANY corpus size), the selection runs as
    ONE fully-lazy aggregate: the ``(value, count)`` frame (map-side
    partial-aggregated, so no task ever sees corpus rows) is
    ``array_sort(collect_list(struct(v, n)))``-ed per group and each
    threshold is an O(distinct) higher-order ``aggregate`` scan — zero
    windows, zero extra jobs, zero persist/checkpoint; upstream
    evaluates exactly once, in the consumer's own job. Bit-identical to
    the banded path (same integer-rank element selection). The bound is
    ENFORCED at runtime: a ``raise_error`` guard fails the job loudly if
    the observed distinct count exceeds the declaration (the
    ``dedup/embedding.py`` exact-pairs 200k-row guard precedent) —
    switch that call site back to the banded path (``domain_bound=None``)
    rather than raising the bound past what one task should buffer
    (~4M structs ≈ 128 MB). Leave ``None`` for raw unrounded doubles
    whose distinct count grows with the corpus.
    """
    if band_width <= 0:
        raise ValueError(f"band_width must be positive, got {band_width}")
    gc = list(group_cols)
    nonnull = df.filter(F.col(col).isNotNull())
    if domain_bound is not None:
        vtype = df.schema[col].dataType.simpleString()
        vals_b = nonnull.groupBy(*gc, col).agg(F.count(F.lit(1)).alias("__n"))
        arr = F.array_sort(
            F.collect_list(F.struct(F.col(col).alias("v"), F.col("__n").alias("n")))
        ).alias("__arr")
        agged = vals_b.groupBy(*gc).agg(arr) if gc else vals_b.agg(arr)
        agged = agged.withColumn(
            "__arr",
            F.when(
                F.size("__arr") <= F.lit(int(domain_bound)), F.col("__arr")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"exact_rank_quantiles({col}): observed distinct-"
                            f"value count "
                        ),
                        F.size("__arr").cast("string"),
                        F.lit(
                            f" exceeds declared domain_bound={int(domain_bound)}"
                            " — use the banded path (domain_bound=None)"
                        ),
                    )
                )
            ),
        ).withColumn(
            "__total",
            F.expr("aggregate(__arr, cast(0 as bigint), (a, x) -> a + x.n)"),
        )
        sel = list(gc)
        for (num, den), name in zip(fracs, names):
            k = f"(((__total - 1) * {num}) div {den}) + 1"
            scan = (
                f"aggregate(__arr, struct(cast(0 as bigint) as cum, "
                f"cast(null as {vtype}) as t), (acc, x) -> struct("
                f"acc.cum + x.n, CASE WHEN acc.t IS NULL AND acc.cum < {k} "
                f"AND {k} <= acc.cum + x.n THEN x.v ELSE acc.t END), "
                f"acc -> acc.t)"
            )
            sel.append(F.expr(scan).alias(name))
        return agged.select(*sel)
    vals = nonnull.groupBy(*gc, col).agg(F.count(F.lit(1)).alias("__n"))
    vals = vals.withColumn(
        "__band", F.floor(F.col(col) / F.lit(float(band_width)))
    ).persist()
    bands = vals.groupBy(*gc, "__band").agg(F.sum("__n").alias("__bn"))
    woff = Window.partitionBy(*gc).orderBy(F.col("__band").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bands.select(
        *gc,
        "__band",
        F.coalesce(F.sum("__bn").over(woff), F.lit(0).cast("bigint")).alias(
            "__off"
        ),
        F.sum("__bn").over(Window.partitionBy(*gc)).alias("__total"),
    )
    wloc = Window.partitionBy(*gc, "__band").orderBy(
        F.col(col).asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.join(F.broadcast(offsets), [*gc, "__band"]).select(
        *gc,
        col,
        "__n",
        "__total",
        (
            F.col("__off")
            + F.coalesce(F.sum("__n").over(wloc), F.lit(0).cast("bigint"))
        ).alias("__lo"),
    )
    aggs = []
    for (num, den), name in zip(fracs, names):
        k = F.expr(f"(__total - 1) * {num} div {den}") + F.lit(1)
        aggs.append(
            F.max(
                F.when(
                    (F.col("__lo") < k)
                    & (k <= F.col("__lo") + F.col("__n")),
                    F.col(col),
                )
            ).alias(name)
        )
    out = ranked.groupBy(*gc).agg(*aggs) if gc else ranked.agg(*aggs)
    out = out.localCheckpoint(eager=True)  # 1 row (or O(#groups))
    vals.unpersist()
    return out
