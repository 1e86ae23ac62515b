"""The oracle-checked query registry — one entry per implemented operator
(SURVEY.md §2 inventory + north-star extensions).

Every Spark callable here has a DuckDB twin in ``ORACLE`` with IDENTICAL
output column names and value rounding, because the driver hash-compares
them order-insensitively at sf0.01 (column names sorted before hashing —
mismatched aliases fail even when values agree).

Engine-portability rules used throughout:
- null injection is modular arithmetic on keys (sources/nulls.py), never an
  engine hash;
- every floating-point output column is rounded identically on both sides;
- DuckDB's regexp_replace needs the 'g' flag to match Spark's
  replace-all default;
- Spark ``size``/``count`` are cast so integer widths agree (BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scikit_learn_imputer_spark.dedup.embedding import cosine, embedding_near_pairs
from scikit_learn_imputer_spark.dedup.exact import exact_dup_groups
from scikit_learn_imputer_spark.dedup.minhash import minhash_candidate_pairs
from scikit_learn_imputer_spark.dedup.ngram import ngram_jaccard_pairs
from scikit_learn_imputer_spark.dedup.simhash import simhash_signatures
from scikit_learn_imputer_spark.functions.stats import entropy_by_column
from scikit_learn_imputer_spark.functions.text import (
    LANG_MARKERS,
    fingerprint_col,
    lang_id_col,
    quality_features,
    rolling_hash_expr,
    token_count_col,
)
from scikit_learn_imputer_spark.operators.fill import ffill_bfill
from scikit_learn_imputer_spark.operators.missing import (
    missing_indicator,
    missing_metrics,
)
from scikit_learn_imputer_spark.operators.encode import one_hot
from scikit_learn_imputer_spark.operators.scale import minmax_scale
from scikit_learn_imputer_spark.operators.split import split_modulo
from scikit_learn_imputer_spark.operators.update import scatter_update
from scikit_learn_imputer_spark.similarity.knn import cosine_topk
from scikit_learn_imputer_spark.sources.nulls import nulls_cte, with_nulls
from scikit_learn_imputer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
#: name -> "tests/<file>.py::<test>" for queries that are REGISTERED
#: WITHOUT an oracle (seeded randomness / iterative algorithms the driver
#: checks rows-only).  Every query must have an ORACLE entry or an anchor;
#: bench.py asserts this at startup and tests/test_oracle_parity.py
#: asserts the anchor tests actually exist, so a query can never land
#: driver-invisible by accident (VERDICT r4 #6).
ANCHORS: dict[str, str] = {}

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def register(name: str, oracle: str | None = None, anchor: str | None = None):
    if oracle is None and anchor is None:
        raise ValueError(
            f"query {name!r} needs an oracle or a named anchor test"
        )
    if name in QUERIES:
        # A silent dict overwrite would leave the earlier registration
        # dead while its tests keep passing against the later one.
        raise ValueError(f"query {name!r} is already registered")

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if anchor is not None:
            ANCHORS[name] = anchor
        return fn

    return deco


def _scratch(prefix: str) -> str:
    """Per-invocation scratch dir for queries that write physical
    artifacts then read them back: a unique mkdtemp path (two concurrent
    runs at the same sf can never overwrite each other's files — ADVICE
    r7), cleaned at process exit because the returned plan still reads
    the files lazily."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=f"sli_{prefix}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)



# =====================================================================
# Imputation-core operators (SURVEY.md §2.2-2.7)
# =====================================================================

@register(
    "missing_metrics",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
agg AS (
  SELECT count(*) AS total,
         count(c_custkey) AS o1, count(c_name) AS o2, count(c_nationkey) AS o3,
         count(c_acctbal) AS o4, count(c_mktsegment) AS o5
  FROM customer_nulls
)
SELECT v.variable, v.observed, total - v.observed AS missing, total,
       CAST(total - v.observed AS DOUBLE) / total AS imputation_rate
FROM agg, (
  SELECT 'c_custkey' AS variable, o1 AS observed FROM agg UNION ALL
  SELECT 'c_name', o2 FROM agg UNION ALL
  SELECT 'c_nationkey', o3 FROM agg UNION ALL
  SELECT 'c_acctbal', o4 FROM agg UNION ALL
  SELECT 'c_mktsegment', o5 FROM agg
) v
""",
)
def q_missing_metrics(spark, sf_dir):
    """A1-A3/C3: per-column missingness report in ONE aggregate pass."""
    df = with_nulls(_t(spark, sf_dir, "customer"), "customer")
    return missing_metrics(df)


@register(
    "missing_indicator",
    oracle=f"""
WITH orders_nulls AS ({nulls_cte('orders')})
SELECT o_orderkey,
       o_orderkey IS NULL AS o_orderkey_flag,
       o_custkey IS NULL AS o_custkey_flag,
       o_orderstatus IS NULL AS o_orderstatus_flag,
       o_totalprice IS NULL AS o_totalprice_flag,
       o_orderdate IS NULL AS o_orderdate_flag,
       o_orderpriority IS NULL AS o_orderpriority_flag
FROM orders_nulls
""",
)
def q_missing_indicator(spark, sf_dir):
    """P3/C2: boolean missing flags per column, keyed by order id."""
    df = with_nulls(_t(spark, sf_dir, "orders"), "orders")
    return missing_indicator(df, cols=df.columns, keep=["o_orderkey"])


@register(
    "ffill_bfill",
    oracle=f"""
WITH orders_nulls AS ({nulls_cte('orders')})
SELECT o_orderkey,
  COALESCE(
    last_value(o_totalprice IGNORE NULLS) OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    first_value(o_totalprice IGNORE NULLS) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
  ) AS o_totalprice,
  COALESCE(
    last_value(o_orderpriority IGNORE NULLS) OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    first_value(o_orderpriority IGNORE NULLS) OVER (ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
  ) AS o_orderpriority
FROM orders_nulls
""",
)
def q_ffill_bfill(spark, sf_dir):
    """W1/W2: partitioned two-pass forward/backward fill — never a single
    global window (SURVEY.md §7.3 #1) — over the null-injected orders
    table, ordered by its UNIQUE primary key (numeric + categorical fill
    in one pass). Moved off lineitem in round 11: the sf1 scale-proof
    exposed that the generator emits ~20% duplicate (l_orderkey,
    l_linenumber) pairs WITH DIFFERING VALUES, so the old composite rid
    violated the operator's order-uniqueness contract — both engines
    happened to share scan-order tie-breaks on single-split small-SF
    reads, and multi-split sf1 reads surfaced ~250k order-ambiguous
    rows. Fill over a non-total order is not a well-defined result; the
    orders key is verified unique at every SF."""
    df = with_nulls(_t(spark, sf_dir, "orders"), "orders")
    keyed = df.select("o_orderkey", "o_totalprice", "o_orderpriority")
    return ffill_bfill(keyed, "o_orderkey", ["o_totalprice", "o_orderpriority"])


@register(
    "one_hot",
    oracle="""
SELECT c_custkey,
""" + ",\n".join(
        f"       CASE WHEN c_mktsegment = '{v}' THEN 1 ELSE 0 END AS c_mktsegment_{v}"
        for v in MKTSEGMENTS
    ) + "\nFROM customer",
)
def q_one_hot(spark, sf_dir):
    """E1: pandas-get_dummies-shaped one-hot as a pure projection."""
    df = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return one_hot(df, ["c_mktsegment"], values={"c_mktsegment": MKTSEGMENTS})


@register(
    "minmax_scale",
    oracle="""
WITH stats AS (SELECT min(c_acctbal) mn, max(c_acctbal) mx FROM customer)
SELECT c_custkey,
       round(CASE WHEN mx = mn THEN 0.0
             ELSE (c_acctbal - mn) / (mx - mn) END, 6) AS c_acctbal_scaled
FROM customer, stats
""",
)
def q_minmax_scale(spark, sf_dir):
    """E4: min-max scaling as one agg + broadcast projection."""
    df = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    scaled = minmax_scale(df, ["c_acctbal"])
    return scaled.select(
        "c_custkey", F.round(F.col("c_acctbal"), 6).alias("c_acctbal_scaled")
    )


@register(
    "scatter_update_mean",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
m AS (SELECT round(avg(c_acctbal), 2) AS fill FROM customer_nulls)
SELECT c_custkey, COALESCE(c_acctbal, fill) AS c_acctbal
FROM customer_nulls, m
""",
)
def q_scatter_update_mean(spark, sf_dir):
    """J3: scatter update (join+coalesce) writing a mean fill into the
    missing cells only."""
    df = with_nulls(_t(spark, sf_dir, "customer"), "customer").select(
        "c_custkey", "c_acctbal"
    )
    fill = df.agg(F.round(F.avg("c_acctbal"), 2).alias("fill"))
    updates = (
        df.filter(F.col("c_acctbal").isNull())
        .crossJoin(F.broadcast(fill))
        .select("c_custkey", F.col("fill").alias("c_acctbal"))
    )
    return scatter_update(df, updates, "c_custkey", "c_acctbal")


@register(
    "split_modulo",
    oracle="""
SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'test' ELSE 'train' END AS split,
       count(*) AS n
FROM orders GROUP BY 1
""",
)
def q_split_modulo(spark, sf_dir):
    """X1: deterministic engine-portable train/test split (counts)."""
    df = _t(spark, sf_dir, "orders")
    train, test = split_modulo(df, "o_orderkey", 10, (0,))
    return train.select(F.lit("train").alias("split")).union(
        test.select(F.lit("test").alias("split"))
    ).groupBy("split").agg(F.count(F.lit(1)).alias("n"))


@register(
    "cardinality_prune",
    oracle="""
SELECT v.variable, v.n_distinct, v.n_distinct <= 30 AS keep
FROM (
  SELECT 'c_nationkey' AS variable, count(DISTINCT c_nationkey) AS n_distinct FROM customer UNION ALL
  SELECT 'c_mktsegment', count(DISTINCT c_mktsegment) FROM customer UNION ALL
  SELECT 'c_name', count(DISTINCT c_name) FROM customer
) v
""",
)
def q_cardinality_prune(spark, sf_dir):
    """A4/P7: exact distinct counts driving the class_threshold gate."""
    df = _t(spark, sf_dir, "customer")
    cols = ["c_nationkey", "c_mktsegment", "c_name"]
    agg = df.agg(*[F.countDistinct(F.col(c)).alias(c) for c in cols])
    structs = [
        F.struct(
            F.lit(c).alias("variable"), F.col(c).alias("n_distinct")
        )
        for c in cols
    ]
    return (
        agg.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .withColumn("keep", F.col("n_distinct") <= 30)
    )


@register(
    "entropy_by_column",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
seg AS (
  SELECT c_mktsegment AS v, count(*) AS cnt FROM customer_nulls
  WHERE c_mktsegment IS NOT NULL GROUP BY 1
),
nat AS (
  SELECT c_nationkey AS v, count(*) AS cnt FROM customer_nulls
  WHERE c_nationkey IS NOT NULL GROUP BY 1
)
SELECT 'c_mktsegment' AS variable,
       round(-sum((cnt::DOUBLE / t.s) * ln(cnt::DOUBLE / t.s)), 6) AS entropy
FROM seg, (SELECT sum(cnt) AS s FROM seg) t GROUP BY t.s
UNION ALL
SELECT 'c_nationkey',
       round(-sum((cnt::DOUBLE / t.s) * ln(cnt::DOUBLE / t.s)), 6)
FROM nat, (SELECT sum(cnt) AS s FROM nat) t GROUP BY t.s
""",
)
def q_entropy_by_column(spark, sf_dir):
    """A5/A6: Shannon entropy (natural log) of categorical distributions."""
    df = with_nulls(_t(spark, sf_dir, "customer"), "customer")
    ent = entropy_by_column(df, ["c_mktsegment", "c_nationkey"])
    return ent.select("variable", F.round(F.col("entropy"), 6).alias("entropy"))


@register(
    "imputation_variance",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
ds AS (
  SELECT 'mean_fill' AS dataset,
         avg(COALESCE(c_acctbal, (SELECT avg(c_acctbal) FROM customer_nulls))) AS value
  FROM customer_nulls
  UNION ALL
  SELECT 'zero_fill', avg(COALESCE(c_acctbal, 0.0)) FROM customer_nulls
  UNION ALL
  SELECT 'min_fill',
         avg(COALESCE(c_acctbal, (SELECT min(c_acctbal) FROM customer_nulls)))
  FROM customer_nulls
)
SELECT 'c_acctbal' AS variable,
       round(var_samp(value), 4) AS imputation_variance
FROM ds
""",
)
def q_imputation_variance(spark, sf_dir):
    """A7/A8/C9: Rubin's-rule between-imputation variance across m simple
    imputations (exercises find_imputation_variance's aggregate shape)."""
    df = with_nulls(_t(spark, sf_dir, "customer"), "customer").select("c_acctbal")
    # Fill scalars stay IN-PLAN: a one-row aggregate broadcast onto the
    # data, not collected to the driver (no extra Spark jobs at build
    # time; Catalyst reuses the broadcast exchange across the branches).
    scalars = df.agg(
        F.avg("c_acctbal").alias("__mean"), F.min("c_acctbal").alias("__min")
    )
    base = df.crossJoin(F.broadcast(scalars))
    fills = {
        "mean_fill": F.col("__mean"),
        "zero_fill": F.lit(0.0),
        "min_fill": F.col("__min"),
    }
    parts = []
    for name, v in fills.items():
        parts.append(
            base.select(F.coalesce(F.col("c_acctbal"), v).alias("x")).agg(
                F.lit(name).alias("dataset"), F.avg("x").alias("value")
            )
        )
    from functools import reduce

    long = reduce(DataFrame.unionByName, parts)
    return long.agg(
        F.lit("c_acctbal").alias("variable"),
        F.round(F.var_samp("value"), 4).alias("imputation_variance"),
    )


@register(
    "avg_rank_suppliers",
    oracle="""
SELECT s_suppkey, s_acctbal,
       rank() OVER (ORDER BY s_acctbal)
         + (count(*) OVER (PARTITION BY s_acctbal) - 1) / 2.0 AS s_acctbal_rank
FROM supplier
""",
)
def q_avg_rank_suppliers(spark, sf_dir):
    """W3/W4: pandas-average-rank semantics (ties get mean position),
    via the BANDED two-pass (VERDICT r11 #3 — the table is data-sized,
    so ranks derive from the per-value aggregate with windows
    partitioned by a 1000-unit balance band; no unpartitioned window
    over the data). Identical arithmetic to the global-window form."""
    from scikit_learn_imputer_spark.functions.stats import avg_rank

    df = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    return avg_rank(df, "s_acctbal", ascending=True, band_width=1000.0)


# =====================================================================
# Star-schema relational staples (join/agg/window coverage at scale)
# =====================================================================

@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical map-side-combinable aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q3_top_orders",
    oracle="""
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q_q3_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k. The
    customer side is filtered before the join so Catalyst broadcasts it."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "revenue_by_nation",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
""",
)
def q_revenue_by_nation(spark, sf_dir):
    """Q5 shape: multi-way join with small dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "top_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
""",
)
def q_top_parts_per_brand(spark, sf_dir):
    """Top-k per group: window partitioned by the group key — parallel
    across groups, no global sort."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "events_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_hourly(spark, sf_dir):
    """Streaming twin (streaming/events.py): tumbling 1h windows."""
    from scikit_learn_imputer_spark.streaming.events import (
        windowed_event_counts_batch,
    )

    out = windowed_event_counts_batch(spark, sf_dir, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
    )


@register(
    "events_json",
    oracle="""
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
""",
)
def q_events_json(spark, sf_dir):
    """Semi-structured column: JSON extraction + aggregate."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.avg(F.get_json_object("props", "$.k").cast("bigint")), 4
        ).alias("avg_k")
    )


# =====================================================================
# Training-data-pipeline extensions: dedup / text / similarity
# =====================================================================

@register(
    "exact_dup_groups",
    oracle="""
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents
GROUP BY 1
""",
)
def q_exact_dup_groups(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized content digests."""
    return exact_dup_groups(_t(spark, sf_dir, "documents"))


@register(
    "dup_cluster_histogram",
    oracle="""
WITH g AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         count(*) AS dup_count
  FROM documents GROUP BY 1
)
SELECT CAST(dup_count AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(dup_count) AS BIGINT) AS n_docs
FROM g GROUP BY 1
""",
)
def q_dup_cluster_histogram(spark, sf_dir):
    """Exact-dup group-size distribution — the dedup EDA summary (how
    much mass sits in singletons vs heavy clusters decides whether
    near-dup passes are worth their cost). Two map-side-combinable
    aggregates over 32-byte digests; text never shuffles."""
    groups = exact_dup_groups(_t(spark, sf_dir, "documents"))
    return groups.groupBy(F.col("dup_count").alias("group_size")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("dup_count").cast("bigint").alias("n_docs"),
    )


@register(
    "source_dedup_rates",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
            AS BIGINT) AS n_unique,
       round(1.0 - CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                        AS DOUBLE) / count(*), 9) AS dup_rate
FROM documents GROUP BY source
""",
)
def q_source_dedup_rates(spark, sf_dir):
    """Per-source duplication rate (docs, distinct normalized digests,
    dup fraction) — the hygiene number a mixture designer reads before
    weighting sources. One aggregate keyed by (source) with an exact
    distinct over digests; shuffle carries 32-byte hashes only."""
    from scikit_learn_imputer_spark.functions.text import fingerprint_col

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint_col(F.col("text")).alias("__fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                1.0 - F.col("n_unique").cast("double") / F.col("n_docs"), 9
            ).alias("dup_rate"),
        )
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram
  FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(len(text) - 2, 0))) AS i
        FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM grams a JOIN grams b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.82
""",
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup by char-3-gram Jaccard (exact, oracle-checked config)."""
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.82
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       list_reduce(
         list_transform(generate_series(1, length(text)),
                        i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
         (acc, c) -> (acc * 31 + c) % 1000000007
       ) AS rolling_hash
FROM documents
""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 canonical digest + polynomial rolling
    hash, both JVM-side expressions. fan_out floors the parallelism of
    the per-char fold when the scan is one small file (no-op at scale)."""
    from scikit_learn_imputer_spark.functions.skew import fan_out

    d = fan_out(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        fingerprint_col(F.col("text")).alias("fingerprint"),
        rolling_hash_expr("text").alias("rolling_hash"),
    )


# DuckDB twins of functions/text.py:token_count_col / stopword_count_col /
# quality_score_col — same \s+ tokenization and the same zero-guards, so
# empty / whitespace-only / multi-space documents agree between engines.
_NTOK_SQL = (
    r"CASE WHEN length(trim(text)) = 0 THEN 0 "
    r"ELSE len(str_split_regex(trim(text), '\s+')) END"
)
_NSTOP_SQL = (
    r"len(list_filter(str_split_regex(trim(text), '\s+'), "
    r"t -> t IN ('the', 'a', 'of', 'and', 'is')))"
)
_QSCORE_SQL = f"""0.4 * (CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                     / length(text) ELSE 0.0 END)
         + 0.3 * least((CASE WHEN {_NTOK_SQL} > 0
                THEN CAST({_NSTOP_SQL} AS DOUBLE) / ({_NTOK_SQL}) ELSE 0.0 END) * 5, 1.0)
         + 0.3 * (1 - least((CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                     / length(text) ELSE 0.0 END) * 10, 1.0))"""


def _lang_scores_sql() -> str:
    parts = []
    for lang, words in LANG_MARKERS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_filter(string_split(trim(text), ' '), t -> t IN ({inlist}))) AS s_{lang}"
        )
    return ",\n       ".join(parts)


@register(
    "lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
       {_lang_scores_sql()}
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         WHEN s_es >= s_zh THEN 'es'
         ELSE 'zh'
       END AS lang_pred
FROM scored
""",
)
def q_lang_id(spark, sf_dir):
    """Heuristic marker-word language ID (argmax with priority tiebreak)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id_col(F.col("text")).alias("lang_pred"))


@register(
    "text_quality",
    oracle=f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS q_chars,
         CAST(({_NTOK_SQL}) AS BIGINT) AS q_tokens,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
         CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / length(text) ELSE 0.0 END AS alpha_ratio,
         CASE WHEN {_NTOK_SQL} > 0
           THEN CAST({_NSTOP_SQL} AS DOUBLE) / ({_NTOK_SQL})
           ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                / length(text) ELSE 0.0 END AS punct_ratio
  FROM documents
)
SELECT doc_id, q_chars, q_tokens, bpe_tokens,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(0.4 * alpha_ratio + 0.3 * least(stop_ratio * 5, 1.0)
             + 0.3 * (1 - least(punct_ratio * 10, 1.0)), 6) AS q_score
FROM f
""",
)
def q_text_quality(spark, sf_dir):
    """Text quality features: char/whitespace/BPE-ish token counts,
    alphabetic + stopword ratios, composite 0-1 quality score — all
    codegen-friendly column expressions."""
    from scikit_learn_imputer_spark.functions.text import (
        bpe_token_count_col,
        stopword_count_col,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = token_count_col(t).cast("long")
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    n_stop = stopword_count_col(t, LANG_MARKERS["en"])
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    q_score = (
        0.4 * alpha_ratio
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return d.select(
        "doc_id",
        F.length(t).alias("q_chars"),
        n_tokens.alias("q_tokens"),
        bpe_token_count_col(t).cast("long").alias("bpe_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(q_score, 6).alias("q_score"),
    )


@register(
    "dup_ngram_ratio",
    oracle=r"""
WITH w AS (
  SELECT doc_id, str_split_regex(trim(text), '\s+') AS words FROM documents
), tg AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(words) - 1, 1)),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
           AS trigrams
  FROM w
)
SELECT doc_id,
       CAST(len(trigrams) AS BIGINT) AS n_trigrams,
       round(CASE WHEN len(trigrams) <= 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
                        / len(trigrams) END, 6) AS dup_trigram_ratio
FROM tg
""",
)
def q_dup_ngram_ratio(spark, sf_dir):
    """Within-document repetition (Gopher/C4-family duplicate-n-gram
    quality filter): fraction of word 3-grams that are repeats. Pure
    higher-order expressions (functions/text.py:word_trigrams_col) — one
    narrow projection over the documents scan, no shuffle, no UDF; at
    100 TB this is a map-only pass."""
    from scikit_learn_imputer_spark.functions.text import (
        dup_trigram_ratio_col,
        word_trigrams_col,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.size(word_trigrams_col(t)).cast("long").alias("n_trigrams"),
        F.round(dup_trigram_ratio_col(t), 6).alias("dup_trigram_ratio"),
    )


@register(
    "token_budget_sample",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= 700
""",
)
def q_token_budget_sample(spark, sf_dir):
    """Token-budget sampling, the domain-mixture primitive of an LLM data
    pipeline: per source, take documents in deterministic pseudo-random
    order (md5 of doc_id — engine-portable, seed-free) until a cumulative
    token budget is hit. One hash-partitioned window per source; at scale
    the running sum shuffles once on the mixture key and each partition
    streams — no global sort, no collect."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long")
    h = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(h, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select(
            "doc_id",
            "source",
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 700)
    )


@register(
    "chunk_documents",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks, CAST(u.s AS BIGINT) AS start
  FROM t, LATERAL unnest(generate_series(0, greatest(len(toks) - 16 - 1, 0), 48)) AS u(s)
  WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start // 48 AS BIGINT) AS chunk_id,
       start AS chunk_start,
       CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
FROM s
""",
)
def q_chunk_documents(spark, sf_dir):
    """Sliding-window document chunking (operators/chunking.py): 64-token
    chunks with 16-token overlap. Map-only — the explode multiplies rows
    but nothing shuffles, so the operator scales with the scan."""
    from scikit_learn_imputer_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=64, overlap=16
    )


@register(
    "pack_sequences",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_tokens > 512) AS straddles
FROM c
""",
)
def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-cut sequence packing (operators/chunking.py):
    per-source deterministic order, cut every 512 tokens; each document
    learns its (seq_id, offset, straddles) location. One shuffle on the
    shard key, then a per-shard streaming window — the token_budget_sample
    shape, never a global single-partition window."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)


def _rep_grams_cte(n: int) -> str:
    """grams{n}(doc_id, start, g) — positioned word n-grams, shared by the
    repetition-signal oracle branches."""
    return rf"""grams{n} AS (
  SELECT doc_id, CAST(s.i AS INT) AS start,
         array_to_string(tk[s.i + 1 : s.i + {n}], ' ') AS g
  FROM rtoks, LATERAL unnest(generate_series(0, len(tk) - {n}, 1)) AS s(i)
  WHERE len(tk) >= {n}
)"""


@register(
    "repetition_signals",
    oracle=rf"""
WITH rtoks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), {_rep_grams_cte(2)}, {_rep_grams_cte(3)}, {_rep_grams_cte(5)}, {_rep_grams_cte(8)},
top2 AS (
  SELECT doc_id, max(c) * 2 AS toptok
  FROM (SELECT doc_id, g, count(*) AS c FROM grams2 GROUP BY doc_id, g)
  GROUP BY doc_id
),
top3 AS (
  SELECT doc_id, max(c) * 3 AS toptok
  FROM (SELECT doc_id, g, count(*) AS c FROM grams3 GROUP BY doc_id, g)
  GROUP BY doc_id
),
dup5 AS (
  SELECT doc_id, count(DISTINCT i) AS duptok
  FROM (
    SELECT g.doc_id, g.start + u.o AS i
    FROM grams5 g
    JOIN (SELECT doc_id, g AS gg FROM grams5 GROUP BY doc_id, g
          HAVING count(*) >= 2) r
      ON g.doc_id = r.doc_id AND g.g = r.gg,
    LATERAL unnest(generate_series(0, 4, 1)) AS u(o)
  ) GROUP BY doc_id
),
dup8 AS (
  SELECT doc_id, count(DISTINCT i) AS duptok
  FROM (
    SELECT g.doc_id, g.start + u.o AS i
    FROM grams8 g
    JOIN (SELECT doc_id, g AS gg FROM grams8 GROUP BY doc_id, g
          HAVING count(*) >= 2) r
      ON g.doc_id = r.doc_id AND g.g = r.gg,
    LATERAL unnest(generate_series(0, 7, 1)) AS u(o)
  ) GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       round(CAST(coalesce(top2.toptok, 0) AS DOUBLE)
             / greatest(len(tk), 1), 9) AS top2_frac,
       round(CAST(coalesce(top3.toptok, 0) AS DOUBLE)
             / greatest(len(tk), 1), 9) AS top3_frac,
       round(CAST(coalesce(dup5.duptok, 0) AS DOUBLE)
             / greatest(len(tk), 1), 9) AS dup5_frac,
       round(CAST(coalesce(dup8.duptok, 0) AS DOUBLE)
             / greatest(len(tk), 1), 9) AS dup8_frac
FROM rtoks t
LEFT JOIN top2 USING (doc_id)
LEFT JOIN top3 USING (doc_id)
LEFT JOIN dup5 USING (doc_id)
LEFT JOIN dup8 USING (doc_id)
""",
)
def q_repetition_signals(spark, sf_dir):
    """Gopher-style within-document repetition filters
    (functions/repetition.py; Rae et al. 2021 §A1.1, reused by
    RefinedWeb/Dolma): per doc, the token fraction consumed by the most
    frequent 2-/3-gram (overlapping occurrences) and the fraction
    covered by ALL within-doc-repeated 5-/8-grams. Token-denominated
    (documented divergence from the char version) so the whole signal
    set is DuckDB-oracled. One explode+aggregate per n; per-doc
    coverage state bounded by the doc's own length."""
    from scikit_learn_imputer_spark.functions.repetition import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


@register(
    "doc_length_histogram",
    oracle=r"""
WITH t AS (
  SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n
  FROM documents
)
SELECT CAST(n // 10 * 10 AS BIGINT) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM t GROUP BY 1
""",
)
def q_doc_length_histogram(spark, sf_dir):
    """Token-length histogram of the corpus (width-10 buckets, doc and
    token mass per bucket) — the first EDA cut before choosing chunking
    / packing / length-filter parameters. One map-side-combinable
    aggregate over a 2-column scan."""
    docs = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    return (
        docs.select(n.alias("__n"))
        .groupBy((F.floor(F.col("__n") / 10) * 10).cast("bigint").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "vocab_head",
    oracle=r"""
WITH w AS (
  SELECT unnest(str_split_regex(trim(text), '\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
)
SELECT word, CAST(count(*) AS BIGINT) AS freq
FROM w GROUP BY word
ORDER BY freq DESC, word
LIMIT 25
""",
)
def q_vocab_head(spark, sf_dir):
    """Corpus vocabulary head: top-25 words by frequency (ties broken by
    word) — the EDA staple behind stopword lists, BPE vocab seeding, and
    boilerplate thresholds. Partial-aggregated word counts; the global
    order is a TakeOrdered top-k, never a full sort."""
    docs = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    return (
        docs.filter(F.length(t) > 0)
        .select(F.explode(F.split(t, "\\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(25)
    )


@register(
    "vocab_coverage",
    oracle=r"""
WITH w AS (
  SELECT unnest(str_split_regex(trim(text), '\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
), v AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY word
), t AS (SELECT CAST(sum(freq) AS BIGINT) AS tot FROM v)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank,
       word, freq,
       round(CAST(sum(freq) OVER (ORDER BY freq DESC, word
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tot, 9) AS cum_frac
FROM v, t
""",
)
def q_vocab_coverage(spark, sf_dir):
    """Cumulative token-mass coverage of the frequency-ranked vocabulary
    (the Zipf curve a tokenizer designer reads to size a vocab: how many
    head types cover 90/99% of tokens). Word counts partial-aggregate
    map-side; the global (freq DESC, word) rank + running mass is then
    computed WITHOUT any unpartitioned data window (VERDICT r11 #3 —
    distinct types run to billions at 100 TB of web text) via the
    banded two-pass of operators/fill.py:147 / operators/shuffle.py:71:
    band = (exact freq, 2-char word prefix) — order-preserving, because
    within a band every row ties on freq and shares the truncation
    prefix, so (freq DESC, prefix ASC) between bands + word ASC inside
    a band IS the global order; per-band (count, mass) offsets cumulate
    with a window over the O(#bands) bucket-metadata frame (ranks
    BANDS, not data — the seeded_global_shuffle contract) and broadcast
    back; the data-sized window is partitioned by band. The corpus
    total is a 1-row broadcast."""
    docs = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    vocab = (
        docs.filter(F.length(t) > 0)
        .select(F.explode(F.split(t, "\\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("__bw", F.substring("word", 1, 2))
    )
    total = vocab.agg(F.sum("freq").cast("bigint").alias("tot"))
    bands = vocab.groupBy("freq", "__bw").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("freq").alias("__s")
    )
    woff = Window.orderBy(F.col("freq").desc(), F.col("__bw")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bands.select(
        "freq",
        "__bw",
        F.coalesce(F.sum("__n").over(woff), F.lit(0).cast("bigint")).alias(
            "__rank_off"
        ),
        F.coalesce(F.sum("__s").over(woff), F.lit(0).cast("bigint")).alias(
            "__mass_off"
        ),
    )
    wloc = Window.partitionBy("freq", "__bw").orderBy("word")
    return (
        vocab.join(F.broadcast(offsets), on=["freq", "__bw"])
        .crossJoin(F.broadcast(total))
        .select(
            (F.col("__rank_off") + F.row_number().over(wloc))
            .cast("bigint")
            .alias("rank"),
            "word",
            "freq",
            F.round(
                (
                    F.col("__mass_off")
                    + F.sum("freq").over(
                        wloc.rowsBetween(Window.unboundedPreceding, 0)
                    )
                ).cast("double")
                / F.col("tot"),
                9,
            ).alias("cum_frac"),
        )
    )


@register(
    "gopher_quality_gate",
    oracle="""
WITH rep AS ({rep})
SELECT doc_id, n_tokens,
       (n_tokens BETWEEN 30 AND 95
        AND top2_frac <= 0.12 AND top3_frac <= 0.10
        AND dup5_frac <= 0.15 AND dup8_frac <= 0.10) AS passes
FROM rep
""",
)
def q_gopher_quality_gate(spark, sf_dir):
    """Gopher-rule document gate (Rae et al. 2021 §A1.1): pass iff the
    token count sits in [30, 95] AND every repetition signal is under
    its threshold (top-2-gram <= 0.12, top-3 <= 0.10, dup-5 <= 0.15,
    dup-8 <= 0.10 — token-denominated analogues of the paper's
    char-based cuts, tuned so each rule binds on this corpus). Composes
    repetition_signals with a pure boolean projection; the whole gate is
    oracled, so the kept-set is hash-checked — the filter a production
    pipeline would put directly before dedup."""
    from scikit_learn_imputer_spark.functions.repetition import repetition_signals

    rep = repetition_signals(_t(spark, sf_dir, "documents"))
    return rep.select(
        "doc_id", "n_tokens", _gopher_pass_cond().alias("passes")
    )


ORACLE["gopher_quality_gate"] = ORACLE["gopher_quality_gate"].replace(
    "{rep}", ORACLE["repetition_signals"]
)


def _ivf_balance_snapped_oracle(nlist: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled exact-integer Lloyd iteration (the
    ``_pagerank_snapped_oracle`` technique applied to KMeans): one
    assign/update CTE pair per round, BIGINT micro-unit state, md5 init,
    ties → lowest cell, empty cell keeps its centroid. DuckDB ``//``
    truncates toward zero, so floor division is spelled with an explicit
    nonnegative-operand branch matching Python's ``//`` on the Spark
    side."""
    d1 = dim + 1
    ctes = [
        """snapped AS (
  SELECT vec_id AS vid,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT CAST(rn - 1 AS INT) AS cell, v AS c FROM (
    SELECT v, row_number() OVER (ORDER BY md5(CAST(vid AS VARCHAR)), vid) AS rn
    FROM snapped
  ) WHERE rn <= {nlist}
)""",
    ]
    for k in range(iters + 1):
        ctes.append(
            f"""a{k} AS (
  SELECT vid, v, cell FROM (
    SELECT s.vid, s.v, c.cell,
           row_number() OVER (
             PARTITION BY s.vid
             ORDER BY CAST(list_sum(list_transform(range(1, {d1}),
                        i -> (s.v[i] - c.c[i]) * (s.v[i] - c.c[i]))) AS BIGINT),
                      c.cell) AS rn
    FROM snapped s CROSS JOIN c{k} c
  ) WHERE rn = 1
)"""
        )
        if k == iters:
            break
        ctes.append(
            f"""u{k} AS (
  SELECT a.cell, t.i, CAST(sum(a.v[t.i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM a{k} a, LATERAL unnest(generate_series(1, {dim})) AS t(i)
  GROUP BY a.cell, t.i
)""",
        )
        ctes.append(
            f"""c{k + 1} AS (
  SELECT p.cell, coalesce(u.newc, p.c) AS c
  FROM c{k} p LEFT JOIN (
    SELECT cell,
           list(CASE WHEN s >= 0 THEN s // n
                     ELSE -((-s + n - 1) // n) END ORDER BY i) AS newc
    FROM u{k} GROUP BY cell
  ) u ON u.cell = p.cell
)"""
        )
    ctes.append(
        f"hist AS (SELECT cell, CAST(count(*) AS BIGINT) AS n"
        f" FROM a{iters} GROUP BY cell)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST({nlist} AS INT) AS nlist,
       CAST(count(*) AS BIGINT) AS cells_used,
       CAST(sum(n) AS BIGINT) AS n_vectors,
       CAST(min(n) AS BIGINT) AS min_cell,
       CAST(max(n) AS BIGINT) AS max_cell,
       round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_cell,
       round(CAST(max(n) AS DOUBLE)
             / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS imbalance,
       round(CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
         AS max_cell_share
FROM hist
"""
    )


@register("ann_ivf_balance", oracle=_ivf_balance_snapped_oracle())
def q_ann_ivf_balance(spark, sf_dir):
    """IVF index balance audit, driver-HASH-checked (VERDICT r11 #1):
    per-cell population statistics (cells used, min/mean/max cell size,
    imbalance = max/mean, largest-cell share) — the operational check
    before trusting IVF probe latency and recall: a fat cell means some
    probes scan far more than corpus/nlist vectors, and empty cells
    waste nprobe budget. Cells come from the ENGINE-EXACT snapped
    integer Lloyd build (similarity/ivf.py:ivf_balance_snapped — the
    near_dup_pagerank_snapped technique applied to KMeans), so the
    WHOLE iterative build is oracled via unrolled CTEs; the MLlib
    production build keeps its anchored entry (ann_ivf_balance_mllib),
    exactly like minhash next to its md5 twin. Scale shape: centroids
    are O(nlist·dim) broadcast driver state; each round is one codegen
    argmin projection + one map-side-combined (cell, dim)-group sum."""
    from scikit_learn_imputer_spark.similarity.ivf import ivf_balance_snapped

    return ivf_balance_snapped(
        _t(spark, sf_dir, "embeddings"), nlist=8, iters=3
    )


@register(
    "ann_ivf_balance_mllib",
    oracle="""
SELECT CAST(8 AS INT) AS nlist,
       CAST(count(*) AS BIGINT) AS n_vectors,
       TRUE AS cells_used_ok,
       TRUE AS cell_ids_ok,
       TRUE AS min_cell_ok,
       TRUE AS imbalance_ge_1,
       TRUE AS max_share_ok
FROM embeddings
""",
)
def q_ann_ivf_balance_mllib(spark, sf_dir):
    """The PRODUCTION IVF balance audit over the MLlib KMeans build,
    now driver-HASH-checked via the invariant-audit technique (VERDICT
    r13 #2, the quality_model_scores pattern): the oracle computes from
    the input alone the total vector count the assignment MUST conserve,
    and pins TRUE for every structural invariant of a correct build —
    1..nlist cells used, every cell id inside [0, nlist), every cell
    non-empty, max >= mean (imbalance >= 1), and the largest cell's
    share inside (0, 1]. A lost/duplicated assignment breaks mass
    conservation; an out-of-range or empty-cell artifact flips its
    boolean — each turns this driver row red. The raw cell histogram
    (MLlib double-precision Lloyd, not SQL-expressible) stays
    registered as the anchored ann_ivf_balance_mllib_hist; the
    engine-exact snapped twin (ann_ivf_balance) remains fully
    value-oracled."""
    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    cells = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return cells.agg(
        F.lit(8).cast("int").alias("nlist"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).between(1, 8).alias("cells_used_ok"),
        (
            (F.min("cell") >= 0) & (F.max("cell") < 8)
        ).alias("cell_ids_ok"),
        (F.min("n") >= 1).alias("min_cell_ok"),
        (F.max("n") >= F.avg("n")).alias("imbalance_ge_1"),
        (
            (F.max("n") > 0) & (F.max("n") <= F.sum("n"))
        ).alias("max_share_ok"),
    )


@register(
    "ann_ivf_balance_mllib_hist",
    anchor="tests/test_pipeline_reports.py::test_ann_ivf_balance_mllib_anchor",
)
def q_ann_ivf_balance_mllib_hist(spark, sf_dir):
    """The raw PRODUCTION IVF balance histogram over the MLlib KMeans
    build — same statistics as ann_ivf_balance but on build_ivf_index's
    cells (double-precision Lloyd, MLlib internals not SQL-expressible
    → rows-only, anchored: mass conservation, bounds, determinism; the
    SQL-expressible invariants are driver-hashed via
    ann_ivf_balance_mllib)."""
    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    cells = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return cells.agg(
        F.lit(8).alias("nlist"),
        F.count(F.lit(1)).cast("bigint").alias("cells_used"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.min("n").cast("bigint").alias("min_cell"),
        F.max("n").cast("bigint").alias("max_cell"),
        F.round(F.avg("n"), 6).alias("mean_cell"),
        F.round(F.max("n") / F.avg("n"), 6).alias("imbalance"),
        F.round(F.max("n") / F.sum("n"), 6).alias("max_cell_share"),
    )


@register(
    "source_quality_matrix",
    oracle=r"""
WITH tq0 AS ({tq}), rep0 AS ({rep}), lm0 AS ({lm})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(round(t.q_score * 1e6) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e6, 6) AS mean_q_score,
       round(CAST(sum(CASE WHEN r.n_tokens BETWEEN 30 AND 95
                       AND r.top2_frac <= 0.12 AND r.top3_frac <= 0.10
                       AND r.dup5_frac <= 0.15 AND r.dup8_frac <= 0.10
                 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS gopher_pass_rate,
       round(CAST(sum(CAST(round(l.lm_score * 1e6) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e6, 6) AS mean_lm_score
FROM documents d
JOIN tq0 t USING (doc_id)
JOIN rep0 r USING (doc_id)
JOIN lm0 l USING (doc_id)
GROUP BY d.source
""",
)
def q_source_quality_matrix(spark, sf_dir):
    """Per-source quality dashboard: mean heuristic quality score,
    Gopher gate pass rate, and mean bigram-LM score per source — the
    table a mixture designer reads NEXT TO mixture_epoch_plan's
    weights, because upweighting a source is only sane against its
    quality profile. All three signals are per-doc map functions of the
    text, so they ride ONE fused projection (the gate-frame fusion,
    r15): quality battery + the Arrow masses pass + the literal-map LM
    score in a single corpus scan, zero doc-keyed joins (the former
    shape met three signal frames in three equi-joins); docs the LM
    cannot score (< 2 chars) are excluded exactly as the former inner
    join excluded them. One O(#sources) aggregate. Means are computed
    as integer micro-unit sums (snap each per-doc score to 1e-6, sum as
    BIGINT, divide once) so the aggregate is summation-order-invariant
    — a plain avg() over doubles differs between engines in the last
    ulp and can flip the 6th rounded decimal."""
    from scikit_learn_imputer_spark.functions.lm import (
        bigram_lm_inline,
        bigram_lm_scores,
    )
    from scikit_learn_imputer_spark.functions.repetition import (
        repetition_masses_udf,
        repetition_signals,
    )

    d = _t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    lm_build = bigram_lm_inline(d.select("text"))
    if lm_build is not None:
        masses = repetition_masses_udf((2, 3), (5, 8)).asNondeterministic()
        n_bg, lm_score = lm_build("text")
        t = F.trim(F.col("text"))
        ntok = (
            F.when(F.length(t) == 0, F.lit(0))
            .otherwise(F.size(F.split(t, "\\s+")))
            .cast("bigint")
        )
        denom = F.greatest(F.col("n_tokens"), F.lit(1))
        fr = lambda j: F.round(  # noqa: E731
            F.coalesce(F.element_at(F.col("__m"), j), F.lit(0)).cast(
                "double"
            )
            / denom,
            9,
        )
        sig = (
            quality_features(d.select("doc_id", "source", "text"))
            .select(
                "source",
                F.round(F.round(F.col("q_score"), 6) * 1e6)
                .cast("bigint")
                .alias("__q6"),
                ntok.alias("n_tokens"),
                masses(F.col("text")).alias("__m"),
                n_bg.alias("__nbg"),
                F.round(lm_score * 1e6).cast("bigint").alias("__l6"),
            )
            .select(
                "source",
                "__q6",
                "__l6",
                "__nbg",
                "n_tokens",
                fr(1).alias("top2_frac"),
                fr(2).alias("top3_frac"),
                fr(3).alias("dup5_frac"),
                fr(4).alias("dup8_frac"),
            )
            .select(
                "source",
                "__q6",
                "__l6",
                "__nbg",
                F.when(_gopher_pass_cond(), 1).otherwise(0).alias("__gp"),
            )
            .filter(F.col("__nbg") > 0)
        )
    else:
        # Join fallback for exotic alphabets (no literal LM map).
        tq = quality_features(d.select("doc_id", "text")).select(
            "doc_id", F.round("q_score", 6).alias("q_score")
        )
        rep = repetition_signals(d)
        gopher_pass = _gopher_pass_cond()
        rep_flag = rep.select(
            "doc_id", F.when(gopher_pass, 1).otherwise(0).alias("__gp")
        )
        lm = bigram_lm_scores(d).select("doc_id", "lm_score")
        sig = (
            d.select("doc_id", "source")
            .join(tq, "doc_id")
            .join(rep_flag, "doc_id")
            .join(lm, "doc_id")
            .select(
                "source",
                F.round(F.col("q_score") * 1e6).cast("bigint").alias("__q6"),
                "__gp",
                F.round(F.col("lm_score") * 1e6).cast("bigint").alias("__l6"),
            )
        )
    return (
        sig.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.round(F.sum("__q6").cast("double") / n / 1e6, 6).alias(
                "mean_q_score"
            ),
            F.round(F.sum("__gp").cast("double") / n, 6).alias(
                "gopher_pass_rate"
            ),
            F.round(F.sum("__l6").cast("double") / n / 1e6, 6).alias(
                "mean_lm_score"
            ),
        )
    )


@register(
    "quality_model_scores",
    oracle="""
WITH rep AS ({rep}),
hold AS (
  SELECT doc_id,
         CASE WHEN n_tokens BETWEEN 30 AND 95
               AND top2_frac <= 0.12 AND top3_frac <= 0.10
               AND dup5_frac <= 0.15 AND dup8_frac <= 0.10
              THEN 1 ELSE 0 END AS label
  FROM rep WHERE doc_id % 10 >= 8
)
SELECT CAST(count(*) AS BIGINT) AS n_holdout,
       CAST(sum(label) AS BIGINT) AS n_label_pos,
       CAST(count(*) AS BIGINT) AS probs_in_unit_interval,
       CAST(count(*) AS BIGINT) AS preds_binary,
       CAST(count(*) AS BIGINT) AS preds_match_threshold,
       TRUE AS accuracy_ge_080
FROM hold
""",
)
def q_quality_model_scores(spark, sf_dir):
    """Model-based quality filtering, driver-HASH-checked (VERDICT r11
    #1, the imputer_output_audit pattern): the expensive Gopher gate is
    the teacher; a seeded RandomForest learns its verdict from CHEAP
    map-only features (functions/quality_model.py). The oracle computes
    — from the input alone — what a correct holdout evaluation MUST
    produce (holdout count, teacher positive-label count, all
    probabilities in [0,1], all predictions binary and consistent with
    the 0.5 threshold, accuracy at/above the 0.8 anchor floor); the
    Spark side measures the ACTUAL MLlib output, so any violated
    invariant flips this driver row red. The raw per-doc holdout frame
    stays available as the anchored quality_model_holdout. At 100 TB:
    teacher runs once over a sample; the distilled gate scores the
    corpus as one codegen projection + broadcast model, no gram
    explodes."""
    from scikit_learn_imputer_spark.functions.quality_model import (
        quality_model_audit,
    )

    return quality_model_audit(_t(spark, sf_dir, "documents"))


@register(
    "quality_model_holdout",
    oracle="""
WITH rep AS ({rep}),
tq AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS q_chars,
         CAST(({ntok}) AS BIGINT) AS q_tokens,
         CAST({nstop} AS BIGINT) AS q_stop,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
              AS BIGINT) AS q_punct,
         ({qscore}) AS q_score
  FROM documents
),
feat AS MATERIALIZED (
  SELECT t.doc_id,
         CAST(CASE WHEN r.n_tokens BETWEEN 30 AND 95
               AND r.top2_frac <= 0.12 AND r.top3_frac <= 0.10
               AND r.dup5_frac <= 0.15 AND r.dup8_frac <= 0.10
              THEN 1 ELSE 0 END AS BIGINT) AS label,
         CAST(round(t.q_chars * 1e6) AS BIGINT) AS x0,
         CAST(round(t.q_tokens * 1e6) AS BIGINT) AS x1,
         CAST(round((CASE WHEN t.q_tokens > 0
              THEN CAST(t.q_chars - (t.q_tokens - 1) AS DOUBLE) / t.q_tokens
              ELSE 0.0 END) * 1e6) AS BIGINT) AS x2,
         CAST(round((CASE WHEN t.q_tokens > 0
              THEN CAST(t.q_stop AS DOUBLE) / t.q_tokens
              ELSE 0.0 END) * 1e6) AS BIGINT) AS x3,
         CAST(round((CASE WHEN t.q_chars > 0
              THEN CAST(t.q_punct AS DOUBLE) / t.q_chars
              ELSE 0.0 END) * 1e6) AS BIGINT) AS x4,
         CAST(round(t.q_score * 1e6) AS BIGINT) AS x5
  FROM tq t JOIN rep r USING (doc_id)
),
tl AS MATERIALIZED (
  SELECT label, 0 AS fidx, x0 AS x FROM feat WHERE doc_id % 10 < 8
  UNION ALL SELECT label, 1, x1 FROM feat WHERE doc_id % 10 < 8
  UNION ALL SELECT label, 2, x2 FROM feat WHERE doc_id % 10 < 8
  UNION ALL SELECT label, 3, x3 FROM feat WHERE doc_id % 10 < 8
  UNION ALL SELECT label, 4, x4 FROM feat WHERE doc_id % 10 < 8
  UNION ALL SELECT label, 5, x5 FROM feat WHERE doc_id % 10 < 8
),
thr AS (
  SELECT v.fidx, ti.tidx,
         v.vs[CAST(((v.n - 1) * ti.tidx) // 10 AS BIGINT) + 1] AS t
  FROM (SELECT fidx, list_sort(list(x)) AS vs,
               CAST(count(*) AS BIGINT) AS n
        FROM tl GROUP BY fidx) v
  CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS tidx) ti
),
cand AS (
  SELECT tl.fidx, thr.tidx, thr.t,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(tl.label) AS BIGINT) AS pos,
         CAST(sum(CASE WHEN tl.x >= thr.t THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ge,
         CAST(sum(CASE WHEN tl.x >= thr.t THEN tl.label ELSE 0 END)
              AS BIGINT) AS pos_ge
  FROM tl JOIN thr ON tl.fidx = thr.fidx
  GROUP BY 1, 2, 3
),
best AS (
  SELECT fidx, t, n_ge, pos_ge,
         n - n_ge AS n_lt, pos - pos_ge AS pos_lt
  FROM cand
  ORDER BY (greatest(pos_ge, n_ge - pos_ge)
            + greatest(pos - pos_ge, (n - n_ge) - (pos - pos_ge))) DESC,
           fidx ASC, tidx ASC
  LIMIT 1
),
leafed AS (
  SELECT h.doc_id, h.label,
         CASE WHEN (CASE b.fidx WHEN 0 THEN h.x0 WHEN 1 THEN h.x1
                    WHEN 2 THEN h.x2 WHEN 3 THEN h.x3 WHEN 4 THEN h.x4
                    ELSE h.x5 END) >= b.t
              THEN b.n_ge ELSE b.n_lt END AS leaf_n,
         CASE WHEN (CASE b.fidx WHEN 0 THEN h.x0 WHEN 1 THEN h.x1
                    WHEN 2 THEN h.x2 WHEN 3 THEN h.x3 WHEN 4 THEN h.x4
                    ELSE h.x5 END) >= b.t
              THEN b.pos_ge ELSE b.pos_lt END AS leaf_pos
  FROM (SELECT * FROM feat WHERE doc_id % 10 >= 8) h, best b
)
SELECT doc_id, label,
       CASE WHEN leaf_n > 0
            THEN ((1000000 * leaf_pos) // leaf_n) / 1e6
            ELSE 0.5 END AS p_good,
       CAST(CASE WHEN leaf_n > 0 AND 2 * leaf_pos > leaf_n
            THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM leafed
""",
)
def q_quality_model_holdout(spark, sf_dir):
    """The per-doc distilled-gate holdout evaluation (doc_id, teacher
    label, p_good, verdict) on the modular 20% split, driver-HASH-
    checked end to end (VERDICT r12 #4 — the ivf_balance_snapped
    technique applied to model distillation): an ENGINE-EXACT decision
    stump with empirical leaf probabilities, trained on the same
    snapped cheap features and split as the production RandomForest
    (kept as the anchored quality_model_holdout_rf). Candidate
    thresholds are exact-rank train deciles (the distributed banded
    selection from stats.py:exact_rank_quantiles — no corpus-sized
    buffer on the Spark side; the oracle's list_sort twin is DuckDB-
    local), candidate scoring is one 54-group map-side aggregate, and
    holdout scoring is a broadcast projection."""
    from scikit_learn_imputer_spark.functions.quality_model import (
        quality_model_holdout_snapped,
    )

    return quality_model_holdout_snapped(_t(spark, sf_dir, "documents"))


@register(
    "quality_model_holdout_rf",
    oracle="""
WITH rep AS ({rep}),
hold AS (
  SELECT doc_id,
         CASE WHEN n_tokens BETWEEN 30 AND 95
               AND top2_frac <= 0.12 AND top3_frac <= 0.10
               AND dup5_frac <= 0.15 AND dup8_frac <= 0.10
              THEN 1 ELSE 0 END AS label
  FROM rep WHERE doc_id % 10 >= 8
)
SELECT CAST(count(*) AS BIGINT) AS n_holdout,
       CAST(sum(label) AS BIGINT) AS n_label_pos,
       TRUE AS labels_agree,
       TRUE AS preds_threshold_consistent,
       TRUE AS rf_accuracy_ge_080,
       TRUE AS stump_agreement_ge_080
FROM hold
""",
)
def q_quality_model_holdout_rf(spark, sf_dir):
    """The PRODUCTION distilled-gate holdout (seeded MLlib
    RandomForest), now driver-HASH-checked via the invariant-audit
    technique extended with a cross-model agreement floor (VERDICT r13
    #2): the oracle computes the holdout size and teacher
    positive-label count from the input alone, and pins TRUE for
    everything a correct RF run MUST satisfy — full per-doc join
    coverage against the SQL-expressible snapped-stump twin
    (quality_model_holdout, driver-hashed), identical teacher labels,
    probability/threshold consistency, the 0.8 accuracy anchor floor,
    and >= 80% per-doc agreement with the stump. The raw per-doc RF
    frame stays registered as the anchored
    quality_model_holdout_rf_frame."""
    from scikit_learn_imputer_spark.functions.quality_model import (
        quality_model_rf_agreement_audit,
    )

    return quality_model_rf_agreement_audit(_t(spark, sf_dir, "documents"))


@register(
    "quality_model_holdout_rf_frame",
    anchor="tests/test_pipeline_reports.py::test_quality_model_holdout_rf_anchor",
)
def q_quality_model_holdout_rf_frame(spark, sf_dir):
    """The raw PRODUCTION distilled-gate holdout frame: seeded MLlib
    RandomForest (deeper hypothesis class than the driver-hashed stump
    twin — quality_model_holdout). MLlib tree internals are not
    SQL-expressible — rows-only, with a NAMED anchor pinning a
    holdout-accuracy floor and determinism; its SQL-expressible
    invariants are driver-hashed via quality_model_scores AND the
    agreement audit quality_model_holdout_rf."""
    from scikit_learn_imputer_spark.functions.quality_model import (
        quality_model_scores,
    )

    return quality_model_scores(_t(spark, sf_dir, "documents"))


ORACLE["quality_model_scores"] = ORACLE["quality_model_scores"].replace(
    "{rep}", ORACLE["repetition_signals"]
)
ORACLE["quality_model_holdout_rf"] = ORACLE[
    "quality_model_holdout_rf"
].replace("{rep}", ORACLE["repetition_signals"])
ORACLE["quality_model_holdout"] = (
    ORACLE["quality_model_holdout"]
    .replace("{rep}", ORACLE["repetition_signals"])
    .replace("{ntok}", _NTOK_SQL)
    .replace("{nstop}", _NSTOP_SQL)
    .replace("{qscore}", _QSCORE_SQL)
)


def _gopher_pass_cond():
    """The Gopher repetition-gate predicate — SINGLE SOURCE OF TRUTH for
    the thresholds shared by gopher_quality_gate, filter_waterfall, and
    gate_ablation (gate_ablation's contract is that it ablates exactly
    the waterfall's gates; sharing the Column expr makes that
    structural, not copy-paste)."""
    return (
        F.col("n_tokens").between(30, 95)
        & (F.col("top2_frac") <= 0.12)
        & (F.col("top3_frac") <= 0.10)
        & (F.col("dup5_frac") <= 0.15)
        & (F.col("dup8_frac") <= 0.10)
    )


def _quality_pass_cond():
    """The text-quality gate shared across the corpus pipelines —
    applied to whatever q_score/q_tokens columns are in scope (the
    waterfall/ablation evaluate it over 6-dp-rounded scores, the
    corpus pipelines over raw quality_features output; each query's
    oracle mirrors its own variant)."""
    return (F.col("q_score") >= 0.5) & (F.col("q_tokens") >= 20)


def _contam_doc_ids(frame, bench, n=5):
    """doc_ids in ``frame`` sharing ANY word n-gram with ``bench`` —
    the decontamination membership both the waterfall and the ablation
    evaluate. Grams collapse to md5 digests for one left-semi join;
    text never shuffles. The gram explodes get the parallelism floor
    (r15): both inputs often arrive as one partition (small scans,
    post-semi-join checkpoints)."""
    from scikit_learn_imputer_spark.functions.skew import fan_out
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    bench_g = (
        fan_out(bench)
        .select(F.explode(word_ngrams_col(F.col("text"), n)).alias("g"))
        .select(F.md5("g").alias("gd"))
        .distinct()
    )
    return (
        fan_out(frame)
        .select(
            "doc_id", F.explode(word_ngrams_col(F.col("text"), n)).alias("g")
        )
        .select("doc_id", F.md5("g").alias("gd"))
        .join(bench_g, "gd", "left_semi")
        .select("doc_id")
        .distinct()
    )


@register(
    "filter_waterfall",
    oracle=r"""
WITH rep0 AS ({rep}), tq0 AS ({tq}),
fp0 AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id % 100 >= 2
),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 >= 2)
  ) WHERE g IN (SELECT g FROM bg)
),
wf AS (
  SELECT r.doc_id, r.n_tokens, fp0.fp,
         (fp0.lang <> 'en') AS fail_lang,
         NOT (t.q_score >= 0.5 AND t.q_tokens >= 20) AS fail_quality,
         NOT (r.n_tokens BETWEEN 30 AND 95
              AND r.top2_frac <= 0.12 AND r.top3_frac <= 0.10
              AND r.dup5_frac <= 0.15 AND r.dup8_frac <= 0.10) AS fail_gopher,
         (c.doc_id IS NOT NULL) AS is_contam
  FROM rep0 r
  JOIN tq0 t USING (doc_id)
  JOIN fp0 USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
),
keepers AS (
  SELECT fp, min(doc_id) AS keep_id FROM wf
  WHERE NOT fail_lang AND NOT fail_quality AND NOT fail_gopher
  GROUP BY fp
),
staged AS (
  SELECT wf.n_tokens,
         CASE WHEN fail_lang THEN 1
              WHEN fail_quality THEN 2
              WHEN fail_gopher THEN 3
              WHEN wf.doc_id <> k.keep_id THEN 4
              WHEN is_contam THEN 5 ELSE 6 END AS stage_order
  FROM wf LEFT JOIN keepers k USING (fp)
)
SELECT CAST(stage_order AS INTEGER) AS stage_order,
       CASE stage_order WHEN 1 THEN 'lang' WHEN 2 THEN 'quality'
            WHEN 3 THEN 'gopher' WHEN 4 THEN 'exact_dup'
            WHEN 5 THEN 'decontam' ELSE 'kept' END AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM staged GROUP BY 1, 2
""",
)
def q_filter_waterfall(spark, sf_dir):
    """Filtering waterfall: every corpus doc attributed to the FIRST
    pipeline stage that drops it — lang gate (on the corpus's lang
    column — upstream lang-ID output; the in-engine heuristic
    lang_id_col predicts 'en' corpus-wide on this synthetic text, which
    would make the stage vacuous) → quality gate → Gopher
    repetition gate → exact dedup (keeper = min doc_id per fingerprint
    among gate survivors, pipeline-faithful) → n-gram decontamination
    vs the pseudo benchmark (doc_id % 100 < 2) — with doc and token
    mass per stage. THE ops report for a data run: which gate costs
    how much corpus, before anyone tunes thresholds. All per-doc
    signals are map-side projections/explodes; the joins are equi on
    doc_id / 16-byte digests; output is O(#stages).

    Survivor policy (VERDICT r7 #7, documented decision): the exact-dup
    stage keeps MIN-ID — the waterfall is an attribution REPORT whose
    stage assignment must be stable across runs and engines, and min-id
    is the only policy with no signal dependence. Quality-argmax keeper
    selection is a selection-time concern, exercised by
    exact_dup_groups_quality / near_dup_best_survivors and available to
    pipelines via exact_dedup(keep='quality');
    tests/test_pipeline_reports.py pins that this stage's drops equal
    exact_dedup(keep='min') drops on a duplicated corpus."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)

    # ONE-PASS per-doc signal frame (optimization round 14, guide
    # §2.4/§4.4): every per-doc gate signal — token count, rounded
    # quality score, the four repetition fractions (one Arrow masses
    # pass), the dedup fingerprint — is computed in a single corpus
    # projection and the NARROW result (no text) is checkpointed once.
    # The former survivor-chained id-set shape referenced each gate
    # frame twice (semi-join + attribution mark), and every reference
    # re-planned the whole upstream subtree: the lazy plan held SIX
    # clones of the repetition evaluation and five doc-keyed joins.
    # First-fail attribution is a row-local CASE over the signal
    # columns (exactly the oracle's shape), so only the two genuinely
    # corpus-level stages — exact-dup keepers and decontamination —
    # remain joins. Survivor restriction is kept where it pays: the
    # 5-gram decontamination explode still runs only over stage-4
    # survivors' text. At 100 TB: one signal pass + its narrow
    # materialization (what a production pipeline persists anyway)
    # instead of re-deriving the gate chain per consumer.
    from scikit_learn_imputer_spark.functions.repetition import (
        repetition_masses_udf,
    )

    t = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    masses = repetition_masses_udf((2, 3), (5, 8)).asNondeterministic()
    # quality_features floors the signal pass's parallelism internally
    # (r15): the corpus scan is ONE partition at bench SF, which would
    # serialize the Arrow masses + regex battery on a single core.
    qf = quality_features(corpus.select("doc_id", "lang", "text"))
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    frac = lambda j: F.round(  # noqa: E731
        F.coalesce(F.element_at(F.col("__m"), j), F.lit(0)).cast("double")
        / denom,
        9,
    )
    sig = (
        qf.select(
            "doc_id",
            "lang",
            ntok.alias("n_tokens"),
            fingerprint_col(F.col("text")).alias("__fp"),
            masses(F.col("text")).alias("__m"),
            "q_tokens",
            F.round("q_score", 6).alias("q_score"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "__fp",
            "q_tokens",
            "q_score",
            frac(1).alias("top2_frac"),
            frac(2).alias("top3_frac"),
            frac(3).alias("dup5_frac"),
            frac(4).alias("dup8_frac"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "__fp",
            # m2/m3 replicate the old semi-join membership exactly:
            # q_pass was computed over lang=='en' docs only, so a NULL
            # lang doc lands at stage 2 (not in lang_pass) even though
            # the first-fail CASE's lang arm skips it. Gopher applies
            # over the m2 survivors; the repetition fractions are never
            # null (masses coalesce to 0) and n_tokens can only be null
            # for null text, which already failed quality.
            F.coalesce(
                (F.col("lang") == "en") & _quality_pass_cond(), F.lit(False)
            ).alias("__m2"),
            F.coalesce(
                (F.col("lang") == "en")
                & _quality_pass_cond()
                & _gopher_pass_cond(),
                F.lit(False),
            ).alias("__m3"),
        )
    )
    sig = sig.localCheckpoint(eager=True)

    keepers = (
        sig.filter(F.col("__m3"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("__keep_id"))
    )
    sigk = sig.join(keepers, "__fp", "left").withColumn(
        "__m4", F.col("__m3") & (F.col("doc_id") == F.col("__keep_id"))
    )
    surv_ids = sigk.filter(F.col("__m4")).select("doc_id")
    contam_ids = _contam_doc_ids(
        corpus.join(surv_ids, "doc_id", "left_semi"), bench
    )
    staged = sigk.join(
        contam_ids.withColumn("__c5", F.lit(True)), "doc_id", "left"
    ).select(
        F.when(F.col("lang") != "en", 1)
        .when(~F.col("__m2"), 2)
        .when(~F.col("__m3"), 3)
        .when(~F.col("__m4"), 4)
        .when(F.col("__c5"), 5)
        .otherwise(6)
        .alias("stage_order"),
        "n_tokens",
    )
    stage_name = (
        F.when(F.col("stage_order") == 1, "lang")
        .when(F.col("stage_order") == 2, "quality")
        .when(F.col("stage_order") == 3, "gopher")
        .when(F.col("stage_order") == 4, "exact_dup")
        .when(F.col("stage_order") == 5, "decontam")
        .otherwise("kept")
    )
    return (
        staged.groupBy("stage_order")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("stage_order").cast("int").alias("stage_order"),
            stage_name.alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )


ORACLE["filter_waterfall"] = (
    ORACLE["filter_waterfall"]
    .replace("{rep}", ORACLE["repetition_signals"])
    .replace("{tq}", ORACLE["text_quality"])
)


@register(
    "filter_waterfall_scrubbed",
    oracle=r"""
WITH corpus0 AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 100 >= 2
),
pp AS (
  SELECT doc_id, i - 1 AS pos, ps[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM corpus0) t,
       UNNEST(generate_series(1, len(ps))) AS u(i)
),
pdg AS (
  SELECT doc_id, pos, para,
         md5(regexp_replace(lower(trim(para)), '\s+', ' ', 'g')) AS digest,
         length(trim(para)) = 0 AS is_empty
  FROM pp
),
phot AS (
  SELECT digest FROM pdg WHERE NOT is_empty
  GROUP BY digest HAVING count(*) >= 2
),
pmarked AS (
  SELECT d.doc_id, d.pos, d.para,
         (d.is_empty OR h.digest IS NULL) AS keep
  FROM pdg d LEFT JOIN phot h ON d.digest = h.digest
),
scrubbed AS (
  SELECT m.doc_id, any_value(c.lang) AS lang,
         coalesce(string_agg(m.para, chr(10) ORDER BY m.pos)
                  FILTER (WHERE m.keep), '') AS text,
         CAST(count(*) FILTER (WHERE NOT m.keep) AS BIGINT) AS n_removed
  FROM pmarked m JOIN corpus0 c USING (doc_id)
  GROUP BY m.doc_id
),
ntoks AS (
  SELECT s.doc_id,
         CAST(CASE WHEN length(trim(c.text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(c.text), '\s+')) END AS BIGINT)
           AS orig_tokens,
         CAST(CASE WHEN length(trim(s.text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(s.text), '\s+')) END AS BIGINT)
           AS n_tokens,
         s.n_removed
  FROM scrubbed s JOIN corpus0 c USING (doc_id)
),
rep0 AS ({rep}), tq0 AS ({tq}),
fp0 AS (
  SELECT doc_id, lang,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM scrubbed
),
lmbg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 1, 0)),
                               i -> substr(lower(text), CAST(i AS INT), 2))) AS bigram
  FROM scrubbed
),
lmcounts AS (SELECT bigram, count(*) AS c FROM lmbg GROUP BY bigram),
lmprefix AS (SELECT substr(bigram, 1, 1) AS prefix, sum(c) AS pc
             FROM lmcounts GROUP BY 1),
lmvocab AS (SELECT count(DISTINCT substr(bigram, 2, 1)) AS v FROM lmcounts),
lmterms AS (
  SELECT b.doc_id,
         CAST(round(ln((c.c + 1)::DOUBLE / (p.pc + lmvocab.v)::DOUBLE) * 1e6)
              AS BIGINT) AS m
  FROM lmbg b
  JOIN lmcounts c USING (bigram)
  JOIN lmprefix p ON p.prefix = substr(b.bigram, 1, 1)
  CROSS JOIN lmvocab
),
lmscore AS (
  SELECT doc_id, round(sum(m)::DOUBLE / count(*) / 1e6, 6) AS lm
  FROM lmterms GROUP BY doc_id
),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM scrubbed)
  ) WHERE g IN (SELECT g FROM bg)
),
wf AS (
  SELECT r.doc_id, nt.n_tokens, fp0.fp,
         (fp0.lang <> 'en') AS fail_lang,
         NOT (t.q_score >= 0.5 AND t.q_tokens >= 20) AS fail_quality,
         NOT (r.n_tokens BETWEEN 30 AND 95
              AND r.top2_frac <= 0.12 AND r.top3_frac <= 0.10
              AND r.dup5_frac <= 0.15 AND r.dup8_frac <= 0.10) AS fail_gopher,
         NOT (l.lm IS NOT NULL AND l.lm >= -1.75) AS fail_lm,
         (c.doc_id IS NOT NULL) AS is_contam
  FROM rep0 r
  JOIN tq0 t USING (doc_id)
  JOIN fp0 USING (doc_id)
  JOIN ntoks nt USING (doc_id)
  LEFT JOIN lmscore l USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
),
keepers AS (
  SELECT fp, min(doc_id) AS keep_id FROM wf
  WHERE NOT fail_lang AND NOT fail_quality AND NOT fail_gopher
    AND NOT fail_lm
  GROUP BY fp
),
staged AS (
  SELECT wf.n_tokens,
         CASE WHEN fail_lang THEN 1
              WHEN fail_quality THEN 2
              WHEN fail_gopher THEN 3
              WHEN fail_lm THEN 4
              WHEN wf.doc_id <> k.keep_id THEN 5
              WHEN is_contam THEN 6 ELSE 7 END AS stage_order
  FROM wf LEFT JOIN keepers k USING (fp)
)
SELECT CAST(0 AS INTEGER) AS stage_order,
       'paragraph_scrub' AS stage,
       CAST(count(*) FILTER (WHERE n_removed > 0) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(orig_tokens - n_tokens), 0) AS BIGINT) AS n_tokens
FROM ntoks
UNION ALL
SELECT CAST(stage_order AS INTEGER) AS stage_order,
       CASE stage_order WHEN 1 THEN 'lang' WHEN 2 THEN 'quality'
            WHEN 3 THEN 'gopher' WHEN 4 THEN 'lm_score'
            WHEN 5 THEN 'exact_dup' WHEN 6 THEN 'decontam'
            ELSE 'kept' END AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM staged GROUP BY 1, 2
""",
)
def q_filter_waterfall_scrubbed(spark, sf_dir):
    """The full-pipeline waterfall (VERDICT r7 #4): filter_waterfall
    extended with the round-7 operators as first-class stages —

    - stage 0 ``paragraph_scrub``: RefinedWeb paragraph dedup runs
      FIRST and reports its removed token MASS (docs aren't dropped,
      their boilerplate is); every later stage evaluates the SCRUBBED
      text, so kept-token-mass accounting stays exact:
      scrub mass + sum(stage masses) == original corpus mass (pinned by
      test). On this synthetic corpus (no newlines, no exact-dup texts)
      the stage reports zero — the multi-paragraph semantics are pinned
      by the dedup_paragraphs unit/property tests;
    - stage 4 ``lm_score``: the MODEL-score gate — the corpus-trained
      char-bigram LM (functions/lm.py, the oracled stand-in for the
      RF-distilled quality model, which has no SQL twin) gates at mean
      log-prob >= -1.75; docs too short to score fail the gate.

    First-fail attribution preserved: lang → quality → gopher →
    lm_score → exact_dup → decontam → kept, survivor-chained exactly
    like filter_waterfall (each gate's signals computed only on the
    previous gate's survivors; the LM TRAINS once on the whole scrubbed
    corpus — model training is corpus-level, not survivor-level)."""
    staged, scrub_row = _waterfall_scrubbed_staged(spark, sf_dir)
    stage_name = (
        F.when(F.col("stage_order") == 1, "lang")
        .when(F.col("stage_order") == 2, "quality")
        .when(F.col("stage_order") == 3, "gopher")
        .when(F.col("stage_order") == 4, "lm_score")
        .when(F.col("stage_order") == 5, "exact_dup")
        .when(F.col("stage_order") == 6, "decontam")
        .otherwise("kept")
    )
    stages = (
        staged.groupBy("stage_order")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("stage_order").cast("int").alias("stage_order"),
            stage_name.alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )
    return scrub_row.unionByName(stages)


def _waterfall_scrubbed_staged(spark, sf_dir):
    """The per-document half of the scrubbed waterfall, shared by
    filter_waterfall_scrubbed (aggregates it) and the tokenized
    capstone (tokenizes its kept set): returns ``(staged, scrub_row)``
    where ``staged`` carries (doc_id, source, text[scrubbed], n_tokens,
    stage_order 1..7) and ``scrub_row`` is the stage-0 mass row."""
    from scikit_learn_imputer_spark.dedup.paragraphs import dedup_paragraphs
    from scikit_learn_imputer_spark.functions.lm import (
        bigram_lm_inline,
        bigram_lm_scores,
    )
    from scikit_learn_imputer_spark.functions.repetition import repetition_signals

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus0 = d.filter(F.col("doc_id") % 100 >= 2).select(
        "doc_id", "source", "lang", "text"
    )

    t0 = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t0) == 0, F.lit(0))
        .otherwise(F.size(F.split(t0, "\\s+")))
        .cast("bigint")
    )
    orig = corpus0.select("doc_id", ntok.alias("__orig_tokens"))
    scr = dedup_paragraphs(corpus0, min_count=2)
    s0 = scr.select(
        "doc_id",
        "source",
        "lang",
        "text",
        ntok.alias("n_tokens"),
        "n_paragraphs_removed",
    )
    # The scrubbed corpus feeds the mass row, every gate's signals, the
    # LM model, and the final attribution join. Left lazy, Catalyst
    # clones the ENTIRE paragraph-dedup subtree into each reference and
    # the clones compound through the survivor chain — measured ~240
    # file scans in the physical plan at 7 stages. One lineage
    # truncation here (what a production pipeline does by persisting the
    # scrubbed corpus between stages) pins the scrub to a single
    # materialization; every downstream stage plans against the leaf.
    s0 = s0.localCheckpoint(eager=True)

    scrub_row = (
        s0.join(orig, "doc_id")
        .agg(
            F.count_if(F.col("n_paragraphs_removed") > 0).alias("n_docs"),
            F.coalesce(
                F.sum(F.col("__orig_tokens") - F.col("n_tokens")), F.lit(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        .select(
            F.lit(0).cast("int").alias("stage_order"),
            F.lit("paragraph_scrub").alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )

    # ONE-PASS per-doc signal frame over the checkpointed scrubbed
    # corpus (optimization round 14 — same restructure as
    # q_filter_waterfall, see its design note): quality score, the four
    # repetition fractions (one Arrow masses pass), the dedup
    # fingerprint and the LM verdict (model trained on the WHOLE
    # scrubbed corpus — training is corpus-level; scoring is the
    # literal-map projection) all land in a single narrow checkpointed
    # frame; first-fail attribution is a row-local CASE, and only the
    # corpus-level stages (exact-dup keepers, decontamination over
    # stage-5 survivors' scrubbed text) remain joins. This replaces the
    # pass1234 checkpoint + five doc-keyed attribution joins whose
    # clones re-ran the repetition/LM subtrees.
    from scikit_learn_imputer_spark.functions.repetition import (
        repetition_masses_udf,
    )

    masses = repetition_masses_udf((2, 3), (5, 8)).asNondeterministic()
    # The signal pass (quality features + the Arrow masses UDF + the
    # fingerprint + the inline LM verdict) is the CPU-bound per-doc
    # stage, and the scrub checkpoint lands in ONE partition at bench SF
    # (AQE coalesces the small scrub output) — quality_features floors
    # its parallelism internally (r15; no-op at real corpus scale).
    qf = quality_features(
        s0.select("doc_id", "source", "lang", "n_tokens", "text")
    )
    # The LM verdict rides the SAME projection as the other signals
    # (r15, guide §2.4): training is the bounded O(alphabet²) count
    # collect over the checkpointed scrub (the collect
    # bigram_lm_scores' literal path performs anyway), scoring is two
    # more columns in the signal pass — the former per-doc score frame
    # and its doc-keyed LEFT join (one shuffle of the whole corpus)
    # disappear. NULL semantics preserved exactly: a doc the LM cannot
    # score (no bigrams) gets NULL __lm_ok, as the left join produced.
    lm_build = bigram_lm_inline(s0.select("text"))
    if lm_build is not None:
        n_bg, lm_score = lm_build("text")
        lm_ok = F.when(
            n_bg > 0, F.round(lm_score, 6) >= -1.75
        ).alias("__lm_ok")
        lm_join = None
    else:
        lm_ok = None
        lm_join = bigram_lm_scores(s0.select("doc_id", "text")).select(
            "doc_id",
            (F.round(F.col("lm_score"), 6) >= -1.75).alias("__lm_ok"),
        )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    frac = lambda j: F.round(  # noqa: E731
        F.coalesce(F.element_at(F.col("__m"), j), F.lit(0)).cast("double")
        / denom,
        9,
    )
    sig = (
        qf.select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "text",
            fingerprint_col(F.col("text")).alias("__fp"),
            masses(F.col("text")).alias("__m"),
            "q_tokens",
            F.round("q_score", 6).alias("q_score"),
        )
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "__fp",
            "q_tokens",
            "q_score",
            frac(1).alias("top2_frac"),
            frac(2).alias("top3_frac"),
            frac(3).alias("dup5_frac"),
            frac(4).alias("dup8_frac"),
            *([] if lm_join is not None else [lm_ok]),
        )
    )
    if lm_join is not None:
        sig = sig.join(lm_join, "doc_id", "left")
    sig = (
        sig.select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "__fp",
            # Same membership semantics as the former semi-join chain
            # (see q_filter_waterfall): NULL-lang docs land at stage 2,
            # docs the LM could not score (no bigrams) fail the lm gate.
            F.coalesce(
                (F.col("lang") == "en") & _quality_pass_cond(), F.lit(False)
            ).alias("__m2"),
            F.coalesce(
                (F.col("lang") == "en")
                & _quality_pass_cond()
                & _gopher_pass_cond(),
                F.lit(False),
            ).alias("__m3"),
            F.coalesce(
                (F.col("lang") == "en")
                & _quality_pass_cond()
                & _gopher_pass_cond()
                & F.col("__lm_ok"),
                F.lit(False),
            ).alias("__m4"),
        )
    )
    sig = sig.localCheckpoint(eager=True)

    keepers = (
        sig.filter(F.col("__m4"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("__keep_id"))
    )
    sigk = sig.join(keepers, "__fp", "left").withColumn(
        "__m5", F.col("__m4") & (F.col("doc_id") == F.col("__keep_id"))
    )
    surv_ids = sigk.filter(F.col("__m5")).select("doc_id")
    contam_ids = _contam_doc_ids(
        s0.join(surv_ids, "doc_id", "left_semi"), bench
    )
    staged = (
        sigk.join(
            contam_ids.withColumn("__c6", F.lit(True)), "doc_id", "left"
        )
        .join(s0.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "source",
            "text",
            "n_tokens",
            F.when(F.col("lang") != "en", 1)
            .when(~F.col("__m2"), 2)
            .when(~F.col("__m3"), 3)
            .when(~F.col("__m4"), 4)
            .when(~F.col("__m5"), 5)
            .when(F.col("__c6"), 6)
            .otherwise(7)
            .alias("stage_order"),
        )
    )
    return staged, scrub_row


ORACLE["filter_waterfall_scrubbed"] = (
    ORACLE["filter_waterfall_scrubbed"]
    .replace("{rep}", ORACLE["repetition_signals"].replace("FROM documents", "FROM scrubbed"))
    .replace("{tq}", ORACLE["text_quality"].replace("FROM documents", "FROM scrubbed"))
)


@register(
    "shuffle_sequences",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
), seqs AS (
  SELECT DISTINCT source, CAST(cum_prev // 512 AS BIGINT) AS seq_id FROM c
)
SELECT source, seq_id,
       CAST(row_number() OVER (
         ORDER BY md5('42:' || source || ':' || CAST(seq_id AS VARCHAR)),
                  source, seq_id
       ) AS BIGINT) AS position
FROM seqs
""",
)
def q_shuffle_sequences(spark, sf_dir):
    """Seeded training-order shuffle of packed sequences
    (operators/shuffle.py): every (shard, seq_id) unit gets its 1-based
    position in the md5(seed:...)-keyed global permutation — the
    reproducible order a training loader consumes. The global rank is
    two-phase (hash-prefix buckets + broadcast offsets): deterministic
    (no repartitionByRange sampling), no single-partition window, the
    only global-order window ranks the O(256)-row bucket-count frame."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import shuffle_sequences

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return shuffle_sequences(packed, seed=42)


@register(
    "training_shards",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
), seqs AS (
  SELECT DISTINCT source, CAST(cum_prev // 512 AS BIGINT) AS seq_id FROM c
), pos AS (
  SELECT CAST(row_number() OVER (
           ORDER BY md5('42:' || source || ':' || CAST(seq_id AS VARCHAR)),
                    source, seq_id
         ) AS BIGINT) AS position
  FROM seqs
)
SELECT CAST((position - 1) // 16 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_sequences,
       CAST(min(position) AS BIGINT) AS first_position,
       CAST(max(position) AS BIGINT) AS last_position
FROM pos GROUP BY 1
""",
)
def q_training_shards(spark, sf_dir):
    """Training-shard manifest over the shuffled sequence permutation
    (operators/shuffle.py:training_shards): contiguous position ranges
    of 16 sequences per shard — counts and ranges per shard, the
    loader-facing index. A small aggregate on top of shuffle_sequences;
    the physical shard write is the same expression as a partitionBy
    column."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffle_sequences,
        training_shards,
    )

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return training_shards(shuffle_sequences(packed, seed=42), shard_size=16)


@register("write_training_shards", oracle=ORACLE["training_shards"])
def q_write_training_shards(spark, sf_dir):
    """PHYSICAL training-shard writer (VERDICT r6 #5): the shuffled
    sequence permutation is written as partitionBy('shard_id') parquet
    (operators/shuffle.py:write_training_shards — repartition on the
    shard key first, so each shard directory holds exactly one
    position-sorted file), then read BACK from disk and re-aggregated
    into the manifest. The oracle is training_shards' own SQL, so the
    round trip is hash-checked: what landed on disk must reproduce the
    manifest's per-shard counts and position ranges exactly. The write
    lands in a per-invocation mkdtemp dir and the manifest is
    materialized before cleanup (ADVICE r7: a fixed /tmp path raced
    concurrent bench runs at the same sf) — see
    operators/shuffle.py:write_training_shards_manifest."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffle_sequences,
        write_training_shards_manifest,
    )

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    shuffled = shuffle_sequences(packed, seed=42)
    return write_training_shards_manifest(shuffled, shard_size=16)


def _bpe_count_ctes() -> str:
    """btoks..bcounts — the greedy longest-prefix count CTEs over
    whatever ``vocab(v)`` CTE precedes them (pinned VALUES literal or a
    learned-merge derivation)."""
    return r"""btoks AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), bwx AS (
  SELECT doc_id, unnest(tk) AS word FROM btoks
), bwords AS (
  SELECT DISTINCT word FROM bwx
), bstep(word, rest, cnt) AS (
  SELECT word, word, 0 FROM bwords
  UNION ALL
  SELECT word,
         substr(rest, coalesce((SELECT max(length(v)) FROM vocab
                                WHERE substr(rest, 1, length(v)) = v), 1) + 1),
         cnt + 1
  FROM bstep WHERE rest <> ''
), bwcount AS (
  SELECT word, cnt FROM bstep WHERE rest = ''
), bcounts AS (
  SELECT b.doc_id, b.source, CAST(coalesce(s.n, 0) AS BIGINT) AS n_bpe_tokens
  FROM btoks b
  LEFT JOIN (
    SELECT bwx.doc_id, sum(bwcount.cnt) AS n
    FROM bwx JOIN bwcount USING (word) GROUP BY bwx.doc_id
  ) s USING (doc_id)
)"""


def _bpe_cte() -> str:
    """Shared recursive-CTE segmentation over the pinned vocab — the SQL
    twin of functions/bpe.py's greedy longest-prefix-match counter.
    Yields CTEs: vocab(v), btoks(doc_id, source, tk), bwords, bstep,
    bwcount(word, cnt), bcounts(doc_id, source, n_bpe_tokens)."""
    from scikit_learn_imputer_spark.functions.bpe import vocab_values_sql

    return f"vocab(v) AS (VALUES {vocab_values_sql()}),\n" + _bpe_count_ctes()


def _bpe_learn_parts(
    k: int, prefix: str = "", where: str = ""
) -> tuple[list, list]:
    """The learn-loop CTE stages and per-rank SELECTs, shared by the
    merge-table oracle, the learned-vocab count oracle, and (with a
    ``prefix`` to keep two chains' CTE names disjoint plus a ``where``
    doc filter) the vocab-drift two-snapshot comparison."""
    q = prefix
    extra = f" AND ({where})" if where else ""
    ctes = [
        rf"""{q}w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(str_split_regex(trim(text), '\s+')) AS word
    FROM documents WHERE length(trim(text)) > 0{extra}
  ) WHERE word <> '' GROUP BY word
)""",
        f"{q}s0 AS (SELECT word, freq, ' ' || array_to_string("
        "list_transform(range(1, length(word) + 1), i -> word[i]), ' ')"
        f" || ' ' AS sym FROM {q}w0)",
    ]
    sels = []
    for i in range(1, k + 1):
        ctes.append(
            f"{q}p{i} AS (SELECT pr, CAST(sum(freq) AS BIGINT) AS c FROM ("
            "SELECT freq, unnest(list_transform(range(1, len(s)),"
            " j -> s[j] || ' ' || s[j+1])) AS pr "
            f"FROM (SELECT freq, str_split_regex(trim(sym), ' ') AS s FROM {q}s{i-1})"
            ") GROUP BY pr)"
        )
        ctes.append(
            f"{q}b{i} AS (SELECT pr, c FROM {q}p{i} ORDER BY c DESC, pr LIMIT 1)"
        )
        ctes.append(
            f"{q}s{i} AS (SELECT word, freq, "
            f"replace(replace(sym, ' ' || {q}b{i}.pr || ' ', ' ' || replace({q}b{i}.pr, ' ', '') || ' '),"
            f" ' ' || {q}b{i}.pr || ' ', ' ' || replace({q}b{i}.pr, ' ', '') || ' ') AS sym "
            f"FROM {q}s{i-1}, {q}b{i})"
        )
        sels.append(
            f"SELECT CAST({i} AS INTEGER) AS merge_rank,"
            " split_part(pr, ' ', 1) AS lhs, split_part(pr, ' ', 2) AS rhs,"
            f" replace(pr, ' ', '') AS merged, c AS pair_freq FROM {q}b{i}"
        )
    return ctes, sels


def _bpe_learn_oracle(k: int) -> str:
    """Unrolled DuckDB twin of functions/bpe.py:learn_bpe_merges — k
    fixed merge iterations as chained CTE stages (pair count → argmax →
    double literal replace), identical semantics step for step. An
    exhausted stage (no pair left) yields an empty b{i}, emptying every
    later stage — the unrolled form of the library's early stop."""
    ctes, sels = _bpe_learn_parts(k)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def _bpe_learned_count_oracle(k: int) -> str:
    """Fully self-contained twin of counting with a LEARNED vocabulary:
    the unrolled learn loop derives the k merged symbols IN SQL, those
    rows become the ``vocab(v)`` CTE (UNION de-duplicates, matching
    vocab_from_merges), and the shared count CTEs segment against it —
    so learn → derive-vocab → count is hash-checked as one artifact
    chain with zero out-of-band literals."""
    ctes, _ = _bpe_learn_parts(k)
    vocab = (
        "vocab(v) AS ("
        + " UNION ".join(
            f"SELECT replace(pr, ' ', '') FROM b{i}" for i in range(1, k + 1)
        )
        + ")"
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes + [vocab, _bpe_count_ctes()])
        + "\nSELECT doc_id, n_bpe_tokens FROM bcounts"
    )


@register("bpe_learn_merges", oracle=_bpe_learn_oracle(8))
def q_bpe_learn_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (functions/bpe.py:learn_bpe_merges —
    Sennrich et al. 2016): learn the first 8 merge rules from the
    corpus's word-frequency table. The merge table is the artifact the
    bpe_token_counts / pack_sequences_bpe consumers would ship. The
    corpus is touched once (word-count shuffle); each rule is one
    pair-count aggregate over the vocabulary-sized word table plus a
    1-row argmax — the O(k) driver loop is the algorithm's dependency
    chain, not a scalability compromise."""
    from scikit_learn_imputer_spark.functions.bpe import learn_bpe_merges

    return learn_bpe_merges(_t(spark, sf_dir, "documents"), num_merges=8)


@register(
    "bpe_token_counts",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()}
SELECT doc_id, n_bpe_tokens FROM bcounts
""",
)
def q_bpe_token_counts(spark, sf_dir):
    """Vocab-faithful subword token counts (functions/bpe.py): greedy
    longest-prefix match over the pinned merge vocabulary, Arrow-batched
    UDF with per-batch word memoization — map-only, no shuffle. The
    DuckDB twin re-derives the identical segmentation with a recursive
    CTE, so the count is oracled end to end, closing the
    whitespace-vs-tokenizer budget gap (VERDICT r5 #6)."""
    from scikit_learn_imputer_spark.functions.bpe import bpe_token_counts

    return bpe_token_counts(_t(spark, sf_dir, "documents"))


@register("bpe_token_counts_learned", oracle=_bpe_learned_count_oracle(8))
def q_bpe_token_counts_learned(spark, sf_dir):
    """Learned-tokenizer-faithful counting (VERDICT r6 #4): the counting
    vocabulary is DERIVED from the merge table learn_bpe_merges trains
    on this corpus (merged symbols in rank order; single chars are
    implicit), so training and counting share one artifact like a real
    tokenizer — no pinned out-of-band vocab. The oracle re-derives the
    merges AND the segmentation entirely in SQL, hash-checking the full
    learn → vocab → count chain. Cost: the O(num_merges) learn loop
    (word-table-sized iterations) + one map-only Arrow-UDF count."""
    from scikit_learn_imputer_spark.functions.bpe import (
        bpe_token_counts,
        learn_bpe_merges,
        vocab_from_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = vocab_from_merges(learn_bpe_merges(docs, num_merges=8))
    return bpe_token_counts(docs, vocab=vocab)


@register(
    "pack_sequences_bpe",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
c AS (
  SELECT doc_id, source, n_bpe_tokens,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM bcounts
)
SELECT doc_id, source, n_bpe_tokens AS n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_bpe_tokens > 512) AS straddles
FROM c
""",
)
def q_pack_sequences_bpe(spark, sf_dir):
    """Tokenizer-faithful sequence packing: pack_sequences with its
    pluggable ``token_count_col`` fed by the BPE counter — budgets and
    cuts in REAL tokenizer tokens instead of whitespace tokens. Same
    cost shape as pack_sequences (map-only count, one shard-key
    shuffle, per-shard window); the whole composition is oracled."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    docs = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    return pack_sequences(docs, seq_len=512, token_count_col="n_bpe_tokens")


@register(
    "corpus_training_manifest",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
c AS (
  SELECT doc_id, source, n_bpe_tokens,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM bcounts
), seqs AS (
  SELECT DISTINCT source, CAST(cum_prev // 512 AS BIGINT) AS seq_id FROM c
), pos AS (
  SELECT CAST(row_number() OVER (
           ORDER BY md5('42:' || source || ':' || CAST(seq_id AS VARCHAR)),
                    source, seq_id
         ) AS BIGINT) AS position
  FROM seqs
)
SELECT CAST((position - 1) // 16 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_sequences,
       CAST(min(position) AS BIGINT) AS first_position,
       CAST(max(position) AS BIGINT) AS last_position
FROM pos GROUP BY 1
""",
)
def q_corpus_training_manifest(spark, sf_dir):
    """Flagship composite for the corpus→training-run handoff, chaining
    the round-6 operators END TO END in one lazy plan: BPE token counts
    (tokenizer-faithful budget) → per-shard concat-and-cut packing at
    512 tokens → seeded global shuffle (seed 42) → contiguous
    training shards of 16 sequences. Every stage has an exact SQL twin,
    so the COMPOSITION is oracled — the loader-facing manifest is
    hash-checked end to end."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffle_sequences,
        training_shards,
    )

    docs = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    packed = pack_sequences(docs, seq_len=512, token_count_col="n_bpe_tokens")
    return training_shards(shuffle_sequences(packed, seed=42), shard_size=16)


def _bpe_encode_ctes(
    vocab_cte: str | None = None, unk_base_sql: str | None = None
) -> str:
    """vocab(v, vid)..edocs — the greedy longest-prefix ENCODING CTEs:
    per-word id strings via the same segmentation as bstep (the count
    chain), unknown characters in the byte-fallback band
    ``unk_base + unicode(ch)``. Yields ``edocs(doc_id, ids, n_ids)``
    — each document's space-joined token-id string.

    Default is the pinned vocabulary as a VALUES literal with
    ``unk_base = len(vocab)``; pass ``vocab_cte`` (any CTE defining
    ``vocab(v, vid)``) + ``unk_base_sql`` (a scalar SQL expression) to
    encode against a DERIVED vocabulary (the learned-merge chain)."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        vocab_ids_values_sql,
    )

    if vocab_cte is None:
        vocab_cte = f"vocab(v, vid) AS (VALUES {vocab_ids_values_sql()})"
        unk_base_sql = str(len(DEFAULT_BPE_VOCAB))
    unk_base = unk_base_sql
    return rf"""{vocab_cte},
btoks AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), ewx AS (
  SELECT doc_id, unnest(tk) AS word, generate_subscripts(tk, 1) AS ord
  FROM btoks
), ewords AS (
  SELECT DISTINCT word FROM ewx
), estep(word, rest, ids) AS (
  SELECT word, word, CAST('' AS VARCHAR) FROM ewords
  UNION ALL
  SELECT word,
         substr(rest, coalesce((SELECT max(length(v)) FROM vocab
                                WHERE substr(rest, 1, length(v)) = v), 1) + 1),
         CASE WHEN ids = '' THEN '' ELSE ids || ' ' END ||
         CAST(coalesce((SELECT vid FROM vocab
                        WHERE substr(rest, 1, length(v)) = v
                        ORDER BY length(v) DESC LIMIT 1),
                       {unk_base} + unicode(substr(rest, 1, 1))) AS VARCHAR)
  FROM estep WHERE rest <> ''
), ewids AS (
  SELECT word, ids FROM estep WHERE rest = ''
), edocs AS (
  SELECT e.doc_id,
         string_agg(w.ids, ' ' ORDER BY e.ord) AS ids,
         CAST(sum(len(str_split(w.ids, ' '))) AS BIGINT) AS n_ids
  FROM ewx e JOIN ewids w USING (word) GROUP BY e.doc_id
)"""


def _tokenized_seq_sql(seq_len: int) -> str:
    """source/seq_id/n_ids/ids assembly over ``edocs`` — the SQL twin of
    operators/tokenized.py:tokenized_sequences (per-source doc-id order,
    concat-and-cut every ``seq_len`` ids)."""
    return f"""c AS (
  SELECT t.doc_id, t.source, e.ids, e.n_ids,
         CAST(coalesce(sum(e.n_ids) OVER (PARTITION BY t.source ORDER BY t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM documents t JOIN edocs e USING (doc_id)
), tok AS (
  SELECT source,
         cum_prev + generate_subscripts(str_split(ids, ' '), 1) - 1 AS gpos,
         unnest(str_split(ids, ' ')) AS tid
  FROM c WHERE ids <> ''
), tseqs AS (
  SELECT source,
         CAST(gpos // {seq_len} AS BIGINT) AS seq_id,
         CAST(count(*) AS BIGINT) AS n_ids,
         string_agg(tid, ' ' ORDER BY gpos) AS ids
  FROM tok GROUP BY 1, 2
)"""


@register(
    "bpe_encode_ids",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()}
SELECT d.doc_id,
       CAST(coalesce(e.n_ids, 0) AS BIGINT) AS n_ids,
       coalesce(e.ids, '') AS ids
FROM documents d LEFT JOIN edocs e USING (doc_id)
""",
)
def q_bpe_encode_ids(spark, sf_dir):
    """Token-ID materialization (VERDICT r7 #1): per-document
    ``array<int>`` ids under greedy longest-prefix match over the pinned
    vocabulary — ids are vocab positions, unknown characters fall back
    to ``len(vocab) + codepoint``. Map-only Arrow UDF
    (functions/bpe.py:bpe_encode); the oracle re-derives the ids with a
    recursive CTE, so the EXACT id sequences (serialized to strings —
    arrays hash unreliably across engines) are hash-checked, not just
    counts."""
    from scikit_learn_imputer_spark.functions.bpe import bpe_encode

    enc = bpe_encode(_t(spark, sf_dir, "documents"))
    return enc.select(
        "doc_id",
        F.size("token_ids").cast("bigint").alias("n_ids"),
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


@register(
    "tokenized_sequences",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
{_tokenized_seq_sql(512)}
SELECT source, seq_id, n_ids, ids FROM tseqs
""",
)
def q_tokenized_sequences(spark, sf_dir):
    """Training-sequence materialization: one row per (source, seq_id)
    holding the ids a loader reads, assembled under the exact
    pack_sequences placement (operators/tokenized.py — ids move as
    per-document ARRAYS sliced at sequence boundaries, one shard-key
    window plus one (shard, seq) aggregate; rows scale with #sequences,
    never #tokens). The oracle rebuilds every sequence in SQL and
    hash-checks the full id strings."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        tokenized_sequences,
    )

    seqs = tokenized_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return seqs.select(
        "source",
        "seq_id",
        "n_ids",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


@register(
    "write_tokenized_shards",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
{_tokenized_seq_sql(512)}
SELECT source, seq_id,
       CAST(seq_id // 16 AS BIGINT) AS shard_id,
       n_ids, ids
FROM tseqs
""",
)
def q_write_tokenized_shards(spark, sf_dir):
    """PHYSICAL tokenized-shard writer (VERDICT r7 #1 done-condition):
    tokenized_sequences written as partitionBy(source, shard_id) parquet
    with the ``array<int>`` ids inside (repartition-on-keys first — one
    file per shard dir), then read BACK from disk and serialized for
    comparison. The oracle is the sequence-assembly SQL plus the shard
    key, so the disk round trip of the actual id arrays is
    hash-checked end to end."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        tokenized_sequences,
        write_tokenized_shards_readback,
    )

    seqs = tokenized_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return write_tokenized_shards_readback(seqs, shard_size=16)


@register(
    "sequence_doc_spans",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
c AS (
  SELECT doc_id, source, n_bpe_tokens,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM bcounts
),
sp AS (
  SELECT source, doc_id, n_bpe_tokens AS n, cum_prev,
         unnest(generate_series(cum_prev // 512, (cum_prev + n_bpe_tokens - 1) // 512))
           AS sq
  FROM c WHERE n_bpe_tokens > 0
)
SELECT source, CAST(sq AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(
         CAST(doc_id AS VARCHAR) || ':' ||
         CAST(greatest(sq * 512, cum_prev) - sq * 512 AS VARCHAR) || ':' ||
         CAST(least((sq + 1) * 512, cum_prev + n)
              - greatest(sq * 512, cum_prev) AS VARCHAR),
         ' ' ORDER BY greatest(sq * 512, cum_prev)) AS spans
FROM sp GROUP BY 1, 2
""",
)
def q_sequence_doc_spans(spark, sf_dir):
    """Document-boundary spans per training sequence
    (operators/tokenized.py:sequence_doc_spans): the ordered
    ``doc_id:start:len`` list a trainer needs for attention masking /
    per-doc loss weighting inside packed sequences — BPE-token units,
    the exact placement ``tokenized_sequences`` cuts ids by, so spans
    index directly into its arrays. Counts-only dataflow (no id
    materialization): one shard window, one bounded explode, one
    (shard, seq) aggregate."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_doc_spans,
    )

    return sequence_doc_spans(_t(spark, sf_dir, "documents"), seq_len=512)


@register(
    "stream_tokenized_ingest",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
{_tokenized_seq_sql(512)}
SELECT source, seq_id, n_ids, ids FROM tseqs
""",
)
def q_stream_tokenized_ingest(spark, sf_dir):
    """STREAMING token-ID materialization, driver-visible: the corpus is
    drained through stream_tokenized_ingest (operators/tokenized.py —
    foreachBatch encode → offset-continued incremental pack → idempotent
    batch_id-keyed slice sink → offset commit), the landed slices are
    assembled into full sequences, and the result is oracled against the
    SAME sequence-assembly SQL as tokenized_sequences — batch == stream,
    hash-checked by the driver (the multi-micro-batch stitch across a
    sequence boundary is pinned by
    tests/test_tokenized.py::test_stream_tokenized_ingest_matches_batch)."""
    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        assemble_tokenized_sequences,
        stream_tokenized_ingest,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    store = _scratch("tok_offsets")
    out = _scratch("tok_slices") + "/slices"
    ck = _scratch("tok_ck")
    build_offset_store(docs.limit(0), store, seq_len=512)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(*docs.columns)
    )
    q = stream_tokenized_ingest(stream, store, out, ck, seq_len=512).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    seqs = assemble_tokenized_sequences(spark.read.parquet(out))
    return seqs.select(
        "source",
        "seq_id",
        "n_ids",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


def _learned_encode_oracle(k: int) -> str:
    """Fully self-contained twin of ENCODING with a LEARNED vocabulary:
    the unrolled learn loop derives the merged symbols in SQL, ids are
    their dedup-rank positions (vocab_from_merges' first-wins order),
    unknown characters fall back to ``count(vocab) + codepoint``, and
    the sequence assembly cuts the resulting id streams — the whole
    learn → vocab → encode → pack chain hash-checked with zero
    out-of-band literals."""
    ctes, _ = _bpe_learn_parts(k)
    vr = " UNION ALL ".join(
        f"SELECT replace(pr, ' ', '') AS v, {i} AS r FROM b{i}"
        for i in range(1, k + 1)
    )
    vocab_cte = (
        f"lv AS ({vr}),\n"
        "lvd AS (SELECT v, min(r) AS r FROM lv GROUP BY v),\n"
        "vocab(v, vid) AS (SELECT v, CAST(row_number() OVER (ORDER BY r) - 1"
        " AS INTEGER) AS vid FROM lvd)"
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + ",\n"
        + _bpe_encode_ctes(
            vocab_cte=vocab_cte,
            unk_base_sql="(SELECT count(*) FROM vocab)",
        )
        + ",\n"
        + _tokenized_seq_sql(512)
        + "\nSELECT source, seq_id, n_ids, ids FROM tseqs"
    )


@register("tokenized_sequences_learned", oracle=_learned_encode_oracle(8))
def q_tokenized_sequences_learned(spark, sf_dir):
    """Learned-tokenizer sequence materialization: the full artifact
    chain a real pipeline ships — learn_bpe_merges trains the merge
    table on this corpus, vocab_from_merges derives the encoding
    vocabulary (ids = dedup rank order), bpe_encode emits ids against
    it, and tokenized_sequences cuts the streams into training
    sequences. The oracle re-derives ALL of it in SQL (unrolled learn
    loop → ranked vocab → recursive encode → window assembly), so the
    learn → vocab → encode → pack chain is hash-checked end to end with
    no out-of-band literals."""
    from scikit_learn_imputer_spark.functions.bpe import (
        learn_bpe_merges,
        vocab_from_merges,
    )
    from scikit_learn_imputer_spark.operators.tokenized import (
        tokenized_sequences,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = vocab_from_merges(learn_bpe_merges(docs, num_merges=8))
    seqs = tokenized_sequences(docs, vocab=vocab, seq_len=512)
    return seqs.select(
        "source",
        "seq_id",
        "n_ids",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


@register(
    "tokenized_repack_delta",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
a AS (SELECT * FROM bcounts WHERE doc_id % 7 <> 0),
b AS (SELECT * FROM bcounts
      WHERE substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'),
ca AS (
  SELECT doc_id, source, n_bpe_tokens AS n,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM a
),
cb AS (
  SELECT doc_id, source, n_bpe_tokens AS n,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM b
),
rem AS (
  SELECT source, CAST(min(cum) AS BIGINT) AS m FROM ca
  WHERE doc_id NOT IN (SELECT doc_id FROM b) GROUP BY source
),
adds AS (
  SELECT source, CAST(min(cum) AS BIGINT) AS m FROM cb
  WHERE doc_id NOT IN (SELECT doc_id FROM a) GROUP BY source
),
tots AS (
  SELECT source,
         CAST(coalesce(sum(CASE WHEN in_a THEN n END), 0) AS BIGINT) AS ta,
         CAST(coalesce(sum(CASE WHEN in_b THEN n END), 0) AS BIGINT) AS tb
  FROM (
    SELECT source, n_bpe_tokens AS n,
           doc_id % 7 <> 0 AS in_a,
           substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
             AS in_b
    FROM bcounts
  ) GROUP BY source
)
SELECT t.source,
       CAST((t.ta + 511) // 512 AS BIGINT) AS n_seqs_before,
       CAST((t.tb + 511) // 512 AS BIGINT) AS n_seqs_after,
       CAST(CASE WHEN rem.m IS NULL AND adds.m IS NULL
            THEN (t.ta + 511) // 512
            ELSE least(coalesce(rem.m, t.ta), coalesce(adds.m, t.tb)) // 512
            END AS BIGINT) AS n_seqs_unchanged,
       CAST((t.tb + 511) // 512
            - CASE WHEN rem.m IS NULL AND adds.m IS NULL
              THEN (t.ta + 511) // 512
              ELSE least(coalesce(rem.m, t.ta), coalesce(adds.m, t.tb)) // 512
              END AS BIGINT) AS n_seqs_rewritten
FROM tots t
LEFT JOIN rem USING (source)
LEFT JOIN adds USING (source)
""",
)
def q_tokenized_repack_delta(spark, sf_dir):
    """Sequence-granular write amplification of a corpus mutation: the
    dataset_card_diff snapshots (pre-ingest A = doc_id %7 != 0 vs
    post-ingest-and-takedown B), measured in tokenized training
    SEQUENCES — per source, how many seq_len=512 sequences existed
    before/after, how many are byte-identical (every sequence strictly
    before the first membership change's stream position), and how many
    must be rewritten. This is the number a shard-rewrite job actually
    schedules. COUNTS-ONLY dataflow: two per-shard running windows over
    BPE token counts + two anti-join mins — no id materialization, no
    sequence assembly, so the delta report costs a scan even when the
    corpus doesn't."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    L = 512
    counted = with_bpe_token_counts(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.col("n_bpe_tokens").alias("__n")
    )
    in_a = F.col("doc_id") % 7 != 0
    in_b = (
        F.md5(F.concat(F.lit("takedown:"), F.col("doc_id").cast("string")))
        .substr(1, 1)
        != "0"
    )
    marked = counted.select("doc_id", "source", "__n", in_a.alias("__a"), in_b.alias("__b"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ca = (
        marked.filter("__a")
        .withColumn(
            "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint"))
        )
    )
    cb = (
        marked.filter("__b")
        .withColumn(
            "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint"))
        )
    )
    rem = (
        ca.filter(~F.col("__b"))
        .groupBy("source")
        .agg(F.min("__cum").cast("bigint").alias("__rm"))
    )
    adds = (
        cb.filter(~F.col("__a"))
        .groupBy("source")
        .agg(F.min("__cum").cast("bigint").alias("__am"))
    )
    tots = marked.groupBy("source").agg(
        F.coalesce(F.sum(F.when(F.col("__a"), F.col("__n"))), F.lit(0))
        .cast("bigint")
        .alias("__ta"),
        F.coalesce(F.sum(F.when(F.col("__b"), F.col("__n"))), F.lit(0))
        .cast("bigint")
        .alias("__tb"),
    )
    before = F.floor((F.col("__ta") + L - 1) / L).cast("bigint")
    after = F.floor((F.col("__tb") + L - 1) / L).cast("bigint")
    no_change = F.col("__rm").isNull() & F.col("__am").isNull()
    first = F.least(
        F.coalesce(F.col("__rm"), F.col("__ta")),
        F.coalesce(F.col("__am"), F.col("__tb")),
    )
    unchanged = F.when(no_change, before).otherwise(
        F.floor(first / L).cast("bigint")
    )
    return (
        tots.join(rem, "source", "left")
        .join(adds, "source", "left")
        .select(
            "source",
            before.alias("n_seqs_before"),
            after.alias("n_seqs_after"),
            unchanged.alias("n_seqs_unchanged"),
            (after - unchanged).cast("bigint").alias("n_seqs_rewritten"),
        )
    )


def _incremental_rewrite_oracle() -> str:
    """Full rebuild of the AFTER snapshot (takedown membership) through
    the encode + sequence-assembly CTEs, grouped to the shard manifest
    the incremental rewriter's read-back is aggregated to — equality
    hash-checks 'incremental rewrite == full rewrite' on disk bytes."""
    enc = _bpe_encode_ctes().replace("FROM documents", "FROM bsnap")
    seq = _tokenized_seq_sql(512).replace(
        "FROM documents t JOIN edocs e USING (doc_id)",
        "FROM bsnap t JOIN edocs e USING (doc_id)",
    )
    return f"""WITH RECURSIVE bsnap AS (
  SELECT * FROM documents
  WHERE substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
),
{enc},
{seq}
SELECT source,
       CAST(seq_id // 16 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(sum(n_ids) AS BIGINT) AS n_ids,
       md5(string_agg(ids, '|' ORDER BY seq_id)) AS ids_md5
FROM tseqs GROUP BY 1, 2
"""


@register("tokenized_incremental_rewrite", oracle=_incremental_rewrite_oracle())
def q_tokenized_incremental_rewrite(spark, sf_dir):
    """The EXECUTION half of tokenized_repack_delta's planning half:
    write the full tokenized-shard layout of snapshot A (doc_id % 7 !=
    0), then apply the A -> B mutation (B = md5 takedown membership)
    with operators/tokenized.py:rewrite_tokenized_shards_incremental —
    shards wholly below the first membership change keep their exact
    on-disk files; only the changed suffix is re-ENCODED (the Arrow
    pass runs over suffix documents, not the corpus) and rewritten via
    dynamic partition overwrite; stale trailing shards are deleted.
    The read-back is aggregated to a per-(source, shard) manifest with
    an order-keyed md5 over the id strings, and the oracle rebuilds B
    from scratch in SQL — so 'incremental == full rewrite' is
    hash-checked by the driver down to the exact ids on disk."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        rewrite_tokenized_shards_incremental,
        tokenized_sequences,
        write_tokenized_shards,
    )

    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 7 != 0)
    b = d.filter(
        F.md5(
            F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))
        ).substr(1, 1)
        != "0"
    )
    path = _scratch("tok_incr_rewrite") + "/shards"
    write_tokenized_shards(
        tokenized_sequences(a, seq_len=512), path, shard_size=16
    )
    rewrite_tokenized_shards_incremental(
        a, b, path, shard_size=16, seq_len=512
    )
    back = spark.read.parquet(path)
    ids_str = F.concat_ws(
        " ", F.transform("token_ids", lambda x: x.cast("string"))
    )
    ordered_ids = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("seq_id", "__ids_str"))),
            lambda s: s["__ids_str"],
        ),
        "|",
    )
    return (
        back.select(
            F.col("source").cast("string").alias("source"),
            F.col("shard_id").cast("bigint").alias("shard_id"),
            "seq_id",
            F.col("n_ids").cast("bigint").alias("n_ids"),
            ids_str.alias("__ids_str"),
        )
        .groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
            F.sum("n_ids").cast("bigint").alias("n_ids"),
            F.md5(ordered_ids).alias("ids_md5"),
        )
    )


def _token_id_histogram_oracle() -> str:
    return f"""WITH RECURSIVE {_bpe_encode_ctes()},
ids_flat AS (
  SELECT CAST(unnest(str_split(ids, ' ')) AS BIGINT) AS token_id
  FROM edocs WHERE ids <> ''
)
SELECT i.token_id,
       coalesce(v.v, '') AS token,
       CAST(count(*) AS BIGINT) AS n
FROM ids_flat i LEFT JOIN vocab v ON v.vid = i.token_id
GROUP BY 1, 2
ORDER BY n DESC, token_id
LIMIT 50
"""


@register("token_id_histogram", oracle=_token_id_histogram_oracle())
def q_token_id_histogram(spark, sf_dir):
    """Vocabulary audit over the ENCODED corpus: the top-50 token ids a
    trainer will actually see, with their symbols (byte-fallback ids —
    the band >= len(vocab) — show an empty symbol). The wordcount shape
    at id granularity: one Arrow encode pass, an explode whose rows are
    immediately partial-aggregated map-side (shuffle carries one row
    per distinct id per partition — vocabulary-sized, never
    corpus-sized), a broadcast join to the O(|vocab|) symbol table, and
    a top-k. The audit every tokenizer change should re-run: id mass
    concentration, dead vocab entries, fallback-band leakage."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        bpe_encode,
        vocab_ids,
    )

    d = _t(spark, sf_dir, "documents")
    enc = bpe_encode(d.select("doc_id", "text"))
    # explode_outer, not explode: Catalyst infers a `size(arr) > 0`
    # filter under a plain explode and CLONES the Arrow encode UDF into
    # it — two encode passes over the corpus; outer-explode emits one
    # null row per empty doc instead, dropped after the (single) pass
    counts = (
        enc.select(F.explode_outer("token_ids").alias("token_id"))
        .filter(F.col("token_id").isNotNull())
        .groupBy(F.col("token_id").cast("bigint").alias("token_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark_vocab = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(i), v) for v, i in vocab_ids(DEFAULT_BPE_VOCAB).items()], 1
        ),
        "token_id long, token string",
    )
    return (
        counts.join(F.broadcast(spark_vocab), "token_id", "left")
        .select(
            "token_id",
            F.coalesce("token", F.lit("")).alias("token"),
            "n",
        )
        .orderBy(F.desc("n"), "token_id")
        .limit(50)
    )


@register(
    "curriculum_epoch_order",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         round({_QSCORE_SQL}, 6) AS qr,
         CAST(({_NTOK_SQL}) AS BIGINT) AS n
  FROM documents
),
b AS (
  SELECT source, qr, n,
         ntile(10) OVER (PARTITION BY source ORDER BY qr DESC, doc_id)
           AS phase
  FROM q
)
SELECT CAST(phase AS INTEGER) AS phase, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       min(qr) AS q_min, max(qr) AS q_max
FROM b GROUP BY 1, 2
""",
)
def q_curriculum_epoch_order(spark, sf_dir):
    """Curriculum training schedule: per source, documents are ranked
    clean -> noisy by the composite quality score (deterministic
    tie-break on doc_id — no rand(), reproducible everywhere) and cut
    into 10 equal phases; a trainer consumes phase 1 first and anneals
    toward the noisier tail. Reported as per-(phase, source) doc/token
    mass with the phase's quality band. Cost shape: one projection for
    the score, one per-source ntile window (shuffles (id, score) pairs,
    never text), one aggregate — the schedule is metadata-sized at any
    corpus scale."""
    from scikit_learn_imputer_spark.functions.text import (
        quality_score_col,
        token_count_col,
    )

    d = _t(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "source",
        F.round(quality_score_col(F.col("text")), 6).alias("qr"),
        token_count_col(F.col("text")).cast("bigint").alias("__n"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("qr"), "doc_id")
    return (
        q.withColumn("phase", F.ntile(10).over(w))
        .groupBy(F.col("phase").cast("int").alias("phase"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
            F.min("qr").alias("q_min"),
            F.max("qr").alias("q_max"),
        )
    )


@register(
    "packing_efficiency_curve",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
tot AS (
  SELECT source, CAST(sum(n_bpe_tokens) AS BIGINT) AS t FROM bcounts
  GROUP BY source
),
cum AS (
  SELECT source, n_bpe_tokens AS n,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM bcounts
),
per_len AS (
  SELECT L,
         CAST(sum((t + L - 1) // L) AS BIGINT) AS n_sequences,
         CAST(sum(t) AS BIGINT) AS total_tokens,
         CAST(sum((t + L - 1) // L) * L - sum(t) AS BIGINT) AS pad_tokens
  FROM tot, (SELECT unnest([128, 512, 1024]) AS L)
  GROUP BY L
),
strad AS (
  SELECT L, CAST(count(*) FILTER (WHERE cum_prev % L + n > L) AS BIGINT)
           AS straddle_docs
  FROM cum, (SELECT unnest([128, 512, 1024]) AS L)
  GROUP BY L
)
SELECT CAST(p.L AS BIGINT) AS seq_len, p.n_sequences, p.total_tokens,
       p.pad_tokens,
       round(CAST(p.pad_tokens AS DOUBLE)
             / greatest(p.n_sequences * p.L, 1), 6) AS pad_frac,
       s.straddle_docs
FROM per_len p JOIN strad s ON p.L = s.L
""",
)
def q_packing_efficiency_curve(spark, sf_dir):
    """Packing-efficiency curve: for candidate sequence lengths (128 /
    512 / 1024 BPE tokens), how many training sequences the corpus
    packs into, the padding mass wasted in each shard's final partial
    sequence, and how many documents straddle a cut — the numbers that
    pick seq_len for a training run (padding waste vs cross-doc
    attention contamination). One BPE count pass + one tiny per-source
    aggregate; the straddle count reuses the per-shard running window.
    Concat-and-cut pads only per-shard tails, so pad_frac is the true
    loader waste."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    docs = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    out = None
    for L in (128, 512, 1024):
        packed = pack_sequences(docs, L, token_count_col="n_bpe_tokens")
        per_src = packed.groupBy("source").agg(
            F.sum("n_tokens").cast("bigint").alias("__t"),
            F.count_if(F.col("straddles")).alias("__sd"),
        )
        row = per_src.agg(
            F.sum(F.floor((F.col("__t") + L - 1) / L))
            .cast("bigint")
            .alias("n_sequences"),
            F.sum("__t").cast("bigint").alias("total_tokens"),
            F.sum("__sd").cast("bigint").alias("straddle_docs"),
        ).select(
            F.lit(L).cast("bigint").alias("seq_len"),
            "n_sequences",
            "total_tokens",
            (F.col("n_sequences") * L - F.col("total_tokens"))
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                (F.col("n_sequences") * L - F.col("total_tokens")).cast(
                    "double"
                )
                / F.greatest(F.col("n_sequences") * L, F.lit(1)),
                6,
            ).alias("pad_frac"),
            "straddle_docs",
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "oov_rate_by_source",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
ids AS (
  SELECT d.source, CAST(unnest(str_split(e.ids, ' ')) AS INTEGER) AS tid
  FROM edocs e JOIN documents d USING (doc_id)
  WHERE e.ids <> ''
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(count(*) FILTER (WHERE tid >= {{unk}}) AS BIGINT) AS n_oov,
       round(CAST(count(*) FILTER (WHERE tid >= {{unk}}) AS DOUBLE)
             / count(*), 6) AS oov_rate
FROM ids GROUP BY source
""",
)
def q_oov_rate_by_source(spark, sf_dir):
    """Tokenizer OOV health per source: the fraction of emitted ids in
    the byte-fallback band (>= len(vocab)) — high OOV means the
    vocabulary doesn't cover that source and its sequences are
    character soup. Map-only: per-doc counts from the id arrays (one
    F.filter over each array, no explode), one small per-source
    aggregate."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        bpe_encode,
    )

    base = len(DEFAULT_BPE_VOCAB)
    enc = bpe_encode(_t(spark, sf_dir, "documents"))
    per_doc = enc.select(
        "source",
        F.size("token_ids").cast("bigint").alias("__n"),
        F.size(F.filter("token_ids", lambda x: x >= base))
        .cast("bigint")
        .alias("__o"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("__n").cast("bigint").alias("n_ids"),
            F.sum("__o").cast("bigint").alias("n_oov"),
        )
        .select(
            "source",
            "n_ids",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_ids"), 6
            ).alias("oov_rate"),
        )
    )


def _default_unk_base() -> str:
    from scikit_learn_imputer_spark.functions.bpe import DEFAULT_BPE_VOCAB

    return str(len(DEFAULT_BPE_VOCAB))


ORACLE["oov_rate_by_source"] = ORACLE["oov_rate_by_source"].replace(
    "{unk}", _default_unk_base()
)


@register(
    "tokenizer_fertility_by_source",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
w AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\\s+')) END AS BIGINT)
           AS n_words
  FROM documents
)
SELECT w.source,
       CAST(sum(w.n_words) AS BIGINT) AS n_words,
       CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(b.n_bpe_tokens) AS DOUBLE)
             / greatest(sum(w.n_words), 1), 6) AS fertility
FROM w JOIN bcounts b USING (doc_id)
GROUP BY w.source
""",
)
def q_tokenizer_fertility_by_source(spark, sf_dir):
    """Tokenizer fertility (subword tokens per whitespace word) per
    source — THE standard tokenizer-evaluation metric: fertility near 1
    means the vocabulary covers the source's words whole; high fertility
    means the source fragments (and its token budget buys fewer words).
    Two map-only counters in one projection + one small aggregate."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    d = _t(spark, sf_dir, "documents")
    t0 = F.trim(F.col("text"))
    nw = (
        F.when(F.length(t0) == 0, F.lit(0))
        .otherwise(F.size(F.split(t0, "\\s+")))
        .cast("bigint")
    )
    counted = with_bpe_token_counts(d).select(
        "source", nw.alias("__w"), F.col("n_bpe_tokens").alias("__b")
    )
    return (
        counted.groupBy("source")
        .agg(
            F.sum("__w").cast("bigint").alias("n_words"),
            F.sum("__b").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.greatest(F.col("n_words"), F.lit(1)),
                6,
            ).alias("fertility"),
        )
    )


def _capstone_oracle() -> str:
    """The corpus -> trainer END-TO-END twin: the scrubbed-waterfall CTE
    prefix (scrub + six gates) selects the kept set, the encode CTEs
    emit its token ids, and the sequence assembly cuts them — one SQL
    statement reproducing the entire pipeline for the hash compare."""
    prefix = ORACLE["filter_waterfall_scrubbed"].split(
        "SELECT CAST(0 AS INTEGER) AS stage_order"
    )[0].rstrip().rstrip(",")
    prefix = prefix.replace("WITH corpus0", "WITH RECURSIVE corpus0", 1)
    kept = """kept AS (
  SELECT wf.doc_id
  FROM wf LEFT JOIN keepers k USING (fp)
  WHERE NOT fail_lang AND NOT fail_quality AND NOT fail_gopher
    AND NOT fail_lm AND wf.doc_id = k.keep_id AND NOT is_contam
),
ksrc AS (
  SELECT s.doc_id, dd.source, s.text
  FROM scrubbed s
  JOIN kept USING (doc_id)
  JOIN documents dd USING (doc_id)
)"""
    enc = _bpe_encode_ctes().replace("FROM documents", "FROM ksrc")
    seq = _tokenized_seq_sql(512).replace(
        "FROM documents t JOIN edocs e USING (doc_id)",
        "FROM ksrc t JOIN edocs e USING (doc_id)",
    )
    return (
        prefix
        + ",\n"
        + kept
        + ",\n"
        + enc
        + ",\n"
        + seq
        + "\nSELECT source, seq_id, n_ids, ids FROM tseqs"
    )


@register("corpus_tokenized_capstone", oracle=_capstone_oracle())
def q_corpus_tokenized_capstone(spark, sf_dir):
    """THE corpus -> trainer capstone, one lazy plan end to end:
    paragraph scrub -> lang/quality/Gopher/LM-score gates -> exact dedup
    -> decontamination (the scrubbed waterfall's kept set) -> BPE token
    ids -> 512-token training sequences. What a user runs to turn a raw
    crawl into loader-ready sequences; every stage's semantics are
    individually oracled elsewhere, and here the COMPOSITION is
    hash-checked — the exact id streams of the surviving corpus. Cost
    shape: the gates are survivor-chained projections/explodes, dedup
    and decontam join digests, encode is one Arrow pass over survivors,
    and assembly is the one shard-window + (shard, seq) aggregate."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        tokenized_sequences,
    )

    staged, _ = _waterfall_scrubbed_staged(spark, sf_dir)
    kept = staged.filter(F.col("stage_order") == 7).select(
        "doc_id", "source", "text"
    )
    seqs = tokenized_sequences(kept, seq_len=512)
    return seqs.select(
        "source",
        "seq_id",
        "n_ids",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


@register(
    "repack_after_delete",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
  WHERE substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_tokens > 512) AS straddles
FROM c
""",
)
def q_repack_after_delete(spark, sf_dir):
    """Deletion propagation, driver-visible (VERDICT r7 #2): a fixed
    deterministic takedown set (docs whose md5('takedown:'||id) starts
    with '0', ~1/16 of the corpus) is deleted from an existing
    pack_sequences result via operators/chunking.py:repack_after_delete
    — shards containing no deletion pass through untouched, affected
    docs shift back by an O(#deletions) broadcast running-mass
    subtraction, NEVER a corpus re-aggregate. The oracle is the full
    re-pack SQL over the filtered corpus, so 'incremental == full
    re-pack' is hash-checked by the driver, not just pytest."""
    from scikit_learn_imputer_spark.operators.chunking import (
        pack_sequences,
        repack_after_delete,
    )

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, seq_len=512)
    deleted = docs.filter(
        F.md5(
            F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))
        ).substr(1, 1)
        == "0"
    ).select("doc_id")
    return repack_after_delete(packed, deleted, seq_len=512)


@register(
    "corpus_holdout_split",
    oracle=f"""
WITH u AS (
  SELECT source,
         CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         CAST(({_NTOK_SQL}) AS BIGINT) AS n
  FROM documents
)
SELECT CASE WHEN u < 0.98 THEN 'train' WHEN u < 0.99 THEN 'val' ELSE 'test' END AS split,
       source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM u GROUP BY 1, 2
""",
)
def q_corpus_holdout_split(spark, sf_dir):
    """Deterministic train/val/test corpus split (98/1/1) keyed on a
    salted md5 uniform of doc_id — the held-out-set assignment a
    training run fixes once and reproduces everywhere (no rand(), no
    engine seed; functions/text.py:uniform_hash_col). Reported as
    per-(split, source) doc and token mass so the designer sees split
    balance by source. Map-only assignment plus one small aggregate —
    at 100 TB the split is a projection, never a shuffle of the
    corpus."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    u = uniform_hash_col(
        F.concat(F.lit("holdout:"), F.col("doc_id").cast("string"))
    )
    split = (
        F.when(u < 0.98, "train").when(u < 0.99, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "source", n.alias("__n"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
    )


# Tokenizer-faithful budget twins (VERDICT r6 #3): the planning queries a
# trainer actually consumes must budget in the tokens the tokenizer will
# produce, not whitespace tokens — each twin is the original plan with
# its count column fed by the BPE counter, and its oracle re-derives the
# identical segmentation through the shared vocab VALUES literal
# (_bpe_cte), so the whole composition stays hash-checked.


@register(
    "token_budget_sample_bpe",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
t AS (
  SELECT doc_id, source, n_bpe_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM bcounts
), c AS (
  SELECT doc_id, source, n_bpe_tokens,
         CAST(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_bpe_tokens, cum_tokens
FROM c WHERE cum_tokens <= 700
""",
)
def q_token_budget_sample_bpe(spark, sf_dir):
    """token_budget_sample with the per-source budget counted in BPE
    tokens: same deterministic md5 order, same one-shuffle per-source
    running window — but the 700-token budget now means what the
    tokenizer will emit. The count is a map-only Arrow UDF projection,
    so the cost shape is unchanged."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    d = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    h = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(h, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select("doc_id", "source", "n_bpe_tokens")
        .withColumn("cum_tokens", F.sum("n_bpe_tokens").over(w))
        .filter(F.col("cum_tokens") <= 700)
    )


@register(
    "corpus_holdout_split_bpe",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
u AS (
  SELECT source,
         CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         n_bpe_tokens AS n
  FROM bcounts
)
SELECT CASE WHEN u < 0.98 THEN 'train' WHEN u < 0.99 THEN 'val' ELSE 'test' END AS split,
       source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_bpe_tokens
FROM u GROUP BY 1, 2
""",
)
def q_corpus_holdout_split_bpe(spark, sf_dir):
    """corpus_holdout_split with split masses reported in BPE tokens —
    the doc-membership assignment is IDENTICAL (same salted md5
    uniform), so this twin pins that switching the budget unit never
    moves a document across splits; only the reported token masses
    change to what the tokenizer will actually produce."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    u = uniform_hash_col(
        F.concat(F.lit("holdout:"), F.col("doc_id").cast("string"))
    )
    split = F.when(u < 0.98, "train").when(u < 0.99, "val").otherwise("test")
    return (
        d.select(split.alias("split"), "source", F.col("n_bpe_tokens").alias("__n"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_bpe_tokens"),
        )
    )


@register(
    "mixture_epoch_plan_bpe",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
t AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
         CAST(substr(source, 4) AS INT) + 1 AS w_raw
  FROM bcounts GROUP BY source
),
z AS (SELECT CAST(sum(w_raw) AS DOUBLE) AS zw,
             CAST(sum(n_tokens) AS DOUBLE) AS budget FROM t)
SELECT source, n_docs, n_tokens,
       round(w_raw / zw, 9) AS weight,
       CAST(round(budget * w_raw / zw) AS BIGINT) AS target_tokens,
       round(budget * w_raw / zw / n_tokens, 6) AS epochs,
       round(least(budget * w_raw / zw / n_tokens, 4.0), 6) AS capped_epochs,
       CAST(round(least(budget * w_raw / zw / n_tokens, 4.0) * n_tokens)
            AS BIGINT) AS achieved_tokens
FROM t, z
""",
)
def q_mixture_epoch_plan_bpe(spark, sf_dir):
    """mixture_epoch_plan with every token mass (budget, targets,
    achieved) in BPE tokens — the upsampling table a trainer consumes
    must agree with the tokenizer or the epoch math is off by the
    whitespace-vs-subword ratio. Cost shape unchanged: map-only count,
    one O(#sources) aggregate, 1-row budget broadcast."""
    from scikit_learn_imputer_spark.functions.bpe import with_bpe_token_counts

    d = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    per_src = (
        d.select("source", F.col("n_bpe_tokens").alias("__n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "__w_raw", F.substring("source", 4, 10).cast("int") + F.lit(1)
        )
    )
    z = per_src.agg(
        F.sum("__w_raw").cast("double").alias("__zw"),
        F.sum("n_tokens").cast("double").alias("__budget"),
    )
    target = F.col("__budget") * F.col("__w_raw") / F.col("__zw")
    epochs = target / F.col("n_tokens")
    capped = F.least(epochs, F.lit(4.0))
    return per_src.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("__w_raw") / F.col("__zw"), 9).alias("weight"),
        F.round(target).cast("bigint").alias("target_tokens"),
        F.round(epochs, 6).alias("epochs"),
        F.round(capped, 6).alias("capped_epochs"),
        F.round(capped * F.col("n_tokens")).cast("bigint").alias(
            "achieved_tokens"
        ),
    )


@register(
    "quality_weighted_sample",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         {_QSCORE_SQL} AS q_score
  FROM documents
)
SELECT doc_id, source, round(q_score, 6) AS q_score
FROM q WHERE u < least(greatest(q_score, 0.0), 1.0)
""",
)
def q_quality_weighted_sample(spark, sf_dir):
    """Quality-weighted Bernoulli sampling (DCLM-style): keep each doc
    with probability equal to its quality score, using a deterministic
    md5-derived uniform instead of rand() so the sample is reproducible
    and engine-portable (functions/text.py:uniform_hash_col). Map-only —
    the keep decision is a pure projection over the scan; at 100 TB this
    is the cheapest possible sampling pass (no shuffle, no state)."""
    from scikit_learn_imputer_spark.functions.text import (
        quality_score_col,
        uniform_hash_col,
    )

    d = _t(spark, sf_dir, "documents")
    q_score = quality_score_col(F.col("text"))
    u = uniform_hash_col(F.col("doc_id"))
    return (
        d.select(
            "doc_id",
            "source",
            q_score.alias("q_score"),
            u.alias("__u"),
        )
        .filter(
            F.col("__u")
            < F.least(F.greatest(F.col("q_score"), F.lit(0.0)), F.lit(1.0))
        )
        .select("doc_id", "source", F.round("q_score", 6).alias("q_score"))
    )


@register(
    "decontaminate_ngram_corpus",
    oracle=r"""
WITH bench_g AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
), corpus_g AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
  FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id % 100 >= 2)
)
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id % 100 >= 2
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM corpus_g
                     WHERE g IN (SELECT g FROM bench_g))
""",
)
def q_decontaminate_ngram_corpus(spark, sf_dir):
    """N-gram-overlap decontamination (dedup/exact.py:decontaminate_ngram,
    GPT-3/PaLM-style): drop corpus docs sharing ANY word 5-gram with the
    pseudo eval set (doc_id % 100 < 2) — catches embedded/partial eval
    leakage the exact-digest `decontaminate_corpus` misses. Benchmark
    grams collapse to broadcast digests; the corpus never shuffles."""
    from scikit_learn_imputer_spark.dedup.exact import decontaminate_ngram

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    out = decontaminate_ngram(corpus, bench, n=5)
    return out.select("doc_id", "source", "n_chars")


def _token_ngram_decontam_oracle(n: int = 8) -> str:
    g = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return f"""WITH RECURSIVE {_bpe_encode_ctes()},
idt AS MATERIALIZED (
  SELECT doc_id, str_split(ids, ' ') AS t FROM edocs WHERE ids <> ''
),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t) - {n - 2}, 1)),
             i -> {g})) AS g
    FROM idt WHERE doc_id % 100 < 2
  )
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - {n - 2}, 1)),
             i -> {g})) AS g
    FROM idt WHERE doc_id % 100 >= 2
  ) WHERE g IN (SELECT g FROM bg)
)
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id % 100 >= 2
  AND doc_id NOT IN (SELECT doc_id FROM contam)
"""


@register("decontam_token_ngrams", oracle=_token_ngram_decontam_oracle(16))
def q_decontam_token_ngrams(spark, sf_dir):
    """TOKEN-space decontamination
    (dedup/exact.py:decontaminate_token_ngrams): drop corpus docs
    sharing any 16 consecutive TOKENIZER IDS with the pseudo eval set
    (strictness chosen to sit at the word-5-gram baseline's level on
    this corpus; published pipelines use ~13 ids on real prose) —
    the id-gram collision check run on what the model actually trains
    on. A DIFFERENT net than decontaminate_ngram_corpus, not a stricter
    one: id-mass overlap triggers on fallback-heavy short word spans
    word-grams miss, and vice versa (pinned by
    test_decontaminate_token_ngrams_vs_word_grams). Benchmark id-grams
    collapse to broadcast digests; corpus ids never shuffle."""
    from scikit_learn_imputer_spark.dedup.exact import (
        decontaminate_token_ngrams,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    out = decontaminate_token_ngrams(corpus, bench, n=16)
    return out.select("doc_id", "source", "n_chars")


@register(
    "contamination_report",
    oracle=r"""
WITH bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
), contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 >= 2)
  ) WHERE g IN (SELECT g FROM bg)
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
       round(CAST(count(c.doc_id) AS DOUBLE) / count(*), 9) AS contam_rate
FROM documents d LEFT JOIN contam c USING (doc_id)
WHERE d.doc_id % 100 >= 2
GROUP BY d.source
""",
)
def q_contamination_report(spark, sf_dir):
    """Per-source benchmark-contamination rate: of each source's corpus
    docs, how many share ANY word 5-gram with the pseudo eval set
    (doc_id % 100 < 2) — the audit a data owner reads BEFORE deciding
    whether to decontaminate (drop) or scrub (span-delete), and the
    per-source hygiene number next to source_dedup_rates. Benchmark
    grams collapse to distinct 16-byte digests; the corpus explodes to
    digests for one semi join — text never shuffles; output is
    O(#sources)."""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    bench_g = (
        bench.select(F.explode(word_ngrams_col(F.col("text"), 5)).alias("g"))
        .select(F.md5("g").alias("gd"))
        .distinct()
    )
    contam_ids = (
        corpus.select(
            "doc_id", F.explode(word_ngrams_col(F.col("text"), 5)).alias("g")
        )
        .select("doc_id", F.md5("g").alias("gd"))
        .join(bench_g, "gd", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__contam", F.lit(1))
    )
    return (
        corpus.select("doc_id", "source")
        .join(contam_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__contam").alias("n_contaminated"),
            F.round(
                F.count("__contam").cast("double") / F.count(F.lit(1)), 9
            ).alias("contam_rate"),
        )
    )


@register(
    "contamination_severity",
    oracle=r"""
WITH bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
), hits AS (
  SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_grams
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 >= 2)
  ) WHERE g IN (SELECT g FROM bg)
  GROUP BY doc_id
)
SELECT n_grams AS severity, CAST(count(*) AS BIGINT) AS n_docs
FROM hits GROUP BY n_grams
""",
)
def q_contamination_severity(spark, sf_dir):
    """Contamination severity histogram: for each contaminated corpus
    doc, how many DISTINCT benchmark 5-grams it shares — the number
    that decides scrub-vs-drop (1-2 incidental grams → span-scrub and
    keep; dozens → wholesale leakage, drop the doc). Same digest
    semi-join as decontamination, plus one per-doc distinct-count;
    output is O(max severity) rows."""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = _t(spark, sf_dir, "documents")
    bench_g = (
        d.filter(F.col("doc_id") % 100 < 2)
        .select(F.explode(word_ngrams_col(F.col("text"), 5)).alias("g"))
        .select(F.md5("g").alias("gd"))
        .distinct()
    )
    hits = (
        d.filter(F.col("doc_id") % 100 >= 2)
        .select("doc_id", F.explode(word_ngrams_col(F.col("text"), 5)).alias("g"))
        .select("doc_id", F.md5("g").alias("gd"))
        .join(bench_g, "gd", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("gd").alias("severity"))
    )
    return hits.groupBy("severity").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "scrub_benchmark_spans",
    oracle=r"""
WITH btoks AS (
  SELECT str_split_regex(trim(text), '\s+') AS tk
  FROM documents WHERE doc_id % 100 < 2 AND length(trim(text)) > 0
), bg AS (
  SELECT DISTINCT array_to_string(tk[s.i + 1 : s.i + 5], ' ') AS g
  FROM btoks, LATERAL unnest(generate_series(0, len(tk) - 5, 1)) AS s(i)
  WHERE len(tk) >= 5
), ctoks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents WHERE doc_id % 100 >= 2
), cg AS (
  SELECT doc_id, CAST(s.i AS INT) AS start,
         array_to_string(tk[s.i + 1 : s.i + 5], ' ') AS g
  FROM ctoks, LATERAL unnest(generate_series(0, len(tk) - 5, 1)) AS s(i)
  WHERE len(tk) >= 5
), cov AS (
  SELECT DISTINCT cg.doc_id, cg.start FROM cg JOIN bg USING (g)
), tokpos AS (
  SELECT doc_id, CAST(p.i AS INT) AS i, tk[p.i + 1] AS tok
  FROM ctoks, LATERAL unnest(generate_series(0, len(tk) - 1, 1)) AS p(i)
  WHERE len(tk) > 0
), kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM tokpos t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c
    WHERE c.doc_id = t.doc_id AND c.start <= t.i AND t.i < c.start + 5
  )
)
SELECT ctoks.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens_before,
       CAST(coalesce(k.cnt, 0) AS BIGINT) AS n_tokens_after,
       coalesce(k.txt, '') AS scrubbed_text
FROM ctoks
LEFT JOIN (
  SELECT doc_id, count(*) AS cnt, string_agg(tok, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
)
def q_scrub_benchmark_spans(spark, sf_dir):
    """Span-level decontamination (dedup/spans.py:scrub_benchmark_spans):
    word 5-grams appearing in the pseudo eval set (doc_id % 100 < 2) are
    deleted from every remaining corpus document, keeping the
    surrounding text — the surgical alternative to
    decontaminate_ngram_corpus's whole-document drop. Benchmark grams
    collapse to broadcast digests; corpus text never shuffles; full
    DuckDB rebuild oracle."""
    from scikit_learn_imputer_spark.dedup.spans import scrub_benchmark_spans

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    return scrub_benchmark_spans(corpus, bench, n=5)


@register(
    "corpus_mixture_sample",
    oracle=rf"""
WITH q AS (
  SELECT doc_id, source, text,
         CAST(len(str_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         {_QSCORE_SQL} AS q_score
  FROM documents
), gated AS (
  SELECT * FROM q WHERE q_score >= 0.65 AND n_tokens >= 10
), survivors AS (
  SELECT * FROM gated
  WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY fp)
), budgeted AS (
  SELECT doc_id, source, n_tokens, q_score,
         CAST(sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM survivors
)
SELECT doc_id, source, n_tokens, cum_tokens, round(q_score, 6) AS q_score
FROM budgeted WHERE cum_tokens <= 500
""",
)
def q_corpus_mixture_sample(spark, sf_dir):
    """The full training-data-prep flow as ONE lazy plan — quality gate →
    exact-dedup survivor selection → per-source token-budget mixture
    sampling. Catalyst fuses the gate and fingerprint into the scan
    projection; the plan then shuffles exactly twice, on the two keys the
    semantics require (fingerprint for dedup, source for the mixture
    window) — which is the shape you'd want at 100 TB: no collect, no
    extra exchange, survivors resolved by a map-side-combinable min.
    """
    from scikit_learn_imputer_spark.functions.text import (
        fingerprint_col,
        quality_score_col,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = F.size(F.split(F.trim(t), "\\s+")).cast("long")
    q_score = quality_score_col(t)
    gated = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        fingerprint_col(t).alias("fp"),
        q_score.alias("q_score"),
    ).filter((F.col("q_score") >= 0.65) & (F.col("n_tokens") >= 10))
    keep = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = gated.join(keep.select("doc_id"), on="doc_id", how="left_semi")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        survivors.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 500)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cum_tokens",
            F.round(F.col("q_score"), 6).alias("q_score"),
        )
    )


@register(
    "embedding_near_pairs",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.42
""",
)
def q_embedding_near_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact small-SF reference for the
    LSH scale path). Threshold 0.42: the testdata embeddings are random
    (max pairwise cosine ≈0.51), so a "near-dup" 0.8+ cut matches zero
    rows at every SF and the driver's hash check was vacuous (VERDICT r3
    #4); 0.42 yields ~30 pairs at sf0.01 / ~440 at sf0.1 so the oracled
    join is actually exercised."""
    pairs = embedding_near_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@register(
    "semdedup_exact",
    oracle="""
SELECT a.vec_id FROM embeddings a
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings b
  WHERE b.vec_id < a.vec_id
    AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.42
)
""",
)
def q_semdedup_exact(spark, sf_dir):
    """SemDeDup survivors, exact single-cluster variant
    (dedup/embedding.py:semdedup_survivors; Abbas et al. 2023): keep a
    vector iff it has NO smaller-id neighbor with cosine >= 0.42 —
    the deterministic min-id keep rule, fully oracled. The quadratic
    baseline for the clustered scale path (semdedup_clustered)."""
    from scikit_learn_imputer_spark.dedup.embedding import semdedup_survivors

    return semdedup_survivors(_t(spark, sf_dir, "embeddings"), eps=0.42)


@register(
    "semdedup_threshold_curve",
    oracle="""
WITH nv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT b.vec_id AS victim,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM nv a JOIN nv b ON a.vec_id < b.vec_id
),
e AS (SELECT victim, cos, CAST(unnest([0.35, 0.42, 0.5, 0.6]) AS DOUBLE) AS thr
      FROM pairs)
SELECT round(thr, 2) AS threshold,
       CAST(count(DISTINCT CASE WHEN cos >= thr THEN victim END) AS BIGINT)
         AS n_removed
FROM e GROUP BY thr
""",
)
def q_semdedup_threshold_curve(spark, sf_dir):
    """SemDeDup eps calibration: removed-vector counts at several cosine
    thresholds under the min-id keep rule (a vector is removed iff some
    smaller-id vector is >= eps close) — the curve a dedup designer
    reads before fixing eps, because removal mass is highly nonlinear in
    the threshold. Built on the exact pair join (the documented
    quadratic baseline; the clustered path scales it); one explode over
    the threshold list, then an O(#thresholds) distinct-count."""
    from scikit_learn_imputer_spark.dedup.embedding import embedding_near_pairs

    pairs = embedding_near_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35
    ).select(F.col("id_b").alias("victim"), F.col("cosine").alias("cos"))
    thrs = F.array(*[F.lit(x) for x in (0.35, 0.42, 0.5, 0.6)])
    e = pairs.select("victim", "cos", F.explode(thrs).alias("thr"))
    return (
        e.groupBy(F.round("thr", 2).alias("threshold"))
        .agg(
            F.countDistinct(
                F.when(F.col("cos") >= F.col("thr"), F.col("victim"))
            ).alias("n_removed")
        )
    )


@register(
    "semdedup_clustered",
    anchor="tests/test_dedup_similarity.py::test_semdedup_clustered_consistency",
)
def q_semdedup_clustered(spark, sf_dir):
    """SemDeDup at the paper's actual scale shape: KMeans cells scope the
    pair search (one equi-join shuffle on the cell key, per-cell
    quadratic bounded by cell size — never corpus x corpus). Rows-only:
    the MLlib KMeans assignment is seeded but not SQL-reproducible;
    anchored by the planted-duplicates consistency test, with
    semdedup_exact as the oracled twin of the keep rule."""
    from scikit_learn_imputer_spark.dedup.embedding import semdedup_survivors
    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    # Materialize the (small) survivor-id frame BEFORE releasing the
    # KMeans assignment cache — same eager-then-unpersist order the
    # ivfpq query uses (ADVICE r5: unpersist-before-evaluate silently
    # recomputes the index inside the timed run).
    out = semdedup_survivors(emb, eps=0.42, assigned=assigned).localCheckpoint(
        eager=True
    )
    assigned.unpersist()
    return out


@register("embedding_near_pairs_blas", oracle=ORACLE["embedding_near_pairs"])
def q_embedding_near_pairs_blas(spark, sf_dir):
    """Same exact pair join, BLAS path (dedup/embedding.py): broadcast
    normalized matrix + one matmul per row block — shares the expression
    path's oracle, ~5-10x its wall clock at bench SF."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        embedding_near_pairs_blas,
    )

    pairs = embedding_near_pairs_blas(
        _t(spark, sf_dir, "embeddings"), threshold=0.42
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@register(
    "cosine_topk",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cos
  FROM embeddings e, q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 10
""",
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force exact top-k cosine ANN baseline: broadcast queries,
    per-query window (no global sort)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register("cosine_topk_lsh", anchor="tests/test_dedup_similarity.py::test_cosine_topk_lsh_multiprobe_recall_monotone")
def q_cosine_topk_lsh(spark, sf_dir):
    """ANN sign-LSH top-k — the sub-quadratic scale path
    (similarity/knn.py:cosine_topk_lsh): candidates only form inside the
    query's sign-hash bucket, exact cosine re-ranks survivors. Rows-only
    (approximate by construction — recall is judged against cosine_topk by
    tests/test_dedup_similarity.py); registered so the scale path's
    throughput is bench-visible next to its exact baselines."""
    from scikit_learn_imputer_spark.similarity.knn import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_lsh(emb, queries, k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register("embedding_near_pairs_brp", anchor="tests/test_dedup_similarity.py::test_embedding_near_pairs_lsh_finds_dups")
def q_embedding_near_pairs_brp(spark, sf_dir):
    """DOCUMENTED BASELINE (demoted from the scale table, VERDICT r11
    #2 — formerly named near_pairs_lsh): embedding near-dup pairs via
    MLlib BucketedRandomProjectionLSH, kept strictly as the MLlib-parity
    recall baseline (cosine ≥ t ⟺ euclidean ≤ √(2−2t) on unit vectors;
    candidates form only inside shared hash buckets). Rows-only: the
    seeded random projections are not SQL-expressible; recall vs exact
    is pinned by tests/test_dedup_similarity.py. NOT a registered scale
    path: MLlib's FIXED bucket resolution makes candidates Θ(n²·p) —
    measured exponent 1.96 in the sf1 scale-proof (BASELINE.md). The
    shipped sub-quadratic inventory at the same threshold is
    near_pairs_cells (bounded KMeans cells, exponent 0.20, 64× faster
    at sf1 — dedup/embedding.py:embedding_near_pairs_cells)."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        embedding_near_pairs_lsh,
    )

    pairs = embedding_near_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.42
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@register("cosine_topk_numpy", oracle=ORACLE["cosine_topk"])
def q_cosine_topk_numpy(spark, sf_dir):
    """Same exact top-k, BLAS path (similarity/knn.py:cosine_topk_numpy):
    one matmul per Arrow batch + per-batch top-k, so the shuffle into the
    final ranking carries partitions×|Q|×k rows instead of the corpus.
    Shares cosine_topk's oracle — the two physical strategies must agree."""
    from scikit_learn_imputer_spark.similarity.knn import cosine_topk_numpy

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_numpy(emb, queries, k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register(
    "asof_last_signup",
    oracle="""
SELECT e.event_id, e.user_id, s.ts AS signup_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def q_asof_last_signup(spark, sf_dir):
    """As-of join (operators/asof.py): for every event, the latest signup
    of the same user at or before it. One shuffle by user, running window —
    no per-key loop, no range cross join."""
    from scikit_learn_imputer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("ts").alias("signup_ts")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["signup_ts"],
    )
    return out.select("event_id", "user_id", "signup_ts")


@register(
    "asof_next_purchase",
    oracle="""
SELECT e.event_id, e.user_id, p.ts AS next_purchase_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts <= p.ts
""",
)
def q_asof_next_purchase(spark, sf_dir):
    """FORWARD as-of join (operators/asof.py direction='forward'): for every
    event, the EARLIEST purchase of the same user at or after it — the other
    running-window pass of the same one-shuffle plan. Driver-visible twin of
    asof_last_signup so both directions are oracled (VERDICT r3 #6); DuckDB's
    ASOF with ``e.ts <= p.ts`` is the forward oracle."""
    from scikit_learn_imputer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("next_purchase_ts")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["next_purchase_ts"],
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_purchase_ts")


@register(
    "asof_nearest_purchase",
    oracle="""
SELECT e.event_id, e.user_id,
       (SELECT p.ts FROM events p
         WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
         ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)) ASC, p.ts ASC
         LIMIT 1) AS nearest_purchase_ts
FROM events e
""",
)
def q_asof_nearest_purchase(spark, sf_dir):
    """NEAREST as-of join (operators/asof.py direction='nearest'): closest
    purchase in time, exact-distance ties resolving backward (pandas
    merge_asof semantics). Oracle is an arg-min subquery ordered by
    |Δt| then ts ASC — ties pick the earlier (backward) row, matching the
    Spark tie rule."""
    from scikit_learn_imputer_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("nearest_purchase_ts")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["nearest_purchase_ts"],
        direction="nearest",
    )
    return out.select("event_id", "user_id", "nearest_purchase_ts")


@register(
    "rollup_revenue",
    oracle="""
SELECT n_name, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name)
""",
)
def q_rollup_revenue(spark, sf_dir):
    """Grouping-set aggregate (SURVEY.md §2.10 — free in Spark SQL):
    per-nation revenue plus the grand-total row."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_customers_without_orders(spark, sf_dir):
    """Set difference (EXCEPT DISTINCT) — §2.10 set-operation coverage:
    customers with no finished ('F') order."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@register(
    "orders_by_weekday",
    oracle="""
SELECT CAST(date_part('dow', o_orderdate) AS INTEGER) AS dow,
       count(*) AS n_orders,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY 1
""",
)
def q_orders_by_weekday(spark, sf_dir):
    """Date-function coverage; Spark dayofweek is 1-based Sunday, the
    portable form is dayofweek - 1 == date_part('dow')."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "user_sessions",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
  FROM flagged
)
SELECT user_id, session_num,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
""",
)
def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (declarative batch twin of the stateful
    streaming operator in streaming/sessions.py): lag + running sum per
    user, one shuffle."""
    from scikit_learn_imputer_spark.streaming.sessions import sessionize_batch

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize_batch(ev, gap_minutes=30)


@register(
    "user_sessions_numbered_native",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
  FROM flagged
)
SELECT user_id, session_num,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
""",
)
def q_user_sessions_numbered_native(spark, sf_dir):
    """Gap sessionization via session_window WITH per-user session
    numbers (streaming/sessions.py:sessionize_native) — distinct from
    `user_sessions_native` (the bare aggregate, gap>=30 split) in two
    ways: a +1µs duration aligns the half-open window boundary with the
    lag form's strict-greater gap test, so output is row-identical to
    `user_sessions` and shares its oracle; and session_num is assigned
    by a user-partitioned window over the O(sessions) aggregate."""
    from scikit_learn_imputer_spark.streaming.sessions import sessionize_native

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize_native(ev, gap_minutes=30)


@register(
    "label_encode",
    oracle="""
WITH codes AS (
  SELECT v, row_number() OVER (ORDER BY v) - 1 AS code
  FROM (SELECT DISTINCT c_mktsegment AS v FROM customer)
)
SELECT c_custkey, CAST(code AS DOUBLE) AS segment_code
FROM customer JOIN codes ON c_mktsegment = v
""",
)
def q_label_encode(spark, sf_dir):
    """E2: lexicographic label encoding (sklearn LabelEncoder order) as a
    pure projection against the literal label array."""
    from scikit_learn_imputer_spark.operators.encode import label_encode

    df = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    encoded, _labels = label_encode(df, "c_mktsegment", out_col="segment_code")
    return encoded.select("c_custkey", "segment_code")


@register(
    "create_features",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
filled AS (
  SELECT c_custkey,
    COALESCE(
      last_value(c_acctbal IGNORE NULLS) OVER w_f,
      first_value(c_acctbal IGNORE NULLS) OVER w_b) AS c_acctbal,
    COALESCE(
      last_value(c_mktsegment IGNORE NULLS) OVER w_f,
      first_value(c_mktsegment IGNORE NULLS) OVER w_b) AS c_mktsegment
  FROM customer_nulls
  WINDOW
    w_f AS (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_b AS (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
stats AS (SELECT min(c_acctbal) mn, max(c_acctbal) mx FROM filled)
SELECT c_custkey,
  round(CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END, 6)
    AS c_acctbal,
""" + ",\n".join(
        f"  CASE WHEN c_mktsegment = '{v}' THEN 1 ELSE 0 END AS c_mktsegment_{v}"
        for v in MKTSEGMENTS
    ) + "\nFROM filled, stats",
)
def q_create_features(spark, sf_dir):
    """C4 composite: ordered fill → one-hot → min-max scale, the imputer's
    whole feature pipeline as one oracle-checked relational plan."""
    from scikit_learn_imputer_spark.operators.encode import one_hot
    from scikit_learn_imputer_spark.operators.scale import minmax_scale

    df = with_nulls(_t(spark, sf_dir, "customer"), "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    filled = ffill_bfill(df, "c_custkey", ["c_acctbal", "c_mktsegment"])
    encoded = one_hot(filled, ["c_mktsegment"], values={"c_mktsegment": MKTSEGMENTS})
    scaled = minmax_scale(encoded, ["c_acctbal"])
    return scaled.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 6).alias("c_acctbal"),
        *[F.col(f"c_mktsegment_{v}") for v in MKTSEGMENTS],
    )


@register(
    "events_in_window",
    oracle="""
SELECT l.event_id,
       CAST(count(r.ts) AS BIGINT) AS n_in_window
FROM events l
LEFT JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 5 MINUTE
 AND r.ts < l.ts
GROUP BY l.event_id
""",
)
def q_events_in_window(spark, sf_dir):
    """Keyed interval join (operators/rangejoin.py): per event, how many
    same-user events landed in the preceding 5 minutes. Bucketed into an
    equi join — never a per-key nested loop."""
    from scikit_learn_imputer_spark.operators.rangejoin import (
        interval_join_count,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = interval_join_count(
        ev, ev, on="user_id", left_ts="ts", right_ts="ts", window_seconds=300
    )
    return out.select("event_id", "n_in_window")


@register(
    "tfidf_top_terms",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf * ln(n::DOUBLE / df) AS tfidf
  FROM tf JOIN df USING (term), n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank
FROM ranked WHERE rank <= 3
""",
)
def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document: explode → two aggregates (term
    frequency per doc, document frequency per term) → broadcast idf join →
    per-doc top-k window. The df table is O(vocabulary) — broadcastable."""
    d = _t(spark, sf_dir, "documents")
    # Corpus size stays in-plan: a one-row aggregate broadcast onto the
    # scored frame instead of a build-time d.count() job.
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    terms = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_t), on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


@register(
    "price_percentiles",
    oracle="""
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
       round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
       round(quantile_cont(c_acctbal, 0.75), 4) AS p75
FROM customer GROUP BY c_mktsegment
""",
)
def q_price_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). At 100 TB the same plan swaps to
    ``approx_percentile`` — the exact form is the correctness anchor."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
""",
)
def q_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter+sum — both predicates reach the parquet
    scan (PushedFilters), one partial-agg pass, one row out."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24) & F.col("l_discount").between(0.05, 0.07)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@register(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q_q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join with a non-equi residual
    condition, then a small aggregate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "scatter_update_group_mean",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')}),
gm AS (
  SELECT c_nationkey, round(avg(c_acctbal), 2) AS fill
  FROM customer_nulls GROUP BY c_nationkey
)
SELECT c_custkey, COALESCE(c_acctbal, fill) AS c_acctbal
FROM customer_nulls JOIN gm USING (c_nationkey)
""",
)
def q_scatter_update_group_mean(spark, sf_dir):
    """Grouped-mean imputation: per-nation mean fill via broadcast join +
    coalesce — the grouped variant of J3 (group stats are O(groups),
    always broadcastable)."""
    df = with_nulls(_t(spark, sf_dir, "customer"), "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    gm = df.groupBy("c_nationkey").agg(
        F.round(F.avg("c_acctbal"), 2).alias("__fill")
    )
    return df.join(F.broadcast(gm), on="c_nationkey").select(
        "c_custkey",
        F.coalesce(F.col("c_acctbal"), F.col("__fill")).alias("c_acctbal"),
    )


@register(
    "salted_event_counts",
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY event_type
""",
)
def q_salted_event_counts(spark, sf_dir):
    """Skew-safe two-stage aggregation (functions/skew.py): the salt only
    changes partitioning, never values — so the plain GROUP BY is the
    oracle."""
    from scikit_learn_imputer_spark.functions.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], {"n": ("*", "count"), "total": ("value", "sum")}
    )
    return out.select(
        "event_type", "n", F.round(F.col("total"), 2).alias("total")
    )


@register(
    "embedding_norms_by_label",
    oracle="""
SELECT label,
       round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[]))), 6) AS avg_norm,
       count(*) AS n
FROM embeddings GROUP BY label
""",
)
def q_embedding_norms_by_label(spark, sf_dir):
    """Array-function aggregate: L2 norm via zip_with/aggregate (JVM
    higher-order functions), averaged per label."""
    from scikit_learn_imputer_spark.dedup.embedding import norm

    e = _t(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.round(
            F.avg(norm(F.col("embedding").cast("array<double>"))), 6
        ).alias("avg_norm"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "users_purchase_and_error",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""",
)
def q_users_purchase_and_error(spark, sf_dir):
    """Set intersection (INTERSECT DISTINCT) — §2.10 set-op coverage."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


def _hex60_sql(arg: str) -> str:
    """DuckDB: first 15 hex chars of md5(arg) folded to a 60-bit BIGINT —
    value-equal to Spark's conv(substr(md5(..),1,15),16,10)."""
    return (
        "list_reduce(list_transform(generate_series(1, 15), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5({arg}), CAST(i AS INT), 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


_MINHASH_K = 8


def _minhash_oracle_sql() -> str:
    """DuckDB twin of the affine minhash family: one md5-derived base hash
    per gram, K components (a_k·h + b_k) mod P with the module's fixed
    coefficients."""
    from scikit_learn_imputer_spark.dedup.minhash import (
        AFFINE_COEFFS,
        MINHASH_P,
    )

    sigs = ",\n".join(
        f"       min((CAST({a} AS BIGINT) * h + {b}) % {MINHASH_P}) AS sig_{k}"
        for k, (a, b) in enumerate(AFFINE_COEFFS[:_MINHASH_K])
    )
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(len(text) - 4, 0))) AS i
        FROM documents)
),
hashed AS (
  SELECT doc_id, ({_hex60_sql("'0|' || gram")}) % {MINHASH_P} AS h FROM grams
)
SELECT doc_id,
{sigs}
FROM hashed GROUP BY doc_id
"""


@register("minhash_signatures_md5", oracle=_minhash_oracle_sql())
def q_minhash_signatures_md5(spark, sf_dir):
    """MinHash signatures with the engine-portable md5 base hash — the
    oracle-checked anchor for the xxhash64 production path (identical
    affine-family algorithm, different base hash)."""
    from scikit_learn_imputer_spark.dedup.minhash import minhash_signatures

    return minhash_signatures(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_K,
        shingle=5,
        hasher="md5",
    )


def _minhash_candidates_oracle_sql() -> str:
    """Brute-force DuckDB twin of the banded-LSH candidate join (K=8,
    2 bands of 4 rows — 4-row bands keep the collision curve steep; 2-row
    bands admit ~1M candidates at sf0.1 on this shared-vocabulary corpus):
    candidate ⟺ some band's full slice matches. The bucketed Spark plan is
    sub-quadratic; the O(n²) oracle is viable at correctness SF and checks
    both membership and est_jaccard."""
    eq = " + ".join(
        f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(_MINHASH_K)
    )
    bands = " OR ".join(
        "(" + " AND ".join(
            f"a.sig_{4*b+j} = b.sig_{4*b+j}" for j in range(4)
        ) + ")"
        for b in range(_MINHASH_K // 4)
    )
    return f"""
WITH sigs AS ({_minhash_oracle_sql()})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(({eq}) AS DOUBLE) / {_MINHASH_K} AS est_jaccard
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE {bands}
"""


@register("minhash_candidates_md5", oracle=_minhash_candidates_oracle_sql())
def q_minhash_candidates_md5(spark, sf_dir):
    """Banded MinHash-LSH candidate pairs with the md5 base hash — the
    oracle-checked anchor for the xxhash64 `minhash_candidates` production
    path. Same sub-quadratic plan (pairs only inside band buckets); the
    oracle's brute-force band predicate verifies membership exactly
    because banding is a pure function of the (already-oracled)
    signatures. max_bucket is unbounded HERE because the oracle keeps
    every in-bucket pair — the production path's skew-guard drop is not
    modeled in SQL, so the oracled variant must not drop either
    (ADVICE r4); the guard itself is unit-tested in
    tests/test_dedup_similarity.py:test_minhash_simhash_max_bucket_skew_guard."""
    from scikit_learn_imputer_spark.dedup.minhash import minhash_candidate_pairs

    out = minhash_candidate_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_K,
        bands=_MINHASH_K // 4,
        shingle=5,
        hasher="md5",
        max_bucket=2**31,
    )
    return out.select(
        "id_a", "id_b", F.round(F.col("est_jaccard"), 6).alias("est_jaccard")
    )


@register("minhash_candidates_salted_md5", oracle=_minhash_candidates_oracle_sql())
def q_minhash_candidates_salted_md5(spark, sf_dir):
    """Skew-salted LSH candidates (VERDICT r5 #8): max_bucket=20 forces
    many buckets onto the salted two-stage join path (probe fans out to
    g=ceil(bsize/20) deterministic hash chunks; per-task pair work is
    bounded at bsize×max_bucket), yet the output is EXACTLY the
    uncapped-LSH pair set — so it shares minhash_candidates_md5's
    oracle. Full recall on pathological boilerplate buckets without the
    single-straggler task the plain uncapped join would create."""
    from scikit_learn_imputer_spark.dedup.minhash import minhash_candidate_pairs

    out = minhash_candidate_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_K,
        bands=_MINHASH_K // 4,
        shingle=5,
        hasher="md5",
        max_bucket=20,
        heavy="salt",
    )
    return out.select(
        "id_a", "id_b", F.round(F.col("est_jaccard"), 6).alias("est_jaccard")
    )


@register(
    "simhash_md5",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, {_hex60_sql("'0|' || tok")} AS h FROM toks
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed, (SELECT unnest(generate_series(0, 59)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""",
)
def q_simhash_md5(spark, sf_dir):
    """SimHash signatures with the md5 hash family — oracle-checked anchor
    for the xxhash64 production path."""
    from scikit_learn_imputer_spark.dedup.simhash import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"), hasher="md5")


@register(
    "simhash_near_pairs_md5",
    oracle=f"""
WITH sigs AS ({ORACLE['simhash_md5']})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_simhash_near_pairs_md5(spark, sf_dir):
    """SimHash near-dup pairs at Hamming ≤ 3 via 4-chunk pigeonhole
    bucketing (dedup/simhash.py:simhash_near_pairs): any two signatures
    within distance 3 of a 60-bit hash agree on at least one 15-bit chunk,
    so pairs only form inside shared chunk buckets — sub-quadratic — yet
    the result is EXACT, which is why the brute-force pair-join oracle can
    check it. max_bucket is unbounded HERE: the oracle keeps every
    in-bucket pair, so the oracled variant must not apply the production
    skew-guard drop (ADVICE r4)."""
    from scikit_learn_imputer_spark.dedup.simhash import simhash_near_pairs

    out = simhash_near_pairs(
        _t(spark, sf_dir, "documents"),
        max_hamming=3,
        hasher="md5",
        max_bucket=2**31,
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# =====================================================================
# Relational breadth pack: TPC-H shapes, window analytics, pivot/cube,
# scalar-function suites, grouped executor-side ML (SURVEY.md §2.10 gaps)
# =====================================================================

@register(
    "q13_custdist",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: left outer join + two-level aggregation (order
    count per customer, then customer count per order count). The second
    aggregate's input is one row per customer — already small."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
SELECT round(
  100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
""",
)
def q_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact⨝dim join with
    a pushed-down date-range predicate; the part side is broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_pct")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
),
brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
),
part_avg AS (
  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_limit
  FROM brand_li GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM brand_li JOIN part_avg ON l_partkey = pk
WHERE l_quantity < qty_limit
""",
)
def q_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape (correlated scalar subquery decorrelated): semi-join
    the fact table down to the brand's parts FIRST, so the per-part average
    is computed over the reduced set and its result is broadcast back —
    never a big-big self-join on the full fact table."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).drop("p_partkey")
    part_avg = brand_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        brand_li.join(F.broadcast(part_avg), brand_li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 1) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 250
""",
)
def q_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: join + group-by with a HAVING filter on the
    aggregate (large-volume orders, ~top 1%% of quantity sums)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("qty", 1).alias("total_qty"),
        )
    )


@register(
    "daily_revenue_ma7",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
         round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
)
SELECT d, rev,
  round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
    AS rev_ma7,
  round(rev - lag(rev) OVER (ORDER BY d), 2) AS rev_delta
FROM daily
""",
)
def q_daily_revenue_ma7(spark, sf_dir):
    """Time-series analytics: daily revenue, 7-day moving average, and
    day-over-day delta (lag). The unpartitioned window is safe here because
    its input is the POST-aggregation frame — one row per distinct day
    (bounded by the calendar, ~2.4k rows regardless of fact-table scale)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w_ma = Window.orderBy("d").rowsBetween(-6, 0)
    w_lag = Window.orderBy("d")
    return daily.select(
        "d",
        "rev",
        F.round(F.avg("rev").over(w_ma), 2).alias("rev_ma7"),
        F.round(F.col("rev") - F.lag("rev").over(w_lag), 2).alias("rev_delta"),
    )


@register(
    "pivot_priority_status",
    oracle="""
SELECT o_orderpriority,
  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS status_F,
  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS status_O,
  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS status_P
FROM orders GROUP BY o_orderpriority
""",
)
def q_pivot_priority_status(spark, sf_dir):
    """Pivot (long→wide): revenue by priority × status. Pivot values are
    passed explicitly so the plan needs no extra distinct-values job."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_F"),
        F.col("O").alias("status_O"),
        F.col("P").alias("status_P"),
    )


@register(
    "part_unpivot",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', round(p_retailprice, 2) FROM part
""",
)
def q_part_unpivot(spark, sf_dir):
    """Unpivot (wide→long): melt numeric part attributes into
    (key, metric, value) — narrow scan, no shuffle at all."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.round("p_retailprice", 2).alias("p_retailprice"),
    )
    return p.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "metric", "value"
    )


@register(
    "cube_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_revenue(spark, sf_dir):
    """CUBE grouping sets: all 4 aggregation levels in one pass (partial
    aggregation expands grouping sets map-side — no 4 separate scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "grouped_linreg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_grouped_linreg(spark, sf_dir):
    """Per-group OLS fit executor-side via applyInPandas (operators/
    grouped_ml.py) — the M4 per-column-model loop generalized to
    per-GROUP models that never touch the driver. Oracled against
    DuckDB's regr_* aggregates."""
    from scikit_learn_imputer_spark.operators.grouped_ml import (
        grouped_linreg_pandas,
    )

    out = grouped_linreg_pandas(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        x_col="l_quantity",
        y_col="l_extendedprice",
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("slope", 3).alias("slope"),
        F.round("intercept", 2).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        "n",
    )


@register(
    "string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_u,
       substr(p_name, 1, 4) AS name_pre,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('-', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_us,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
       reverse(p_name) AS name_rev,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
FROM part
""",
)
def q_string_funcs(spark, sf_dir):
    """Scalar string-function suite (§2.10 gap) — all JVM built-ins inside
    whole-stage codegen; integer widths cast to BIGINT for parity."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.substring("p_name", 1, 4).alias("name_pre"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.instr("p_name", "e").cast("bigint").alias("first_e"),
        F.reverse("p_name").alias("name_rev"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       last_day(o_orderdate) AS month_end,
       strftime(o_orderdate, '%Y-%m') AS ym,
       date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
FROM orders
""",
)
def q_date_funcs(spark, sf_dir):
    """Scalar date/time-function suite (§2.10 gap): extraction, truncation,
    calendar arithmetic, formatting — all codegen'd built-ins."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days_to_y2k"),
    )


@register(
    "events_sliding",
    oracle="""
WITH bucketed AS (
  SELECT event_type, value,
         make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS b
  FROM events
),
assigned AS (
  SELECT b AS window_start, event_type, value FROM bucketed
  UNION ALL
  SELECT b - INTERVAL 30 MINUTE, event_type, value FROM bucketed
)
SELECT window_start, event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM assigned GROUP BY 1, 2
""",
)
def q_events_sliding(spark, sf_dir):
    """Sliding event-time windows (1h window / 30m slide): each event lands
    in exactly two windows. Shares the streaming module's window logic
    (streaming/events.py — the stream==batch test covers the same plan);
    the oracle reproduces Spark's epoch-aligned window assignment with
    half-open [start, start+1h) intervals."""
    from scikit_learn_imputer_spark.streaming.events import (
        windowed_event_counts_batch,
    )

    out = windowed_event_counts_batch(spark, sf_dir, "1 hour", slide="30 minutes")
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive mixed-table predicates. Catalyst
    extracts the common per-table disjuncts (brand/size on part, quantity
    on lineitem) and pushes them below the join as scan filters."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def q_q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold (computed once, joined as
    a broadcast single-row frame — never a driver collect in the plan) +
    anti join against the filtered orders side, then grouped aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round((embedding::DOUBLE[])[1], 6) AS first_val,
       round(list_max(embedding::DOUBLE[]), 6) AS max_val,
       round(list_min(embedding::DOUBLE[]), 6) AS min_val,
       array_to_string([printf('%.6f', x)
                        FOR x IN list_sort(list_slice(embedding::DOUBLE[], 1, 4))],
                       ',') AS head_sorted,
       round(list_sum([x*x FOR x IN embedding::DOUBLE[]]), 6) AS sq_norm
FROM embeddings
""",
)
def q_array_funcs(spark, sf_dir):
    """Array-function suite (§2.10 gap) over the embedding column: size,
    element access, min/max, slice+sort, and a transform+aggregate lambda —
    all JVM higher-order functions, no UDFs."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_val"),
        F.round(F.array_max(v), 6).alias("max_val"),
        F.round(F.array_min(v), 6).alias("min_val"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.slice(v, 1, 4)),
                lambda x: F.format_string("%.6f", x),
            ),
        ).alias("head_sorted"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
    )


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id, sha256(text) AS sha256,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""",
)
def q_multimodal_features(spark, sf_dir):
    """Multimodal binary pipeline end-to-end: documents → binary payload
    column (JVM-side encode) → Arrow-batched mapInPandas feature extraction
    (sources/multimodal.py) → per-item digest + size. The payload bytes are
    derived from text so the oracle can recompute the digests — the
    Spark-side plumbing (BinaryType schema, batch shapes, stubbed codec) is
    exactly the production path."""
    from scikit_learn_imputer_spark.sources.multimodal import (
        extract_media_features,
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    feats = extract_media_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"), "sha256", "n_bytes"
    )


@register("ann_ivf_topk", oracle=ORACLE["cosine_topk"])
def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate ANN (similarity/ivf.py) run in its exact limit
    (nprobe == nlist), where it must equal brute force — the correctness
    anchor for the approximation, sharing cosine_topk's oracle. The
    KMeans build is the one-shuffle index construction; search probes
    cells via a broadcast of the exploded query×cell frame."""
    from scikit_learn_imputer_spark.similarity.ivf import (
        build_ivf_index,
        cosine_topk_ivf,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # Cheap build (3 iters, random init): with nprobe == nlist the result
    # is exact regardless of cell quality — the build cost is pure overhead
    # for the correctness anchor.
    assigned, centroids = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_ivf(assigned, centroids, queries, k=10, nprobe=8)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register("ann_ivf_persisted_topk", oracle=ORACLE["cosine_topk"])
def q_ann_ivf_persisted_topk(spark, sf_dir):
    """IVF ANN probing a PERSISTED index (similarity/ivf.py:save_ivf_index
    round-trip): the index is written as cell-partitioned parquet, read
    back, and probed — at 100 TB this is the build-once-probe-many shape
    where the probe's cell join dynamically prunes index partitions at
    the scan (nprobe/nlist of the bytes). Run in the exact limit
    (nprobe == nlist) so it shares cosine_topk's brute-force oracle."""
    from scikit_learn_imputer_spark.similarity.ivf import (
        build_ivf_index,
        cosine_topk_ivf,
        load_ivf_index,
        save_ivf_index,
    )

    path = _scratch("spark_ivf_index")
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    save_ivf_index(assigned, centroids, path)
    assigned.unpersist()
    disk_assigned, disk_centroids = load_ivf_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_ivf(disk_assigned, disk_centroids, queries, k=10, nprobe=8)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register(
    "null_cond_funcs",
    oracle=f"""
WITH orders_nulls AS ({nulls_cte('orders')})
SELECT o_orderkey,
       round(coalesce(o_totalprice, 0.0), 2) AS price_or_zero,
       nullif(o_orderpriority, '5-LOW') AS prio_or_null,
       CASE WHEN o_totalprice IS NULL THEN 'missing'
            WHEN o_totalprice > 100000 THEN 'big'
            ELSE 'small' END AS size_bucket,
       round(greatest(o_totalprice, 50000.0), 2) AS floored,
       round(least(o_totalprice, 50000.0), 2) AS capped,
       o_totalprice IS NULL AS price_missing
FROM orders_nulls
""",
)
def q_null_cond_funcs(spark, sf_dir):
    """Null-handling / conditional scalar suite (§2.10 gap): coalesce,
    nullif, CASE, greatest/least (both engines skip NULL operands) — all
    codegen built-ins over the null-injected orders table."""
    df = with_nulls(_t(spark, sf_dir, "orders"), "orders")
    price = F.col("o_totalprice")
    return df.select(
        "o_orderkey",
        F.round(F.coalesce(price, F.lit(0.0)), 2).alias("price_or_zero"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio_or_null"),
        F.when(price.isNull(), "missing")
        .when(price > 100000, "big")
        .otherwise("small")
        .alias("size_bucket"),
        F.round(F.greatest(price, F.lit(50000.0)), 2).alias("floored"),
        F.round(F.least(price, F.lit(50000.0)), 2).alias("capped"),
        price.isNull().alias("price_missing"),
    )


@register(
    "regex_funcs",
    oracle="""
SELECT doc_id,
       regexp_replace(text, '[0-9]+', '#', 'g') AS no_digits,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
       regexp_extract(text, '^([A-Za-z]+)', 1) AS first_word,
       regexp_matches(text, '[0-9]') AS has_digit,
       split_part(text, ' ', 1) AS first_tok
FROM documents
""",
)
def q_regex_funcs(spark, sf_dir):
    """Regex scalar suite (§2.10 gap): replace-all (DuckDB needs the 'g'
    flag to match Spark's default), extract-all count, anchored capture,
    boolean match, split_part — JVM regex, no Python."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_replace(t, "[0-9]+", "#").alias("no_digits"),
        F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0))
        .cast("bigint")
        .alias("n_words"),
        F.regexp_extract(t, "^([A-Za-z]+)", 1).alias("first_word"),
        t.rlike("[0-9]").alias("has_digit"),
        F.split_part(t, F.lit(" "), F.lit(1)).alias("first_tok"),
    )


@register(
    "stratified_sample",
    oracle="""
WITH ranked AS (
  SELECT c_custkey, c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY (c_custkey * 2654435761) % 1000003,
                                     c_custkey) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_custkey, c_mktsegment FROM ranked
WHERE rn <= CAST(ceil(0.1 * n) AS BIGINT)
""",
)
def q_stratified_sample(spark, sf_dir):
    """Exact 10%-per-stratum sample with a portable deterministic order
    (Knuth multiplicative hash on the key — no engine RNG, reproducible
    across engines/runs). One window pass per stratum; at scale this is a
    single shuffle on the stratum key, no driver-side sampling."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        (F.col("c_custkey") * 2654435761) % 1000003, F.col("c_custkey")
    )
    wn = Window.partitionBy("c_mktsegment")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(0.1 * F.col("n")).cast("bigint"))
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "group_split",
    oracle="""
SELECT split, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM (
  SELECT user_id,
         CASE WHEN (user_id * 2654435761) % 10 < 8 THEN 'train'
              WHEN (user_id * 2654435761) % 10 < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM events
)
GROUP BY split
""",
)
def q_group_split(spark, sf_dir):
    """Group-aware train/val/test split: every event of a user lands in the
    SAME split (no leakage across splits), assigned by a portable
    deterministic hash of the group key — a map-only projection, no
    shuffle until the verification aggregate."""
    ev = _t(spark, sf_dir, "events")
    h = (F.col("user_id") * 2654435761) % 10
    split = (
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test")
    )
    return (
        ev.select(F.col("user_id"), split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def q_latest_event_per_user(spark, sf_dir):
    """Keep-newest-per-key dedup (the snapshot/compaction primitive):
    window partitioned by the key — parallel across keys, deterministic
    tie-break, one shuffle. The dropDuplicates() equivalent has no ordering
    guarantee; this form is the correct one."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "events_dedup",
    oracle="""
SELECT event_id, ts, user_id, event_type, round(value, 6) AS value
FROM events
""",
)
def q_events_dedup(spark, sf_dir):
    """Exactly-once from at-least-once: the source is doubled (simulated
    redelivery), then deduplicated by event id (streaming/events.py —
    the stream version bounds its state with
    dropDuplicatesWithinWatermark). Dedup of the doubled stream must
    reproduce the original table exactly."""
    from scikit_learn_imputer_spark.streaming.events import deduped_events

    ev = _t(spark, sf_dir, "events")
    redelivered = ev.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    out = deduped_events(redelivered)
    return out.select(
        "event_id", "ts", "user_id", "event_type",
        F.round("value", 6).alias("value"),
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (cn.n_name = 'NATION_19' AND sn.n_name = 'NATION_18')
   OR (cn.n_name = 'NATION_18' AND sn.n_name = 'NATION_19')
GROUP BY 1, 2, 3
""",
)
def q_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by year —
    the same dim table (nation) joined twice under different roles, both
    broadcast; the disjunctive pair filter applies post-join on dim
    columns only."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        ((F.col("cust_nation") == "NATION_19") & (F.col("supp_nation") == "NATION_18"))
        | ((F.col("cust_nation") == "NATION_18") & (F.col("supp_nation") == "NATION_19"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(round(sum(l_extendedprice * (1 - l_discount)), 2)
             - round(sum(p_retailprice * l_quantity * 0.6), 2), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2
""",
)
def q_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: no partsupp table, so cost is a retail
    fraction): profit per supplier nation per year for parts matching a
    name pattern. The LIKE filter reduces part BEFORE its broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity") * 0.6
    # Revenue and cost are summed SEPARATELY (each all-positive, stable
    # under 2-decimal rounding) and differenced after — a single
    # mixed-sign sum's float noise can cross the rounding boundary.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.round(F.sum(rev), 2) - F.round(F.sum(cost), 2), 2
            ).alias("profit")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: lost revenue from returned items, top-20
    customers — selective fact filter pushed to the scan, TakeOrdered
    top-k (never a global sort)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q16_supplier_diversity",
    oracle="""
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
GROUP BY p_brand, p_type
""",
)
def q_q16_supplier_diversity(spark, sf_dir):
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    supplier count per part attribute group with exclusion + IN-list
    filters, all pushed into the broadcast side's scan."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q2_min_price_part",
    oracle="""
SELECT p_type, p_size, p_partkey, p_retailprice
FROM (
  SELECT p_type, p_size, p_partkey, p_retailprice,
         min(p_retailprice) OVER (PARTITION BY p_type, p_size) AS min_price
  FROM part
) WHERE p_retailprice = min_price
""",
)
def q_q2_min_price_part(spark, sf_dir):
    """TPC-H Q2 shape (correlated min decorrelated): cheapest part(s) per
    (type, size) via a grouped window min — one shuffle on the group key,
    no self-join."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type", "p_size")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_type", "p_size", "p_partkey", "p_retailprice")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
WITH vol AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS pk, sum(supp_qty) AS part_qty FROM vol GROUP BY 1
)
SELECT l_partkey, l_suppkey, round(supp_qty, 1) AS supp_qty,
       round(supp_qty / part_qty, 4) AS share
FROM vol JOIN tot ON l_partkey = pk
WHERE supp_qty > 0.15 * part_qty
""",
)
def q_q20_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted): suppliers carrying >15% of a part's
    total volume. Re-aggregating the first aggregate (partial→per-part
    total) replaces the correlated subquery; the share threshold is a
    window-free join on the already-small aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    tot = vol.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    return (
        vol.join(tot, vol.l_partkey == tot.pk)
        .filter(F.col("supp_qty") > 0.15 * F.col("part_qty"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.round("supp_qty", 1).alias("supp_qty"),
            F.round(F.col("supp_qty") / F.col("part_qty"), 4).alias("share"),
        )
    )


@register(
    "doc_tokens_positional",
    oracle="""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, parts[CAST(i AS INT)] AS token
FROM s, unnest(generate_series(1, len(parts))) AS t(i)
WHERE parts[CAST(i AS INT)] <> ''
""",
)
def q_doc_tokens_positional(spark, sf_dir):
    """Lateral tokenization (the UDTF-shaped operator done Spark-first):
    posexplode keeps token positions without any Python in the loop —
    generators are the one row-multiplying operator class, and the
    built-in stays in the JVM."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .filter(F.col("token") != "")
    )


@register(
    "corpus_clean",
    oracle="""
WITH f AS (
  SELECT doc_id, text, lang,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio,
         CAST(len(list_filter(string_split(trim(text), ' '),
              t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
           / len(string_split(trim(text), ' ')) AS stop_ratio,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
           / length(text) AS punct_ratio,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
scored AS (
  SELECT doc_id, text, lang, n_tokens,
         0.4 * alpha_ratio + 0.3 * least(stop_ratio * 5, 1.0)
         + 0.3 * (1 - least(punct_ratio * 10, 1.0)) AS q_score
  FROM f
),
kept AS (
  SELECT * FROM scored WHERE q_score >= 0.5 AND n_tokens >= 20
),
keepers AS (
  SELECT min(doc_id) AS keep_id
  FROM kept
  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
)
SELECT doc_id, lang, n_tokens, round(q_score, 6) AS q_score
FROM kept JOIN keepers ON doc_id = keep_id
""",
)
def q_corpus_clean(spark, sf_dir):
    """The composed corpus-cleaning pipeline a training-data run executes:
    quality scoring (pure projection, pipelined with the scan) → threshold
    filters → exact-dedup survivor semi-join (32-byte digests shuffle, not
    documents). One job, no intermediate materialization."""
    from scikit_learn_imputer_spark.dedup.exact import exact_dedup

    d = _t(spark, sf_dir, "documents")
    scored = quality_features(d)
    kept = scored.filter(_quality_pass_cond())
    deduped = exact_dedup(kept)
    return deduped.select(
        "doc_id",
        "lang",
        F.col("q_tokens").alias("n_tokens"),
        F.round("q_score", 6).alias("q_score"),
    )


@register(
    "math_funcs",
    oracle="""
SELECT c_custkey,
       round(abs(c_acctbal), 6) AS abs_bal,
       round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
       round(ln(abs(c_acctbal) + 1), 6) AS ln_bal,
       round(log10(abs(c_acctbal) + 1), 6) AS log10_bal,
       round(pow(c_acctbal / 1000, 2), 6) AS pow_bal,
       CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
       floor(c_acctbal) AS floor_bal,
       ceil(c_acctbal) AS ceil_bal,
       round(c_acctbal % 97, 6) AS mod_bal
FROM customer
""",
)
def q_math_funcs(spark, sf_dir):
    """Math scalar suite (§2.10 gap): abs/sqrt/ln/log10/pow/sign/floor/
    ceil/fmod — all codegen built-ins; floats rounded identically on both
    sides."""
    c = _t(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.abs(b), 6).alias("abs_bal"),
        F.round(F.sqrt(F.abs(b)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(b) + 1), 6).alias("ln_bal"),
        F.round(F.log10(F.abs(b) + 1), 6).alias("log10_bal"),
        F.round(F.pow(b / 1000, 2), 6).alias("pow_bal"),
        F.signum(b).alias("sign_bal"),
        F.floor(b).alias("floor_bal"),
        F.ceil(b).alias("ceil_bal"),
        F.round(b % 97, 6).alias("mod_bal"),
    )


@register(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2) AS running_spend
FROM orders
""",
)
def q_customer_running_spend(spark, sf_dir):
    """Per-key running total: the window is PARTITIONED by customer —
    parallel across keys, a running (never re-scanning) frame within each,
    deterministic tie-break on the order key."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "party_directory_union",
    oracle="""
SELECT party_type, count(*) AS n, count(DISTINCT nationkey) AS n_nations
FROM (
  SELECT 'customer' AS party_type, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier', s_nationkey FROM supplier
)
GROUP BY party_type
""",
)
def q_party_directory_union(spark, sf_dir):
    """Schema-aligned UNION ALL across entity tables with a type tag —
    unionByName keeps it order-safe; a narrow two-column scan per side."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party_type"),
        F.col("c_nationkey").alias("nationkey"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party_type"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return (
        c.unionByName(s)
        .groupBy("party_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("nationkey").alias("n_nations"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue view + max-revenue supplier(s).
    The scalar max is a one-row aggregate of the ALREADY-aggregated view,
    joined back as a broadcast — the view computes once per branch but
    both branches read the same small per-supplier aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
WITH multi AS (
  SELECT l_orderkey AS ok
  FROM lineitem GROUP BY l_orderkey
  HAVING count(DISTINCT l_suppkey) >= 2
),
returns AS (
  SELECT DISTINCT l_orderkey AS rok, l_suppkey AS rsk
  FROM lineitem WHERE l_returnflag = 'R'
),
sole AS (
  SELECT rok, min(rsk) AS suppkey
  FROM returns GROUP BY rok
  HAVING count(*) = 1
)
SELECT s_name, count(*) AS numwait
FROM sole
JOIN multi ON rok = ok
JOIN supplier ON suppkey = s_suppkey
GROUP BY s_name
""",
)
def q_q21_sole_returning_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted to this schema): in multi-supplier orders,
    suppliers who were the ONLY one with returned lines. The exists /
    not-exists self-joins decorrelate into two aggregates over lineitem
    (distinct-supplier count; sole-returner per order) joined on the
    order key — no correlated per-row probes."""
    li = _t(spark, sf_dir, "lineitem")
    multi = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .drop("ns")
    )
    returns = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rok"), F.col("l_suppkey").alias("rsk"))
        .distinct()
    )
    sole = (
        returns.groupBy("rok")
        .agg(F.min("rsk").alias("suppkey"), F.count("*").alias("nr"))
        .filter(F.col("nr") == 1)
        .drop("nr")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sole.join(multi, sole.rok == multi.ok)
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "stats_by_returnflag",
    oracle="""
WITH means AS (
  SELECT l_returnflag AS rf, avg(l_extendedprice) AS mp
  FROM lineitem GROUP BY 1
),
moments AS (
  SELECT l_returnflag,
         avg(pow(l_extendedprice - mp, 2)) AS m2,
         avg(pow(l_extendedprice - mp, 3)) AS m3,
         avg(pow(l_extendedprice - mp, 4)) AS m4
  FROM lineitem JOIN means ON l_returnflag = rf
  GROUP BY l_returnflag
),
aggs AS (
  SELECT l_returnflag,
         round(stddev_samp(l_extendedprice), 4) AS sd_price,
         round(var_samp(l_quantity), 4) AS var_qty,
         round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
         round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq,
         round(median(l_extendedprice), 1) AS median_price,
         bool_and(l_quantity > 0) AS all_positive,
         bool_or(l_discount > 0.09) AS any_big_discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT a.l_returnflag, sd_price, var_qty, corr_pq, covar_pq, median_price,
       -- Spark's skewness/kurtosis are POPULATION estimators (g1, g2);
       -- DuckDB's built-ins are sample-adjusted, so compute from moments.
       round(m.m3 / pow(m.m2, 1.5), 6) AS skew_price,
       round(m.m4 / pow(m.m2, 2) - 3, 6) AS kurt_price,
       all_positive, any_big_discount
FROM aggs a JOIN moments m ON a.l_returnflag = m.l_returnflag
""",
)
def q_stats_by_returnflag(spark, sf_dir):
    """Statistical-aggregate suite (§2.4 extension): stddev/variance/
    correlation/covariance/median/skewness/kurtosis/bool aggregates — all
    single-pass algebraic (or sketch-backed) built-ins with map-side
    partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(p), 4).alias("sd_price"),
        F.round(F.var_samp(q), 4).alias("var_qty"),
        F.round(F.corr(p, q), 6).alias("corr_pq"),
        F.round(F.covar_samp(p, q), 2).alias("covar_pq"),
        F.round(F.median(p), 1).alias("median_price"),
        F.round(F.skewness(p), 6).alias("skew_price"),
        F.round(F.kurtosis(p), 6).alias("kurt_price"),
        F.bool_and(q > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
    )


@register(
    "window_funcs_suite",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
       round(lead(o_totalprice) OVER w2, 2) AS next_price,
       CAST(ntile(4) OVER w2 AS INT) AS spend_quartile,
       round(percent_rank() OVER w2, 6) AS pct_rank,
       CAST(dense_rank() OVER w2 AS BIGINT) AS drank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_funcs_suite(spark, sf_dir):
    """Window-function suite (§2.5 extension): first/nth value over a
    running frame, lead, ntile, percent_rank, dense_rank — ALL windows
    partitioned by the customer key (parallel across keys, never a global
    sort), deterministic tie-breaks."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        F.round(F.lead("o_totalprice").over(w2), 2).alias("next_price"),
        F.ntile(4).over(w2).alias("spend_quartile"),
        F.round(F.percent_rank().over(w2), 6).alias("pct_rank"),
        F.dense_rank().over(w2).cast("bigint").alias("drank"),
    )


# ---- rows-only checked (non-SQL-expressible or intentionally unoracled) ----

@register("minhash_candidates", anchor="tests/test_dedup_similarity.py::test_minhash_candidates_include_dups")
def q_minhash_candidates(spark, sf_dir):
    """MinHash-LSH near-dup candidates — the 100TB-scale dedup path.
    Deterministic (md5-derived hashes) but banding logic is beyond the
    oracle's SQL; driver records the rows-only check."""
    return minhash_candidate_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=16, bands=4, shingle=5
    )


@register("simhash_signatures", anchor="tests/test_dedup_similarity.py::test_simhash_near_pairs")
def q_simhash_signatures(spark, sf_dir):
    """60-bit SimHash signature per document (rows-only check)."""
    return simhash_signatures(_t(spark, sf_dir, "documents"))


@register("spark_imputer_e2e", anchor="tests/test_imputer.py::test_fit_transform_no_nulls_invariant")
def q_spark_imputer_e2e(spark, sf_dir):
    """End-to-end ML imputation (C5 fit + impute) on the null-injected
    customer table: mixed categorical/continuous targets, MLlib models.
    Model predictions are not SQL-expressible → rows-only check; the test
    suite enforces the reference's no-nulls-in-output invariant instead."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.regression import LinearRegression

    from scikit_learn_imputer_spark.imputer import SparkImputer

    df = with_nulls(_t(spark, sf_dir, "customer"), "customer").select(
        F.col("c_custkey").alias("id"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    imp = SparkImputer(
        df,
        categorical=["c_mktsegment"],
        save_models_to=_scratch("spark_models_e2e"),
        class_threshold=30,
        id_col="id",
    )
    result = imp.fit(
        classification=LogisticRegression(maxIter=20),
        regression=LinearRegression(maxIter=20),
        transform=True,
    )
    return result["imputed_data"]


@register(
    "imputer_output_audit",
    oracle=f"""
WITH customer_nulls AS ({nulls_cte('customer')})
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS null_cells,
       round(sum(coalesce(c_acctbal, 0)), 2) AS observed_acctbal_sum,
       CAST(count(c_mktsegment) AS BIGINT) AS preserved_mktsegment_rows
FROM customer_nulls
""",
)
def q_imputer_output_audit(spark, sf_dir):
    """Oracled audit of the (rows-only) spark_imputer_e2e output — the
    SQL-expressible invariants of ML imputation (VERDICT r4 #5): the
    oracle computes, from the INPUT alone, what a correct imputation must
    produce — same row count, ZERO nulls left in target columns, observed
    (non-injected) c_acctbal values untouched (their sum), and every
    observed c_mktsegment label preserved. The Spark side measures the
    ACTUAL e2e output, so a row-count change, a leftover null, or an
    overwritten observed cell each flips this driver row red."""
    out = q_spark_imputer_e2e(spark, sf_dir)
    inp = with_nulls(_t(spark, sf_dir, "customer"), "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("in_acctbal"),
        F.col("c_mktsegment").alias("in_mktsegment"),
    )
    joined = out.join(inp, on="id")
    null_cell = (
        F.col("c_acctbal").isNull().cast("long")
        + F.col("c_mktsegment").isNull().cast("long")
        + F.col("c_nationkey").isNull().cast("long")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(null_cell).cast("long").alias("null_cells"),
        F.round(
            F.sum(
                F.when(
                    F.col("in_acctbal").isNotNull(), F.col("c_acctbal")
                ).otherwise(0.0)
            ),
            2,
        ).alias("observed_acctbal_sum"),
        F.sum(
            (
                F.col("in_mktsegment").isNotNull()
                & (F.col("c_mktsegment") == F.col("in_mktsegment"))
            ).cast("long")
        ).alias("preserved_mktsegment_rows"),
    )


# =====================================================================
# Round-2 TPC shapes: Q8 / Q11 / Q12 (adapted to the available schema —
# no partsupp / l_shipmode columns in the driver testdata)
# =====================================================================

@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) v
GROUP BY o_year
ORDER BY o_year
""",
)
def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's yearly trade
    volume — conditional-sum ratio over a 6-way star join. All dims
    (nation×2, region, part-filtered, supplier) broadcast; the only
    shuffles are the two fact-fact joins and the final tiny groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey"))
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0)
    ) / F.sum(volume)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q11_important_parts",
    oracle="""
WITH val AS (
  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, round(value, 2) AS value
FROM val
WHERE value > (SELECT avg(value) * 1.5 FROM val)
ORDER BY value DESC, l_partkey
""",
)
def q_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (partsupp adapted to lineitem value): per-part
    traded value, kept only above a multiple of the MEAN part value — the
    scalar-subquery threshold stays IN-PLAN as a one-row broadcast, and
    Catalyst reuses the per-part aggregate exchange for both the detail
    rows and the threshold. (A mean-relative threshold is scale-invariant,
    unlike Q11's fixed fraction, so the query is non-empty at every SF.)"""
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    threshold = val.agg((F.avg("value") * 1.5).alias("__thresh"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thresh"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipmode adapted to returnflag): conditional
    priority counts over LATE shipments — date arithmetic across the two
    fact tables (ship > order + 60 days). The shipdate range predicate is
    pushed to the lineitem scan; the cross-table date comparison runs
    post-join in codegen."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# =====================================================================
# Round-2 source formats (S1 CSV with a driver row; ORC) and composite
# scalar types (struct / map / array build-extract semantics)
# =====================================================================

@register(
    "source_doc_sample",
    oracle="""
WITH r AS (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5('inspect:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS pick
  FROM documents
)
SELECT source, pick, doc_id, n_chars FROM r WHERE pick <= 3
""",
)
def q_source_doc_sample(spark, sf_dir):
    """Deterministic inspection sample: 3 docs per source, picked by a
    salted md5 order so the 'random' eyeball set is stable across runs
    and engines — the manual-review staple (every dataset audit starts
    with 'show me a few docs from each source', and a rand()-based
    sample can never be reproduced in a ticket). Partitioned window
    (per-source, never global), O(#sources × 3) output."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("inspect:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("pick"),
        )
        .filter(F.col("pick") <= 3)
        .select("source", "pick", "doc_id", "n_chars")
    )


@register(
    "corpus_dataset_card",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 >= 2)
  ) WHERE g IN (
    SELECT DISTINCT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4]))
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
)
SELECT metric, round(value, 6) AS value FROM (
  SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM t
  UNION ALL
  SELECT 'total_tokens', CAST(sum(n_tokens) AS DOUBLE) FROM t
  UNION ALL
  SELECT 'mean_doc_tokens', CAST(sum(n_tokens) AS DOUBLE) / count(*) FROM t
  UNION ALL
  SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM documents
  UNION ALL
  SELECT 'pct_en', CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) FROM t
  UNION ALL
  SELECT 'exact_dup_rate',
         1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*) FROM t
  UNION ALL
  SELECT 'contamination_rate',
         CAST((SELECT count(*) FROM contam) AS DOUBLE)
           / (SELECT count(*) FROM t WHERE doc_id % 100 >= 2)
)
""",
)
def q_corpus_dataset_card(spark, sf_dir):
    """The dataset card in one query: corpus headline numbers (docs,
    token mass, mean length, sources, %en, exact-dup rate, benchmark
    contamination rate) as a (metric, value) table — what goes at the
    top of a dataset release note, assembled from the same oracled
    computations the dedicated queries report in detail. Every metric
    is a scalar aggregate (digests/gram digests only — text never
    shuffles); the union is O(#metrics) rows."""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    base = d.select(
        "doc_id",
        "lang",
        "source",
        ntok.alias("__n"),
        fingerprint_col(F.col("text")).alias("__fp"),
    )
    bench_g = (
        d.filter(F.col("doc_id") % 100 < 2)
        .select(F.explode(word_ngrams_col(F.col("text"), 5)).alias("g"))
        .select(F.md5("g").alias("gd"))
        .distinct()
    )
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    n_contam = (
        corpus.select(
            "doc_id", F.explode(word_ngrams_col(F.col("text"), 5)).alias("g")
        )
        .select("doc_id", F.md5("g").alias("gd"))
        .join(bench_g, "gd", "left_semi")
        .select("doc_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(F.lit("__contam").alias("k"), "v")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).cast("double").alias("v")).select(
        F.lit("__ncorpus").alias("k"), "v"
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("__n").cast("double").alias("total_tokens"),
        (F.sum("__n").cast("double") / F.count(F.lit(1))).alias(
            "mean_doc_tokens"
        ),
        F.countDistinct("source").cast("double").alias("n_sources"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("pct_en"),
        (
            1.0
            - F.countDistinct("__fp").cast("double") / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
    )
    melted = stats.selectExpr(
        "stack(6, 'n_docs', n_docs, 'total_tokens', total_tokens, "
        "'mean_doc_tokens', mean_doc_tokens, 'n_sources', n_sources, "
        "'pct_en', pct_en, 'exact_dup_rate', exact_dup_rate) "
        "AS (metric, value)"
    )
    contam_rate = (
        n_contam.unionByName(n_corpus)
        .groupBy()
        .pivot("k", ["__contam", "__ncorpus"])
        .sum("v")
        .select(
            F.lit("contamination_rate").alias("metric"),
            (F.col("__contam") / F.col("__ncorpus")).alias("value"),
        )
    )
    return melted.unionByName(contam_rate).select(
        "metric", F.round("value", 6).alias("value")
    )


@register(
    "dataset_card_diff",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n
  FROM documents
),
a AS (SELECT * FROM t WHERE doc_id % 7 <> 0),
b AS (SELECT * FROM t
      WHERE substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'),
pa AS (
  SELECT doc_id, source,
         CAST(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM a
),
pb AS (
  SELECT doc_id, source,
         CAST(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM b
),
common AS (
  SELECT pa.source, pa.doc_id, pa.cum AS ca, pb.cum AS cb
  FROM pa JOIN pb USING (doc_id)
),
added AS (
  SELECT source, CAST(count(*) AS BIGINT) AS dn, CAST(sum(n) AS BIGINT) AS tn
  FROM b WHERE doc_id NOT IN (SELECT doc_id FROM a) GROUP BY source
),
removed AS (
  SELECT source, CAST(count(*) AS BIGINT) AS dn, CAST(sum(n) AS BIGINT) AS tn
  FROM a WHERE doc_id NOT IN (SELECT doc_id FROM b) GROUP BY source
),
rep AS (
  SELECT source,
         CAST(count(*) FILTER (WHERE ca <> cb) AS BIGINT) AS rn,
         CAST(count(*) FILTER (WHERE ca = cb) AS BIGINT) AS sn
  FROM common GROUP BY source
),
srcs AS (SELECT DISTINCT source FROM t)
SELECT s.source,
       CAST(coalesce(added.dn, 0) AS BIGINT) AS docs_added,
       CAST(coalesce(added.tn, 0) AS BIGINT) AS tokens_added,
       CAST(coalesce(removed.dn, 0) AS BIGINT) AS docs_removed,
       CAST(coalesce(removed.tn, 0) AS BIGINT) AS tokens_removed,
       CAST(coalesce(rep.rn, 0) AS BIGINT) AS docs_repacked,
       CAST(coalesce(rep.sn, 0) AS BIGINT) AS docs_stable
FROM srcs s
LEFT JOIN added USING (source)
LEFT JOIN removed USING (source)
LEFT JOIN rep USING (source)
""",
)
def q_dataset_card_diff(spark, sf_dir):
    """Corpus snapshot diff (VERDICT r7 stretch #8): the ops report for
    a corpus that MUTATES over time — snapshot A (pre-ingest: doc_id %
    7 != 0) vs snapshot B (post-ingest-and-takedown: all docs minus the
    md5 takedown set). Per source: docs/tokens added and removed, and —
    closing the loop on the deletion-propagation work — how many
    surviving docs were RE-PACKED (their concat-and-cut stream position
    moved between the two packings, i.e. the write amplification a
    takedown actually causes) vs stable (untouched shards passing
    through). Scale shape: membership diffs are anti joins on
    id-only frames; the two packings are the standard per-shard
    running-total windows; nothing shuffles text."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    d = _t(spark, sf_dir, "documents")
    t0 = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t0) == 0, F.lit(0))
        .otherwise(F.size(F.split(t0, "\\s+")))
        .cast("bigint")
    )
    base = d.select("doc_id", "source", ntok.alias("__n"))
    takedown = (
        F.md5(F.concat(F.lit("takedown:"), F.col("doc_id").cast("string")))
        .substr(1, 1)
        == "0"
    )
    a = d.filter(F.col("doc_id") % 7 != 0)
    b = d.filter(~takedown)

    cum = lambda p: (  # noqa: E731
        p["seq_id"] * 512 + p["seq_offset"]
    ).cast("bigint")
    pa = pack_sequences(a, seq_len=512)
    pb = pack_sequences(b, seq_len=512)
    common = (
        pa.select("doc_id", "source", cum(pa).alias("__ca"))
        .join(pb.select("doc_id", cum(pb).alias("__cb")), "doc_id")
    )
    rep = common.groupBy("source").agg(
        F.count_if(F.col("__ca") != F.col("__cb")).alias("docs_repacked"),
        F.count_if(F.col("__ca") == F.col("__cb")).alias("docs_stable"),
    )
    a_ids = a.select("doc_id")
    b_ids = b.select("doc_id")
    added = (
        base.join(b_ids, "doc_id", "left_semi")
        .join(a_ids, "doc_id", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_added"),
            F.sum("__n").cast("bigint").alias("tokens_added"),
        )
    )
    removed = (
        base.join(a_ids, "doc_id", "left_semi")
        .join(b_ids, "doc_id", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_removed"),
            F.sum("__n").cast("bigint").alias("tokens_removed"),
        )
    )
    srcs = d.select("source").distinct()
    z = F.lit(0).cast("bigint")
    return (
        srcs.join(added, "source", "left")
        .join(removed, "source", "left")
        .join(rep, "source", "left")
        .select(
            "source",
            F.coalesce("docs_added", z).alias("docs_added"),
            F.coalesce("tokens_added", z).alias("tokens_added"),
            F.coalesce("docs_removed", z).alias("docs_removed"),
            F.coalesce("tokens_removed", z).alias("tokens_removed"),
            F.coalesce("docs_repacked", z).alias("docs_repacked"),
            F.coalesce("docs_stable", z).alias("docs_stable"),
        )
    )


@register(
    "jsonl_roundtrip",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts
FROM documents GROUP BY source
""",
)
def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL round-trip for the documents corpus — JSON-lines is the
    dominant LLM-corpus interchange format, so the sink→scan loop must
    preserve content exactly: write with write_jsonl, read back with an
    EXPLICIT schema (inference reads the data twice and infers a key
    union — both wrong at scale), and aggregate per source; the oracle
    is the same aggregate over the parquet original, so any text
    mangling (escaping, unicode, null handling) breaks the digest
    column. Splittable output — unlike the CSV report sink, no
    coalesce: corpus-sized JSONL stays parallel."""
    import os

    from scikit_learn_imputer_spark.sources.tables import read_jsonl, write_jsonl

    docs = _t(spark, sf_dir, "documents")
    path = _scratch("jsonl_roundtrip")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema=docs.schema)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(F.md5("text")).alias("distinct_texts"),
    )


@register(
    "csv_roundtrip",
    oracle="""
SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def q_csv_roundtrip(spark, sf_dir):
    """S1/S2 driver-visible: the nation dim round-trips through the CSV
    sink + scan (explicit schema — no inference job) and must aggregate
    identically to the parquet original. The write is O(dim) — CSV is a
    report/ingest format here, never the fact-table format."""
    import os

    from scikit_learn_imputer_spark.sources.tables import read_csv, write_csv_report

    nation = _t(spark, sf_dir, "nation")
    path = _scratch("csv_roundtrip")
    write_csv_report(nation, path)
    back = read_csv(spark, path, schema=nation.schema)
    region = _t(spark, sf_dir, "region")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("r_name")
    )


@register(
    "orc_roundtrip",
    oracle="""
SELECT n_name, round(sum(s_acctbal), 2) AS total_bal,
       CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def q_orc_roundtrip(spark, sf_dir):
    """ORC source/sink: supplier round-trips through ORC (columnar,
    predicate-pushdown-capable like parquet) and aggregates identically.
    Demonstrates the engine is format-agnostic at the scan layer — the
    same plans run over either columnar source."""
    import os

    supplier = _t(spark, sf_dir, "supplier")
    path = _scratch("orc_roundtrip")
    supplier.write.mode("overwrite").orc(path)
    back = spark.read.schema(supplier.schema).orc(path)
    nation = _t(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nation), back.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


@register(
    "struct_map_funcs",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS s_price,
       o_orderstatus AS s_status,
       o_orderpriority AS m_priority,
       CAST(2 AS BIGINT) AS m_size,
       round(o_totalprice * 3, 2) AS a_sum,
       round(o_totalprice * 2, 2) AS a_second
FROM orders
""",
)
def q_struct_map_funcs(spark, sf_dir):
    """Composite scalar types: build struct / map / array columns, then
    extract scalars back out (getField, element_at by key and index,
    map_keys, higher-order aggregate). The oracle computes the same
    scalars directly — the check is that Spark's build→extract cycle is
    lossless. Scalars-only output: cross-engine map/struct VALUE shapes
    differ (DuckDB returns maps as key/value arrays), so composite values
    never appear in the result."""
    df = _t(spark, sf_dir, "orders")
    built = df.select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("__s"),
        F.create_map(
            F.lit("priority"), F.col("o_orderpriority"),
            F.lit("status"), F.col("o_orderstatus"),
        ).alias("__m"),
        F.array(
            F.col("o_totalprice"), F.col("o_totalprice") * 2
        ).alias("__a"),
    )
    return built.select(
        "o_orderkey",
        F.round(F.col("__s").getField("price"), 2).alias("s_price"),
        F.col("__s").getField("status").alias("s_status"),
        F.element_at(F.col("__m"), F.lit("priority")).alias("m_priority"),
        F.size(F.map_keys(F.col("__m"))).cast("bigint").alias("m_size"),
        F.round(
            F.aggregate("__a", F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("a_sum"),
        F.round(F.element_at(F.col("__a"), 2), 2).alias("a_second"),
    )


@register(
    "approx_sketch_check",
    oracle="""
SELECT c_mktsegment,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_nd,
       CAST(count(*) AS BIGINT) AS n_rows,
       TRUE AS hll_within_10pct,
       TRUE AS median_in_q45_q55
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_approx_sketch_check(spark, sf_dir):
    """Sketch aggregates (the 100 TB path for distinct counts and
    quantiles): HyperLogLog++ (``approx_count_distinct``, rsd 2%) and the
    quantile sketch (``percentile_approx``) computed NEXT TO their exact
    twins in one aggregate pass, with the approximation error asserted
    in-plan (HLL within 10% — 5 sigma at rsd 0.02; the sketch median must
    land inside the exact 45th–55th percentile band — a RANK-error bound,
    which is what the GK sketch actually guarantees, robust at any group
    size where a value-distance bound is not). Both sketches are
    deterministic for fixed input, so the booleans are oracle-stable; the
    exact values anchor the hash compare. At scale you drop the exact
    twins and keep the sketches."""
    c = _t(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("exact_nd"),
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("c_custkey", rsd=0.02).alias("__hll"),
        F.percentile_approx("c_acctbal", 0.5, 10000).alias("__ap50"),
        F.percentile("c_acctbal", F.lit(0.45)).alias("__ex45"),
        F.percentile("c_acctbal", F.lit(0.55)).alias("__ex55"),
    )
    return agg.select(
        "c_mktsegment",
        "exact_nd",
        "n_rows",
        (
            F.abs(F.col("__hll") - F.col("exact_nd"))
            <= 0.1 * F.col("exact_nd")
        ).alias("hll_within_10pct"),
        (
            (F.col("__ap50") >= F.col("__ex45"))
            & (F.col("__ap50") <= F.col("__ex55"))
        ).alias("median_in_q45_q55"),
    ).orderBy("c_mktsegment")


_NGRAM_PAIRS_SQL = ORACLE["ngram_jaccard_pairs"]

@register(
    "near_dup_clusters",
    oracle=f"""
WITH RECURSIVE
pairs AS ({_NGRAM_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach
GROUP BY id
ORDER BY doc_id
""",
)
def q_near_dup_clusters(spark, sf_dir):
    """Transitive near-dup clusters (dedup/cluster.py): connected
    components over the exact ngram-Jaccard candidate pairs via
    hash-to-min label propagation — each doc gets the min doc_id of its
    component as a canonical cluster id. The DuckDB oracle computes the
    same closure with a recursive CTE."""
    from scikit_learn_imputer_spark.dedup.cluster import connected_components

    edges = QUERIES["ngram_jaccard_pairs"](spark, sf_dir).select("id_a", "id_b")
    labels = connected_components(edges, src="id_a", dst="id_b")
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    ).orderBy("doc_id")


@register(
    "purchase_error_join",
    oracle="""
SELECT p.user_id, p.ts AS p_ts, e.ts AS e_ts,
       round(p.value, 6) AS purchase_value
FROM events p
JOIN events e
  ON p.user_id = e.user_id
WHERE p.event_type = 'purchase' AND e.event_type = 'error'
  AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 60 MINUTE
""",
)
def q_purchase_error_join(spark, sf_dir):
    """Batch twin of the watermarked STREAM-STREAM join
    (streaming/events.py:purchase_error_pairs): errors paired with the
    same user's purchases in the preceding hour. The streaming form holds
    only watermark+window state per side; the batch form is this exact
    plan (equi join on user + time-range residual) and is the oracle the
    stream==batch test checks against."""
    from scikit_learn_imputer_spark.streaming.events import purchase_error_pairs

    ev = _t(spark, sf_dir, "events")
    out = purchase_error_pairs(ev, window_minutes=60)
    return out.select(
        "user_id", "p_ts", "e_ts",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "doc_chunks_udtf",
    oracle="""
WITH parts AS (
  SELECT doc_id, string_split(text, ' ') AS p FROM documents
),
idx AS (
  SELECT doc_id, p,
         unnest(generate_series(1, CAST(ceil(len(p) / 8.0) AS BIGINT))) AS i
  FROM parts
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS chunk_id,
       CAST(len(list_slice(p, (i - 1) * 8 + 1, least(i * 8, len(p)))) AS INT)
         AS n_tokens,
       array_to_string(list_slice(p, (i - 1) * 8 + 1, least(i * 8, len(p))), ' ')
         AS chunk
FROM idx
""",
)
def q_doc_chunks_udtf(spark, sf_dir):
    """Python UDTF (Spark 4 table function API): fixed-size token
    chunking — the context-window chunking step of an LLM training-data
    pipeline — as a LATERAL table function over documents. One input row
    fans out to ceil(tokens/8) chunk rows with per-chunk token counts.

    The UDTF runs Arrow-batched Python; for pure-splitting workloads the
    JVM posexplode path (`doc_tokens_positional`) is faster — the UDTF is
    the right tool when the per-row expansion logic needs real Python
    (tokenizers, samplers), and this entry pins the API's semantics to a
    SQL oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: int, n_tokens: int, chunk: string")
    class ChunkTokens:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            k = 8
            for i in range(0, len(toks), k):
                c = toks[i : i + k]
                yield i // k, len(c), " ".join(c)

    spark.udtf.register("sli_chunk_tokens", ChunkTokens)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__sli_docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, t.chunk_id, t.n_tokens, t.chunk
        FROM __sli_docs_udtf, LATERAL sli_chunk_tokens(text) t
        """
    )


@register(
    "bigram_counts",
    oracle="""
WITH parts AS (
  SELECT doc_id, string_split(text, ' ') AS p FROM documents
),
idx AS (
  SELECT doc_id, p, unnest(generate_series(1, len(p) - 1)) AS i FROM parts
)
SELECT p[i] || ' ' || p[i + 1] AS bigram, count(*) AS n
FROM idx
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def q_bigram_counts(spark, sf_dir):
    """Corpus bigram counts (n-gram language-model statistics): positional
    tokenization (posexplode — JVM-side), adjacent pairing via lead() over
    per-doc windows (partitioned by doc — parallel, no global sort), then
    a count aggregate with a deterministic total order for the top-k cut.
    At scale the LIMIT becomes TakeOrderedAndProject — no full sort."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("nxt", F.lead("term").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    return (
        pairs.groupBy(
            F.concat_ws(" ", F.col("term"), F.col("nxt")).alias("bigram")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


@register(
    "set_ops_suite",
    oracle="""
WITH big AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000
),
y98 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
)
SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM y98)
UNION ALL
SELECT 'only_big', o_custkey FROM (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM y98)
UNION ALL
SELECT 'only_98', o_custkey FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM big)
ORDER BY segment, o_custkey
""",
)
def q_set_ops_suite(spark, sf_dir):
    """ANSI set operations (§2.10): INTERSECT and EXCEPT between two
    customer segments, tagged and unioned. Spark lowers both to
    aggregates/joins on the hashed key — no sort, distinct pushed into
    each branch."""
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 200000).select("o_custkey").distinct()
    y98 = o.filter(F.year("o_orderdate") == 1998).select("o_custkey").distinct()
    tag = lambda df, t: df.select(F.lit(t).alias("segment"), "o_custkey")
    return (
        tag(big.intersect(y98), "both")
        .unionAll(tag(big.exceptAll(y98), "only_big"))
        .unionAll(tag(y98.exceptAll(big), "only_98"))
        .orderBy("segment", "o_custkey")
    )


@register(
    "decontaminate_corpus",
    oracle="""
WITH bench AS (
  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id % 20 = 0
)
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) NOT IN
      (SELECT fp FROM bench)
ORDER BY doc_id
""",
)
def q_decontaminate_corpus(spark, sf_dir):
    """Decontamination (dedup/exact.py:decontaminate): remove corpus docs
    whose normalized content appears in a benchmark set (here: the
    doc_id%20==0 slice stands in for an eval set). Digest-anti-join with
    the tiny benchmark side broadcast — the corpus side never shuffles."""
    from scikit_learn_imputer_spark.dedup.exact import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    clean = decontaminate(docs, bench)
    return clean.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    ).orderBy("doc_id")


@register(
    "decontaminate_bloom_corpus",
    oracle="""
WITH bench AS (
  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id % 17 = 3
)
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) NOT IN
      (SELECT fp FROM bench)
ORDER BY doc_id
""",
)
def q_decontaminate_bloom_corpus(spark, sf_dir):
    """Bloom-prefiltered decontamination (dedup/bloom.py): the m-bit
    bitmap (m/8 bytes regardless of benchmark size) is built distributed
    and broadcast as a 1-row frame; the corpus probe is map-only, and
    only Bloom-positive candidates reach the exact confirming anti join.
    No false negatives, so the output EQUALS the exact path's — same
    oracle form as decontaminate_corpus, different eval slice."""
    from scikit_learn_imputer_spark.dedup.bloom import decontaminate_bloom

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    clean = decontaminate_bloom(docs, bench)
    return clean.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    ).orderBy("doc_id")


@register(
    "remove_boilerplate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), grams AS (
  SELECT doc_id, CAST(s.i AS INT) AS start,
         array_to_string(tk[s.i + 1 : s.i + 3], ' ') AS g
  FROM toks, LATERAL unnest(generate_series(0, len(tk) - 3, 1)) AS s(i)
  WHERE len(tk) >= 3
), bad AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 5
), cov AS (
  SELECT DISTINCT grams.doc_id, grams.start FROM grams JOIN bad USING (g)
), tokpos AS (
  SELECT doc_id, CAST(p.i AS INT) AS i, tk[p.i + 1] AS tok
  FROM toks, LATERAL unnest(generate_series(0, len(tk) - 1, 1)) AS p(i)
  WHERE len(tk) > 0
), kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM tokpos t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c
    WHERE c.doc_id = t.doc_id AND c.start <= t.i AND t.i < c.start + 3
  )
)
SELECT toks.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens_before,
       CAST(coalesce(k.cnt, 0) AS BIGINT) AS n_tokens_after,
       coalesce(k.txt, '') AS scrubbed_text
FROM toks
LEFT JOIN (
  SELECT doc_id, count(*) AS cnt, string_agg(tok, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
)
def q_remove_boilerplate(spark, sf_dir):
    """Cross-document boilerplate span removal (dedup/spans.py): word
    3-grams appearing in >= 5 distinct documents are deleted from every
    document, keeping the surrounding text — the RefinedWeb/C4-style
    span-level cleaning stage. Two digest-keyed shuffles; text never
    shuffles; the per-doc covered-start state is O(doc length)."""
    from scikit_learn_imputer_spark.dedup.spans import remove_boilerplate_spans

    return remove_boilerplate_spans(
        _t(spark, sf_dir, "documents"), n=3, min_df=5
    )


@register(
    "remove_exact_substrings",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), grams AS (
  SELECT doc_id, CAST(s.i AS INT) AS start,
         array_to_string(tk[s.i + 1 : s.i + 8], ' ') AS g
  FROM toks, LATERAL unnest(generate_series(0, len(tk) - 8, 1)) AS s(i)
  WHERE len(tk) >= 8
), bad AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT grams.doc_id, grams.start FROM grams JOIN bad USING (g)
), tokpos AS (
  SELECT doc_id, CAST(p.i AS INT) AS i, tk[p.i + 1] AS tok
  FROM toks, LATERAL unnest(generate_series(0, len(tk) - 1, 1)) AS p(i)
  WHERE len(tk) > 0
), kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM tokpos t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c
    WHERE c.doc_id = t.doc_id AND c.start <= t.i AND t.i < c.start + 8
  )
)
SELECT toks.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens_before,
       CAST(coalesce(k.cnt, 0) AS BIGINT) AS n_tokens_after,
       coalesce(k.txt, '') AS scrubbed_text
FROM toks
LEFT JOIN (
  SELECT doc_id, count(*) AS cnt, string_agg(tok, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
)
def q_remove_exact_substrings(spark, sf_dir):
    """ExactSubstr dedup (dedup/spans.py:remove_exact_substrings; Lee et
    al. 2021): every token inside a repeated substring of >= 8 tokens
    (>= 2 total occurrences corpus-wide, within-doc repeats included) is
    deleted. Arbitrary-length repeated spans reduce exactly to the
    8-shingle covered-start union, so the distributed cost is the
    boilerplate pass's: one digest aggregate + one per-doc start
    collection; text never shuffles."""
    from scikit_learn_imputer_spark.dedup.spans import remove_exact_substrings

    return remove_exact_substrings(
        _t(spark, sf_dir, "documents"), min_len=8, min_count=2
    )


@register(
    "repeated_substring_spans",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE str_split_regex(trim(text), '\s+') END AS tk
  FROM documents
), grams AS (
  SELECT doc_id, CAST(s.i AS INT) AS start,
         array_to_string(tk[s.i + 1 : s.i + 8], ' ') AS g
  FROM toks, LATERAL unnest(generate_series(0, len(tk) - 8, 1)) AS s(i)
  WHERE len(tk) >= 8
), bad AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT grams.doc_id, grams.start FROM grams JOIN bad USING (g)
), lagged AS (
  SELECT doc_id, start,
         lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
  FROM cov
), isl AS (
  SELECT doc_id, start,
         sum(CASE WHEN prev IS NULL OR start > prev + 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM lagged
)
SELECT doc_id,
       CAST(min(start) AS BIGINT) AS span_start,
       CAST(max(start) + 8 - min(start) AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island
""",
)
def q_repeated_substring_spans(spark, sf_dir):
    """Maximal repeated-span inventory per document
    (dedup/spans.py:repeated_substring_spans) — the audit report a
    suffix-array ExactSubstr pass emits before scrubbing: flagged
    8-shingle starts coalesce (gaps-and-islands over a per-document
    window, state bounded by the doc's own length) into the maximal
    repeated spans remove_exact_substrings deletes."""
    from scikit_learn_imputer_spark.dedup.spans import repeated_substring_spans

    return repeated_substring_spans(
        _t(spark, sf_dir, "documents"), min_len=8, min_count=2
    )


@register(
    "near_dup_survivors",
    oracle=f"""
WITH RECURSIVE
pairs AS ({_NGRAM_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
clusters AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT d.doc_id
FROM documents d
LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.cluster_id = c.doc_id
ORDER BY d.doc_id
""",
)
def q_near_dup_survivors(spark, sf_dir):
    """Survivor selection after near-dup clustering: keep every singleton
    plus the canonical (min-id) member of each near-dup cluster — the
    keep-one-per-cluster corpus a dedup pipeline actually emits. Built as
    an anti join of documents against the non-canonical cluster members
    (the clusters frame is O(duplicates) — broadcastable)."""
    from scikit_learn_imputer_spark.dedup.cluster import connected_components

    docs = _t(spark, sf_dir, "documents")
    edges = QUERIES["ngram_jaccard_pairs"](spark, sf_dir).select("id_a", "id_b")
    clusters = connected_components(edges, src="id_a", dst="id_b")
    losers = clusters.filter(F.col("label") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    return (
        docs.join(F.broadcast(losers), on="doc_id", how="left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "exact_dup_groups_quality",
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         round({_QSCORE_SQL}, 6) AS q
  FROM documents
),
r AS (
  SELECT fingerprint, doc_id, q,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY q DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY fingerprint) AS dup_count
  FROM q
)
SELECT fingerprint, doc_id AS keep_id, q AS keep_q,
       CAST(dup_count AS BIGINT) AS dup_count
FROM r WHERE rn = 1
""",
)
def q_exact_dup_groups_quality(spark, sf_dir):
    """Quality-aware exact dedup (VERDICT r6 #1): the keeper per
    duplicate group is the argmax-q_score member (ties to min doc_id)
    instead of blind min-id — keeper choice decides what the model
    trains on. Same one-shuffle shape as exact_dup_groups: the argmax
    is min(struct(-q, id)), map-side combinable, no window (the oracle
    uses row_number because arg-max-per-group is plain SQL there; the
    engine plan stays a partial-aggregate)."""
    from scikit_learn_imputer_spark.dedup.exact import exact_dup_groups_quality

    return exact_dup_groups_quality(_t(spark, sf_dir, "documents"))


@register(
    "near_dup_best_survivors",
    oracle=f"""
WITH RECURSIVE
pairs AS ({_NGRAM_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
clusters AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
),
q AS (
  SELECT doc_id, round({_QSCORE_SQL}, 6) AS q FROM documents
),
ranked AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.q DESC, c.doc_id) AS rn
  FROM clusters c JOIN q ON c.doc_id = q.doc_id
)
SELECT d.doc_id
FROM documents d
LEFT JOIN ranked r ON d.doc_id = r.doc_id
WHERE r.doc_id IS NULL OR r.rn = 1
ORDER BY d.doc_id
""",
)
def q_near_dup_best_survivors(spark, sf_dir):
    """Quality-aware survivor selection after near-dup clustering
    (VERDICT r6 #1): keep every singleton plus the HIGHEST-quality
    member of each near-dup cluster (ties to min doc_id) — unlike exact
    dups, near-dup cluster members genuinely differ, so keeper choice
    changes the kept token mass (pinned by the policy-comparison test).
    The clusters frame is O(duplicates) — q_score is computed only for
    clustered docs via a broadcast join, then one map-side-combinable
    min(struct(-q, id)) per cluster; document text never shuffles."""
    from scikit_learn_imputer_spark.dedup.cluster import (
        cluster_survivors,
        connected_components,
    )

    docs = _t(spark, sf_dir, "documents")
    edges = QUERIES["ngram_jaccard_pairs"](spark, sf_dir).select("id_a", "id_b")
    clusters = connected_components(edges, src="id_a", dst="id_b")
    return (
        cluster_survivors(docs, clusters, keep="quality")
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "dedup_paragraphs",
    oracle=r"""
WITH p AS (
  SELECT doc_id, i - 1 AS pos, ps[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM documents) t,
       UNNEST(generate_series(1, len(ps))) AS u(i)
),
dg AS (
  SELECT doc_id, pos, para,
         md5(regexp_replace(lower(trim(para)), '\s+', ' ', 'g')) AS digest,
         length(trim(para)) = 0 AS is_empty
  FROM p
),
hot AS (
  SELECT digest FROM dg WHERE NOT is_empty
  GROUP BY digest HAVING count(*) >= 2
),
marked AS (
  SELECT d.doc_id, d.pos, d.para,
         (d.is_empty OR h.digest IS NULL) AS keep
  FROM dg d LEFT JOIN hot h ON d.digest = h.digest
)
SELECT doc_id,
       coalesce(string_agg(para, chr(10) ORDER BY pos) FILTER (WHERE keep),
                '') AS text,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT)
         AS n_paragraphs_removed
FROM marked
GROUP BY doc_id
""",
)
def q_dedup_paragraphs(spark, sf_dir):
    """Paragraph-level exact dedup (RefinedWeb/Falcon line dedup,
    VERDICT r6 #2): every occurrence of every paragraph whose normalized
    form appears in >= 2 paragraph slots corpus-wide is removed from
    every document (this corpus has no newlines, so each doc is one
    paragraph and the operator degenerates to scrubbing exact-dup
    full texts — the multi-paragraph semantics are pinned by the unit
    and hypothesis property tests). Text never shuffles: counting and
    removal-position resolution carry 16-byte digests + ints; the
    rebuild is an index-filtered array expression on the original row."""
    from scikit_learn_imputer_spark.dedup.paragraphs import dedup_paragraphs

    return dedup_paragraphs(_t(spark, sf_dir, "documents"), min_count=2).select(
        "doc_id", "text", "n_paragraphs_removed"
    )


@register(
    "corr_covar_by_flag",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 4) AS price_sd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_corr_covar_by_flag(spark, sf_dir):
    """Bivariate statistics (corr / covar_samp / stddev_samp) per group —
    single-pass partial-aggregable moments, ANSI on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "acctbal_histogram",
    oracle="""
SELECT CAST(CASE WHEN c_acctbal < -1000.0 THEN 0
            WHEN c_acctbal >= 10000.0 THEN 23
            ELSE floor((c_acctbal - (-1000.0)) / (10000.0 - (-1000.0)) * 22) + 1
       END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi
FROM customer
GROUP BY 1
ORDER BY bucket
""",
)
def q_acctbal_histogram(spark, sf_dir):
    """Equi-width histogram via width_bucket — the one-pass distributed
    histogram shape (bucket id is a pure projection; the aggregate is
    map-side combinable; no sort until the O(buckets) result). DuckDB has
    no width_bucket, so the oracle replicates the ANSI formula
    (floor((x-lo)/(hi-lo)*n)+1 with under/overflow buckets 0 and n+1)."""
    c = _t(spark, sf_dir, "customer")
    b = F.width_bucket(F.col("c_acctbal"), F.lit(-1000.0), F.lit(10000.0), F.lit(22))
    return (
        c.groupBy(b.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "ewma_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY 1
),
offs AS (SELECT unnest(generate_series(0, 119)) AS o),
pairs AS (
  SELECT d.day, d2.rev, pow(0.7, o) AS w
  FROM daily d
  CROSS JOIN offs
  JOIN daily d2 ON d2.day = d.day - CAST(o AS INT)
)
SELECT day, round(sum(rev * w) / sum(w), 4) AS ewma
FROM pairs GROUP BY day ORDER BY day
""",
)
def q_ewma_daily_revenue(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue — an
    order-dependent RECURSIVE statistic expressed declaratively: weights
    below double precision are truncated (0.7^119 ≈ 4e-19), so EWMA
    becomes a bounded-lag weighted sum — a 120-row offset table
    cross-joined (broadcast) onto the O(days) daily aggregate, then an
    EQUI self-join on (day - offset) and one weighted-average aggregate.
    No sequential scan, no UDF, no unpartitioned data-sized window; every
    step is partial-aggregable. Normalization uses only PRESENT days
    (pandas ewm(adjust=True) over an irregular calendar)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    offs = spark.range(120).select(F.col("id").cast("int").alias("o"))
    lagged = daily.select(F.col("day").alias("d2"), "rev")
    return (
        daily.select("day")
        .crossJoin(F.broadcast(offs))
        .withColumn("w", F.pow(F.lit(0.7), F.col("o")))
        .join(
            F.broadcast(lagged),
            F.expr("d2 = date_sub(day, o)"),
            "inner",
        )
        .groupBy("day")
        .agg(F.round(F.sum(F.col("rev") * F.col("w")) / F.sum("w"), 4).alias("ewma"))
        .orderBy("day")
    )


@register(
    "zscore_scale",
    oracle="""
SELECT c_custkey,
       round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 6)
         AS acctbal_z
FROM customer
""",
)
def q_zscore_scale(spark, sf_dir):
    """Standard scaling (operators/scale.py:zscore_scale): one aggregate
    pass + one-row broadcast + projection — the z-score twin of
    minmax_scale (sklearn StandardScaler semantics incl. zero-variance →
    0.0)."""
    from scikit_learn_imputer_spark.operators.scale import zscore_scale

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = zscore_scale(c, ["c_acctbal"])
    return out.select(
        "c_custkey", F.round(F.col("c_acctbal"), 6).alias("acctbal_z")
    )


@register(
    "fuzzy_name_pairs",
    oracle="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
FROM nation a JOIN nation b ON a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= 2
ORDER BY name_a, name_b
""",
)
def q_fuzzy_name_pairs(spark, sf_dir):
    """Edit-distance fuzzy matching over a DIM table: all name pairs
    within levenshtein distance 2. The self-join is bounded to the
    broadcast-sized dimension (25 rows); at corpus scale fuzzy joins
    first block by a cheap key (length band, first-char, phonetic code, or
    the MinHash/SimHash buckets in dedup/) — this entry pins the distance
    function's semantics to the SQL oracle."""
    n = _t(spark, sf_dir, "nation").select("n_name")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("edit_dist") <= 2)
        .orderBy("name_a", "name_b")
    )


@register(
    "user_sessions_native",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN gap_us IS NULL OR gap_us >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
  FROM lagged
),
numbered AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
""",
)
def q_user_sessions_native(spark, sf_dir):
    """Spark's BUILT-IN gap sessionization (`session_window`) — the
    one-aggregate native form of the lag+running-sum plan in
    `user_sessions`. Boundary semantics: session_window starts a new
    session when the gap is >= the duration (window end exclusive), so
    the oracle flags `gap >= 30min` where the lag-based twin uses
    `> 30min`; both are pinned to their own oracles."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@register(
    "basket_part_pairs",
    oracle="""
WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM lines a
JOIN lines b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""",
)
def q_basket_part_pairs(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same
    order. The self-join is an EQUI join on orderkey (shuffle once,
    co-partitioned) with fan-out bounded by per-order line count squared
    — never all-pairs over the catalog; deterministic top-k via total
    order."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (a.l_orderkey == b.__ok) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "yoy_revenue_growth",
    oracle="""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
)
SELECT yr, round(rev, 2) AS revenue,
       round(100.0 * (rev - lag(rev) OVER (ORDER BY yr))
             / lag(rev) OVER (ORDER BY yr), 4) AS yoy_pct
FROM yearly ORDER BY yr
""",
)
def q_yoy_revenue_growth(spark, sf_dir):
    """Year-over-year growth: lag over the post-aggregation O(years)
    frame (an unpartitioned window over ≤10 rows — the documented
    tiny-frame exception, same as daily_revenue_ma7)."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").cast("bigint").alias("yr")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "yr",
        F.round("rev", 2).alias("revenue"),
        F.round(100.0 * (F.col("rev") - prev) / prev, 4).alias("yoy_pct"),
    ).orderBy("yr")


@register(
    "winsorize_acctbal",
    oracle="""
WITH q AS (
  SELECT vs[CAST(((n - 1) * 1) // 20 AS BIGINT) + 1] AS p5,
         vs[CAST(((n - 1) * 19) // 20 AS BIGINT) + 1] AS p95
  FROM (SELECT list_sort(list(c_acctbal) FILTER (c_acctbal IS NOT NULL)) AS vs,
               CAST(count(c_acctbal) AS BIGINT) AS n
        FROM customer)
)
SELECT c_custkey,
       round(least(greatest(c_acctbal, p5), p95), 4) AS acctbal_wins
FROM customer, q
""",
)
def q_winsorize_acctbal(spark, sf_dir):
    """Winsorization (clip at the 5th/95th percentile) — outlier taming
    for feature pipelines: one EXACT-RANK quantile
    (stats.py:exact_rank_quantiles — the clip bound feeds a comparison,
    so interpolated thresholds are the cross-engine ULP hazard of the
    round-12 sf1 sweep; the (value,count) reduce means no task buffers
    the corpus — VERDICT r12 #1) broadcast as a one-row frame, then a
    pure least/greatest projection. Balances are 2-decimal over a fixed
    [-999.99, 9999.99] domain → the distinct-value frame is ≤1.1M rows
    at ANY corpus size, so the single-aggregate fast path applies
    (domain_bound, runtime-guarded; VERDICT r13 #1 — one lazy job, no
    windows, no eager checkpoint)."""
    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    c = _t(spark, sf_dir, "customer")
    q = exact_rank_quantiles(
        c, "c_acctbal", [(1, 20), (19, 20)], ["p5", "p95"],
        band_width=100.0, domain_bound=1_100_000,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .select(
            "c_custkey",
            F.round(
                F.least(F.greatest(F.col("c_acctbal"), F.col("p5")), F.col("p95")), 4
            ).alias("acctbal_wins"),
        )
    )


@register(
    "conversion_funnel",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, t_view, t_click, t_purchase
FROM firsts
WHERE t_view < t_click AND t_click < t_purchase
ORDER BY user_id
""",
)
def q_conversion_funnel(spark, sf_dir):
    """Ordered-event funnel (view → click → purchase, by first
    occurrence): ONE conditional-min aggregate per user — sequence
    detection without self-joins or windows, partial-aggregable, one
    shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    return (
        ev.groupBy("user_id")
        .agg(
            first("view").alias("t_view"),
            first("click").alias("t_click"),
            first("purchase").alias("t_purchase"),
        )
        .filter(
            (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        )
        .orderBy("user_id")
    )


@register(
    "revenue_share_by_nation",
    oracle="""
WITH rev AS (
  SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, round(revenue, 2) AS revenue,
       round(100.0 * revenue / sum(revenue) OVER (), 4) AS pct_of_total
FROM rev ORDER BY n_name
""",
)
def q_revenue_share_by_nation(spark, sf_dir):
    """Percent-of-total (ratio-to-report): the share window runs over the
    POST-AGGREGATION O(nations) frame (25 rows) — an unpartitioned window
    is the documented tiny-frame exception; the data-sized work is the
    star join + one aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(100.0 * F.col("revenue") / F.sum("revenue").over(w), 4).alias(
            "pct_of_total"
        ),
    ).orderBy("n_name")


@register("near_dup_pagerank", anchor="tests/test_dedup_similarity.py::test_pagerank_triangle_and_star")
def q_near_dup_pagerank(spark, sf_dir):
    """PageRank centrality over the (symmetrized) near-dup graph — which
    documents sit at the center of duplication clusters. Iterative
    fixpoint (graph.py:pagerank, 8 rounds) — NOT SQL-expressible without
    bounded recursion+aggregation, so this entry takes the driver's
    rows-only check; the algorithm itself is pinned by exact unit tests
    (triangle/star reference recurrences) and the edge set is the oracled
    `ngram_jaccard_pairs`."""
    from scikit_learn_imputer_spark.graph import pagerank

    pairs = QUERIES["ngram_jaccard_pairs"](spark, sf_dir).select("id_a", "id_b")
    edges = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    ranks = pagerank(edges, src="id_a", dst="id_b", iters=8)
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 9).alias("rank")
    ).orderBy(F.col("rank").desc(), "doc_id")


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
             AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape (reference scope: relational coverage per SURVEY §2.4):
    revenue from LOCAL supply chains — the supplier join carries a second
    equality (c_nationkey = s_nationkey), so the nation restriction rides
    the join instead of a post-filter. Region/nation are broadcast; the
    selective o_orderdate year predicate is pushed to the orders scan so
    the big fact join sees one year of orders. Customer is joined to the
    filtered orders FIRST (shrinks the build side) and lineitem last."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# =====================================================================
# Round-5 additions: int8-quantized ANN and incremental dedup
# =====================================================================

@register(
    "cosine_topk_int8",
    oracle="""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
  FROM embeddings
),
qz AS (
  SELECT vec_id,
         list_transform(v, x -> CASE WHEN s > 0
                                     THEN floor(x / s * 127.0 + 0.5)
                                     ELSE 0.0 END) AS q
  FROM base
),
qs AS (SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id < 5),
scored AS (
  SELECT qs.query_id, c.vec_id AS neighbor_id,
         list_dot_product(qs.qq, c.q)
           / (sqrt(list_dot_product(qs.qq, qs.qq))
              * sqrt(list_dot_product(c.q, c.q))) AS qcos
  FROM qz c, qs
  WHERE c.vec_id != qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, qcos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qcos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(qcos, 6) AS qcosine, rank
FROM ranked WHERE rank <= 10
""",
)
def q_cosine_topk_int8(spark, sf_dir):
    """Top-k ANN over int8-QUANTIZED embeddings (similarity/quantize.py):
    per-vector symmetric scalar quantization (scale = max|x|/127,
    round-half-up — identical arithmetic in both engines), integer dot
    products accumulated in BIGINT, cosine from the codes directly (the
    per-vector scale cancels). The storage/shuffle form of a 100 TB
    vector corpus is 1 byte/dim (see ``pack_int8``); this query proves
    the quantized scoring ranks correctly against a DuckDB oracle doing
    the same quantization."""
    from scikit_learn_imputer_spark.similarity.quantize import cosine_topk_int8

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_int8(emb, queries, k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("qcosine"), 6).alias("qcosine"),
        "rank",
    )


_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

@register(
    "incremental_dedup_batch",
    oracle=f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
store AS (SELECT DISTINCT {_FP_SQL} AS fingerprint FROM corpus),
bfp AS (SELECT doc_id, {_FP_SQL} AS fingerprint FROM batch),
keep AS (SELECT fingerprint, min(doc_id) AS doc_id FROM bfp GROUP BY fingerprint)
SELECT k.doc_id, k.fingerprint
FROM keep k
WHERE k.fingerprint NOT IN (SELECT fingerprint FROM store)
ORDER BY doc_id
""",
)
def q_incremental_dedup_batch(spark, sf_dir):
    """Cross-batch incremental dedup (dedup/incremental.py): the corpus
    already ingested (doc_id % 5 != 0) is collapsed to a persisted
    parquet fingerprint STORE; the incoming batch (doc_id % 5 == 0) is
    deduplicated within itself (min-id survivor per distinct content)
    and anti-joined against the store — the build-once / probe-per-batch
    pattern a production crawl pipeline runs hourly. Only 32-char
    digests ever shuffle; AQE broadcasts the small batch side against
    the big store. The commit/re-probe invariant (a committed batch
    probes to zero survivors) is anchored by
    tests/test_dedup_similarity.py::test_incremental_dedup_commit_then_empty."""
    import os

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        incremental_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = _scratch("fp_store")
    build_fingerprint_store(corpus, path)
    out = incremental_dedup(batch, path)
    return out.select("doc_id", "fingerprint").orderBy("doc_id")


def _incremental_near_dedup_oracle_sql() -> str:
    """Batch-vs-history banded-LSH filter: a batch doc survives iff NO
    band slice fully matches any store doc (brute-force band predicate
    over the already-oracled md5 signatures, store = doc_id % 5 != 0,
    batch = doc_id % 5 = 0)."""
    bands = " OR ".join(
        "("
        + " AND ".join(f"a.sig_{4*b+j} = b.sig_{4*b+j}" for j in range(4))
        + ")"
        for b in range(_MINHASH_K // 4)
    )
    return f"""
WITH sigs AS ({_minhash_oracle_sql()}),
hits AS (
  SELECT DISTINCT a.doc_id
  FROM (SELECT * FROM sigs WHERE doc_id % 5 = 0) a
  JOIN (SELECT * FROM sigs WHERE doc_id % 5 <> 0) b ON ({bands})
)
SELECT d.doc_id, d.source, d.n_chars FROM documents d
WHERE d.doc_id % 5 = 0 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
ORDER BY d.doc_id
"""


@register(
    "incremental_near_dedup_batch", oracle=_incremental_near_dedup_oracle_sql()
)
def q_incremental_near_dedup_batch(spark, sf_dir):
    """Cross-batch incremental NEAR-dedup (dedup/incremental.py): the
    already-ingested corpus (doc_id % 5 != 0) is collapsed to a persisted
    (band, bucket) signature STORE; the incoming batch (doc_id % 5 == 0)
    drops every doc banded LSH would pair with history — the build-once /
    probe-per-batch near-dup form of the crawl pipeline, beside the exact
    incremental_dedup_batch. md5 hasher here so the whole probe is
    oracled (the brute-force band predicate over oracled signatures);
    the xxhash64 production path shares the code path. Store streamed,
    never broadcast; only band digests shuffle. The commit/re-probe and
    config-mismatch contracts are pinned by
    tests/test_dedup_similarity.py::test_incremental_near_dedup_history_filter."""
    import os

    from scikit_learn_imputer_spark.dedup.incremental import (
        build_signature_store,
        incremental_near_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = _scratch("sig_store")
    cfg = dict(
        num_hashes=_MINHASH_K, bands=_MINHASH_K // 4, shingle=5, hasher="md5"
    )
    build_signature_store(corpus, path, **cfg)
    out = incremental_near_dedup(batch, path, **cfg)
    return out.select("doc_id", "source", "n_chars").orderBy("doc_id")


def _dedup_store_stats_oracle_sql() -> str:
    """Content-level store health from first principles: the fingerprint
    store after build(corpus %5!=0) + commit(batch %5==0) holds exactly
    the corpus-wide distinct fingerprints; the signature store holds
    bands rows per accepted doc (corpus + batch docs with no band
    collision vs corpus — the incremental_near_dedup_batch predicate)."""
    bands_pred = " OR ".join(
        "("
        + " AND ".join(f"a.sig_{4*b+j} = b.sig_{4*b+j}" for j in range(4))
        + ")"
        for b in range(_MINHASH_K // 4)
    )
    n_bands = _MINHASH_K // 4
    fp = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"
    return f"""
WITH sigs AS ({_minhash_oracle_sql()}),
hits AS (
  SELECT DISTINCT a.doc_id
  FROM (SELECT * FROM sigs WHERE doc_id % 5 = 0) a
  JOIN (SELECT * FROM sigs WHERE doc_id % 5 <> 0) b ON ({bands_pred})
),
acc AS (
  SELECT doc_id, source FROM documents
  WHERE doc_id % 5 <> 0
     OR doc_id NOT IN (SELECT doc_id FROM hits)
)
SELECT 'fingerprint' AS store, 'n_rows' AS metric,
       CAST(count(DISTINCT {fp}) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 'fingerprint', 'n_distinct', CAST(count(DISTINCT {fp}) AS BIGINT)
FROM documents
UNION ALL
SELECT 'signature', 'n_rows', CAST(count(*) * {n_bands} AS BIGINT) FROM acc
UNION ALL
SELECT 'signature', 'n_distinct', CAST(count(*) * {n_bands} AS BIGINT) FROM acc
UNION ALL
SELECT 'signature', 'n_docs', CAST(count(*) AS BIGINT) FROM acc
UNION ALL
SELECT 'signature', 'docs:' || source, CAST(count(*) AS BIGINT)
FROM acc GROUP BY source
"""


@register("dedup_store_stats", oracle=_dedup_store_stats_oracle_sql())
def q_dedup_store_stats(spark, sf_dir):
    """Dedup-store lifecycle observability (VERDICT r6 stretch #8 / r7
    #3): build both persisted stores (fingerprints over the %5!=0
    corpus, md5-hasher band signatures likewise), commit the %5==0
    batch incrementally into each, then report content health —
    n_rows vs n_distinct (append redundancy, i.e. compaction debt),
    accepted doc counts, and per-source accepted counts. The oracle
    re-derives every number from the corpus and the banded-LSH
    predicate, so the store CONTENT after a build+probe+commit cycle is
    hash-checked by the driver. Physical n_files/n_bytes are reported
    by the library function (dedup/incremental.py:dedup_store_stats)
    but filtered here — file layout is engine-local, not
    oracle-portable; tests pin them positive."""
    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        build_signature_store,
        dedup_store_stats,
        incremental_dedup_and_commit,
        incremental_near_dedup_and_commit,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    fpath = _scratch("fp_store_stats")
    spath = _scratch("sig_store_stats")
    cfg = dict(
        num_hashes=_MINHASH_K, bands=_MINHASH_K // 4, shingle=5, hasher="md5"
    )

    # The two store lifecycles touch DISJOINT paths and frames; each
    # chain stays strictly sequential internally (build before commit),
    # but the fingerprint and signature chains overlap from a driver
    # thread pool (guide §2.6) so the signature chain's MinHash jobs
    # back-fill the executors the fingerprint chain leaves idle.
    def fp_chain() -> None:
        build_fingerprint_store(corpus, fpath)
        incremental_dedup_and_commit(batch, fpath)

    def sig_chain() -> None:
        build_signature_store(corpus, spath, **cfg)
        incremental_near_dedup_and_commit(batch, spath, **cfg)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(fp_chain), pool.submit(sig_chain)]:
            f.result()
    stats = dedup_store_stats(
        spark, fingerprint_path=fpath, signature_path=spath, docs=docs
    )
    return stats.filter(~F.col("metric").isin("n_files", "n_bytes"))


@register("cosine_topk_int8_packed", oracle=ORACLE["cosine_topk_int8"])
def q_cosine_topk_int8_packed(spark, sf_dir):
    """The packed-binary twin of cosine_topk_int8 (same oracle — integer
    dot products are exact, so the 1-byte/dim packed form ranks
    bit-identically): corpus packed to dim-byte binaries, one
    np.frombuffer reinterpret + one int32 matmul per Arrow batch,
    local top-k before the only shuffle. This is the form and the
    scoring loop a 100 TB vector corpus actually runs."""
    from scikit_learn_imputer_spark.similarity.quantize import (
        cosine_topk_int8_packed,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk_int8_packed(emb, queries, k=10)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("qcosine"), 6).alias("qcosine"),
        "rank",
    )


@register(
    "pii_audit",
    oracle="""
WITH injected AS (
  SELECT source,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                   || ' card 4111 1111 1111 1111'
              ELSE text END AS text
  FROM documents
),
counted AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ip,
         len(regexp_extract_all(text, '\\b[0-9][0-9 -]{7,}[0-9]\\b')) AS n_longnum
  FROM injected
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_email + n_ip + n_longnum > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(sum(n_email) AS BIGINT) AS n_email,
       CAST(sum(n_ip) AS BIGINT) AS n_ip,
       CAST(sum(n_longnum) AS BIGINT) AS n_longnum,
       round(CAST(sum(CASE WHEN n_email + n_ip + n_longnum > 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 9) AS pii_rate
FROM counted GROUP BY source
""",
)
def q_pii_audit(spark, sf_dir):
    """Per-source PII exposure report (the compliance number beside the
    scrub): documents carrying any PII hit, per-pattern match totals,
    and the per-source hit rate — what a data-governance review reads
    to decide which sources need scrubbing versus dropping. Same
    deterministic injection as pii_scrub (the corpus carries no organic
    PII); counts on ORIGINAL text; one map-side regexp_count projection
    + an O(#sources) aggregate."""
    from scikit_learn_imputer_spark.functions.pii import pii_counts

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" card 4111 1111 1111 1111"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    c = pii_counts(F.col("text"))
    counted = injected.select(
        "source",
        c["email"].alias("__e"),
        c["ip"].alias("__i"),
        c["longnum"].alias("__l"),
    )
    any_pii = (F.col("__e") + F.col("__i") + F.col("__l") > 0).cast("int")
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(any_pii).cast("bigint").alias("docs_with_pii"),
        F.sum("__e").cast("bigint").alias("n_email"),
        F.sum("__i").cast("bigint").alias("n_ip"),
        F.sum("__l").cast("bigint").alias("n_longnum"),
        F.round(
            F.sum(any_pii).cast("double") / F.count(F.lit(1)), 9
        ).alias("pii_rate"),
    )


@register(
    "pii_scrub",
    oracle="""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                   || ' card 4111 1111 1111 1111'
              ELSE text END AS text
  FROM documents
),
counted AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ip,
         len(regexp_extract_all(text, '\\b[0-9][0-9 -]{7,}[0-9]\\b')) AS n_longnum
  FROM injected
)
SELECT doc_id,
       CAST(n_email AS INT) AS n_email,
       CAST(n_ip AS INT) AS n_ip,
       CAST(n_longnum AS INT) AS n_longnum,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
             '\\b[0-9][0-9 -]{7,}[0-9]\\b', '<NUM>', 'g')) AS clean_md5
FROM counted
ORDER BY doc_id
""",
)
def q_pii_scrub(spark, sf_dir):
    """PII redaction pass (functions/pii.py): emails, IPv4s, and long
    digit runs counted and replaced in one map-only projection — no
    UDF, no shuffle, pipelines with the scan at any scale. The synthetic
    corpus carries no organic PII, so the query deterministically
    INJECTS a contact line into every 7th document (same expression in
    the oracle) so the driver row exercises real redactions — counts on
    the original text, md5 over the scrubbed text."""
    from scikit_learn_imputer_spark.functions.pii import scrub_pii

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" card 4111 1111 1111 1111"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = scrub_pii(injected)
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_ip").cast("int").alias("n_ip"),
        F.col("n_longnum").cast("int").alias("n_longnum"),
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


@register(
    "bigram_lm_quality",
    oracle="""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 1, 0)),
                               i -> substr(lower(text), CAST(i AS INT), 2))) AS bigram
  FROM documents
),
counts AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
prefix AS (SELECT substr(bigram, 1, 1) AS prefix, sum(c) AS pc
           FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT substr(bigram, 2, 1)) AS v FROM counts),
terms AS (
  SELECT b.doc_id,
         CAST(round(ln((c.c + 1)::DOUBLE / (p.pc + vocab.v)::DOUBLE) * 1e6)
              AS BIGINT) AS m
  FROM bg b
  JOIN counts c USING (bigram)
  JOIN prefix p ON p.prefix = substr(b.bigram, 1, 1)
  CROSS JOIN vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(m)::DOUBLE / count(*) / 1e6, 6) AS lm_score
FROM terms
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q_bigram_lm_quality(spark, sf_dir):
    """In-plan LM quality filter (functions/lm.py): train char-bigram
    counts over the corpus (map-side partials collapse to O(alphabet²)
    per partition — the shuffle never grows with corpus size), broadcast
    the count table back, score each document's mean add-one-smoothed
    bigram log-prob. Per-term log-probs are snapped to integer
    micro-nats BEFORE summation so the per-doc aggregate is exact
    integer math — partitioning- and order-invariant, hence
    oracle-stable. The low tail of lm_score is the filter's reject
    set (the perplexity-filter dataflow at 100 TB)."""
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    out = bigram_lm_scores(d)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("lm_score"), 6).alias("lm_score"),
    ).orderBy("doc_id")


@register(
    "sorted_layout_scan",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-06-01' AND l_shipdate < DATE '1995-07-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_sorted_layout_scan(spark, sf_dir):
    """Row-group skipping via sort-ordered layout (sources/layout.py):
    lineitem is rewritten range-sorted by l_shipdate (repartitionByRange
    → non-overlapping per-FILE date ranges, footer min/max prunes whole
    files; sortWithinPartitions → row groups subdivide each file's
    range). A one-month predicate then reads ~1/84 of the files instead
    of all of them — the file-granularity complement to directory-level
    partition pruning, and the layout a 100 TB fact table should be
    written in. Values are layout-independent (same oracle as a plain
    scan); the SKIPPING is asserted by
    tests/test_sinks_sampling.py::test_sorted_layout_prunes_files."""
    import os

    from scikit_learn_imputer_spark.sources.layout import read_layout, write_sorted

    li = _t(spark, sf_dir, "lineitem")
    path = _scratch("sorted_lineitem")
    write_sorted(li, path, "l_shipdate", num_files=16)
    back = read_layout(spark, path)
    return (
        back.filter(
            (F.col("l_shipdate") >= "1995-06-01")
            & (F.col("l_shipdate") < "1995-07-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT coalesce(r_name, '<all>') AS region,
       coalesce(o_orderpriority, '<all>') AS priority,
       CAST(grouping(r_name) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
ORDER BY region, priority, gid
""",
)
def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (the general form of rollup/cube, §2.10):
    three simultaneous aggregation granularities in ONE pass over the
    joined fact — Spark expands the sets map-side (each input row feeds
    every set), so the shuffle is one aggregate exchange, not one per
    granularity. grouping() disambiguates a real NULL key from a
    rolled-up one — the coalesce to '<all>' is only safe because of it."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    joined.createOrReplaceTempView("__gs_joined")
    return spark.sql(
        """
        SELECT coalesce(r_name, '<all>') AS region,
               coalesce(o_orderpriority, '<all>') AS priority,
               CAST(grouping(r_name) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM __gs_joined
        GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
        ORDER BY region, priority, gid
        """
    )


@register(
    "media_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, CAST(greatest(length(text) // 32, 1) AS INT) - 1, 2)) AS fno
  FROM documents
)
SELECT doc_id,
       CAST(fno AS INT) AS frame_no,
       md5(substr(text, CAST(fno * 32 + 1 AS INT), 32)) AS frame_md5
FROM f
ORDER BY doc_id, frame_no
""",
)
def q_media_frame_sample(spark, sf_dir):
    """Video-style frame sampling over binary payloads
    (sources/multimodal.py:sample_frames): every 2nd fixed-width frame
    per media item, one output row per frame — the row-multiplying
    generator shape of a real ffmpeg-backed sampler, Arrow batch in /
    many rows out. Payloads are the documents' utf-8 bytes (pure-ASCII
    corpus, so the DuckDB oracle reproduces each frame with substr and
    hashes it identically)."""
    from scikit_learn_imputer_spark.sources.multimodal import (
        media_from_documents,
        sample_frames,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_bytes=32, every_nth=2)
    return frames.select(
        F.col("media_id").alias("doc_id"),
        "frame_no",
        F.md5(F.col("frame")).alias("frame_md5"),
    ).orderBy("doc_id", "frame_no")


_PII_CLEAN_SQL = """regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
      '\\b[0-9][0-9 -]{7,}[0-9]\\b', '<NUM>', 'g')"""

@register(
    "corpus_preprocess_pipeline",
    oracle=f"""
WITH clean AS (
  SELECT doc_id, {_PII_CLEAN_SQL} AS text FROM documents
),
gated AS (
  SELECT doc_id, text FROM clean
  WHERE ({_QSCORE_SQL}) >= 0.5 AND ({_NTOK_SQL}) >= 20
),
keepers AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         min(doc_id) AS doc_id
  FROM gated GROUP BY fp
),
deduped AS (
  SELECT g.doc_id, g.text FROM gated g
  JOIN keepers k ON k.doc_id = g.doc_id
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 1, 0)),
                               i -> substr(lower(text), CAST(i AS INT), 2))) AS bigram
  FROM deduped
),
counts AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
prefix AS (SELECT substr(bigram, 1, 1) AS prefix, sum(c) AS pc FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT substr(bigram, 2, 1)) AS v FROM counts),
terms AS (
  SELECT b.doc_id,
         CAST(round(ln((c.c + 1)::DOUBLE / (p.pc + vocab.v)::DOUBLE) * 1e6) AS BIGINT) AS m
  FROM bg b
  JOIN counts c USING (bigram)
  JOIN prefix p ON p.prefix = substr(b.bigram, 1, 1)
  CROSS JOIN vocab
),
lm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         sum(m)::DOUBLE / count(*) / 1e6 AS lm_score
  FROM terms GROUP BY doc_id
),
thr AS (SELECT vs[CAST(((n - 1) * 1) // 4 AS BIGINT) + 1] AS t
       FROM (SELECT list_sort(list(lm_score) FILTER (lm_score IS NOT NULL)) AS vs,
                    CAST(count(lm_score) AS BIGINT) AS n
             FROM lm))
SELECT doc_id, n_bigrams, round(lm_score, 6) AS lm_score
FROM lm, thr
WHERE lm_score >= t
ORDER BY doc_id
""",
)
def q_corpus_preprocess_pipeline(spark, sf_dir):
    """The composed round-5 preprocessing pipeline as ONE lazy plan —
    what an LLM data run executes per crawl snapshot: PII scrub (map
    projection) → quality gate (map filter, pipelined with the scan) →
    exact dedup (digest semi-join; only 32-byte hashes shuffle) →
    bigram-LM scoring trained ON the surviving corpus (literal-map
    scorer: the count table is the bounded O(alphabet²) collect every
    LM call site performs, scoring is a pure projection — r15 replaced
    the explode + 3-join + re-aggregate chain this query carried from
    its round-5 build, values bit-identical per functions/lm.py's
    two-path contract) → drop the bottom lm-score quartile via a
    self-calibrating 1-row broadcast threshold (non-vacuous at every SF
    by construction). The threshold is an EXACT-RANK quantile
    (stats.py:exact_rank_quantiles — the interpolating percentile
    ULP-diverges from the oracle exactly at threshold-equal scores);
    per-term micro-nat integer sums keep the LM aggregate
    order-invariant, so the whole five-stage composite is
    oracle-checkable end to end."""
    from scikit_learn_imputer_spark.dedup.exact import exact_dedup
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores
    from scikit_learn_imputer_spark.functions.pii import scrub_pii_col
    from scikit_learn_imputer_spark.functions.text import quality_features

    d = _t(spark, sf_dir, "documents")
    clean = d.select("doc_id", scrub_pii_col(F.col("text")).alias("text"))
    scored = quality_features(clean)
    gated = scored.filter(_quality_pass_cond()).select("doc_id", "text")
    # The deduped survivor set is the pipeline's natural materialization
    # point (every production run persists post-dedup): the LM count
    # pass and the scoring projection both traverse it — without it each
    # re-runs scan→scrub→gate→dedup. At 100 TB this persist is a parquet
    # checkpoint, not an in-memory cache.
    deduped = exact_dedup(gated).persist()
    # The per-doc LM frame (doc_id, n_bigrams, lm_score — one row per
    # surviving doc) is traversed TWICE: the banded exact-rank threshold
    # is eager, and the kept filter re-reads the scores against it.
    # Materializing the score frame runs the scorer once (optimization
    # round 14, guide §1.2); the survivor cache is released as soon as
    # the scores exist instead of leaking to ContextCleaner.
    lm = bigram_lm_scores(deduped).localCheckpoint(eager=True)
    deduped.unpersist()
    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    thr = exact_rank_quantiles(
        lm, "lm_score", [(1, 4)], ["t"], band_width=0.5
    )
    kept = lm.crossJoin(F.broadcast(thr)).filter(
        F.col("lm_score") >= F.col("t")
    )
    return kept.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("lm_score"), 6).alias("lm_score"),
    ).orderBy("doc_id")


@register(
    "corpus_to_sequences_pipeline",
    oracle=r"""
WITH fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens
  FROM documents
),
bench AS (SELECT DISTINCT f FROM fp WHERE doc_id % 20 = 0),
clean AS (SELECT * FROM fp WHERE f NOT IN (SELECT f FROM bench)),
gated AS (SELECT * FROM clean WHERE n_tokens >= 10),
dedup AS (
  SELECT * FROM gated
  WHERE doc_id IN (SELECT min(doc_id) FROM gated GROUP BY f)
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM dedup
)
SELECT doc_id, source, n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_tokens > 512) AS straddles
FROM c
""",
)
def q_corpus_to_sequences_pipeline(spark, sf_dir):
    """The corpus→training-run composite, ONE lazy collect-free plan:
    decontaminate (digest anti join vs the doc_id%20 eval slice) →
    token-count gate (>=10) → exact dedup (min-id survivor per
    normalized fingerprint) → per-shard concat-and-cut packing
    (operators/chunking.py:pack_sequences, 512-token sequences).

    Shuffle census at 100 TB: the anti join broadcasts the eval digests
    (AQE, runtime-sized), so the corpus crosses the wire exactly TWICE —
    once on the dedup fingerprint, once on the shard key for the packing
    window — and every shuffle row carries (id, digest/counts), never
    document text. The packed (seq_id, offset) output is what a trainer
    shards on."""
    from scikit_learn_imputer_spark.dedup.exact import decontaminate, exact_dedup
    from scikit_learn_imputer_spark.functions.text import token_count_col
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    clean = decontaminate(d, bench)
    gated = clean.filter(token_count_col(F.col("text")) >= 10)
    deduped = exact_dedup(gated)
    return pack_sequences(deduped, seq_len=512)


@register(
    "cosine_topk_pq",
    anchor="tests/test_pq.py::test_pq_rerank_recall_floor_and_improvement",
)
def q_cosine_topk_pq(spark, sf_dir):
    """Product-quantization ANN (similarity/pq.py): seeded per-subspace
    KMeans codebooks trained on a corpus sample (FAISS practice), m-byte
    codes, ADC shortlist scored from per-query lookup tables, exact
    cosine re-rank of the |Q| x shortlist survivors. Rows-only
    (approximate + KMeans, not SQL-expressible); recall floor and the
    lossless-reconstruction exactness property are pinned by
    tests/test_pq.py. Registered so the PQ path's throughput is
    bench-visible beside brute/LSH/IVF/int8."""
    from scikit_learn_imputer_spark.similarity.pq import (
        encode_pq,
        pq_topk_rerank,
        train_pq,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cb = train_pq(emb.sample(0.2, seed=7), dim=64, m=4, k=16, max_iter=8)
    enc = encode_pq(emb, cb)
    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_topk_rerank(enc, emb, queries, cb, k=10, shortlist=50)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register(
    "zorder_layout_scan",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-06-01' AND l_shipdate < DATE '1995-09-01'
  AND l_partkey BETWEEN 10 AND 400
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_zorder_layout_scan(spark, sf_dir):
    """Z-order (Morton) layout scan (sources/layout.py:write_zorder):
    lineitem rewritten clustered on the interleaved bits of
    (l_shipdate, l_partkey), so a predicate on EITHER column skips most
    files via footer min/max — where the 1-D sorted layout
    (sorted_layout_scan) skips only on its sort column. The 2-D
    predicate here exercises both dimensions at once. Values are
    layout-independent (plain-scan oracle); the both-dimension skipping
    itself is asserted from parquet footers by
    tests/test_sinks_sampling.py::test_zorder_layout_skips_on_both_dimensions."""
    import os

    from scikit_learn_imputer_spark.sources.layout import read_layout, write_zorder

    li = _t(spark, sf_dir, "lineitem")
    path = _scratch("zorder_lineitem")
    write_zorder(li, path, ["l_shipdate", "l_partkey"], bits=12, num_files=16)
    back = read_layout(spark, path)
    return (
        back.filter(
            (F.col("l_shipdate") >= "1995-06-01")
            & (F.col("l_shipdate") < "1995-09-01")
            & (F.col("l_partkey").between(10, 400))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "ann_ivfpq_topk",
    anchor="tests/test_pq.py::test_ivfpq_recall_floor",
)
def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF x PQ ANN (similarity/pq.py:ivfpq_topk) — the FAISS production
    composition: coarse KMeans cells prune candidates (nprobe of nlist
    cells scored per query), PQ codes prune memory (ADC over m-byte
    codes), exact cosine re-ranks the shortlist. Rows-only (doubly
    approximate); recall floors pinned by tests/test_pq.py. Cheap cell
    build (the recall burden sits on the re-rank, not cell quality) —
    same recipe as ann_ivf_persisted_topk."""
    from scikit_learn_imputer_spark.similarity.ivf import build_ivf_index
    from scikit_learn_imputer_spark.similarity.pq import (
        encode_pq,
        ivfpq_topk,
        train_pq,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assigned, cents = build_ivf_index(
        emb, nlist=8, max_iter=3, init_mode="random", build_partitions=4
    )
    cb = train_pq(emb.sample(0.5, seed=7), dim=64, m=8, k=64, max_iter=10)
    enc = encode_pq(emb, cb)
    # Eagerly materialize the compact (id, cell, codes) index BEFORE
    # releasing the KMeans assignment cache — unpersisting first would
    # throw the cache away while the plan is still lazy, so the timed
    # collect would silently recompute the whole index build (ADVICE r5).
    ae = (
        assigned.select("vec_id", "cell")
        .join(enc, "vec_id")
        .localCheckpoint(eager=True)
    )
    assigned.unpersist()
    out = ivfpq_topk(ae, emb, queries=emb.filter(F.col("vec_id") < 5),
                     centroids=cents, codebook=cb, k=10, nprobe=4, shortlist=50)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


@register(
    "incremental_pack_batch",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_tokens > 512) AS straddles
FROM c
WHERE doc_id >= 250
""",
)
def q_incremental_pack_batch(spark, sf_dir):
    """Cross-batch sequence packing against the persisted per-shard
    offset store (operators/chunking.py:incremental_pack): history
    (doc_id < 250) seeds the store, then the new batch packs CONTINUING
    each shard's token stream — emitting exactly what one global
    pack_sequences run assigns to those docs (sequential == global,
    pinned by tests), which is why the oracle is simply the global pack
    restricted to the batch. The store is O(#shards) rows; the batch
    never re-reads history documents."""
    import os

    from scikit_learn_imputer_spark.operators.chunking import (
        build_offset_store,
        incremental_pack,
    )

    d = _t(spark, sf_dir, "documents")
    store = _scratch("pack_offsets")
    build_offset_store(d.filter(F.col("doc_id") < 250), store, seq_len=512)
    return incremental_pack(d.filter(F.col("doc_id") >= 250), store, seq_len=512)


@register(
    "temperature_mixture_sample",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u
  FROM documents
),
s AS (
  SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS n_s FROM t GROUP BY source
),
r AS (
  SELECT source,
         round(least(1.0, 5000.0 * (pow(n_s, 0.7) / sum(pow(n_s, 0.7)) OVER ())
                          / n_s), 6) AS keep_rate
  FROM s
)
SELECT t.doc_id, t.source, t.n_tokens, r.keep_rate
FROM t JOIN r ON t.source = r.source
WHERE t.u < r.keep_rate
""",
)
def q_temperature_mixture_sample(spark, sf_dir):
    """Temperature-reweighted mixture sampling (the XLM-R/mT5
    language-balancing step): shard s is sampled with probability
    proportional to n_s^tau (tau=0.7 flattens the head so low-resource
    shards are over-represented relative to their raw size), scaled to a
    token budget and applied as a deterministic md5-uniform Bernoulli
    keep. Rates are rounded to 6 decimals on BOTH engines before the
    compare so pow()'s last-ulp differences can't flip a keep decision.
    Cost shape: one O(#shards) aggregate, a 1-row normalizer broadcast,
    then a map-only keep — no corpus shuffle."""
    from scikit_learn_imputer_spark.functions.text import (
        token_count_col,
        uniform_hash_col,
    )

    tau, budget = 0.7, 5000.0
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count_col(F.col("text")).cast("bigint").alias("n_tokens"),
        uniform_hash_col(F.col("doc_id")).alias("__u"),
    )
    totals = d.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("__n_s")
    )
    w = totals.withColumn("__w_s", F.pow("__n_s", F.lit(tau)))
    z = w.agg(F.sum("__w_s").alias("__z"))
    rates = (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget) * (F.col("__w_s") / F.col("__z")) / F.col("__n_s"),
                ),
                6,
            ).alias("keep_rate"),
        )
    )
    return (
        d.join(rates, "source")
        .filter(F.col("__u") < F.col("keep_rate"))
        .select("doc_id", "source", "n_tokens", "keep_rate")
    )


@register(
    "mixture_epoch_plan",
    oracle=r"""
WITH t AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END) AS BIGINT)
           AS n_tokens,
         CAST(substr(source, 4) AS INT) + 1 AS w_raw
  FROM documents GROUP BY source
),
z AS (SELECT CAST(sum(w_raw) AS DOUBLE) AS zw,
             CAST(sum(n_tokens) AS DOUBLE) AS budget FROM t)
SELECT source, n_docs, n_tokens,
       round(w_raw / zw, 9) AS weight,
       CAST(round(budget * w_raw / zw) AS BIGINT) AS target_tokens,
       round(budget * w_raw / zw / n_tokens, 6) AS epochs,
       round(least(budget * w_raw / zw / n_tokens, 4.0), 6) AS capped_epochs,
       CAST(round(least(budget * w_raw / zw / n_tokens, 4.0) * n_tokens)
            AS BIGINT) AS achieved_tokens
FROM t, z
""",
)
def q_mixture_epoch_plan(spark, sf_dir):
    """Mixture epoch plan (the LLaMA/Pile-style upsampling table):
    given per-source target weights (here ∝ source index + 1) and a
    token budget (the corpus's own total — rebalance at constant
    budget), derive each source's target token mass, the epoch count
    (repeats) needed to hit it, the epoch cap (4.0 — past which
    upsampling hurts, per Muennighoff et al. 2023), and the achieved
    mass under the cap. THE planning artifact a training run consumes
    before sampling. One O(#sources) aggregate + a 1-row budget
    broadcast — nothing corpus-sized moves."""
    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    per_src = (
        d.select("source", n.alias("__n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "__w_raw", F.substring("source", 4, 10).cast("int") + F.lit(1)
        )
    )
    z = per_src.agg(
        F.sum("__w_raw").cast("double").alias("__zw"),
        F.sum("n_tokens").cast("double").alias("__budget"),
    )
    target = F.col("__budget") * F.col("__w_raw") / F.col("__zw")
    epochs = target / F.col("n_tokens")
    capped = F.least(epochs, F.lit(4.0))
    return per_src.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("__w_raw") / F.col("__zw"), 9).alias("weight"),
        F.round(target).cast("bigint").alias("target_tokens"),
        F.round(epochs, 6).alias("epochs"),
        F.round(capped, 6).alias("capped_epochs"),
        F.round(capped * F.col("n_tokens")).cast("bigint").alias(
            "achieved_tokens"
        ),
    )


@register(
    "lm_score_deciles",
    oracle=r"""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 1, 0)),
                               i -> substr(lower(text), CAST(i AS INT), 2))) AS bigram
  FROM documents
),
counts AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
prefix AS (SELECT substr(bigram, 1, 1) AS prefix, sum(c) AS pc
           FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT substr(bigram, 2, 1)) AS v FROM counts),
terms AS (
  SELECT b.doc_id,
         CAST(round(ln((c.c + 1)::DOUBLE / (p.pc + vocab.v)::DOUBLE) * 1e6)
              AS BIGINT) AS m
  FROM bg b
  JOIN counts c USING (bigram)
  JOIN prefix p ON p.prefix = substr(b.bigram, 1, 1)
  CROSS JOIN vocab
),
lm AS (
  SELECT doc_id, round(sum(m)::DOUBLE / count(*) / 1e6, 6) AS s
  FROM terms GROUP BY doc_id
),
thr AS (
  SELECT list_transform(range(1, 10),
                        k -> vs[CAST(((n - 1) * k) // 10 AS BIGINT) + 1]) AS ts
  FROM (SELECT list_sort(list(s) FILTER (s IS NOT NULL)) AS vs,
               CAST(count(s) AS BIGINT) AS n
        FROM lm)
)
SELECT CAST(1 + len(list_filter(thr.ts, t -> lm.s >= t)) AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(lm.s), 6) AS mean_lm_score,
       round(min(lm.s), 6) AS min_lm_score,
       round(max(lm.s), 6) AS max_lm_score
FROM lm, thr
GROUP BY 1
""",
)
def q_lm_score_deciles(spark, sf_dir):
    """Perplexity-filter calibration: bigram-LM scores bucketed into
    deciles by BROADCAST thresholds with per-decile doc counts and
    score ranges — how a CCNet-style filter picks its head/middle/tail
    cut WITHOUT a data-sized global window or buffer: the only global
    op is a 9-value EXACT-RANK quantile
    (functions/stats.py:exact_rank_quantiles — interpolating
    percentiles diverge from the oracle by one ULP at threshold-equal
    scores, the round-12 sf1 sweep finding; (value,count) selection
    over the 6dp-bounded score domain, VERDICT r12 #1); bucketing is a
    map-side comparison against the broadcast thresholds. The score is
    a 6-dp-rounded MEAN of add-one-smoothed log-probs — observed means
    concentrate in a few-nat window, so the occupied lattice stays
    millions, not corpus-sized; the fast path's runtime guard
    (domain_bound=4M, ~128 MB of structs in the worst case) fails
    loudly rather than silently buffering more, and the banded path is
    one flag away (VERDICT r13 #1)."""
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores
    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    lm = bigram_lm_scores(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.round("lm_score", 6).alias("__s")
    )
    thr = exact_rank_quantiles(
        lm,
        "__s",
        [(k, 10) for k in range(1, 10)],
        [f"__t{k}" for k in range(1, 10)],
        band_width=0.5,
        domain_bound=4_000_000,
    ).select(
        F.array(*[f"__t{k}" for k in range(1, 10)]).alias("__ts")
    )
    decile = F.lit(1) + F.size(
        F.filter("__ts", lambda t: F.col("__s") >= t)
    )
    return (
        lm.crossJoin(F.broadcast(thr))
        .select(decile.cast("int").alias("decile"), "__s")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__s"), 6).alias("mean_lm_score"),
            F.round(F.min("__s"), 6).alias("min_lm_score"),
            F.round(F.max("__s"), 6).alias("max_lm_score"),
        )
    )


@register(
    "ngram_novelty_curve",
    oracle=r"""
WITH w AS (SELECT str_split_regex(trim(text), '\s+') AS w FROM documents),
g AS (
  SELECT n, unnest(grams) AS g FROM (
    SELECT 1 AS n, w AS grams FROM w
    UNION ALL
    SELECT 2, list_transform(range(1, greatest(len(w), 1)),
                             i -> w[i] || ' ' || w[i+1]) FROM w
    UNION ALL
    SELECT 3, list_transform(range(1, greatest(len(w) - 1, 1)),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) FROM w
    UNION ALL
    SELECT 5, list_transform(range(1, greatest(len(w) - 3, 1)),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  || ' ' || w[i+3] || ' ' || w[i+4]) FROM w
    UNION ALL
    SELECT 8, list_transform(range(1, greatest(len(w) - 6, 1)),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  || ' ' || w[i+3] || ' ' || w[i+4]
                                  || ' ' || w[i+5] || ' ' || w[i+6]
                                  || ' ' || w[i+7]) FROM w
  )
)
SELECT CAST(n AS INTEGER) AS n,
       CAST(count(*) AS BIGINT) AS occurrences,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
       round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 9)
         AS dup_mass
FROM g GROUP BY n
""",
)
def q_ngram_novelty_curve(spark, sf_dir):
    """Corpus-level n-gram novelty curve: for n ∈ {1,2,3,5,8}, total
    gram occurrences, distinct grams, and the corpus-wide duplicate
    mass 1 − distinct/total — the boilerplate thermometer that says at
    which n repetition lives (high dup mass at large n ⇒ templated
    text ⇒ span-removal pays). Grams hash to 16-byte digests before
    the distinct so shuffle rows never carry text; each n is one
    map-side-combinable aggregate.

    One corpus scan for all five n (optimization round 14, guide
    §2.4/§6): the former shape unioned five per-n explode branches, so
    the text column was read and tokenized five times. The per-n gram
    arrays of one document are independent projections of its own
    token array, so they concatenate into ONE (n, gram) struct array
    exploded once — same rows (word_ngrams_col yields [] below n
    tokens, never NULL, so concat ≡ the branch union), same aggregate,
    one text read instead of five. fan_out floors the explode stage's
    parallelism: the five union branches each got their own scan tasks,
    so the fused single scan of a few-split local file would otherwise
    serialize ALL five grams' hashing onto those few cores (measured
    3.6 → 6.1 s without it; no-op at scale where scans have thousands
    of splits)."""
    from scikit_learn_imputer_spark.functions.skew import fan_out
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = fan_out(_t(spark, sf_dir, "documents"))
    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    per_n = [
        F.transform(word_ngrams_col(F.col("text"), n), _tag(n))
        for n in (1, 2, 3, 5, 8)
    ]
    grams = d.select(
        F.explode(F.concat(*per_n)).alias("__ng")
    ).select(
        F.col("__ng.n").alias("n"), F.md5("__ng.g").alias("gd")
    )
    return grams.groupBy(F.col("n").cast("int").alias("n")).agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct("gd").alias("distinct_grams"),
        F.round(
            1.0 - F.countDistinct("gd").cast("double") / F.count(F.lit(1)), 9
        ).alias("dup_mass"),
    )


@register(
    "source_overlap_matrix",
    oracle=r"""
WITH g AS (
  SELECT DISTINCT source, md5(gr) AS gf FROM (
    SELECT source, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS gr
    FROM (SELECT source, str_split_regex(trim(text), '\s+') AS w
          FROM documents)
  )
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS shared_grams
FROM g a JOIN g b ON a.gf = b.gf AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
""",
)
def q_source_overlap_matrix(spark, sf_dir):
    """Cross-source contamination matrix (corpus hygiene dashboard):
    for every source pair, how many DISTINCT word 5-grams appear in
    both — the n-gram-overlap currency of decontamination, signalling
    which crawl slices/vendors share text and where dedup budget should
    go. (Exact-content overlap is the stricter metric but is vacuous on
    this testdata — duplicates are planted within sources only — so the
    matrix measures gram-level overlap.) One digest-keyed aggregate
    collects each gram's DISTINCT source set (bounded by #sources —
    map-side combinable), ordered pairs explode from the sorted set
    (fan-out bounded by (#sources)^2, never corpus size), and one tiny
    pair aggregate counts shared digests; text never shuffles.
    (Optimization round 14, guide §2.4: the former DISTINCT
    (source, digest) + digest self equi join exploded the corpus text
    twice and shuffled the gram table three times — distinct, then
    both join sides — for the identical per-digest pair sets.)"""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = _t(spark, sf_dir, "documents")
    srcs = (
        d.select(
            "source", F.explode(word_ngrams_col(F.col("text"), 5)).alias("__g")
        )
        .select("source", F.md5("__g").alias("__gf"))
        .groupBy("__gf")
        .agg(F.array_sort(F.collect_set("source")).alias("__ss"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("__ss"),
            lambda a: F.transform(
                F.filter(F.col("__ss"), lambda b: b > a),
                lambda b: F.struct(
                    a.alias("source_a"), b.alias("source_b")
                ),
            ),
        )
    )
    return (
        srcs.select(F.explode(pairs).alias("__p"))
        .groupBy(
            F.col("__p.source_a").alias("source_a"),
            F.col("__p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .orderBy("source_a", "source_b")
    )


@register(
    "minhash_precision_audit",
    oracle=f"""
WITH cands AS ({_minhash_candidates_oracle_sql()}),
grams AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(len(text) - 4, 0))) AS i
        FROM documents)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
  FROM cands c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
  GROUP BY c.id_a, c.id_b
),
jac AS (
  SELECT c.id_a, c.id_b,
         CAST(coalesce(i.i, 0) AS DOUBLE)
           / (sa.n + sb.n - coalesce(i.i, 0)) AS j
  FROM cands c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN j >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       round(CAST(sum(CASE WHEN j >= 0.4 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS precision_at_04
FROM jac
""",
)
def q_minhash_precision_audit(spark, sf_dir):
    """Self-audit of the banded LSH: of the candidate pairs the md5
    MinHash bands admit, what fraction has TRUE 5-char-shingle Jaccard
    >= 0.4 — the operational metric that sizes the exact-verification
    stage the candidates feed at 100 TB (low precision = wasted
    downstream compute; tune bands/rows). Exact Jaccard is a row-local
    array_intersect of the two docs' distinct-gram sets, evaluated only
    on candidate pairs (NOT all-pairs); the audit output is one row."""
    from scikit_learn_imputer_spark.dedup.minhash import (
        candidate_doc_texts,
        guarded_candidate_frame,
        minhash_candidate_pairs,
    )
    from scikit_learn_imputer_spark.dedup.ngram import ngram_set_col
    from scikit_learn_imputer_spark.functions.skew import fan_out

    d = _t(spark, sf_dir, "documents")
    cands = minhash_candidate_pairs(
        d,
        num_hashes=_MINHASH_K,
        bands=_MINHASH_K // 4,
        shingle=5,
        hasher="md5",
        max_bucket=2**31,
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    # The candidate set is referenced twice (gram-intersection build +
    # the jaccard assembly); lazily the banded LSH join would run twice.
    # It is pair-bounded, so it is materialized (guide §1.2) — measured
    # equal-min with a far tighter spread at sf0.1, and at scale it
    # halves the LSH join. Above the row bound the guard forbids
    # broadcasting it and restricts the gram explode to candidate docs
    # (see dedup.minhash.guarded_candidate_frame; VERDICT r14 #2/#3).
    cands, large, restrict = guarded_candidate_frame(cands)
    # Exact intersections WITHOUT the (pair × gram) equi-join: each
    # doc's distinct 5-gram SET is a map-only array projection (bounded
    # by text length — no skew hazard), each candidate pair joins to
    # its two arrays, and |A∩B| is a row-local array_intersect. The
    # former shape streamed one row per (pair, shared gram) through two
    # shuffles and a re-aggregate; this one never materializes more
    # than one row per pair (guide §2.3/§8 — move set membership as a
    # bounded payload once, not as an exploded row stream). Counts are
    # identical: char_ngrams explodes this same distinct array.
    gsets = fan_out(candidate_doc_texts(d, cands) if restrict else d).select(
        "doc_id", ngram_set_col("text", 5).alias("__gs")
    )
    ja = gsets.select(
        F.col("doc_id").alias("id_a"),
        F.col("__gs").alias("__gsa"),
        F.size("__gs").cast("bigint").alias("na"),
    )
    jb = gsets.select(
        F.col("doc_id").alias("id_b"),
        F.col("__gs").alias("__gsb"),
        F.size("__gs").cast("bigint").alias("nb"),
    )
    if large:
        # Doc-gram-set frames grow with the corpus: no broadcast builds
        # above the bound (see guarded_candidate_frame); SMJ spills.
        ja = ja.hint("merge")
        jb = jb.hint("merge")
    jac = (
        cands.join(ja, "id_a")
        .join(jb, "id_b")
        .select(
            F.size(F.array_intersect("__gsa", "__gsb"))
            .cast("bigint")
            .alias("i"),
            "na",
            "nb",
        )
        .select(
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i"))
            ).alias("j")
        )
    )
    return jac.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("j") >= 0.4, 1).otherwise(0)).alias("n_true"),
        F.round(
            F.sum(F.when(F.col("j") >= 0.4, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("precision_at_04"),
    )


@register(
    "schema_evolution_scan",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id >= 250 THEN lang ELSE NULL END AS lang,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def q_schema_evolution_scan(spark, sf_dir):
    """Schema evolution across parquet batches (the lakehouse reality:
    producers add columns over time): an old batch written WITHOUT the
    ``lang`` column and a new batch WITH it are read together under
    ``mergeSchema`` — old rows surface NULL for the added column, no
    rewrite of history. mergeSchema costs a footer-merge at planning
    time only; the scan itself stays columnar. Deterministic slices of
    ``documents`` stand in for the two producer generations, so the
    oracle is a plain CASE over the source table."""
    import os

    d = _t(spark, sf_dir, "documents")
    base = _scratch("schema_evo")
    (
        d.filter(F.col("doc_id") < 250)
        .select("doc_id", "n_chars")
        .write.mode("overwrite")
        .parquet(f"{base}/gen=1")
    )
    (
        d.filter(F.col("doc_id") >= 250)
        .select("doc_id", "n_chars", "lang")
        .write.mode("overwrite")
        .parquet(f"{base}/gen=2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return merged.select("doc_id", "lang", "n_chars").orderBy("doc_id")


@register(
    "packing_curve",
    oracle=r"""
WITH s AS (
  SELECT source,
         CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END) AS BIGINT)
           AS toks
  FROM documents GROUP BY source
), e AS (
  SELECT source, toks, unnest([128, 512, 2048]) AS seq_len FROM s
)
SELECT CAST(seq_len AS INTEGER) AS seq_len,
       CAST(sum((toks + seq_len - 1) // seq_len) AS BIGINT) AS n_sequences,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       CAST(sum((toks + seq_len - 1) // seq_len * seq_len - toks) AS BIGINT)
         AS pad_tokens,
       round(CAST(sum((toks + seq_len - 1) // seq_len * seq_len - toks)
                  AS DOUBLE)
             / sum((toks + seq_len - 1) // seq_len * seq_len), 9) AS pad_frac
FROM e GROUP BY seq_len
""",
)
def q_packing_curve(spark, sf_dir):
    """Padding-waste curve across candidate sequence lengths (128 / 512
    / 2048): concat-and-cut packing wastes ONLY each shard's tail, so
    per length the whole curve is algebra over per-shard token totals —
    sequences produced, padded slots, pad fraction. The number a
    training-config reviewer reads before fixing seq_len. One shard
    aggregate + a map-side explode over the length list; no window, no
    join, nothing corpus-sized after the first aggregate."""
    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    per_shard = (
        d.select("source", ntok.alias("__n"))
        .groupBy("source")
        .agg(F.sum("__n").alias("toks"))
    )
    lengths = F.array(*[F.lit(x) for x in (128, 512, 2048)])
    e = per_shard.select("toks", F.explode(lengths).alias("__l")).select(
        "toks", F.col("__l").cast("bigint").alias("seq_len")
    )
    nseq = F.floor((F.col("toks") + F.col("seq_len") - 1) / F.col("seq_len"))
    return (
        e.select("toks", "seq_len", nseq.alias("__nseq"))
        .groupBy(F.col("seq_len").cast("int").alias("seq_len"))
        .agg(
            F.sum("__nseq").cast("bigint").alias("n_sequences"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.sum(F.col("__nseq") * F.col("seq_len") - F.col("toks"))
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                F.sum(F.col("__nseq") * F.col("seq_len") - F.col("toks"))
                .cast("double")
                / F.sum(F.col("__nseq") * F.col("seq_len")),
                9,
            ).alias("pad_frac"),
        )
    )


@register(
    "packing_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(n_tokens) / 512.0) AS BIGINT) AS n_sequences,
       CAST((512 - sum(n_tokens) % 512) % 512 AS BIGINT) AS tail_padding,
       CAST(sum(CASE WHEN cum_prev % 512 + n_tokens > 512 THEN 1 ELSE 0 END)
            AS BIGINT) AS straddled_docs
FROM c GROUP BY source ORDER BY source
""",
)
def q_packing_stats(spark, sf_dir):
    """Packing-efficiency report per shard (the go/no-go numbers before
    a training run): sequences produced at 512 tokens, tail padding
    (unused slots in the final sequence — the only padding concat-and-
    cut packing ever wastes), and how many documents a cut straddles
    (relevant when loss masking resets at document boundaries). Derived
    entirely from the pack_sequences dataflow — one shard-partitioned
    window + one aggregate."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / 512.0).cast("bigint").alias("n_sequences"),
            ((512 - F.sum("n_tokens") % 512) % 512).alias("tail_padding"),
            F.sum(F.col("straddles").cast("int")).cast("bigint").alias(
                "straddled_docs"
            ),
        )
        .orderBy("source")
    )


# source_quality_matrix composes three oracles registered at different
# points in this module; resolve the placeholders after all of them exist.
ORACLE["source_quality_matrix"] = (
    ORACLE["source_quality_matrix"]
    .replace("{tq}", ORACLE["text_quality"])
    .replace("{rep}", ORACLE["repetition_signals"])
    .replace("{lm}", ORACLE["bigram_lm_quality"])
)


def _dsir_ctes(n_buckets: int = 128, target_src: str = "src0") -> str:
    """Shared DuckDB scoring chain for the DSIR queries: hashed-unigram
    histograms (raw + target in one pass), Laplace-smoothed per-bucket
    log-ratios in integer micro-units, per-doc sums. Yields CTEs:
    occ(doc_id, source, is_t, b), hist, tot, dist(b, m),
    per(doc_id, source, n_grams, sum_m)."""
    return rf"""occ AS (
  SELECT doc_id, source, (source = '{target_src}') AS is_t,
         CAST(('0x' || substr(md5(g), 1, 8))::UBIGINT % {n_buckets}
              AS INTEGER) AS b
  FROM (
    SELECT doc_id, source,
           unnest(str_split_regex(lower(trim(text)), '\s+')) AS g
    FROM documents WHERE length(trim(text)) > 0
  )
),
hist AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c_r,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM occ GROUP BY b
),
tot AS (SELECT CAST(sum(c_r) AS DOUBLE) AS n_r,
               CAST(sum(c_t) AS DOUBLE) AS n_t FROM hist),
dist AS (
  SELECT b,
         CAST(round(ln(((c_t + 1) / (tot.n_t + {n_buckets}.0)) /
                       ((c_r + 1) / (tot.n_r + {n_buckets}.0))) * 1e6)
              AS BIGINT) AS m
  FROM hist, tot
),
per AS (
  SELECT o.doc_id, o.source,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(d.m) AS BIGINT) AS sum_m
  FROM occ o JOIN dist d USING (b)
  GROUP BY o.doc_id, o.source
)"""


@register(
    "dsir_importance_weights",
    oracle=f"""
WITH {_dsir_ctes()}
SELECT doc_id, source, n_grams,
       CAST(round(sum_m / n_grams) AS BIGINT) / 1e6 AS score
FROM per
""",
)
def q_dsir_importance_weights(spark, sf_dir):
    """DSIR importance scores (functions/dsir.py — Xie et al. 2023,
    hashed n-gram importance resampling): every document scored by the
    mean log-likelihood ratio of its hashed word-unigram buckets under
    the TARGET distribution (here the src0 slice standing in for an
    eval-like domain) vs the RAW corpus distribution. The published
    data-selection recipe for "raw web text that looks like the
    target". Scale shape: one conditional-count histogram pass
    (collapses to 128 rows map-side), a broadcast dist join back onto
    the gram stream, one per-doc sum — text never shuffles."""
    from scikit_learn_imputer_spark.functions.dsir import dsir_scores

    return dsir_scores(
        _t(spark, sf_dir, "documents"),
        target=F.col("source") == "src0",
        n_buckets=128,
    )


@register(
    "dsir_resample",
    oracle=f"""
WITH {_dsir_ctes()},
scored AS (
  SELECT doc_id, source,
         CAST(round(sum_m / n_grams) AS BIGINT) AS s_micro
  FROM per
),
keyed AS (
  SELECT doc_id, source, s_micro / 1e6 AS score,
         CAST(round((s_micro / 1e6 + -ln(-ln(
             (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 0.5) / 4294967296.0))) * 1e6) AS BIGINT) AS key_micro
  FROM scored
)
SELECT doc_id, source, score, key_micro / 1e6 AS sample_key
FROM keyed ORDER BY key_micro DESC, doc_id LIMIT 100
""",
)
def q_dsir_resample(spark, sf_dir):
    """DSIR selection step: Gumbel-top-k importance resampling over the
    dsir_importance_weights scores (functions/dsir.py:gumbel_topk) —
    a deterministic without-replacement sample whose inclusion
    probability follows softmax(score), per the Gumbel-max trick. Keys
    are micro-snapped before the cutoff so engine last-ulp ln()
    differences cannot reorder the k-th boundary. Physical plan:
    TakeOrderedAndProject (O(k) heap per partition) — no global sort
    materialization at corpus scale."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_scores,
        gumbel_topk,
    )

    scored = dsir_scores(
        _t(spark, sf_dir, "documents"),
        target=F.col("source") == "src0",
        n_buckets=128,
    )
    return gumbel_topk(scored, k=100).select(
        "doc_id", "source", "score", "sample_key"
    )


@register(
    "token_position_lookup",
    oracle=f"""
WITH RECURSIVE {{bpe}},
c AS (
  SELECT doc_id, source, n_bpe_tokens AS n,
         CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM bcounts
),
hits AS (
  SELECT source, doc_id, cum,
         unnest(generate_series((cum + 499) // 500, (cum + n - 1) // 500)) AS k
  FROM c WHERE n > 0 AND (cum + n - 1) // 500 >= (cum + 499) // 500
)
SELECT source, CAST(k * 500 AS BIGINT) AS position,
       CAST((k * 500) // 512 AS BIGINT) AS seq_id,
       doc_id,
       CAST(k * 500 - cum AS BIGINT) AS token_offset_in_doc,
       CAST((k * 500) % 512 AS BIGINT) AS offset_in_seq
FROM hits
""",
)
def q_token_position_lookup(spark, sf_dir):
    """Inverse provenance (operators/tokenized.py:token_position_lookup,
    the "loss-spike forensics" query): every 500th global BPE-token
    position in each shard's packed stream resolved to the document
    that owns it, its offset inside that document, and its placement
    (seq_id, offset) in the 512-token sequences tokenized_sequences
    cuts. Implemented WITHOUT the naive position-interval range join:
    each doc enumerates the stride multiples inside its own [cum,
    cum+n) interval via a bounded F.sequence explode — one counts-only
    shard window, zero joins, O(total_tokens / stride) output rows."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        token_position_lookup,
    )

    return token_position_lookup(
        _t(spark, sf_dir, "documents"), seq_len=512, stride=500
    )


ORACLE["token_position_lookup"] = ORACLE["token_position_lookup"].replace(
    "{bpe}", _bpe_cte()
)


@register(
    "embedding_target_select",
    oracle="""
WITH tpos AS (
  SELECT i,
         CAST(sum(CAST(round(v * 1e6) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest(embedding::DOUBLE[]) AS v,
           unnest(range(1, len(embedding) + 1)) AS i
    FROM embeddings WHERE label = 0
  )
  GROUP BY i
),
cent AS (SELECT list(s::DOUBLE / (n * 1e6) ORDER BY i) AS c FROM tpos),
scored AS (
  SELECT e.vec_id, e.label,
         list_dot_product(cent.c, e.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(cent.c, cent.c)) *
          sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
           AS cos
  FROM embeddings e, cent
)
SELECT vec_id, label, round(cos, 6) AS cosine
FROM scored ORDER BY cos DESC, vec_id LIMIT 200
""",
)
def q_embedding_target_select(spark, sf_dir):
    """Embedding-space target selection
    (functions/dsir.py:embedding_target_select): the k=200 vectors
    closest by cosine to the label-0 slice's centroid — DSIR's
    embedding sibling, "keep raw data that looks like the target" when
    the signal lives in embeddings. Centroid components accumulate in
    integer micro-units (exact across engines, O(d) driver collect —
    the codebook-collect pattern); scoring is MAP-ONLY against the
    literal centroid (no join), selection is a TakeOrdered O(k) heap.
    The embedding column is scanned once."""
    from scikit_learn_imputer_spark.functions.dsir import (
        embedding_target_select,
    )

    return embedding_target_select(
        _t(spark, sf_dir, "embeddings"), target=F.col("label") == 0, k=200
    )


@register(
    "sequence_quality_weights",
    oracle=f"""
WITH RECURSIVE {{bpe}},
qd AS (
  SELECT doc_id,
         CAST(round(round(
             0.4 * (CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                    / length(text) ELSE 0.0 END)
           + 0.3 * least((CASE WHEN {_NTOK_SQL} > 0
               THEN CAST({_NSTOP_SQL} AS DOUBLE) / ({_NTOK_SQL})
               ELSE 0.0 END) * 5, 1.0)
           + 0.3 * (1 - least((CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                    / length(text) ELSE 0.0 END) * 10, 1.0)), 6) * 1e6)
           AS BIGINT) AS qm
  FROM documents
),
c AS (
  SELECT b.doc_id, b.source, b.n_bpe_tokens AS n, qd.qm,
         CAST(coalesce(sum(b.n_bpe_tokens) OVER (PARTITION BY b.source ORDER BY b.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM bcounts b JOIN qd USING (doc_id)
),
sp AS (
  SELECT source, qm, n, cum,
         unnest(generate_series(cum // 512, (cum + n - 1) // 512)) AS sq
  FROM c WHERE n > 0
),
ol AS (
  SELECT source, CAST(sq AS BIGINT) AS seq_id, qm,
         least((sq + 1) * 512, cum + n) - greatest(sq * 512, cum) AS L
  FROM sp
)
SELECT source, seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(L) AS BIGINT) AS n_tokens,
       round(CAST(sum(L * qm) AS DOUBLE) / sum(L) / 1e6, 6) AS weight
FROM ol GROUP BY 1, 2
""",
)
def q_sequence_quality_weights(spark, sf_dir):
    """Per-sequence loss weights
    (operators/tokenized.py:sequence_quality_weights): the
    token-mass-weighted mean document q_score inside each packed
    512-token sequence — what a trainer multiplies into the loss when
    packing mixes documents of uneven quality. Quality + BPE count in
    one map pass, counts-only shard window, bounded (doc, seq)
    explode, one aggregate; integer micro-unit weighting end to end."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_quality_weights,
    )

    return sequence_quality_weights(
        _t(spark, sf_dir, "documents"), seq_len=512
    )


ORACLE["sequence_quality_weights"] = ORACLE["sequence_quality_weights"].replace(
    "{bpe}", _bpe_cte()
)


def _lsh_bucket_skew_oracle() -> str:
    """Bucket populations from the (already-oracled) md5 signatures:
    bucket = md5 of the band's comma-joined signature slice — the SAME
    keying band_buckets/minhash_candidate_pairs use."""
    band_selects = []
    for b in range(_MINHASH_K // 4):
        cols = ", ".join(
            f"CAST(sig_{4 * b + j} AS VARCHAR)" for j in range(4)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS bucket FROM sigs"
        )
    union = "\n  UNION ALL\n  ".join(band_selects)
    return f"""
WITH sigs AS ({_minhash_oracle_sql()}),
bb AS (
  {union}
),
sz AS (SELECT band, bucket, CAST(count(*) AS BIGINT) AS s
       FROM bb GROUP BY 1, 2)
SELECT CAST(band AS INTEGER) AS band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(max(s) AS BIGINT) AS max_bucket,
       CAST(quantile_cont(s, 0.5) AS DOUBLE) AS median_bucket,
       CAST(sum(s * (s - 1) // 2) AS BIGINT) AS pairs_work,
       CAST(sum(CASE WHEN s > 20 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_buckets,
       CAST(sum(CASE WHEN s > 20 THEN (s + 19) // 20 ELSE 1 END) AS BIGINT)
         AS salt_fanout
FROM sz GROUP BY band
"""


@register("lsh_bucket_skew", oracle=_lsh_bucket_skew_oracle())
def q_lsh_bucket_skew(spark, sf_dir):
    """LSH bucket-skew forecast (dedup/minhash.py:lsh_bucket_stats):
    per-band bucket populations of the banded MinHash join —
    pairs_work is EXACTLY the candidate-pair count the in-bucket join
    emits, max_bucket the worst unsalted task, salt_fanout the bounded
    chunk count the salted two-stage path splits heavy buckets into.
    The run-before-you-join health check that decides whether the
    skew guard is needed at a new corpus scale. One gram explode + two
    bucket-keyed aggregates; O(bands) output rows."""
    from scikit_learn_imputer_spark.dedup.minhash import lsh_bucket_stats

    return lsh_bucket_stats(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_K,
        bands=_MINHASH_K // 4,
        shingle=5,
        hasher="md5",
        heavy_threshold=20,
    )


@register(
    "dsir_selection_drift",
    oracle=f"""
WITH {_dsir_ctes()},
scored AS (
  SELECT doc_id, source,
         CAST(round(sum_m / n_grams) AS BIGINT) AS s_micro
  FROM per
),
keyed AS (
  SELECT doc_id, source,
         CAST(round((s_micro / 1e6 + -ln(-ln(
             (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 0.5) / 4294967296.0))) * 1e6) AS BIGINT) AS key_micro
  FROM scored
),
sel AS (SELECT doc_id FROM keyed ORDER BY key_micro DESC, doc_id LIMIT 100),
tots AS (SELECT CAST(count(*) AS DOUBLE) AS nr FROM scored)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs_raw,
       CAST(count(sel.doc_id) AS BIGINT) AS n_selected,
       round(count(*) / tots.nr, 6) AS raw_share,
       round(count(sel.doc_id) / 100.0, 6) AS sel_share,
       round(count(sel.doc_id) / 100.0 - count(*) / tots.nr, 6) AS drift
FROM scored s LEFT JOIN sel USING (doc_id) CROSS JOIN tots
GROUP BY s.source, tots.nr
""",
)
def q_dsir_selection_drift(spark, sf_dir):
    """Selection-bias audit for DSIR resampling: per source, the raw
    corpus share vs the share of the k=100 Gumbel-top-k selection —
    the number a curation run reports to show HOW the target-domain
    filter re-weighted the mixture (sources resembling src0 drift
    positive, the rest negative; drifts sum to ~0). Same scoring
    dataflow as dsir_importance_weights plus a broadcast 100-row
    semi-join and a 1-row total broadcast — nothing corpus-sized
    beyond the scoring passes. The per-doc score frame (one narrow
    row per doc — bounded) feeds THREE branches (top-k, raw shares,
    selected shares); lazily each branch re-ran the dist fit + gram
    explode, so it is materialized eagerly and the corpus is gram-
    exploded exactly twice (fit + score) instead of six times."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_scores,
        gumbel_topk,
    )

    scored = dsir_scores(
        _t(spark, sf_dir, "documents"),
        target=F.col("source") == "src0",
        n_buckets=128,
    ).localCheckpoint(eager=True)
    sel = gumbel_topk(scored, k=100).select("doc_id")
    raw = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_raw")
    )
    selc = (
        scored.join(F.broadcast(sel), "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_selected"))
    )
    tot = raw.agg(F.sum("n_docs_raw").cast("double").alias("__nr"))
    out = (
        raw.join(selc, "source", "left")
        .withColumn("n_selected", F.coalesce("n_selected", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(tot))
    )
    raw_share = F.col("n_docs_raw") / F.col("__nr")
    sel_share = F.col("n_selected") / F.lit(100.0)
    return out.select(
        "source",
        "n_docs_raw",
        "n_selected",
        F.round(raw_share, 6).alias("raw_share"),
        F.round(sel_share, 6).alias("sel_share"),
        F.round(sel_share - raw_share, 6).alias("drift"),
    )


@register(
    "dsir_scores_persisted",
    oracle=ORACLE["dsir_importance_weights"],
)
def q_dsir_scores_persisted(spark, sf_dir):
    """The DSIR production shape: FIT the per-bucket log-ratio dist
    once, PERSIST it (an O(n_buckets)-row parquet artifact), reload
    through the validating loader, and score the corpus from the
    stored model (functions/dsir.py:dsir_dist/save/load/
    dsir_scores_with_dist). Shares dsir_importance_weights' oracle —
    equality through the save/load round trip is what's hash-checked.
    At scale this is how DSIR runs: the dist ships to every scoring
    pass (batch or per micro-batch) as a broadcast table; the corpus
    is only ever touched by map-side explodes."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_dist,
        dsir_scores_with_dist,
        load_dsir_dist,
        save_dsir_dist,
    )

    d = _t(spark, sf_dir, "documents")
    path = _scratch("dsir_dist") + "/dist"
    fitted = dsir_dist(d, target=F.col("source") == "src0", n_buckets=128)
    save_dsir_dist(fitted, path)
    return dsir_scores_with_dist(d, load_dsir_dist(spark, path))


@register(
    "stream_dsir_scores",
    oracle=ORACLE["dsir_importance_weights"],
)
def q_stream_dsir_scores(spark, sf_dir):
    """STREAMING DSIR scoring, driver-visible
    (functions/dsir.py:stream_dsir_score_ingest): the dist is fitted
    offline and persisted, the corpus is drained through a foreachBatch
    scorer (map-only per batch, exactly-once batch_id-keyed sink), and
    the landed scores are read back — hash-checked against the SAME
    oracle as the inline batch query, so batch == stream is what the
    driver verifies."""
    from scikit_learn_imputer_spark.functions.dsir import (
        dsir_dist,
        save_dsir_dist,
        stream_dsir_score_ingest,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dist_path = _scratch("dsir_sdist") + "/dist"
    out = _scratch("dsir_sscores") + "/scores"
    ck = _scratch("dsir_sck")
    save_dsir_dist(
        dsir_dist(docs, target=F.col("source") == "src0", n_buckets=128),
        dist_path,
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(*docs.columns)
    )
    q = stream_dsir_score_ingest(stream, dist_path, out, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).select(
        "doc_id", "source", "n_grams", "score"
    )


@register(
    "doremi_domain_weights",
    oracle=r"""
WITH bg AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, greatest(length(lower(text)) - 1, 0)),
                               i -> substr(lower(text), CAST(i AS INT), 2))) AS bigram
  FROM documents
),
counts AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
prefix AS (SELECT substr(bigram, 1, 1) AS prefix, sum(c) AS pc
           FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT substr(bigram, 2, 1)) AS v FROM counts),
terms AS (
  SELECT b.doc_id, b.source,
         CAST(round(ln((c.c + 1)::DOUBLE / (p.pc + vocab.v)::DOUBLE) * 1e6)
              AS BIGINT) AS m
  FROM bg b
  JOIN counts c USING (bigram)
  JOIN prefix p ON p.prefix = substr(b.bigram, 1, 1)
  CROSS JOIN vocab
),
per_src AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(m) AS BIGINT) AS s
  FROM terms GROUP BY source
),
z AS (SELECT CAST(sum(n_bigrams) AS DOUBLE) AS n_all,
             CAST(sum(s) AS DOUBLE) AS s_all FROM per_src),
calc AS (
  SELECT source, n_docs, n_bigrams,
         n_bigrams::DOUBLE / z.n_all AS share,
         greatest(CAST(round(-(s::DOUBLE) / n_bigrams) AS BIGINT)
                  - CAST(round(-z.s_all / z.n_all) AS BIGINT),
                  0) AS excess_micro
  FROM per_src, z
),
boosted AS (
  SELECT source, n_docs, n_bigrams, share, excess_micro,
         share * CAST(round(exp(excess_micro / 1e6) * 1e6) AS BIGINT)
           AS raw
  FROM calc
),
norm AS (SELECT sum(raw) AS z_raw FROM boosted)
SELECT source, n_docs, n_bigrams,
       round(share, 6) AS bigram_share,
       round(excess_micro / 1e6, 6) AS excess_nll,
       round(raw / norm.z_raw, 6) AS weight
FROM boosted, norm
ORDER BY source
""",
)
def q_doremi_domain_weights(spark, sf_dir):
    """DoReMi-style domain reweighting (functions/dsir.py:
    doremi_domain_weights — Xie et al. 2023, one exponentiated-gradient
    step from the bigram-mass baseline mixture, boosting domains whose
    corpus-LM mean NLL exceeds the corpus-wide mean). Completes the
    mixture family: dsir_* picks DOCUMENTS for a target,
    doremi_domain_weights re-weights DOMAINS by difficulty,
    mixture_epoch_plan turns weights into the epoch table a trainer
    consumes. One corpus LM pass; everything after is O(#domains) with
    two 1-row broadcast normalizer frames."""
    from scikit_learn_imputer_spark.functions.dsir import (
        doremi_domain_weights,
    )

    d = _t(spark, sf_dir, "documents")
    return doremi_domain_weights(d).orderBy("source")


_SCALE_FRACS = (0.1, 0.25, 0.5, 1.0)


@register(
    "scaling_law_subsets",
    oracle=f"""
WITH u AS (
  SELECT source,
         CAST(('0x' || substr(md5('scale:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         CAST(({_NTOK_SQL}) AS BIGINT) AS n
  FROM documents
),
grid AS (
  SELECT s.source, f.frac
  FROM (SELECT DISTINCT source FROM u) s
  CROSS JOIN (VALUES (0.1), (0.25), (0.5), (1.0)) f(frac)
),
per AS (
  SELECT g.frac, g.source,
         CAST(count(u.source) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(u.n), 0) AS BIGINT) AS n_tokens
  FROM grid g LEFT JOIN u ON u.source = g.source AND u.u < g.frac
  GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS full_tokens FROM u GROUP BY source)
SELECT CAST(per.frac AS DOUBLE) AS frac, per.source, per.n_docs, per.n_tokens,
       round(per.n_tokens::DOUBLE / tot.full_tokens, 6) AS token_frac
FROM per JOIN tot USING (source)
ORDER BY frac, source
""",
)
def q_scaling_law_subsets(spark, sf_dir):
    """Nested scaling-law subset manifests: deterministic 10/25/50/100%
    corpus subsets keyed on one salted md5 uniform per document, so the
    subsets are NESTED by construction (u < 0.1 ⊆ u < 0.25 ⊆ …) — the
    property a scaling-law sweep needs (each bigger run trains on a
    strict superset, Kaplan/Chinchilla-style) and rand()-per-run
    sampling cannot give. Per (fraction, source): docs, token mass, and
    the achieved fraction of the source's full token mass (sampling is
    doc-level uniform, so token_frac ≈ frac only when length is
    independent of the draw — the report shows the designer exactly how
    far off each slice is). One map-only pass + one O(#sources)
    conditional aggregate: no per-fraction scans, no range join, the
    corpus never shuffles."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    u = uniform_hash_col(F.concat(F.lit("scale:"), F.col("doc_id")))
    base = d.select("source", u.alias("__u"), n.alias("__n"))
    aggs = []
    for i, f in enumerate(_SCALE_FRACS):
        hit = F.col("__u") < F.lit(f)
        aggs += [
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(f"__d{i}"),
            F.sum(F.when(hit, F.col("__n")).otherwise(0))
            .cast("bigint")
            .alias(f"__t{i}"),
        ]
    per_src = base.groupBy("source").agg(
        *aggs, F.sum("__n").cast("bigint").alias("__full")
    )
    stack = ", ".join(
        f"CAST({f} AS DOUBLE), __d{i}, __t{i}"
        for i, f in enumerate(_SCALE_FRACS)
    )
    return (
        per_src.select(
            "source",
            "__full",
            F.expr(
                f"stack({len(_SCALE_FRACS)}, {stack}) AS (frac, n_docs, n_tokens)"
            ),
        )
        .select(
            "frac",
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("__full"), 6
            ).alias("token_frac"),
        )
        .orderBy("frac", "source")
    )


def _holdout_leaked(base):
    """Heldout docs sharing ANY word 5-gram digest with ANY train doc,
    given a (doc_id, split, ..., text) frame: grams collapse to md5
    digests, the corpus-sized train-gram side drives a digest-keyed
    shuffle semi-join (never a broadcast). Shared by
    split_leakage_audit (rates) and eval_set_manifest (exclusion)."""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    grams = base.select(
        "doc_id",
        "split",
        F.explode(word_ngrams_col(F.col("text"), 5)).alias("g"),
    ).select("doc_id", "split", F.md5("g").alias("g"))
    train_g = grams.filter(F.col("split") == "train").select("g").distinct()
    return (
        grams.filter(F.col("split") != "train")
        .join(train_g, on="g", how="leftsemi")
        .select("doc_id", "split")
        .distinct()
    )


@register(
    "split_leakage_audit",
    oracle=r"""
WITH u AS (
  SELECT doc_id, text,
         CASE WHEN h < 0.98 THEN 'train' WHEN h < 0.99 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, text,
           CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                AS DOUBLE) / 4294967296.0 AS h
    FROM documents
  )
),
grams AS (
  SELECT doc_id, split,
         unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
           i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                    || w[i+3] || ' ' || w[i+4]))) AS g
  FROM (SELECT doc_id, split, str_split_regex(trim(text), '\s+') AS w
        FROM u)
),
train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
leaked AS (
  SELECT DISTINCT doc_id, split FROM grams
  WHERE split <> 'train' AND g IN (SELECT g FROM train_g)
),
ev AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs
       FROM u WHERE split <> 'train' GROUP BY split),
lk AS (SELECT split, CAST(count(*) AS BIGINT) AS n_leaked
       FROM leaked GROUP BY split)
SELECT ev.split, ev.n_docs,
       CAST(COALESCE(lk.n_leaked, 0) AS BIGINT) AS n_leaked,
       round(CAST(COALESCE(lk.n_leaked, 0) AS DOUBLE) / ev.n_docs, 6)
         AS leak_rate
FROM ev LEFT JOIN lk USING (split)
ORDER BY split
""",
)
def q_split_leakage_audit(spark, sf_dir):
    """Eval-hygiene audit of the holdout split itself: how many val /
    test documents share ANY word 5-gram with ANY train document —
    decontamination turned inward (decontaminate_* scrubs against an
    EXTERNAL benchmark; this measures train→heldout leakage of the
    split corpus_holdout_split fixes, same salt, so it audits exactly
    that assignment). High leak_rate means heldout perplexity is
    memorization, not generalization. Scale shape: grams collapse to
    md5 digests immediately (text never shuffles), the train-gram side
    is corpus-sized so the overlap is a digest-keyed shuffle semi-join
    (NOT a broadcast — 100-TB train grams don't fit), then two
    O(#splits) aggregates."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = _t(spark, sf_dir, "documents")
    h = uniform_hash_col(F.concat(F.lit("holdout:"), F.col("doc_id")))
    split = (
        F.when(h < 0.98, "train").when(h < 0.99, "val").otherwise("test")
    )
    base = d.select(
        F.col("doc_id"), split.alias("split"), "source", "text"
    )
    leaked = _holdout_leaked(base)
    ev = (
        base.filter(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    lk = leaked.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaked")
    )
    return (
        ev.join(lk, on="split", how="left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_leaked"), F.lit(0))
            .cast("bigint")
            .alias("n_leaked"),
            F.round(
                F.coalesce(F.col("n_leaked"), F.lit(0)).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("leak_rate"),
        )
        .orderBy("split")
    )


@register(
    "doremi_epoch_plan",
    oracle=f"""
WITH dw AS ({{doremi}}),
t AS (
  SELECT source,
         CAST(sum(CAST(({_NTOK_SQL}) AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT t.source, t.n_tokens,
         CAST(round(dw.weight * 1e6) AS BIGINT) AS w_micro
  FROM t JOIN dw USING (source)
),
z AS (SELECT CAST(sum(w_micro) AS DOUBLE) AS zw,
             CAST(sum(n_tokens) AS DOUBLE) AS budget FROM w)
SELECT source, n_tokens,
       round(w_micro / zw, 9) AS weight,
       CAST(round(budget * w_micro / zw) AS BIGINT) AS target_tokens,
       round(budget * w_micro / zw / n_tokens, 6) AS epochs,
       round(least(budget * w_micro / zw / n_tokens, 4.0), 6) AS capped_epochs,
       CAST(round(least(budget * w_micro / zw / n_tokens, 4.0) * n_tokens)
            AS BIGINT) AS achieved_tokens
FROM w, z
ORDER BY source
""",
)
def q_doremi_epoch_plan(spark, sf_dir):
    """The mixture loop CLOSED: mixture_epoch_plan's upsampling table
    driven by the DoReMi weights instead of arbitrary per-source
    indices — difficulty-aware epoch planning (harder-than-average
    domains get more epochs, under the same 4-epoch cap). The learned
    weight re-enters as its round-6 integer micro-form (round(w*1e6))
    so both engines renormalize the identical integers. Cost: the one
    doremi LM pass + two O(#sources) joins + a 1-row budget
    broadcast."""
    from scikit_learn_imputer_spark.functions.dsir import (
        doremi_domain_weights,
    )

    d = _t(spark, sf_dir, "documents")
    t0 = F.trim(F.col("text"))
    n = (
        F.when(F.length(t0) == 0, F.lit(0))
        .otherwise(F.size(F.split(t0, "\\s+")))
        .cast("bigint")
    )
    t = (
        d.select("source", n.alias("__n"))
        .groupBy("source")
        .agg(F.sum("__n").cast("bigint").alias("n_tokens"))
    )
    dw = doremi_domain_weights(d).select(
        "source",
        F.round(F.col("weight") * 1e6).cast("bigint").alias("__w_micro"),
    )
    w = t.join(F.broadcast(dw), on="source")
    z = w.agg(
        F.sum("__w_micro").cast("double").alias("__zw"),
        F.sum("n_tokens").cast("double").alias("__budget"),
    )
    target = F.col("__budget") * F.col("__w_micro") / F.col("__zw")
    epochs = target / F.col("n_tokens")
    capped = F.least(epochs, F.lit(4.0))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("__w_micro") / F.col("__zw"), 9).alias("weight"),
            F.round(target).cast("bigint").alias("target_tokens"),
            F.round(epochs, 6).alias("epochs"),
            F.round(capped, 6).alias("capped_epochs"),
            F.round(capped * F.col("n_tokens")).cast("bigint").alias(
                "achieved_tokens"
            ),
        )
        .orderBy("source")
    )


ORACLE["doremi_epoch_plan"] = ORACLE["doremi_epoch_plan"].replace(
    "{doremi}", ORACLE["doremi_domain_weights"]
)


@register(
    "dedup_method_agreement",
    oracle=f"""
WITH lex AS ({{lex}}),
sem AS ({{sem}}),
u AS (
  SELECT id_a, id_b, max(l) AS l, max(s) AS s FROM (
    SELECT id_a, id_b, 1 AS l, 0 AS s FROM lex
    UNION ALL
    SELECT id_a, id_b, 0 AS l, 1 AS s FROM sem
  ) GROUP BY 1, 2
)
SELECT CAST(sum(l) AS BIGINT) AS n_lexical,
       CAST(sum(s) AS BIGINT) AS n_semantic,
       CAST(sum(l * s) AS BIGINT) AS n_both,
       CAST(sum(l) - sum(l * s) AS BIGINT) AS n_lexical_only,
       CAST(sum(s) - sum(l * s) AS BIGINT) AS n_semantic_only,
       round(sum(l * s)::DOUBLE
             / NULLIF(sum(l) + sum(s) - sum(l * s), 0), 6) AS pair_jaccard
FROM u
""",
)
def q_dedup_method_agreement(spark, sf_dir):
    """Cross-family dedup audit: do LEXICAL near-dup (char-3-gram
    Jaccard >= 0.82 over text) and SEMANTIC near-dup (embedding cosine
    >= 0.42; embeddings row-aligned with documents, vec_id == doc_id)
    nominate the same pairs? Reports both pair counts, the overlap, and
    the pair-set Jaccard — the calibration artifact that tells a
    pipeline designer whether running both stages buys coverage or
    burns compute twice. Uses each family's ORACLED exact baseline (the
    banded/clustered paths are their scale stories); the summary is a
    flag-union + one aggregate, no outer join."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        embedding_near_pairs,
    )
    from scikit_learn_imputer_spark.dedup.ngram import ngram_jaccard_pairs

    lex = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.82
    ).select("id_a", "id_b", F.lit(1).alias("l"), F.lit(0).alias("s"))
    sem = embedding_near_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42
    ).select("id_a", "id_b", F.lit(0).alias("l"), F.lit(1).alias("s"))
    u = (
        lex.unionAll(sem)
        .groupBy("id_a", "id_b")
        .agg(F.max("l").alias("l"), F.max("s").alias("s"))
    )
    denom = F.sum("l") + F.sum("s") - F.sum(F.col("l") * F.col("s"))
    return u.agg(
        F.sum("l").cast("bigint").alias("n_lexical"),
        F.sum("s").cast("bigint").alias("n_semantic"),
        F.sum(F.col("l") * F.col("s")).cast("bigint").alias("n_both"),
        (F.sum("l") - F.sum(F.col("l") * F.col("s")))
        .cast("bigint")
        .alias("n_lexical_only"),
        (F.sum("s") - F.sum(F.col("l") * F.col("s")))
        .cast("bigint")
        .alias("n_semantic_only"),
        F.round(
            F.sum(F.col("l") * F.col("s")).cast("double")
            / F.when(denom > 0, denom.cast("double")),
            6,
        ).alias("pair_jaccard"),
    )


ORACLE["dedup_method_agreement"] = (
    ORACLE["dedup_method_agreement"]
    .replace("{lex}", ORACLE["ngram_jaccard_pairs"])
    .replace("{sem}", ORACLE["embedding_near_pairs"])
)


@register(
    "heavy_hitter_grams",
    oracle=r"""
WITH g AS (
  SELECT source,
         unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
  FROM (SELECT source, str_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE length(trim(text)) > 0)
),
c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS n
      FROM g GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY source),
r AS (
  SELECT source, gram, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, gram) AS rank
  FROM c
)
SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.gram, r.n,
       round(r.n::DOUBLE / tot.total, 6) AS share
FROM r JOIN tot USING (source)
WHERE r.rank <= 5
ORDER BY source, rank
""",
)
def q_heavy_hitter_grams(spark, sf_dir):
    """Per-source heavy-hitter word 3-grams: top-5 by occurrence count
    with their share of the source's gram mass — the "WHICH source is
    template spam" drill-down to ngram_novelty_curve's corpus-wide
    duplicate-mass number (a high top-5 share means boilerplate;
    remove_boilerplate is the scrubber). Text collapses to (source,
    gram) counts map-side before any shuffle; the rank window runs on
    the AGGREGATED count frame (distinct grams, not occurrences),
    partitioned by source."""
    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    d = _t(spark, sf_dir, "documents")
    g = (
        d.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "source",
            F.explode(word_ngrams_col(F.col("text"), 3)).alias("gram"),
        )
    )
    c = g.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("source").agg(F.sum("n").cast("bigint").alias("total"))
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("gram")
    )
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .join(F.broadcast(tot), on="source")
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            "gram",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("source", "rank")
    )


@register(
    "eval_set_manifest",
    oracle=r"""
WITH u AS (
  SELECT doc_id, source, text,
         CASE WHEN h < 0.98 THEN 'train' WHEN h < 0.99 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, source, text,
           CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                AS DOUBLE) / 4294967296.0 AS h
    FROM documents
  )
),
grams AS (
  SELECT doc_id, split,
         unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
           i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                    || w[i+3] || ' ' || w[i+4]))) AS g
  FROM (SELECT doc_id, split, str_split_regex(trim(text), '\s+') AS w
        FROM u)
),
train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
leaked AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split <> 'train' AND g IN (SELECT g FROM train_g)
),
pool AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('eval:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u2
  FROM u
  WHERE split <> 'train' AND doc_id NOT IN (SELECT doc_id FROM leaked)
)
SELECT source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY u2, doc_id)
            AS INTEGER) AS rank,
       doc_id
FROM pool
QUALIFY rank <= 3
ORDER BY source, rank
""",
)
def q_eval_set_manifest(spark, sf_dir):
    """Decontaminated-by-construction eval set: from the heldout pool
    (the corpus_holdout_split val+test assignment, same salt), EXCLUDE
    every doc sharing any word 5-gram with train (the split_leakage
    semi-join), then pick up to 3 docs per source by a second salted
    md5 uniform — a deterministic, stratified, leakage-free eval
    manifest any engine reproduces bit-for-bit. The rank window runs on
    the tiny post-exclusion pool (heldout fraction of the corpus),
    never corpus-sized."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = _t(spark, sf_dir, "documents")
    h = uniform_hash_col(F.concat(F.lit("holdout:"), F.col("doc_id")))
    split = (
        F.when(h < 0.98, "train").when(h < 0.99, "val").otherwise("test")
    )
    base = d.select(
        F.col("doc_id"), split.alias("split"), "source", "text"
    )
    leaked = _holdout_leaked(base).select("doc_id")
    u2 = uniform_hash_col(F.concat(F.lit("eval:"), F.col("doc_id")))
    pool = (
        base.filter(F.col("split") != "train")
        .join(leaked, on="doc_id", how="left_anti")
        .select("doc_id", "source", u2.alias("__u2"))
    )
    w = Window.partitionBy("source").orderBy(F.col("__u2"), F.col("doc_id"))
    return (
        pool.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("source", "rank", "doc_id")
        .orderBy("source", "rank")
    )


_CORR_SIGS = ("tok", "lm", "q", "dup")


def _corr_pairs():
    return [
        (a, b)
        for i, a in enumerate(_CORR_SIGS)
        for b in _CORR_SIGS[i + 1 :]
    ]


def _corr_sql_formula(a: str, b: str) -> str:
    """Pearson r from exact integer sums, evaluated in the SAME double
    expression tree on both engines (no accumulation-order term)."""
    return (
        f"(CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / sqrt((CAST(n AS DOUBLE) * CAST(p_{a}_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * (CAST(n AS DOUBLE) * CAST(p_{b}_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
    )


@register(
    "quality_signal_corr",
    oracle=f"""
WITH lm AS ({{lm}}),
sig AS (
  SELECT doc_id,
         CAST(({_NTOK_SQL}) AS BIGINT) AS tok,
         CAST(round(({_QSCORE_SQL}) * 1e6) AS BIGINT) AS q,
         CAST(round((CASE WHEN len(tg) <= 0 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
          END) * 1e6) AS BIGINT) AS dup
  FROM (
    SELECT doc_id, text,
           list_transform(range(1, greatest(len(words) - 1, 1)),
             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS tg
    FROM (SELECT doc_id, text,
                 str_split_regex(trim(text), '\\s+') AS words
          FROM documents)
  )
),
j AS (SELECT sig.tok, sig.q, sig.dup,
             CAST(round(lm.lm_score * 1e6) AS BIGINT) AS lm
      FROM lm JOIN sig USING (doc_id)),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {", ".join(f"CAST(sum({a}) AS BIGINT) AS s_{a}" for a in _CORR_SIGS)},
         {", ".join(f"CAST(sum({a} * {b}) AS BIGINT) AS p_{a}_{b}" for a in _CORR_SIGS for b in _CORR_SIGS if _CORR_SIGS.index(a) <= _CORR_SIGS.index(b))}
  FROM j
)
SELECT {", ".join(f"round({_corr_sql_formula(a, b)}, 6) AS corr_{a}_{b}" for a, b in _corr_pairs())}
FROM m
""",
)
def q_quality_signal_corr(spark, sf_dir):
    """Quality-signal redundancy matrix: pairwise Pearson correlation
    between the four cheap per-doc signals every gate in this repo
    filters on — whitespace token count, corpus-LM mean log-prob,
    composite quality score, duplicate-trigram ratio. The calibration
    artifact behind filter DESIGN: two signals correlating near 1 mean
    the second gate mostly re-rejects the first gate's rejects; near-0
    means it buys real coverage.

    Engine-exactness: F.corr/corr() accumulate co-moments in
    partition-order-dependent doubles — at 1e-16 noise a round-6 value
    sitting on a boundary flips between engines (observed at smoke SF).
    So signals are snapped to integer MICRO-units, the aggregate
    computes EXACT integer sums (n, Σx, Σxy — bounded: |lm_micro| ≤
    ~4e6, so Σx² fits int64 below ~5e5 docs per gate run), and Pearson
    r is evaluated from those integers in the identical double
    expression tree on both engines. All four signals come out of ONE
    map pass (LM scoring is a projection against the broadcast count
    table; carry_cols threads the rest through), then a single
    15-sum aggregate — no joins, nothing corpus-sized shuffles. Docs
    too short to LM-score (< 2 chars) are excluded from every pair,
    same as the oracle's join."""
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores
    from scikit_learn_imputer_spark.functions.skew import fan_out
    from scikit_learn_imputer_spark.functions.text import (
        dup_trigram_ratio_col,
        quality_score_col,
        token_count_col,
    )

    d = _t(spark, sf_dir, "documents")
    # Parallelism floor BEFORE the heavy per-doc columns (r15): the
    # scorer's internal fan_out repartitions its INPUT, so columns
    # computed here would otherwise run pre-exchange on the scan's one
    # partition — a single core for the trigram/quality batteries.
    pre = fan_out(d.select("doc_id", "text")).select(
        "doc_id",
        "text",
        token_count_col(F.col("text")).cast("bigint").alias("__tok"),
        F.round(quality_score_col(F.col("text")) * 1e6)
        .cast("bigint")
        .alias("__q"),
        F.round(dup_trigram_ratio_col(F.col("text")) * 1e6)
        .cast("bigint")
        .alias("__dup"),
    )
    scored = bigram_lm_scores(
        pre, carry_cols=("__tok", "__q", "__dup")
    ).select(
        F.col("__tok").alias("tok"),
        F.round(F.col("lm_score") * 1e6).cast("bigint").alias("lm"),
        F.col("__q").alias("q"),
        F.col("__dup").alias("dup"),
    )
    sums = [F.count(F.lit(1)).cast("bigint").alias("n")]
    sums += [
        F.sum(a).cast("bigint").alias(f"s_{a}") for a in _CORR_SIGS
    ]
    seen = set()
    for a in _CORR_SIGS:
        for b in _CORR_SIGS:
            key = tuple(sorted((a, b)))
            if key in seen:
                continue
            seen.add(key)
            sums.append(
                F.sum(F.col(a) * F.col(b))
                .cast("bigint")
                .alias(f"p_{min(a,b, key=_CORR_SIGS.index)}_{max(a,b, key=_CORR_SIGS.index)}")
            )
    m = scored.agg(*sums)
    return m.select(
        *[
            F.round(F.expr(_corr_sql_formula(a, b)), 6).alias(
                f"corr_{a}_{b}"
            )
            for a, b in _corr_pairs()
        ]
    )


ORACLE["quality_signal_corr"] = ORACLE["quality_signal_corr"].replace(
    "{lm}", ORACLE["bigram_lm_quality"]
)


@register(
    "mixture_interleave",
    oracle=r"""
WITH u AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('interleave:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         CAST(substr(source, 4) AS INT) + 1 AS w
  FROM documents
),
r AS (
  SELECT doc_id, source, w,
         row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS r
  FROM u
),
v AS (SELECT doc_id, source, (r - 0.5) / w AS v FROM r),
h AS (SELECT * FROM v ORDER BY v, source, doc_id LIMIT 200)
SELECT CAST(row_number() OVER (ORDER BY v, source, doc_id) AS INTEGER)
         AS pos,
       source, doc_id, round(v, 9) AS vtime
FROM h
""",
)
def q_mixture_interleave(spark, sf_dir):
    """Deterministic weighted interleave order (stride scheduling, the
    deficit-round-robin a multi-source training loader follows): each
    source's docs get a reproducible md5-shuffled within-source rank r,
    a virtual time v = (r - 0.5) / weight (weights = the
    mixture_epoch_plan convention, source index + 1), and the global
    data order is ascending v — so any prefix of the stream realizes
    each source at its target rate (the interleave property epoch-level
    plans can't give). Returns the first 200 positions. Scale shape:
    the rank window shuffles (id, hash) pairs partitioned by source
    (never text), the global order is TakeOrdered top-k (O(k) per
    partition, no global sort); the final pos window runs on the
    200-row head only."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    d = _t(spark, sf_dir, "documents")
    u = uniform_hash_col(F.concat(F.lit("interleave:"), F.col("doc_id")))
    w_raw = (F.substring("source", 4, 10).cast("int") + 1).cast("double")
    base = d.select("doc_id", "source", u.alias("__u"), w_raw.alias("__w"))
    rw = Window.partitionBy("source").orderBy("__u", "doc_id")
    v = (
        base.withColumn("__r", F.row_number().over(rw))
        .select(
            "doc_id",
            "source",
            ((F.col("__r") - 0.5) / F.col("__w")).alias("__v"),
        )
    )
    head = v.orderBy("__v", "source", "doc_id").limit(200)
    pw = Window.orderBy("__v", "source", "doc_id")
    return head.select(
        F.row_number().over(pw).cast("int").alias("pos"),
        "source",
        "doc_id",
        F.round(F.col("__v"), 9).alias("vtime"),
    )


@register(
    "training_epoch_ledger",
    oracle=f"""
WITH t AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(({_NTOK_SQL}) AS BIGINT)) AS BIGINT) AS n_tokens,
         CAST(substr(source, 4) AS INT) + 1 AS w_raw
  FROM documents GROUP BY source
),
z AS (SELECT CAST(sum(w_raw) AS DOUBLE) AS zw,
             CAST(sum(n_tokens) AS DOUBLE) AS budget FROM t),
p AS (
  SELECT source, n_docs, n_tokens,
         least(z.budget * w_raw / z.zw / n_tokens, 4.0) AS capped
  FROM t, z
),
pp AS (
  SELECT source, n_docs, n_tokens,
         CAST(floor(capped) AS INT) AS full_e,
         capped - floor(capped) AS frac
  FROM p
),
u AS (
  SELECT source,
         CAST(('0x' || substr(md5('scale:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS u,
         CAST(({_NTOK_SQL}) AS BIGINT) AS n
  FROM documents
),
pm AS (
  SELECT pp.source,
         CAST(count(*) AS BIGINT) AS pd,
         CAST(COALESCE(sum(u.n), 0) AS BIGINT) AS pmass
  FROM u JOIN pp ON u.source = pp.source AND u.u < pp.frac
  GROUP BY 1
)
SELECT * FROM (
  SELECT pp.source, CAST(g.e AS INT) AS epoch, 'full' AS kind,
         pp.n_docs, pp.n_tokens AS planned_tokens
  FROM pp, UNNEST(generate_series(1, pp.full_e)) AS g(e)
  UNION ALL
  SELECT pp.source, CAST(pp.full_e + 1 AS INT) AS epoch, 'partial',
         CAST(COALESCE(pm.pd, 0) AS BIGINT),
         CAST(COALESCE(pm.pmass, 0) AS BIGINT)
  FROM pp LEFT JOIN pm USING (source)
  WHERE pp.frac > 0
)
ORDER BY source, epoch
""",
)
def q_training_epoch_ledger(spark, sf_dir):
    """The epoch plan made EXECUTABLE: mixture_epoch_plan's capped
    epoch counts expanded into one row per (source, epoch), where each
    FULL epoch is the whole source and the trailing PARTIAL epoch is a
    concrete deterministic doc subset — the same salted-uniform
    threshold as scaling_law_subsets (u('scale:'||doc_id) < frac), so
    the partial epoch is NESTED under the full source, reproducible
    everywhere, and its planned token mass is the subset's ACTUAL mass,
    not frac × total (doc-level sampling never hits the token target
    exactly; the ledger shows the realized number a trainer loads).
    Cost: one corpus map pass for the masses, one O(#sources) plan
    frame with a 1-row budget broadcast, a 20-row broadcast join for
    the partial threshold — epochs explode on the TINY plan frame, and
    sequence(1, 0) never fires (full_e >= 1 guard; Spark's descending
    sequence footgun)."""
    d = _t(spark, sf_dir, "documents")
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    t0 = F.trim(F.col("text"))
    n = (
        F.when(F.length(t0) == 0, F.lit(0))
        .otherwise(F.size(F.split(t0, "\\s+")))
        .cast("bigint")
    )
    u = uniform_hash_col(F.concat(F.lit("scale:"), F.col("doc_id")))
    base = d.select("source", n.alias("__n"), u.alias("__u"))
    # O(#sources) aggregate, materialized eagerly (optimization round
    # 14, guide §1.2/§5): it feeds z, the plan frame, fulls AND
    # partials — lazily each of those consumers re-ran the corpus
    # mass aggregate (the lazy plan held 7 document scans for the
    # docstring's promised one mass pass + one partial-subset pass).
    per_src = (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "__w", F.substring("source", 4, 10).cast("int") + F.lit(1)
        )
        .localCheckpoint(eager=True)
    )
    z = per_src.agg(
        F.sum("__w").cast("double").alias("__zw"),
        F.sum("n_tokens").cast("double").alias("__budget"),
    )
    capped = F.least(
        F.col("__budget") * F.col("__w") / F.col("__zw") / F.col("n_tokens"),
        F.lit(4.0),
    )
    plan = (
        per_src.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.floor(capped).cast("int").alias("__full_e"),
            (capped - F.floor(capped)).alias("__frac"),
        )
    )
    pm = (
        base.join(
            F.broadcast(plan.select("source", "__frac")), on="source"
        )
        .filter(F.col("__u") < F.col("__frac"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__pd"),
            F.sum("__n").cast("bigint").alias("__pmass"),
        )
    )
    fulls = plan.select(
        "source",
        F.explode(
            F.when(
                F.col("__full_e") >= 1,
                F.sequence(F.lit(1), F.col("__full_e")),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("epoch"),
        F.lit("full").alias("kind"),
        "n_docs",
        F.col("n_tokens").alias("planned_tokens"),
    )
    partials = (
        plan.filter(F.col("__frac") > 0)
        .join(pm, on="source", how="left")
        .select(
            "source",
            (F.col("__full_e") + 1).cast("int").alias("epoch"),
            F.lit("partial").alias("kind"),
            F.coalesce(F.col("__pd"), F.lit(0))
            .cast("bigint")
            .alias("n_docs"),
            F.coalesce(F.col("__pmass"), F.lit(0))
            .cast("bigint")
            .alias("planned_tokens"),
        )
    )
    return fulls.unionByName(partials).orderBy("source", "epoch")


def _pagerank_snapped_oracle(iters: int = 8, damping: float = 0.85) -> str:
    """Unrolled integer-micro power iteration (same technique as the
    bpe_learn_merges unrolled-CTE oracle): one CTE per round, exact
    BIGINT state, the identical floor-product-division contribution
    expression the Spark operator uses."""
    ctes = [
        f"pairs AS ({_NGRAM_PAIRS_SQL})",
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
        " UNION SELECT id_b, id_a FROM pairs)",
        "nodes AS (SELECT DISTINCT src AS id FROM edges)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg"
        " FROM edges GROUP BY 1)",
        "r0 AS (SELECT id, CAST(floor(1e6 / nn.n + 0.5) AS BIGINT) AS r"
        " FROM nodes, nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT nodes.id,
         CAST(floor({1.0 - damping} * 1e6 / nn.n + 0.5) AS BIGINT)
         + CAST(COALESCE(c.s, 0) AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS id,
           CAST(sum(CAST(floor({damping} * CAST(p.r AS DOUBLE) / d.deg)
                         AS BIGINT)) AS BIGINT) AS s
    FROM edges e
    JOIN r{i - 1} p ON p.id = e.src
    JOIN deg d ON d.id = e.src
    GROUP BY 1
  ) c ON c.id = nodes.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, CAST(r AS BIGINT) AS rank_micro"
        f" FROM r{iters} ORDER BY doc_id"
    )


@register("near_dup_pagerank_snapped", oracle=_pagerank_snapped_oracle())
def q_near_dup_pagerank_snapped(spark, sf_dir):
    """Engine-exact PageRank centrality over the near-dup graph
    (graph.py:pagerank_snapped): the ORACLED twin of near_dup_pagerank
    — integer micro-unit rank state makes all 8 power-iteration rounds
    exact BIGINT arithmetic on both engines, so the driver hash-checks
    the full iterative fixpoint (the production double-state pagerank
    stays rows-only-anchored, exactly like minhash_candidates next to
    its md5 twin). Same per-iteration cost shape: one equi join + one
    aggregate, hash-partitioned on vertex id."""
    from scikit_learn_imputer_spark.graph import pagerank_snapped

    pairs = QUERIES["ngram_jaccard_pairs"](spark, sf_dir).select(
        "id_a", "id_b"
    )
    edges = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    ranks = pagerank_snapped(edges, src="id_a", dst="id_b", iters=8)
    return ranks.select(
        F.col("id").alias("doc_id"), "rank_micro"
    ).orderBy("doc_id")


@register(
    "stream_mixture_monitor",
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(({_NTOK_SQL}) AS BIGINT)) AS BIGINT) AS n_tokens
FROM documents GROUP BY source ORDER BY source
""",
)
def q_stream_mixture_monitor(spark, sf_dir):
    """STREAMING mixture monitor, driver-visible
    (streaming/ingest.py:stream_mixture_monitor_ingest): the corpus is
    drained through a foreachBatch accountant that lands each batch's
    per-source (n_docs, n_tokens) delta exactly-once; the read-back sums
    the deltas into the cumulative realized mixture — hash-checked
    against the plain batch aggregate, so "monitor total == corpus
    truth" is what the driver verifies (the same batch==stream contract
    as stream_dsir_scores). Per batch: one map-side aggregate to
    O(#sources) rows; no cross-batch state."""
    from scikit_learn_imputer_spark.sources.tables import load_table
    from scikit_learn_imputer_spark.streaming.ingest import (
        stream_mixture_monitor_ingest,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = _scratch("mixmon") + "/deltas"
    ck = _scratch("mixmon_ck")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(*docs.columns)
    )
    q = stream_mixture_monitor_ingest(stream, out, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(out)
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source")
    )


@register(
    "decontam_method_agreement",
    oracle=f"""
WITH sw AS ({{word}}),
st AS ({{tok}}),
corpus AS (SELECT doc_id FROM documents WHERE doc_id % 100 >= 2),
u AS (
  SELECT doc_id,
         CASE WHEN doc_id NOT IN (SELECT doc_id FROM sw) THEN 1 ELSE 0
           END AS w,
         CASE WHEN doc_id NOT IN (SELECT doc_id FROM st) THEN 1 ELSE 0
           END AS t
  FROM corpus
)
SELECT CAST(count(*) AS BIGINT) AS n_corpus,
       CAST(sum(w) AS BIGINT) AS n_dropped_word,
       CAST(sum(t) AS BIGINT) AS n_dropped_token,
       CAST(sum(w * t) AS BIGINT) AS n_both,
       CAST(sum(w) - sum(w * t) AS BIGINT) AS n_word_only,
       CAST(sum(t) - sum(w * t) AS BIGINT) AS n_token_only,
       round(sum(w * t)::DOUBLE
             / NULLIF(sum(w) + sum(t) - sum(w * t), 0), 6)
         AS drop_jaccard
FROM u
""",
)
def q_decontam_method_agreement(spark, sf_dir):
    """Decontamination-net comparison, driver-checked: the WORD-space
    net (any shared word 5-gram with the eval set) versus the
    TOKEN-space net (any 16 consecutive shared tokenizer ids) on the
    same corpus/eval split — drop counts, overlap, and drop-set
    Jaccard. The token n was TUNED to sit at the word baseline's
    strictness (memory: id-16-gram ≈ word-5-gram on this corpus); this
    query pins that calibration as a hash-checked artifact instead of a
    docstring claim, and quantifies how DIFFERENT the two nets are
    (at sf0.01: word drops 1, token drops 4, overlap 1 — the token net
    catches fallback-heavy spans the word net misses; the
    each-misses-some direction is pinned doc-level by
    test_decontaminate_token_ngrams_vs_word_grams). Cost: the two
    existing decontamination plans + two doc-keyed join flags + one
    aggregate."""
    from scikit_learn_imputer_spark.dedup.exact import (
        decontaminate_ngram,
        decontaminate_token_ngrams,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    sw = decontaminate_ngram(corpus, bench, n=5).select("doc_id")
    st = decontaminate_token_ngrams(corpus, bench, n=16).select("doc_id")
    u = (
        corpus.select("doc_id")
        .join(sw.withColumn("__sw", F.lit(1)), on="doc_id", how="left")
        .join(st.withColumn("__st", F.lit(1)), on="doc_id", how="left")
        .select(
            F.when(F.col("__sw").isNull(), 1).otherwise(0).alias("w"),
            F.when(F.col("__st").isNull(), 1).otherwise(0).alias("t"),
        )
    )
    denom = F.sum("w") + F.sum("t") - F.sum(F.col("w") * F.col("t"))
    return u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus"),
        F.sum("w").cast("bigint").alias("n_dropped_word"),
        F.sum("t").cast("bigint").alias("n_dropped_token"),
        F.sum(F.col("w") * F.col("t")).cast("bigint").alias("n_both"),
        (F.sum("w") - F.sum(F.col("w") * F.col("t")))
        .cast("bigint")
        .alias("n_word_only"),
        (F.sum("t") - F.sum(F.col("w") * F.col("t")))
        .cast("bigint")
        .alias("n_token_only"),
        F.round(
            F.sum(F.col("w") * F.col("t")).cast("double")
            / F.when(denom > 0, denom.cast("double")),
            6,
        ).alias("drop_jaccard"),
    )


ORACLE["decontam_method_agreement"] = (
    ORACLE["decontam_method_agreement"]
    .replace("{word}", ORACLE["decontaminate_ngram_corpus"])
    .replace("{tok}", ORACLE["decontam_token_ngrams"])
)


@register(
    "near_dup_containment",
    oracle=r"""
WITH grams AS (
  SELECT DISTINCT doc_id,
         md5(g) AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                  || w[i+3] || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents)
  )
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS i
  FROM grams a JOIN grams b USING (g)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CASE WHEN sa.n <= sb.n THEN id_a ELSE id_b END AS contained_id,
       CASE WHEN sa.n <= sb.n THEN id_b ELSE id_a END AS container_id,
       least(sa.n, sb.n) AS n_contained,
       greatest(sa.n, sb.n) AS n_container,
       round(i::DOUBLE / least(sa.n, sb.n), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / least(sa.n, sb.n) >= 0.9
""",
)
def q_near_dup_containment(spark, sf_dir):
    """Asymmetric containment near-dup
    (dedup/ngram.py:ngram_containment_pairs): pairs where the smaller
    doc's word-5-gram set is ≥90% inside the other's — the
    quote-inclusion / partial-copy net symmetric Jaccard structurally
    misses (a short doc embedded in a long one has Jaccard ≈ 0 but
    containment 1). Word grams, not char grams: on this
    shared-vocabulary corpus char-3-gram containment is degenerate
    (1367 pairs vs 25 at sf0.01). Exact oracle config; the max_df
    stop-gram guard is the at-scale knob, same as the Jaccard
    family."""
    from scikit_learn_imputer_spark.dedup.ngram import (
        ngram_containment_pairs,
    )

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), n=5, threshold=0.9
    ).orderBy("contained_id", "container_id")


def _vocab_drift_oracle(k: int = 8) -> str:
    ctes_a, sels_a = _bpe_learn_parts(k, prefix="a_", where="doc_id % 2 = 0")
    ctes_b, sels_b = _bpe_learn_parts(k, prefix="b_")
    ma = "ma AS (" + "\nUNION ALL\n".join(sels_a) + ")"
    mb = "mb AS (" + "\nUNION ALL\n".join(sels_b) + ")"
    return (
        "WITH "
        + ",\n".join(ctes_a + ctes_b + [ma, mb])
        + f""",
flags AS (
  SELECT merged, max(a) AS a, max(b) AS b FROM (
    SELECT merged, 1 AS a, 0 AS b FROM ma
    UNION ALL SELECT merged, 0, 1 FROM mb
  ) GROUP BY merged
),
stats AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_merges_early,
         CAST(sum(b) AS BIGINT) AS n_merges_full,
         CAST(sum(a * b) AS BIGINT) AS n_shared,
         round(sum(a * b)::DOUBLE
               / NULLIF(sum(a) + sum(b) - sum(a * b), 0), 6)
           AS merge_jaccard
  FROM flags
),
fd AS (
  SELECT CAST(COALESCE(min(r), {k + 1}) AS INTEGER) AS first_divergence
  FROM (
    SELECT COALESCE(a.merge_rank, b.merge_rank) AS r
    FROM ma a FULL OUTER JOIN mb b USING (merge_rank)
    WHERE a.merged IS DISTINCT FROM b.merged
  )
)
SELECT n_merges_early, n_merges_full, n_shared, merge_jaccard,
       first_divergence
FROM stats, fd"""
    )


@register("vocab_drift", oracle=_vocab_drift_oracle(8))
def q_vocab_drift(spark, sf_dir):
    """Tokenizer stability across corpus growth: BPE merge tables
    learned on the EARLY snapshot (doc_id % 2 = 0 — half the ingest)
    versus the FULL corpus, compared as (a) merge-set overlap (count +
    Jaccard) and (b) the first merge rank where the ordered tables
    diverge (rank k+1 = identical through k) — the "can I keep my
    shipped tokenizer after this ingest?" audit. Both learns share
    learn_bpe_merges' distributed shape (one word-frequency shuffle
    each, then vocabulary-sized iterations); the comparison is
    flag-union + one aggregate over two 8-row merge tables. The oracle
    unrolls BOTH learn chains (prefixed CTE namespaces) and composes the
    same comparison — the whole two-snapshot artifact chain is
    hash-checked."""
    from concurrent.futures import ThreadPoolExecutor

    from scikit_learn_imputer_spark.functions.bpe import learn_bpe_merges

    d = _t(spark, sf_dir, "documents")
    k = 8
    # The two learns are INDEPENDENT driver-loop job chains whose tiny
    # vocabulary-sized iterations leave most executors idle; submitting
    # both from a thread pool overlaps the 2x8 iteration jobs
    # (guide §2.6 back-fill) without touching either learn's sequential
    # semantics — each table is bit-identical to its sequential run.
    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            learn_bpe_merges, d.filter(F.col("doc_id") % 2 == 0), num_merges=k
        )
        fb = pool.submit(learn_bpe_merges, d, num_merges=k)
        ma, mb = fa.result(), fb.result()
    flags = (
        ma.select("merged", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionAll(mb.select("merged", F.lit(0).alias("a"), F.lit(1).alias("b")))
        .groupBy("merged")
        .agg(F.max("a").alias("a"), F.max("b").alias("b"))
    )
    denom = F.sum("a") + F.sum("b") - F.sum(F.col("a") * F.col("b"))
    stats = flags.agg(
        F.sum("a").cast("bigint").alias("n_merges_early"),
        F.sum("b").cast("bigint").alias("n_merges_full"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n_shared"),
        F.round(
            F.sum(F.col("a") * F.col("b")).cast("double")
            / F.when(denom > 0, denom.cast("double")),
            6,
        ).alias("merge_jaccard"),
    )
    fd = (
        ma.select(F.col("merge_rank").alias("r"), F.col("merged").alias("am"))
        .join(
            mb.select(
                F.col("merge_rank").alias("r"), F.col("merged").alias("bm")
            ),
            on="r",
            how="full",
        )
        .filter(~F.col("am").eqNullSafe(F.col("bm")))
        .agg(
            F.coalesce(F.min("r"), F.lit(k + 1))
            .cast("int")
            .alias("first_divergence")
        )
    )
    return stats.crossJoin(F.broadcast(fd))


@register(
    "gram_df_spectrum",
    oracle=r"""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(len(text) - 2, 0))) AS i
        FROM documents)
),
df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
       FROM grams GROUP BY gram),
b AS (
  -- bit-length bucketing, NOT floor(log2(df)): log of an exact power
  -- of 2 is a 1-ulp cross-engine coin flip under floor()
  SELECT CAST(length(bin(df)) - 1 AS INTEGER) AS bucket,
         df, df * (df - 1) / 2 AS pairs
  FROM df
),
agg AS (
  SELECT bucket,
         CAST(power(2, bucket) AS BIGINT) AS df_lo,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(df) AS BIGINT) AS total_df,
         CAST(sum(pairs) AS BIGINT) AS pair_work
  FROM b GROUP BY bucket
),
tot AS (SELECT CAST(sum(pair_work) AS DOUBLE) AS z FROM agg)
SELECT bucket, df_lo, n_grams, total_df, pair_work,
       round(pair_work / tot.z, 6) AS pair_work_share
FROM agg, tot
ORDER BY bucket
""",
)
def q_gram_df_spectrum(spark, sf_dir):
    """The max_df calibration artifact: char-3-gram document-frequency
    spectrum in power-of-2 buckets, with each bucket's share of the
    EXACT candidate-pair work (Σ df·(df−1)/2 — the row count the
    all-pairs gram join must stream). This is the run-before-you-join
    planning read that justifies the gram family's stop-gram guard: on
    the dense corpus the top df bucket carries essentially all pair
    work while holding few grams, so cutting at max_df trades almost no
    recall mass for orders-of-magnitude less join work (the documented
    bench override; lsh_bucket_skew is the banded-join sibling). One
    distinct-gram aggregate + one O(#buckets) aggregate + a 1-row total
    broadcast; document text collapses to grams map-side."""
    from scikit_learn_imputer_spark.dedup.ngram import char_ngrams

    d = _t(spark, sf_dir, "documents")
    df = char_ngrams(d, 3).groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    # bit-length bucketing (exact integer logic on both engines; a
    # float floor(log2) flips at exact powers of 2)
    b = df.select(
        (F.length(F.bin(F.col("df"))) - 1).cast("int").alias("bucket"),
        "df",
        (F.col("df") * (F.col("df") - 1) / 2).cast("bigint").alias("pairs"),
    )
    agg = b.groupBy("bucket").agg(
        F.pow(F.lit(2.0), F.col("bucket").cast("double"))
        .cast("bigint")
        .alias("df_lo"),
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("df").cast("bigint").alias("total_df"),
        F.sum("pairs").cast("bigint").alias("pair_work"),
    )
    tot = agg.agg(F.sum("pair_work").cast("double").alias("__z"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "df_lo",
            "n_grams",
            "total_df",
            "pair_work",
            F.round(F.col("pair_work") / F.col("__z"), 6).alias(
                "pair_work_share"
            ),
        )
        .orderBy("bucket")
    )


@register(
    "containment_survivors",
    oracle=f"""
WITH pairs AS ({{cont}}),
dropped AS (SELECT DISTINCT contained_id FROM pairs)
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT contained_id FROM dropped)
ORDER BY doc_id
""",
)
def q_containment_survivors(spark, sf_dir):
    """The containment net as a DEDUP ACTION: drop every document whose
    word-5-gram set is ≥90% contained in some other document (the
    embedded quote / partial copy keeps only its container — RefinedWeb
    treats these as boilerplate inclusions, not independent mass). A
    container that is itself contained elsewhere still drops: the
    survivor set is exactly the docs never ≥90%-covered by another —
    deterministic with no cluster resolution needed, because
    containment is directional. One anti-join on the pair frame's
    contained ids."""
    from scikit_learn_imputer_spark.dedup.ngram import (
        ngram_containment_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    dropped = ngram_containment_pairs(d, n=5, threshold=0.9).select(
        F.col("contained_id").alias("doc_id")
    ).distinct()
    return (
        d.join(dropped, on="doc_id", how="left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


ORACLE["containment_survivors"] = ORACLE["containment_survivors"].replace(
    "{cont}", ORACLE["near_dup_containment"]
)


@register(
    "takedown_certificate",
    oracle=r"""
WITH d AS (
  SELECT doc_id, text,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
           AS deleted
  FROM documents
),
del_fp AS (SELECT DISTINCT fp FROM d WHERE deleted),
ret_fp AS (SELECT DISTINCT fp FROM d WHERE NOT deleted),
purge AS (SELECT fp FROM del_fp WHERE fp NOT IN (SELECT fp FROM ret_fp)),
shared AS (SELECT fp FROM del_fp WHERE fp IN (SELECT fp FROM ret_fp)),
counts AS (
  SELECT CAST(count(DISTINCT fp) AS BIGINT) AS fp_all,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN deleted THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deleted
  FROM d
)
SELECT 'fingerprint' AS artifact,
       fp_all AS rows_before,
       fp_all - (SELECT CAST(count(*) AS BIGINT) FROM purge) AS rows_after,
       CAST(0 AS BIGINT) AS deleted_refs_after,
       (SELECT CAST(count(*) AS BIGINT) FROM shared) AS shared_kept
FROM counts
UNION ALL
SELECT 'signature',
       n_docs * 2,
       (n_docs - n_deleted) * 2,
       CAST(0 AS BIGINT),
       CAST(0 AS BIGINT)
FROM counts
ORDER BY artifact
""",
)
def q_takedown_certificate(spark, sf_dir):
    """Right-to-be-forgotten CERTIFICATE over the dedup stores: build
    both persisted stores on the full corpus, apply a seeded takedown
    (md5('takedown:'||id) first hex = '0', ~1/16 of docs) with
    delete_from_fingerprint_store / delete_from_signature_store
    (dedup/incremental.py — atomic compaction-sibling rewrites), then
    READ THE STORES BACK and report, per artifact: rows before
    (relational — the freshly-built stores hold exactly distinct-fp /
    n_docs×bands rows by construction) and after (from disk),
    the count of deleted docs' entries still present (the certified
    zero — counted from disk, predicted relationally by the oracle),
    and the shared-content fingerprints deliberately RETAINED (content
    a surviving doc still holds; purging those would let a new exact
    duplicate of live content slip in). Closes the takedown loop the
    round-8 deletion work opened: corpus (repack_after_delete), shards
    (tokenized_incremental_rewrite), offsets
    (adjust_offsets_after_delete), and now dedup HISTORY all propagate
    deletions — and the functional consequence (a purged doc
    re-submits successfully; a banned ghost would reject it) is pinned
    by test. bands=2 signature config keeps the certificate's store
    rows doc-countable."""
    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        build_signature_store,
        delete_from_fingerprint_store,
        delete_from_signature_store,
    )

    docs = _t(spark, sf_dir, "documents")
    deleted = docs.filter(
        F.md5(
            F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))
        ).substr(1, 1)
        == "0"
    )
    retained = docs.filter(
        F.md5(
            F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))
        ).substr(1, 1)
        != "0"
    )
    fpath = _scratch("tdc_fp")
    spath = _scratch("tdc_sig")
    build_fingerprint_store(docs, fpath)
    build_signature_store(
        docs, spath, num_hashes=_MINHASH_K, bands=2, shingle=5, hasher="md5"
    )
    delete_from_fingerprint_store(spark, fpath, deleted, retained)
    delete_from_signature_store(spark, spath, deleted)
    # The certificate itself is ONE lazy plan (registry contract: no
    # driver-side actions at build time; the store builds/deletes above
    # are the audited WRITES, not counts). BEFORE counts are relational
    # — the store contents at build time are exactly distinct-fp /
    # n_docs×bands by construction — while the AFTER side reads the
    # post-delete stores back from disk (the certified part). The four
    # metrics per artifact are independent aggregates unioned as
    # (artifact, metric, value) rows and pivoted: pure hash aggregates,
    # no 1-row scalar joins.
    fp_store_after = spark.read.parquet(fpath)
    sig_store_after = spark.read.parquet(spath)
    from scikit_learn_imputer_spark.functions.text import fingerprint_col

    del_fp = deleted.select(
        fingerprint_col(F.col("text")).alias("fingerprint")
    ).distinct()
    ret_fp = retained.select(
        fingerprint_col(F.col("text")).alias("fingerprint")
    ).distinct()
    purge = del_fp.join(ret_fp, on="fingerprint", how="left_anti")
    shared = del_fp.join(ret_fp, on="fingerprint", how="left_semi")

    def _metric(agg_df, artifact, metric):
        return agg_df.select(
            F.lit(artifact).alias("artifact"),
            F.lit(metric).alias("metric"),
            F.col("v").cast("bigint").alias("v"),
        )

    n = F.count(F.lit(1))
    parts = [
        _metric(
            docs.select(
                fingerprint_col(F.col("text")).alias("fingerprint")
            ).agg(F.countDistinct("fingerprint").alias("v")),
            "fingerprint",
            "rows_before",
        ),
        _metric(fp_store_after.agg(n.alias("v")), "fingerprint", "rows_after"),
        _metric(
            fp_store_after.join(purge, on="fingerprint", how="left_semi").agg(
                n.alias("v")
            ),
            "fingerprint",
            "deleted_refs_after",
        ),
        _metric(shared.agg(n.alias("v")), "fingerprint", "shared_kept"),
        _metric(docs.agg((n * 2).alias("v")), "signature", "rows_before"),
        _metric(sig_store_after.agg(n.alias("v")), "signature", "rows_after"),
        _metric(
            sig_store_after.join(
                deleted.select("doc_id"), on="doc_id", how="left_semi"
            ).agg(n.alias("v")),
            "signature",
            "deleted_refs_after",
        ),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    cols = ["rows_before", "rows_after", "deleted_refs_after", "shared_kept"]
    return (
        u.groupBy("artifact")
        .pivot("metric", cols)
        .agg(F.first("v"))
        .select(
            "artifact",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                for c in cols
            ],
        )
        .orderBy("artifact")
    )


@register(
    "shuffle_dispersion",
    oracle="""
WITH s AS ({shuf}),
adj AS (
  SELECT source AS sa, lag(source) OVER (ORDER BY position) AS sb FROM s
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adjacent,
         CAST(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same_source
  FROM adj WHERE sb IS NOT NULL
),
e AS (
  SELECT CAST(sum(n * (n - 1)) AS BIGINT) AS same_pairs,
         CAST(sum(n) AS BIGINT) AS n_sequences
  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM s GROUP BY source)
)
SELECT n_sequences, n_adjacent, n_same_source,
       round(CAST(n_same_source AS DOUBLE) / n_adjacent, 6) AS observed_rate,
       round(CAST(same_pairs AS DOUBLE)
             / (CAST(n_sequences AS DOUBLE) * (n_sequences - 1)), 6)
         AS expected_rate,
       round((CAST(n_same_source AS DOUBLE) / n_adjacent)
             / (CAST(same_pairs AS DOUBLE)
                / (CAST(n_sequences AS DOUBLE) * (n_sequences - 1))), 6)
         AS mixing_ratio
FROM a, e
""",
)
def q_shuffle_dispersion(spark, sf_dir):
    """Mixing-quality audit of the seeded shuffle
    (operators/shuffle.py:shuffle_dispersion): the rate of ADJACENT
    positions sharing a source vs the uniform-permutation expectation
    Σnᵢ(nᵢ−1)/(N(N−1)) — the ops check that the md5 permutation actually
    dispersed source runs before a trainer consumes them (mixing_ratio
    ≈ 1 = mixed; >> 1 = residual curriculum). Adjacency is an equi
    self-join on position+1 (no global-order window over data); all
    rates derive from exact integer counts in the identical double
    expression tree on both engines. One summary row."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffle_dispersion,
        shuffle_sequences,
    )

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return shuffle_dispersion(shuffle_sequences(packed, seed=42))


ORACLE["shuffle_dispersion"] = ORACLE["shuffle_dispersion"].replace(
    "{shuf}", ORACLE["shuffle_sequences"]
)


@register(
    "dataloader_assignment",
    oracle="""
WITH sh AS ({shards}),
per AS (
  SELECT CAST(shard_id % 4 AS BIGINT) AS worker_id,
         CAST(count(*) AS BIGINT) AS n_shards,
         CAST(sum(n_sequences) AS BIGINT) AS n_sequences,
         CAST(min(shard_id) AS BIGINT) AS first_shard,
         CAST(max(shard_id) AS BIGINT) AS last_shard
  FROM sh GROUP BY 1
)
SELECT worker_id, n_shards, n_sequences, first_shard, last_shard,
       round(CAST(n_sequences AS DOUBLE)
             / CAST(sum(n_sequences) OVER () AS DOUBLE), 6) AS seq_share
FROM per
""",
)
def q_dataloader_assignment(spark, sf_dir):
    """Data-parallel reader plan (operators/shuffle.py:
    dataloader_assignment): training shards striped round-robin onto 4
    loader ranks (worker_id = shard_id % 4, the standard DDP
    assignment), one row per rank with shard/sequence counts, shard-id
    range, and its share of the epoch — the imbalance a trainer pads or
    drops to. The per-shard manifest collapses to O(workers) rows; the
    share window ranks that tiny worker frame only."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        dataloader_assignment,
        shuffle_sequences,
    )

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return dataloader_assignment(
        shuffle_sequences(packed, seed=42), shard_size=16, num_workers=4
    )


ORACLE["dataloader_assignment"] = ORACLE["dataloader_assignment"].replace(
    "{shards}", ORACLE["training_shards"]
)


@register(
    "semantic_decontam",
    oracle="""
WITH s AS (
  SELECT vec_id, embedding,
         CAST(('0x' || substr(md5('holdout:' || CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
              AS DOUBLE) / 4294967296.0 AS h
  FROM embeddings
),
tr AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS na
  FROM s WHERE h < 0.98
),
ev AS (
  SELECT embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nb
  FROM s WHERE h >= 0.98
),
p AS (
  SELECT a.vec_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (a.na * b.nb) AS c
  FROM tr a JOIN ev b ON true
  WHERE a.na > 0 AND b.nb > 0
)
SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
       round(max(c), 6) AS max_cosine
FROM p WHERE c >= 0.38
GROUP BY vec_id
""",
)
def q_semantic_decontam(spark, sf_dir):
    """Semantic decontamination (dedup/embedding.py:
    semantic_decontam_flags): TRAIN documents whose embedding lies
    within cosine 0.38 of ANY heldout (val/test) document — the
    embedding-space complement of the word-gram decontaminate_* family,
    catching paraphrased benchmark leakage that shares no exact n-gram.
    Split membership is the standard salted-md5 holdout assignment.
    Scale shape: the eval side is broadcast (eval sets are fixed-size
    in practice; the split fraction stands in), so the train corpus
    streams map-side through a broadcast cosine join — linear at
    100 TB, never all-pairs. Threshold 0.38 is calibrated non-vacuous
    at every testdata SF (3/3/88 flags at sf0.001/0.01/0.1)."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        semantic_decontam_flags,
    )

    return semantic_decontam_flags(
        _t(spark, sf_dir, "embeddings"), threshold=0.38
    )


@register(
    "semantic_decontam_eval",
    oracle="""
WITH ev AS (
  SELECT embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nb
  FROM (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 16)
),
tr AS (
  SELECT vec_id, embedding,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS na
  FROM embeddings
),
p AS (
  SELECT a.vec_id,
         list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (a.na * b.nb) AS c
  FROM tr a JOIN ev b ON true
  WHERE a.na > 0 AND b.nb > 0
)
SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
       round(max(c), 6) AS max_cosine
FROM p WHERE c >= 0.38
GROUP BY vec_id
""",
)
def q_semantic_decontam_eval(spark, sf_dir):
    """Semantic decontamination against an EXPLICIT benchmark frame
    (dedup/embedding.py: semantic_decontam_flags(eval_df=...)) — the
    real deployment shape (ADVICE r9): the eval side is an external
    fixed-size benchmark table, NOT a fraction of the corpus, so the
    broadcast-bounded scale claim is structural. Here the benchmark
    stands in as the 16 lowest-id embeddings; the FULL corpus is
    scanned as train, so benchmark members flag themselves at cosine
    1.0 (exact-copy leakage) alongside near-paraphrase hits — both are
    exactly what production decontam must catch. Linear in corpus size:
    the 16-row eval frame broadcasts, the corpus streams map-side."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        semantic_decontam_flags,
    )

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.orderBy("vec_id").limit(16).select("embedding")
    return semantic_decontam_flags(emb, threshold=0.38, eval_df=bench)


@register(
    "sequence_holdout_taint",
    oracle=f"""
WITH RECURSIVE {_bpe_cte()},
u AS (
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substr(md5('holdout:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   AS DOUBLE) / 4294967296.0 >= 0.98 THEN 1 ELSE 0 END AS held
  FROM documents
),
c AS (
  SELECT b.doc_id, b.source, b.n_bpe_tokens, u.held,
         CAST(coalesce(sum(b.n_bpe_tokens) OVER (PARTITION BY b.source ORDER BY b.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM bcounts b JOIN u USING (doc_id)
),
sp AS (
  SELECT source, n_bpe_tokens AS n, cum_prev, held,
         unnest(generate_series(cum_prev // 512, (cum_prev + n_bpe_tokens - 1) // 512))
           AS sq
  FROM c WHERE n_bpe_tokens > 0
),
per AS (
  SELECT source, sq,
         CAST(sum((least((sq + 1) * 512, cum_prev + n)
                   - greatest(sq * 512, cum_prev)) * held) AS BIGINT) AS hm
  FROM sp GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(sum(CASE WHEN hm > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tainted_seqs,
       CAST(sum(hm) AS BIGINT) AS heldout_token_mass,
       round(CAST(sum(CASE WHEN hm > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS seq_taint_rate
FROM per GROUP BY source
""",
)
def q_sequence_holdout_taint(spark, sf_dir):
    """Eval hygiene at the PACKING stage (operators/tokenized.py:
    sequence_holdout_taint): if the corpus is naively packed with
    holdout docs still in place (a real pipeline-ordering bug —
    split AFTER chunking), which training sequences carry heldout
    tokens and how much mass, per source. Counts-only dataflow (the
    sequence_doc_spans chain with a split tag): one shard window over
    BPE token counts, a bounded (doc, seq) explode, two aggregates —
    document text and ids never shuffle."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_holdout_taint,
    )

    return sequence_holdout_taint(_t(spark, sf_dir, "documents"), seq_len=512)


@register(
    "sequence_fingerprints",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
{_tokenized_seq_sql(512)},
fp AS (SELECT source, seq_id, n_ids, md5(ids) AS fingerprint FROM tseqs)
SELECT source, seq_id, n_ids, fingerprint,
       CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_copies,
       (row_number() OVER (PARTITION BY fingerprint ORDER BY source, seq_id)) = 1
         AS is_kept
FROM fp
""",
)
def q_sequence_fingerprints(spark, sf_dir):
    """Post-packing exact dedup in TOKEN space (operators/tokenized.py:
    sequence_fingerprints): every materialized training sequence gets an
    md5 fingerprint of its id payload; duplicate fingerprints group and
    the lexicographically-first (source, seq_id) keeps. Packing can
    manufacture duplicate sequences out of distinct documents (aligned
    boilerplate runs) that document-level dedup cannot see — the last
    dedup gate before the loader. Ids collapse to a 16-byte digest
    map-side; the keeper join is digest-keyed min(struct), the
    exact_dup_groups shape."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_fingerprints,
    )

    return sequence_fingerprints(_t(spark, sf_dir, "documents"), seq_len=512)


@register(
    "minhash_calibration",
    oracle=f"""
WITH cands AS ({{cands}}),
grams AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(len(text) - 4, 0))) AS i
        FROM documents)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
  FROM cands c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
  GROUP BY c.id_a, c.id_b
),
jm AS (
  SELECT CAST(round(c.est_jaccard * {_MINHASH_K}) AS BIGINT) AS n_hash_agree,
         CAST(round(CAST(coalesce(i.i, 0) AS DOUBLE)
              / (sa.n + sb.n - coalesce(i.i, 0)) * 1e6) AS BIGINT) AS jmicro
  FROM cands c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
),
g AS (
  SELECT n_hash_agree, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(jmicro) AS DOUBLE) / count(*) / 1e6 AS mj
  FROM jm GROUP BY n_hash_agree
)
SELECT n_hash_agree, n_pairs,
       round(mj, 6) AS mean_true_jaccard,
       round(1 - (1 - mj * mj * mj * mj) * (1 - mj * mj * mj * mj), 6)
         AS detect_prob_at_mean
FROM g
""",
)
def q_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration — the S-curve read off real data:
    candidate pairs bucketed by raw signature agreement (n_hash_agree
    of K=8), each bucket's TRUE mean 5-char-shingle Jaccard (exact,
    integer-micro-snapped so the mean is exact integer arithmetic until
    one division), and the analytic banded detection probability
    1−(1−j^r)^b evaluated at that mean (r=4 rows, b=2 bands; expanded
    as multiplication, not pow — pow can differ by an ulp across
    engines). Tells the operator whether the configured (b, r) sits on
    the steep part of the curve for THIS corpus's similarity
    population. Exact Jaccard is a row-local array_intersect of the two
    docs' distinct-gram sets, computed only on candidate pairs (the
    precision-audit shape), never all-pairs."""
    from scikit_learn_imputer_spark.dedup.minhash import (
        candidate_doc_texts,
        guarded_candidate_frame,
        minhash_candidate_pairs,
    )
    from scikit_learn_imputer_spark.dedup.ngram import ngram_set_col
    from scikit_learn_imputer_spark.functions.skew import fan_out

    d = _t(spark, sf_dir, "documents")
    cands = minhash_candidate_pairs(
        d,
        num_hashes=_MINHASH_K,
        bands=_MINHASH_K // 4,
        shingle=5,
        hasher="md5",
        max_bucket=2**31,
    ).select(
        "id_a",
        "id_b",
        F.round(F.col("est_jaccard") * _MINHASH_K)
        .cast("bigint")
        .alias("n_hash_agree"),
    ).localCheckpoint(eager=True)
    # Same shape as minhash_precision_audit: the pair-bounded candidate
    # set is materialized because the LSH join feeding it must run once
    # (guide §1.2); the scale guard forbids broadcasting it and
    # restricts the gram-set projection above the row bound (VERDICT
    # r14 #2/#3), and the intersections are row-local array_intersects
    # of per-doc gram sets — no (pair × gram) intermediate (see the
    # precision audit's design note).
    cands, large, restrict = guarded_candidate_frame(cands)
    gsets = fan_out(candidate_doc_texts(d, cands) if restrict else d).select(
        "doc_id", ngram_set_col("text", 5).alias("__gs")
    )
    ja = gsets.select(
        F.col("doc_id").alias("id_a"),
        F.col("__gs").alias("__gsa"),
        F.size("__gs").cast("bigint").alias("na"),
    )
    jb = gsets.select(
        F.col("doc_id").alias("id_b"),
        F.col("__gs").alias("__gsb"),
        F.size("__gs").cast("bigint").alias("nb"),
    )
    if large:
        # Doc-gram-set frames grow with the corpus: no broadcast builds
        # above the bound (see guarded_candidate_frame); SMJ spills.
        ja = ja.hint("merge")
        jb = jb.hint("merge")
    j = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    )
    jm = (
        cands.join(ja, "id_a")
        .join(jb, "id_b")
        .select(
            "n_hash_agree",
            F.size(F.array_intersect("__gsa", "__gsb"))
            .cast("bigint")
            .alias("i"),
            "na",
            "nb",
        )
        .select(
            "n_hash_agree",
            F.round(j * 1e6).cast("bigint").alias("jmicro"),
        )
    )
    mj = F.sum("jmicro").cast("double") / F.count(F.lit(1)) / 1e6
    m4 = mj * mj * mj * mj
    return jm.groupBy("n_hash_agree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(mj, 6).alias("mean_true_jaccard"),
        F.round(1 - (1 - m4) * (1 - m4), 6).alias("detect_prob_at_mean"),
    )


ORACLE["minhash_calibration"] = ORACLE["minhash_calibration"].replace(
    "{cands}", _minhash_candidates_oracle_sql()
)


@register(
    "pack_shuffled_sequences",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS position,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
)
SELECT doc_id, source, position, n_tokens,
       CAST(cum_prev // 512 AS BIGINT) AS seq_id,
       CAST(cum_prev % 512 AS BIGINT) AS seq_offset,
       (cum_prev % 512 + n_tokens) > 512 AS straddles
FROM c
""",
)
def q_pack_shuffled_sequences(spark, sf_dir):
    """Shuffle-BEFORE-pack (operators/shuffle.py:
    pack_shuffled_sequences — VERDICT r9 #5): documents take their
    seeded md5 permutation position FIRST, then the shuffled token
    stream is concat-and-cut into 512-token training sequences, so no
    sequence concatenates one source's contiguous docs (pack_sequences
    alone leaves per-source id-order runs inside sequences — residual
    curriculum a trainer would feel). One row per document with its
    position and (seq_id, seq_offset, straddles) placement in the
    GLOBAL shuffled stream. Scale shape: the seeded_global_shuffle
    bucket trick extended to a token-mass prefix sum — per-bucket
    row+token totals (O(256) rows) carry the only global-order window;
    in-bucket ranks/cumsums are bucket-partitioned windows; offsets
    broadcast back. The oracle's single global window is semantically
    identical (same (md5, id) total order)."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    return pack_shuffled_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )


@register(
    "pack_shuffle_dispersion",
    oracle="""
WITH s AS (
  SELECT source, position FROM ({pack})
),
adj AS (
  SELECT source AS sa, lag(source) OVER (ORDER BY position) AS sb FROM s
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adjacent,
         CAST(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same_source
  FROM adj WHERE sb IS NOT NULL
),
e AS (
  SELECT CAST(sum(n * (n - 1)) AS BIGINT) AS same_pairs,
         CAST(sum(n) AS BIGINT) AS n_sequences
  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM s GROUP BY source)
)
SELECT n_sequences, n_adjacent, n_same_source,
       round(CAST(n_same_source AS DOUBLE) / n_adjacent, 6) AS observed_rate,
       round(CAST(same_pairs AS DOUBLE)
             / (CAST(n_sequences AS DOUBLE) * (n_sequences - 1)), 6)
         AS expected_rate,
       round((CAST(n_same_source AS DOUBLE) / n_adjacent)
             / (CAST(same_pairs AS DOUBLE)
                / (CAST(n_sequences AS DOUBLE) * (n_sequences - 1))), 6)
         AS mixing_ratio
FROM a, e
""",
)
def q_pack_shuffle_dispersion(spark, sf_dir):
    """Dispersion audit AT DOC LEVEL of the shuffle-before-pack chain
    (VERDICT r9 #5's 'dispersion row proving mixed packing'): the same
    adjacency-vs-uniform-expectation statistic shuffle_dispersion runs
    on sequence order, here over the DOCUMENT permutation that
    pack_shuffled_sequences packs by — mixing_ratio ≈ 1 certifies the
    packed stream interleaves sources (compare shuffle_dispersion over
    an id-sorted curriculum, which reads ≈ 3). Same exact-integer rate
    math; adjacency is the position+1 equi self-join."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
        shuffle_dispersion,
    )

    placed = pack_shuffled_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )
    return shuffle_dispersion(placed)


ORACLE["pack_shuffle_dispersion"] = ORACLE["pack_shuffle_dispersion"].replace(
    "{pack}", ORACLE["pack_shuffled_sequences"]
)


@register(
    "epoch_seed_independence",
    oracle=r"""
WITH pa AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY md5('11:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS pa
  FROM documents
),
pb AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY md5('12:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS pb
  FROM documents
),
j AS (SELECT pa.pa, pb.pb FROM pa JOIN pb USING (doc_id)),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum((pa - pb) * (pa - pb)) AS BIGINT) AS sum_d2,
         CAST(count(DISTINCT pa) AS BIGINT) AS da,
         CAST(count(DISTINCT pb) AS BIGINT) AS db,
         CAST(min(pa) AS BIGINT) AS mina, CAST(max(pa) AS BIGINT) AS maxa,
         CAST(min(pb) AS BIGINT) AS minb, CAST(max(pb) AS BIGINT) AS maxb
  FROM j
)
SELECT n_items, sum_d2,
       round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
             / (CAST(n_items AS DOUBLE)
                * (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE) - 1.0)),
             6) AS spearman_rho,
       (da = n_items AND mina = 1 AND maxa = n_items) AS perm_a_total,
       (db = n_items AND minb = 1 AND maxb = n_items) AS perm_b_total
FROM a
""",
)
def q_epoch_seed_independence(spark, sf_dir):
    """Epoch-seed audit (operators/shuffle.py:epoch_seed_independence —
    VERDICT r9 #6): multi-epoch training draws a DIFFERENT permutation
    per epoch; this proves seeds 11 and 12 each produce a TOTAL
    permutation of the corpus (exact ranks 1..N — distinct/min/max
    pinned in the same aggregate) and that the two orders are
    decorrelated: Spearman's rho = 1 − 6Σd²/(N(N²−1)) from exact
    integer N and Σd², evaluated in the identical double expression on
    both engines. One equi join + one aggregate — no scalar-frame
    meets. Rho ≈ 0 = independent epochs; ±1 would mean the new seed
    replayed/reversed the last epoch."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        epoch_seed_independence,
    )

    return epoch_seed_independence(
        _t(spark, sf_dir, "documents"), ["doc_id"], seed_a=11, seed_b=12
    )


@register(
    "pack_mixing_histogram",
    oracle="""
WITH p AS ({pack}),
sp AS (
  SELECT source,
         unnest(generate_series(seq_id,
                seq_id + (seq_offset + n_tokens - 1) // 512)) AS seq
  FROM p WHERE n_tokens > 0
),
per AS (
  SELECT seq, CAST(count(*) AS BIGINT) AS nd,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM sp GROUP BY seq
)
SELECT n_sources,
       CAST(count(*) AS BIGINT) AS n_sequences,
       CAST(sum(nd) AS BIGINT) AS n_docs
FROM per GROUP BY n_sources
""",
)
def q_pack_mixing_histogram(spark, sf_dir):
    """Sequence-granularity mixing proof (operators/shuffle.py:
    pack_mixing_histogram): histogram of training sequences by the
    number of DISTINCT sources among the documents overlapping each
    sequence (straddlers included), over the shuffle-before-pack
    placement. Naive per-source packing reads n_sources = 1 for every
    sequence; the shuffled pack shows multi-source sequences wherever a
    sequence holds >1 doc — the curriculum difference a trainer feels
    INSIDE single sequences, complementing pack_shuffle_dispersion's
    adjacent-position view. Bounded explode (docs + straddle extras),
    exact-integer aggregates."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_mixing_histogram,
        pack_shuffled_sequences,
    )

    placed = pack_shuffled_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )
    return pack_mixing_histogram(placed, seq_len=512)


ORACLE["pack_mixing_histogram"] = ORACLE["pack_mixing_histogram"].replace(
    "{pack}", ORACLE["pack_shuffled_sequences"]
)


@register(
    "loader_resume_state",
    oracle="""
WITH sh AS ({shards}),
per AS (
  SELECT shard_id, n_sequences, first_position,
         CAST(shard_id % 4 AS BIGINT) AS worker_id,
         CAST(coalesce(sum(n_sequences) OVER (
              PARTITION BY shard_id % 4 ORDER BY shard_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM sh
),
tot AS (
  SELECT worker_id, CAST(sum(n_sequences) AS BIGINT) AS total
  FROM per GROUP BY worker_id
),
hit AS (
  SELECT worker_id, shard_id, cum_prev, first_position
  FROM per WHERE cum_prev <= 7 AND 7 < cum_prev + n_sequences
)
SELECT t.worker_id,
       CAST(least(7, total) AS BIGINT) AS consumed,
       CAST(coalesce(h.shard_id, -1) AS BIGINT) AS resume_shard,
       CAST(coalesce(7 - h.cum_prev, -1) AS BIGINT) AS resume_offset,
       CAST(coalesce(h.first_position + (7 - h.cum_prev), -1) AS BIGINT)
         AS resume_position,
       total <= 7 AS exhausted
FROM tot t LEFT JOIN hit h USING (worker_id)
""",
)
def q_loader_resume_state(spark, sf_dir):
    """Loader crash-resume plan (operators/shuffle.py:
    loader_resume_state): after 7 lockstep steps (one sequence per rank
    per step), the exact (shard, offset, global position) each of 4
    worker ranks resumes at — pure integer arithmetic over the
    O(#shards) training_shards manifest (round-robin shards in id
    order, sequences in position order within a shard); the corpus is
    never re-read to recover a loader. Ranks whose stream ran dry
    report −1 pointers and exhausted = true (covered at literal scale
    by test; at testdata SFs every rank is mid-stream at step 7)."""
    from scikit_learn_imputer_spark.operators.chunking import pack_sequences
    from scikit_learn_imputer_spark.operators.shuffle import (
        loader_resume_state,
        shuffle_sequences,
    )

    packed = pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    return loader_resume_state(
        shuffle_sequences(packed, seed=42),
        shard_size=16,
        num_workers=4,
        global_step=7,
    )


ORACLE["loader_resume_state"] = ORACLE["loader_resume_state"].replace(
    "{shards}", ORACLE["training_shards"]
)


@register(
    "epoch_source_fairness",
    oracle=r"""
WITH d AS (SELECT doc_id, source FROM documents),
ranked AS (
  SELECT 0 AS e, source,
         CAST(row_number() OVER (
           ORDER BY md5('100:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS pos
  FROM d
  UNION ALL
  SELECT 1, source,
         CAST(row_number() OVER (
           ORDER BY md5('101:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT)
  FROM d
  UNION ALL
  SELECT 2, source,
         CAST(row_number() OVER (
           ORDER BY md5('102:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT)
  FROM d
),
agg AS (
  SELECT CAST(e AS BIGINT) AS epoch, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(pos) AS BIGINT) AS sum_pos
  FROM ranked GROUP BY e, source
)
SELECT epoch, source, n_docs, sum_pos,
       round((2.0 * CAST(sum_pos AS DOUBLE))
             / (CAST(n_docs AS DOUBLE)
                * (CAST(sum(n_docs) OVER (PARTITION BY epoch) AS DOUBLE)
                   + 1.0)), 6) AS fairness_ratio
FROM agg
""",
)
def q_epoch_source_fairness(spark, sf_dir):
    """Global position-bias audit per epoch (operators/shuffle.py:
    epoch_source_fairness): for each of 3 epoch seeds (100+e), the sum
    of permutation positions each source's docs received vs the uniform
    expectation n·(N+1)/2 — fairness_ratio 1 means no source is
    systematically front- or back-loaded in any epoch's training order
    (≪1 = trainer over-weights it during warmup). Completes the shuffle
    audit triad: dispersion (adjacent pairs), mixing histogram (within
    sequence), fairness (global position). Exact-integer sums; the only
    global window totals the O(epochs x sources) aggregate frame."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        epoch_source_fairness,
    )

    return epoch_source_fairness(
        _t(spark, sf_dir, "documents"), ["doc_id"], base_seed=100, epochs=3
    )


@register(
    "mixture_shuffled_pack_audit",
    oracle=r"""
WITH m AS ({mix}),
k AS (
  SELECT doc_id, source, n_tokens,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS kk
  FROM m
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY kk, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM k
),
p AS (
  SELECT doc_id, source, n_tokens,
         CAST(cum_prev // 512 AS BIGINT) AS seq_id,
         CAST(cum_prev % 512 AS BIGINT) AS seq_offset
  FROM c
),
sp AS (
  SELECT source,
         unnest(generate_series(seq_id,
                seq_id + (seq_offset + n_tokens - 1) // 512)) AS seq
  FROM p WHERE n_tokens > 0
),
tch AS (
  SELECT source, CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs_touched
  FROM sp GROUP BY source
),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS kept_docs,
         CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
         CAST(sum(CASE WHEN seq_offset + n_tokens > 512 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_straddles
  FROM p GROUP BY source
),
tgt AS (
  SELECT source,
         round(pow(n_s, 0.7) / sum(pow(n_s, 0.7)) OVER (), 6)
           AS target_share
  FROM (
    SELECT source,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(str_split_regex(trim(text), '\s+')) END) AS DOUBLE)
             AS n_s
    FROM documents GROUP BY source
  )
)
SELECT a.source, kept_docs, kept_tokens, n_straddles,
       coalesce(n_seqs_touched, 0) AS n_seqs_touched,
       round(CAST(kept_tokens AS DOUBLE)
             / CAST(sum(kept_tokens) OVER () AS DOUBLE), 6)
         AS achieved_share,
       target_share
FROM agg a
LEFT JOIN tch USING (source)
JOIN tgt USING (source)
""",
)
def q_mixture_shuffled_pack_audit(spark, sf_dir):
    """End-to-end mixture → shuffle → pack audit: temperature-sample
    the corpus (tau=0.7 token-budget Bernoulli —
    temperature_mixture_sample's exact semantics, reused), place the
    survivors with pack_shuffled_sequences, and report per source:
    kept docs/tokens, straddle count, distinct sequences touched, and
    the ACHIEVED token share of the packed stream against the
    temperature-target share pow(n_s,0.7)/Z — the one-look go/no-go
    that the sampled, shuffled, packed stream actually carries the
    mixture the plan promised. Shares derive from exact integer token
    sums (identical double division both engines); target shares round
    the pow expression at 6 decimals on both engines
    (temperature_mixture_sample precedent). Inherits that query's
    intended 1-row normalizer broadcast; everything after the sample is
    O(#sources) aggregate frames plus the bounded span explode."""
    from scikit_learn_imputer_spark.functions.text import token_count_col
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    surv = q_temperature_mixture_sample(spark, sf_dir)
    # The placed frame (one narrow row per surviving doc) feeds BOTH
    # the span explode and the per-source aggregate; lazily each
    # consumer re-ran the whole temperature sample + shuffled pack
    # (13 document scans in the lazy plan). Materialized eagerly —
    # optimization round 14, guide §1.2/§5.
    placed = pack_shuffled_sequences(
        surv, seq_len=512, seed=7, token_count_col="n_tokens"
    ).localCheckpoint(eager=True)
    spans = placed.filter(F.col("n_tokens") > 0).select(
        "source",
        F.explode(
            F.sequence(
                F.col("seq_id"),
                (
                    F.col("seq_id")
                    + F.floor(
                        (F.col("seq_offset") + F.col("n_tokens") - 1) / 512
                    )
                ).cast("bigint"),
            )
        ).alias("__seq"),
    )
    touched = spans.groupBy("source").agg(
        F.countDistinct("__seq").cast("bigint").alias("n_seqs_touched")
    )
    agg = placed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        F.sum(F.col("straddles").cast("int"))
        .cast("bigint")
        .alias("n_straddles"),
    )
    totals = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.sum(token_count_col(F.col("text")).cast("bigint"))
        .cast("double")
        .alias("__n_s")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tgt = totals.select(
        "source",
        F.round(
            F.pow("__n_s", F.lit(0.7)) / F.sum(F.pow("__n_s", F.lit(0.7))).over(wall),
            6,
        ).alias("target_share"),
    )
    return (
        agg.join(touched, "source", "left")
        .join(tgt, "source")
        .select(
            "source",
            "kept_docs",
            "kept_tokens",
            "n_straddles",
            F.coalesce(F.col("n_seqs_touched"), F.lit(0).cast("bigint")).alias(
                "n_seqs_touched"
            ),
            F.round(
                F.col("kept_tokens").cast("double")
                / F.sum("kept_tokens").over(wall).cast("double"),
                6,
            ).alias("achieved_share"),
            "target_share",
        )
    )


ORACLE["mixture_shuffled_pack_audit"] = ORACLE[
    "mixture_shuffled_pack_audit"
].replace("{mix}", ORACLE["temperature_mixture_sample"])


def _strat_sample_sql(extra_base_cols=""):
    """Shared oracle scaffold of the stratified quality sampler — the
    base/threshold CTEs every sampler-derived oracle starts from
    (stratified_quality_sample, dup_rate_by_quality,
    dedup_order_sensitivity). Retune the decile thresholds or the
    score source HERE, once. training_loader_funnel embeds its own
    copy inside the composed funnel body (its text is string-surgered
    by funnel_budget_sweep) — keep that one in sync when retuning."""
    # Thresholds are EXACT lower-rank quantiles (sorted[((n-1)*k)//10]),
    # not quantile_cont — the interpolating form diverged from Spark by
    # one ULP at sf1 and flipped threshold-equal docs (see
    # functions/stats.py:exact_rank_quantiles).
    return (
        """WITH tqx AS ({tq}),
base AS MATERIALIZED (
  SELECT d.doc_id, d.source, t.q_tokens AS n_tokens, t.q_score AS s"""
        + extra_base_cols
        + """
  FROM documents d JOIN tqx t USING (doc_id)
),
thr AS (
  SELECT source,
         list_transform(range(1, 10),
                        k -> vs[CAST(((n - 1) * k) // 10 AS BIGINT) + 1])
           AS ts
  FROM (
    SELECT source,
           list_sort(list(s) FILTER (s IS NOT NULL)) AS vs,
           CAST(count(s) AS BIGINT) AS n
    FROM base GROUP BY source
  )
)"""
    )


_FP_BASE_COL = (
    ",\n         md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'))"
    " AS fp"
)


@register(
    "stratified_quality_sample",
    oracle=_strat_sample_sql()
    + """,
b AS (
  SELECT base.source, base.n_tokens,
         CAST(1 + len(list_filter(thr.ts, t -> base.s >= t)) AS INTEGER)
           AS decile,
         CAST(('0x' || substr(md5('strat:' || CAST(base.doc_id AS VARCHAR)),
              1, 8))::UBIGINT AS DOUBLE) / 4294967296.0 AS u
  FROM base JOIN thr USING (source)
)
SELECT source, decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN u < (decile * decile) / 100.0 THEN 1 ELSE 0 END)
         AS BIGINT) AS kept_docs,
       CAST(coalesce(sum(CASE WHEN u < (decile * decile) / 100.0
                          THEN n_tokens END), 0) AS BIGINT) AS kept_tokens
FROM b GROUP BY source, decile
""",
)
def q_stratified_quality_sample(spark, sf_dir):
    """Quality-stratified sampling report (operators/split.py:
    stratified_quality_sample): documents bucket into PER-SOURCE quality
    deciles (composite score rounded to 6 decimals, broadcast
    percentile thresholds — lm_score_deciles precedent) and keep with
    probability decile²/100 via the deterministic md5 draw — the
    FineWeb-style bucket-and-downsample stage, stratified per source so
    small sources contribute their best docs instead of being crowded
    out by the corpus head. Reports per (source, decile): docs, kept
    docs, kept token mass. The only non-map ops are the O(#sources)
    percentile aggregate (broadcast back) and one equi join."""
    from scikit_learn_imputer_spark.operators.split import (
        stratified_quality_sample,
    )

    s = stratified_quality_sample(_t(spark, sf_dir, "documents"))
    return s.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("kept_docs"),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.col("n_tokens"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("kept_tokens"),
    )


ORACLE["stratified_quality_sample"] = ORACLE[
    "stratified_quality_sample"
].replace("{tq}", ORACLE["text_quality"])


def _loader_funnel_base(spark, sf_dir, materialize=False):
    """Budget-INDEPENDENT prefix of the loader funnel: (docs, kept, dk)
    — the corpus, the stratified survivors, and the decontaminated
    survivors. Split out so the budget sweep computes the expensive
    Arrow decontam encode ONCE across its three budget branches instead
    of once per branch (a lazy union would otherwise re-encode per
    branch: Catalyst shares nothing it can't prove equal).

    ``materialize=True`` eager-localCheckpoints dk. A lazy
    ``persist()`` is not enough here: the consumers are the parallel
    branches of one union job, and Spark's cache fills per-partition
    with no cross-branch synchronization — concurrently scheduled
    branches each recompute the whole stratified pass and Arrow
    decontam encode before any cache entry lands (measured r14: the
    7-row funnel paid the survivor chain ~3x). kept needs no
    checkpoint of its own: stratified_quality_sample already
    checkpoints its scored base frame, so re-deriving kept per branch
    is a read of that frame plus a broadcast join. The checkpoint
    bounds are O(survivor) rows of (id, source, n_tokens) — at 100 TB
    this is the parquet materialization every production run makes
    after sampling anyway; the checkpointed RDDs are released by
    ContextCleaner when the returned frames go out of scope (the
    7/21-row result the callers return is itself checkpointed, so
    nothing downstream holds these lineages)."""
    from scikit_learn_imputer_spark.dedup.exact import (
        decontaminate_token_ngrams,
    )
    from scikit_learn_imputer_spark.operators.split import (
        stratified_quality_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    s = stratified_quality_sample(docs)
    kept = s.filter(F.col("kept")).select("doc_id", "source", "n_tokens")
    # all_docs carries per-doc n_tokens for EVERY document (the
    # stratified base frame pre-filter) — the corpus stage row
    # aggregates it instead of re-running the tokenizing regex scan
    # over the full text a second time.
    all_docs = s.select("doc_id", "n_tokens")
    bench = docs.filter(F.col("doc_id") % 100 < 2)
    kept_txt = docs.join(kept.select("doc_id"), "doc_id", "left_semi").filter(
        F.col("doc_id") % 100 >= 2
    )
    clean_ids = decontaminate_token_ngrams(kept_txt, bench, n=16).select(
        "doc_id"
    )
    dk = kept.join(clean_ids, "doc_id", "left_semi")
    if materialize:
        dk = dk.localCheckpoint(eager=True)
    return docs, all_docs, kept, dk


def _loader_funnel_rows(spark, sf_dir, budget):
    """The 7 exact-integer loader-funnel stage rows for one mixture
    token budget (see q_training_loader_funnel for the full design
    notes; the budget SWEEP builds its budget-as-dimension plan inline
    and shares only _loader_funnel_base). VERDICT r10 #6: the token-id
    decontamination gate (decontaminate_token_ngrams, the 16-id-gram
    net) threads between the stratified sample and the mixture, so the
    funnel reports the eval-contamination mass removed before any
    budget is spent — benchmark members themselves (doc_id % 100 < 2)
    and every stratified survivor sharing a 16-id-gram with them drop
    here. The Arrow encode runs over the stratified SURVIVORS only
    (plus the bounded benchmark side), not the corpus."""
    from scikit_learn_imputer_spark.functions.text import (
        token_count_col,
        uniform_hash_col,
    )

    # The stage aggregates below each consume kept/dk as parallel union
    # branches; materialize=True checkpoints them SEQUENTIALLY so no
    # branch recomputes the stratified pass or the Arrow decontam
    # encode (see _loader_funnel_base — a lazy persist raced).
    docs, all_docs, kept, dk = _loader_funnel_base(
        spark, sf_dir, materialize=True
    )
    per_src = dk.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("__n_s")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_s = F.pow("__n_s", F.lit(0.7))
    rates = per_src.select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * (w_s / F.sum(w_s).over(wall)) / F.col("__n_s"),
            ),
            6,
        ).alias("__r"),
    )
    u2 = uniform_hash_col(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
    )
    mix = (
        dk.join(F.broadcast(rates), "source")
        .filter(u2 < F.col("__r"))
        .select("doc_id", "n_tokens")
    )

    def row(agg_df, order, stage, units=None):
        return agg_df.select(
            F.lit(order).cast("bigint").alias("stage_order"),
            F.lit(stage).alias("stage"),
            (F.lit(0).cast("bigint") if units is not None else F.col("nd"))
            .alias("n_docs"),
            (F.lit(0).cast("bigint") if units is not None else F.col("nt"))
            .alias("n_tokens"),
            (units if units is not None else F.lit(0).cast("bigint"))
            .alias("n_units"),
        )

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("nd"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("nt"),
        )

    corpus = agg(all_docs)
    strat = agg(kept)
    decon = agg(dk)
    ma = agg(mix)
    n_seqs = F.when(
        F.col("nt") > 0, F.floor((F.col("nt") - 1) / 512) + 1
    ).otherwise(F.lit(0)).cast("bigint")
    n_shards = F.when(
        F.col("nt") > 0,
        F.floor(F.floor((F.col("nt") - 1) / 512) / 16) + 1,
    ).otherwise(F.lit(0)).cast("bigint")
    parts = [
        row(corpus, 1, "corpus"),
        row(strat, 2, "stratified"),
        row(decon, 3, "decontaminated"),
        row(ma, 4, "mixture"),
        row(ma, 5, "sequences", n_seqs),
        row(ma, 6, "shards", n_shards),
        row(ma, 7, "workers", F.least(F.lit(4).cast("bigint"), n_shards)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("stage_order").localCheckpoint(eager=True)  # 7 rows


@register(
    "training_loader_funnel",
    oracle="""
WITH RECURSIVE {bpe},
tqx AS ({tq}),
base AS MATERIALIZED (
  SELECT d.doc_id, d.source, t.q_tokens AS n_tokens, t.q_score AS s
  FROM documents d JOIN tqx t USING (doc_id)
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n_tokens) AS BIGINT) AS nt
  FROM base
),
thr AS (
  SELECT source,
         list_transform(range(1, 10),
                        k -> vs[CAST(((n - 1) * k) // 10 AS BIGINT) + 1])
           AS ts
  FROM (
    SELECT source,
           list_sort(list(s) FILTER (s IS NOT NULL)) AS vs,
           CAST(count(s) AS BIGINT) AS n
    FROM base GROUP BY source
  )
),
sk AS (
  SELECT base.doc_id, base.source, base.n_tokens,
         CAST(1 + len(list_filter(thr.ts, t -> base.s >= t)) AS INTEGER)
           AS decile,
         CAST(('0x' || substr(md5('strat:' || CAST(base.doc_id AS VARCHAR)),
              1, 8))::UBIGINT AS DOUBLE) / 4294967296.0 AS u
  FROM base JOIN thr USING (source)
),
kept AS MATERIALIZED (
  SELECT doc_id, source, n_tokens FROM sk
  WHERE u < (decile * decile) / 100.0
),
strat AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS nt
  FROM kept
),
idt AS MATERIALIZED (
  SELECT doc_id, str_split(ids, ' ') AS t FROM edocs WHERE ids <> ''
),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t) - 14, 1)),
             i -> {g16})) AS g
    FROM idt WHERE doc_id % 100 < 2
  )
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 14, 1)),
             i -> {g16})) AS g
    FROM idt WHERE doc_id % 100 >= 2
  ) WHERE g IN (SELECT g FROM bg)
),
dk AS MATERIALIZED (
  SELECT doc_id, source, n_tokens FROM kept
  WHERE doc_id % 100 >= 2
    AND doc_id NOT IN (SELECT doc_id FROM contam)
),
decon AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS nt
  FROM dk
),
ns AS (
  SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS n_s
  FROM dk GROUP BY source
),
rates AS (
  SELECT source,
         round(least(1.0, 5000.0 * (pow(n_s, 0.7)
               / sum(pow(n_s, 0.7)) OVER ()) / n_s), 6) AS r
  FROM ns
),
mix AS (
  SELECT k.doc_id, k.n_tokens
  FROM dk k JOIN rates USING (source)
  WHERE CAST(('0x' || substr(md5('mix:' || CAST(k.doc_id AS VARCHAR)),
       1, 8))::UBIGINT AS DOUBLE) / 4294967296.0 < r
),
ma AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS nt
  FROM mix
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_order, 'corpus' AS stage,
         nd AS n_docs, nt AS n_tokens, CAST(0 AS BIGINT) AS n_units
  FROM corpus
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'stratified', nd, nt, CAST(0 AS BIGINT)
  FROM strat
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'decontaminated', nd, nt, CAST(0 AS BIGINT)
  FROM decon
  UNION ALL
  SELECT CAST(4 AS BIGINT), 'mixture', nd, nt, CAST(0 AS BIGINT) FROM ma
  UNION ALL
  SELECT CAST(5 AS BIGINT), 'sequences', CAST(0 AS BIGINT),
         CAST(0 AS BIGINT),
         CAST(CASE WHEN nt > 0 THEN (nt - 1) // 512 + 1 ELSE 0 END
           AS BIGINT)
  FROM ma
  UNION ALL
  SELECT CAST(6 AS BIGINT), 'shards', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(CASE WHEN nt > 0 THEN ((nt - 1) // 512) // 16 + 1 ELSE 0 END
           AS BIGINT)
  FROM ma
  UNION ALL
  SELECT CAST(7 AS BIGINT), 'workers', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(least(4, CASE WHEN nt > 0 THEN ((nt - 1) // 512) // 16 + 1
                       ELSE 0 END) AS BIGINT)
  FROM ma
)
ORDER BY stage_order
""",
)
def q_training_loader_funnel(spark, sf_dir):
    """The loader-side funnel capstone in ONE lazy plan: corpus →
    quality-stratified sample (per-source deciles, keep decile²/100) →
    TOKEN-ID DECONTAMINATION (16-id-gram net vs the pseudo eval set,
    VERDICT r10 #6 — the funnel reports the eval-contamination mass
    removed before any budget is spent) → temperature mixture over the
    CLEAN survivors (tau=0.7, 5k-token budget, md5 Bernoulli) →
    512-token sequences → 16-sequence shards → 4 loader ranks. One row per stage with exact-integer doc/token/unit
    counts — the go/no-go table a training run reads before touching
    the corpus, complementing filter_waterfall (which funnels the
    CLEANING gates) with the SAMPLING/LOADER side. Unit counts for
    sequences/shards/workers are closed-form integer arithmetic on the
    surviving token mass (concat-and-cut packs the global stream
    contiguously); mixture rates round the pow expression at 6 decimals
    on both engines (temperature_mixture_sample precedent). Stage
    aggregates union — no scalar-frame joins; per-source frames are
    O(#sources)."""
    return _loader_funnel_rows(spark, sf_dir, 5000.0)


_g16 = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(16))
ORACLE["training_loader_funnel"] = (
    ORACLE["training_loader_funnel"]
    .replace("{tq}", ORACLE["text_quality"])
    .replace("{bpe}", _bpe_encode_ctes())
    .replace("{g16}", _g16)
)


@register(
    "sequence_dedup_manifest",
    oracle="""
WITH f AS ({fp})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped,
       CAST(coalesce(sum(CASE WHEN NOT is_kept THEN n_ids END), 0)
         AS BIGINT) AS dropped_token_mass,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_unique
FROM f GROUP BY source
""",
)
def q_sequence_dedup_manifest(spark, sf_dir):
    """ACTION accounting for the token-space dedup gate
    (sequence_fingerprints → what a rewrite would drop): per shard, the
    materialized sequence count, how many sequences the digest-keyed
    keeper rule drops, the exact duplicate TOKEN mass a trainer stops
    repeating, and the distinct-fingerprint count the shard collapses
    to — the numbers that size an incremental shard rewrite
    (rewrite_tokenized_shards_incremental's counts-only boundary)
    before touching any shard file. Pure aggregate over the
    fingerprints frame; the duplicate detection itself never shuffles
    ids (16-byte digests only)."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        sequence_fingerprints,
    )

    fps = sequence_fingerprints(_t(spark, sf_dir, "documents"), seq_len=512)
    return fps.groupBy("source").agg(
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


ORACLE["sequence_dedup_manifest"] = ORACLE["sequence_dedup_manifest"].replace(
    "{fp}", ORACLE["sequence_fingerprints"]
)


@register(
    "funnel_budget_sweep",
    oracle="""
SELECT * FROM (
  SELECT CAST(2000 AS BIGINT) AS budget, * FROM ({f2000})
  UNION ALL
  SELECT CAST(5000 AS BIGINT), * FROM ({f5000})
  UNION ALL
  SELECT CAST(20000 AS BIGINT), * FROM ({f20000})
)
ORDER BY budget, stage_order
""",
)
def q_funnel_budget_sweep(spark, sf_dir):
    """Token-budget calibration curve for the loader funnel (the
    threshold-sweep pattern of semdedup_threshold_curve /
    ngram_novelty_curve applied to SAMPLING): the full
    corpus→stratified→decontaminated→mixture→sequences→shards→workers
    funnel evaluated at 2k/5k/20k-token mixture budgets in one plan — how many docs,
    tokens, sequences and shards each budget buys, and where the budget
    saturates (rates hit 1.0 and the mixture stage stops filtering).
    SINGLE-PASS over budgets (VERDICT r11 #6): budget is a DIMENSION of
    the aggregation, not a plan branch — the per-source rates for all
    three budgets unpivot into one O(#sources×#budgets) broadcast frame,
    ONE survivor-sized join+filter+groupBy(budget) computes every
    mixture aggregate, and the budget-independent corpus/stratified/
    decontaminated stage aggregates are computed once (persisted 1-row
    frames) and fanned to the three budget labels by an explode over
    the single row. 21 exact-integer rows; identical values to the
    per-branch form."""
    from scikit_learn_imputer_spark.functions.text import (
        token_count_col,
        uniform_hash_col,
    )

    budgets = (2000, 5000, 20000)
    # The stratified and decontaminated frames are budget-independent;
    # materialize=True checkpoints them sequentially so every stage
    # branch shares ONE stratified scan and ONE Arrow decontam encode
    # (see _loader_funnel_base — a lazy persist raced across branches).
    docs, all_docs, kept, dk = _loader_funnel_base(
        spark, sf_dir, materialize=True
    )
    # Budget-independent 1-row stage aggregates, computed ONCE and
    # persisted (VERDICT r11 #6 — the per-branch form re-tokenized the
    # corpus and re-aggregated the survivors once PER budget); each is
    # then fanned to the three budget labels with an explode over the
    # single row.
    def agg1(df):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("nd"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("nt"),
        ).persist()

    corpus1 = agg1(all_docs)
    strat1 = agg1(kept)
    decon1 = agg1(dk)
    b_arr = F.array(*[F.lit(b).cast("bigint") for b in budgets])
    # Per-source mixture rates for ALL budgets in one O(#sources) frame
    # (budget unpivoted via explode), broadcast into ONE survivor-sized
    # join+filter+aggregate — the single corpus-sized stage of the plan.
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_s = F.pow("__n_s", F.lit(0.7))
    per_src = dk.groupBy("source").agg(
        F.sum("n_tokens").cast("double").alias("__n_s")
    )
    rates_all = per_src.withColumn("__tot", F.sum(w_s).over(wall)).select(
        "source",
        F.explode(b_arr).alias("budget"),
        "__n_s",
        "__tot",
    ).select(
        "source",
        "budget",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("budget").cast("double")
                * (w_s / F.col("__tot"))
                / F.col("__n_s"),
            ),
            6,
        ).alias("__r"),
    )
    u2 = uniform_hash_col(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
    )
    mix_raw = (
        dk.join(F.broadcast(rates_all), "source")
        .filter(u2 < F.col("__r"))
        .groupBy("budget")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nd"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("nt"),
        )
    )
    # An empty mixture group must still emit its zero rows (groupBy
    # drops empty groups; the oracle's per-branch aggregate does not).
    budgets_df = spark.createDataFrame(
        [(b,) for b in budgets], "budget bigint"
    )
    mix_agg = budgets_df.join(mix_raw, "budget", "left").select(
        "budget",
        F.coalesce("nd", F.lit(0)).cast("bigint").alias("nd"),
        F.coalesce("nt", F.lit(0)).cast("bigint").alias("nt"),
    )

    def fan(agg_frame, order, stage):
        """1-row budget-independent aggregate -> one stage row PER
        budget (explode over the single row; no recompute)."""
        return agg_frame.select(
            F.explode(b_arr).alias("budget"),
            F.lit(order).cast("bigint").alias("stage_order"),
            F.lit(stage).alias("stage"),
            F.col("nd").alias("n_docs"),
            F.col("nt").alias("n_tokens"),
            F.lit(0).cast("bigint").alias("n_units"),
        )

    def mrow(order, stage, units=None):
        return mix_agg.select(
            "budget",
            F.lit(order).cast("bigint").alias("stage_order"),
            F.lit(stage).alias("stage"),
            (F.lit(0).cast("bigint") if units is not None else F.col("nd"))
            .alias("n_docs"),
            (F.lit(0).cast("bigint") if units is not None else F.col("nt"))
            .alias("n_tokens"),
            (units if units is not None else F.lit(0).cast("bigint"))
            .alias("n_units"),
        )

    n_seqs = F.when(
        F.col("nt") > 0, F.floor((F.col("nt") - 1) / 512) + 1
    ).otherwise(F.lit(0)).cast("bigint")
    n_shards = F.when(
        F.col("nt") > 0,
        F.floor(F.floor((F.col("nt") - 1) / 512) / 16) + 1,
    ).otherwise(F.lit(0)).cast("bigint")
    parts = [
        fan(corpus1, 1, "corpus"),
        fan(strat1, 2, "stratified"),
        fan(decon1, 3, "decontaminated"),
        mrow(4, "mixture"),
        mrow(5, "sequences", n_seqs),
        mrow(6, "shards", n_shards),
        mrow(7, "workers", F.least(F.lit(4).cast("bigint"), n_shards)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.select(
        "budget", "stage_order", "stage", "n_docs", "n_tokens", "n_units"
    ).orderBy("budget", "stage_order")
    # Materialize the 21-row curve, then release the 1-row stage caches
    # (ADVICE r12: persists leaked until ContextCleaner GC). kept/dk are
    # checkpointed RDDs, released by ContextCleaner once these frames go
    # out of scope at return.
    out = out.localCheckpoint(eager=True)
    for c in (corpus1, strat1, decon1):
        c.unpersist()
    return out


_fo = ORACLE["training_loader_funnel"]
# Budget-as-DIMENSION oracle (VERDICT r12 #2): the old form composed the
# whole funnel oracle once PER budget (3x every CTE — DuckDB inlines, so
# 3x the recursive encode, 3x the 16-gram explodes; it OOM'd at sf1 even
# with the sweep tool's chunked encode). Now the budget-independent
# prefix (everything through the per-source token masses `ns`) appears
# ONCE — exactly the Spark plan's shape — and only the O(#sources x
# #budgets) rate frame, the single survivor-sized mixture filter, and
# the 21 stage rows carry the budget dimension. `ma` LEFT JOINs from the
# budgets spine so an empty mixture still emits its zero rows (the
# Spark side's budgets_df left join).
_fb_head = _fo[: _fo.index("rates AS (")]
ORACLE["funnel_budget_sweep"] = (
    _fb_head
    + """budgets AS (SELECT unnest([2000.0, 5000.0, 20000.0]) AS budget),
rates AS (
  SELECT b.budget, ns.source,
         round(least(1.0, b.budget * (pow(n_s, 0.7)
               / sum(pow(n_s, 0.7)) OVER (PARTITION BY b.budget)) / n_s),
               6) AS r
  FROM ns CROSS JOIN budgets b
),
mix AS (
  SELECT r.budget, k.doc_id, k.n_tokens
  FROM dk k JOIN rates r USING (source)
  WHERE CAST(('0x' || substr(md5('mix:' || CAST(k.doc_id AS VARCHAR)),
       1, 8))::UBIGINT AS DOUBLE) / 4294967296.0 < r.r
),
ma AS MATERIALIZED (
  SELECT b.budget,
         CAST(coalesce(m.nd, 0) AS BIGINT) AS nd,
         CAST(coalesce(m.nt, 0) AS BIGINT) AS nt
  FROM budgets b
  LEFT JOIN (
    SELECT budget, count(*) AS nd, coalesce(sum(n_tokens), 0) AS nt
    FROM mix GROUP BY budget
  ) m USING (budget)
)
SELECT CAST(budget AS BIGINT) AS budget, stage_order, stage,
       n_docs, n_tokens, n_units
FROM (
  SELECT b.budget, CAST(1 AS BIGINT) AS stage_order, 'corpus' AS stage,
         c.nd AS n_docs, c.nt AS n_tokens, CAST(0 AS BIGINT) AS n_units
  FROM corpus c CROSS JOIN budgets b
  UNION ALL
  SELECT b.budget, CAST(2 AS BIGINT), 'stratified', s.nd, s.nt,
         CAST(0 AS BIGINT)
  FROM strat s CROSS JOIN budgets b
  UNION ALL
  SELECT b.budget, CAST(3 AS BIGINT), 'decontaminated', d.nd, d.nt,
         CAST(0 AS BIGINT)
  FROM decon d CROSS JOIN budgets b
  UNION ALL
  SELECT budget, CAST(4 AS BIGINT), 'mixture', nd, nt, CAST(0 AS BIGINT)
  FROM ma
  UNION ALL
  SELECT budget, CAST(5 AS BIGINT), 'sequences', CAST(0 AS BIGINT),
         CAST(0 AS BIGINT),
         CAST(CASE WHEN nt > 0 THEN (nt - 1) // 512 + 1 ELSE 0 END
           AS BIGINT)
  FROM ma
  UNION ALL
  SELECT budget, CAST(6 AS BIGINT), 'shards', CAST(0 AS BIGINT),
         CAST(0 AS BIGINT),
         CAST(CASE WHEN nt > 0 THEN ((nt - 1) // 512) // 16 + 1 ELSE 0 END
           AS BIGINT)
  FROM ma
  UNION ALL
  SELECT budget, CAST(7 AS BIGINT), 'workers', CAST(0 AS BIGINT),
         CAST(0 AS BIGINT),
         CAST(least(4, CASE WHEN nt > 0 THEN ((nt - 1) // 512) // 16 + 1
                       ELSE 0 END) AS BIGINT)
  FROM ma
)
ORDER BY budget, stage_order
"""
)


# =====================================================================
# Round 11: shuffled-pack loss-mask manifest, pHash image near-dup,
# shard integrity audit (VERDICT r10 #3/#4/#5)
# =====================================================================

@register(
    "shuffled_sequence_doc_spans",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
), sp AS (
  SELECT doc_id, source, n_tokens AS n, cum_prev,
         unnest(generate_series(cum_prev // 512,
                                (cum_prev + n_tokens - 1) // 512)) AS sq
  FROM c WHERE n_tokens > 0
)
SELECT CAST(sq AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       string_agg(
         CAST(doc_id AS VARCHAR) || ':' ||
         CAST(greatest(sq * 512, cum_prev) - sq * 512 AS VARCHAR) || ':' ||
         CAST(least((sq + 1) * 512, cum_prev + n)
              - greatest(sq * 512, cum_prev) AS VARCHAR),
         ' ' ORDER BY greatest(sq * 512, cum_prev)) AS spans
FROM sp GROUP BY 1
""",
)
def q_shuffled_sequence_doc_spans(spark, sf_dir):
    """Loss-mask / boundary-attention manifest for the SHUFFLED pack
    (operators/shuffle.py:shuffled_sequence_doc_spans — VERDICT r10 #3):
    per 512-token training sequence of pack_shuffled_sequences(seed=7),
    the ordered ``doc_id:start:len`` spans a trainer needs to reset
    attention at document boundaries, making the r10 shuffle chain
    loader-complete (sequence_doc_spans covers only the id-ordered
    per-source pack). ``n_sources`` is the per-sequence mixing proof at
    the offsets a loss mask actually consumes. Oracle's single global
    window is the same (md5, id) total order the bucketed Spark
    placement realizes."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffled_sequence_doc_spans,
    )

    return shuffled_sequence_doc_spans(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )


@register(
    "phash_signatures",
    oracle=r"""
WITH m AS (
  SELECT doc_id AS media_id, trim(text) AS s,
         CAST(length(trim(text)) AS BIGINT) AS n
  FROM documents WHERE length(trim(text)) > 0
),
p AS (
  SELECT media_id, j,
         unicode(substr(s, CAST((j * n) // 61 AS BIGINT) + 1, 1)) AS px
  FROM m, (SELECT unnest(generate_series(0, 60)) AS j)
),
l AS (
  SELECT media_id, j, px,
         lead(px) OVER (PARTITION BY media_id ORDER BY j) AS nx
  FROM p
)
SELECT media_id,
       CAST(sum(CASE WHEN px > nx THEN (1::BIGINT << CAST(j AS INT))
                ELSE 0 END) AS BIGINT) AS phash
FROM l WHERE j < 60 GROUP BY media_id
""",
)
def q_phash_signatures(spark, sf_dir):
    """Perceptual dHash signatures over the multimodal media table
    (dedup/phash.py:phash_signatures — VERDICT r10 #4): payload bytes
    (media_from_documents: utf-8 of text, the deterministic fake
    codec) decode to a 61-pixel code-point grid, bit j set when pixel j
    is brighter than pixel j+1 — the gradient fingerprint image dedup
    pipelines band for near-dup detection. Entire signature is ONE
    whole-stage-codegen projection (decode → substring → ascii → 60
    comparisons); the oracle recomputes it from the text the payload
    encodes (exact utf-8 round trip), the minhash_signatures_md5
    oracle-twin precedent."""
    from scikit_learn_imputer_spark.dedup.phash import phash_signatures
    from scikit_learn_imputer_spark.sources.multimodal import (
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return phash_signatures(media)


@register(
    "image_near_pairs",
    oracle=f"""
WITH sigs AS ({ORACLE['phash_signatures']})
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
""",
)
def q_image_near_pairs(spark, sf_dir):
    """Image near-duplicate pairs at Hamming ≤ 3 over the pHash
    fingerprints (dedup/phash.py:phash_near_pairs — VERDICT r10 #4),
    via the 4×15-bit-chunk pigeonhole banding shared with SimHash:
    pairs only form inside chunk buckets — sub-quadratic, never
    all-pairs — yet the ≤3 result is EXACT, which is why the
    brute-force pair-join oracle can check it. max_bucket is unbounded
    HERE because the oracle keeps every in-bucket pair (the
    simhash_near_pairs_md5 convention); the production skew-guard drop
    is unit-tested separately."""
    from scikit_learn_imputer_spark.dedup.phash import phash_near_pairs
    from scikit_learn_imputer_spark.sources.multimodal import (
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    out = phash_near_pairs(media, max_hamming=3, max_bucket=2**31)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "shard_integrity_audit",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
{_tokenized_seq_sql(512)}
SELECT source,
       CAST(seq_id // 16 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(sum(n_ids) AS BIGINT) AS n_ids,
       md5(string_agg(ids, '|' ORDER BY seq_id)) AS expected_md5,
       md5(string_agg(ids, '|' ORDER BY seq_id)) AS actual_md5,
       'ok' AS status
FROM tseqs GROUP BY 1, 2
""",
)
def q_shard_integrity_audit(spark, sf_dir):
    """Checksummed shard manifest + integrity audit (operators/
    tokenized.py:write_tokenized_shards_with_manifest /
    shard_integrity_audit — VERDICT r10 #5): the tokenized shards are
    written WITH a per-shard order-keyed content digest (md5 of the
    '|'-joined id strings in seq_id order, recomputed from the disk
    read-back so the manifest certifies landed bytes), then the audit
    re-reads the shards, recomputes every digest, and full-outer-diffs
    against the manifest. On an uncorrupted write every shard reads
    'ok' with expected == actual == the oracle's from-scratch SQL
    rebuild of the digest — so the driver hash-checks the whole
    write→manifest→recompute→diff loop down to the ids on disk. The
    corruption paths (digest_mismatch / missing_shard /
    unexpected_shard) are pinned by
    tests/test_tokenized.py::test_shard_integrity_audit_flags_corruption."""
    import atexit
    import shutil
    import tempfile

    from scikit_learn_imputer_spark.operators.tokenized import (
        shard_integrity_audit,
        tokenized_sequences,
        write_tokenized_shards_with_manifest,
    )

    tmp = tempfile.mkdtemp(prefix="sli_shard_integrity_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = tmp + "/shards"
    seqs = tokenized_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
    write_tokenized_shards_with_manifest(seqs, path, shard_size=16)
    return shard_integrity_audit(spark, path)


@register(
    "image_dedup_manifest",
    oracle=f"""
WITH sigs AS ({ORACLE['phash_signatures']}),
k AS (
  SELECT phash, min(media_id) AS keeper FROM sigs GROUP BY phash
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(CASE WHEN s.media_id <> k.keeper THEN 1 ELSE 0 END)
         AS BIGINT) AS n_dup_images,
       CAST(count(DISTINCT s.phash) AS BIGINT) AS n_fingerprints
FROM sigs s JOIN documents d ON s.media_id = d.doc_id JOIN k USING (phash)
GROUP BY 1
""",
)
def q_image_dedup_manifest(spark, sf_dir):
    """ACTION accounting for image dedup (the sequence_dedup_manifest
    shape applied to the pHash family): per source, how many media rows
    carry a fingerprint (empty payloads carry none and are excluded —
    phash_signatures contract), how many are Hamming-0 duplicates the
    min-id keeper rule would drop, and the distinct-fingerprint count
    the source collapses to — the numbers that size an image-dedup
    rewrite before touching bytes. Keeper resolution is one groupBy on
    the 8-byte fingerprint; no pair join at all for the exact-dup
    action (the ≤3-Hamming near-dup inventory is image_near_pairs)."""
    from scikit_learn_imputer_spark.dedup.phash import phash_signatures
    from scikit_learn_imputer_spark.sources.multimodal import (
        media_from_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    sigs = phash_signatures(media_from_documents(docs))
    keepers = sigs.groupBy("phash").agg(
        F.min("media_id").alias("__keeper")
    )
    joined = sigs.join(
        docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id"
    ).join(keepers, "phash")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum(
            F.when(F.col("media_id") != F.col("__keeper"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dup_images"),
        F.countDistinct("phash").cast("bigint").alias("n_fingerprints"),
    )


@register(
    "shuffled_tokenized_sequences",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
c AS (
  SELECT t.doc_id, e.ids, e.n_ids,
         CAST(coalesce(sum(e.n_ids) OVER (
              ORDER BY md5('7:' || CAST(t.doc_id AS VARCHAR)), t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM documents t JOIN edocs e USING (doc_id)
), tok AS (
  SELECT cum_prev + generate_subscripts(str_split(ids, ' '), 1) - 1 AS gpos,
         unnest(str_split(ids, ' ')) AS tid
  FROM c WHERE ids <> ''
), tseqs AS (
  SELECT CAST(gpos // 512 AS BIGINT) AS seq_id,
         CAST(count(*) AS BIGINT) AS n_ids,
         string_agg(tid, ' ' ORDER BY gpos) AS ids
  FROM tok GROUP BY 1
)
SELECT seq_id, n_ids, ids FROM tseqs
""",
)
def q_shuffled_tokenized_sequences(spark, sf_dir):
    """SHUFFLED training-sequence materialization (operators/
    tokenized.py:shuffled_tokenized_sequences): the actual token-id
    arrays of the shuffle-before-pack stream at seed 7 — what a loader
    reads once curriculum-free packing is in effect. Completes the
    shuffle chain end-to-end: placement (pack_shuffled_sequences,
    oracled), loss-mask spans (shuffled_sequence_doc_spans, oracled),
    and now the materialized ids, hash-checked to the full id strings
    against the oracle's from-scratch rebuild (recursive encode CTE +
    one global (md5, id)-ordered window — semantically the same total
    order the bucketed Spark placement realizes). Consistency of ids
    with the BPE-unit span manifest is pinned by
    tests/test_tokenized.py::test_shuffled_sequences_agree_with_spans."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        shuffled_tokenized_sequences,
    )

    seqs = shuffled_tokenized_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )
    return seqs.select(
        "seq_id",
        "n_ids",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids"),
    )


@register(
    "write_shuffled_shards",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
c AS (
  SELECT t.doc_id, e.ids, e.n_ids,
         CAST(coalesce(sum(e.n_ids) OVER (
              ORDER BY md5('7:' || CAST(t.doc_id AS VARCHAR)), t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM documents t JOIN edocs e USING (doc_id)
), tok AS (
  SELECT cum_prev + generate_subscripts(str_split(ids, ' '), 1) - 1 AS gpos,
         unnest(str_split(ids, ' ')) AS tid
  FROM c WHERE ids <> ''
), tseqs AS (
  SELECT CAST(gpos // 512 AS BIGINT) AS seq_id,
         CAST(count(*) AS BIGINT) AS n_ids,
         string_agg(tid, ' ' ORDER BY gpos) AS ids
  FROM tok GROUP BY 1
)
SELECT 'shuffled' AS stream, seq_id,
       CAST(seq_id // 16 AS BIGINT) AS shard_id,
       n_ids, ids
FROM tseqs
""",
)
def q_write_shuffled_shards(spark, sf_dir):
    """PHYSICAL writer for the SHUFFLED pack: the materialized
    shuffle-before-pack sequences land as partitionBy(stream, shard_id)
    parquet (16 sequences per shard, one file per shard dir — the
    write_tokenized_shards layout discipline with the global stream as
    the shard key), read BACK from disk and serialized — so the disk
    round trip of the curriculum-free training shards is hash-checked
    end to end against the oracle's from-scratch rebuild. Together with
    shuffled_tokenized_sequences (ids), shuffled_sequence_doc_spans
    (loss masks) and loader_resume_state (resume pointers), a DDP
    loader can now train from THIS layout with nothing recomputed."""
    from scikit_learn_imputer_spark.operators.tokenized import (
        shuffled_tokenized_sequences,
        write_tokenized_shards_readback,
    )

    seqs = shuffled_tokenized_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    ).withColumn("stream", F.lit("shuffled"))
    return write_tokenized_shards_readback(seqs, shard_size=16, shard_col="stream")


@register(
    "near_pairs_cells",
    anchor="tests/test_dedup_similarity.py::test_embedding_near_pairs_cells_subset_and_recall",
)
def q_near_pairs_cells(spark, sf_dir):
    """Cell-scoped embedding near-pair inventory at the BRP baseline's
    threshold (dedup/embedding.py:embedding_near_pairs_cells) — the
    SHIPPED sub-quadratic alternative to the Θ(n²) MLlib BRP-LSH cost
    model the sf1 scale-proof measured (BASELINE.md): KMeans cells with
    BOUNDED target size (auto nlist = ceil(n/256)), pairs only within
    cells, exact cosines on survivors. Rows-only: seeded KMeans cells
    are not SQL-expressible; the anchor test pins the exact-limit
    equality (nlist=1 == brute force), the subset property (never a
    false positive), and the recall floor on clustered vectors."""
    from scikit_learn_imputer_spark.dedup.embedding import (
        embedding_near_pairs_cells,
    )

    pairs = embedding_near_pairs_cells(
        _t(spark, sf_dir, "embeddings"), threshold=0.42
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine")
    )


@register(
    "shuffled_loader_resume",
    oracle=f"""
WITH RECURSIVE {_bpe_encode_ctes()},
c AS (
  SELECT t.doc_id, e.ids, e.n_ids,
         CAST(coalesce(sum(e.n_ids) OVER (
              ORDER BY md5('7:' || CAST(t.doc_id AS VARCHAR)), t.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM documents t JOIN edocs e USING (doc_id)
), tok AS (
  SELECT cum_prev + generate_subscripts(str_split(ids, ' '), 1) - 1 AS gpos
  FROM c WHERE ids <> ''
), tseqs AS (
  SELECT CAST(gpos // 512 AS BIGINT) AS seq_id FROM tok GROUP BY 1
), sh AS (
  SELECT CAST(seq_id // 16 AS BIGINT) AS shard_id,
         CAST(count(*) AS BIGINT) AS n_sequences,
         CAST(min(seq_id) + 1 AS BIGINT) AS first_position
  FROM tseqs GROUP BY 1
),
per AS (
  SELECT shard_id, n_sequences, first_position,
         CAST(shard_id % 4 AS BIGINT) AS worker_id,
         CAST(coalesce(sum(n_sequences) OVER (
              PARTITION BY shard_id % 4 ORDER BY shard_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM sh
),
tot AS (
  SELECT worker_id, CAST(sum(n_sequences) AS BIGINT) AS total
  FROM per GROUP BY worker_id
),
hit AS (
  SELECT worker_id, shard_id, cum_prev, first_position
  FROM per WHERE cum_prev <= 7 AND 7 < cum_prev + n_sequences
)
SELECT CAST(t.worker_id AS BIGINT) AS worker_id,
       CAST(least(7, total) AS BIGINT) AS consumed,
       CAST(coalesce(h.shard_id, -1) AS BIGINT) AS resume_shard,
       CAST(coalesce(7 - h.cum_prev, -1) AS BIGINT) AS resume_offset,
       CAST(coalesce(h.first_position + (7 - h.cum_prev), -1) AS BIGINT)
         AS resume_position,
       total <= 7 AS exhausted
FROM tot t LEFT JOIN hit h USING (worker_id)
""",
)
def q_shuffled_loader_resume(spark, sf_dir):
    """Crash-resume plan over the SHUFFLED tokenized layout: the exact
    (shard, offset, position) each of 4 DDP ranks resumes at after 7
    lockstep steps, computed from the O(#shards) manifest of the
    write_shuffled_shards layout (shard = seq_id // 16, sequences in
    seq_id order). COUNTS-ONLY dataflow: the sequence manifest is
    derived from the Arrow BPE token-COUNT pass + the bucketed
    shuffle placement alone — the token ids are never materialized,
    because resume is manifest arithmetic, exactly the scale shape a
    100-TB loader needs (byte parity of the layout itself is covered
    by shuffled_tokenized_sequences / write_shuffled_shards). One row
    per rank that OWNS shards (matching the operator: a rank with
    none never appears in the manifest); the corpus is never re-read
    to recover a loader."""
    from scikit_learn_imputer_spark.functions.bpe import (
        with_bpe_token_counts,
    )
    from scikit_learn_imputer_spark.operators.shuffle import (
        _shuffled_span_rows,
        loader_resume_state,
    )

    counted = with_bpe_token_counts(_t(spark, sf_dir, "documents"))
    spans, _, _ = _shuffled_span_rows(
        counted,
        seq_len=512,
        seed=7,
        id_col="doc_id",
        text_col="text",
        source_col="source",
        token_count_col="n_bpe_tokens",
        bucket_chars=2,
    )
    seqs = spans.select((F.col("seq_id") + 1).alias("position")).distinct()
    return loader_resume_state(
        seqs, shard_size=16, num_workers=4, global_step=7
    )


_GATE_FLAGS_SQL = r"""
WITH rep0 AS ({rep}), tq0 AS ({tq}),
bg AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 < 2)
  )
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                  || ' ' || w[i+4])) AS g
    FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS w
          FROM documents WHERE doc_id % 100 >= 2)
  ) WHERE g IN (SELECT g FROM bg)
),
wf AS (
  SELECT r.doc_id, r.n_tokens,
         (d.lang <> 'en') AS fail_lang,
         NOT (t.q_score >= 0.5 AND t.q_tokens >= 20) AS fail_quality,
         NOT (r.n_tokens BETWEEN 30 AND 95
              AND r.top2_frac <= 0.12 AND r.top3_frac <= 0.10
              AND r.dup5_frac <= 0.15 AND r.dup8_frac <= 0.10) AS fail_gopher,
         (c.doc_id IS NOT NULL) AS fail_decontam
  FROM rep0 r
  JOIN tq0 t USING (doc_id)
  JOIN documents d USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
  WHERE d.doc_id % 100 >= 2
),
x AS (
  SELECT n_tokens, fail_lang, fail_quality, fail_gopher, fail_decontam,
         CAST(fail_lang AS INT) + CAST(fail_quality AS INT)
         + CAST(fail_gopher AS INT) + CAST(fail_decontam AS INT) AS n_fails
  FROM wf
)"""
#: The corpus-wide per-doc gate-flag CTE shared by the gate_ablation and
#: gate_overlap_matrix oracles ({rep}/{tq} filled after registration).


def _gate_flag_frame(spark, sf_dir):
    """Doc-level gate flags, corpus-wide — the shared input of
    gate_ablation and gate_overlap_matrix: one row per corpus doc with
    n_tokens, the four independent fail flags (lang / quality / Gopher
    / benchmark-5-gram contamination, via the SAME shared predicates
    the waterfall applies), and n_fails.

    One-pass signal projection (optimization round 14, guide §2.4):
    lang, quality and Gopher flags are all per-doc functions of the
    text, so they ride ONE corpus scan — the filter_waterfall fusion
    applied here (quality_features projection + the single Arrow
    masses pass + the same rounded fractions repetition_signals
    emits). Only the contamination membership — genuinely corpus-level
    — remains a join (the md5-digest semi join, attached with one
    doc_id equi join). The former shape derived each signal from its
    own corpus subtree and met them in three doc-keyed joins: 10
    document scans and 14 Exchanges for flags a single projection can
    carry."""
    from scikit_learn_imputer_spark.functions.repetition import (
        repetition_masses_udf,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)

    t = F.trim(F.col("text"))
    ntok = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, "\\s+")))
        .cast("bigint")
    )
    masses = repetition_masses_udf((2, 3), (5, 8)).asNondeterministic()
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    frac = lambda j: F.round(  # noqa: E731
        F.coalesce(F.element_at(F.col("__m"), j), F.lit(0)).cast("double")
        / denom,
        9,
    )
    # quality_features floors the signal projection's parallelism
    # internally (r15): the one-partition corpus scan would otherwise
    # serialize the Arrow masses pass + quality regexes on one core.
    sig = (
        quality_features(corpus.select("doc_id", "lang", "text"))
        .select(
            "doc_id",
            (F.col("lang") != "en").alias("fail_lang"),
            ntok.alias("n_tokens"),
            masses(F.col("text")).alias("__m"),
            "q_tokens",
            F.round("q_score", 6).alias("q_score"),
        )
        .select(
            "doc_id",
            "fail_lang",
            "n_tokens",
            (~_quality_pass_cond()).alias("fail_quality"),
            frac(1).alias("top2_frac"),
            frac(2).alias("top3_frac"),
            frac(3).alias("dup5_frac"),
            frac(4).alias("dup8_frac"),
        )
        .select(
            "doc_id",
            "fail_lang",
            "n_tokens",
            "fail_quality",
            (~_gopher_pass_cond()).alias("fail_gopher"),
        )
    )
    contam_ids = _contam_doc_ids(corpus, bench)
    return (
        sig.join(
            contam_ids.withColumn("__c", F.lit(True)), "doc_id", "left"
        )
        .select(
            "n_tokens",
            "fail_lang",
            "fail_quality",
            "fail_gopher",
            F.coalesce(F.col("__c"), F.lit(False)).alias("fail_decontam"),
        )
        .withColumn(
            "n_fails",
            F.col("fail_lang").cast("int")
            + F.col("fail_quality").cast("int")
            + F.col("fail_gopher").cast("int")
            + F.col("fail_decontam").cast("int"),
        )
    )


@register(
    "gate_ablation",
    oracle=_GATE_FLAGS_SQL
    + r""",
one AS MATERIALIZED (
  SELECT
    CAST(count(*) FILTER (WHERE fail_lang) AS BIGINT) AS nf_lang,
    CAST(count(*) FILTER (WHERE fail_lang AND n_fails = 1) AS BIGINT)
      AS uf_lang,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE fail_lang), 0) AS BIGINT)
      AS tf_lang,
    CAST(count(*) FILTER (WHERE fail_quality) AS BIGINT) AS nf_quality,
    CAST(count(*) FILTER (WHERE fail_quality AND n_fails = 1) AS BIGINT)
      AS uf_quality,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE fail_quality), 0) AS BIGINT)
      AS tf_quality,
    CAST(count(*) FILTER (WHERE fail_gopher) AS BIGINT) AS nf_gopher,
    CAST(count(*) FILTER (WHERE fail_gopher AND n_fails = 1) AS BIGINT)
      AS uf_gopher,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE fail_gopher), 0) AS BIGINT)
      AS tf_gopher,
    CAST(count(*) FILTER (WHERE fail_decontam) AS BIGINT) AS nf_decontam,
    CAST(count(*) FILTER (WHERE fail_decontam AND n_fails = 1) AS BIGINT)
      AS uf_decontam,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE fail_decontam), 0) AS BIGINT)
      AS tf_decontam,
    CAST(count(*) FILTER (WHERE n_fails > 0) AS BIGINT) AS nf__any,
    CAST(count(*) FILTER (WHERE n_fails = 1) AS BIGINT) AS uf__any,
    CAST(coalesce(sum(n_tokens) FILTER (WHERE n_fails > 0), 0) AS BIGINT)
      AS tf__any
  FROM x
)
SELECT gate, n_fail, n_unique_fail, n_tokens_fail FROM (
  SELECT 'lang' AS gate, nf_lang AS n_fail, uf_lang AS n_unique_fail,
         tf_lang AS n_tokens_fail FROM one
  UNION ALL
  SELECT 'quality', nf_quality, uf_quality, tf_quality FROM one
  UNION ALL
  SELECT 'gopher', nf_gopher, uf_gopher, tf_gopher FROM one
  UNION ALL
  SELECT 'decontam', nf_decontam, uf_decontam, tf_decontam FROM one
  UNION ALL
  SELECT '_any', nf__any, uf__any, tf__any FROM one
)
""",
)
def q_gate_ablation(spark, sf_dir):
    """Gate ablation matrix — the tuning complement of filter_waterfall.

    The waterfall attributes each doc to its FIRST failing stage
    (survivor-chained), which tells you what the pipeline drops but not
    which gate to tune: a doc failing lang AND gopher is invisible to
    the gopher row there. This query evaluates every independent
    doc-level gate (lang, quality, Gopher repetition, benchmark 5-gram
    contamination — same thresholds and the same doc_id%100 bench/corpus
    split as the waterfall) CORPUS-WIDE and reports, per gate: total
    docs failing it, docs failing ONLY it (the exact mass a pipeline
    would regain by removing or loosening that one gate — the ablation
    number), and the failing token mass; plus an `_any` roll-up (docs
    failing >=1 gate / exactly 1 gate). Exact dedup is deliberately
    excluded: keeper choice depends on which other docs survive, so it
    has no gate-local ablation semantics.

    Scale shape: every signal is the same map-side projection/explode
    the waterfall uses, the contamination check is an md5-digest
    left-semi join (never raw-gram strings on the wire), the gate flags
    meet in equi joins on doc_id, and the ablation rolls up through
    ONE partial-aggregated stack pass — output is O(#gates). Unlike the
    waterfall the gates run corpus-wide by definition (ablation needs
    every gate's verdict on every doc), so this costs the un-chained
    waterfall; at 100 TB you run it on a sample when tuning thresholds.
    """
    x = _gate_flag_frame(spark, sf_dir)

    # ONE global aggregate (always exactly one row, even on an empty or
    # bench-only corpus — matching the oracle's five UNION ALL global
    # aggregates, which emit zero rows regardless), then a 1-row stack
    # into the 5 output rows. Cheaper than a groupBy over a stacked
    # 4x frame AND empty-safe.
    gates = [
        ("lang", F.col("fail_lang")),
        ("quality", F.col("fail_quality")),
        ("gopher", F.col("fail_gopher")),
        ("decontam", F.col("fail_decontam")),
        ("_any", F.col("n_fails") > 0),
    ]
    aggs = []
    for name, flag in gates:
        aggs += [
            F.coalesce(F.sum(flag.cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"nf_{name}"),
            F.coalesce(
                F.sum((flag & (F.col("n_fails") == 1)).cast("bigint")),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"uf_{name}"),
            F.coalesce(F.sum(F.when(flag, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias(f"tf_{name}"),
        ]
    one = x.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', nf_{name}, uf_{name}, tf_{name}" for name, _ in gates
    )
    return one.selectExpr(
        f"stack({len(gates)}, {stack_args})"
        " AS (gate, n_fail, n_unique_fail, n_tokens_fail)"
    )


ORACLE["gate_ablation"] = (
    ORACLE["gate_ablation"]
    .replace("{rep}", ORACLE["repetition_signals"])
    .replace("{tq}", ORACLE["text_quality"])
)


@register(
    "shuffled_cu_seqlens",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
), sp AS (
  SELECT doc_id, n_tokens AS n, cum_prev,
         unnest(generate_series(cum_prev // 512,
                                (cum_prev + n_tokens - 1) // 512)) AS sq
  FROM c WHERE n_tokens > 0
)
SELECT CAST(sq AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(least((sq + 1) * 512, cum_prev + n) - sq * 512) AS BIGINT)
         AS seq_total,
       '0 ' || string_agg(
         CAST(least((sq + 1) * 512, cum_prev + n) - sq * 512 AS VARCHAR),
         ' ' ORDER BY greatest(sq * 512, cum_prev)) AS cu_seqlens
FROM sp GROUP BY 1
""",
)
def q_shuffled_cu_seqlens(spark, sf_dir):
    """Varlen-attention boundary vectors for the shuffled pack
    (operators/shuffle.py:shuffled_cu_seqlens): per 512-token training
    sequence of pack_shuffled_sequences(seed=7), the cumulative doc
    boundary offsets ``0 e1 ... seq_total`` that varlen flash-attention
    kernels take per batch — the kernel-ready packaging of
    shuffled_sequence_doc_spans (spans keep doc_id provenance for loss
    masks; this is the boundary vector itself). Exact-integer: spans
    tile each concat-and-cut sequence contiguously, so the vector is 0
    followed by each span's in-sequence end offset in placement order.
    Oracle shares the spans oracle's single (md5, id)-ordered window;
    the Spark side reuses the bucketed O(256)-frame placement."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        shuffled_cu_seqlens,
    )

    return shuffled_cu_seqlens(
        _t(spark, sf_dir, "documents"), seq_len=512, seed=7
    )


@register(
    "shard_source_mix",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_tokens,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_prev
  FROM t
), sp AS (
  SELECT source, n_tokens AS n, cum_prev,
         unnest(generate_series(cum_prev // 512,
                                (cum_prev + n_tokens - 1) // 512)) AS sq
  FROM c WHERE n_tokens > 0
), per AS (
  SELECT CAST(sq // 16 AS BIGINT) AS shard_id, source,
         CAST(sum(least((sq + 1) * 512, cum_prev + n)
                  - greatest(sq * 512, cum_prev)) AS BIGINT) AS n_tokens
  FROM sp GROUP BY 1, 2
)
SELECT shard_id, source, n_tokens,
       round(CAST(n_tokens AS DOUBLE)
             / sum(n_tokens) OVER (PARTITION BY shard_id), 6) AS token_share
FROM per
""",
)
def q_shard_source_mix(spark, sf_dir):
    """Artifact-level mixture audit (operators/shuffle.py:
    shard_source_mix): per training SHARD of the shuffled layout
    (shard_id = seq_id // 16, the write_shuffled_shards grouping), the
    token mass and share each source contributes — what that shard file
    actually holds, read before rebuilding, shipping, or deleting it.
    Completes the mixture-audit ladder: stream level
    (mixture_shuffled_pack_audit), sequence level
    (pack_mixing_histogram), shard level (this). Span rows aggregate
    straight to the O(#shards x #sources) frame; the share window
    partitions that tiny frame only."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        shard_source_mix,
    )

    return shard_source_mix(
        _t(spark, sf_dir, "documents"), seq_len=512, shard_size=16, seed=7
    )


@register(
    "shuffled_repack_delta",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(str_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS k,
         doc_id % 7 <> 0 AS in_a,
         substr(md5('takedown:' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
           AS in_b
  FROM documents
),
ca AS (
  SELECT doc_id, n, in_b,
         CAST(coalesce(sum(n) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM t WHERE in_a AND n > 0
),
cb AS (
  SELECT doc_id, n, in_a,
         CAST(coalesce(sum(n) OVER (ORDER BY k, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM t WHERE in_b AND n > 0
),
s AS (
  SELECT (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM ca) AS ta,
         (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM cb) AS tb,
         (SELECT min(cum) FROM ca WHERE NOT in_b) AS rem,
         (SELECT min(cum) FROM cb WHERE NOT in_a) AS adds
),
r AS (
  SELECT CAST((ta + 511) // 512 AS BIGINT) AS n_seqs_before,
         CAST((tb + 511) // 512 AS BIGINT) AS n_seqs_after,
         CAST(CASE WHEN rem IS NULL AND adds IS NULL
              THEN (ta + 511) // 512
              ELSE least(coalesce(rem, ta), coalesce(adds, tb)) // 512
              END AS BIGINT) AS n_seqs_unchanged
  FROM s
)
SELECT n_seqs_before, n_seqs_after, n_seqs_unchanged,
       CAST(n_seqs_after - n_seqs_unchanged AS BIGINT) AS n_seqs_rewritten,
       round(CASE WHEN n_seqs_before > 0
             THEN CAST(n_seqs_unchanged AS DOUBLE) / n_seqs_before
             ELSE 0.0 END, 6) AS unchanged_frac
FROM r
""",
)
def q_shuffled_repack_delta(spark, sf_dir):
    """Write amplification of a corpus mutation under the SHUFFLED
    layout — the honest cost of shuffle-before-pack, measured. Same
    A/B membership snapshots as tokenized_repack_delta (A = pre-ingest
    doc_id%7 != 0, B = post-ingest-and-takedown md5 draw), same
    sequence-granular question: how many 512-token training sequences
    of the seed-7 shuffled stream survive byte-identical (everything
    strictly before the FIRST membership change's stream position) and
    how many a rewrite job must schedule. Because the md5 permutation
    scatters ids, the first changed doc lands near the stream FRONT
    with high probability, so unchanged_frac ~ 0 — versus the
    id-ordered layout's suffix-only rewrite
    (rewrite_tokenized_shards_incremental). That contrast IS the
    design tradeoff: global shuffle buys mixing and costs incremental
    rewritability; pipelines re-shuffle per epoch anyway, so shuffled
    shards are rebuild artifacts, not incremental ones — this query
    puts the number behind that policy. COUNTS-ONLY dataflow: two
    bucketed placements (pack_shuffled_sequences on each snapshot),
    one unioned global aggregate of four scalars — no id
    materialization, no data-sized window, no scalar cross join."""
    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    L = 512
    d = _t(spark, sf_dir, "documents")
    in_a = F.col("doc_id") % 7 != 0
    in_b = (
        F.substring(
            F.md5(F.concat(F.lit("takedown:"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
        != "0"
    )
    cum = (F.col("seq_id") * L + F.col("seq_offset")).cast("bigint")
    ca = (
        pack_shuffled_sequences(d.filter(in_a), seq_len=L, seed=7)
        .filter(F.col("n_tokens") > 0)
        .select(
            F.lit("a").alias("__side"),
            F.col("n_tokens").alias("__n"),
            cum.alias("__cum"),
            (~in_b).alias("__delta"),
        )
    )
    cb = (
        pack_shuffled_sequences(d.filter(in_b), seq_len=L, seed=7)
        .filter(F.col("n_tokens") > 0)
        .select(
            F.lit("b").alias("__side"),
            F.col("n_tokens").alias("__n"),
            cum.alias("__cum"),
            (~in_a).alias("__delta"),
        )
    )
    s = ca.unionByName(cb).agg(
        F.coalesce(
            F.sum(F.when(F.col("__side") == "a", F.col("__n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("ta"),
        F.coalesce(
            F.sum(F.when(F.col("__side") == "b", F.col("__n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("tb"),
        F.min(
            F.when((F.col("__side") == "a") & F.col("__delta"), F.col("__cum"))
        ).alias("rem"),
        F.min(
            F.when((F.col("__side") == "b") & F.col("__delta"), F.col("__cum"))
        ).alias("adds"),
    )
    before = F.floor((F.col("ta") + 511) / L).cast("bigint")
    after = F.floor((F.col("tb") + 511) / L).cast("bigint")
    unchanged = (
        F.when(F.col("rem").isNull() & F.col("adds").isNull(), before)
        .otherwise(
            F.floor(
                F.least(
                    F.coalesce(F.col("rem"), F.col("ta")),
                    F.coalesce(F.col("adds"), F.col("tb")),
                )
                / L
            )
        )
        .cast("bigint")
    )
    r = s.select(
        before.alias("n_seqs_before"),
        after.alias("n_seqs_after"),
        unchanged.alias("n_seqs_unchanged"),
    )
    return r.select(
        "n_seqs_before",
        "n_seqs_after",
        "n_seqs_unchanged",
        (F.col("n_seqs_after") - F.col("n_seqs_unchanged"))
        .cast("bigint")
        .alias("n_seqs_rewritten"),
        F.round(
            F.when(
                F.col("n_seqs_before") > 0,
                F.col("n_seqs_unchanged").cast("double")
                / F.col("n_seqs_before"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("unchanged_frac"),
    )


_GATE_NAMES = ("lang", "quality", "gopher", "decontam")
# VERDICT r12 #2: the old form UNION-ALL'd 12 GLOBAL aggregates straight
# off `x`, so DuckDB (which inlines CTEs) re-evaluated the whole flag
# chain — including the 5-gram contamination explode — 12 times over;
# at sf1 that was the one 900s oracle timeout of the sweep. Now ONE
# aggregate computes all 16 counters into a 1-row MATERIALIZED CTE
# (mirroring the Spark plan's single partial-aggregate pass) and the
# 12 matrix rows are trivial selects from it.
_GATE_OVERLAP_AGGS = ",\n    ".join(
    [
        f"CAST(count(*) FILTER (WHERE fail_{a}) AS BIGINT) AS nf_{a}"
        for a in _GATE_NAMES
    ]
    + [
        f"CAST(count(*) FILTER (WHERE fail_{a} AND fail_{b}) AS BIGINT)"
        f" AS b_{a}_{b}"
        for a in _GATE_NAMES
        for b in _GATE_NAMES
        if a != b
    ]
)
_GATE_OVERLAP_SELECTS = " UNION ALL".join(
    f"""
  SELECT '{a}' AS gate, '{b}' AS other, nf_{a} AS n_fail,
         b_{a}_{b} AS n_both,
         round(CASE WHEN nf_{a} > 0
               THEN CAST(b_{a}_{b} AS DOUBLE) / nf_{a}
               ELSE 0.0 END, 6) AS containment
  FROM one"""
    for a in _GATE_NAMES
    for b in _GATE_NAMES
    if a != b
)


@register(
    "gate_overlap_matrix",
    oracle=_GATE_FLAGS_SQL
    + ",\none AS MATERIALIZED (\n  SELECT\n    "
    + _GATE_OVERLAP_AGGS
    + "\n  FROM x\n)"
    + "\nSELECT gate, other, n_fail, n_both, containment FROM ("
    + _GATE_OVERLAP_SELECTS
    + "\n)",
)
def q_gate_overlap_matrix(spark, sf_dir):
    """Pairwise gate redundancy — the view that NAMES the shadowing
    gate. gate_ablation shows the quality gate has zero unique fails;
    this matrix shows which other gate already kills its docs: for
    every ordered gate pair, how many docs fail `gate`, how many of
    those also fail `other`, and the containment fraction
    n_both/n_fail (containment 1.0 = `gate` is fully redundant with
    `other` on this corpus — a candidate to drop from the hot path or
    to re-tune). Same corpus-wide flags, thresholds, and bench split
    as gate_ablation (shared _gate_flag_frame / _GATE_FLAGS_SQL).

    Scale shape: the 16 pair/single counts reduce through ONE global
    partial aggregate over the flag frame (no pair join, no stacked
    shuffle — the doc never leaves its partition until 16 counters
    do); the 12-row matrix is a 1-row stack. Empty-corpus safe like
    the reworked ablation."""
    x = _gate_flag_frame(spark, sf_dir)
    aggs = []
    for g in _GATE_NAMES:
        aggs.append(
            F.coalesce(F.sum(F.col(f"fail_{g}").cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"nf_{g}")
        )
    for a in _GATE_NAMES:
        for b in _GATE_NAMES:
            if a != b:
                aggs.append(
                    F.coalesce(
                        F.sum(
                            (
                                F.col(f"fail_{a}") & F.col(f"fail_{b}")
                            ).cast("bigint")
                        ),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias(f"b_{a}_{b}")
                )
    one = x.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', nf_{a}, b_{a}_{b}"
        for a in _GATE_NAMES
        for b in _GATE_NAMES
        if a != b
    )
    rows = one.selectExpr(
        f"stack(12, {stack_args}) AS (gate, other, n_fail, n_both)"
    )
    return rows.select(
        "gate",
        "other",
        "n_fail",
        "n_both",
        F.round(
            F.when(
                F.col("n_fail") > 0,
                F.col("n_both").cast("double") / F.col("n_fail"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("containment"),
    )


ORACLE["gate_overlap_matrix"] = (
    ORACLE["gate_overlap_matrix"]
    .replace("{rep}", ORACLE["repetition_signals"])
    .replace("{tq}", ORACLE["text_quality"])
)


@register(
    "dup_rate_by_quality",
    oracle=_strat_sample_sql(_FP_BASE_COL)
    + r""",
cnt AS (SELECT fp, count(*) AS c FROM base GROUP BY fp),
b AS (
  SELECT base.source, base.n_tokens,
         CAST(1 + len(list_filter(thr.ts, t -> base.s >= t)) AS INTEGER)
           AS decile,
         (cnt.c > 1) AS is_dup
  FROM base JOIN thr USING (source) JOIN cnt USING (fp)
)
SELECT source, decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(coalesce(sum(CASE WHEN is_dup THEN n_tokens END), 0) AS BIGINT)
         AS dup_tokens,
       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_frac
FROM b GROUP BY source, decile
""",
)
def q_dup_rate_by_quality(spark, sf_dir):
    """Duplicate concentration by quality decile — the evidence behind
    the dedup-vs-filter ORDERING decision. If duplicates concentrate in
    low-quality mass, quality filtering first shrinks the (expensive)
    dedup input nearly for free; if the best deciles carry the
    duplicate mass (boilerplate that scores well), dedup must run
    first or the quality sampler keeps N copies. Reports per (source,
    quality decile — the same per-source broadcast-percentile buckets
    stratified_quality_sample keeps by): docs, exact-duplicate docs
    (normalized-text fingerprint shared by >1 doc corpus-wide), their
    token mass, and the duplicate fraction.

    Scale shape: one fingerprint groupBy (the exact-dedup shuffle the
    pipeline pays anyway), the O(#sources) percentile broadcast, and
    equi joins on doc_id/fingerprint — no pair joins, no windows."""
    from scikit_learn_imputer_spark.operators.split import (
        stratified_quality_sample,
    )

    d = _t(spark, sf_dir, "documents")
    s = stratified_quality_sample(d).select(
        "doc_id", "source", "n_tokens", "decile"
    )
    fps = d.select("doc_id", fingerprint_col(F.col("text")).alias("__fp"))
    cnt = fps.groupBy("__fp").agg(F.count(F.lit(1)).alias("__c"))
    flags = fps.join(cnt, "__fp").select(
        "doc_id", (F.col("__c") > 1).alias("__dup")
    )
    return (
        s.join(flags, "doc_id")
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__dup").cast("bigint"))
            .cast("bigint")
            .alias("dup_docs"),
            F.coalesce(
                F.sum(F.when(F.col("__dup"), F.col("n_tokens"))), F.lit(0)
            )
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_docs").cast("double") / F.col("n_docs"), 6),
        )
    )


ORACLE["dup_rate_by_quality"] = ORACLE["dup_rate_by_quality"].replace(
    "{tq}", ORACLE["text_quality"]
)


@register(
    "dedup_order_sensitivity",
    oracle=_strat_sample_sql(_FP_BASE_COL)
    + r""",
k AS (
  SELECT base.doc_id, base.n_tokens, base.fp,
         CAST(('0x' || substr(md5('strat:' || CAST(base.doc_id AS VARCHAR)),
              1, 8))::UBIGINT AS DOUBLE) / 4294967296.0
           < (CAST(1 + len(list_filter(thr.ts, t -> base.s >= t)) AS INTEGER)
              * CAST(1 + len(list_filter(thr.ts, t -> base.s >= t)) AS INTEGER))
             / 100.0 AS kept
  FROM base JOIN thr USING (source)
),
ka AS (SELECT fp, min(doc_id) AS kid_all FROM k GROUP BY fp),
ks AS (SELECT fp, min(doc_id) AS kid_smp FROM k WHERE kept GROUP BY fp),
f AS (
  SELECT k.doc_id, k.n_tokens, k.kept,
         (k.doc_id = ka.kid_all) AS ik_all,
         (k.doc_id = coalesce(ks.kid_smp, -1)) AS ik_smp
  FROM k JOIN ka USING (fp) LEFT JOIN ks USING (fp)
)
SELECT 'dedup_first' AS pipeline_order,
       CAST(count(*) AS BIGINT) AS dedup_input_docs,
       CAST(coalesce(sum(CASE WHEN ik_all THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS sample_input_docs,
       CAST(coalesce(sum(CASE WHEN ik_all AND kept THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS final_docs,
       CAST(coalesce(sum(CASE WHEN ik_all AND kept THEN n_tokens END), 0)
         AS BIGINT) AS final_tokens
FROM f
UNION ALL
SELECT 'sample_first',
       CAST(coalesce(sum(CASE WHEN kept THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN ik_smp THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN ik_smp THEN n_tokens END), 0) AS BIGINT)
FROM f
""",
)
def q_dedup_order_sensitivity(spark, sf_dir):
    """The dedup-vs-sample ordering decision, SIMULATED BOTH WAYS on
    the same corpus with the same primitives (min-id exact dedup,
    stratified_quality_sample's deterministic decile^2/100 keep draw):
    per pipeline order, the dedup stage's input size (its cost proxy),
    the sample stage's input size, and the exact final doc/token
    yield. The two orders genuinely differ doc-by-doc: dedup-first
    LOSES a duplicated text entirely when its min-id keeper fails the
    sample draw (another copy might have passed); sample-first keeps
    exactly one sampled copy per surviving fingerprint but pays the
    sampler budget for duplicates (dup_rate_by_quality shows where
    that mass sits). One fingerprint groupBy (twice, second over the
    sampled subset), the percentile broadcast, equi joins, and ONE
    global 8-counter aggregate stacked into the 2 report rows — no
    pair joins, empty-corpus safe on both engines."""
    from scikit_learn_imputer_spark.operators.split import (
        stratified_quality_sample,
    )

    d = _t(spark, sf_dir, "documents")
    s = stratified_quality_sample(d).select("doc_id", "n_tokens", "kept")
    fps = d.select("doc_id", fingerprint_col(F.col("text")).alias("__fp"))
    k = s.join(fps, "doc_id")
    ka = k.groupBy("__fp").agg(F.min("doc_id").alias("__kid_all"))
    ks = (
        k.filter(F.col("kept"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("__kid_smp"))
    )
    f = (
        k.join(ka, "__fp")
        .join(ks, "__fp", "left")
        .select(
            "n_tokens",
            "kept",
            (F.col("doc_id") == F.col("__kid_all")).alias("__ik_all"),
            (
                F.col("doc_id") == F.coalesce(F.col("__kid_smp"), F.lit(-1))
            ).alias("__ik_smp"),
        )
    )
    # ONE aggregate computes all eight counters, then a 1-row stack —
    # the gate_overlap_matrix shape. A union of two .agg() branches
    # would plan the whole upstream (percentiles, fingerprint groupBy,
    # keeper joins) twice: Catalyst shares nothing across union
    # branches.
    big = lambda c: F.coalesce(F.sum(c), F.lit(0)).cast("bigint")  # noqa: E731
    one = f.agg(
        big(F.lit(1)).alias("n_all"),
        big(F.col("kept").cast("bigint")).alias("n_kept"),
        big(F.col("__ik_all").cast("bigint")).alias("n_keepers_all"),
        big((F.col("__ik_all") & F.col("kept")).cast("bigint")).alias(
            "fd_a"
        ),
        big(
            F.when(F.col("__ik_all") & F.col("kept"), F.col("n_tokens"))
        ).alias("ft_a"),
        big(F.col("__ik_smp").cast("bigint")).alias("fd_b"),
        big(F.when(F.col("__ik_smp"), F.col("n_tokens"))).alias("ft_b"),
    )
    return one.selectExpr(
        "stack(2,"
        " 'dedup_first', n_all, n_keepers_all, fd_a, ft_a,"
        " 'sample_first', n_kept, n_all, fd_b, ft_b)"
        " AS (pipeline_order, dedup_input_docs, sample_input_docs,"
        " final_docs, final_tokens)"
    )


ORACLE["dedup_order_sensitivity"] = ORACLE[
    "dedup_order_sensitivity"
].replace("{tq}", ORACLE["text_quality"])


@register(
    "scrub_vs_drop_tradeoff",
    oracle="""
WITH s AS ({scrub})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.n_tokens_after < s.n_tokens_before
                THEN 1 ELSE 0 END) AS BIGINT) AS contam_docs,
       CAST(coalesce(sum(CASE WHEN s.n_tokens_after < s.n_tokens_before
                THEN s.n_tokens_before END), 0) AS BIGINT)
         AS drop_loss_tokens,
       CAST(coalesce(sum(s.n_tokens_before - s.n_tokens_after), 0)
         AS BIGINT) AS scrub_loss_tokens,
       CAST(coalesce(sum(CASE WHEN s.n_tokens_after < s.n_tokens_before
                THEN s.n_tokens_after END), 0) AS BIGINT)
         AS recovered_tokens,
       round(CASE WHEN coalesce(sum(CASE WHEN s.n_tokens_after
                                    < s.n_tokens_before
                                    THEN s.n_tokens_before END), 0) > 0
             THEN CAST(coalesce(sum(CASE WHEN s.n_tokens_after
                                    < s.n_tokens_before
                                    THEN s.n_tokens_after END), 0) AS DOUBLE)
                  / sum(CASE WHEN s.n_tokens_after < s.n_tokens_before
                        THEN s.n_tokens_before END)
             ELSE 0.0 END, 6) AS recovered_frac
FROM s JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def q_scrub_vs_drop_tradeoff(spark, sf_dir):
    """The decontamination POLICY decision, per source: dropping every
    contaminated doc loses its full token mass (drop_loss_tokens);
    span-scrubbing loses only the contaminated 5-gram spans
    (scrub_loss_tokens) and recovers the rest (recovered_tokens,
    recovered_frac of the would-be-dropped mass). Read next to
    contamination_severity: sources whose contamination is a few
    incidental grams recover ~everything under scrub; wholesale-leak
    sources recover little and should drop. Composes the oracled
    scrub_benchmark_spans rebuild with one per-source aggregate —
    digest semi joins only, output O(#sources)."""
    from scikit_learn_imputer_spark.dedup.spans import scrub_benchmark_spans

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 100 < 2)
    corpus = d.filter(F.col("doc_id") % 100 >= 2)
    s = scrub_benchmark_spans(corpus, bench, n=5).select(
        "doc_id", "n_tokens_before", "n_tokens_after"
    )
    contam = F.col("n_tokens_after") < F.col("n_tokens_before")
    big = lambda c: F.coalesce(F.sum(c), F.lit(0)).cast("bigint")  # noqa: E731
    agg = (
        s.join(corpus.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            big(contam.cast("bigint")).alias("contam_docs"),
            big(F.when(contam, F.col("n_tokens_before"))).alias(
                "drop_loss_tokens"
            ),
            big(F.col("n_tokens_before") - F.col("n_tokens_after")).alias(
                "scrub_loss_tokens"
            ),
            big(F.when(contam, F.col("n_tokens_after"))).alias(
                "recovered_tokens"
            ),
        )
    )
    return agg.withColumn(
        "recovered_frac",
        F.round(
            F.when(
                F.col("drop_loss_tokens") > 0,
                F.col("recovered_tokens").cast("double")
                / F.col("drop_loss_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


ORACLE["scrub_vs_drop_tradeoff"] = ORACLE["scrub_vs_drop_tradeoff"].replace(
    "{scrub}", ORACLE["scrub_benchmark_spans"]
)


@register(
    "boilerplate_rate_by_source",
    oracle="""
WITH b AS ({rb})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN b.n_tokens_after < b.n_tokens_before
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS affected_docs,
       CAST(coalesce(sum(b.n_tokens_before), 0) AS BIGINT) AS total_tokens,
       CAST(coalesce(sum(b.n_tokens_before - b.n_tokens_after), 0)
         AS BIGINT) AS boilerplate_tokens,
       round(CASE WHEN coalesce(sum(b.n_tokens_before), 0) > 0
             THEN CAST(coalesce(sum(b.n_tokens_before - b.n_tokens_after), 0)
                       AS DOUBLE) / sum(b.n_tokens_before)
             ELSE 0.0 END, 6) AS boilerplate_frac
FROM b JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def q_boilerplate_rate_by_source(spark, sf_dir):
    """Boilerplate mass per source — the C4/RefinedWeb source-hygiene
    number: how much of each source's token mass the cross-document
    boilerplate cleaner (word 3-grams in >= 5 docs) deletes, and how
    many docs it touches. Sources with high boilerplate_frac are
    navigation/template-heavy and get down-weighted (or re-crawled
    with a better extractor) BEFORE their mass distorts the mixture;
    read beside source_quality_matrix and source_dedup_rates to
    complete the per-source hygiene panel. Composes the oracled
    remove_boilerplate rebuild with one per-source aggregate — the
    digest-keyed span machinery is the cost, the report is O(#sources)
    and empty-corpus safe on both engines."""
    from scikit_learn_imputer_spark.dedup.spans import (
        remove_boilerplate_spans,
    )

    d = _t(spark, sf_dir, "documents")
    b = remove_boilerplate_spans(d, n=3, min_df=5).select(
        "doc_id", "n_tokens_before", "n_tokens_after"
    )
    affected = F.col("n_tokens_after") < F.col("n_tokens_before")
    big = lambda c: F.coalesce(F.sum(c), F.lit(0)).cast("bigint")  # noqa: E731
    agg = (
        b.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            big(affected.cast("bigint")).alias("affected_docs"),
            big(F.col("n_tokens_before")).alias("total_tokens"),
            big(F.col("n_tokens_before") - F.col("n_tokens_after")).alias(
                "boilerplate_tokens"
            ),
        )
    )
    return agg.withColumn(
        "boilerplate_frac",
        F.round(
            F.when(
                F.col("total_tokens") > 0,
                F.col("boilerplate_tokens").cast("double")
                / F.col("total_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


ORACLE["boilerplate_rate_by_source"] = ORACLE[
    "boilerplate_rate_by_source"
].replace("{rb}", ORACLE["remove_boilerplate"])


# =====================================================================
# Round-11 (cont.): retrieval, privacy audit, CDC dedup, ops anomalies
# =====================================================================

BM25_QUERY_TERMS = ["dup", "spark", "vector"]


def _bm25_top10(s: DataFrame) -> DataFrame:
    """Shared top-10 presentation for every BM25 variant (they all
    assert the same oracle shape): TakeOrderedAndProject on (6-dp
    score, doc_id), then rank over the 10-row frame. One definition so
    the tie-break/rounding contract cannot drift between variants."""
    order = [F.round("score", 6).desc(), F.col("doc_id").asc()]
    top = s.orderBy(*order).limit(10)
    w = Window.orderBy(*order)  # O(k)=10-row frame after the limit
    return top.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        "n_terms_matched",
    ).withColumn("rank", F.row_number().over(w).cast("int"))


def _source_term_freqs(d: DataFrame) -> DataFrame:
    """(source, term, freq) frequency frame shared by the vocabulary
    statistics queries — one tokenizer definition, one explode+agg."""
    return (
        d.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


from scikit_learn_imputer_spark.dedup.cdc import (  # noqa: E402
    cdc_chunks,
    cdc_chunks_oracle_sql,
)
from scikit_learn_imputer_spark.functions.retrieval import (  # noqa: E402
    bm25_oracle_sql,
    bm25_scores,
)


@register(
    "bm25_topk",
    oracle="""
WITH scores AS ({bm25})
SELECT doc_id, round(score, 6) AS score, n_terms_matched,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
            AS INT) AS rank
FROM scores
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
""",
)
def q_bm25_topk(spark, sf_dir):
    """BM25 top-10 retrieval for a fixed query ("dup spark vector" — one
    rare term, two common, so idf does real work) over the documents
    corpus. The inverted-index shape done relationally: postings
    explode → broadcast semi-filter to the 3 query terms → map-side tf
    aggregate → O(|query|) df frame + 1-row (N, avgdl) frame broadcast
    back → per-doc score sum. Top-k is ``orderBy().limit(10)`` which
    compiles to TakeOrderedAndProject (per-partition heap, k-row driver
    merge — no global sort); the rank window then runs over the 10-row
    frame. Ties break on (rounded score, doc_id) identically in both
    engines."""
    d = _t(spark, sf_dir, "documents")
    s = bm25_scores(d, BM25_QUERY_TERMS)
    return _bm25_top10(s)


ORACLE["bm25_topk"] = ORACLE["bm25_topk"].replace(
    "{bm25}", bm25_oracle_sql(BM25_QUERY_TERMS)
)


@register(
    "k_anonymity_audit",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS INT) AS risky,
       CAST(min(l) AS BIGINT) AS min_distinct_sensitive
FROM classes GROUP BY class_size
""",
)
def q_k_anonymity_audit(spark, sf_dir):
    """k-anonymity / l-diversity audit of the customer table before a
    user-level extract joins a training set: quasi-identifiers
    (nation, market segment, account-balance bucket of width 1000)
    define equivalence classes; any class smaller than k=5 re-identifies
    its members, and a class whose sensitive attribute (exact balance)
    takes one value leaks it even when k-anonymous. Two hash aggregates
    — one shuffle on the QI tuple, then an O(#class-sizes) histogram —
    the same plan at any scale."""
    from scikit_learn_imputer_spark.functions.privacy import (
        k_anonymity_histogram,
    )

    c = _t(spark, sf_dir, "customer")
    return k_anonymity_histogram(
        c,
        [
            F.col("c_nationkey"),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "bal_bucket"
            ),
        ],
        k=5,
        sensitive_col=F.col("c_acctbal"),
    )


@register(
    "cdc_chunk_dedup",
    oracle="""
WITH chunks AS ({cdc}),
per_digest AS (
  SELECT d.source, c.chunk_digest,
         CAST(count(*) AS BIGINT) AS occurrences,
         CAST(min(c.n_words) AS BIGINT) AS n_words
  FROM chunks c JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT source,
       CAST(sum(occurrences) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(occurrences * n_words) AS BIGINT) AS total_words,
       CAST(sum((occurrences - 1) * n_words) AS BIGINT) AS dup_words,
       round(CASE WHEN sum(occurrences * n_words) > 0
             THEN CAST(sum((occurrences - 1) * n_words) AS DOUBLE)
                  / sum(occurrences * n_words)
             ELSE 0.0 END, 6) AS dup_frac
FROM per_digest GROUP BY source
""",
)
def q_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking dedup report per source: documents are
    cut at rolling-fingerprint word boundaries (edit-stable, unlike
    fixed windows — a one-word insertion realigns at the next
    boundary), identical chunks collide by content digest, and the
    report gives each source's duplicated chunk mass — the
    sub-document redundancy that exact whole-doc dedup cannot see and
    paragraph dedup only sees when delimiters exist. Per-doc bounded
    prefix-sum window → digest groupBy (content-addressed shuffle, the
    exact-dedup shape) → O(#sources) report."""
    d = _t(spark, sf_dir, "documents")
    per_digest = (
        cdc_chunks(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "chunk_digest")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("occurrences"),
            F.min("n_words").cast("bigint").alias("n_words"),
        )
    )
    big = lambda c: F.sum(c).cast("bigint")  # noqa: E731
    return (
        per_digest.groupBy("source")
        .agg(
            big(F.col("occurrences")).alias("n_chunks"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chunks"),
            big(F.col("occurrences") * F.col("n_words")).alias(
                "total_words"
            ),
            big((F.col("occurrences") - 1) * F.col("n_words")).alias(
                "dup_words"
            ),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.when(
                    F.col("total_words") > 0,
                    F.col("dup_words").cast("double")
                    / F.col("total_words"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )


ORACLE["cdc_chunk_dedup"] = ORACLE["cdc_chunk_dedup"].replace(
    "{cdc}", cdc_chunks_oracle_sql()
)


@register(
    "event_rate_anomalies",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
windowed AS (
  SELECT event_type, hour_ts, n_events,
         avg(n_events) OVER w AS mean_prev,
         stddev_samp(n_events) OVER w AS std_prev,
         count(*) OVER w AS n_prev
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_ts, n_events,
       round(mean_prev, 6) AS mean_prev,
       round(CASE WHEN std_prev > 0
             THEN (n_events - mean_prev) / std_prev END, 6) AS z_score,
       CAST(CASE WHEN std_prev > 0
                  AND abs((n_events - mean_prev) / std_prev) > 3
             THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM windowed WHERE n_prev >= 12
""",
)
def q_event_rate_anomalies(spark, sf_dir):
    """Event-rate anomaly detection — the ingest-ops monitor a pipeline
    runs over its own telemetry: hourly counts per event type, each
    bucket z-scored against its trailing 24 OCCUPIED buckets (rows, not
    wall hours — gaps carry no rows on either engine), flagged at
    |z| > 3 once 12 history buckets exist. One map-side-combinable
    aggregate then a per-type window over the O(hours x types) bucket
    frame — the window partitions by event_type, never by nothing, so
    the plan holds when the bucket frame grows 100x."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return _anomalies_from_hourly(hourly)


def _anomalies_from_hourly(hourly: DataFrame) -> DataFrame:
    """Shared detector stage: trailing-24-bucket z-score over an exact
    (event_type, hour_ts, n_events) frame — the batch query and the
    streaming accountant's read-back run EXACTLY this code, which is
    what makes batch==stream a structural property rather than a test
    assertion."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-24, -1)
    )
    windowed = hourly.select(
        "event_type",
        "hour_ts",
        "n_events",
        F.avg("n_events").over(w).alias("__mean"),
        F.stddev_samp("n_events").over(w).alias("__std"),
        F.count(F.lit(1)).over(w).alias("__n_prev"),
    ).filter(F.col("__n_prev") >= 12)
    z = (F.col("n_events") - F.col("__mean")) / F.col("__std")
    return windowed.select(
        "event_type",
        "hour_ts",
        "n_events",
        F.round("__mean", 6).alias("mean_prev"),
        F.round(F.when(F.col("__std") > 0, z), 6).alias("z_score"),
        F.when(F.col("__std") > 0, (F.abs(z) > 3).cast("int"))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "bm25_source_relevance",
    oracle="""
WITH raw AS ({bm25}),
scores AS (
  SELECT doc_id, round(score, 6) AS score FROM raw
),
thr AS (SELECT vs[CAST(((n - 1) * 9) // 10 AS BIGINT) + 1] AS thr
       FROM (SELECT list_sort(list(score) FILTER (score IS NOT NULL)) AS vs,
                    CAST(count(score) AS BIGINT) AS n
             FROM scores)),
joined AS (
  SELECT d.source, s.score FROM documents d
  LEFT JOIN scores s USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(score) AS BIGINT) AS matched_docs,
       round(coalesce(avg(score), 0.0), 6) AS mean_score,
       CAST(coalesce(sum(CASE WHEN score >= (SELECT thr FROM thr)
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS top_decile_docs
FROM joined GROUP BY source
""",
)
def q_bm25_source_relevance(spark, sf_dir):
    """Retrieval as a mixture signal: per source, how relevant is its
    text to a target query — the DSIR idea with BM25 instead of a
    hashed-gram LM. A pipeline sourcing domain data re-weights (or
    re-crawls) the sources whose top-decile density is high. Reuses the
    bm25_topk scoring chain (postings semi-filtered to the broadcast
    query terms), rounds scores to 6 dp BEFORE the corpus-level
    top-decile threshold so the cutoff compare is engine-portable, and
    the threshold itself is a 1-row broadcast EXACT-RANK quantile frame
    (stats.py:exact_rank_quantiles — distributed banded (value,count)
    selection over the 6dp-bounded score domain, no corpus-sized
    buffer; VERDICT r12 #1). Report is O(#sources)."""
    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    d = _t(spark, sf_dir, "documents")
    scores = bm25_scores(d, BM25_QUERY_TERMS).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    thr = exact_rank_quantiles(
        scores, "score", [(9, 10)], ["__thr"], band_width=1.0
    )
    joined = (
        d.select("doc_id", "source")
        .join(scores, on="doc_id", how="left")
        .crossJoin(F.broadcast(thr))
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count("score").cast("bigint").alias("matched_docs"),
        F.round(F.coalesce(F.avg("score"), F.lit(0.0)), 6).alias(
            "mean_score"
        ),
        F.coalesce(
            F.sum((F.col("score") >= F.col("__thr")).cast("bigint")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("top_decile_docs"),
    )


ORACLE["bm25_source_relevance"] = ORACLE["bm25_source_relevance"].replace(
    "{bm25}", bm25_oracle_sql(BM25_QUERY_TERMS)
)


@register(
    "user_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cohort_day
),
ret AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
         CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
  FROM activity a JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.n_active, s.cohort_size,
       round(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM ret r JOIN sizes s USING (cohort_day)
""",
)
def q_user_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix — the product-analytics staple a real
    engine must serve from raw events: users grouped by first-seen day,
    each later active day bucketed to an offset, retention = active /
    cohort size. Three hash aggregates and two equi joins (user first,
    then the O(#cohorts) size frame, broadcastable); no window at all,
    so the plan is shuffle-minimal at any event volume."""
    ev = _t(spark, sf_dir, "events")
    day = lambda c: F.date_trunc("day", c).cast("date")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        day(F.min("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", day(F.col("ts")).alias("day")
    ).distinct()
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    ret = (
        activity.join(firsts, on="user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), on="cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


@register(
    "lang_source_matrix",
    oracle="""
WITH sl AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
shares AS (
  SELECT source, lang, n,
         CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source) AS p,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang) AS rn
  FROM sl
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       min(CASE WHEN rn = 1 THEN lang END) AS top_lang,
       round(min(CASE WHEN rn = 1 THEN p END), 6) AS top_share,
       round(sum(-p * ln(p)), 6) AS lang_entropy
FROM shares GROUP BY source
""",
)
def q_lang_source_matrix(spark, sf_dir):
    """Language-contamination audit per source: document-count share and
    natural-log entropy of the declared language mix, plus the dominant
    language — the check a multilingual pipeline runs before trusting a
    source's language label (an 'English' crawl slice with entropy ≫ 0
    needs per-doc lang-id, not the label). One (source, lang) aggregate,
    then shares/top-1/entropy over that O(#sources x #langs) frame —
    windows never touch document-sized data."""
    d = _t(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wsum = Window.partitionBy("source")
    wtop = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    shares = sl.select(
        "source",
        "lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wsum)).alias("p"),
        F.row_number().over(wtop).alias("rn"),
    )
    return shares.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.min(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
        F.round(F.min(F.when(F.col("rn") == 1, F.col("p"))), 6).alias(
            "top_share"
        ),
        F.round(F.sum(-F.col("p") * F.log(F.col("p"))), 6).alias(
            "lang_entropy"
        ),
    )


@register(
    "dp_release_calibration",
    oracle="""
WITH counts AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1, 2
),
noised AS (
  SELECT c_nationkey, c_mktsegment, true_count,
         CAST(('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)
               || ':' || c_mktsegment), 1, 8))::UBIGINT AS DOUBLE)
           / 4294967296.0 - 0.5 AS v
  FROM counts
)
SELECT c_nationkey, c_mktsegment, true_count,
       round(-sign(v) * ln(greatest(1 - 2 * abs(v), 2.3283064365386963e-10)),
             6) AS noise,
       round(true_count
             - sign(v) * ln(greatest(1 - 2 * abs(v),
                                     2.3283064365386963e-10)), 6)
         AS noisy_count,
       CAST(round(true_count
             - sign(v) * ln(greatest(1 - 2 * abs(v),
                                     2.3283064365386963e-10)), 0)
         AS BIGINT) AS released_count
FROM noised
""",
)
def q_dp_release_calibration(spark, sf_dir):
    """Differential-privacy release CALIBRATION (renamed from
    dp_noisy_histogram, ADVICE r11 — this is the audit twin, NOT a
    usable privacy release: the noise is keyed by the public class and
    true_count/noise are emitted, so anyone can subtract the noise back
    out; the name now says so): the (nation, segment) customer
    histogram with Laplace(1/eps) noise at eps=1, sensitivity 1. The
    draw is the engine's deterministic md5-uniform pushed through the
    Laplace inverse CDF (-sign(v)·ln(1-2|v|), v=u-0.5, floor-guarded at
    2^-32 where the CDF tail would hit ln(0)), so both engines — and an
    auditor re-running the calibration — reproduce the numbers
    bit-for-bit. The PRODUCTION release is
    functions/privacy.py:dp_laplace_release: a caller-held secret seed
    in the hash key, only the noised integer released. Pure projection
    over an O(#classes) aggregate; the utility check (|noise|
    distribution vs eps) reads directly off the result."""
    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    u = uniform_hash_col(
        F.concat(
            F.lit("dp:"),
            F.col("c_nationkey").cast("string"),
            F.lit(":"),
            F.col("c_mktsegment"),
        )
    )
    v = u - F.lit(0.5)
    noise = -F.signum(v) * F.log(
        F.greatest(
            F.lit(1.0) - 2 * F.abs(v), F.lit(2.3283064365386963e-10)
        )
    )
    return counts.select(
        "c_nationkey",
        "c_mktsegment",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.round(F.col("true_count") + noise, 0)
        .cast("bigint")
        .alias("released_count"),
    )


@register(
    "dp_histogram_release",
    oracle="""
WITH counts AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS true_count
  FROM customer GROUP BY 1, 2
),
noised AS (
  SELECT c_nationkey, c_mktsegment, true_count,
         CAST(('0x' || substr(md5(
           '14:dp-demo-secret' || '|' || '7:2026-08' || '|'
           || (CASE WHEN c_nationkey IS NULL THEN '~'
               ELSE CAST(length(CAST(c_nationkey AS VARCHAR)) AS VARCHAR)
                    || ':' || CAST(c_nationkey AS VARCHAR) END)
           || '|'
           || (CASE WHEN c_mktsegment IS NULL THEN '~'
               ELSE CAST(length(c_mktsegment) AS VARCHAR)
                    || ':' || c_mktsegment END)
         ), 1, 8))::UBIGINT AS DOUBLE) / 4294967296.0 - 0.5 AS v
  FROM counts
)
SELECT c_nationkey, c_mktsegment,
       greatest(CAST(round(true_count
             - sign(v) * ln(greatest(1 - 2 * abs(v),
                                     2.3283064365386963e-10)), 0)
         AS BIGINT), 0) AS released_count
FROM noised
""",
)
def q_dp_histogram_release(spark, sf_dir):
    """The RELEASE-SHAPED DP histogram (VERDICT r12 #7 — the production
    twin of dp_release_calibration): per-(nation, segment) customer
    counts with Laplace(1/eps) noise, emitting ONLY the clamped noised
    integer — the schema provably excludes true_count/noise, so nothing
    in the output subtracts back out. The noise key is
    seed|epoch|class with NULL-safe length-prefixed encoding
    (functions/privacy.py:_dp_key_part — distinct class tuples can
    never share a draw, and the required release_epoch makes seed
    reuse across releases a type-level mistake instead of a silent
    delta leak). Oracled with the demo seed the calibration twin uses;
    a production caller supplies a secret one. One O(#classes)
    aggregate + a pure projection."""
    from scikit_learn_imputer_spark.functions.privacy import (
        dp_laplace_release,
    )

    return dp_laplace_release(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        secret_seed="dp-demo-secret",
        release_epoch="2026-08",
        eps=1.0,
    )


@register(
    "zipf_fit_by_source",
    oracle="""
WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS term
        FROM documents)
  WHERE term <> ''
  GROUP BY 1, 2
),
ranked AS (
  SELECT source,
         ln(CAST(row_number() OVER (PARTITION BY source
                  ORDER BY freq DESC, term) AS DOUBLE)) AS x,
         ln(CAST(freq AS DOUBLE)) AS y
  FROM tf
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_types,
       round(regr_slope(y, x), 4) AS slope,
       round(regr_intercept(y, x), 4) AS intercept,
       round(regr_r2(y, x), 6) AS r2
FROM ranked GROUP BY source
""",
)
def q_zipf_fit_by_source(spark, sf_dir):
    """Zipf's-law fit per source: OLS of ln(freq) on ln(rank) over each
    source's term frequency spectrum. Natural text slopes ~ -1 with
    high r2; machine-generated or template text flattens or kinks —
    a corpus-forensics signal the quality gates don't capture (this
    synthetic corpus reads median slope ~ -0.29 at r2 ~ 0.16: a
    near-uniform generator, correctly detected). The frequency table is one
    explode+aggregate; ranking and the regression run over the
    O(#sources x |vocab|) TYPE frame (types, not tokens), and the
    closed-form moments (covar_pop/var_pop/corr) match DuckDB's
    regr_* aggregates exactly."""
    d = _t(spark, sf_dir, "documents")
    tf = _source_term_freqs(d)
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    ranked = tf.select(
        "source",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    vx, vy = F.var_pop("x"), F.var_pop("y")
    slope = F.when(vx > 0, F.covar_pop("x", "y") / vx)
    # r2 from co-moments, NOT F.corr: under ANSI mode the corr aggregate
    # itself divides by the zero variance DURING aggregation (a post-agg
    # CASE guard cannot save it) and the query dies on any degenerate
    # source; cov^2/(vx*vy) is the same number and divides post-agg,
    # conditionally.
    r2 = F.when(
        vx > 0,
        F.when(
            vy > 0, F.pow(F.covar_pop("x", "y"), 2) / (vx * vy)
        ).otherwise(F.lit(1.0)),  # constant y: a zero-slope line fits
                                  # perfectly (DuckDB regr_r2 = 1.0)
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(slope, 4).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 4).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


@register(
    "lexical_diversity_by_source",
    oracle="""
WITH tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS term
        FROM documents)
  WHERE term <> ''
  GROUP BY 1, 2
)
SELECT source,
       CAST(sum(freq) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / sum(freq), 6) AS ttr,
       round(CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_frac,
       round(CAST(sum(freq * (freq - 1)) AS DOUBLE)
             / (CAST(sum(freq) AS DOUBLE)
                * (CAST(sum(freq) AS DOUBLE) - 1)), 6) AS simpson
FROM tf GROUP BY source
""",
)
def q_lexical_diversity_by_source(spark, sf_dir):
    """Lexical-diversity panel per source: type-token ratio, hapax share
    and the Simpson repeat-probability — the vocabulary-side quality
    signals (template text reads low TTR / high Simpson; spam keyword
    stuffing reads high hapax) complementing the character-level gates
    in text_quality. Everything derives from one (source, term)
    frequency aggregate with exact integer sums — two map-side
    combinable shuffles total, report O(#sources)."""
    d = _t(spark, sf_dir, "documents")
    tf = _source_term_freqs(d)
    n_tok = F.sum("freq").cast("bigint")
    n_typ = F.count(F.lit(1)).cast("bigint")
    return tf.groupBy("source").agg(
        n_tok.alias("n_tokens"),
        n_typ.alias("n_types"),
        F.round(n_typ.cast("double") / n_tok, 6).alias("ttr"),
        F.round(
            F.sum((F.col("freq") == 1).cast("bigint")).cast("double")
            / n_typ,
            6,
        ).alias("hapax_frac"),
        F.round(
            F.sum(F.col("freq") * (F.col("freq") - 1)).cast("double")
            / (n_tok.cast("double") * (n_tok.cast("double") - 1)),
            6,
        ).alias("simpson"),
    )


@register("bm25_persisted_topk", oracle=ORACLE["bm25_topk"])
def q_bm25_persisted_topk(spark, sf_dir):
    """BM25 top-10 probing a PERSISTED inverted index — the
    build-once-query-many architecture retrieval actually runs at
    100 TB: build_bm25_index materializes postings partitioned by an
    md5-derived term bucket (64 dirs), save/load round-trips through
    parquet, and the probe filters on BOTH the python-computed bucket
    list and the term set, so partition pruning + pushed filters mean a
    3-term query reads at most 3 of 64 index directories and never
    touches the corpus text again. Scores are identical to the
    from-scratch chain, so it shares bm25_topk's oracle verbatim (the
    ann_ivf_persisted_topk precedent)."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    path = _scratch("bm25_index")
    d = _t(spark, sf_dir, "documents")
    save_bm25_index(*build_bm25_index(d), path)
    postings, dfs, stats = load_bm25_index(spark, path)
    s = bm25_scores_from_index(postings, dfs, stats, BM25_QUERY_TERMS)
    return _bm25_top10(s)


@register("stream_event_anomalies", oracle=ORACLE["event_rate_anomalies"])
def q_stream_event_anomalies(spark, sf_dir):
    """STREAMING event-rate anomaly monitor: the events table drains
    through a foreachBatch accountant
    (streaming/ingest.py:stream_event_counts_ingest) that lands each
    micro-batch's (event_type, hour) count delta exactly-once
    (batch_id-keyed sink); the read-back sums the deltas into the exact
    hourly frame and runs THE SAME detector stage the batch query runs
    (_anomalies_from_hourly), so it shares event_rate_anomalies' oracle
    verbatim — the batch==stream contract of stream_mixture_monitor.
    Late events add to their hour's bucket at the next read-back
    instead of growing watermark state; per batch nothing event-sized
    lands, only O(types x hours-in-batch) delta rows."""
    from scikit_learn_imputer_spark.streaming.events import (
        stream_events_from_parquet,
    )
    from scikit_learn_imputer_spark.streaming.ingest import (
        stream_event_counts_ingest,
    )

    out = _scratch("evanom") + "/deltas"
    ck = _scratch("evanom_ck")
    stream = stream_events_from_parquet(spark, sf_dir)
    q = stream_event_counts_ingest(stream, out, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    hourly = (
        spark.read.parquet(out)
        .groupBy("event_type", "hour_ts")
        .agg(F.sum("n_events").cast("bigint").alias("n_events"))
    )
    return _anomalies_from_hourly(hourly)


@register("bm25_incremental_topk", oracle=ORACLE["bm25_topk"])
def q_bm25_incremental_topk(spark, sf_dir):
    """Incremental BM25 index maintenance: the corpus arrives in two
    installments (the established doc_id % 100 split), the base builds
    and persists, the delta APPENDS — new postings land in their
    term-bucket directories, df/stats land as summable delta files —
    and the probe of the folded index must equal querying a
    from-scratch index over the full corpus, so it shares bm25_topk's
    oracle verbatim. This is the index-freshness story at 100 TB: a
    daily crawl increment costs one pass over the NEW documents, never
    a rebuild, and the loader folds deltas with an O(vocab) sum."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        append_bm25_index,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    path = _scratch("bm25_incr")
    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 100 >= 2)
    delta = d.filter(F.col("doc_id") % 100 < 2)
    save_bm25_index(*build_bm25_index(base), path)
    append_bm25_index(delta, path)
    postings, dfs, stats = load_bm25_index(spark, path)
    s = bm25_scores_from_index(postings, dfs, stats, BM25_QUERY_TERMS)
    return _bm25_top10(s)


@register(
    "bm25_takedown_topk",
    oracle="""
WITH scores AS ({bm25_erased})
SELECT doc_id, round(score, 6) AS score, n_terms_matched,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
            AS INT) AS rank
FROM scores
ORDER BY round(score, 6) DESC, doc_id
LIMIT 10
""",
)
def q_bm25_takedown_topk(spark, sf_dir):
    """Takedown propagation through the retrieval index — the last
    persisted artifact in the deletion-propagation estate: the full
    corpus is indexed, then the benchmark slice (doc_id % 100 < 2, the
    established split) is ERASED via takedown_bm25_index, which writes
    the victims as tombstones (probes anti-join them) and their df /
    corpus-stats contributions as NEGATIVE delta files the loader's
    existing sums fold away — no rebuild, untouched term buckets never
    read. The oracle is an index that NEVER SAW the erased docs (the
    from-scratch BM25 SQL over the filtered corpus), so
    "as-if-never-indexed" is the checked property, scores and corpus
    statistics included."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )

    path = _scratch("bm25_takedown")
    d = _t(spark, sf_dir, "documents")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(
        spark, path, d.filter(F.col("doc_id") % 100 < 2).select("doc_id")
    )
    postings, dfs, stats = load_bm25_index(spark, path)
    tomb = load_bm25_tombstones(spark, path)
    s = bm25_scores_from_index(
        postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
    )
    return _bm25_top10(s)


ORACLE["bm25_takedown_topk"] = ORACLE["bm25_takedown_topk"].replace(
    "{bm25_erased}",
    bm25_oracle_sql(BM25_QUERY_TERMS, where="doc_id % 100 >= 2"),
)


@register("bm25_compacted_topk", oracle=ORACLE["bm25_takedown_topk"])
def q_bm25_compacted_topk(spark, sf_dir):
    """The full index lifecycle, closed: build → takedown → COMPACT →
    probe. compact_bm25_index physically purges the tombstoned posting
    rows by rewriting ONLY the term-bucket directories that contain
    victims (survivors swap in bucket-locally; untouched buckets are
    never read) and then clears the tombstones — so this probe runs
    WITHOUT the tombstone anti-join, making the oracle match a proof
    that the purge itself is complete and exact, not merely masked.
    Shares bm25_takedown_topk's erased-corpus oracle verbatim."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        compact_bm25_index,
        load_bm25_index,
        save_bm25_index,
        takedown_bm25_index,
    )

    path = _scratch("bm25_compact")
    d = _t(spark, sf_dir, "documents")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(
        spark, path, d.filter(F.col("doc_id") % 100 < 2).select("doc_id")
    )
    compact_bm25_index(spark, path)
    postings, dfs, stats = load_bm25_index(spark, path)
    # Deliberately NO tombstones: the physical purge must suffice.
    s = bm25_scores_from_index(postings, dfs, stats, BM25_QUERY_TERMS)
    return _bm25_top10(s)


@register(
    "incremental_cdc_batch",
    oracle="""
WITH corpus_chunks AS ({cdc_corpus}),
batch_chunks AS ({cdc_batch}),
store AS (SELECT DISTINCT chunk_digest FROM corpus_chunks),
marked AS (
  SELECT b.doc_id, b.chunk_idx, b.n_words,
         (s.chunk_digest IS NOT NULL) AS in_store,
         row_number() OVER (PARTITION BY b.chunk_digest
                            ORDER BY b.doc_id, b.chunk_idx) AS rn
  FROM batch_chunks b LEFT JOIN store s USING (chunk_digest)
),
cls AS (
  SELECT doc_id, n_words,
         CASE WHEN in_store THEN 'dup_store'
              WHEN rn > 1 THEN 'dup_batch'
              ELSE 'new' END AS cls
  FROM marked
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(coalesce(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS chunks_new,
       CAST(coalesce(sum(CASE WHEN cls = 'dup_store' THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS chunks_dup_store,
       CAST(coalesce(sum(CASE WHEN cls = 'dup_batch' THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS chunks_dup_batch,
       CAST(coalesce(sum(CASE WHEN cls = 'new' THEN n_words END), 0)
         AS BIGINT) AS new_words
FROM cls GROUP BY doc_id
""",
)
def q_incremental_cdc_batch(spark, sf_dir):
    """Cross-batch incremental dedup at CHUNK granularity — what the
    whole-doc fingerprint store cannot see: a batch document that is
    30% boilerplate shared with history probes as 'new' at doc level
    but its chunk report shows exactly which word mass is genuinely
    novel. The already-ingested corpus (doc_id % 5 != 0) persists as a
    distinct chunk-digest store; the batch (doc_id % 5 == 0) classifies
    every chunk as new / duplicate-of-history / duplicate-within-batch
    (min-(doc,chunk) keeper). One digest equi join + one per-digest
    window bounded by duplicate count; only 32-char digests shuffle."""
    from scikit_learn_imputer_spark.dedup.cdc import (
        build_cdc_chunk_store,
        incremental_cdc_report,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = _scratch("cdc_store")
    build_cdc_chunk_store(corpus, path)
    return incremental_cdc_report(batch, path)


ORACLE["incremental_cdc_batch"] = (
    ORACLE["incremental_cdc_batch"]
    .replace("{cdc_corpus}", cdc_chunks_oracle_sql(where="doc_id % 5 <> 0"))
    .replace("{cdc_batch}", cdc_chunks_oracle_sql(where="doc_id % 5 = 0"))
)


@register(
    "retrieval_weighted_mixture",
    oracle="""
WITH raw AS ({bm25}),
scores AS (SELECT doc_id, round(score, 6) AS score FROM raw),
per_source AS (
  SELECT d.source,
         round(coalesce(avg(s.score), 0.0), 6) AS mean_score,
         CAST(coalesce(sum(CASE WHEN s.score IS NOT NULL
                  THEN len(list_filter(string_split(trim(d.text), ' '),
                                       w -> w <> '')) END), 0) AS BIGINT)
           AS matched_tokens
  FROM documents d LEFT JOIN scores s USING (doc_id)
  GROUP BY d.source
),
tot AS (SELECT sum(mean_score) AS z FROM per_source)
SELECT source, mean_score, matched_tokens,
       round(mean_score / (SELECT z FROM tot), 6) AS weight,
       CAST(floor(20000 * mean_score / (SELECT z FROM tot)) AS BIGINT)
         AS alloc_tokens
FROM per_source
""",
)
def q_retrieval_weighted_mixture(spark, sf_dir):
    """Retrieval-targeted mixture plan: per-source sampling weights
    proportional to the source's mean BM25 relevance to the target
    query — the DSIR idea with an explicit retrieval signal, giving a
    20k-token budget allocation that up-weights the sources whose text
    actually matches the domain. Composes the oracled BM25 scoring
    chain with one per-source aggregate and a 1-row normalizer
    broadcast (temperature_mixture_sample precedent); weights divide
    6-dp-rounded means so both engines allocate identically. The
    matched token mass per source bounds what the allocation can
    actually draw."""
    d = _t(spark, sf_dir, "documents")
    scores = bm25_scores(d, BM25_QUERY_TERMS).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(F.col("text")), " "), lambda w: w != "")
    ).cast("bigint")
    per_source = (
        d.select("doc_id", "source", n_tokens.alias("__n"))
        .join(scores, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.round(F.coalesce(F.avg("score"), F.lit(0.0)), 6).alias(
                "mean_score"
            ),
            F.coalesce(
                F.sum(F.when(F.col("score").isNotNull(), F.col("__n"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("matched_tokens"),
        )
    )
    tot = per_source.agg(F.sum("mean_score").alias("__z"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "mean_score",
        "matched_tokens",
        F.round(F.col("mean_score") / F.col("__z"), 6).alias("weight"),
        F.floor(20000 * F.col("mean_score") / F.col("__z"))
        .cast("bigint")
        .alias("alloc_tokens"),
    )


ORACLE["retrieval_weighted_mixture"] = ORACLE[
    "retrieval_weighted_mixture"
].replace("{bm25}", bm25_oracle_sql(BM25_QUERY_TERMS))


@register("stream_bm25_index_topk", oracle=ORACLE["bm25_topk"])
def q_stream_bm25_index_topk(spark, sf_dir):
    """STREAMING retrieval indexing: the documents table drains through
    a foreachBatch appender (streaming/ingest.py:stream_bm25_index_ingest)
    that indexes each micro-batch into the persisted BM25 index via the
    summable-delta contract — the index is BOOTSTRAPPED EMPTY and built
    entirely by the stream, one installment per batch. Probing the
    folded index must equal querying a from-scratch build over the full
    corpus whatever the batch boundaries were, so it shares bm25_topk's
    oracle verbatim (the batch==stream contract of
    stream_mixture_monitor, applied to an index artifact rather than an
    aggregate)."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    from scikit_learn_imputer_spark.streaming.ingest import (
        stream_bm25_index_ingest,
    )

    docs = _t(spark, sf_dir, "documents")
    path = _scratch("bm25_stream_idx")
    ck = _scratch("bm25_stream_ck")
    # Bootstrap the index EMPTY (zero-doc frames) so every real document
    # arrives through the stream.
    empty = docs.filter(F.lit(False))
    save_bm25_index(*build_bm25_index(empty), path)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(*docs.columns)
    )
    q = stream_bm25_index_ingest(stream, path, ck).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    postings, dfs, stats = load_bm25_index(spark, path)
    s = bm25_scores_from_index(postings, dfs, stats, BM25_QUERY_TERMS)
    return _bm25_top10(s)


@register(
    "bm25_index_stats",
    # N_TERM_BUCKETS interpolated below (ADVICE r11: a hardcoded modulus
    # silently desynchronizes if the constant changes).
    oracle="""
WITH postings AS (
  SELECT (('0x' || substr(md5(term), 1, 8))::UBIGINT % {n_buckets}) AS term_bucket,
         term, doc_id
  FROM (
    SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '),
                                      w -> w <> '')) AS term
    FROM documents
  )
  GROUP BY 1, 2, 3
)
SELECT CAST(term_bucket AS INT) AS term_bucket,
       CAST(count(*) AS BIGINT) AS n_postings,
       CAST(count(DISTINCT term) AS BIGINT) AS n_terms
FROM postings GROUP BY 1
""",
)
def q_bm25_index_stats(spark, sf_dir):
    """Index ops dashboard: postings and vocabulary per term bucket —
    the skew view an operator reads before sizing index partitions (a
    hot bucket means one directory absorbs a disproportionate share of
    every probe that hits it; the md5 bucketing keeps the expected
    load uniform, and this query MEASURES it, the lsh_bucket_skew
    precedent applied to the retrieval index). Derived from the same
    build aggregates, O(64) output rows."""
    from scikit_learn_imputer_spark.functions.retrieval import (
        build_bm25_index,
    )

    d = _t(spark, sf_dir, "documents")
    postings, _, _, _ = build_bm25_index(d)
    return postings.groupBy("term_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_postings"),
        F.countDistinct("term").cast("bigint").alias("n_terms"),
    )


def _interp_bm25_bucket_count():
    from scikit_learn_imputer_spark.functions.retrieval import N_TERM_BUCKETS

    ORACLE["bm25_index_stats"] = ORACLE["bm25_index_stats"].replace(
        "{n_buckets}", str(N_TERM_BUCKETS)
    )


_interp_bm25_bucket_count()


@register(
    "phrase_search",
    oracle=r"""
WITH pos AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, parts[CAST(i AS INT)] AS token
  FROM (SELECT doc_id, str_split_regex(trim(text), '\s+') AS parts
        FROM documents),
       unnest(generate_series(1, len(parts))) AS t(i)
  WHERE parts[CAST(i AS INT)] IN ('spark', 'window')
),
hits AS (
  SELECT a.doc_id, a.pos
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.token = 'spark' AND b.token = 'window'
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
""",
)
def q_phrase_search(spark, sf_dir):
    """Exact phrase search ("spark window") through a POSITIONAL index
    — the retrieval capability bag-of-words BM25 cannot express:
    posexplode keeps token positions, the explode is filtered to the
    phrase's two terms BEFORE anything shuffles (at 100 TB only the
    phrase terms' positional postings move), and adjacency is one
    self equi join on (doc_id, pos+1). Per matching doc: occurrence
    count and first position — the snippet anchor a search UI needs.
    Positions index the WHITESPACE-RUN tokenization (split on \\s+, no
    empty tokens — ADVICE r11: a single-space split leaves empties
    occupying positions, silently breaking pos+1 adjacency on any
    corpus with doubled spaces; query, oracle, and the brute-force test
    all tokenize identically)."""
    d = _t(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), "\\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token").isin("spark", "window"))
    a = pos.filter(F.col("token") == "spark").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = pos.filter(F.col("token") == "window").select(
        "doc_id", (F.col("pos") - 1).alias("pos_a")
    )
    hits = a.join(b, ["doc_id", "pos_a"])
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.min("pos_a").cast("bigint").alias("first_pos"),
    )


BM25_QUERY_SET = {
    "q_dup": ["dup"],
    "q_spark_window": ["spark", "window"],
    "q_vector_merge": ["vector", "merge"],
}


@register(
    "bm25_multi_query",
    oracle="""
WITH qs(query_id, term) AS (VALUES {qvals}),
base AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), w -> w <> '') AS words
  FROM documents
),
lens AS (SELECT doc_id, CAST(len(words) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM lens),
postings AS (
  SELECT b.doc_id, u.term
  FROM base b, unnest(b.words) AS u(term)
  WHERE u.term IN (SELECT DISTINCT term FROM qs)
),
tf AS (
  SELECT p.doc_id, p.term, l.dl, CAST(count(*) AS DOUBLE) AS tf
  FROM postings p JOIN lens l USING (doc_id)
  GROUP BY 1, 2, 3
),
dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
w AS (
  SELECT q.query_id, tf.doc_id,
         ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)) AS w
  FROM tf JOIN dfq USING (term) JOIN qs q USING (term), stats s
),
scored AS (
  SELECT query_id, doc_id, round(sum(w), 6) AS score,
         CAST(count(*) AS BIGINT) AS n_terms_matched
  FROM w GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score, n_terms_matched,
         CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, n_terms_matched, rank
FROM ranked WHERE rank <= 3
""",
)
def q_bm25_multi_query(spark, sf_dir):
    """Batched retrieval — the production shape where MANY queries hit
    the index in one pass: a broadcast (query_id, term) frame fans each
    matching posting into its queries, per-(query, doc) scores
    aggregate once, and per-query top-3 goes through a TWO-STAGE
    bucketed window (per (query, doc_id%32 bucket) top-3 first, then
    the global rank over the O(#queries x 32 x 3) survivors) — no
    per-query data-sized window partition, the pack_shuffled_sequences
    discipline applied to retrieval. Term df is computed once per term
    over the union of query terms, not per query."""
    d = _t(spark, sf_dir, "documents")
    spark_qs = spark.createDataFrame(
        [(q, t) for q, terms in sorted(BM25_QUERY_SET.items())
         for t in terms],
        "query_id string, term string",
    )
    all_terms = sorted({t for ts in BM25_QUERY_SET.values() for t in ts})
    # Per-(query, doc) scores: postings filtered to the UNION term set
    # once, then fanned per query by the broadcast (query_id, term) map.
    words = F.filter(F.split(F.trim(F.col("text")), " "), lambda w: w != "")
    base = d.select("doc_id", words.alias("__words")).withColumn(
        "__dl", F.size("__words").cast("double")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        base.select("doc_id", "__dl", F.explode("__words").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy("doc_id", "term", "__dl")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    from scikit_learn_imputer_spark.functions.retrieval import bm25_weight

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(spark_qs), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            bm25_weight(
                F.col("__tf"), F.col("__df"), F.col("__n"),
                F.col("__dl"), F.col("__avgdl"), 1.2, 0.75,
            ).alias("__w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("__w"), 6).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
        )
    )
    # Two-stage per-query top-3: bucket window first, tiny global window.
    wb = Window.partitionBy(
        "query_id", (F.col("doc_id") % 32).alias("__b")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    survivors = scored.withColumn("__r", F.row_number().over(wb)).filter(
        F.col("__r") <= 3
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "doc_id", "score", "n_terms_matched", "rank")
    )


ORACLE["bm25_multi_query"] = ORACLE["bm25_multi_query"].replace(
    "{qvals}",
    ", ".join(
        f"('{q}', '{t}')"
        for q, terms in sorted(BM25_QUERY_SET.items())
        for t in terms
    ),
)


@register(
    "k_anonymity_generalization_curve",
    oracle="""
WITH widths(width) AS (VALUES (250), (500), (1000), (2000), (4000)),
classes AS (
  SELECT w.width, c.c_nationkey, c.c_mktsegment,
         CAST(floor(c.c_acctbal / w.width) AS BIGINT) AS bal_bucket,
         CAST(count(*) AS BIGINT) AS class_size
  FROM customer c CROSS JOIN widths w
  GROUP BY 1, 2, 3, 4
)
SELECT width,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS risky_classes,
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
         AS BIGINT) AS risky_rows,
       round(CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
             AS DOUBLE) / sum(class_size), 6) AS risky_frac
FROM classes GROUP BY width
""",
)
def q_k_anonymity_generalization_curve(spark, sf_dir):
    """The privacy/utility dial behind k_anonymity_audit: sweep the
    balance-bucket generalization width (250 -> 4000) and report how
    many rows stay re-identifiable (class < 5) at each — the curve a
    privacy engineer reads to pick the MINIMAL coarsening that reaches
    the k target, instead of over-generalizing and destroying utility.
    One 5-way width explode (bounded literal), one (width, QI) hash
    aggregate, O(5) output rows."""
    c = _t(spark, sf_dir, "customer")
    widths = F.array(*[F.lit(w) for w in (250, 500, 1000, 2000, 4000)])
    classes = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            "c_acctbal",
            F.explode(widths).alias("width"),
        )
        .groupBy(
            "width",
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.col("width"))
            .cast("bigint")
            .alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
    )
    risky = F.col("class_size") < 5
    return classes.groupBy("width").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(risky.cast("bigint")).cast("bigint").alias("risky_classes"),
        F.sum(F.when(risky, F.col("class_size")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("risky_rows"),
        F.round(
            F.sum(F.when(risky, F.col("class_size")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("class_size"),
            6,
        ).alias("risky_frac"),
    )


@register(
    "top_shared_chunks",
    oracle="""
WITH chunks AS ({cdc}),
per_digest AS (
  SELECT c.chunk_digest,
         CAST(count(*) AS BIGINT) AS occurrences,
         CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
         CAST(min(c.n_words) AS BIGINT) AS n_words
  FROM chunks c JOIN documents d USING (doc_id)
  GROUP BY 1
  HAVING count(*) > 1
)
SELECT chunk_digest, occurrences, n_docs, n_sources, n_words,
       CAST(row_number() OVER (ORDER BY occurrences DESC, chunk_digest)
            AS INT) AS rank
FROM per_digest
ORDER BY occurrences DESC, chunk_digest
LIMIT 10
""",
)
def q_top_shared_chunks(spark, sf_dir):
    """Boilerplate provenance at chunk granularity: the 10 most
    duplicated content-defined chunks corpus-wide, with how many
    documents and how many distinct SOURCES each appears in — a chunk
    shared across sources is template/licensing text that every
    extractor copied, exactly what an operator inspects before writing
    a removal rule (the action view behind cdc_chunk_dedup's per-source
    rates). Digest groupBy then TakeOrderedAndProject top-10; the rank
    window runs over the 10-row frame."""
    d = _t(spark, sf_dir, "documents")
    per_digest = (
        cdc_chunks(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .groupBy("chunk_digest")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("n_words").cast("bigint").alias("n_words"),
        )
        .filter(F.col("occurrences") > 1)
    )
    order = [F.col("occurrences").desc(), F.col("chunk_digest").asc()]
    top = per_digest.orderBy(*order).limit(10)
    w = Window.orderBy(*order)  # O(k)=10-row frame after the limit
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


ORACLE["top_shared_chunks"] = ORACLE["top_shared_chunks"].replace(
    "{cdc}", cdc_chunks_oracle_sql()
)
