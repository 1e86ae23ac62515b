"""Brute-force pins for the round-11 retrieval / privacy / CDC / ops
additions: each operator's output is recomputed in plain python (no
Spark, no SQL) on sf0.001 or on tiny constructed frames, so a same-bug
oracle pair cannot hide a wrong formula (the minhash_signatures_md5
precedent)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pytest

from scikit_learn_imputer_spark.plans.queries import BM25_QUERY_TERMS, QUERIES

K1, B = 1.2, 0.75


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_bm25_topk_matches_python_brute_force(spark, sf_smoke):
    docs = {
        did: [w for w in text.strip().split(" ") if w]
        for did, text, _ in _docs(sf_smoke)
    }
    n = float(len(docs))
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = Counter()
    for ws in docs.values():
        for t in set(ws) & set(BM25_QUERY_TERMS):
            df[t] += 1
    expected = []
    for did, ws in docs.items():
        tf = Counter(w for w in ws if w in BM25_QUERY_TERMS)
        if not tf:
            continue
        dl = float(len(ws))
        score = sum(
            math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            * (c * (K1 + 1))
            / (c + K1 * (1 - B + B * dl / avgdl))
            for t, c in tf.items()
        )
        expected.append((round(score, 6), did, len(tf)))
    expected.sort(key=lambda r: (-r[0], r[1]))
    top = expected[:10]

    got = {
        r["doc_id"]: r
        for r in QUERIES["bm25_topk"](spark, sf_smoke).collect()
    }
    assert len(got) == len(top)
    for rank, (score, did, n_terms) in enumerate(top, start=1):
        row = got[did]
        assert row["rank"] == rank
        assert row["n_terms_matched"] == n_terms
        assert row["score"] == pytest.approx(score, abs=1e-6)


def test_k_anonymity_audit_matches_python_brute_force(spark, sf_smoke):
    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, c_acctbal FROM "
        f"'{sf_smoke}/customer.parquet'"
    ).fetchall()
    classes = defaultdict(list)
    for nat, seg, bal in rows:
        classes[(nat, seg, math.floor(bal / 1000))].append(bal)
    hist = defaultdict(lambda: [0, 0, None])
    for members in classes.values():
        size = len(members)
        h = hist[size]
        h[0] += 1
        h[1] += size
        l_div = len(set(members))
        h[2] = l_div if h[2] is None else min(h[2], l_div)

    got = QUERIES["k_anonymity_audit"](spark, sf_smoke).collect()
    assert {r["class_size"] for r in got} == set(hist)
    for r in got:
        n_classes, n_rows, min_l = hist[r["class_size"]]
        assert r["n_classes"] == n_classes
        assert r["n_rows"] == n_rows
        assert r["min_distinct_sensitive"] == min_l
        assert r["risky"] == int(r["class_size"] < 5)
    # The audit must account for every customer exactly once.
    assert sum(r["n_rows"] for r in got) == len(rows)


def _cdc_brute(words, nibbles=("0",)):
    """Reference CDC: boundary AFTER word w iff md5(w) ends in a
    boundary nibble; returns [(chunk_idx, n_words, digest)]."""
    chunks, cur, idx = [], [], 0
    for w in words:
        cur.append(w)
        if hashlib.md5(w.encode()).hexdigest()[-1] in nibbles:
            chunks.append((idx, cur))
            idx, cur = idx + 1, []
    if cur:
        chunks.append((idx, cur))
    return [
        (i, len(ws), hashlib.md5(" ".join(ws).encode()).hexdigest())
        for i, ws in chunks
    ]


def test_cdc_chunks_match_python_brute_force(spark, sf_smoke):
    from scikit_learn_imputer_spark.dedup.cdc import cdc_chunks

    docs = _docs(sf_smoke)[:40]
    sdf = spark.createDataFrame(
        [(d, t) for d, t, _ in docs], "doc_id long, text string"
    )
    got = defaultdict(dict)
    for r in cdc_chunks(sdf).collect():
        got[r["doc_id"]][r["chunk_idx"]] = (r["n_words"], r["chunk_digest"])
    for did, text, _ in docs:
        words = [w for w in text.strip().split(" ") if w]
        exp = _cdc_brute(words)
        assert len(got[did]) == len(exp), f"doc {did}: chunk count"
        for idx, n_words, digest in exp:
            assert got[did][idx] == (n_words, digest), f"doc {did}@{idx}"


def test_cdc_boundaries_are_edit_stable(spark):
    """The CDC property fixed-width chunking lacks: inserting one word
    near the front changes only the chunk containing the edit — every
    chunk after the next content boundary keeps its digest."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu") * 3
    words = base.split(" ")
    edited = words[:2] + ["INSERTED"] + words[2:]
    from scikit_learn_imputer_spark.dedup.cdc import cdc_chunks

    sdf = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(edited))],
        "doc_id long, text string",
    )
    out = defaultdict(set)
    for r in cdc_chunks(sdf).collect():
        out[r["doc_id"]].add(r["chunk_digest"])
    orig, ed = out[0], out[1]
    # Sanity: the brute force agrees the docs chunk at all.
    assert len(orig) > 2
    # All original chunks except the edited one survive verbatim.
    assert len(orig - ed) == 1
    assert len(ed - orig) <= 2  # the edit may split its chunk in two


def test_event_rate_anomalies_matches_python_brute_force(spark, sf_smoke):
    rows = duckdb.sql(
        f"SELECT event_type, date_trunc('hour', ts), count(*) FROM "
        f"'{sf_smoke}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    by_type = defaultdict(list)
    for et, h, c in rows:
        by_type[et].append((h, c))
    expected = {}
    for et, buckets in by_type.items():
        for i, (h, c) in enumerate(buckets):
            prev = [x for _, x in buckets[max(0, i - 24):i]]
            if len(prev) < 12:
                continue
            mean = sum(prev) / len(prev)
            var = sum((x - mean) ** 2 for x in prev) / (len(prev) - 1)
            std = math.sqrt(var)
            z = (c - mean) / std if std > 0 else None
            expected[(et, h)] = (
                c,
                round(mean, 6),
                None if z is None else round(z, 6),
                int(z is not None and abs(z) > 3),
            )

    got = QUERIES["event_rate_anomalies"](spark, sf_smoke).collect()
    assert {(r["event_type"], r["hour_ts"]) for r in got} == set(expected)
    for r in got:
        c, mean, z, flag = expected[(r["event_type"], r["hour_ts"])]
        assert r["n_events"] == c
        assert r["mean_prev"] == pytest.approx(mean, abs=1e-6)
        if z is None:
            assert r["z_score"] is None
        else:
            assert r["z_score"] == pytest.approx(z, abs=1e-6)
        assert r["is_anomaly"] == flag
    # The detector must actually fire somewhere at this sf — an
    # all-zero flag column would make the query a vacuous report.
    assert any(r["is_anomaly"] == 1 for r in got) or all(
        abs(v[2] or 0) <= 3 for v in expected.values()
    )


def _bm25_python(sf_dir):
    """Rounded per-doc BM25 scores for BM25_QUERY_TERMS (brute force)."""
    docs = {
        did: [w for w in text.strip().split(" ") if w]
        for did, text, _ in _docs(sf_dir)
    }
    n = float(len(docs))
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = Counter()
    for ws in docs.values():
        for t in set(ws) & set(BM25_QUERY_TERMS):
            df[t] += 1
    out = {}
    for did, ws in docs.items():
        tf = Counter(w for w in ws if w in BM25_QUERY_TERMS)
        if not tf:
            continue
        dl = float(len(ws))
        out[did] = round(
            sum(
                math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                * (c * (K1 + 1))
                / (c + K1 * (1 - B + B * dl / avgdl))
                for t, c in tf.items()
            ),
            6,
        )
    return out


def test_bm25_source_relevance_matches_python_brute_force(spark, sf_smoke):
    scores = _bm25_python(sf_smoke)
    # EXACT lower-rank p90 — sorted[((n-1)*9)//10], matching the
    # engine's exact_rank_quantile_select (np.percentile interpolates,
    # the cross-engine ULP hazard the round-12 sf1 sweep retired).
    vs = sorted(scores.values())
    thr = vs[((len(vs) - 1) * 9) // 10]
    per_source = defaultdict(lambda: [0, 0, [], 0])
    for did, _, source in _docs(sf_smoke):
        st = per_source[source]
        st[0] += 1
        if did in scores:
            st[1] += 1
            st[2].append(scores[did])
            if scores[did] >= thr:
                st[3] += 1
    got = QUERIES["bm25_source_relevance"](spark, sf_smoke).collect()
    assert {r["source"] for r in got} == set(per_source)
    for r in got:
        n_docs, matched, vals, topd = per_source[r["source"]]
        assert r["n_docs"] == n_docs
        assert r["matched_docs"] == matched
        assert r["top_decile_docs"] == topd
        mean = round(sum(vals) / len(vals), 6) if vals else 0.0
        assert r["mean_score"] == pytest.approx(mean, abs=1e-6)


def test_user_retention_cohorts_matches_python_brute_force(spark, sf_smoke):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(date_trunc('day', ts) AS DATE) FROM "
        f"'{sf_smoke}/events.parquet'"
    ).fetchall()
    first = {}
    for uid, day in rows:
        if uid not in first or day < first[uid]:
            first[uid] = day
    cohort_size = Counter(first.values())
    active = defaultdict(set)
    for uid, day in rows:
        active[(first[uid], (day - first[uid]).days)].add(uid)

    got = QUERIES["user_retention_cohorts"](spark, sf_smoke).collect()
    assert {(r["cohort_day"], r["day_offset"]) for r in got} == set(active)
    for r in got:
        key = (r["cohort_day"], r["day_offset"])
        assert r["n_active"] == len(active[key])
        assert r["cohort_size"] == cohort_size[r["cohort_day"]]
        assert r["retention"] == pytest.approx(
            round(len(active[key]) / cohort_size[r["cohort_day"]], 6),
            abs=1e-6,
        )
    # Every cohort must report offset 0 with full retention.
    zero = {r["cohort_day"]: r for r in got if r["day_offset"] == 0}
    assert set(zero) == set(cohort_size)
    assert all(r["retention"] == pytest.approx(1.0) for r in zero.values())


def test_lang_source_matrix_matches_python_brute_force(spark, sf_smoke):
    rows = duckdb.sql(
        f"SELECT source, lang FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    by_source = defaultdict(Counter)
    for source, lang in rows:
        by_source[source][lang] += 1
    got = QUERIES["lang_source_matrix"](spark, sf_smoke).collect()
    assert {r["source"] for r in got} == set(by_source)
    for r in got:
        cnt = by_source[r["source"]]
        n = sum(cnt.values())
        assert r["n_docs"] == n
        assert r["n_langs"] == len(cnt)
        top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert r["top_lang"] == top[0]
        assert r["top_share"] == pytest.approx(
            round(top[1] / n, 6), abs=1e-6
        )
        h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        assert r["lang_entropy"] == pytest.approx(round(h, 6), abs=1e-6)


def test_dp_release_calibration_matches_python_brute_force(spark, sf_smoke):
    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, count(*) FROM "
        f"'{sf_smoke}/customer.parquet' GROUP BY 1, 2"
    ).fetchall()
    expected = {}
    for nat, seg, cnt in rows:
        key = f"dp:{nat}:{seg}"
        u = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32
        v = u - 0.5
        sign = (v > 0) - (v < 0)
        noise = -sign * math.log(max(1 - 2 * abs(v), 2**-32))
        expected[(nat, seg)] = (cnt, round(noise, 6), round(cnt + noise, 6))

    got = QUERIES["dp_release_calibration"](spark, sf_smoke).collect()
    assert {(r["c_nationkey"], r["c_mktsegment"]) for r in got} == set(
        expected
    )
    for r in got:
        cnt, noise, noisy = expected[(r["c_nationkey"], r["c_mktsegment"])]
        assert r["true_count"] == cnt
        assert r["noise"] == pytest.approx(noise, abs=1e-6)
        assert r["noisy_count"] == pytest.approx(noisy, abs=1e-6)
        assert abs(r["released_count"] - noisy) <= 0.5 + 1e-6
    # Laplace(1) sanity on the realized draws: zero-mean-ish, and the
    # largest |noise| stays within the e^-|x| tail for this class count.
    noises = [expected[k][1] for k in expected]
    assert abs(sum(noises) / len(noises)) < 1.0
    assert max(abs(x) for x in noises) < math.log(2**32)


def _term_freqs(sf_dir):
    by_source = defaultdict(Counter)
    for _, text, source in _docs(sf_dir):
        for w in text.strip().split(" "):
            if w:
                by_source[source][w] += 1
    return by_source


def test_zipf_fit_by_source_matches_python_brute_force(spark, sf_smoke):
    by_source = _term_freqs(sf_smoke)
    got = {r["source"]: r for r in
           QUERIES["zipf_fit_by_source"](spark, sf_smoke).collect()}
    assert set(got) == set(by_source)
    for source, cnt in by_source.items():
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [math.log(i + 1) for i in range(len(ordered))]
        ys = [math.log(f) for _, f in ordered]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        syy = sum((y - my) ** 2 for y in ys)
        slope = sxy / sxx
        r2 = sxy * sxy / (sxx * syy) if syy > 0 else None
        r = got[source]
        assert r["n_types"] == n
        assert r["slope"] == pytest.approx(round(slope, 4), abs=1e-4)
        assert r["intercept"] == pytest.approx(
            round(my - slope * mx, 4), abs=1e-4
        )
        if r2 is not None:
            assert r["r2"] == pytest.approx(round(r2, 6), abs=1e-6)


def test_lexical_diversity_matches_python_brute_force(spark, sf_smoke):
    by_source = _term_freqs(sf_smoke)
    got = {r["source"]: r for r in
           QUERIES["lexical_diversity_by_source"](spark, sf_smoke).collect()}
    assert set(got) == set(by_source)
    for source, cnt in by_source.items():
        n_tok = sum(cnt.values())
        n_typ = len(cnt)
        r = got[source]
        assert r["n_tokens"] == n_tok
        assert r["n_types"] == n_typ
        assert r["ttr"] == pytest.approx(round(n_typ / n_tok, 6), abs=1e-6)
        hapax = sum(1 for f in cnt.values() if f == 1)
        assert r["hapax_frac"] == pytest.approx(
            round(hapax / n_typ, 6), abs=1e-6
        )
        simpson = sum(f * (f - 1) for f in cnt.values()) / (
            n_tok * (n_tok - 1)
        )
        assert r["simpson"] == pytest.approx(round(simpson, 6), abs=1e-6)


def test_bm25_persisted_index_prunes_partitions_and_matches(spark, sf_smoke):
    """The persisted index must (a) return exactly the from-scratch
    scores and (b) physically prune: a 3-term query reads at most 3 of
    the 64 term-bucket partition directories."""
    import tempfile

    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        python_term_bucket,
        save_bm25_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tempfile.mkdtemp(prefix="sli_bm25_test_")
    save_bm25_index(*build_bm25_index(d), path)
    postings, dfs, stats = load_bm25_index(spark, path)

    probe = bm25_scores_from_index(postings, dfs, stats, BM25_QUERY_TERMS)
    fresh = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores(d, BM25_QUERY_TERMS).collect()
    }
    got = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in probe.collect()
    }
    assert got == fresh

    plan = probe._jdf.queryExecution().executedPlan().toString()
    want_buckets = sorted({python_term_bucket(t) for t in BM25_QUERY_TERMS})
    # Partition pruning is visible in the scan: the bucket filter is a
    # partition filter, not a post-scan predicate.
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "postings scan carries no partition filter"
    assert "term_bucket" in m.group(1)
    for b in want_buckets:
        assert str(b) in m.group(1)
    # The term predicate reaches the scan too (pushed data filter).
    assert "PushedFilters" in plan and "term" in plan


def test_bm25_incremental_appends_equal_full_rebuild(spark, sf_smoke):
    """Two successive delta appends must fold to EXACTLY the index a
    from-scratch build over the full corpus produces — scores, matched
    counts, df and corpus stats all included (the incremental-store
    equivalence contract, applied to retrieval)."""
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        append_bm25_index,
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    path = tempfile.mkdtemp(prefix="sli_bm25_incr_test_")
    save_bm25_index(*build_bm25_index(d.filter(F.col("doc_id") % 3 == 0)),
                    path)
    append_bm25_index(d.filter(F.col("doc_id") % 3 == 1), path)
    append_bm25_index(d.filter(F.col("doc_id") % 3 == 2), path)
    postings, dfs, stats = load_bm25_index(spark, path)

    got = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores_from_index(
            postings, dfs, stats, BM25_QUERY_TERMS
        ).collect()
    }
    fresh = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores(d, BM25_QUERY_TERMS).collect()
    }
    assert got == fresh
    st = stats.collect()[0]
    assert st["n_docs"] == d.count()


def test_bm25_takedown_then_append_folds_commutatively(spark, sf_smoke):
    """Deletion and ingestion deltas are sums, so their order must not
    matter: (build A+B, takedown B, append C) == from-scratch (A+C) —
    scores, matched counts and the folded corpus stats all equal."""
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        append_bm25_index,
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    a = d.filter(F.col("doc_id") % 3 == 0)
    bpart = d.filter(F.col("doc_id") % 3 == 1)
    cpart = d.filter(F.col("doc_id") % 3 == 2)

    path = tempfile.mkdtemp(prefix="sli_bm25_td_test_")
    save_bm25_index(*build_bm25_index(a.unionByName(bpart)), path)
    takedown_bm25_index(spark, path, bpart.select("doc_id"))
    append_bm25_index(cpart, path)

    postings, dfs, stats = load_bm25_index(spark, path)
    tomb = load_bm25_tombstones(spark, path)
    got = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores_from_index(
            postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
        ).collect()
    }
    want_docs = a.unionByName(cpart)
    fresh = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores(want_docs, BM25_QUERY_TERMS).collect()
    }
    assert got == fresh
    # No erased id can ever surface.
    erased = {r["doc_id"] for r in bpart.select("doc_id").collect()}
    assert not (set(got) & erased)
    st = stats.collect()[0]
    assert st["n_docs"] == want_docs.count()


def test_zipf_degenerate_sources_match_duckdb_regr_semantics(spark):
    """Degenerate vocabulary shapes must not diverge between engines:
    a source whose ln(freq) is constant (all terms equally frequent)
    reads r2 = 0.0 like DuckDB's regr_r2, and a single-type source
    reads NULL slope/intercept/r2 like regr_* with zero x-variance —
    exactly the template/machine-generated text this forensics query
    exists to flag."""
    rows = [
        # 'flat': three terms, identical freq -> var(y)=0, var(x)>0.
        (0, "aa bb cc aa bb cc", "flat"),
        # 'single': one term only -> one rank point, var(x)=0.
        (1, "zz zz zz zz", "single"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sdf.createOrReplaceTempView("__zipf_degen")

    import duckdb

    from scikit_learn_imputer_spark.plans.queries import ORACLE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', '{src}')" for i, t, src in rows
        )
        + ") AS v(doc_id, text, source)"
    )
    duck = {
        r[0]: r[1:]
        for r in con.execute(ORACLE["zipf_fit_by_source"]).fetchall()
    }

    from scikit_learn_imputer_spark.plans.queries import QUERIES

    # Call the registered implementation against the constructed frame
    # by monkey-free composition: rebuild the same plan through the
    # shared helpers.
    from scikit_learn_imputer_spark.plans.queries import (
        _source_term_freqs,
    )
    from pyspark.sql import Window, functions as F

    tf = _source_term_freqs(sdf)
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
    r2 = F.when(
        vx > 0,
        F.when(
            vy > 0, F.pow(F.covar_pop("x", "y"), 2) / (vx * vy)
        ).otherwise(F.lit(1.0)),  # constant y: a zero-slope line fits
                                  # perfectly (DuckDB regr_r2 = 1.0)
    )
    got = {
        r["source"]: (
            r["n_types"],
            r["slope"],
            r["intercept"],
            r["r2"],
        )
        for r in ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.round(slope, 4).alias("slope"),
            F.round(F.avg("y") - slope * F.avg("x"), 4).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .collect()
    }
    assert set(got) == set(duck)
    for src in duck:
        for a, b in zip(got[src], duck[src]):
            if a is None or b is None:
                assert a is None and b is None, (src, got[src], duck[src])
            else:
                assert a == pytest.approx(b, abs=1e-6), (src, got[src])
    # The specific semantics under test:
    assert got["flat"][3] == pytest.approx(1.0)
    assert got["single"][1] is None and got["single"][3] is None


def test_bm25_takedown_is_idempotent(spark, sf_smoke):
    """A replayed/overlapping takedown must be a no-op: tombstoned ids
    are excluded before any negative delta is computed, so running the
    same request twice leaves df/stats exactly once-subtracted."""
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    victims = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    path = tempfile.mkdtemp(prefix="sli_bm25_idem_test_")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(spark, path, victims)
    takedown_bm25_index(spark, path, victims)  # replay — must be no-op

    postings, dfs, stats = load_bm25_index(spark, path)
    tomb = load_bm25_tombstones(spark, path)
    got = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores_from_index(
            postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
        ).collect()
    }
    remaining = d.filter(F.col("doc_id") % 7 != 0)
    fresh = {
        r["doc_id"]: (round(r["score"], 6), r["n_terms_matched"])
        for r in bm25_scores(remaining, BM25_QUERY_TERMS).collect()
    }
    assert got == fresh
    assert stats.collect()[0]["n_docs"] == remaining.count()


def test_bm25_compaction_purges_physically_and_is_idempotent(spark, sf_smoke):
    """After compaction: no victim posting row physically remains, the
    tombstone frame is empty, only victim-bearing buckets were
    rewritten, and a second compaction is a no-op."""
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        build_bm25_index,
        compact_bm25_index,
        load_bm25_tombstones,
        python_term_bucket,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents")
    victims = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    victim_ids = {r["doc_id"] for r in victims.collect()}
    path = tempfile.mkdtemp(prefix="sli_bm25_compact_test_")
    save_bm25_index(*build_bm25_index(d), path)

    before = spark.read.parquet(f"{path}/postings")
    victim_buckets = {
        r["term_bucket"]
        for r in before.filter(F.col("doc_id").isin(list(victim_ids)))
        .select("term_bucket")
        .distinct()
        .collect()
    }
    # Materialize the survivor count BEFORE the swap deletes the files
    # the lazy `before` frame points at.
    keep = before.filter(~F.col("doc_id").isin(list(victim_ids))).count()
    takedown_bm25_index(spark, path, victims)
    purged = compact_bm25_index(spark, path)
    assert set(purged) == victim_buckets

    after = spark.read.parquet(f"{path}/postings")
    assert after.filter(F.col("doc_id").isin(list(victim_ids))).count() == 0
    # Survivor postings are untouched (same row count as an anti-join).
    assert after.count() == keep
    # Tombstones cleared -> empty frame, and a replay purges nothing.
    tomb = load_bm25_tombstones(spark, path)
    assert tomb is not None and tomb.count() == 0
    assert compact_bm25_index(spark, path) == []


def test_bm25_index_stats_matches_python_brute_force(spark, sf_smoke):
    from scikit_learn_imputer_spark.functions.retrieval import (
        python_term_bucket,
    )

    per_bucket = defaultdict(lambda: [0, set()])
    for did, text, _ in _docs(sf_smoke):
        for term in {w for w in text.strip().split(" ") if w}:
            st = per_bucket[python_term_bucket(term)]
            st[0] += 1
            st[1].add(term)
    got = QUERIES["bm25_index_stats"](spark, sf_smoke).collect()
    assert {r["term_bucket"] for r in got} == set(per_bucket)
    for r in got:
        n_postings, terms = per_bucket[r["term_bucket"]]
        assert r["n_postings"] == n_postings
        assert r["n_terms"] == len(terms)


def test_phrase_search_matches_python_brute_force(spark, sf_smoke):
    # .split() == whitespace-RUN tokenization with no empty tokens —
    # the exact semantics of the query's split(trim, '\s+') (ADVICE
    # r11: positions must index filtered tokens or doubled spaces break
    # pos+1 adjacency).
    expected = {}
    for did, text, _ in _docs(sf_smoke):
        words = text.split()
        hits = [
            i
            for i in range(len(words) - 1)
            if words[i] == "spark" and words[i + 1] == "window"
        ]
        if hits:
            expected[did] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in QUERIES["phrase_search"](spark, sf_smoke).collect()
    }
    assert got == expected
    assert expected, "phrase must actually occur at this sf"


def test_dp_laplace_release_threads_secret_and_hides_diagnostics(spark, sf_smoke):
    """ADVICE r11: the PRODUCTION DP release must (a) expose ONLY the
    noised integer — no true_count/noise columns to subtract back out —
    (b) produce different noise under different secret seeds, (c) be
    reproducible under the same seed, and (d) validate its params."""
    import pytest as _pytest

    from scikit_learn_imputer_spark.functions.privacy import dp_laplace_release
    from scikit_learn_imputer_spark.sources.tables import load_table

    c = load_table(spark, sf_smoke, "customer")
    rel = lambda seed, epoch: {
        (r[0], r[1]): r[2]
        for r in dp_laplace_release(
            c,
            ["c_nationkey", "c_mktsegment"],
            secret_seed=seed,
            release_epoch=epoch,
        ).collect()
    }
    rel_a = dp_laplace_release(
        c,
        ["c_nationkey", "c_mktsegment"],
        secret_seed="seed-a",
        release_epoch="e1",
    )
    assert set(rel_a.columns) == {
        "c_nationkey", "c_mktsegment", "released_count"
    }
    a = {(r[0], r[1]): r[2] for r in rel_a.collect()}
    b = rel("seed-b", "e1")
    a2 = rel("seed-a", "e1")
    assert a == a2, "same (seed, epoch) must reproduce the release"
    assert a != b, "different seeds must draw different noise"
    # ADVICE r12: a fresh epoch under the SAME seed must draw fresh
    # noise, otherwise re-releases of an evolving dataset leak exact
    # true-count deltas.
    assert a != rel("seed-a", "e2"), "epochs must decorrelate releases"
    assert all(v >= 0 for v in a.values()), "counts clamp at zero"
    # Utility: noise is Laplace(1/eps=1) — releases stay near truth.
    true = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            f"SELECT c_nationkey, c_mktsegment, count(*) FROM "
            f"'{sf_smoke}/customer.parquet' GROUP BY 1, 2"
        ).fetchall()
    }
    assert set(a) == set(true)
    within = sum(1 for k in a if abs(a[k] - true[k]) <= 5)
    assert within >= len(a) * 0.9
    with _pytest.raises(ValueError, match="secret_seed"):
        dp_laplace_release(
            c, ["c_nationkey"], secret_seed="", release_epoch="e1"
        )
    with _pytest.raises(ValueError, match="release_epoch"):
        dp_laplace_release(
            c, ["c_nationkey"], secret_seed="s", release_epoch=""
        )
    with _pytest.raises(ValueError, match="eps"):
        dp_laplace_release(
            c, ["c_nationkey"], secret_seed="s", release_epoch="e1", eps=0
        )
    with _pytest.raises(ValueError, match="group_cols"):
        dp_laplace_release(c, [], secret_seed="s", release_epoch="e1")


def test_dp_key_encoding_never_aliases_distinct_classes(spark):
    """ADVICE r12: concat_ws skips NULLs, so (NULL,'x') and ('x',NULL)
    used to share a noise draw; and un-prefixed joins let ('a|b', 'c')
    alias ('a', 'b|c'). The length-prefixed NULL-safe key must give
    every distinct class tuple its own independent draw."""
    from scikit_learn_imputer_spark.functions.privacy import dp_laplace_release

    rows = [(None, "x"), ("x", None), ("a|b", "c"), ("a", "b|c"),
            ("1:x", "y"), ("x", "y")] * 50
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    out = dp_laplace_release(
        df, ["g1", "g2"], secret_seed="s", release_epoch="e1"
    ).collect()
    assert len(out) == 6
    # All classes hold 50 true rows; aliasing would force equal draws.
    released = [r["released_count"] for r in out]
    assert len(set(released)) > 1, "class keys collided"
    # Directly pin the key tokens: every pair must hash distinctly.
    from pyspark.sql import functions as F
    from scikit_learn_imputer_spark.functions.privacy import _dp_key_part

    keys = (
        df.select(
            F.concat_ws(
                "|", _dp_key_part(F.col("g1")), _dp_key_part(F.col("g2"))
            ).alias("k")
        )
        .distinct()
        .collect()
    )
    assert len({r["k"] for r in keys}) == 6


def test_bm25_takedown_partial_crash_replay_does_not_double_subtract(spark, sf_smoke):
    """ADVICE r11 (medium): a crash between the negative-delta writes
    and the tombstone write, followed by a replay, must NOT
    double-subtract df/stats. Simulated by deleting the request's
    tombstone subdir after a completed takedown (= crash just before
    the LAST write) and replaying the identical request: the
    request-keyed overwrite must leave exactly one correction."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.plans.queries import _t

    path = tempfile.mkdtemp(prefix="sli_takedown_crash_")
    d = _t(spark, sf_smoke, "documents")
    victims = d.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(spark, path, victims, request_id="req-1")
    # Simulate the crash: neither the tombstone nor the applied-ledger
    # marker (both written after the df/stats corrections) landed.
    shutil.rmtree(f"{path}/tombstones/takedown-req-1")
    shutil.rmtree(f"{path}/applied/takedown-req-1")
    takedown_bm25_index(spark, path, victims, request_id="req-1")  # replay

    survivors = d.join(victims, "doc_id", "left_anti")
    ref_path = tempfile.mkdtemp(prefix="sli_takedown_ref_")
    save_bm25_index(*build_bm25_index(survivors), ref_path)

    postings, dfs, stats = load_bm25_index(spark, path)
    tomb = load_bm25_tombstones(spark, path)
    got = bm25_scores_from_index(
        postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
    )
    rp, rd, rs = load_bm25_index(spark, ref_path)
    want = bm25_scores_from_index(rp, rd, rs, BM25_QUERY_TERMS)
    g = {r["doc_id"]: round(r["score"], 6) for r in got.collect()}
    w = {r["doc_id"]: round(r["score"], 6) for r in want.collect()}
    assert g == w, "replay after partial crash corrupted df/stats"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ref_path, ignore_errors=True)


def test_bm25_append_with_append_id_is_idempotent(spark, sf_smoke):
    """ADVICE r11 (low): a keyed append (the streaming ingest path)
    replayed with the SAME id must leave the index identical — postings
    not duplicated, df/stats not inflated."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        append_bm25_index,
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )
    from scikit_learn_imputer_spark.plans.queries import _t

    path = tempfile.mkdtemp(prefix="sli_append_idem_")
    d = _t(spark, sf_smoke, "documents")
    base = d.filter(F.col("doc_id") % 2 == 0)
    delta = d.filter(F.col("doc_id") % 2 == 1)
    save_bm25_index(*build_bm25_index(base), path)
    append_bm25_index(delta, path, append_id="stream-7")
    append_bm25_index(delta, path, append_id="stream-7")  # replay

    postings, dfs, stats = load_bm25_index(spark, path)
    n_postings = postings.count()
    ref_path = tempfile.mkdtemp(prefix="sli_append_ref_")
    save_bm25_index(*build_bm25_index(d), ref_path)
    rp, rd, rs = load_bm25_index(spark, ref_path)
    assert n_postings == rp.count(), "replayed append duplicated postings"
    g = {r["doc_id"]: round(r["score"], 6)
         for r in bm25_scores_from_index(
             postings, dfs, stats, BM25_QUERY_TERMS).collect()}
    w = {r["doc_id"]: round(r["score"], 6)
         for r in bm25_scores_from_index(
             rp, rd, rs, BM25_QUERY_TERMS).collect()}
    assert g == w, "replayed append inflated df/stats"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ref_path, ignore_errors=True)


def test_bm25_takedown_replay_after_compaction_is_noop(spark, sf_smoke):
    """ADVICE r12 (medium): a late replay of a fully-applied takedown
    AFTER compaction has purged its posting rows and cleared the
    tombstones must NOT recompute the negative df delta from the purged
    (empty) postings — that would overwrite the request's correction
    away and permanently inflate idf for every victim term. The
    applied-request ledger (written at takedown, rewritten by
    compaction before the tombstone clear) short-circuits the replay;
    scores must equal a from-scratch survivor index both before and
    after the replay."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        compact_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.plans.queries import _t

    path = tempfile.mkdtemp(prefix="sli_takedown_compact_replay_")
    d = _t(spark, sf_smoke, "documents")
    victims = d.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(spark, path, victims, request_id="req-legal-1")
    assert compact_bm25_index(spark, path) != []

    # The ledger survived the tombstone clear.
    applied = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{path}/applied"
    )
    assert [r["__req"] for r in applied.collect()] == ["req-legal-1"]

    def scores():
        postings, dfs, stats = load_bm25_index(spark, path)
        tomb = load_bm25_tombstones(spark, path)
        got = bm25_scores_from_index(
            postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
        )
        return {r["doc_id"]: round(r["score"], 6) for r in got.collect()}

    ref_path = tempfile.mkdtemp(prefix="sli_takedown_compact_ref_")
    save_bm25_index(
        *build_bm25_index(d.join(victims, "doc_id", "left_anti")), ref_path
    )
    rp, rd, rs = load_bm25_index(spark, ref_path)
    want = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores_from_index(
            rp, rd, rs, BM25_QUERY_TERMS
        ).collect()
    }
    assert scores() == want, "compaction corrupted the index"

    # The replay that used to erase the df correction.
    takedown_bm25_index(spark, path, victims, request_id="req-legal-1")
    assert scores() == want, (
        "post-compaction replay overwrote the takedown's df correction"
    )
    # Content-addressed replay (no explicit id) of the same victim set
    # resolves to a DIFFERENT key and must re-subtract nothing either:
    # its victims have no postings left and their tombstone exclusion is
    # gone — this documents the residual doclens limitation, so pin the
    # df/idf half only: df deltas for victim terms stay intact.
    dfs_sum = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{path}/dfs")
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") < 0)
        .count()
    )
    assert dfs_sum == 0, "folded df went negative after replay"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ref_path, ignore_errors=True)


@pytest.mark.parametrize(
    "survived",
    [
        ("dfs",),                                  # crashed after write 1
        ("dfs", "stats"),                          # crashed after write 2
        ("dfs", "stats", "tombstones"),            # crashed after write 3
        ("dfs", "stats", "tombstones", "applied"),  # completed; late replay
    ],
    ids=["after-dfs", "after-stats", "after-tombstones", "after-marker"],
)
def test_bm25_takedown_crash_at_every_write_then_replay(
    spark, sf_smoke, survived
):
    """VERDICT r13 #6: exhaustive crash-window property — kill the
    takedown after EACH of its four request-keyed writes (dfs, stats,
    tombstones, applied marker), replay the identical request, and
    assert the folded index equals a from-scratch rebuild over the
    survivors every time: identical probe scores, identical df totals
    per queried term, identical corpus stats (n_docs, sum_dl). The
    write order is the crash-atomicity CONTRACT (tombstones after
    stats, marker last) — this test fails if the order regresses or if
    a replay folds any correction twice."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.retrieval import (
        bm25_scores_from_index,
        build_bm25_index,
        load_bm25_index,
        load_bm25_tombstones,
        save_bm25_index,
        takedown_bm25_index,
    )
    from scikit_learn_imputer_spark.plans.queries import _t

    path = tempfile.mkdtemp(prefix="sli_takedown_crashpt_")
    d = _t(spark, sf_smoke, "documents")
    victims = d.filter(F.col("doc_id") % 10 == 3).select("doc_id")
    save_bm25_index(*build_bm25_index(d), path)
    takedown_bm25_index(spark, path, victims, request_id="req-x")
    # Simulate the crash: artifacts later than the crash point vanish
    # (each write is an atomic request-keyed subdir OVERWRITE, so the
    # on-disk state after a crash at write k is exactly the first k
    # subdirs).
    for artifact in ("dfs", "stats", "tombstones", "applied"):
        if artifact not in survived:
            shutil.rmtree(
                f"{path}/{artifact}/takedown-req-x", ignore_errors=True
            )
    takedown_bm25_index(spark, path, victims, request_id="req-x")  # replay

    survivors = d.join(victims, "doc_id", "left_anti")
    ref_path = tempfile.mkdtemp(prefix="sli_takedown_crashpt_ref_")
    save_bm25_index(*build_bm25_index(survivors), ref_path)

    postings, dfs, stats = load_bm25_index(spark, path)
    tomb = load_bm25_tombstones(spark, path)
    rp, rd, rs = load_bm25_index(spark, ref_path)
    # Probe scores.
    g = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores_from_index(
            postings, dfs, stats, BM25_QUERY_TERMS, tombstones=tomb
        ).collect()
    }
    w = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores_from_index(
            rp, rd, rs, BM25_QUERY_TERMS
        ).collect()
    }
    assert g == w, f"scores diverged after crash at {survived[-1]}"
    # Folded df totals per queried term.
    gdf = {
        r["term"]: r["df"]
        for r in dfs.filter(F.col("term").isin(list(BM25_QUERY_TERMS)))
        .groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    wdf = {
        r["term"]: r["df"]
        for r in rd.filter(F.col("term").isin(list(BM25_QUERY_TERMS)))
        .groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    assert gdf == wdf, f"df totals diverged after crash at {survived[-1]}"
    # Folded corpus stats (load_bm25_index exposes n_docs + avgdl).
    gs = stats.collect()[0]
    ws = rs.collect()[0]
    assert (gs["n_docs"], round(gs["avgdl"], 6)) == (
        ws["n_docs"],
        round(ws["avgdl"], 6),
    ), f"corpus stats diverged after crash at {survived[-1]}"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ref_path, ignore_errors=True)
