"""Property-based tests (hypothesis) — a layer the reference lacks
(SURVEY.md §5): operators must hold their invariants on arbitrary inputs,
not just golden frames.

Example counts are kept small: each example spins Spark jobs."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scikit_learn_imputer_spark.functions.stats import avg_rank
from scikit_learn_imputer_spark.operators.fill import ffill_bfill
from scikit_learn_imputer_spark.operators.missing import missing_metrics
from scikit_learn_imputer_spark.operators.scale import minmax_scale

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

maybe_val = st.one_of(
    st.none(), st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 3))
)


@given(vals=st.lists(maybe_val, min_size=1, max_size=25))
@SETTINGS
def test_ffill_bfill_property_matches_pandas(spark, vals):
    schema = StructType(
        [StructField("id", LongType(), False), StructField("v", DoubleType(), True)]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    out = {r["id"]: r["v"] for r in ffill_bfill(df, "id", ["v"], num_partitions=3).collect()}
    expected = pd.Series(vals).ffill().bfill()
    for i, e in expected.items():
        want = None if pd.isna(e) else e
        assert out[i] == want


@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=25))
@SETTINGS
def test_minmax_bounds_property(spark, vals):
    schema = StructType(
        [StructField("id", LongType(), False), StructField("v", DoubleType(), True)]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    out = [r["v"] for r in minmax_scale(df, ["v"]).collect()]
    assert all(-1e-9 <= v <= 1 + 1e-9 for v in out)
    if max(vals) > min(vals):
        assert any(abs(v) < 1e-9 for v in out) and any(abs(v - 1) < 1e-9 for v in out)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 1))),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_avg_rank_property_matches_pandas(spark, vals):
    schema = StructType(
        [StructField("id", LongType(), False), StructField("v", DoubleType(), True)]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    got = {r["id"]: r["v_rank"] for r in avg_rank(df, "v").collect()}
    expected = pd.Series(vals, dtype="float64").rank()
    for i, e in expected.items():
        want = None if pd.isna(e) else e
        assert got[i] == want


@given(
    left_ts=st.lists(st.integers(0, 120), min_size=1, max_size=15),
    right_ts=st.lists(st.integers(0, 120), min_size=0, max_size=15),
)
@SETTINGS
def test_asof_join_property_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """asof_join must equal pandas merge_asof (backward, inclusive) for a
    single key — arbitrary timestamp multisets incl. exact-tie cases."""
    import datetime

    from scikit_learn_imputer_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    right_ts = sorted(set(right_ts))  # merge_asof needs sorted unique right
    ldf = pd.DataFrame(
        {
            "id": range(len(left_ts)),
            "k": "a",
            "t": [base + datetime.timedelta(seconds=s) for s in left_ts],
        }
    )
    rdf = pd.DataFrame(
        {
            "k": "a",
            "rt": [base + datetime.timedelta(seconds=s) for s in right_ts],
            "v": [float(s) for s in right_ts],
        }
    )
    if len(rdf):
        expected = pd.merge_asof(
            ldf.sort_values("t"), rdf, left_on="t", right_on="rt", by="k"
        ).set_index("id")["v"]
    else:
        expected = pd.Series([float("nan")] * len(ldf), index=ldf["id"])

    left = spark.createDataFrame(ldf)
    right = (
        spark.createDataFrame(rdf)
        if len(rdf)
        else spark.createDataFrame([], "k string, rt timestamp, v double")
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    for i, e in expected.items():
        want = None if pd.isna(e) else e
        assert got[i] == want, f"id {i}: {got[i]} != {want}"


@pytest.mark.parametrize("direction", ["forward", "nearest"])
@given(
    left_ts=st.lists(st.integers(0, 120), min_size=1, max_size=12),
    right_ts=st.lists(st.integers(0, 120), min_size=0, max_size=12),
)
@SETTINGS
def test_asof_join_directions_match_pandas(spark, direction, left_ts, right_ts):
    """forward and nearest as-of directions must equal pandas merge_asof
    (nearest ties resolve backward, pandas semantics)."""
    import datetime

    from scikit_learn_imputer_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    right_ts = sorted(set(right_ts))
    ldf = pd.DataFrame(
        {
            "id": range(len(left_ts)),
            "k": "a",
            "t": [base + datetime.timedelta(seconds=s) for s in left_ts],
        }
    )
    rdf = pd.DataFrame(
        {
            "k": "a",
            "rt": [base + datetime.timedelta(seconds=s) for s in right_ts],
            "v": [float(s) for s in right_ts],
        }
    )
    if len(rdf):
        expected = pd.merge_asof(
            ldf.sort_values("t"), rdf, left_on="t", right_on="rt", by="k",
            direction=direction,
        ).set_index("id")["v"]
    else:
        expected = pd.Series([float("nan")] * len(ldf), index=ldf["id"])

    left = spark.createDataFrame(ldf)
    right = (
        spark.createDataFrame(rdf)
        if len(rdf)
        else spark.createDataFrame([], "k string, rt timestamp, v double")
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["v"], direction=direction)
    got = {r["id"]: r["v"] for r in out.collect()}
    for i, e in expected.items():
        want = None if pd.isna(e) else e
        assert got[i] == want, f"id {i}: {got[i]} != {want}"


@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=5)),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_missing_metrics_property(spark, vals):
    schema = StructType(
        [StructField("id", LongType(), False), StructField("s", StringType(), True)]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    row = {r["variable"]: r for r in missing_metrics(df, ["s"]).collect()}["s"]
    n_null = sum(v is None for v in vals)
    assert row["missing"] == n_null
    assert row["observed"] == len(vals) - n_null
    assert row["total"] == len(vals)
    assert abs(row["imputation_rate"] - n_null / len(vals)) < 1e-12


@given(
    st.integers(min_value=1, max_value=400),
    st.floats(min_value=0.01, max_value=0.99),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@SETTINGS
def test_split_exact_property(spark, n, t, seed):
    """⌈n·t⌉ test rows exactly, disjoint + complete, for arbitrary sizes,
    fractions, and seeds (hash-bucketed path, 16 buckets)."""
    import math

    from scikit_learn_imputer_spark.operators.split import split_exact

    df = spark.range(n)
    train, test = split_exact(df, t, seed=seed, id_col="id", num_buckets=16)
    # the implementation's ceil: int(n*t + 0.9999999), capped at n
    k = min(int(n * t + 0.9999999), n)
    te = {r["id"] for r in test.collect()}
    tr = {r["id"] for r in train.collect()}
    assert len(te) == k
    assert not (te & tr) and len(te | tr) == n


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),  # spaces included -> real splits
            min_size=0, max_size=40,
        ),
        min_size=1, max_size=10,
    ),
    n=st.integers(2, 4),
)
@SETTINGS
def test_word_ngrams_property_count_and_python_parity(spark, texts, n):
    """len(ngrams) == max(0, words - n + 1) and content equals the obvious
    Python construction, for arbitrary whitespace-y text."""
    import re

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.text import word_ngrams_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )
    got = {
        r["id"]: r["g"]
        for r in df.select(
            "id", word_ngrams_col(F.col("text"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        # Spark's split on trimmed text yields [""] for empty input; its
        # size is 1, giving 0 n-grams for n >= 2 — same as the empty list.
        words = [w for w in re.split(r"\s+", t.strip()) if w != ""]
        expected = [
            " ".join(words[j : j + n]) for j in range(max(0, len(words) - n + 1))
        ]
        assert got[i] == expected, (t, n, got[i], expected)


@given(keys=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=30, unique=True))
@SETTINGS
def test_uniform_hash_property_range_and_determinism(spark, keys):
    """uniform_hash_col lands in [0,1) and is a pure function of the key
    (identical across evaluations), matching the Python md5 construction."""
    import hashlib

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.text import uniform_hash_col

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["u"]
        for r in df.select("k", uniform_hash_col(F.col("k")).alias("u")).collect()
    }
    for k in keys:
        expected = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) / 2**32
        assert 0.0 <= got[k] < 1.0
        assert got[k] == expected


vec_strategy = st.lists(
    st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False).map(
        lambda x: round(x, 4)
    ),
    min_size=2,
    max_size=24,
)


@given(vec=vec_strategy)
@SETTINGS
def test_int8_quantize_pack_roundtrip_property(spark, vec):
    """For arbitrary vectors: codes stay in [-128, 127], pack/unpack is
    the identity, and the packed width is exactly dim bytes."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.similarity.quantize import (
        pack_int8,
        quantize_vec,
        unpack_int8,
    )

    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    r = (
        df.select(
            quantize_vec(F.col("embedding")).alias("codes"),
        )
        .withColumn("packed", pack_int8(F.col("codes")))
        .withColumn("unpacked", unpack_int8(F.col("packed"), len(vec)))
        .collect()[0]
    )
    assert all(-128 <= c <= 127 for c in r["codes"])
    assert len(r["packed"]) == len(vec)
    assert r["unpacked"] == r["codes"]
    # max-magnitude component must hit ±127 exactly (scale definition),
    # unless the vector is all zeros
    if any(v != 0 for v in vec):
        assert max(abs(c) for c in r["codes"]) == 127


@given(
    va=st.lists(st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3)),
                min_size=8, max_size=8),
    vb=st.lists(st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3)),
                min_size=8, max_size=8),
)
@SETTINGS
def test_int8_quantized_cosine_error_bound(spark, va, vb):
    """Quantized cosine approximates exact cosine within the scalar-
    quantization error envelope (loose bound ~2·√d/127 for d=8 ≈ 0.045;
    assert 0.06 to absorb the half-ulp rounding of both vectors)."""
    import math

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.similarity.quantize import (
        quantize_vec,
        quantized_cosine,
    )

    na = math.sqrt(sum(x * x for x in va))
    nb = math.sqrt(sum(x * x for x in vb))
    # skip degenerate/near-zero vectors: cosine is undefined at 0 and the
    # RELATIVE quantization error is unbounded as |v| -> 0
    if na < 1.0 or nb < 1.0:
        return
    exact = sum(x * y for x, y in zip(va, vb)) / (na * nb)

    df = spark.createDataFrame([(va, vb)], ["a", "b"])
    got = df.select(
        quantized_cosine(
            quantize_vec(F.col("a")), quantize_vec(F.col("b"))
        ).alias("qc")
    ).collect()[0]["qc"]
    assert got is not None
    assert abs(got - exact) < 0.06, (exact, got)


@given(
    texts=st.lists(
        st.sampled_from(["alpha doc", "beta doc", "gamma doc", "delta doc", "epsilon doc"]),
        min_size=3,
        max_size=12,
    ),
    split1=st.integers(min_value=1, max_value=11),
)
@SETTINGS
def test_incremental_dedup_equals_global_dedup(spark, tmp_path_factory, texts, split1):
    """Sequential incremental dedup over any batch split must keep
    exactly the same survivor set as one global exact dedup, when doc
    ids increase across batches (min-id survivor policy composes)."""
    from scikit_learn_imputer_spark.dedup.exact import exact_dedup
    from scikit_learn_imputer_spark.dedup.incremental import (
        build_fingerprint_store,
        incremental_dedup_and_commit,
    )

    split1 = min(split1, len(texts) - 1)
    rows = [(i, t) for i, t in enumerate(texts)]
    all_docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = sorted(r["doc_id"] for r in exact_dedup(all_docs).collect())

    store = str(tmp_path_factory.mktemp("fp") / "store")
    build_fingerprint_store(
        spark.createDataFrame([], "doc_id bigint, text string"), store
    )
    got = []
    for batch_rows in (rows[:split1], rows[split1:]):
        if not batch_rows:
            continue
        batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
        s = incremental_dedup_and_commit(batch, store)
        got += [r["doc_id"] for r in s.collect()]
    assert sorted(got) == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=24).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    min_len=st.integers(2, 4),
)
@SETTINGS
def test_exact_substrings_spans_account_for_removed_tokens(spark, docs, min_len):
    """Cross-operator invariant: per document, the scrub's removed-token
    count equals the summed maximal-span lengths from the inventory —
    both derive from the same covered-start union, via different plans.
    Tiny alphabet forces heavy overlapping repeats."""
    from scikit_learn_imputer_spark.dedup.spans import (
        remove_exact_substrings,
        repeated_substring_spans,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    removed = {
        r["doc_id"]: r["n_tokens_before"] - r["n_tokens_after"]
        for r in remove_exact_substrings(df, min_len=min_len, min_count=2).collect()
    }
    spans = {}
    for r in repeated_substring_spans(df, min_len=min_len, min_count=2).collect():
        spans[r["doc_id"]] = spans.get(r["doc_id"], 0) + r["span_len"]
    for d in removed:
        assert removed[d] == spans.get(d, 0), (d, removed[d], spans.get(d))


@given(
    words=st.lists(
        st.text(alphabet="aberqtskcu", min_size=1, max_size=10),
        min_size=0,
        max_size=12,
    )
)
@SETTINGS
def test_bpe_count_word_additivity_and_floor(spark, words):
    """BPE doc count == sum of per-word counts, and every word costs at
    least one token (so the BPE count floors at the whitespace count)."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        bpe_token_counts,
        count_word_tokens,
    )

    vs = frozenset(DEFAULT_BPE_VOCAB)
    lens = tuple(sorted({len(v) for v in DEFAULT_BPE_VOCAB}, reverse=True))
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = bpe_token_counts(df).collect()[0]["n_bpe_tokens"]
    want = sum(count_word_tokens(w, vs, lens) for w in text.split())
    assert got == want
    assert got >= len(text.split())


import re as _re

_word = (
    st.text(alphabet="abcd", min_size=1, max_size=5)
    # runs of >=4 identical symbols can legitimately align merges
    # differently than the reference merger (documented divergence in
    # functions/bpe.py) — exclude them, property covers ordinary words
    .filter(lambda w: not _re.search(r"(.)\1\1\1", w))
)


@given(words=st.lists(_word, min_size=1, max_size=12))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_learn_bpe_merges_property_matches_reference(spark, words):
    """The distributed BPE learner equals the sequential reference
    learner (merge table, ranks, counts) on arbitrary small corpora of
    ordinary words — not just the golden low/lower/newest fixture."""
    from scikit_learn_imputer_spark.functions.bpe import learn_bpe_merges
    from tests.test_pipeline_reports import _reference_bpe

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id bigint, text string"
    )
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    want = _reference_bpe(freqs, 4)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in learn_bpe_merges(docs, num_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc", "dd ee ff", "", "  ", "AA  BB"]),
            min_size=1,
            max_size=5,
        ).map("\n".join),
        min_size=1,
        max_size=6,
    ),
    min_count=st.integers(2, 3),
)
@SETTINGS
def test_dedup_paragraphs_matches_sequential_reference(spark, docs, min_count):
    """Scrub invariant vs a sequential reference: the operator removes
    exactly the paragraphs whose normalized form occurs >= min_count
    times corpus-wide (empties never counted, never removed), preserves
    order, and is idempotent. The tiny paragraph pool (with case and
    whitespace variants of one line) forces cross-doc collisions."""
    import re

    from scikit_learn_imputer_spark.dedup.paragraphs import dedup_paragraphs

    norm = lambda p: re.sub(r"\s+", " ", p.strip().lower())  # noqa: E731
    counts = {}
    for d in docs:
        for p in d.split("\n"):
            if p.strip():
                counts[norm(p)] = counts.get(norm(p), 0) + 1
    expect = {}
    for i, d in enumerate(docs):
        kept = [
            p
            for p in d.split("\n")
            if not p.strip() or counts[norm(p)] < min_count
        ]
        removed = sum(
            1 for p in d.split("\n") if p.strip() and counts[norm(p)] >= min_count
        )
        expect[i] = ("\n".join(kept), removed)

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_paragraphs_removed"])
        for r in dedup_paragraphs(df, min_count=min_count).collect()
    }
    assert got == expect

    again = dedup_paragraphs(
        dedup_paragraphs(df, min_count=min_count).select("doc_id", "text"),
        min_count=min_count,
    )
    assert all(r["n_paragraphs_removed"] == 0 for r in again.collect())


@given(
    counts=st.lists(st.integers(0, 9), min_size=1, max_size=30),
    seq_len=st.integers(1, 7),
    seed=st.integers(0, 3),
)
@SETTINGS
def test_pack_shuffled_sequences_property_matches_python(
    spark, counts, seq_len, seed
):
    """Round-10 property: for arbitrary token counts (zeros included),
    seq_len and seed, the shuffled pack equals the pure-python
    md5-order concat-and-cut — positions total, token mass conserved,
    placement exact."""
    import hashlib

    from scikit_learn_imputer_spark.operators.shuffle import (
        pack_shuffled_sequences,
    )

    rows = [(i, f"s{i % 2}", n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n bigint")
    got = {
        r["doc_id"]: (r["position"], r["seq_id"], r["seq_offset"],
                      r["straddles"])
        for r in pack_shuffled_sequences(
            df, seq_len=seq_len, seed=seed, token_count_col="n"
        ).collect()
    }
    order = sorted(
        rows,
        key=lambda r: (hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(), r[0]),
    )
    cum = 0
    want = {}
    for pos, (did, _, n) in enumerate(order, start=1):
        want[did] = (
            pos,
            cum // seq_len,
            cum % seq_len,
            (cum % seq_len + n) > seq_len,
        )
        cum += n
    assert got == want
    assert sorted(p for p, *_ in got.values()) == list(range(1, len(counts) + 1))
