"""Unit tests for statistical aggregates and text functions."""

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scikit_learn_imputer_spark.functions.stats import avg_rank, entropy_by_column
from scikit_learn_imputer_spark.functions.text import (
    fingerprint_col,
    lang_id_col,
    rolling_hash_expr,
    token_count_col,
)


def test_entropy_matches_scipy_formula(spark):
    """scipy.stats.entropy(counts) = -Σ p·ln p over the value distribution
    (reference scikit_learn_imputer.py:28,574)."""
    schema = StructType(
        [StructField("id", LongType(), False), StructField("c", StringType(), True)]
    )
    data = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    df = spark.createDataFrame(list(enumerate(data)), schema)
    out = {r["variable"]: r["entropy"] for r in entropy_by_column(df, ["c"]).collect()}
    counts = [5, 3, 2]
    total = sum(counts)
    expected = -sum((n / total) * math.log(n / total) for n in counts)
    assert abs(out["c"] - expected) < 1e-12


def test_avg_rank_matches_pandas_rank(spark):
    """pandas Series.rank(): ties get the MEAN of their positions
    (reference :533-541 ranks model metrics this way)."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    schema = StructType(
        [StructField("id", LongType(), False), StructField("v", DoubleType(), True)]
    )
    df = spark.createDataFrame(list(enumerate(vals)), schema)
    for ascending in (True, False):
        out = avg_rank(df, "v", ascending=ascending)
        got = {r["id"]: r["v_rank"] for r in out.collect()}
        expected = pd.Series(vals).rank(ascending=ascending)
        for i, e in expected.items():
            assert got[i] == e, f"ascending={ascending} id={i}: {got[i]} != {e}"


def test_avg_rank_nulls_unranked(spark):
    schema = StructType(
        [StructField("id", LongType(), False), StructField("v", DoubleType(), True)]
    )
    df = spark.createDataFrame([(0, 2.0), (1, None), (2, 1.0)], schema)
    got = {r["id"]: r["v_rank"] for r in avg_rank(df, "v").collect()}
    assert got == {0: 2.0, 1: None, 2: 1.0}


def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "hello  world foo"), (1, "  "), (2, "one")], ["id", "text"]
    )
    out = df.select(
        "id",
        token_count_col(F.col("text")).alias("n"),
        fingerprint_col(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[0]["n"] == 3  # multi-space collapses
    assert by_id[1]["n"] == 0
    assert by_id[2]["n"] == 1
    import hashlib

    assert by_id[0]["fp"] == hashlib.md5(b"hello world foo").hexdigest()


def test_rolling_hash_matches_python(spark):
    text = "spark graft"
    df = spark.createDataFrame([(0, text)], ["id", "text"])
    got = df.select(rolling_hash_expr("text").alias("h")).collect()[0]["h"]
    acc = 0
    for ch in text:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    assert got == acc


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat of the house is a cat"),
            (1, "der hund und die katze ist da"),
            (2, "le chat et la maison est les"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang"] for r in df.select(
        "id", lang_id_col(F.col("text")).alias("lang")
    ).collect()}
    assert got == {0: "en", 1: "de", 2: "fr"}


def test_dup_trigram_ratio_constructed(spark):
    from scikit_learn_imputer_spark.functions.text import (
        dup_trigram_ratio_col,
        word_trigrams_col,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c a b c a b c"),      # 7 trigrams, 3 distinct
            (1, "one two three four"),     # 2 trigrams, all distinct
            (2, "too short"),              # < 3 words -> 0 trigrams
        ],
        ["id", "text"],
    )
    rows = {
        r["id"]: (r["n"], round(r["ratio"], 6))
        for r in df.select(
            "id",
            F.size(word_trigrams_col(F.col("text"))).alias("n"),
            dup_trigram_ratio_col(F.col("text")).alias("ratio"),
        ).collect()
    }
    assert rows[0] == (7, round(1 - 3 / 7, 6))
    assert rows[1] == (2, 0.0)
    assert rows[2] == (0, 0.0)


def test_quality_score_degenerate_docs_match_sql_twin(spark):
    """quality_score_col must agree with its DuckDB oracle twin
    (_QSCORE_SQL) on the degenerate shapes ADVICE r4 flagged: empty,
    whitespace-only, and multi-space documents — no nulls, no inf."""
    import duckdb

    from scikit_learn_imputer_spark.functions.text import quality_score_col
    from scikit_learn_imputer_spark.plans.queries import _QSCORE_SQL

    texts = [
        (0, ""),
        (1, "   "),
        (2, "a  b   the"),
        (3, "the cat of the house is a cat"),
        (4, "!!! ??? ..."),
        (5, "word"),
    ]
    df = spark.createDataFrame(texts, ["id", "text"])
    got = {
        r["id"]: r["q"]
        for r in df.select(
            "id", F.round(quality_score_col(F.col("text")), 9).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    want = dict(
        con.execute(
            f"SELECT id, round({_QSCORE_SQL}, 9) FROM documents"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert got[k] is not None, f"id {k}: Spark q_score is null"
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_pii_scrub_patterns(spark):
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.pii import scrub_pii

    rows = [
        (1, "mail me at jane.doe+x@sub.example.co.uk today"),
        (2, "server at 192.168.0.1 and 10.0.0.255 up"),
        (3, "call 555-123-4567 or card 4111 1111 1111 1111"),
        (4, "no pii here, just 42 and 3.14 and v1.2.3"),
        (5, "a@b.io then 1.2.3.4 then 123456789"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}

    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["clean_text"]
    assert "jane" not in got[1]["clean_text"]
    assert got[2]["n_ip"] == 2 and got[2]["clean_text"].count("<IP>") == 2
    assert got[3]["n_longnum"] == 2  # phone + card both redact
    assert "<NUM>" in got[3]["clean_text"]
    # short quantities / versions / floats must NOT redact
    assert got[4]["n_email"] == got[4]["n_ip"] == got[4]["n_longnum"] == 0
    assert got[4]["clean_text"] == rows[3][1]
    assert (got[5]["n_email"], got[5]["n_ip"], got[5]["n_longnum"]) == (1, 1, 1)


def test_bigram_lm_scores_rank_garbage_below_prose(spark):
    """Documents drawn from the corpus distribution must outscore
    character noise; degenerate short docs are excluded (no bigrams)."""
    from scikit_learn_imputer_spark.functions.lm import bigram_lm_scores

    prose = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "a quick brown dog jumps over the lazy fox today",
        "the brown fox and the lazy dog run over the hill",
    ]
    rows = [(i, t) for i, t in enumerate(prose)]
    rows.append((90, "zqxj wvkp qzzx jvvw xkqz pjwv"))  # off-distribution noise
    rows.append((91, "x"))  # 1 char -> no bigrams -> no row
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["lm_score"] for r in bigram_lm_scores(df).collect()}

    assert 91 not in got
    assert all(i in got for i in range(4)) and 90 in got
    worst_prose = min(got[i] for i in range(4))
    assert got[90] < worst_prose  # noise scores strictly lower


def test_bpe_greedy_longest_prefix_semantics(spark):
    """Pinned-vocab greedy segmentation: longest prefix wins, unknown
    chars count 1 each, empty/null texts count 0."""
    from scikit_learn_imputer_spark.functions.bpe import (
        DEFAULT_BPE_VOCAB,
        bpe_token_counts,
        count_word_tokens,
    )

    vs = frozenset(DEFAULT_BPE_VOCAB)
    lens = tuple(sorted({len(v) for v in DEFAULT_BPE_VOCAB}, reverse=True))
    # customer = cus|tom|er; batch = b|a|t|c|h; query = que|ry
    assert count_word_tokens("customer", vs, lens) == 3
    assert count_word_tokens("batch", vs, lens) == 5
    assert count_word_tokens("query", vs, lens) == 2
    assert count_word_tokens("fast", vs, lens) == 2

    df = spark.createDataFrame(
        [(0, "customer query"), (1, ""), (2, None), (3, "  fast  fast ")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(df).collect()}
    assert got == {0: 5, 1: 0, 2: 0, 3: 4}


def test_bpe_vocab_validation():
    import pytest

    from scikit_learn_imputer_spark.functions.bpe import validate_vocab, vocab_values_sql

    with pytest.raises(ValueError):
        validate_vocab(())
    with pytest.raises(ValueError):
        validate_vocab(("a b",))
    with pytest.raises(ValueError):
        validate_vocab(("it's",))
    assert vocab_values_sql(("ab", "c")) == "('ab'), ('c')"


def test_repetition_signals_known_values(spark):
    """Hand-computed Gopher repetition fractions: overlapping top-gram
    occurrences, union coverage for duplicated grams."""
    from scikit_learn_imputer_spark.functions.repetition import repetition_signals

    rows = [
        # 'a a a a': top-2gram 'a a' occurs 3x (overlapping) -> 3*2/4 = 1.5
        (0, "a a a a"),
        # 10 tokens; 'x y z p q' repeated at starts 0 and 5 -> dup5 covers all 10
        (1, "x y z p q x y z p q"),
        # no repeats at all
        (2, "u v w r s t m n o k"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in repetition_signals(df, top_ns=(2,), dup_ns=(5,)).collect()
    }
    assert got[0]["top2_frac"] == 1.5
    assert got[0]["n_tokens"] == 4
    assert got[1]["dup5_frac"] == 1.0
    # top-2gram of doc1: 'x y' (and others) occur 2x -> 2*2/10 = 0.4
    assert got[1]["top2_frac"] == 0.4
    assert got[2]["dup5_frac"] == 0.0
    # every 2-gram of doc2 occurs once -> 2/10
    assert got[2]["top2_frac"] == 0.2
    # doc shorter than n scores 0
    one = spark.createDataFrame([(9, "solo")], ["doc_id", "text"])
    r = repetition_signals(one, top_ns=(2,), dup_ns=(5,)).collect()[0]
    assert r["top2_frac"] == 0.0 and r["dup5_frac"] == 0.0 and r["n_tokens"] == 1

    import pytest

    with pytest.raises(ValueError):
        repetition_signals(df, top_ns=(0,))


def test_exact_rank_quantiles_fast_path_bit_identical_to_banded(spark):
    """VERDICT r13 #1: the declared-domain single-aggregate fast path
    must select the SAME element as the banded two-pass for every
    fraction — global and grouped, with ties, negatives, and NULLs —
    and both must equal the Python reference
    ``sorted(vals)[((n-1)*num)//den]``."""
    import random

    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    rng = random.Random(1234)
    rows = []
    for i in range(4000):
        g = i % 5
        v = (
            None
            if rng.random() < 0.05
            else round(rng.uniform(-50, 50), 2)  # 2dp -> heavy ties
        )
        rows.append((g, v))
    df = spark.createDataFrame(rows, "g int, v double")
    fracs = [(1, 20), (1, 4), (1, 2), (3, 4), (19, 20), (9, 10)]
    names = ["p05", "p25", "p50", "p75", "p95", "p90"]

    def py_ref(vals, num, den):
        s = sorted(x for x in vals if x is not None)
        return s[((len(s) - 1) * num) // den]

    # Global.
    fast = exact_rank_quantiles(
        df, "v", fracs, names, band_width=10.0, domain_bound=100_000
    ).collect()[0]
    banded = exact_rank_quantiles(
        df, "v", fracs, names, band_width=10.0
    ).collect()[0]
    allv = [v for _, v in rows]
    for (num, den), name in zip(fracs, names):
        want = py_ref(allv, num, den)
        assert fast[name] == banded[name] == want, (name, fast[name], banded[name], want)

    # Grouped.
    fastg = {
        r["g"]: r
        for r in exact_rank_quantiles(
            df, "v", fracs, names, band_width=10.0, group_cols=("g",),
            domain_bound=100_000,
        ).collect()
    }
    bandedg = {
        r["g"]: r
        for r in exact_rank_quantiles(
            df, "v", fracs, names, band_width=10.0, group_cols=("g",)
        ).collect()
    }
    for g in range(5):
        gv = [v for gg, v in rows if gg == g]
        for (num, den), name in zip(fracs, names):
            want = py_ref(gv, num, den)
            assert fastg[g][name] == bandedg[g][name] == want


def test_exact_rank_quantiles_domain_guard_raises_loudly(spark):
    """The declared bound is ENFORCED: exceeding it must fail the job
    with the documented message, never silently buffer more."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.functions.stats import (
        exact_rank_quantiles,
    )

    df = spark.range(100).select(
        (F.col("id").cast("double") / 7.0).alias("v")
    )
    q = exact_rank_quantiles(
        df, "v", [(1, 2)], ["med"], band_width=1.0, domain_bound=10
    )
    with pytest.raises(Exception, match="domain_bound=10"):
        q.collect()
