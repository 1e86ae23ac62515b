"""Partitioned sink layout/pruning, stratified-sample exactness, and
approx-percentile tolerance."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from scikit_learn_imputer_spark.plans.queries import QUERIES
from scikit_learn_imputer_spark.sources.tables import load_table, write_partitioned


def test_write_partitioned_layout_and_pruning(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    out = os.path.join(tempfile.mkdtemp(), "ev_part")
    try:
        write_partitioned(ev, out, ["event_type"])
        subdirs = sorted(
            d for d in os.listdir(out) if d.startswith("event_type=")
        )
        types = sorted(
            r[0] for r in ev.select("event_type").distinct().collect()
        )
        assert subdirs == [f"event_type={t}" for t in types]

        back = spark.read.parquet(out)
        assert back.count() == ev.count()
        # The partition predicate must prune directories at planning time,
        # not filter rows after a full scan.
        plan = (
            back.filter(F.col("event_type") == types[0])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [isnotnull(event_type" in plan
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_upsert_partitions_touches_only_updated(spark, sf_smoke):
    """Dynamic partition overwrite: partitions present in the update are
    replaced; every other partition's FILES are byte-identical (same
    inodes — untouched, not rewritten)."""
    from scikit_learn_imputer_spark.sources.tables import upsert_partitions

    ev = load_table(spark, sf_smoke, "events")
    out = os.path.join(tempfile.mkdtemp(), "ev_upsert")
    try:
        write_partitioned(ev, out, ["event_type"])
        types = sorted(
            r[0] for r in ev.select("event_type").distinct().collect()
        )
        touched, untouched = types[0], types[1]

        def files(t):
            d = os.path.join(out, f"event_type={t}")
            return sorted(
                (f, os.stat(os.path.join(d, f)).st_mtime_ns)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        before_untouched = files(untouched)

        updates = (
            ev.filter(F.col("event_type") == touched)
            .limit(10)
            .withColumn("value", F.lit(-1.0))
        )
        upsert_partitions(updates, out, ["event_type"])

        back = spark.read.parquet(out)
        got_touched = back.filter(F.col("event_type") == touched)
        assert got_touched.count() == 10
        assert got_touched.filter(F.col("value") != -1.0).count() == 0
        # untouched partition: same rows AND same physical files
        assert (
            back.filter(F.col("event_type") == untouched).count()
            == ev.filter(F.col("event_type") == untouched).count()
        )
        assert files(untouched) == before_untouched
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_stratified_sample_exact_fraction(spark, sf_smoke):
    c = load_table(spark, sf_smoke, "customer")
    totals = {
        r["c_mktsegment"]: r["n"]
        for r in c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    sampled = QUERIES["stratified_sample"](spark, sf_smoke)
    got = {
        r["c_mktsegment"]: r["n"]
        for r in sampled.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    assert got == {k: math.ceil(0.1 * n) for k, n in totals.items()}


def test_approx_percentile_within_tolerance(spark, sf_smoke):
    """approx_percentile (the 100TB path — mergeable sketch, one pass) must
    land within its accuracy contract of the exact percentile."""
    li = load_table(spark, sf_smoke, "lineitem")
    acc = 100  # relative error <= 1/acc
    row = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("approx"),
        F.count("*").alias("n"),
    ).collect()[0]
    # rank error <= n/acc -> compare by rank, conservatively via value band
    band = li.filter(
        (F.col("l_extendedprice") >= F.least(F.lit(row["approx"]), F.lit(row["exact"])))
        & (F.col("l_extendedprice") <= F.greatest(F.lit(row["approx"]), F.lit(row["exact"])))
    ).count()
    assert band <= row["n"] / acc + 1


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_smoke):
    from scikit_learn_imputer_spark.sources.tables import compact_parquet

    ev = load_table(spark, sf_smoke, "events")
    out = os.path.join(tempfile.mkdtemp(), "ev_small_files")
    try:
        ev.repartition(16).write.parquet(out)  # simulate a fragmented ingest
        n_rows = ev.count()
        before = compact_parquet(spark, out, target_files=2)
        assert before >= 16
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) <= 2
        assert spark.read.parquet(out).count() == n_rows
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_jsonl_roundtrip(spark, sf_smoke):
    from scikit_learn_imputer_spark.sources.tables import read_jsonl, write_jsonl

    docs = load_table(spark, sf_smoke, "documents")
    out = os.path.join(tempfile.mkdtemp(), "docs_jsonl")
    try:
        write_jsonl(docs, out)
        back = read_jsonl(spark, out, schema=docs.schema)
        assert back.count() == docs.count()
        assert back.schema == docs.schema
        a = {r["doc_id"]: r["text"] for r in docs.collect()}
        b = {r["doc_id"]: r["text"] for r in back.collect()}
        assert a == b
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_sorted_layout_prunes_files(spark, sf_smoke, tmp_path):
    """The range-sorted layout really skips: per-file parquet footer
    min/max ranges are non-overlapping, and only a small subset of files
    intersects a narrow predicate range."""
    import os

    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.sources.layout import read_layout, write_sorted
    from scikit_learn_imputer_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    path = str(tmp_path / "sorted_li")
    write_sorted(li, path, "l_shipdate", num_files=8)

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) > 4  # the layout actually split
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    # non-overlapping per-file ranges (range partitioning): sort by min,
    # each file's max <= next file's min
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # a one-month window intersects only a few files
    import datetime as dt

    def _d(x):
        return x.date() if isinstance(x, dt.datetime) else x

    lo, hi = dt.date(1995, 6, 1), dt.date(1995, 7, 1)
    touched = sum(1 for (mn, mx) in ranges if _d(mx) >= lo and _d(mn) < hi)
    assert touched <= max(1, len(files) // 3)

    # and the predicate is pushed to the scan
    back = read_layout(spark, path).filter("l_shipdate >= '1995-06-01'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_zorder_layout_skips_on_both_dimensions(spark, sf_smoke, tmp_path):
    """Z-order vs 1-D sort, measured from parquet footers: the Morton
    layout must give file-level skipping on BOTH z-ordered columns,
    where the 1-D sort gives skipping only on its sort column (the
    secondary column touches every file)."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from scikit_learn_imputer_spark.sources.layout import (
        write_sorted,
        write_zorder,
    )
    from scikit_learn_imputer_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    zpath, spath = str(tmp_path / "z_li"), str(tmp_path / "s_li")
    write_zorder(li, zpath, ["l_shipdate", "l_partkey"], bits=12, num_files=16)
    write_sorted(li, spath, "l_shipdate", num_files=16)

    def file_ranges(path, col):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    def _d(x):
        return x.date() if isinstance(x, dt.datetime) else x

    lo, hi = dt.date(1995, 6, 1), dt.date(1995, 9, 1)

    def touched_date(path):
        rs = file_ranges(path, "l_shipdate")
        return len(rs), sum(1 for mn, mx in rs if _d(mx) >= lo and _d(mn) < hi)

    def touched_pk(path):
        rs = file_ranges(path, "l_partkey")
        return sum(1 for mn, mx in rs if mx >= 10 and mn <= 30)

    nz, z_date = touched_date(zpath)
    ns, s_date = touched_date(spath)
    assert nz >= 8 and ns >= 8  # the layouts actually split
    # z-order: both dimensions skip more than half the files
    assert z_date <= nz // 2, f"zorder date skipping: {z_date}/{nz}"
    assert touched_pk(zpath) <= nz // 2, "zorder partkey skipping"
    # 1-D sort: its own column skips, the other column touches everything
    assert s_date <= ns // 2
    assert touched_pk(spath) == ns, "1-D sort should NOT skip on partkey"
    # layout preserves content
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_validates_params(spark, sf_smoke):
    import pytest

    from scikit_learn_imputer_spark.sources.layout import write_zorder
    from scikit_learn_imputer_spark.sources.tables import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    with pytest.raises(ValueError):
        write_zorder(li, "/tmp/never", [], bits=12)
    with pytest.raises(ValueError):
        write_zorder(li, "/tmp/never", ["l_partkey", "l_suppkey"], bits=32)
