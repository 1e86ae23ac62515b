"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the configs below are the ones that matter
on a real multi-executor cluster too (AQE, skew-join handling, partition
coalescing, Arrow for the few pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scikit-learn-imputer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback local[4]).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you would leave it to AQE's coalescing instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamps across engines (DuckDB oracle runs in UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas-UDF / toPandas paths (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Quiet the UI for test runs; harmless on a cluster.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        # local[n] runs executors inside the driver JVM; the env knob
        # raises its heap for memory-hungry ad-hoc work (e.g. unguarded
        # quadratic pair joins at high SF, which hit GCLocker stalls at
        # 1g). The DEFAULT stays at Spark's 1g: a full-suite A/B on this
        # box measured 154s (1g) vs 201s (24g) — the big heap lets G1
        # accumulate garbage across 32 threads and the collections
        # thrash cache, a pure loss for the small-working-set bench. On
        # a real cluster per-executor memory is sized to the partition
        # working set instead. Only takes effect at JVM launch.
        # Exception: bench.py sets 4g — the 2026-08-14 testdata
        # regeneration made the exact gram-join baselines stream ~2.2B
        # intermediate rows at sf0.1, whose 32-way partial-agg spills
        # OOM a 1g heap (tests at sf0.001/0.01 stay comfortably in 1g).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
