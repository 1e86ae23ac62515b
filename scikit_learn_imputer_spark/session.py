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
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
