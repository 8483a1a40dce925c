"""SparkSession factory.

One place for every engine-level knob so tests, bench, the driver entry
point, and production all run the same configuration.  The reference runs
embedded DuckDB per Airflow task (python_scripts.py:106) — single node,
in-memory, no spill story.  Here the equivalent decisions are Spark confs:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for
any pandas interop, UTC session timezone so timestamp semantics match the
DuckDB oracle bit-for-bit, and shuffle partitions sized to the local core
count (re-size to ~2-3× total cores on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "chess-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Designed for 100 TB scale: every setting here is either scale-neutral
    or a local stand-in for a cluster conf (driver.memory only matters in
    local mode; on a cluster the same code runs under spark-submit confs).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # match local parallelism; on a real cluster: 2-3x total cores
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # deterministic timestamp semantics (match DuckDB oracle / UTC lake)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas interop (the only sanctioned
        # python<->jvm data path; never row-at-a-time)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # dims here are tiny (≤ a few thousand rows); raise the auto
        # broadcast bar so every dim join is a broadcast hash join
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
