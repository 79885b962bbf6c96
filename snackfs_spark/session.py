"""SparkSession factory tuned for the target execution profile.

Local testing runs on local[N] (one JVM); the configuration is chosen so
the same plans scale to a multi-executor cluster at ~100 TB:
  - AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
  - shuffle partitions sized to cores locally (cluster: set to 2-3x cores)
  - Arrow enabled so any Pandas-UDF path is batch-vectorized
  - UTC session timezone so timestamp semantics match the DuckDB oracle
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "snackfs_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Pinned EXPLICITLY (r8 ADVICE): the exact-rational operators
        # (two-proportion, Mann-Whitney, KS, KMV, power grid) rely on
        # decimal(38,0) overflow failing LOUDLY. Under ANSI mode Spark
        # raises ARITHMETIC_OVERFLOW / NUMERIC_VALUE_OUT_OF_RANGE at the
        # offending expression — that raise IS the primary guard. The
        # in-plan isNull->assert_true traps next to those expressions are
        # the backstop for deployments that run with ANSI disabled
        # (where overflow silently yields NULL). Do not flip this to
        # false without auditing DESIGN.md rule 7.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", "/root/repo/var/warehouse")
        # custom Python data source (snackstore) declares pushFilters
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
