"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; on a real cluster the same configs apply
(AQE, shuffle partitions sized by cluster, Arrow for the pandas-UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opengemini-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale notes: ``spark.sql.adaptive.enabled`` gives runtime shuffle-partition
    coalescing and skew-join splitting — essential at 100 TB where static
    partition counts are always wrong. ``nanosAsLong`` preserves the
    openGemini int64-nanosecond time model losslessly (Spark timestamps are
    µs); the catalog derives a µs ``ts`` column for window ops and keeps the
    ns long as the source of truth (SURVEY.md §1.2).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # read parquet TIMESTAMP(NANOS) as int64 ns (openGemini time model)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
