"""SparkSession factory with the engine's scale-oriented defaults.

Centralised so every entry point (tests, bench, driver contract,
spark-submit jobs) runs with the same plan-shaping configuration:
AQE on (runtime re-plan + skew-join splitting), Arrow enabled for the
vectorized-UDF hot path, and a shuffle-partition count sized to the
local core budget (on a real cluster this is set per-job instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "dtaidistance-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalescing collapses the parallelism of the grouped-rollup
        # shuffle feeding the Arrow/Python stage (measured 3-4x slower
        # at local[32]): AQE sizes partitions by JVM shuffle bytes, but
        # the Python stage's cost per byte is far higher, so merged
        # partitions serialize the UDF work. Keep AQE (skew-join,
        # runtime re-plan) but pin post-shuffle partition count.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
