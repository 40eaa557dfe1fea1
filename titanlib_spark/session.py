"""SparkSession factory with scale-appropriate defaults.

Local mode is for tests/bench only; every config here is also correct on a
real multi-executor cluster (AQE, skew-join handling, Arrow batching).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spread_small_input(df, min_parts: int | None = None):
    """Round-robin repartition a degenerately-partitioned input up to the
    session's default parallelism.

    A small table (one parquet file, a fresh createDataFrame) scans as 1-2
    partitions, so every downstream per-row expression runs on one core
    no matter how many the session has. At real scale the scan already
    yields >= cores partitions and this is a no-op — the repartition only
    fires (and is then trivially cheap) on inputs small enough to fit in a
    couple of scan splits."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app_name: str = "titanlib_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults: AQE on (runtime coalesce + skew-join split), Arrow on
    (all pandas-UDF stages are Arrow-batched), UTC session timezone
    (oracle comparability), shuffle partitions sized to the core count
    rather than the 200 default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]")
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # single-JVM local mode: the "driver" heap is the whole executor
        # pool; an undersized heap turns high-parallelism runs into GC
        # storms (measured: local[32] 3x SLOWER than local[8] at 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
