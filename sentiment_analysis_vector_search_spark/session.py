"""SparkSession factory tuned for both local testing and cluster scale.

Local tests run on ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
builder settings (AQE, skew-join handling, Arrow batches) are what you want
at 100 TB — only master/executor sizing comes from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sentiment_analysis_vector_search_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
    - Arrow on: vectorized pandas interchange for the few Pandas-UDF paths.
    - shuffle partitions default to cores locally; on a cluster, set
      ``spark.sql.shuffle.partitions`` to ~2-3x total cores via submit conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session timezone: epoch arithmetic (unix_micros, window
        # bounds) and timestamp_ntz→timestamp casts must not depend on the
        # host OS zone — the DuckDB parity oracle treats parquet timestamps
        # as UTC wall-clock, and DST-ambiguous local times corrupt silently.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); read as long and convert
        # in catalog.table (Spark has no native nanos timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Single-JVM local mode: driver == executors, so "driver" memory is
        # the WHOLE engine heap. 24g leaves the 10-100x scale smoke
        # (bench_scale: ~50M-row checkpointed shingle relations + join
        # execution memory) comfortable on the 128 GiB box; 8g OOM'd it.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
