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
        # PySpark 4's DataFrame debugging wraps EVERY DataFrame/Column API
        # call with call-site capture: getActiveSession + conf.get +
        # PySparkCurrentOrigin.set/clear — 3-4 extra py4j round trips per
        # call (~0.17 ms each here). Expression-heavy constructors pay
        # hundreds of wrapped calls PER EXECUTION (each bench rep and each
        # production job submission rebuilds the DataFrame): measured
        # interleaved at sf0.1, dedup_simhash construction 1.65 s -> 0.74 s,
        # dedup_keep_canonical 2.29 -> 1.89, dedup_minhash_lsh 1.56 -> 1.30
        # with it off. Cost of disabling: error messages lose the enriched
        # Python call-site context (DataFrame ops still raise the same
        # typed errors) — the right trade for a production engine. Env-
        # overridable (r13 advice): SPARK_GRAFT_DF_DEBUG=true re-enables
        # call-site capture for a debugging session without editing code.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
