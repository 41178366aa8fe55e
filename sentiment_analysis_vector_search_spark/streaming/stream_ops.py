"""Structured Streaming operators.

``stream_windowed_counts`` runs the events table through a real
readStream → withWatermark → tumbling-window aggregate → memory sink
pipeline (trigger=availableNow), then returns the materialized result.
Because availableNow drains the full input, the final state must equal the
batch plan — which is exactly what the DuckDB oracle checks (date_trunc
hour ≡ 1-hour tumbling window). This is the streaming/batch-consistency
guarantee Structured Streaming is built on.

At cluster scale the same pipeline points at a file/Kafka source with a
real trigger; the watermark bounds state for late data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.stable import sql_dsum
from ..registry import register

_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_STREAM_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {sql_dsum('value', 'total_value')}
FROM events
GROUP BY 1, 2
"""


@register("stream_windowed_counts", oracle=_STREAM_ORACLE)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        spark.readStream.schema(_EVENT_SCHEMA)
        # FileStreamSource needs a directory basePath; select the single
        # events file from the sf dir via glob filter.
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        src.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


# ---------------------------------------------------------------------------
# stream_sessionize — native session windows (30-min gap) over the event
# stream. session_window merges events whose gap is strictly < 30 min, so
# the batch oracle marks a new session at gap >= 30 min; with availableNow
# draining the whole input the final state equals the batch computation.
# At scale: state is per (user_id, open-session) and the watermark evicts
# closed sessions — bounded memory under unbounded input.
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSIONIZE_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= {_SESSION_GAP_MIN * 60} * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


@register("stream_sessionize", oracle=_SESSIONIZE_ORACLE)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        src.withWatermark("ts", "30 minutes")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
