"""Streaming file sink: checkpointed, exactly-once parquet ingest.

The stream_ops drains target a memory sink because their contract is
"final state ≡ batch oracle"; a production ingest instead appends to a
partitioned parquet table with a CHECKPOINT so restarts neither lose nor
duplicate data. Structured Streaming's file sink gives exactly-once by
pairing the source's offset log with the sink's file-commit log
(_spark_metadata): a micro-batch is either fully committed to both or
replayed idempotently.

``stream_ingest_documents`` is the reference pipeline's ingest stage
(download → cache dir → process) re-expressed as continuous ingestion:
documents arrive on a stream, pass the same quality-gate Columns the
batch and streaming gates use, and land partitioned by language. Run it
with ``availableNow`` for a bounded catch-up drain (the testing/backfill
trigger) or a processing-time trigger for continuous tailing — the
checkpoint makes repeated invocations resume, which the pytest pins by
draining twice and asserting zero duplicate rows.

At 100 TB scale notes: the sink commits per micro-batch, so file count =
batches × partitions — pair with sinks.compact_dir on a schedule; the
checkpoint dir lives on durable shared storage; partitionBy(lang) keeps
reads prunable. Readers must go through ``read_file_sink`` (or any
_spark_metadata-aware reader) so half-written files from a crashed batch
are invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stream_ops import _DOC_SCHEMA, _stream_shuffle


def stream_ingest_documents(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the documents stream into a lang-partitioned parquet table
    with exactly-once checkpointing (availableNow trigger)."""
    from ..operators.pipeline_ops import gate_columns

    src = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    gated = src.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        gate_columns()["keep"].alias("keep"),
    ).where(F.col("keep"))
    with _stream_shuffle(spark):
        q = (
            gated.drop("keep")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .partitionBy("lang")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def read_file_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a streaming file-sink table through its _spark_metadata commit
    log (the default for spark.read.parquet on such a dir), so only files
    from fully committed micro-batches are visible."""
    return spark.read.parquet(out_dir)
