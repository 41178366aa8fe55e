"""Streaming file sink: exactly-once semantics under re-drain."""

from pyspark.sql import functions as F

from sentiment_analysis_vector_search_spark.streaming.file_sink import (
    read_file_sink,
    stream_ingest_documents,
)


def test_stream_ingest_exactly_once(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ingested")
    ckpt = str(tmp_path / "ckpt")

    stream_ingest_documents(spark, sf_dir, out, ckpt)
    got = read_file_sink(spark, out)

    # gated content matches the batch quality gate
    from sentiment_analysis_vector_search_spark.operators.pipeline_ops import (
        gate_columns,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = docs.select("doc_id", gate_columns()["keep"].alias("keep")).where(
        F.col("keep")
    )
    n_want = want.count()
    assert got.count() == n_want
    assert got.select("doc_id").distinct().count() == n_want

    # partitioned by lang (hive layout, prunable)
    import os

    assert any(d.startswith("lang=") for d in os.listdir(out))

    # EXACTLY-ONCE: a second drain over the same (fully consumed) source
    # with the same checkpoint must append NOTHING — the offset log knows
    # the source is exhausted.
    stream_ingest_documents(spark, sf_dir, out, ckpt)
    again = read_file_sink(spark, out)
    assert again.count() == n_want
    assert again.select("doc_id").distinct().count() == n_want
