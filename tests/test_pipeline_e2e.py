"""End-to-end composition: the operators are designed to chain into a
training-data pipeline. One pass: streaming ingest (exactly-once, gated)
→ canonical near-dup removal → sequence packing → sharded writer — each
stage consuming the previous stage's real output."""

import glob
import os

from pyspark.sql import functions as F


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.operators.curation2 import (
        pack_sequences,
    )
    from sentiment_analysis_vector_search_spark.operators.dedup import (
        dedup_keep_canonical,
    )
    from sentiment_analysis_vector_search_spark.sinks import (
        read_back,
        write_training_shards,
    )
    from sentiment_analysis_vector_search_spark.streaming.file_sink import (
        read_file_sink,
        stream_ingest_documents,
    )

    # 1. streaming ingest with quality gating (exactly-once checkpoint)
    ingested_dir = str(tmp_path / "ingested")
    stream_ingest_documents(
        spark, sf_dir, ingested_dir, str(tmp_path / "ckpt")
    )
    ingested = read_file_sink(spark, ingested_dir)
    n_ingested = ingested.count()
    assert n_ingested > 0

    # 2. near-dup removal: drop every non-canonical member of a minhash
    # component (keep_canonical is computed on the RAW corpus dir; the
    # anti-join applies it to the gated stream output)
    dupes = dedup_keep_canonical(spark, sf_dir).where(F.col("is_duplicate"))
    deduped = ingested.join(dupes.select("doc_id"), "doc_id", "left_anti")
    n_deduped = deduped.count()
    assert n_deduped <= n_ingested

    # 3. pack into training sequences from the deduped corpus: write the
    # stage output as the documents table of a new data dir
    stage_dir = str(tmp_path / "stage")
    os.makedirs(stage_dir)
    deduped.coalesce(1).write.parquet(str(tmp_path / "stage_tmp"))
    part = glob.glob(str(tmp_path / "stage_tmp" / "part-*.parquet"))[0]
    os.replace(part, os.path.join(stage_dir, "documents.parquet"))
    packed = pack_sequences(spark, stage_dir)
    total_docs = packed.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == n_deduped

    # 4. shard the packed corpus for the trainer
    shards_dir = str(tmp_path / "shards")
    write_training_shards(deduped, shards_dir, n_shards=4, key="doc_id")
    back = read_back(spark, shards_dir)
    assert back.count() == n_deduped
    assert len(glob.glob(f"{shards_dir}/part-*.parquet")) == 4


def test_rag_factory_end_to_end(spark, sf_dir, tmp_path):
    """The retrieval-side factory: split → chunk the train split →
    snapshot-commit the chunk table → retrieve against the committed
    snapshot — each stage consuming the previous stage's real output."""
    from sentiment_analysis_vector_search_spark.operators.rag_prep import (
        _chunks,
        split_train_holdout,
    )
    from sentiment_analysis_vector_search_spark.sinks import (
        commit_snapshot,
        read_snapshot,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. deterministic split; only the train split feeds the index
    splits = split_train_holdout(spark, sf_dir)
    train_ids = splits.where(F.col("split") == "train").select("doc_id")
    train_docs = docs.join(train_ids, "doc_id", "left_semi")
    n_train = train_docs.count()
    assert 0 < n_train < docs.count()

    # 2. chunk the train corpus; provenance must cover every train doc
    chunks = _chunks(train_docs)
    assert chunks.select("doc_id").distinct().count() == n_train

    # 3. snapshot-commit the chunk table (v1), then append a fake later
    # batch (v2) — v1 stays byte-stable for reproducible training runs
    root = str(tmp_path / "chunk_table")
    v1 = commit_snapshot(chunks, root)
    n_v1 = read_snapshot(spark, root, v1).count()
    assert n_v1 == chunks.count()
    extra = _chunks(
        docs.join(train_ids, "doc_id", "left_anti").limit(5)
    )
    v2 = commit_snapshot(extra, root, mode="append")
    assert read_snapshot(spark, root, v2).count() == n_v1 + extra.count()
    assert read_snapshot(spark, root, v1).count() == n_v1  # time travel

    # 4. the committed snapshot is a queryable retrieval base: top-k by
    # chunk length as a stand-in scorer (full cosine path is covered by
    # rag_chunk_retrieve's oracle)
    top = (
        read_snapshot(spark, root, v2)
        .orderBy(F.col("chunk_len").desc(), "doc_id", "chunk_id")
        .limit(10)
        .collect()
    )
    assert len(top) == 10
