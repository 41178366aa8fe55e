"""Composed IVF-PQ serving index: full-probe byte-identity to the flat
PQ index (the IVF layer prunes nothing when every cell is probed),
recall floor at the default probe, add ≡ rebuild against frozen
codebooks, and static cell pruning in the physical plan."""

from __future__ import annotations

import os
import re
import shutil

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_vector_search_spark.operators.ivfpq import (
    ann_ivfpq_index_query,
    build_ivfpq_index,
    ivfpq_index_add,
)
from sentiment_analysis_vector_search_spark.operators.similarity import (
    _N_QUERIES,
    _vectors,
)


def _queries(spark, sf_dir):
    return _vectors(spark, sf_dir).where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )


def _rows(df):
    return sorted((r.query_id, r.rk, r.vec_id, r.cosine) for r in df.collect())


def test_full_probe_equals_flat_pq_index(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.operators.similarity2 import (
        ann_pq_index_query,
        build_pq_index,
    )

    ivfpq_dir = str(tmp_path / "ivfpq")
    pq_dir = str(tmp_path / "pq")
    build_ivfpq_index(spark, sf_dir, ivfpq_dir)
    build_pq_index(spark, sf_dir, pq_dir)

    n_cells = spark.read.parquet(f"{ivfpq_dir}/coarse_codebook").count()
    vecs = _vectors(spark, sf_dir).select("vec_id", "v")
    q = _queries(spark, sf_dir)
    got = _rows(
        ann_ivfpq_index_query(
            spark, ivfpq_dir, q, vecs, nprobe=n_cells, exclude_self=True
        )
    )
    want = _rows(ann_pq_index_query(spark, pq_dir, q, vecs, exclude_self=True))
    assert got == want


def test_default_probe_recall_floor_and_exact_scores(spark, sf_dir, tmp_path):
    import __spark_entry__ as entrymod

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, sf_dir, idx)
    vecs = _vectors(spark, sf_dir).select("vec_id", "v")
    got = ann_ivfpq_index_query(
        spark, idx, _queries(spark, sf_dir), vecs, exclude_self=True
    ).collect()
    brute = {
        (r.query_id, r.vec_id): r.cosine
        for r in entrymod.queries()["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    hits = {(r.query_id, r.vec_id) for r in got}
    recall = len(hits & set(brute)) / len(brute)
    # double approximation (cell prune + coarse PQ) sits below flat PQ's
    # 0.3 floor; the point of the floor is catching encode regressions
    assert recall >= 0.2, f"ivfpq recall@10 {recall:.2f} < 0.2"
    # scores come from the exact rerank: any pair shared with brute
    # force must carry the identical cosine
    for r in got:
        key = (r.query_id, r.vec_id)
        if key in brute:
            assert r.cosine == pytest.approx(brute[key], abs=1e-9)


def test_incremental_add_equals_rebuild(spark, sf_dir, tmp_path):
    full = str(tmp_path / "full")
    build_ivfpq_index(spark, sf_dir, full)

    inc = str(tmp_path / "inc")
    os.makedirs(inc)
    shutil.copytree(f"{full}/coarse_codebook", f"{inc}/coarse_codebook")
    shutil.copytree(f"{full}/pq_codebook", f"{inc}/pq_codebook")
    vecs = _vectors(spark, sf_dir)
    ivfpq_index_add(
        spark, inc, vecs.where(F.col("vec_id") % 2 == 0).select("vec_id", "v")
    )
    ivfpq_index_add(
        spark, inc, vecs.where(F.col("vec_id") % 2 == 1).select("vec_id", "v")
    )

    q = _queries(spark, sf_dir)
    prim = vecs.select("vec_id", "v")
    assert _rows(ann_ivfpq_index_query(spark, inc, q, prim)) == _rows(
        ann_ivfpq_index_query(spark, full, q, prim)
    )


def test_stream_ivfpq_ingest_equals_rebuild(spark, sf_dir, tmp_path):
    """Embedding batches on a stream, applied via foreachBatch
    ivfpq_index_add, must produce a codes table identical to a full
    rebuild; a re-drain with no new files must not change it."""
    from sentiment_analysis_vector_search_spark.streaming.file_sink import (
        stream_ivfpq_ingest,
    )

    full_dir = str(tmp_path / "full")
    build_ivfpq_index(spark, sf_dir, full_dir)

    stream_idx = str(tmp_path / "streamed")
    os.makedirs(stream_idx)
    shutil.copytree(f"{full_dir}/coarse_codebook", f"{stream_idx}/coarse_codebook")
    shutil.copytree(f"{full_dir}/pq_codebook", f"{stream_idx}/pq_codebook")

    src_dir = str(tmp_path / "emb_src")
    ckpt = str(tmp_path / "ckpt")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    os.makedirs(src_dir)
    for tag, pred in (("a", F.col("vec_id") % 2 == 0), ("b", F.col("vec_id") % 2 == 1)):
        staging = str(tmp_path / f"_{tag}")
        emb.where(pred).coalesce(1).write.parquet(staging)
        part = next(n for n in os.listdir(staging) if n.endswith(".parquet"))
        shutil.copy(
            os.path.join(staging, part),
            os.path.join(src_dir, f"embeddings_{tag}.parquet"),
        )
        stream_ivfpq_ingest(spark, src_dir, stream_idx, ckpt)

    def codes(d):
        return sorted(
            (r.vec_id, r.s, r.code, r.cell)
            for r in spark.read.parquet(f"{d}/codes").collect()
        )

    assert codes(stream_idx) == codes(full_dir)

    n_before = spark.read.parquet(f"{stream_idx}/codes").count()
    stream_ivfpq_ingest(spark, src_dir, stream_idx, ckpt)
    assert spark.read.parquet(f"{stream_idx}/codes").count() == n_before


def test_compact_preserves_answers(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.sinks import compact_index

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, sf_dir, idx)
    q = _queries(spark, sf_dir)
    prim = _vectors(spark, sf_dir).select("vec_id", "v")
    before = _rows(ann_ivfpq_index_query(spark, idx, q, prim))
    compact_index(spark, idx, "ivfpq")
    assert _rows(ann_ivfpq_index_query(spark, idx, q, prim)) == before


def test_codes_scan_is_cell_pruned(spark, sf_dir, tmp_path):
    from sentiment_analysis_vector_search_spark.plans import plan_str

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, sf_dir, idx)
    codes = spark.read.parquet(f"{idx}/codes")
    assert set(codes.columns) == {"vec_id", "nrm", "s", "code", "cell"}  # no raw v

    narrow = ann_ivfpq_index_query(
        spark,
        idx,
        _queries(spark, sf_dir).where(F.col("query_id") < 2),
        _vectors(spark, sf_dir).select("vec_id", "v"),
    )
    plan = plan_str(narrow)
    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)", plan)
    assert m, plan
    n_probed = len(m.group(1).split(","))
    n_all = sum(1 for d in os.listdir(f"{idx}/codes") if d.startswith("cell="))
    assert n_probed < n_all, (n_probed, n_all)
