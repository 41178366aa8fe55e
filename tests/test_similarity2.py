import pytest

from tests.parity import assert_parity


def test_ann_pq_parity(spark, sf_dir):
    assert_parity(spark, "ann_pq_adc_topk", sf_dir)


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ shortlist + exact rerank must hold a recall@10 floor against
    brute force. Measured (sf0.001/0.01/0.1): 0.54/0.62/0.40 — the
    k=|labels|=10 codebook is deliberately coarse (a production run uses
    k=256 per subspace); the floor sits below the worst measurement so a
    codebook/encode regression trips it while honest variance does not."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    brute = {
        (r.query_id, r.vec_id)
        for r in qs["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    pq = {
        (r.query_id, r.vec_id) for r in qs["ann_pq_adc_topk"](spark, sf_dir).collect()
    }
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.3, f"ann_pq_adc_topk: recall@10 {recall:.2f} < 0.3"


def test_pq_rerank_cosines_are_exact(spark, sf_dir):
    """The final scores come from the exact rerank pass, so any (query,
    vec) pair PQ shares with brute force must carry the identical cosine
    — the approximation may only drop pairs, never mis-score them."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    brute = {
        (r.query_id, r.vec_id): r.cosine
        for r in qs["ann_bruteforce_topk"](spark, sf_dir).collect()
    }
    pq = qs["ann_pq_adc_topk"](spark, sf_dir).collect()
    assert len(pq) > 0
    for r in pq:
        key = (r.query_id, r.vec_id)
        if key in brute:
            assert r.cosine == pytest.approx(brute[key], abs=1e-9)


def test_pq_ranks_dense_and_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    df = entrymod.queries()["ann_pq_adc_topk"](spark, sf_dir)
    per_q = df.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rk").alias("mx"), F.min("rk").alias("mn")
    )
    for r in per_q.collect():
        assert r["n"] <= 10 and r["mn"] == 1 and r["mx"] == r["n"]


def test_pq_codebook_shape(spark, sf_dir):
    """Codebook must hold one sub-centroid per (label, subspace) with
    subdim-length arrays — the broadcast-side contract of the encode."""
    from sentiment_analysis_vector_search_spark.operators.similarity2 import (
        _PQ_M,
        _PQ_SUBDIM,
        _pq_codebook,
    )

    cb = _pq_codebook(spark, sf_dir).collect()
    labels = {r.label for r in cb}
    assert len(cb) == len(labels) * _PQ_M
    for r in cb:
        assert len(r.sc) == _PQ_SUBDIM
        assert 0 <= r.s < _PQ_M
