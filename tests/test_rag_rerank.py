"""MMR rerank pinned against a plain-Python greedy reference computed
over the identical candidate pool (oracle parity is the driver's job;
this pins the greedy semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_vector_search_spark.catalog import table
from sentiment_analysis_vector_search_spark.operators.rag_prep import (
    _chunks,
    _spark_emb,
)
from sentiment_analysis_vector_search_spark.operators.rag_rerank import (
    _K,
    _LAM,
    _ONE_MINUS_LAM,
    _POOL,
    rag_mmr_rerank,
)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _pool(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    chunks = _chunks(docs).select(
        "doc_id",
        "chunk_id",
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("chunk_id").cast("string")
        ).alias("key"),
    )
    emb = chunks.select("doc_id", "chunk_id", _spark_emb(F.col("key")).alias("e"))
    q = spark.range(1).select(_spark_emb(F.lit("0:0")).alias("qe"))
    rows = (
        emb.join(F.broadcast(q))
        .select("doc_id", "chunk_id", "e", "qe")
        .collect()
    )
    qe = rows[0]["qe"]
    cands = [
        (r["doc_id"], r["chunk_id"], list(r["e"]), _cos(r["e"], qe)) for r in rows
    ]
    cands.sort(key=lambda c: (-c[3], c[0], c[1]))
    return cands[:_POOL]


def _py_mmr(pool, k):
    sel = []
    remaining = list(pool)
    while len(sel) < k and remaining:
        best = None
        for c in remaining:
            if not sel:
                score = c[3]
            else:
                score = _LAM * c[3] - _ONE_MINUS_LAM * max(
                    _cos(c[2], s[2]) for s in sel
                )
            key = (-score, c[0], c[1])
            if best is None or key < best[0]:
                best = (key, c)
        sel.append(best[1])
        remaining = [c for c in remaining if (c[0], c[1]) != (best[1][0], best[1][1])]
    return [(c[0], c[1]) for c in sel]


def test_mmr_matches_python_greedy_reference(spark, sf_dir):
    got = sorted(
        ((r["pick"], r["doc_id"], r["chunk_id"]) for r in
         rag_mmr_rerank(spark, sf_dir).collect())
    )
    ref = _py_mmr(_pool(spark, sf_dir), _K)
    assert got == [(i + 1, d, c) for i, (d, c) in enumerate(ref)]


def test_mmr_output_contract(spark, sf_dir):
    rows = rag_mmr_rerank(spark, sf_dir).collect()
    assert sorted(r["pick"] for r in rows) == list(range(1, _K + 1))
    # distinct chunks, and pick 1 is the relevance argmax (mmr == rel)
    assert len({(r["doc_id"], r["chunk_id"]) for r in rows}) == _K
    first = next(r for r in rows if r["pick"] == 1)
    assert first["mmr"] == pytest.approx(first["rel"], abs=0)
    assert first["rel"] == max(r["rel"] for r in rows)
    # later picks trade relevance for diversity: mmr <= lam * rel + eps
    for r in rows:
        if r["pick"] > 1:
            assert r["mmr"] <= _LAM * r["rel"] + 1e-12
