"""RAG/training-prep suite: DuckDB parity + structural invariants."""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

RAG_PREP = [
    "chunk_documents",
    "contrastive_pairs",
    "split_train_holdout",
    "rag_chunk_retrieve",
]


@pytest.mark.parametrize("name", RAG_PREP)
def test_rag_prep_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_chunks_cover_every_char(spark, sf_dir):
    """First-owner coverage: chunk starts step by the stride from 0 and the
    last chunk reaches the end of the document, so the concatenation of
    [start, start+stride) prefixes reconstructs the text."""
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.catalog import table
    from sentiment_analysis_vector_search_spark.operators.rag_prep import (
        _CHUNK,
        _STRIDE,
    )

    ch = entrymod.queries()["chunk_documents"](spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    text_by_id = dict(zip(docs["doc_id"], docs["text"]))
    assert set(ch["doc_id"]) == set(docs["doc_id"])
    for doc_id, grp in ch.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        text = text_by_id[doc_id]
        assert list(grp["chunk_start"]) == [
            i * _STRIDE for i in range(len(grp))
        ]
        # last chunk reaches the end; earlier chunks are full-width
        assert grp["chunk_start"].iloc[-1] + grp["chunk_len"].iloc[-1] == len(text)
        assert (grp["chunk_len"].iloc[:-1] == _CHUNK).all()
        rebuilt = "".join(
            t[:_STRIDE] for t in grp["chunk_text"].iloc[:-1]
        ) + grp["chunk_text"].iloc[-1]
        assert rebuilt == text


def test_contrastive_pairs_overlap(spark, sf_dir):
    """Anchor and positive share the overlap region: anchor's tail
    (stride..chunk) equals positive's head — the near-paraphrase signal."""
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.operators.rag_prep import (
        _CHUNK,
        _STRIDE,
    )

    df = entrymod.queries()["contrastive_pairs"](spark, sf_dir).toPandas()
    assert len(df) > 0
    overlap = _CHUNK - _STRIDE
    for _, r in df.iterrows():
        if len(r["anchor_text"]) == _CHUNK:
            shared = r["anchor_text"][_STRIDE:]
            assert r["positive_text"][: len(shared)] == shared
            assert len(shared) == overlap


def test_split_ratios_and_determinism(spark, sf_dir):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["split_train_holdout"]
    a = q(spark, sf_dir).toPandas().sort_values("doc_id", ignore_index=True)
    b = q(spark, sf_dir).toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)  # rerun-stable
    frac = a["split"].value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95
    assert set(a["split"]) <= {"train", "val", "test"}
    # assignment is a pure function of doc_id: no duplicates, all docs
    assert a["doc_id"].is_unique


def test_rag_chunk_retrieve_topk_sorted(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["rag_chunk_retrieve"](spark, sf_dir).toPandas()
    assert len(df) == 10
    assert (df["score"].values[:-1] >= df["score"].values[1:]).all()
    # the query vector is chunk (0, 0)'s own embedding: it must be rank 1
    assert df.iloc[0]["doc_id"] == 0 and df.iloc[0]["chunk_id"] == 0
    assert df.iloc[0]["score"] == pytest.approx(1.0, abs=1e-6)
