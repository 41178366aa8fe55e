import pytest

from tests.parity import assert_parity

CURATION2 = [
    "pack_sequences",
    "corpus_vocab_stats",
    "emb_quality_audit",
    "tokenizer_fertility",
    "text_char_diversity",
]


@pytest.mark.parametrize("name", CURATION2)
def test_curation2_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_keep_canonical_parity(spark, sf_dir):
    assert_parity(spark, "dedup_keep_canonical", sf_dir)


def test_pack_sequences_bins_contiguous(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["pack_sequences"](spark, sf_dir).toPandas()
    assert len(df) > 0
    for src, grp in df.groupby("source"):
        seqs = sorted(grp["seq_id"])
        # a bin is skipped only if a single doc spans more than a full
        # budget; with the ~55-token docs in the corpus bins are contiguous
        assert seqs == list(range(len(seqs)))
        # every bin except possibly the last holds at least a budget's
        # worth of starts-before tokens minus the straddle — fill > 0
        assert (grp["seq_tokens"] > 0).all()
        assert (grp["n_docs"] > 0).all()


def test_keep_canonical_invariants(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["dedup_keep_canonical"](spark, sf_dir).toPandas()
    if len(df) == 0:
        pytest.skip("no near-dup groups at this sf")
    # canonical is the minimum doc_id of its group
    assert (df.groupby("canonical_doc_id")["doc_id"].transform("min") == df["canonical_doc_id"]).all()
    # exactly one non-duplicate (the canonical itself) per group
    keepers = df[~df["is_duplicate"]]
    assert (keepers["doc_id"] == keepers["canonical_doc_id"]).all()
    assert keepers["canonical_doc_id"].is_unique
    # group_size matches the actual member count
    sizes = df.groupby("canonical_doc_id")["doc_id"].count()
    got = df.drop_duplicates("canonical_doc_id").set_index("canonical_doc_id")["group_size"]
    assert (sizes == got).all()


def test_emb_quality_audit_clean_corpus(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["emb_quality_audit"](spark, sf_dir).toPandas()
    assert (df["min_dim"] == 64).all() and (df["max_dim"] == 64).all()
    assert (df["n_nan_vecs"] == 0).all()
    assert (df["min_norm"] > 0).all()
    assert (df["min_norm"] <= df["max_norm"]).all()


def test_pack_sequences_matches_python_reference(spark, tmp_path):
    """Packing semantics vs a plain-Python reference on a synthetic corpus
    (including empty docs and docs longer than the whole budget)."""
    import shutil

    from sentiment_analysis_vector_search_spark.operators.curation2 import (
        _PACK_BUDGET,
        pack_sequences,
    )

    rows = []
    texts = {
        1: "a b c",
        2: " ".join(f"w{i}" for i in range(_PACK_BUDGET + 7)),  # spans > budget
        3: "x",
        4: "",
        5: " ".join(f"v{i}" for i in range(200)),
        6: "one two three four five six",
    }
    for doc_id, text in texts.items():
        rows.append((doc_id, text, "en", "srcA", len(text)))
        rows.append((doc_id + 100, text, "en", "srcB", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "packdata")
    df.coalesce(1).write.parquet(d)
    # pack_sequences reads <dir>/documents.parquet
    import glob
    import os

    part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
    os.replace(part, os.path.join(d, "documents.parquet"))
    shutil.rmtree(d + "/_SUCCESS", ignore_errors=True)

    got = {
        (r.source, r.seq_id): (r.n_docs, r.seq_tokens)
        for r in pack_sequences(spark, d).collect()
    }

    # python reference: same rule — doc joins the bin its first token
    # falls in; empty docs count 1 token ('' split yields [''], filtered
    # to [] -> 0 tokens... match the engine: non-empty tokens only)
    want: dict = {}
    for source in ("srcA", "srcB"):
        ids = sorted(k for k in texts) if source == "srcA" else sorted(
            k + 100 for k in texts
        )
        offset = 0
        for doc_id in ids:
            text = texts[doc_id if source == "srcA" else doc_id - 100]
            n_tok = len([w for w in text.lower().split() if w])
            bin_id = offset // _PACK_BUDGET
            n, t = want.get((source, bin_id), (0, 0))
            want[(source, bin_id)] = (n + 1, t + n_tok)
            offset += n_tok
    assert got == want


def test_cap_per_source_counts_and_determinism(spark, sf_dir):
    """Each source keeps exactly min(cap, |source|) docs; ranks are a
    dense permutation per source; and the selection is run-stable."""
    from pyspark.sql import functions as F

    from sentiment_analysis_vector_search_spark.operators.curation2 import (
        _CAP_N,
        cap_per_source,
    )

    df = cap_per_source(spark, sf_dir)
    per_src = (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.max("cap_rank").alias("mx"),
            F.min("cap_rank").alias("mn"),
        )
        .collect()
    )
    assert per_src
    for r in per_src:
        assert r["n_kept"] == min(_CAP_N, r["n"])
        assert r["mn"] == 1 and r["mx"] == r["n"]

    kept_a = {(r.source, r.doc_id) for r in df.where("kept").collect()}
    kept_b = {
        (r.source, r.doc_id)
        for r in cap_per_source(spark, sf_dir).where("kept").collect()
    }
    assert kept_a == kept_b


def test_cap_per_source_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "cap_per_source", sf_dir)
