import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity


@pytest.mark.parametrize(
    "name",
    [
        "text_pii_redact",
        "text_quality_gate",
        "sample_stratified",
        "run_metrics",
        "dedup_sentence_overlap",
    ],
)
def test_pipeline_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_pii_redaction_removes_all_pii(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_pii_redact"](spark, sf_dir)
    leaked = df.where(
        F.col("redacted").rlike(r"@example\.com")
        | F.col("redacted").rlike(r"https?://")
        | F.col("redacted").rlike(r"\+1 \(555\)")
    ).count()
    assert leaked == 0
    stats = df.agg(
        F.min("n_emails").alias("e"), F.min("n_urls").alias("u"), F.min("n_phones").alias("p")
    ).first()
    # every stamped doc has at least one of each PII kind detected
    assert stats["e"] >= 1 and stats["u"] >= 1 and stats["p"] >= 1


def test_sample_rates_approximate_strata(spark, sf_dir):
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.catalog import table
    from sentiment_analysis_vector_search_spark.operators.pipeline_ops import _RATES

    docs = table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in entrymod.queries()["sample_stratified"](spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, rate in _RATES.items():
        if totals.get(lang, 0) >= 50:
            frac = kept.get(lang, 0) / totals[lang]
            assert abs(frac - rate / 100) < 0.25, (lang, frac, rate)


def test_run_metrics_consistency(spark, sf_dir):
    import __spark_entry__ as entrymod

    vals = {
        r["metric"]: r["value"]
        for r in entrymod.queries()["run_metrics"](spark, sf_dir).collect()
    }
    assert vals["total_reviews"] == pytest.approx(
        vals["positive_count"] + vals["negative_count"] + vals["neutral_count"]
    )
    assert (
        vals["positive_ratio"] + vals["negative_ratio"] + vals["neutral_ratio"]
    ) == pytest.approx(1.0, abs=1e-5)


import pytest as _pytest


@_pytest.mark.parametrize(
    "name", ["text_char_trigram_score", "docs_source_profile", "sample_importance"]
)
def test_pipeline_ops2_parity(spark, sf_dir, name):
    from tests.parity import assert_parity

    assert_parity(spark, name, sf_dir)


@_pytest.mark.parametrize("name", ["text_gopher_quality", "decontaminate_ngrams"])
def test_curation_ext_parity(spark, sf_dir, name):
    from tests.parity import assert_parity

    assert_parity(spark, name, sf_dir)


def test_gopher_metrics_bounds(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["text_gopher_quality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.frac_dup_lines <= 1.0
        assert 0.0 <= r.frac_top_2gram <= 1.0
        assert r.symbol_word_ratio >= 0.0
        assert r.mean_word_len >= 0.0


def test_decontaminate_excludes_eval_docs(spark, sf_dir):
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.operators.curation_ext import (
        _EVAL_DOCS,
    )

    df = entrymod.queries()["decontaminate_ngrams"](spark, sf_dir)
    assert df.filter(df.doc_id < _EVAL_DOCS).count() == 0
    # n_overlap > 0 iff contaminated
    assert df.filter((df.n_overlap > 0) != df.contaminated).count() == 0


def test_gopher_plan_has_no_shuffle(spark, sf_dir):
    # The whole point of the sorted-run bigram mode: the metric computes
    # map-only. Any Exchange in the plan means the per-doc mode regressed
    # to an explode->groupBy shuffle.
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.plans import plan_str

    plan = plan_str(entrymod.queries()["text_gopher_quality"](spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_domain_mix_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "domain_mix_plan", sf_dir)


def test_domain_mix_no_upsampling(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["domain_mix_plan"](spark, sf_dir).collect()
    assert rows
    # the no-upsampling policy: every rate in (0, 1], at least one source
    # keeps all its docs (the binding constraint), shares each sum to ~1
    assert all(0.0 < r.sampling_rate <= 1.0 for r in rows)
    assert any(r.sampling_rate == 1.0 for r in rows)
    assert abs(sum(r.current_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.expected_docs <= r.n_docs


def test_curation_edge_case_corpus(spark, tmp_path):
    """Gopher metrics + decontamination must agree with the DuckDB oracle
    on edge-case text the driver corpus never exercises: empty docs,
    single words, exact repeated lines, heavy symbols, multi-byte UTF-8
    (char-semantics of length/substring), and massive token repetition."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from tests.parity import _normalize

    texts = [
        "",
        "word",
        "line one\nline one\nline one\nline two",
        "### ### ### almost all symbols ... ... ...",
        "héllo wörld héllo wörld héllo wörld héllo wörld",
        "the same pair " + "again again " * 30,
        "a normal looking sentence with reasonably varied words here",
        "日本語 トークン 長さ テスト 日本語 トークン 長さ テスト 日本語 トークン",
    ] * 4  # 32 docs so some land on each side of the eval split
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array([f"src{i % 3}" for i in range(len(texts))]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    for name in ("text_gopher_quality", "decontaminate_ngrams", "domain_mix_plan"):
        got = _normalize(entrymod.queries()[name](spark, str(tmp_path)).toPandas())
        want = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
        assert list(got.columns) == list(want.columns), name
        assert got.astype(str).values.tolist() == want.astype(str).values.tolist(), name
    con.close()


def test_stream_gate_constants_match_batch():
    # the streaming gate inlines its thresholds (import-order constraint,
    # see stream_ops) — this pins them to the batch gate's constants
    from sentiment_analysis_vector_search_spark.operators.pipeline_ops import (
        _MAX_WORD_CHARS,
        _MIN_STOPWORD_HITS,
        _MIN_WORDS,
    )
    from sentiment_analysis_vector_search_spark.streaming.stream_ops import (
        _SGATE_MAX_WORD_CHARS,
        _SGATE_MIN_STOP_HITS,
        _SGATE_MIN_WORDS,
    )

    assert _SGATE_MIN_WORDS == _MIN_WORDS
    assert _SGATE_MIN_STOP_HITS == _MIN_STOPWORD_HITS
    assert _SGATE_MAX_WORD_CHARS == _MAX_WORD_CHARS


def test_stream_quality_gate_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "stream_quality_gate", sf_dir)


def test_decontaminate_fuzzy_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "decontaminate_fuzzy", sf_dir)


def test_decontaminate_fuzzy_catches_paraphrased_leak(spark, tmp_path):
    """A corpus doc sharing most (but not a verbatim run of) an eval
    doc's shingles is flagged; an unrelated doc is not; eval docs are
    excluded from the output."""
    import os

    import pandas as pd

    from sentiment_analysis_vector_search_spark.operators.curation_ext import (
        _EVAL_DOCS,
        decontaminate_fuzzy,
    )

    eval_words = [f"bench{i}" for i in range(40)]
    # leaked: the same word stream with one word swapped mid-way — high
    # shingle jaccard, but no long verbatim run at the swap point
    leaked = eval_words[:20] + ["SWAP"] + eval_words[21:]
    texts = {0: " ".join(eval_words)}
    for i in range(1, _EVAL_DOCS):
        texts[i] = f"pad{i} " * 30  # other eval docs, unrelated
    texts[_EVAL_DOCS + 1] = " ".join(leaked)
    texts[_EVAL_DOCS + 2] = " ".join(f"clean{i}" for i in range(40))
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pd.DataFrame(
        [
            {"doc_id": k, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)}
            for k, t in texts.items()
        ]
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)

    got = {r["doc_id"]: r for r in decontaminate_fuzzy(spark, d).collect()}
    assert all(k >= _EVAL_DOCS for k in got)
    assert got[_EVAL_DOCS + 1]["contaminated"]
    assert got[_EVAL_DOCS + 1]["max_jaccard"] > 0.8
    assert not got[_EVAL_DOCS + 2]["contaminated"]
    assert got[_EVAL_DOCS + 2]["n_candidates"] == 0
