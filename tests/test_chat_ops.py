"""chat_ops: the reference chatbot's data surface + MLflow param rows."""

import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

CHAT = ["chat_suggested_questions", "chat_context_summary", "run_params"]


@pytest.mark.parametrize("name", CHAT)
def test_chat_ops_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_suggested_questions_conditioning(spark, sf_dir):
    """Reference semantics (chatbot_analyzer.py:250-272): with both class
    summaries present the list is [neg-summary, recommendations, 8-2 of
    the static list]; always capped at 8."""
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.operators.chat_ops import (
        BASE_QUESTIONS,
        NEG_SUMMARY_QUESTION,
        RECOMMEND_QUESTION,
    )

    rows = sorted(
        entrymod.queries()["chat_suggested_questions"](spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    got = [r["question"] for r in rows]
    assert len(got) == 8
    assert [r["rank"] for r in rows] == list(range(1, 9))
    # the test corpora contain both positive and negative docs, so both
    # conditional inserts fire: insert(0, neg) then insert(1, rec)
    assert got[0] == NEG_SUMMARY_QUESTION
    assert got[1] == RECOMMEND_QUESTION
    assert got[2:] == list(BASE_QUESTIONS[:6])


def test_suggested_questions_insert_order_when_only_recs_possible():
    """Pure insert-order check against the reference algorithm: when the
    negative summary is absent but recommendations exist, insert(1) lands
    the rec question AFTER the first static question."""
    from sentiment_analysis_vector_search_spark.operators.chat_ops import (
        BASE_QUESTIONS,
        MAX_SUGGESTIONS,
        NEG_SUMMARY_QUESTION,
        RECOMMEND_QUESTION,
    )

    def ref(has_neg: bool, has_rec: bool) -> list[str]:
        s = list(BASE_QUESTIONS)
        if has_neg:
            s.insert(0, NEG_SUMMARY_QUESTION)
        if has_rec:
            s.insert(1, RECOMMEND_QUESTION)
        return s[:MAX_SUGGESTIONS]

    # mirror of the Column algebra in chat_suggested_questions
    def ours(has_neg: bool, has_rec: bool) -> list[str]:
        arr = list(BASE_QUESTIONS)
        if has_neg:
            arr = [NEG_SUMMARY_QUESTION] + arr
        if has_rec:
            arr = arr[:1] + [RECOMMEND_QUESTION] + arr[1:]
        return arr[:MAX_SUGGESTIONS]

    for has_neg in (False, True):
        for has_rec in (False, True):
            assert ours(has_neg, has_rec) == ref(has_neg, has_rec), (
                has_neg,
                has_rec,
            )


def test_context_summary_booleans_reflect_corpus(spark, sf_dir):
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.operators.sentiment_ops import (
        classified,
    )

    r = entrymod.queries()["chat_context_summary"](spark, sf_dir).collect()[0]
    counts = {
        row["sentiment"]: row["n"]
        for row in classified(spark, sf_dir)
        .groupBy("sentiment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert r["has_positive"] == (counts.get("POSITIVE", 0) > 0)
    assert r["has_negative"] == (counts.get("NEGATIVE", 0) > 0)
    assert r["has_neutral"] == (counts.get("NEUTRAL", 0) > 0)
    assert r["has_recommendations"] == (
        counts.get("POSITIVE", 0) > 0 and counts.get("NEGATIVE", 0) > 0
    )
    assert r["has_trends"] is True and r["conversation_length"] == 0


def test_run_params_rows(spark, sf_dir):
    """Literal params + the two data-derived rows (num_reviews matches
    the corpus count; data_source is 'mixed' for the multi-source test
    corpus). Exactly one row per param."""
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.catalog import table

    rows = entrymod.queries()["run_params"](spark, sf_dir).collect()
    by_param = {r["param"]: r["value"] for r in rows}
    assert len(by_param) == len(rows)  # no duplicate params
    n_docs = table(spark, sf_dir, "documents").count()
    assert by_param["num_reviews"] == str(n_docs)
    assert by_param["data_source"] == "mixed"
    assert by_param["model_name"].startswith("distilbert")
    assert by_param["tag:status"] == "FINISHED"
    assert by_param["sentence_length"] == "4"
