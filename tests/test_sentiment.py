import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

SENTIMENT = [
    "sent_classify",
    "sent_distribution",
    "sent_quality_score",
    "sent_normalize",
    "sent_trends",
    "sent_trend_risk",
]


@pytest.mark.parametrize("name", SENTIMENT)
def test_sentiment_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_classify_three_classes(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.operators.sentiment_ops import classified

    labels = {r[0] for r in classified(spark, sf_dir).select("sentiment").distinct().collect()}
    assert labels <= {"POSITIVE", "NEGATIVE", "NEUTRAL"}
    assert len(labels) >= 2  # corpus should not be degenerate


def test_confidence_bounds(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.operators.sentiment_ops import classified

    row = (
        classified(spark, sf_dir)
        .agg(F.min("confidence").alias("lo"), F.max("confidence").alias("hi"))
        .collect()[0]
    )
    assert 0.5 <= row["lo"] <= row["hi"] <= 1.0


def test_risk_single_row(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["sent_trend_risk"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["risk_score"] <= 100
    assert r["risk_level"] in {"Low", "Medium", "High", "Critical"}
    assert r["insurance_cost"] > 0


def test_summarize_prompts_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "summarize_prompts", sf_dir)


def test_summarize_prompts_shape(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["summarize_prompts"](spark, sf_dir).collect()
    assert {r.sentiment for r in rows} <= {"POSITIVE", "NEGATIVE", "NEUTRAL"}
    for r in rows:
        assert r.prompt.startswith(f"Analyze the following {r.sentiment} ")
        assert r.prompt.endswith("Summary:")
        assert len(r.prompt) <= 6000 + len("\n\nSummary:")


def test_sent_classify_arrow_matches_jvm_oracle(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "sent_classify_arrow", sf_dir)


def test_recommendation_prompts_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "recommendation_prompts", sf_dir)


def test_recommendation_prompts_shape(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["recommendation_prompts"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # create_recommendation_prompt layout (recommendation_fun.py:39) with
    # query_groq_api's 6000-char cap (recommendation_fun.py:66)
    assert "POSITIVE FEEDBACK SUMMARY:" in r.prompt
    assert "NEGATIVE FEEDBACK SUMMARY:" in r.prompt
    assert r.prompt.endswith("Please provide 3 actionable recommendations:")
    assert r.truncated == (r.full_len > 6000)
    if r.truncated:
        assert len(r.prompt) <= 6000 + len("\n\nPlease provide 3 actionable recommendations:")
