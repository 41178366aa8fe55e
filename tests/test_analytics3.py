import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

ANALYTICS3 = ["text_repetition_score", "q_events_dau_wau", "docs_length_histogram"]


@pytest.mark.parametrize("name", ANALYTICS3)
def test_analytics3_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_repetition_fractions_bounded(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_repetition_score"](spark, sf_dir)
    bad = df.where(
        (F.col("dup_word_frac") < 0)
        | (F.col("dup_word_frac") >= 1)
        | (F.col("top_word_frac") <= 0)
        | (F.col("top_word_frac") > 1)
        | (F.col("n_distinct_words") > F.col("n_words"))
    )
    assert bad.count() == 0


def test_dau_never_exceeds_wau(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_events_dau_wau"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"], r
        assert 0 < r["stickiness"] <= 1, r


def test_length_histogram_covers_corpus(spark, sf_dir):
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.catalog import table

    df = entrymod.queries()["docs_length_histogram"](spark, sf_dir)
    rows = df.collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["lo_chars"] == 2 ** r["bucket"]
        assert r["hi_chars"] == 2 ** (r["bucket"] + 1) - 1
        assert r["lo_chars"] <= r["min_chars"] <= r["max_chars"] <= r["hi_chars"]
