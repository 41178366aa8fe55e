import pytest

from tests.parity import assert_parity

TEXT_OPS = [
    "text_extract_blocks",
    "text_extract_dates",
    "top_words",
    "tfidf_vectors",
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
]


@pytest.mark.parametrize("name", TEXT_OPS)
def test_text_ops_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_extract_dates_all_resolve(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_extract_dates"](spark, sf_dir)
    assert df.where("visit_date IS NULL").count() == 0
    sample = df.limit(5).collect()
    for r in sample:
        assert len(r["visit_date"]) == 10 and r["visit_date"][4] == "-"


def test_tfidf_rows_l2_normalized(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    df = entrymod.queries()["tfidf_vectors"](spark, sf_dir)
    norms = df.groupBy("doc_id").agg(F.sum(F.col("tfidf") * F.col("tfidf")).alias("sq"))
    bad = norms.where((F.col("sq") < 0.99) | (F.col("sq") > 1.01)).count()
    assert bad == 0


def test_doc_top_keywords_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "doc_top_keywords", sf_dir)
