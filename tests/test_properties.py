"""Property tests (hypothesis): the §4 determinism rules must hold on
*arbitrary* input, not just the corpus. Each example builds one small
DataFrame and checks invariants for every row."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        max_size=80,
    ),
    min_size=1,
    max_size=20,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_md5_long_cross_engine(spark, texts):
    """Spark's md5→bigint hash ≡ DuckDB's on arbitrary unicode strings."""
    import duckdb

    from sentiment_analysis_vector_search_spark.functions.hashing import md5_long

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.h for r in df.select(md5_long(F.col("t")).alias("h")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT cast(concat('0x', substr(md5(?), 1, 15)) as bigint)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == want


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_classify_invariants(spark, texts):
    """Confidence ∈ [0.5, 1]; labels from the fixed vocabulary; quality ≥ 0."""
    from sentiment_analysis_vector_search_spark.functions import sentiment as S

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pos, neg = S.pos_hits(F.col("text")), S.neg_hits(F.col("text"))
    out = df.select(
        S.confidence(pos, neg).alias("conf"),
        S.sentiment(S.raw_label(pos, neg), S.confidence(pos, neg)).alias("label"),
    ).collect()
    for r in out:
        assert 0.5 <= r.conf <= 1.0
        assert r.label in ("POSITIVE", "NEGATIVE", "NEUTRAL")


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_quality_score_nonnegative(spark, texts):
    from sentiment_analysis_vector_search_spark.functions import sentiment as S

    df = spark.createDataFrame([(t, "POSITIVE") for t in texts], "text string, sentiment string")
    out = df.select(S.quality_score(F.col("text"), F.col("sentiment")).alias("q")).collect()
    assert all(r.q >= 0.0 for r in out)


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_minhash_signature_range(spark, texts):
    """Every minhash value stays inside the 31-bit universal-hash field."""
    from sentiment_analysis_vector_search_spark.functions.hashing import (
        MOD31,
        md5_int31,
    )

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(md5_int31(F.col("t")).alias("h")).collect()
    assert all(0 <= r.h < MOD31 for r in out)
