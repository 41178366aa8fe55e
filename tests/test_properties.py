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


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_chunking_reconstructs_arbitrary_unicode(spark, texts):
    """Chunk windows are character-exact on arbitrary unicode (CJK,
    combining marks, symbols): stride prefixes + last chunk rebuild the
    text, and chunk counts match the closed form."""
    from sentiment_analysis_vector_search_spark.operators.rag_prep import (
        _CHUNK,
        _STRIDE,
        _chunks,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = _chunks(docs).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        grp = sorted(by_doc[i], key=lambda r: r.chunk_id)
        n_expected = 1 + max(0, (max(len(t) - _CHUNK, 0) + _STRIDE - 1) // _STRIDE)
        assert len(grp) == n_expected, (t, len(grp), n_expected)
        rebuilt = "".join(r.chunk_text[:_STRIDE] for r in grp[:-1]) + grp[-1].chunk_text
        assert rebuilt == t
        for r in grp:
            assert r.chunk_text == t[r.chunk_start : r.chunk_start + _CHUNK]


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_split_assignment_stable_under_growth(spark, texts):
    """Appending docs never changes existing split assignments (the
    bucket is a pure doc_id hash, not rank- or count-dependent)."""
    from sentiment_analysis_vector_search_spark.functions.hashing import md5_long

    bucket = (
        md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    ).cast("int")
    small = spark.createDataFrame(
        [(i,) for i in range(len(texts))], "doc_id long"
    ).select("doc_id", bucket.alias("b"))
    grown = spark.createDataFrame(
        [(i,) for i in range(len(texts) * 2 + 5)], "doc_id long"
    ).select("doc_id", bucket.alias("b"))
    a = {r.doc_id: r.b for r in small.collect()}
    g = {r.doc_id: r.b for r in grown.collect()}
    assert all(g[k] == v for k, v in a.items())


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_dist_ntile_matches_sql_ntile_on_arbitrary_input(spark, vals, k):
    """functions/ranks.dist_ntile must reproduce SQL ntile(k) semantics on
    arbitrary values — duplicates, negatives, n < k — against Spark's own
    windowed ntile as the reference (safe at property-test scale)."""
    from pyspark.sql import Window

    from sentiment_analysis_vector_search_spark.functions.ranks import dist_ntile

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, v bigint"
    )
    got = {
        r["id"]: r["b"] for r in dist_ntile(df, "v", "id", k, "b").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["b"]
        for r in df.select("id", F.ntile(k).over(w).alias("b")).collect()
    }
    assert got == want
