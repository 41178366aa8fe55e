import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity


@pytest.mark.parametrize("name", ["stream_windowed_counts", "mm_decode_stub"])
def test_advanced_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_representatives_invariants(spark, sf_dir):
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.operators.sentiment_ops import (
        classified,
    )
    from sentiment_analysis_vector_search_spark.operators.text_ops import (
        tfidf_vectors,
    )

    reps = entrymod.queries()["representatives_kmeans"](spark, sf_dir)
    rows = reps.collect()
    assert len(rows) > 0

    # the clustered population is the VECTORIZED class (docs with >= 1 kept
    # vocabulary word) — docs without a vector sit outside the clustering
    class_sizes = {
        r["sentiment"]: r["n"]
        for r in classified(spark, sf_dir)
        .join(tfidf_vectors(spark, sf_dir).select("doc_id").distinct(), "doc_id")
        .groupBy("sentiment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_sent = {}
    for r in rows:
        by_sent.setdefault(r["sentiment"], []).append(r)
    for sent, rs in by_sent.items():
        # one representative per cluster; cluster sizes partition the class;
        # <= k clusters (Lloyd rounds may empty a cluster)
        assert len({r["cluster_id"] for r in rs}) == len(rs)
        assert sum(r["cluster_size"] for r in rs) == class_sizes[sent]
        assert 1 <= len(rs) <= min(10, class_sizes[sent])
        for r in rs:
            assert -1e-6 <= r["centroid_cosine"] <= 1.000001


def test_representatives_kmeans_parity(spark, sf_dir):
    """The full deterministic fit hash-matches the DuckDB replay — the
    check that closed the last rows-only driver row (r5)."""
    assert_parity(spark, "representatives_kmeans", sf_dir)


def test_representatives_deterministic(spark, sf_dir):
    import __spark_entry__ as entrymod

    from sentiment_analysis_vector_search_spark.operators.representatives import (
        _REPS_CACHE,
    )

    q = entrymod.queries()["representatives_kmeans"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    _REPS_CACHE.clear()  # force a full re-fit — the memo must not hide it
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b


def test_multimodal_byte_semantics_non_ascii(spark, tmp_path):
    """The multimodal oracles must agree with the pandas path on BYTE
    semantics — multi-byte UTF-8, byte-misaligned frame cuts, and empty
    payloads — not just on the ASCII corpus the driver generates."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from tests.parity import _normalize

    texts = [
        "héllo wörld ü ß à",
        "",
        "emoji 🎉🚀 mixed with ascii tail",
        "日本語のテキストです、バイト境界テスト。" * 6,  # 3-byte chars across 32B frames
        "plain ascii filler text " * 12,
        "mixed ascii é" + "é" * 40,
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    for name in ("mm_decode_stub", "mm_frame_sample", "mm_resize_stub"):
        got = _normalize(entrymod.queries()[name](spark, str(tmp_path)).toPandas())
        want = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
        assert list(got.columns) == list(want.columns), name
        assert got.astype(str).values.tolist() == want.astype(str).values.tolist(), name
    con.close()


def test_decode_image_is_stubbed():
    from sentiment_analysis_vector_search_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_mm_frame_sample_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "mm_frame_sample", sf_dir)


def test_arrow_cosine_matches_jvm_path(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "ann_bruteforce_topk_arrow", sf_dir)


def test_ml_grouped_linreg_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "ml_grouped_linreg", sf_dir)


def test_mm_resize_stub_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "mm_resize_stub", sf_dir)


def test_representative_is_argmax_cosine_member(spark, sf_dir):
    """The chosen representative must be its cluster's nearest-to-centroid
    member (max cosine; doc_id tiebreak) — checked over the FULL scored
    assignment, which the registered query's k-row output can't show."""
    from sentiment_analysis_vector_search_spark.operators.representatives import (
        _kmeans_assignments,
        representatives_kmeans,
    )

    scored = _kmeans_assignments(spark, sf_dir).where(
        F.col("sentiment") == "POSITIVE"
    )
    best = {}
    for r in scored.select("cluster_id", "doc_id", "centroid_cosine").collect():
        cur = best.get(r["cluster_id"])
        key = (-r["centroid_cosine"], r["doc_id"])
        if cur is None or key < cur[0]:
            best[r["cluster_id"]] = (key, r["doc_id"])
    reps = {
        r["cluster_id"]: r["doc_id"]
        for r in representatives_kmeans(spark, sf_dir)
        .where(F.col("sentiment") == "POSITIVE")
        .collect()
    }
    assert reps == {cid: doc for cid, (_, doc) in best.items()}


def test_every_query_has_valid_oracle():
    """Registry meta-contract: every registered query carries an oracle
    whose SQL at least PLANS in DuckDB over the real table schemas (the
    cheap tripwire for oracle-text drift between full parity runs).
    Queries without an oracle must be none — representatives_kmeans was
    the last, closed in r5 by the in-engine deterministic fit."""
    import duckdb

    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.catalog import TABLES

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert missing == [], f"queries without oracle_sql: {missing}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collect every failure
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracle SQL fails to plan: {bad}"


def test_mm_audio_energy_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "mm_audio_energy_stub", sf_dir)


def test_mm_audio_energy_python_reference(spark, sf_dir):
    """Exact-integer window features must equal a plain-Python pass over
    the same bytes (fan-out count, energy, ZCR, VAD gate)."""
    import pandas as pd

    from sentiment_analysis_vector_search_spark.multimodal import (
        _AUDIO_VAD_T,
        _AUDIO_WIN,
        mm_audio_energy_stub,
    )

    got = {
        (r["doc_id"], r["win_idx"]): (
            r["energy"], r["zero_crossings"], r["is_voiced"]
        )
        for r in mm_audio_energy_stub(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expected = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        b = [v - 128 for v in text.encode()]
        for w in range(len(b) // _AUDIO_WIN):
            seg = b[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
            e = sum(v * v for v in seg)
            z = sum(1 for a, c in zip(seg, seg[1:]) if a * c < 0)
            expected[(doc_id, w)] = (e, z, e >= _AUDIO_VAD_T)
    assert got == expected
