"""Semantic pins for the LM-quality / weighted-sampling operators
(cross-engine parity is covered by the driver oracle; these pin the
math itself against a plain-Python reference on planted corpora)."""

from __future__ import annotations

import hashlib
import math
import os

import pandas as pd
import pytest

from sentiment_analysis_vector_search_spark.operators.lm_ops import (
    _WS_K,
    sample_weighted,
    text_bigram_lm_score,
)

MOD31 = (1 << 31) - 1


def _mk_sf_dir(tmp_path, rows):
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def _py_bigram_lm(texts: dict[int, str]):
    """Plain-Python add-one bigram LM reference."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in texts.items()}
    uc: dict[str, int] = {}
    bc: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for w in ws:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    v = float(len(uc))
    out = {}
    for d, ws in toks.items():
        lps = [
            # raw logp (rule 33): the engine emits unrounded stable_ln
            math.log((bc[(a, b)] + 1.0) / (uc[a] + v))
            for a, b in zip(ws, ws[1:])
        ]
        if lps:
            out[d] = (len(lps), sum(lps) / len(lps))
    return out


def test_bigram_lm_matches_python_reference(spark, tmp_path):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the cat",
        3: "dog runs dog runs dog runs",
        4: "zeta xi omicron upsilon",
        5: "the the the the the",
    }
    d = _mk_sf_dir(
        tmp_path,
        [{"doc_id": k, "text": t, "lang": "en", "source": "s"} for k, t in texts.items()],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in text_bigram_lm_score(spark, d).collect()
    }
    ref = _py_bigram_lm(texts)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1], abs=1e-9)


def test_bigram_lm_repetition_scores_higher_than_noise(spark, tmp_path):
    rows = [
        {"doc_id": i, "text": "alpha beta " * 20, "lang": "en", "source": "s"}
        for i in range(6)
    ]
    rows.append(
        {"doc_id": 99, "text": "q1 q2 q3 q4 q5 q6 q7 q8", "lang": "en", "source": "s"}
    )
    d = _mk_sf_dir(tmp_path, rows)
    got = {r["doc_id"]: r["avg_logp"] for r in text_bigram_lm_score(spark, d).collect()}
    # the looping doc is highly predictable under the corpus LM; the
    # unique-word doc is maximally surprising
    assert got[0] > got[99]


def test_zipf_fit_matches_python_reference(spark, tmp_path):
    from sentiment_analysis_vector_search_spark.operators.lm_ops import (
        corpus_zipf_fit,
    )

    # planted power-lawish corpus: word wi appears ~ceil(32/2^i) times
    words = []
    for i in range(6):
        words += [f"w{i}"] * max(32 >> i, 1)
    d = _mk_sf_dir(
        tmp_path, [{"doc_id": 1, "text": " ".join(words), "lang": "en", "source": "s"}]
    )
    row = corpus_zipf_fit(spark, d).collect()[0]
    assert row["n_types"] == 6 and row["top_n"] == 6

    # python OLS over the same (ln rank, ln freq) points
    from collections import Counter

    cnt = Counter(words)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        # raw points (rule 33): the engine emits unrounded stable_ln
        (math.log(rk + 1), math.log(c))
        for rk, (_, c) in enumerate(ordered)
    ]
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["slope"] == pytest.approx(slope, abs=1e-9)
    assert row["slope"] < -0.5  # decaying frequencies -> negative slope
    assert 0.0 <= row["r2"] <= 1.0


def test_zipf_fit_flat_corpus_has_near_zero_slope(spark, tmp_path):
    from sentiment_analysis_vector_search_spark.operators.lm_ops import (
        corpus_zipf_fit,
    )

    words = [f"u{i}" for i in range(20)] * 5  # every type equally frequent
    d = _mk_sf_dir(
        tmp_path, [{"doc_id": 1, "text": " ".join(words), "lang": "en", "source": "s"}]
    )
    row = corpus_zipf_fit(spark, d).collect()[0]
    assert row["slope"] == pytest.approx(0.0, abs=1e-9)


def _py_wkey(doc_id: int, n_chars: int) -> float:
    from sentiment_analysis_vector_search_spark.functions.stable import (
        py_stable_ln,
    )

    h = int(hashlib.md5(f"wsamp:{doc_id}".encode()).hexdigest()[:15], 16)
    return py_stable_ln((h % MOD31) + 1, 31) / max(n_chars, 1)


def test_sample_weighted_matches_python_reference(spark, sf_dir):
    got = sample_weighted(spark, sf_dir).toPandas()
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs["wkey"] = [
        _py_wkey(i, n) for i, n in zip(docs.doc_id, docs.n_chars)
    ]
    expected = set()
    for src, g in docs.groupby("source"):
        g = g.sort_values(["wkey", "doc_id"], ascending=[False, True])
        expected |= set(g.head(_WS_K).doc_id)
    assert set(got.doc_id) == expected
    # rank contract: 1..K per source, no source exceeds K
    assert got.groupby("source").rk.max().le(_WS_K).all()
    assert (got.groupby("source").rk.apply(lambda s: sorted(s) == list(range(1, len(s) + 1)))).all()


def test_sample_weighted_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, sample_weighted(spark, sf_dir).collect()))
    b = sorted(map(tuple, sample_weighted(spark, sf_dir).collect()))
    assert a == b


def test_sample_weighted_prefers_heavy_docs(spark, tmp_path):
    # one giant-weight doc against many tiny ones: key = ln(u)/w -> the
    # giant doc's key is ~0 and wins any realistic draw
    rows = [{"doc_id": i, "text": "x", "lang": "en", "source": "s"} for i in range(40)]
    rows.append({"doc_id": 1000, "text": "y" * 100000, "lang": "en", "source": "s"})
    d = _mk_sf_dir(tmp_path, rows)
    got = sample_weighted(spark, d).toPandas()
    assert 1000 in set(got.doc_id)
    assert int(got.loc[got.doc_id == 1000, "rk"].iloc[0]) == 1
