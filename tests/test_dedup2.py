"""Winnowing dedup semantics on planted corpora: the shared-passage
guarantee, the boilerplate cap, and the no-tiny-doc contract (oracle
parity is the driver's job)."""

from __future__ import annotations

import os

import pandas as pd

from sentiment_analysis_vector_search_spark.operators.dedup2 import (
    _CAP,
    _K,
    _T,
    _W,
    dedup_winnow,
)


def _mk(tmp_path, texts: dict[int, str]):
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame(
        [
            {"doc_id": k, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
            for k, t in texts.items()
        ]
    )
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def _pairs(spark, d):
    return {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in dedup_winnow(spark, d).collect()
    }


_SHARED = " ".join(f"common{i}" for i in range(30))


def test_shared_passage_is_caught_and_disjoint_docs_are_not(spark, tmp_path):
    texts = {
        1: "aard bbrk ccrm ddrn eern ffrn " + _SHARED + " ggxx hhyy iizz",
        2: "pq1 pq2 pq3 pq4 " + _SHARED + " rs1 rs2 rs3",
        3: "totally unrelated words nothing in here overlaps with anything else",
        4: "another fully disjoint vocabulary document with its own tokens only",
    }
    d = _mk(tmp_path, texts)
    got = _pairs(spark, d)
    # a 30-token verbatim run >> k + w - 1 guarantees shared fingerprints
    assert (1, 2) in got and got[(1, 2)] >= _T
    assert all(p == (1, 2) for p in got)


def test_identical_docs_pair_with_full_overlap(spark, tmp_path):
    body = " ".join(f"w{i}" for i in range(20))
    d = _mk(tmp_path, {7: body, 8: body, 9: "qq " * 20})
    got = _pairs(spark, d)
    assert set(got) == {(7, 8)}


def test_boilerplate_cap_drops_corpus_wide_fingerprints(spark, tmp_path):
    # _CAP + 5 IDENTICAL docs: every fingerprint occurs in all of them,
    # exceeding the cap, so NO pairs — boilerplate must not explode the
    # pair join
    body = " ".join(f"bp{i}" for i in range(25))
    texts = {i: body for i in range(_CAP + 5)}
    d = _mk(tmp_path, texts)
    assert _pairs(spark, d) == {}


def test_tiny_docs_produce_no_fingerprints(spark, tmp_path):
    short = " ".join(f"t{i}" for i in range(_K + _W - 2))  # one token short
    d = _mk(tmp_path, {1: short, 2: short})
    assert _pairs(spark, d) == {}


# ---------------------------------------------------------------------------
# dedup_containment
# ---------------------------------------------------------------------------

def test_containment_catches_doc_inside_doc_jaccard_misses(spark, tmp_path):
    """A short doc fully quoted inside a long one: containment flags it
    with contain_a = 1.0 while Jaccard (|A|/|B|) sits far below the
    jaccard threshold — the case this operator exists for."""
    from sentiment_analysis_vector_search_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )
    from sentiment_analysis_vector_search_spark.operators.dedup2 import (
        dedup_containment,
    )

    quote = " ".join(f"quoted{i}" for i in range(12))
    filler = " ".join(f"filler{i}" for i in range(120))
    texts = {
        1: quote,                       # the short doc
        2: filler + " " + quote,        # quotes doc 1 verbatim inside
        3: " ".join(f"other{i}" for i in range(40)),  # unrelated
    }
    d = _mk(tmp_path, texts)
    got = {
        (r["doc_a"], r["doc_b"]): (r["contain_a"], r["contain_b"])
        for r in dedup_containment(spark, d).collect()
    }
    assert (1, 2) in got
    ca, cb = got[(1, 2)]
    assert ca == 1.0          # every shingle of doc 1 is inside doc 2
    assert cb < 0.5           # doc 2 is mostly other content
    assert not any(3 in p for p in got)
    # and Jaccard does NOT flag the pair at its threshold
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, d).collect()
    }
    assert (1, 2) not in jac


def test_containment_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "dedup_containment", sf_dir)
