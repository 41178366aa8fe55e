"""batch_by_length / domain_temperature_mix pins: python-reference
equality, bucket-invariant conservation, and normalization properties."""

from __future__ import annotations

import math
import os

import pandas as pd

from sentiment_analysis_vector_search_spark.operators.curation3 import (
    _BATCH_TOKEN_BUDGET,
    _LEN_BUCKETS,
    batch_by_length,
    domain_temperature_mix,
)


def _n_tokens(text: str) -> int:
    return len([w for w in text.lower().split() if w])


def test_batch_by_length_matches_python_reference(spark, sf_dir):
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    want: dict[int, list[int]] = {}
    for t in docs.text:
        n = _n_tokens(t)
        b = next((x for x in _LEN_BUCKETS if n <= x), _LEN_BUCKETS[-1])
        want.setdefault(b, []).append(min(n, _LEN_BUCKETS[-1]))
    got = {r["bucket_len"]: r for r in batch_by_length(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for b, used in want.items():
        r = got[b]
        assert r["n_docs"] == len(used)
        assert r["sum_tokens"] == sum(used)
        assert r["padding_waste"] == round(1.0 - sum(used) / (len(used) * b), 6)
        per_batch = _BATCH_TOKEN_BUDGET // b
        assert r["n_batches"] == math.ceil(len(used) / per_batch)


def test_batch_by_length_conserves_documents(spark, sf_dir):
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = batch_by_length(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # waste is a ratio: always within [0, 1)
    assert all(0.0 <= r["padding_waste"] < 1.0 for r in rows)


def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    rows = domain_temperature_mix(spark, sf_dir).collect()
    cur = {r["source"]: r["current_share"] for r in rows}
    tmp = {r["source"]: r["temp_share"] for r in rows}
    assert abs(sum(cur.values()) - 1.0) < 1e-4
    assert abs(sum(tmp.values()) - 1.0) < 1e-4
    uniform = 1.0 / len(rows)
    for s in cur:
        # sqrt-temperature pulls every share toward uniform, never past it
        lo, hi = sorted((cur[s], uniform))
        assert lo - 1e-9 <= tmp[s] <= hi + 1e-9, (s, cur[s], tmp[s])


def test_temperature_mix_rates_are_downsample_only(spark, sf_dir):
    rows = domain_temperature_mix(spark, sf_dir).collect()
    rates = [r["sample_rate"] for r in rows]
    assert all(0.0 < x <= 1.0 for x in rates)
    # normalization keeps the scarcest-relative source at rate 1.0
    assert max(rates) == 1.0


def test_temperature_mix_python_reference(spark, sf_dir):
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    g = docs.groupby("source").size()
    tw = {s: round(math.sqrt(n), 9) for s, n in g.items()}
    tot_w = sum(tw.values())  # decimal-exact at 9dp in-engine; close enough here
    n_tot = int(g.sum())
    cur = {s: n / n_tot for s, n in g.items()}
    tmp = {s: w / tot_w for s, w in tw.items()}
    c = min(cur[s] / tmp[s] for s in cur)
    got = {r["source"]: r for r in domain_temperature_mix(spark, sf_dir).collect()}
    for s in cur:
        assert got[s]["n_docs"] == int(g[s])
        assert abs(got[s]["current_share"] - cur[s]) < 1e-6
        assert abs(got[s]["temp_share"] - tmp[s]) < 1e-6
        want_rate = min(1.0, c * tmp[s] / cur[s])
        assert abs(got[s]["sample_rate"] - want_rate) < 1e-6


def test_curation3_parity(spark, sf_dir):
    from tests.parity import assert_parity

    for name in ("batch_by_length", "domain_temperature_mix"):
        assert_parity(spark, name, sf_dir)
