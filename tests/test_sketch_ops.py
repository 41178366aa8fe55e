"""KMV sketch-query pins: python-reference estimate equality, the
exact-column ground truth, and the small-set exact-passthrough branch."""

from __future__ import annotations

import hashlib
import math
import os

import pandas as pd

from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
    _H_SPACE,
    _KMV_K,
    q_events_kmv_distinct,
)


def _u(user_id: int) -> float:
    h = int(hashlib.md5(f"kmv:{user_id}".encode()).hexdigest()[:15], 16)
    return h / _H_SPACE


def _py_kmv(users) -> int:
    us = sorted((_u(x), x) for x in set(users))
    if len(us) < _KMV_K:
        return len(us)
    return math.floor((_KMV_K - 1) / us[_KMV_K - 1][0])


def test_kmv_matches_python_reference(spark, sf_dir):
    got = {
        r["event_type"]: (r["exact_distinct"], r["kmv_estimate"])
        for r in q_events_kmv_distinct(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    for et, g in ev.groupby("event_type"):
        exact = g.user_id.nunique()
        assert got[et][0] == exact
        assert got[et][1] == _py_kmv(g.user_id)


def test_kmv_small_set_is_exact(spark, tmp_path):
    # fewer than K distinct users -> the sketch returns the exact count
    d = str(tmp_path / "sf")
    os.makedirs(d)
    rows = [
        {"event_id": i, "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
         "user_id": i % 10, "event_type": "view", "value": 1.0, "props": "{}"}
        for i in range(100)
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "events.parquet"), index=False)
    row = q_events_kmv_distinct(spark, d).collect()[0]
    assert row["exact_distinct"] == 10
    assert row["kmv_estimate"] == 10
    assert row["rel_error"] == 0.0


def test_kmv_error_is_bounded_at_test_sf(spark, sf_dir):
    # KMV relative error concentrates around 1/sqrt(k-2) ~ 0.13 at k=64;
    # a generous 3-sigma-ish bound catches hash/selection regressions
    # without flaking on honest variance
    for r in q_events_kmv_distinct(spark, sf_dir).collect():
        if r["exact_distinct"] >= _KMV_K:
            assert r["rel_error"] <= 0.45, (r["event_type"], r["rel_error"])


def test_quantile_sketch_sample_is_deterministic_bottom_k(spark, sf_dir):
    """The sample quantile must equal a python re-derivation of the same
    bottom-k-hash sample (pins both the selection and the interpolation),
    and the exact columns must match numpy's linear interpolation."""
    import numpy as np

    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        _QS_K,
        q_value_quantile_sketch,
    )

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    got = {r["event_type"]: r for r in q_value_quantile_sketch(spark, sf_dir).collect()}
    for et, g in ev.groupby("event_type"):
        h = g.event_id.map(
            lambda i: int(hashlib.md5(f"qs:{i}".encode()).hexdigest()[:15], 16)
        )
        samp = g.assign(h=h).sort_values(["h", "event_id"]).head(_QS_K)
        r = got[et]
        assert r["n_rows"] == len(g)
        assert r["n_sample"] == min(len(g), _QS_K)
        assert r["approx_p50"] == round(
            float(np.percentile(samp.value, 50, method="linear")), 6
        )
        assert r["exact_p95"] == round(
            float(np.percentile(g.value, 95, method="linear")), 6
        )
        # O(1/sqrt(k)) convergence: generous bound against selection bugs
        spread = float(g.value.max() - g.value.min()) or 1.0
        assert r["err_p50"] <= 0.35 * spread, (et, r["err_p50"], spread)


def test_sketch_ops_parity(spark, sf_dir):
    from tests.parity import assert_parity

    for name in ("q_events_kmv_distinct", "q_value_quantile_sketch"):
        assert_parity(spark, name, sf_dir)


def test_cms_estimates_upper_bound_and_bucket_parity(spark, sf_dir):
    """CMS point estimates must upper-bound the exact counts (the
    Count-Min guarantee), cover exactly the exact top-10 users, and the
    engine's bucket ids must equal the python md5 reference."""
    import hashlib
    import os

    import pandas as pd

    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        _CMS_D,
        _CMS_TOP,
        _CMS_W,
        q_events_cms_freq,
    )

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    counts = ev.groupby("user_id").size().reset_index(name="n")
    top = counts.sort_values(["n", "user_id"], ascending=[False, True]).head(
        _CMS_TOP
    )
    got = {r["user_id"]: r for r in q_events_cms_freq(spark, sf_dir).collect()}
    assert set(got) == set(top.user_id)
    # python CMS reference: same hashing, same min-over-depths
    def bucket(i, u):
        return (
            int(hashlib.md5(f"cms{i}:{u}".encode()).hexdigest()[:15], 16)
            % _CMS_W
        )

    cms = {}
    for u, n in counts.itertuples(index=False):
        for i in range(_CMS_D):
            key = (i, bucket(i, u))
            cms[key] = cms.get(key, 0) + int(n)
    for _, (u, n) in top.iterrows():
        r = got[u]
        assert r["exact_n"] == n
        want = min(cms[(i, bucket(i, u))] for i in range(_CMS_D))
        assert r["cms_n"] == want
        assert r["cms_n"] >= r["exact_n"] and r["overcount"] == want - n


def test_cms_and_rm3_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "q_events_cms_freq", sf_dir)
    assert_parity(spark, "bm25_rm3_expand", sf_dir)


def test_cms_plan_shape(spark, sf_dir):
    """The sketch build partial-combines map-side (no pre-shuffle d-way
    blowup reaches the exchange), the exact top-10 is a TakeOrdered, and
    the point probes join the 2,048-row sketch via broadcast."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_events_cms_freq"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    assert "TakeOrdered" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan
