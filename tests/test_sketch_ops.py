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

    for name in (
        "q_events_kmv_distinct",
        "q_value_quantile_sketch",
        "q_events_kmv_setops",
    ):
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


# ---------------------------------------------------------------------------
# q_events_kmv_setops
# ---------------------------------------------------------------------------

def _so_u(user_id: int, dayno: int) -> float:
    h = int(hashlib.md5(f"kmvs:{user_id}:{dayno}".encode()).hexdigest()[:15], 16)
    return h / _H_SPACE


def _py_setops(a_set, b_set, k=64):
    """Beyer et al. KMV set-algebra reference."""
    def est(s):
        us = sorted(_so_u(*e) for e in s)
        return float(len(us)) if len(us) < k else math.floor((k - 1) / us[k - 1])

    sk_a = set(sorted(a_set, key=lambda e: (_so_u(*e), *e))[:k])
    sk_b = set(sorted(b_set, key=lambda e: (_so_u(*e), *e))[:k])
    comb = sorted(sk_a | sk_b, key=lambda e: (_so_u(*e), *e))
    L = comb[:k]
    kprime = len(L)
    union_d = (
        float(len(comb))
        if len(comb) < k
        else math.floor((k - 1) / _so_u(*L[-1]))
    )
    n_both = sum(1 for e in L if e in sk_a and e in sk_b)
    int_d = (n_both / kprime) * union_d
    return {
        "kmv_a": int(est(a_set)),
        "kmv_b": int(est(b_set)),
        "kmv_union": int(union_d),
        "kmv_intersection": int(math.floor(int_d)),
    }


def _day_sets(sf_dir):
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev["dayno"] = (ev.ts.dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    mk = lambda t: set(
        map(tuple, ev[ev.event_type == t][["user_id", "dayno"]].values.tolist())
    )
    return mk("purchase"), mk("click")


def test_kmv_setops_matches_python_reference(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        q_events_kmv_setops,
    )

    row = q_events_kmv_setops(spark, sf_dir).collect()[0]
    a_set, b_set = _day_sets(sf_dir)
    ref = _py_setops(a_set, b_set)
    assert row["exact_a"] == len(a_set)
    assert row["exact_b"] == len(b_set)
    assert row["exact_union"] == len(a_set | b_set)
    assert row["exact_intersection"] == len(a_set & b_set)
    assert row["exact_a_minus_b"] == len(a_set - b_set)
    for c, v in ref.items():
        assert row[c] == v, c
    assert row["kmv_a_minus_b"] == max(ref["kmv_a"] - ref["kmv_intersection"], 0)


def test_kmv_setops_small_sets_are_exact(spark, tmp_path):
    # both sets under K distinct elements -> every estimate is exact
    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        q_events_kmv_setops,
    )

    d = str(tmp_path / "sf")
    os.makedirs(d)
    rows = []
    for i in range(200):
        # 20 purchase days (users 0-19 on day 0), 30 click days (users
        # 10-39 on day 0): intersection 10, union 40
        et = "purchase" if i % 2 == 0 else "click"
        uid = (i // 2) % 20 if et == "purchase" else 10 + (i // 2) % 30
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp("2026-01-05 12:00:00"),
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
        )
    pd.DataFrame(rows).to_parquet(os.path.join(d, "events.parquet"), index=False)
    row = q_events_kmv_setops(spark, d).collect()[0]
    assert (row["exact_a"], row["exact_b"]) == (20, 30)
    assert row["kmv_a"] == 20 and row["kmv_b"] == 30
    assert row["kmv_union"] == row["exact_union"] == 40
    assert row["kmv_intersection"] == row["exact_intersection"] == 10
    assert row["kmv_a_minus_b"] == row["exact_a_minus_b"] == 10


def test_hist_quantiles_planted_and_parity(spark, sf_dir, tmp_path):
    """Histogram estimator semantics on a planted distribution, then
    oracle parity at the graded SF."""
    import os

    import pandas as pd
    import pytest

    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        q_value_hist_quantiles,
    )
    from tests.parity import assert_parity

    d = str(tmp_path)
    T = pd.Timestamp("2026-01-01")
    # 100 uniform values in [0, 100): 10 per bin across bins 0..9.
    # t(p50) = 50 -> first bin with cum >= 50 is bin 4 (cum 50);
    # est = 10*4 + 10*(50-40)/10 = 50.
    rows = [
        {"event_id": i, "ts": T, "user_id": 1, "event_type": "u",
         "value": float(i), "props": "{}"}
        for i in range(100)
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "events.parquet"), index=False)
    got = {r["event_type"]: r for r in q_value_hist_quantiles(spark, d).collect()}
    u = got["u"]
    assert u["n_rows"] == 100
    assert u["est_p50"] == pytest.approx(50.0, abs=1e-12)
    assert u["est_p90"] == pytest.approx(90.0, abs=1e-12)
    assert u["est_p99"] == pytest.approx(99.0, abs=1e-12)
    # exact type-7 percentiles of 0..99: p50=49.5 -> |err| <= bin width
    assert abs(u["err_p50"]) <= 10.0 and abs(u["err_p99"]) <= 10.0
    assert_parity(spark, "q_value_hist_quantiles", sf_dir)


def test_doclen_hist_by_source_planted_and_parity(spark, sf_dir, tmp_path):
    """Stats-derived knobs flow through the graded grouped estimator
    (r13): a planted corpus with a NEGATIVE, wide n_chars range derives
    a shifted support (offset < 0) and still estimates within one bin
    width of the matching-rank exact; then oracle parity at the graded
    SF (the oracle derives identical knobs in SQL)."""
    import os

    import numpy as np
    import pandas as pd

    from sentiment_analysis_vector_search_spark.operators.sketch_ops import (
        q_doclen_hist_by_source,
    )
    from tests.parity import assert_parity

    d = str(tmp_path)
    rows = []
    # source "neg": 1000 values spanning [-500, 500) — the range the
    # hand default would pile into bins 0/63
    for i in range(1000):
        rows.append({"doc_id": i, "source": "neg", "lang": "en",
                     "text": "x", "n_chars": i - 500})
    # source "hi": 500 values in [5000, 5500)
    for i in range(500):
        rows.append({"doc_id": 1000 + i, "source": "hi", "lang": "en",
                     "text": "x", "n_chars": 5000 + i})
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"),
                                  index=False)
    got = {r["source"]: r for r in q_doclen_hist_by_source(spark, d).collect()}
    assert set(got) == {"neg", "hi"}
    w = got["neg"]["width"]
    assert got["neg"]["offset"] <= -500.0  # shifted support, not a clamp
    for src, vals in (
        ("neg", np.arange(-500, 500)),
        ("hi", np.arange(5000, 5500)),
    ):
        r = got[src]
        assert r["n_docs"] == len(vals)
        for q, tag in ((0.5, "p50"), (0.9, "p90")):
            exact1 = float(np.percentile(vals, q * 100, method="inverted_cdf"))
            assert abs(r[f"est_{tag}"] - exact1) <= w, (src, tag)

    assert_parity(spark, "q_doclen_hist_by_source", sf_dir)
