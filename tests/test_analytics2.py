import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

ANALYTICS2 = ["q_customer_rfm", "q_events_transitions"]


@pytest.mark.parametrize("name", ANALYTICS2)
def test_analytics2_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    """Each score column must be an exact ntile: bucket sizes differ by
    at most one, all five buckets present, scores in [1, 5]."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_customer_rfm"](spark, sf_dir)
    for col in ("r_score", "f_score", "m_score"):
        sizes = {
            r[col]: r["n"]
            for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(sizes) == {1, 2, 3, 4, 5}, (col, sizes)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)


def test_rfm_no_global_single_partition_window(spark, sf_dir):
    """The scale contract: no one-partition global ntile window — the
    plan must range-partition for the rank instead."""
    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.plans import plan_str

    plan = plan_str(entrymod.queries()["q_customer_rfm"](spark, sf_dir))
    low = plan.lower()
    assert "ntile" not in low, plan
    # Since r6, dist_ntile localCheckpoints its range-partitioned frame
    # (exchange-reuse hardening): the range shuffle runs inside the eager
    # checkpoint job, so the final plan reads the materialized blocks
    # (Scan ExistingRDD) instead of showing the RangePartitioning node.
    assert "rangepartitioning" in low or "existingrdd" in low, plan


def test_transitions_probabilities_sum_to_one(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_events_transitions"](spark, sf_dir)
    sums = (
        df.groupBy("prev_type").agg(F.round(F.sum("p"), 2).alias("s")).collect()
    )
    assert sums
    for r in sums:
        assert abs(r["s"] - 1.0) <= 0.02, r


@pytest.mark.parametrize("n", [1, 2, 4, 5, 6, 23, 100])
def test_dist_ntile_matches_ntile_semantics(spark, n):
    """_dist_ntile must reproduce exact ntile(k) bucketing (first n%k
    buckets one row larger) for awkward n, including n < k."""
    from sentiment_analysis_vector_search_spark.operators.analytics2 import (
        _dist_ntile,
    )

    df = spark.range(n).select(
        (F.col("id") * 7 % 13).alias("v"), F.col("id").alias("tid")
    )
    got = {
        r.tid: r.b for r in _dist_ntile(df, "v", "tid", 5, "b").collect()
    }
    rows = sorted(((r.v, r.tid) for r in df.collect()))
    want = {}
    base, extra = divmod(n, 5)
    idx = 0
    for b in range(1, 6):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if idx < n:
                want[rows[idx][1]] = b
                idx += 1
    assert got == want


def test_cohort_ltv_parity_and_monotone(spark, sf_dir):
    assert_parity(spark, "q_cohort_ltv", sf_dir)
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_cohort_ltv"](spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_q, []).append((r.age_q, r.rev, r.cum_rev))
    for cohort, seq in by_cohort.items():
        seq.sort()
        run = 0.0
        for age, rev, cum in seq:
            run += rev
            assert cum == pytest.approx(run, rel=1e-12), (cohort, age)


def test_chi2_parity_and_python_reference(spark, sf_dir):
    assert_parity(spark, "q_events_chi2", sf_dir)
    import collections

    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.catalog import table

    got = entrymod.queries()["q_events_chi2"](spark, sf_dir).collect()[0]

    rows = table(spark, sf_dir, "events").select("event_type", "ts").collect()
    obs = collections.Counter((r.event_type, r.ts.weekday()) for r in rows)
    row_tot = collections.Counter()
    col_tot = collections.Counter()
    for (t, d), o in obs.items():
        row_tot[t] += o
        col_tot[d] += o
    n = sum(obs.values())
    chi2 = sum(
        (o - row_tot[t] * col_tot[d] / n) ** 2 / (row_tot[t] * col_tot[d] / n)
        for (t, d), o in obs.items()
    )
    assert got.chi2 == pytest.approx(chi2, abs=1e-6)  # engine rounds to 6dp
    assert got.dof == (len(row_tot) - 1) * (len(col_tot) - 1)
    assert got.n_cells == len(obs)


def test_dq_expectations_report(spark, sf_dir):
    """The DQ report must cover every declared check once, hash-match its
    oracle, and surface the KNOWN synthetic-data finding (duplicate
    lineitem composite keys) as a failed row — a failing check row is
    the operator working, not an error."""
    assert_parity(spark, "dq_expectations", sf_dir)
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["dq_expectations"](spark, sf_dir).collect()
    by_key = {(r.table_name, r.check_name): r for r in rows}
    assert len(rows) == len(by_key) == 11
    li_pk = by_key[("lineitem", "pk_unique")]
    assert not li_pk.passed and li_pk.metric > 0
    for key, r in by_key.items():
        if key == ("lineitem", "pk_unique"):
            continue
        assert r.passed, key


def test_forecast_backtest_parity_and_sanity(spark, sf_dir):
    assert_parity(spark, "q_forecast_backtest", sf_dir)
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q_forecast_backtest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mae >= 0
        assert r.actual_total >= 0 and r.forecast_total >= 0
        # MAE can never exceed (actual + forecast) / 7 summed — loose but
        # catches sign/join errors
        assert r.mae <= (r.actual_total + r.forecast_total)


def test_ab_test_lift_parity_and_invariants(spark, sf_dir):
    assert_parity(spark, "ab_test_lift", sf_dir)
    import __spark_entry__ as entrymod

    r = entrymod.queries()["ab_test_lift"](spark, sf_dir).collect()[0]
    assert r.n0 > 0 and r.n1 > 0
    assert 0 < r.rate0 < 1 and 0 < r.rate1 < 1  # interior rates by design
    assert r.lift == pytest.approx(r.rate1 - r.rate0, abs=2e-6)
    # z sign must agree with lift sign
    assert (r.z_score >= 0) == (r.lift >= 0)


def test_transitions_two_phase_equals_registered(spark, sf_dir):
    """The registered (since r8) skew-safe two-phase transitions query
    must produce exactly the single-global-window twin's matrix."""
    from sentiment_analysis_vector_search_spark.operators.analytics2 import (
        transitions_single_window,
        transitions_two_phase,
    )

    a = sorted(tuple(r) for r in transitions_single_window(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in transitions_two_phase(spark, sf_dir).collect())
    assert a == b


def test_transitions_two_phase_event_grain_window_is_chunk_split(spark, sf_dir):
    from sentiment_analysis_vector_search_spark.operators.analytics2 import (
        transitions_two_phase,
    )
    from sentiment_analysis_vector_search_spark.plans import plan_str

    plan = plan_str(transitions_two_phase(spark, sf_dir))
    event_grain = [
        l for l in plan.splitlines()
        if "windowspecdefinition" in l and "event_id" in l
    ]
    assert event_grain, plan
    for line in event_grain:
        assert "chunk" in line, line
