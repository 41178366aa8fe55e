import pytest

from tests.parity import assert_parity

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_top_customers_window",
    "q_market_share",
    "q_events_window",
    "q_events_sessions",
    "q_events_json",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_q1_has_expected_shape(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q1_pricing_summary"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 9  # at most |returnflag| x |linestatus| groups
    assert "sum_disc_price" in df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_sessions_two_phase_matches_single_window_on_skewed_keys(spark, tmp_path):
    """The two-phase (per-(user, day-chunk) + boundary-merge)
    sessionization must equal the naive single-per-user-window
    computation on a deliberately skewed corpus: one hot user whose one
    session spans two midnights (double chunk-boundary merge), a
    boundary-straddling user, and a single-event user."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sentiment_analysis_vector_search_spark.registry import (
        QUERIES,
        load_all_modules,
    )

    load_all_modules()
    rows = []
    eid = 0
    # hot user 7: an event every 10 min for 48h straight starting 22:00 —
    # ONE session crossing two midnights — then a 2h gap, then 5 more
    # events 29 min apart (still one session: gap < 30 min).
    t = dt.datetime(2024, 1, 1, 22, 0, 0)
    for _ in range(48 * 6):
        rows.append((7, t, eid))
        eid += 1
        t += dt.timedelta(minutes=10)
    t += dt.timedelta(hours=2)
    for _ in range(5):
        rows.append((7, t, eid))
        eid += 1
        t += dt.timedelta(minutes=29)
    # user 8: 23:50, 23:55, 00:05(+1d) = one session across midnight;
    # 00:50 after a 45-min gap = a second session.
    for mins in (0, 5, 15, 60):
        rows.append(
            (8, dt.datetime(2024, 1, 3, 23, 50) + dt.timedelta(minutes=mins), eid)
        )
        eid += 1
    rows.append((9, dt.datetime(2024, 1, 5, 12, 0), eid))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    res = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in QUERIES["q_events_sessions"](spark, str(tmp_path)).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    start = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 30 * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    naive = (
        df.withColumn("s", start)
        .groupBy("user_id")
        .agg(
            F.sum("s").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    exp = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in naive.collect()}
    assert res == exp
    assert exp[7] == (2, 48 * 6 + 5)  # pin the intended skew shape
    assert exp[8] == (2, 4)
    assert exp[9] == (1, 1)


def test_sessions_two_phase_randomized_equivalence(spark, tmp_path):
    """Deterministic pseudo-random corpora (seeded) including gaps AT the
    30-min boundary (gap == threshold must NOT start a session), around
    it, and across midnights — two-phase must equal the naive window on
    every seed."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sentiment_analysis_vector_search_spark.registry import (
        QUERIES,
        load_all_modules,
    )

    load_all_modules()
    rows = []
    eid = 0
    base_epoch = 1704067200  # 2024-01-01T00:00:00Z
    for seed in range(5):
        rng = random.Random(seed)
        t = base_epoch + seed * 86400 * 40
        for _ in range(60):
            # mix sub-threshold, exactly-threshold, and super-threshold
            # gaps; some jump days
            gap = rng.choice([60, 1799, 1800, 1801, 7200, 90000])
            t += gap
            rows.append((seed, t, eid))
            eid += 1
    df = (
        spark.createDataFrame(rows, "user_id bigint, epoch bigint, event_id bigint")
        .select("user_id", F.timestamp_seconds("epoch").alias("ts"), "event_id")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    res = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in QUERIES["q_events_sessions"](spark, str(tmp_path)).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    start = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > 30 * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    exp = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in df.withColumn("s", start)
        .groupBy("user_id")
        .agg(
            F.sum("s").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert res == exp
